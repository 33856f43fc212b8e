package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** 64-bit SimHash document signatures + near-dup pairing by Hamming
  * distance.
  *
  * The signature is computed with a native Catalyst
  * `TypedImperativeAggregate`: the buffer is the 64 per-bit counters;
  * `update` folds one word-hash in, `merge` adds counter vectors —
  * so the aggregation is map-side partial like any Spark agg, and the
  * shuffle carries one 256-byte buffer per (partition, doc), never the
  * words. Pairing uses the pigeonhole band trick: signatures within
  * Hamming distance k must agree on at least one of k+1 disjoint
  * chunks, so candidates come from an equi-join on (chunk index,
  * chunk value) — no all-pairs comparison at any scale.
  */
object SimHash {

  /** Aggregate: per-bit vote counters over 64-bit word hashes;
    * eval packs sign bits into the SimHash long.
    */
  case class SimHashAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

    override def prettyName: String = "graft_simhash"
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

    override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Int]): Any = {
      var sig = 0L
      var i = 0
      while (i < 64) {
        if (buf(i) > 0) sig |= (1L << i)
        i += 1
      }
      sig
    }

    override def serialize(buf: Array[Int]): Array[Byte] = {
      val bb = ByteBuffer.allocate(64 * 4)
      buf.foreach(bb.putInt)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Int] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(64)(bb.getInt())
    }

    override def withNewMutableAggBufferOffset(o: Int): SimHashAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SimHashAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): AggregateFunction =
      copy(child = cs.head)
  }

  /** Column facade: simhash over a long word-hash column. */
  def simhashAgg(wordHash: Column): Column =
    GraftColumnBridge.column(
      SimHashAgg(GraftColumnBridge.expression(wordHash)).toAggregateExpression())

  /** (id, simhash) signature per document. */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("id"))
      .agg(simhashAgg(xxhash64(col("word"))).as("sig"))

  /** Pairs with Hamming(sig_a, sig_b) ≤ maxDist via the pigeonhole
    * chunk join: split each signature into maxDist+1 chunks; any pair
    * within distance must collide on ≥1 chunk.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val bits = 64 / nChunks
    val sig = signatures(df, idCol, textCol)
    val chunked = sig.select(col("id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${nChunks - 1}), c -> (sig >> (c * $bits)) & ${(1L << bits) - 1}L)"))
        .as(Seq("chunk", "cval")))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      // filter BEFORE the dedup: random 8-bit chunk collisions make the
      // candidate set ~1/256 of all pairs, and the Hamming test is a
      // per-row xor+popcount — so the distinct's shuffle carries only
      // true near-dup pairs instead of every candidate.
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Rows-only gated query (xxhash64-based signatures have no SQL
    * oracle); semantics are unit-tested with planted near-duplicates.
    */
  def simhashQuery(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(spark, dir), "doc_id", "text", maxDist = 7)
}
