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

  /** (id, simhash) signature per document. The word hash is
    * fmix64(fingerprint64(word)) — full avalanche like xxhash64, but
    * with an exact SQL replica (see [[simhashOracleSql]]), which is
    * what lets q25 be oracle-gated instead of rows-only.
    */
  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("id"))
      .agg(simhashAgg(graft.functions.Mix64(graft.functions.Fingerprint64(col("word")))).as("sig"))

  /** Pairs with Hamming(sig_a, sig_b) ≤ maxDist via the pigeonhole
    * chunk join: split each signature into maxDist+1 chunks; any pair
    * within distance must collide on ≥1 chunk.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int): DataFrame = {
    require(0 <= maxDist && maxDist < 64,
      s"nearDupPairs needs 0 <= maxDist < 64, got $maxDist — at 64+ every chunk mask is " +
        "empty and the candidate join degenerates to all-pairs")
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

  /** Oracle-gated query: the pigeonhole chunk join is exact for
    * Hamming ≤ maxDist, so the oracle can brute-force all pairs.
    */
  def simhashQuery(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(spark, dir), "doc_id", "text", maxDist = 7)

  /** SimHash-driven near-dup clustering: the q25 pair graph fed
    * through the same connected-components operator the Jaccard path
    * uses (q65) — operator composition, not a new implementation. The
    * oracle composes identically: the SimHash pair SQL inside the
    * shared recursive-closure CTE chain.
    */
  def clusterQuery(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      nearDupPairs(Tables.documents(spark, dir), "doc_id", "text", maxDist = 7))
      .select(col("id").as("doc_id"), col("keep_id"))

  lazy val clusterSql: String =
    Dedup.closureCtes(simhashOracleSql) + "\nSELECT id AS doc_id, keep_id FROM comp"

  /** DuckDB replica of the whole SimHash pipeline: per-word Karp-Rabin
    * over UTF-8 bytes (HUGEINT mod 2^64 — same trick as q24), murmur
    * fmix64 with the wrapping multiply split into 32-bit halves so the
    * 128-bit intermediate never overflows, per-bit ±1 votes, sign-bit
    * packing, then brute-force Hamming ≤ 7 over all pairs (exactly
    * what the pigeonhole join computes, by its guarantee).
    */
  val simhashOracleSql: String = {
    val M = SimHash.Mod64
    val fmix = SimHash.fmixSql("h0")
    s"""WITH words AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
       |  WHERE w <> ''),
       |fp AS (
       |  SELECT doc_id, list_reduce(list_prepend(0::HUGEINT,
       |    list_transform(range(octet_length(encode(w))),
       |      i -> CAST(CAST(('0x' || substr(hex(encode(w)), 2*i::INT + 1, 2)) AS INT) AS HUGEINT))),
       |    (a, b) -> (a * 257 + b) % $M) AS h0
       |  FROM words),
       |mixed AS (SELECT doc_id, $fmix AS h FROM fp),
       |votes AS (
       |  SELECT doc_id, CAST(b.bit AS INT) AS bit,
       |    sum(CASE WHEN (h >> CAST(b.bit AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM mixed, unnest(range(64)) b(bit) GROUP BY 1, 2),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN s > 9223372036854775807::HUGEINT
       |              THEN s - $M ELSE s END AS BIGINT) AS sig
       |  FROM (SELECT doc_id,
       |          sum(CASE WHEN v > 0 THEN 1::HUGEINT << bit ELSE 0::HUGEINT END) AS s
       |        FROM votes GROUP BY doc_id) t)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 7""".stripMargin
  }

  /** HUGEINT mod-2^64 SQL building blocks — the DuckDB replica of the
    * JVM long-hash pipeline ([[graft.functions.Fingerprint64]] ∘
    * [[graft.functions.Mix64]]), shared by every oracle that needs it
    * exactly (q25 SimHash above, q157 Count-Min).
    */
  // a def, not a val: simhashOracleSql above initializes first and
  // would read a val declared below it as null
  private[operators] def Mod64: String = "18446744073709551616::HUGEINT"

  /** Wrapping 64-bit multiply: the 128-bit intermediate never
    * overflows HUGEINT because the product is split at 2^32.
    */
  private[operators] def mulmodSql(h: String, c: String): String =
    s"((($h) % 4294967296::HUGEINT) * $c::HUGEINT + " +
      s"(((($h) // 4294967296::HUGEINT) * $c::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $Mod64"

  private[operators] def x33Sql(h: String): String = s"xor(($h), ($h) >> 33)"

  /** murmur fmix64 of a mod-2^64 HUGEINT expression. */
  private[operators] def fmixSql(h: String): String =
    x33Sql(mulmodSql(x33Sql(mulmodSql(x33Sql(h), "18397679294719823053")), "14181476777654086739"))

  /** Karp-Rabin byte fold of a VARCHAR expression — the exact replica
    * of [[graft.functions.Fingerprint64]] (h = h·257 + byte mod 2^64).
    */
  private[operators] def byteFoldFpSql(w: String): String =
    s"""list_reduce(list_prepend(0::HUGEINT,
       |    list_transform(range(octet_length(encode($w))),
       |      i -> CAST(CAST(('0x' || substr(hex(encode($w)), 2*i::INT + 1, 2)) AS INT) AS HUGEINT))),
       |    (a, b) -> (a * 257 + b) % $Mod64)""".stripMargin
}
