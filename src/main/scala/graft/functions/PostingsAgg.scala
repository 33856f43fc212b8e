package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Document-frequency-capped posting-list aggregate: collects up to
  * `maxDf + 1` member ids per key while counting ALL members exactly.
  *
  * Output: `struct(df: bigint, ids: array<bigint>)` where `df` is the
  * exact group size and `ids` is complete iff `df <= maxDf`.
  *
  * This is the memory-safety valve for shingle posting lists in the
  * dedup path (reference behavior: flink-snappydata keyed aggregation,
  * e.g. KafkaWindowWordCount.scala:31-34, has per-key state the runtime
  * bounds; Spark's `collect_list` does not): a corpus-frequent
  * "stop shingle" — boilerplate, license headers, guaranteed at 100 TB
  * — would otherwise materialize an unbounded array in one aggregation
  * buffer (df = 10⁹ ⇒ an 8 GB array, then a ~df²/2 pair explosion
  * downstream). Here the buffer stops growing at `maxDf + 1` elements
  * no matter how large the group gets, while `df` stays exact, so the
  * caller can filter `df <= maxDf` and KNOW the kept arrays are
  * complete — a single-shuffle, map-side-combined plan with a hard
  * per-key memory bound.
  */
case class CappedPostingsAgg(
    child: Expression,
    maxDf: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedPostingsAgg.Buf] {

  require(maxDf >= 1 && maxDf < Int.MaxValue,
    s"maxDf must be in [1, Int.MaxValue): got $maxDf (the buffer needs maxDf + 1 slots; " +
      "to effectively disable the cap use Int.MaxValue - 1)")

  override def prettyName: String = "graft_capped_postings"
  override def dataType: DataType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  // capacity maxDf + 1: one element past the cap is enough to prove
  // overflow even if df were not tracked; growth stops there forever.
  private def cap: Int = maxDf + 1

  override def createAggregationBuffer(): CappedPostingsAgg.Buf =
    new CappedPostingsAgg.Buf(0L, new ArrayBuffer[Long](8))

  override def update(buf: CappedPostingsAgg.Buf, input: InternalRow): CappedPostingsAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.df += 1L
      if (buf.ids.length < cap) buf.ids += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: CappedPostingsAgg.Buf, b2: CappedPostingsAgg.Buf): CappedPostingsAgg.Buf = {
    b1.df += b2.df
    var i = 0
    while (i < b2.ids.length && b1.ids.length < cap) {
      b1.ids += b2.ids(i)
      i += 1
    }
    b1
  }

  override def eval(buf: CappedPostingsAgg.Buf): Any =
    InternalRow(buf.df, new GenericArrayData(buf.ids.toArray))

  override def serialize(buf: CappedPostingsAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + buf.ids.length * 8)
    bb.putLong(buf.df)
    bb.putInt(buf.ids.length)
    buf.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedPostingsAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val df = bb.getLong()
    val n = bb.getInt()
    val ids = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { ids += bb.getLong(); i += 1 }
    new CappedPostingsAgg.Buf(df, ids)
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedPostingsAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedPostingsAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): AggregateFunction =
    copy(child = cs.head)
}

object CappedPostingsAgg {
  /** Mutable aggregation buffer: exact group count + capped id list. */
  final class Buf(var df: Long, val ids: ArrayBuffer[Long])
}
