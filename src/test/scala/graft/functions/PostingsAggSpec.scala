package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The df-cap memory bound, proven at the aggregation-buffer level:
  * no matter how many rows a key receives, the buffer holds at most
  * maxDf + 1 ids while the df count stays exact.
  */
class PostingsAggSpec extends AnyFunSuite {

  private def agg(maxDf: Int) =
    CappedPostingsAgg(BoundReference(0, LongType, nullable = false), maxDf)

  test("buffer growth stops at maxDf + 1 while df counts every row") {
    val a = agg(maxDf = 3)
    val buf = a.createAggregationBuffer()
    (1L to 1000L).foreach(i => a.update(buf, InternalRow(i)))
    assert(buf.df === 1000L)
    assert(buf.ids.length === 4) // maxDf + 1, never more
  }

  test("merge respects the cap and sums exact counts") {
    val a = agg(maxDf = 3)
    val b1 = a.createAggregationBuffer()
    val b2 = a.createAggregationBuffer()
    (1L to 2L).foreach(i => a.update(b1, InternalRow(i)))
    (10L to 50L).foreach(i => a.update(b2, InternalRow(i)))
    val m = a.merge(b1, b2)
    assert(m.df === 43L)
    assert(m.ids.length === 4)
  }

  test("serialize/deserialize round-trips df and capped ids") {
    val a = agg(maxDf = 5)
    val buf = a.createAggregationBuffer()
    (1L to 4L).foreach(i => a.update(buf, InternalRow(i)))
    val back = a.deserialize(a.serialize(buf))
    assert(back.df === 4L)
    assert(back.ids.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("under the cap, collected ids are complete") {
    val a = agg(maxDf = 100)
    val buf = a.createAggregationBuffer()
    (1L to 7L).foreach(i => a.update(buf, InternalRow(i)))
    assert(buf.df === 7L)
    assert(buf.ids.toSeq === (1L to 7L))
  }
}
