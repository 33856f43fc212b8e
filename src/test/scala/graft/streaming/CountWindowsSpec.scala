package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.CountWindows.{Element, Firing}

/** W3 — Flink `countWindow(size, slide)` semantics: fire on every
  * `slide`-th element per key with the last `min(size, seen)` values.
  */
class CountWindowsSpec extends SparkSuite {
  import spark.implicits._

  test("batch: fires every `slide` elements over a ring buffer of `size`") {
    // key 1: values 1..7, size=3, slide=2 → fires at n=2 (sum 1+2),
    // n=4 (2+3+4), n=6 (4+5+6); key 2: values 10,20 → fires at n=2.
    val in = ((1 to 7).map(i => Element(1L, i.toLong, i.toLong, i.toDouble)) :+
      Element(2L, 1L, 8L, 10.0) :+ Element(2L, 2L, 9L, 20.0)).toDS()
    val got = CountWindows.slidingCountWindow(in, size = 3, slide = 2)
      .collect().sortBy(f => (f.key, f.n_seen)).toSeq
    assert(got === Seq(
      Firing(1L, 2L, 2, 3.0), Firing(1L, 4L, 3, 9.0), Firing(1L, 6L, 3, 15.0),
      Firing(2L, 2L, 2, 30.0)))
  }

  test("streaming: state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Element]
    val q = CountWindows.slidingCountWindow(mem.toDS(), size = 3, slide = 2)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cw_state").start()
    try {
      // batch 1: three elements → one firing at n=2
      mem.addData(Element(1L, 1L, 1L, 1.0), Element(1L, 2L, 2L, 2.0), Element(1L, 3L, 3L, 3.0))
      q.processAllAvailable()
      // batch 2: one more element → n=4 fires with ring buffer (2,3,4)
      mem.addData(Element(1L, 4L, 4L, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cw_state").as[Firing].collect().sortBy(_.n_seen).toSeq
    assert(got === Seq(Firing(1L, 2L, 2, 3.0), Firing(1L, 4L, 3, 9.0)))
  }
}
