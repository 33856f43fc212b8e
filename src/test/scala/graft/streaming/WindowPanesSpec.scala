package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.WindowPanes.{PaneElement, PaneRow}

/** W4/W5: pane fires only when the watermark closes the window; every
  * element re-emits with pane size and Flink's maxTimestamp
  * (= window end − 1 ms) convention.
  */
class WindowPanesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def us(s: String): Long = ts(s).getTime * 1000L

  test("pane processing emits closed panes with metadata, holds open ones") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Timestamp)]
    val elems = mem.toDF().toDF("key", "id", "value", "ts")
      .withWatermark("ts", "0 seconds")
      .selectExpr("key", "unix_micros(date_trunc('hour', ts)) AS win_start_us",
        "id", "value", "ts")
      .as[PaneElement]
    val windowUs = 3600L * 1000000L
    val fired = elems.groupByKey(e => (e.key, e.win_start_us))
      .flatMapGroupsWithState(OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)(
        WindowPanes.paneProcessor(windowUs))
    val q = fired.toDF().writeStream.outputMode("append")
      .format("memory").queryName("panes").start()
    try {
      mem.addData((1L, 1L, 10.0, ts("2024-01-01 10:05:00")), (1L, 2L, 20.0, ts("2024-01-01 10:55:00")))
      q.processAllAvailable()
      // hour-10 pane still open: nothing emitted
      assert(spark.table("panes").count() === 0)
      // advance watermark past 11:00 → hour-10 pane fires
      mem.addData((1L, 3L, 30.0, ts("2024-01-01 11:00:30")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("panes").as[PaneRow].collect().sortBy(_.id).toSeq
    assert(got.map(_.id) === Seq(1L, 2L))
    assert(got.forall(_.pane_size == 2))
    assert(got.forall(_.max_ts_us == us("2024-01-01 11:00:00") - 1000L))
  }
}
