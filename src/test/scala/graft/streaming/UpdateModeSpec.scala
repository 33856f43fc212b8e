package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** OutputMode.Update — the third emission mode: each trigger emits the
  * windows *changed in that batch* (vs append's emit-once-on-close and
  * complete's emit-everything). The memory sink accumulates one row
  * per (batch, updated window), so a window updated twice appears
  * twice with increasing counts.
  */
class UpdateModeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("update mode re-emits a window when new rows update it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("win"), col("n"))
    val q = agg.writeStream.outputMode("update").format("memory").queryName("upd").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 10:10:00"), 2.0)) // same window → re-emitted with n=2
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("upd").as[(String, Long)].collect().sorted.toSeq
    assert(got === Seq(("2024-01-01 10:00:00", 1L), ("2024-01-01 10:00:00", 2L)))
  }
}
