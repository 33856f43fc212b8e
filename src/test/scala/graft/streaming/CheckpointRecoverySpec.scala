package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.streaming.CountWindows.{Element, Firing}

/** Fault tolerance: a stateful query stopped and restarted from its
  * checkpoint resumes with its state intact — the count-window ring
  * buffer continues across the restart, and already-emitted firings
  * are not re-emitted (exactly-once sink contract).
  */
class CheckpointRecoverySpec extends SparkSuite {
  import spark.implicits._

  test("count-window state survives a stop/restart from checkpoint") {
    val dir = Files.createTempDirectory("graft_ckpt_src").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outDir = Files.createTempDirectory("graft_ckpt_out").toString

    def startQuery() =
      spark.readStream.schema("key LONG, ord LONG, id LONG, value DOUBLE")
        .parquet(dir)
        .as[Element]
        .transform(ds => CountWindows.slidingCountWindow(ds, size = 3, slide = 2))
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()

    // the file-stream source lists files directly under `dir` — write
    // each batch elsewhere and move its part-file in flat
    def addBatch(tag: String, elems: Seq[Element]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_ckpt_$tag")
      elems.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, java.nio.file.Paths.get(dir, s"$tag.parquet"))
    }

    // batch 1: 3 elements → firing at n=2 (1+2)
    addBatch("b1", Seq(Element(1L, 1L, 1L, 1.0), Element(1L, 2L, 2L, 2.0), Element(1L, 3L, 3L, 3.0)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the same checkpoint; batch 2: one more element →
    // n=4 fires with ring buffer (2,3,4) — state carried across restart
    addBatch("b2", Seq(Element(1L, 4L, 4L, 4.0)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).as[Firing].collect().sortBy(_.n_seen).toSeq
    assert(got === Seq(Firing(1L, 2L, 2, 3.0), Firing(1L, 4L, 3, 9.0)))
  }

  test("window-pane state survives a stop/restart; the pane fires once, complete") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import WindowPanes.{PaneElement, PaneRow}
    val dir = Files.createTempDirectory("graft_pane_src").toString
    val ckpt = Files.createTempDirectory("graft_pane_ckpt").toString
    val outDir = Files.createTempDirectory("graft_pane_out").toString
    val windowUs = 3600L * 1000000L

    def startQuery() =
      spark.readStream
        .schema("key LONG, win_start_us LONG, id LONG, value DOUBLE, ts TIMESTAMP")
        .parquet(dir)
        .withWatermark("ts", "0 seconds")
        .as[PaneElement]
        .groupByKey(e => (e.key, e.win_start_us))
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          WindowPanes.paneProcessor(windowUs))
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()

    def addBatch(tag: String, elems: Seq[PaneElement]): Unit = {
      val tmp = Files.createTempDirectory(s"graft_pane_$tag")
      elems.toDS().coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, java.nio.file.Paths.get(dir, s"$tag.parquet"))
    }
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

    // batch 1: two elements in the hour-0 window; watermark (00:20)
    // has not passed the window end, so the pane stays BUFFERED in
    // state and nothing is emitted
    addBatch("b1", Seq(
      PaneElement(7L, 0L, 1L, 1.5, ts(10)),
      PaneElement(7L, 0L, 2L, 2.5, ts(20))))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() === 0L, "pane must not fire before its window closes")

    // restart; batch 2: one hour-1 element pushes the watermark past
    // hour-0's end → the buffered pane (built BEFORE the restart)
    // fires exactly once, complete, with Flink's end−1ms metadata
    addBatch("b2", Seq(PaneElement(7L, windowUs, 3L, 9.0, ts(90))))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).as[PaneRow].collect().sortBy(_.id).toSeq
    assert(got === Seq(
      PaneRow(7L, 0L, 1L, 1.5, 2, windowUs - 1000L),
      PaneRow(7L, 0L, 2L, 2.5, 2, windowUs - 1000L)))
  }
}
