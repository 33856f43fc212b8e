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
}
