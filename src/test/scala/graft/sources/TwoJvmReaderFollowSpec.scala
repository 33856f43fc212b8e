package graft.sources.bucketed

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The READ side of the cross-process protocol proven LIVE (round 18;
  * the write side is [[TwoJvmCommitRaceSpec]]): q262 and the recovery
  * specs simulate a foreign writer with withheld engine-produced
  * manifests — here an actual second JVM ([[CommitRacerMain]], paced)
  * lands real commits while THIS process follows them under
  * `refresh_policy`, through both surfaces at once:
  *
  *   - a STREAMING changefeed whose offset discovery re-lists the
  *     shared directory per staleness window, and
  *   - BATCH scans that absorb the foreign head at plan time.
  *
  * The re-listing rides the same link(2)-published manifests the race
  * spec proved, but from the CONSUMING side: mtime/fd semantics of
  * directory listings under concurrent publishes. Done = the reader
  * provably observes the sequence mid-flight (a strict prefix first),
  * every foreign delete is delivered EXACTLY once, and the folded feed
  * reproduces the final table.
  */
class TwoJvmReaderFollowSpec extends SparkSuite {
  import spark.implicits._

  test("a reader JVM follows a LIVE foreign writer: exactly-once feed, plan-time batch absorb") {
    val name = "follow2jvm"
    val foreignN = 6
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (1 to 300).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), "k", 4)
    val dir = BucketStore.tableDir(name)
    val v0 = BucketStore.currentVersion(name)
    BucketStore.setRefreshPolicy(name, 0L) // follow: re-list every planning/offset step
    val ckpt = Files.createTempDirectory("graft_follow_ckpt").toString
    val outDir = Files.createTempDirectory("graft_follow_out").toString
    def drainFeed(): Unit = {
      val q = spark.readStream.format("graft-buckets")
        .option("table", name).option("mode", "cdc").load()
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def feedDeletes(): Array[Long] = spark.read.parquet(outDir)
      .filter(col(CdcSchema.ChangeType) === CdcSchema.Delete)
      .select(col("k")).as[Long].collect()
    drainFeed() // the CREATE window: 300 inserts, no deletes yet
    assert(feedDeletes().isEmpty)

    // fork the PACED writer: 6 commits deleting keys 101..106, 2 s
    // apart — slow enough that the first drain below provably catches
    // a strict prefix of the sequence
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.bucketed.CommitRacerMain",
      dir.toString, name, "101", foreignN.toString, "2000")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    try {
      // wait for the writer's FIRST commit, then follow mid-flight
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (FileStore.maxManifestVersionOf(dir, name) <= v0 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(FileStore.maxManifestVersionOf(dir, name) > v0,
        "the foreign writer must have started committing")
      drainFeed()
      val mid = feedDeletes()
      assert(mid.nonEmpty, "the feed must deliver the foreign commits already landed")
      assert(mid.length < foreignN,
        s"the first drain must catch a STRICT prefix (writer still committing), got ${mid.length}")
      // a BATCH scan absorbs the foreign head at plan time — no CALL
      val midCount = spark.read.format("graft-buckets").option("table", name).load().count()
      assert(midCount <= 300L - mid.length,
        "a policy-following batch scan must see at least the commits the feed saw")

      val out = new String(proc.getInputStream.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8)
      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), s"writer hung:\n$out")
      assert(proc.exitValue() === 0, s"writer failed:\n$out")
      assert(out.contains("RACER DONE"), s"writer must report success:\n$out")

      // final drain: EVERY foreign delete delivered EXACTLY once
      drainFeed()
      val all = feedDeletes()
      assert(all.sorted.toSeq === (101L until 101L + foreignN).toSeq,
        s"each foreign delete exactly once, got ${all.sorted.mkString(",")}")
      // fold identity: replaying the feed reproduces the final table
      val events = spark.read.parquet(outDir)
      val isAdd = col(CdcSchema.ChangeType).isin(CdcSchema.Adds: _*)
      val live = events.groupBy(col("k"), col("v"))
        .agg(sum(when(isAdd, 1L).otherwise(-1L)).as("n"))
        .filter(col("n") > 0).select(col("k")).as[Long].collect().toSet
      BucketStore.refreshFromDisk(name): Unit
      val want = spark.read.format("graft-buckets").option("table", name).load()
        .select(col("k")).as[Long].collect().toSet
      assert(live === want, "the folded feed must reproduce the foreign-written table")
      assert(want === (1L to 300L).toSet -- (101L until 101L + foreignN).toSet)
    } finally {
      proc.destroyForcibly(): Unit
      BucketStore.clearRefreshPolicy(name)
      BucketStore.drop(name)
    }
  }
}
