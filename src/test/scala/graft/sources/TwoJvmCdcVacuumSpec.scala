package graft.sources.bucketed

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Vacuum under a LIVE changefeed consumer (round 19 — composes the
  * round-18 pieces: TwoJvmVacuumRaceSpec races block reads,
  * TwoJvmReaderFollowSpec follows commits): a real second process
  * ([[CdcConsumerMain]]) follows the table's change feed one commit
  * window at a time while THIS process commits and vacuums.
  *
  *   - INSIDE the retention floor the feed completes EXACTLY-ONCE:
  *     every committed change appears in exactly one window with the
  *     exact count, and a floored vacuum between the consumer's
  *     windows deletes nothing it still needs.
  *   - OUTSIDE the floor the consumer fails LOUDLY mid-feed with the
  *     named vacuum error at its next base fetch — never a silently
  *     truncated feed.
  *   - A consumer RESUMING from a vacuumed offset fails at plan time
  *     with the named CDC-overlaps-vacuumed-history error.
  */
class TwoJvmCdcVacuumSpec extends SparkSuite {
  import spark.implicits._

  private def forkConsumer(dir: Path, name: String, startV: Long,
      windows: Int, pauseMs: Long, outFile: Path): Process = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.bucketed.CdcConsumerMain",
      dir.toString, name, startV.toString, windows.toString, pauseMs.toString)).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    pb.redirectOutput(outFile.toFile)
    pb.start()
  }

  private def awaitLine(outFile: Path, marker: String, timeoutS: Int = 60): Unit = {
    val deadline = System.nanoTime() + timeoutS * 1000000000L
    while (System.nanoTime() < deadline) {
      if (Files.exists(outFile) &&
        new String(Files.readAllBytes(outFile)).contains(marker)) return
      Thread.sleep(20)
    }
    fail(s"consumer never printed '$marker': " +
      (if (Files.exists(outFile)) new String(Files.readAllBytes(outFile)) else "<no output>"))
  }

  test("LIVE: inside the floor a foreign changefeed completes exactly-once across a vacuum") {
    val name = "cdcvac_in"
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (0 until 400).map(i => (i.toLong, i * 1.5)).toDF("k", "v"), "k", 4)
    val v0 = BucketStore.currentVersion(name)
    val dir = BucketStore.tableDir(name)
    val out = Files.createTempFile("graft_cdcvac_in", ".log")
    val proc = forkConsumer(dir, name, v0, windows = 2, pauseMs = 300, out)
    try {
      awaitLine(out, "CDC OPEN")
      BucketStore.deleteWhere(name, _.getLong(0) < 100) // v1: 100 deletes
      val v1 = BucketStore.currentVersion(name)
      awaitLine(out, s"CDC WINDOW v$v0->v$v1")
      // the consumer is mid-feed (paused): a FLOORED vacuum now —
      // everything is young, nothing it needs may drop
      assert(BucketStore.vacuum(name, 1, minAgeMs = 60L * 60 * 1000) === 0)
      BucketStore.deleteWhere(name, r => r.getLong(0) >= 100 && r.getLong(0) < 150) // v2: 50
      val v2 = BucketStore.currentVersion(name)
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "consumer hung")
      val log = new String(Files.readAllBytes(out))
      assert(proc.exitValue() === 0, s"the feed must complete inside the floor:\n$log")
      // exactly-once: each committed change in exactly one window,
      // with the exact count — no duplicates, no silent truncation
      assert(log.contains(s"CDC WINDOW v$v0->v$v1 ins=0 del=100"), log)
      assert(log.contains(s"CDC WINDOW v$v1->v$v2 ins=0 del=50"), log)
      assert(log.contains("CDC DONE ins=0 del=150"), log)
      assert(log.linesIterator.count(_.startsWith("CDC WINDOW")) === 2, log)
    } finally {
      proc.destroyForcibly(): Unit
      BucketStore.drop(name)
    }
  }

  test("LIVE: an unfloored vacuum mid-feed fails the consumer LOUDLY; resume is loud too") {
    val name = "cdcvac_out"
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (0 until 400).map(i => (i.toLong, i * 1.5)).toDF("k", "v"), "k", 4)
    val v0 = BucketStore.currentVersion(name)
    val dir = BucketStore.tableDir(name)
    BucketStore.deleteWhere(name, _.getLong(0) < 100) // v1 exists before the fork
    val v1 = BucketStore.currentVersion(name)
    val out = Files.createTempFile("graft_cdcvac_out", ".log")
    // a long pause after window 1 gives the parent its mid-feed slot
    val proc = forkConsumer(dir, name, v0, windows = 2, pauseMs = 3000, out)
    try {
      awaitLine(out, s"CDC WINDOW v$v0->v$v1")
      // during the consumer's pause: a new commit, then an UNFLOORED
      // vacuum drops v0 and v1 — the base blocks of the consumer's
      // NEXT diff step go away under it
      BucketStore.deleteWhere(name, r => r.getLong(0) >= 100 && r.getLong(0) < 150) // v2
      val v2 = BucketStore.currentVersion(name)
      assert(BucketStore.vacuum(name, 1, minAgeMs = 0L) > 0)
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "consumer hung")
      val log = new String(Files.readAllBytes(out))
      assert(proc.exitValue() === 3,
        s"a mid-feed consumer staler than the floor must fail with the NAMED error:\n$log")
      assert(log.contains("CDC STALE"), log)
      assert(log.contains("vacuum") && log.contains("min_age_ms"),
        s"the failure must name the cause and the remedy:\n$log")
      assert(!log.contains("CDC DONE"), s"the stale feed must NOT complete:\n$log")

      // RESUME leg: a fresh consumer restarting from the vacuumed
      // offset (the checkpoint it held) fails at PLAN time with the
      // named CDC error — cross-process, from the consuming side
      val out2 = Files.createTempFile("graft_cdcvac_resume", ".log")
      val proc2 = forkConsumer(dir, name, v1, windows = 1, pauseMs = 10, out2)
      try {
        assert(proc2.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "resume hung")
        val log2 = new String(Files.readAllBytes(out2))
        assert(proc2.exitValue() === 4,
          s"resuming from a vacuumed offset must fail at plan time:\n$log2")
        assert(log2.contains("CDC RESUME-STALE") && log2.contains("MVCC window"), log2)
        assert(!log2.contains("CDC WINDOW"), s"no window may be served:\n$log2")
      } finally proc2.destroyForcibly(): Unit
      assert(v2 > v1) // silence unused warning; v2 documented the head
    } finally {
      proc.destroyForcibly(): Unit
      BucketStore.drop(name)
    }
  }
}
