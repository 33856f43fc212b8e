package graft.sources.bucketed

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** AUTO-COMPACTION raced against a LIVE foreign reader (round 20 —
  * the last mutation path never proven cross-process; commits, reads,
  * vacuum, and the changefeed have TwoJvm siblings). The policy fold
  * (`maybeAutoCompact` → compact → publish, all inside the statement
  * that crossed the ratio) rewrites every MoR bucket's base file; a
  * second process mid-scan on the PRE-fold snapshot must see either
  * the pre- or post-fold snapshot, never a mix, and never the named
  * vacuum error — compaction must leave rooted what a retained
  * version still references. MVCC makes this structural (immutable
  * uniquely-named block files; the fold writes NEW files), and this
  * spec makes it observed: the foreign fold of base ⊖ deleted is
  * byte-exact mid-race.
  */
class TwoJvmAutoCompactRaceSpec extends SparkSuite {
  import spark.implicits._

  private def forkReader(dir: Path, name: String, version: Long,
      pauseMs: Long, outFile: Path): Process = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.bucketed.CompactionReaderMain",
      dir.toString, name, version.toString, pauseMs.toString)).asJava
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
    fail(s"reader never printed '$marker': " +
      (if (Files.exists(outFile)) new String(Files.readAllBytes(outFile)) else "<no output>"))
  }

  test("LIVE: auto-compaction mid-scan — the foreign reader's pre-fold snapshot stays exact") {
    val name = "acrace"
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (0 until 800).map(i => (i.toLong, i * 1.5)).toDF("k", "v"), "k", 4)
    BucketStore.setDmlMode(name, BucketStore.MergeOnRead)
    val (ratio0, min0) = (BucketStore.autoCompactRatioPct, BucketStore.autoCompactMinRows)
    try {
      // stage MoR state WITHOUT tripping the policy: the pre-fold
      // snapshot the foreign reader will pin carries live deltas
      BucketStore.autoCompactRatioPct = Int.MaxValue
      BucketStore.deleteWhere(name, _.getLong(0) % 10 == 0)
      val vPre = BucketStore.currentVersion(name)
      assert(BucketStore.get(name).mor.nonEmpty, "the pinned snapshot must carry MoR state")
      val preKeys = (0 until 800).filter(_ % 10 != 0).map(_.toLong)
      val dir = BucketStore.tableDir(name)
      val out = Files.createTempFile("graft_acrace", ".log")
      val proc = forkReader(dir, name, vPre, pauseMs = 400, out)
      try {
        awaitLine(out, "READ 0") // provably mid-scan, three buckets to go
        // arm the policy: this delete crosses the ratio, so the SAME
        // statement folds every MoR bucket, rewrites base files, and
        // publishes — while the foreign reader is mid-fold on vPre
        BucketStore.autoCompactRatioPct = 1
        BucketStore.autoCompactMinRows = 1
        BucketStore.deleteWhere(name, _.getLong(0) % 10 == 1)
        assert(BucketStore.get(name).mor.isEmpty,
          "the policy must have folded in-statement")
        assert(BucketStore.currentVersion(name) > vPre, "the fold must have published")
        assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "reader hung")
        val log = new String(Files.readAllBytes(out))
        assert(proc.exitValue() === 0,
          s"a current reader must survive an auto-compaction untouched:\n$log")
        assert(log.contains(s"READER DONE count=${preKeys.size} sum=${preKeys.sum}"),
          s"the foreign fold of the PRE-compaction snapshot must be exact, never a mix:\n$log")
        assert(!log.contains("READER STALE"),
          s"compaction must never surface as a vacuum error to a rooted reader:\n$log")
      } finally proc.destroyForcibly(): Unit

      // and a foreign reader opening at the POST-fold head sees exactly
      // the folded table (clean buckets, no MoR state to replay)
      val vPost = BucketStore.currentVersion(name)
      val postKeys = (0 until 800).filter(i => i % 10 != 0 && i % 10 != 1).map(_.toLong)
      val out2 = Files.createTempFile("graft_acrace_post", ".log")
      val proc2 = forkReader(dir, name, vPost, pauseMs = 0, out2)
      try {
        assert(proc2.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "post reader hung")
        val log2 = new String(Files.readAllBytes(out2))
        assert(proc2.exitValue() === 0, log2)
        assert(log2.contains(s"READER DONE count=${postKeys.size} sum=${postKeys.sum}"),
          s"the post-fold snapshot must serve the folded rows exactly:\n$log2")
      } finally proc2.destroyForcibly(): Unit
    } finally {
      BucketStore.autoCompactRatioPct = ratio0
      BucketStore.autoCompactMinRows = min0
      BucketStore.drop(name)
    }
  }
}
