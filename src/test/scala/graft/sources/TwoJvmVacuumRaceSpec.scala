package graft.sources.bucketed

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** The vacuum retention floor proven LIVE across two JVMs (round 18;
  * VacuumRetentionSpec proves the same contract with a captured
  * snapshot handle): a real second process ([[VacuumReaderMain]])
  * serves an OLD version from its own heap, reading blocks slowly
  * from the shared directory, while THIS process vacuums mid-scan.
  * Inside the floor the reader completes untouched; with no floor the
  * reader fails mid-scan with the NAMED error — the loud-never-silent
  * contract under real cross-process file deletion (unlink(2) between
  * another process's reads).
  */
class TwoJvmVacuumRaceSpec extends SparkSuite {
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
      "graft.sources.bucketed.VacuumReaderMain",
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

  private def mkTable(name: String): (Path, Long) = {
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (0 until 800).map(i => (i.toLong, i * 1.5)).toDF("k", "v"), "k", 4)
    val vOld = BucketStore.currentVersion(name)
    // COW delete rewrites buckets: vOld's files become collectible the
    // moment vOld leaves history
    BucketStore.deleteWhere(name, _.getLong(0) % 2 == 0)
    (BucketStore.tableDir(name), vOld)
  }

  test("LIVE: a foreign reader inside the floor completes while the writer vacuums") {
    val name = "vrace_in"
    val (dir, vOld) = mkTable(name)
    val out = Files.createTempFile("graft_vrace_in", ".log")
    val proc = forkReader(dir, name, vOld, pauseMs = 400, out)
    try {
      awaitLine(out, "READ 0") // mid-scan: first bucket served, three to go
      assert(BucketStore.vacuum(name, 1, minAgeMs = 60L * 60 * 1000) === 0)
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "reader hung")
      val log = new String(Files.readAllBytes(out))
      assert(proc.exitValue() === 0, s"reader must complete inside the floor:\n$log")
      assert(log.contains("READER DONE rows=800"), s"reader must serve its full snapshot:\n$log")
    } finally {
      proc.destroyForcibly(): Unit
      BucketStore.drop(name)
    }
  }

  test("LIVE: with no floor, a mid-scan foreign reader fails with the NAMED error") {
    val name = "vrace_out"
    val (dir, vOld) = mkTable(name)
    val out = Files.createTempFile("graft_vrace_out", ".log")
    val proc = forkReader(dir, name, vOld, pauseMs = 400, out)
    try {
      awaitLine(out, "READ 0") // the reader is provably mid-scan
      assert(BucketStore.vacuum(name, 1, minAgeMs = 0L) > 0)
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "reader hung")
      val log = new String(Files.readAllBytes(out))
      assert(proc.exitValue() === 3,
        s"a reader staler than the floor must fail loudly, not silently:\n$log")
      assert(log.contains("READER STALE"), log)
      assert(log.contains("vacuum") && log.contains("min_age_ms"),
        s"the failure must name the cause and the remedy:\n$log")
      assert(!log.contains("READER DONE"), s"the stale scan must NOT complete:\n$log")
    } finally {
      proc.destroyForcibly(): Unit
      BucketStore.drop(name)
    }
  }

  private def forkSweeper(dir: Path, name: String, outFile: Path): Process = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.bucketed.VacuumSweeperMain", dir.toString, name)).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    pb.redirectOutput(outFile.toFile)
    pb.start()
  }

  test("LIVE: the DURABLE floor governs a FOREIGN process's floor-less vacuum (round 19)") {
    // the ADVICE-high scenario made a live proof: the operator declares
    // retention ONCE; a different JVM — whose heap knows nothing — then
    // runs the floor-less sweep every process runs, and the floor it
    // honors can only have come from the manifest
    val name = "vrace_durable"
    val (dir, vOld) = mkTable(name)
    BucketStore.setVacuumFloor(name, 60L * 60 * 1000) // persists into the manifest
    val oldFile = BucketStore.snapshot(name, vOld).buckets.block(0).file.get
    val out = Files.createTempFile("graft_vrace_durable", ".log")
    val proc = forkSweeper(dir, name, out)
    try {
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "sweeper hung")
      val log = new String(Files.readAllBytes(out))
      assert(proc.exitValue() === 0, log)
      assert(log.contains(s"SWEEP floor=${60L * 60 * 1000}"),
        s"the foreign process must restore the declared floor from the manifest:\n$log")
      assert(log.contains("SWEEP DONE dropped=0"),
        s"a foreign floor-less vacuum must honor the durable floor:\n$log")
      assert(Files.exists(java.nio.file.Paths.get(oldFile.path)),
        "no file protected by the durable floor may be collected by a foreign sweep")
      // clearing the floor is durable too: the next foreign sweep trims
      BucketStore.clearVacuumFloor(name)
      val out2 = Files.createTempFile("graft_vrace_durable2", ".log")
      val proc2 = forkSweeper(dir, name, out2)
      try {
        assert(proc2.waitFor(60, java.util.concurrent.TimeUnit.SECONDS), "sweeper hung")
        val log2 = new String(Files.readAllBytes(out2))
        assert(proc2.exitValue() === 0, log2)
        assert(log2.contains("SWEEP floor=0"), log2)
        assert(!log2.contains("dropped=0"),
          s"with the floor cleared, the foreign sweep must trim count-based:\n$log2")
      } finally proc2.destroyForcibly(): Unit
    } finally {
      proc.destroyForcibly(): Unit
      BucketStore.drop(name)
    }
  }
}
