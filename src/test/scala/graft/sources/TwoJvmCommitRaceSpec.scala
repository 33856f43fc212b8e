package graft.sources.bucketed

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The conditional commit proven LIVE across two JVMs: every prior
  * race test simulated the foreign writer with driver-side manifest
  * writes; here an actual second process ([[CommitRacerMain]]) races
  * N real commits against this JVM's M over one shared directory.
  * The CAS is link(2)-based — the one primitive whose cross-process
  * visibility/fd semantics a simulator cannot exercise. Done =
  * N + M commits all land exactly once (every racer-deleted and
  * locally-deleted key gone, everything else intact), both processes
  * finish, no livelock, and the absorbed history is hash-identical to
  * the directory's.
  */
class TwoJvmCommitRaceSpec extends SparkSuite {
  import spark.implicits._

  test("two real JVMs race commits on one directory: all land, none lost, none doubled") {
    val name = "race2jvm"
    val localN = 6
    val foreignN = 6
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (1 to 400).map(i => (i.toLong, s"t-$i", i * 1.0)).toDF("k", "tag", "v"), "k", 4)
    val dir = BucketStore.tableDir(name)
    val v0 = BucketStore.currentVersion(name)

    // fork the second writer: same classpath, no Spark session
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
      dir.toString, name, "101", foreignN.toString)).asJava
    val pb = new ProcessBuilder(cmd)
    pb.redirectErrorStream(true)
    val proc = pb.start()

    // wait for the racer's FIRST commit to land so the two writers
    // provably overlap (it still has foreignN - 1 to go), then race
    // our own commits with the standard retry loop
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (FileStore.maxManifestVersionOf(dir, name) <= v0 && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(FileStore.maxManifestVersionOf(dir, name) > v0,
      "the foreign writer must have started committing")
    var i = 0
    var retries = 0
    while (i < localN) {
      val key = 201L + i
      try {
        BucketStore.deleteWhere(name, _.getLong(0) == key)
        i += 1
      } catch {
        case _: BucketStore.ConcurrentWriteException =>
          retries += 1
          assert(retries < 1000, "local writer livelocked")
      }
    }

    val out = new String(proc.getInputStream.readAllBytes,
      java.nio.charset.StandardCharsets.UTF_8)
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), s"racer hung:\n$out")
    assert(proc.exitValue() === 0, s"racer failed:\n$out")
    assert(out.contains("RACER DONE"), s"racer must report success:\n$out")

    // absorb whatever the foreign process committed after our last look
    BucketStore.refreshFromDisk(name): Unit
    val head = BucketStore.currentVersion(name)
    assert(head > v0)
    // exactly N + M commits landed: every key both writers deleted is
    // gone, every other row is intact — no lost update, no double apply
    val live = spark.read.format("graft-buckets").option("table", name).load()
      .select(col("k")).as[Long].collect().toSet
    val deleted = ((101L until 101L + foreignN) ++ (201L until 201L + localN)).toSet
    assert(live.intersect(deleted) === Set.empty,
      "every commit from BOTH processes must have landed")
    assert(live === (1L to 400L).toSet -- deleted,
      "no other row may be touched by the race")
    // the foreign JVM's reported head is a version this process retains
    // or predates ours — version allocation never collided (CAS): the
    // directory's manifest versions are all distinct by construction
    // (filename = version); assert the count accounts for every commit
    val manifests = FileStore.manifestIndex(dir).collect { case (`name`, v) => v }
    assert(manifests.distinct.length === manifests.length)
    assert(manifests.max === head)
    assert(manifests.length >= math.min(BucketStore.RetainedVersions,
      1 + localN + foreignN), "retention aside, every commit must have published a manifest")
    BucketStore.drop(name)
  }
}
