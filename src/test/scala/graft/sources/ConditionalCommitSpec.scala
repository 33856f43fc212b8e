package graft.sources.bucketed

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The commit protocol's CROSS-PROCESS half (round 16): the manifest
  * write is a filesystem compare-and-swap — `manifest-v{n}.json` is
  * created-if-absent, never replaced — so two writers racing one
  * directory produce exactly one winner; the loser surfaces as
  * [[BucketStore.ConcurrentWriteException]] and a retry allocates a
  * version past the directory head (the commit-time counter seeding).
  * Plus the restart-with-branches hardening: a base-only reopen must
  * neither clobber nor garbage-collect the un-reopened branch's
  * manifests/files, and a failed publish must roll back the
  * idempotent-write mark it recorded (a retry is never a silent no-op).
  */
class ConditionalCommitSpec extends SparkSuite {
  import spark.implicits._

  private def scan(t: String) =
    spark.read.format("graft-buckets").option("table", t).load()

  private def mk(name: String, n: Int = 16, buckets: Int = 2): Unit = {
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (1 to n).map(i => (i.toLong, s"tag-$i", i * 1.5)).toDF("k", "tag", "v"),
      "k", buckets)
  }

  test("writeManifest is a CAS: the same version committed twice refuses the second write") {
    mk("cas_unit", n = 8, buckets = 2)
    val t = BucketStore.get("cas_unit")
    val scratch = Files.createTempDirectory("graft-cas-unit-")
    val cfg = FileStore.TableConfig(BucketStore.CopyOnWrite, None, Map.empty, Set.empty)
    FileStore.writeManifest(scratch, "cas_unit", t, Map.empty, None, t.version, cfg)
    val ex = intercept[BucketStore.ConcurrentWriteException] {
      FileStore.writeManifest(scratch, "cas_unit", t, Map.empty, None, t.version, cfg)
    }
    assert(ex.getMessage.contains(s"v${t.version}"))
    // no torn temp file left behind by the loser
    assert(!Files.list(scratch).iterator().asScala.exists(_.getFileName.toString.endsWith(".tmp")))
    // replace mode (refreshManifestStats' path) still rewrites in place
    FileStore.writeManifest(scratch, "cas_unit", t, Map.empty, None, t.version, cfg,
      replace = true)
    BucketStore.drop("cas_unit")
  }

  test("a second writer owning the directory head: publish loses loudly, leaves no trace, retry wins") {
    mk("cas_race", n = 16, buckets = 2)
    val name = "cas_race"
    val dir = BucketStore.tableDir(name)
    val v = BucketStore.currentVersion(name)
    // simulated SECOND PROCESS: a manifest lands in the directory at a
    // version past anything this JVM has allocated (the pre-flight and
    // the CAS both key on the filename)
    val foreign = v + 1000000L
    Files.copy(dir.resolve(s"manifest-v$v.json"), dir.resolve(s"manifest-v$foreign.json"))
    val writesBefore = FileStore.filesWritten.get()
    intercept[BucketStore.ConcurrentWriteException] {
      BucketStore.deleteWhere(name, _.getLong(0) == 1L)
    }
    // the loser left NO trace: no heap publish, no block files spilled
    assert(BucketStore.currentVersion(name) === v, "a lost commit must not publish in heap")
    assert(FileStore.filesWritten.get() === writesBefore,
      "the pre-flight must fire before any block spill")
    assert(scan(name).filter(col("k") === 1L).count() === 1L)
    // the retry allocates a version PAST the directory head and lands
    BucketStore.deleteWhere(name, _.getLong(0) == 1L)
    assert(BucketStore.currentVersion(name) > foreign,
      "the retry's version must clear the foreign head")
    assert(scan(name).filter(col("k") === 1L).count() === 0L)
    assert(Files.exists(dir.resolve(s"manifest-v${BucketStore.currentVersion(name)}.json")))
    BucketStore.drop(name)
  }

  test("a failed publish rolls back the idempotent-write mark: the retry applies, never a no-op") {
    mk("cas_txn", n = 8, buckets = 1)
    val name = "cas_txn"
    val dir = BucketStore.tableDir(name)
    val v = BucketStore.currentVersion(name)
    Files.copy(dir.resolve(s"manifest-v$v.json"), dir.resolve(s"manifest-v${v + 1000000L}.json"))
    val epoch = BucketStore.get(name).layoutEpoch
    val batch: Array[Array[Row]] = Array(Array(Row(100L, "t-100", 1.0)))
    intercept[BucketStore.ConcurrentWriteException] {
      BucketStore.commitWrite(name, batch, truncate = false, epoch, txn = Some(("app", 7L)))
    }
    assert(BucketStore.txnVersionOf(name, "app").isEmpty,
      "a failed publish must not leave the batch marked applied")
    // the legitimate retry of the SAME (appid, version) must land —
    // before the rollback it was silently skipped as a duplicate
    BucketStore.commitWrite(name, batch, truncate = false, epoch, txn = Some(("app", 7L)))
    assert(BucketStore.txnVersionOf(name, "app") === Some(7L))
    assert(scan(name).count() === 9L)
    // and the idempotency contract still holds for a REAL duplicate
    BucketStore.commitWrite(name, batch, truncate = false, epoch, txn = Some(("app", 7L)))
    assert(scan(name).count() === 9L)
    BucketStore.drop(name)
  }

  test("base-only restart: branch manifests survive base publishes, retention GC, and reopen intact") {
    val base = "cas_boot"
    mk(base, n = 32, buckets = 4)
    BucketStore.createBranch(base, "keep")
    val bname = BucketStore.branchName(base, "keep")
    // a branch-only commit so the branch owns a block file of its own
    BucketStore.deleteWhere(bname, _.getLong(0) == 3L)
    val branchHead = BucketStore.currentVersion(bname)
    val wantBranch = scan(bname).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val dir = BucketStore.unload(base).get
    val branchManifest = dir.resolve(s"manifest-v$branchHead.json")
    val branchBytes = Files.readAllBytes(branchManifest).toSeq
    BucketStore.unload(bname)

    // "restart" that reopens ONLY the base lineage
    BucketStore.openFromDisk(base, dir)
    BucketStore.deleteWhere(base, _.getLong(0) == 1L)
    assert(BucketStore.currentVersion(base) > branchHead,
      "publishes after a base-only reopen must allocate versions past EVERY lineage on disk")
    // roll the base past the MVCC window so publish-time retention GC fires
    (1 to BucketStore.RetainedVersions + 4).foreach { i =>
      BucketStore.deleteWhere(base, _.getLong(0) == 100000L + i) // matches nothing; publishes
    }
    assert(Files.exists(branchManifest),
      "retention GC must not collect an UNLOADED lineage's manifests")
    assert(Files.readAllBytes(branchManifest).toSeq === branchBytes,
      "the un-reopened branch's manifest must survive byte-identical")

    // the branch reopens from disk and reads back hash-identical
    BucketStore.openFromDisk(bname, dir)
    val gotBranch = scan(bname).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotBranch === wantBranch)
    BucketStore.drop(base)
  }

  test("refresh-and-retry: a foreign commit is absorbed automatically and the retry composes on top") {
    import java.nio.charset.StandardCharsets.UTF_8
    mk("cas_refresh", n = 16, buckets = 2)
    val name = "cas_refresh"
    val dir = BucketStore.tableDir(name)
    val v = BucketStore.currentVersion(name)
    // a CONSISTENT foreign commit: the head snapshot republished at a
    // higher version by "another process" — content version matches
    // the filename, commit stamp advanced (it re-references our files,
    // exactly what a foreign writer's COW commit does)
    val head = new String(Files.readAllBytes(dir.resolve(s"manifest-v$v.json")), UTF_8)
    val ts = BucketStore.get(name).commitTs
    val foreignV = v + 1000L
    val foreign = head
      .replace(s""""version":$v,"firstVersion"""", s""""version":$foreignV,"firstVersion"""")
      .replace(s""""commitTs":$ts""", s""""commitTs":${ts + 1000000L}""")
    assert(foreign != head, "the foreign manifest must actually differ")
    Files.write(dir.resolve(s"manifest-v$foreignV.json"), foreign.getBytes(UTF_8))
    // the local commit loses the race...
    intercept[BucketStore.ConcurrentWriteException] {
      BucketStore.deleteWhere(name, _.getLong(0) == 1L)
    }
    // ...and the loser has ALREADY absorbed the foreign head
    assert(BucketStore.currentVersion(name) === foreignV,
      "the conflict path must refresh the heap to the foreign head")
    assert(BucketStore.refreshFromDisk(name) === 0, "nothing further to absorb")
    // the foreign snapshot shares OUR block instances by path (COW
    // identity survives the refresh — the heap cache is not duplicated)
    val foreignSnap = BucketStore.snapshot(name, foreignV)
    val origSnap = BucketStore.snapshot(name, v)
    (0 until 2).foreach(b =>
      assert(foreignSnap.buckets.sharesWith(origSnap.buckets, b),
        s"bucket $b must share storage with the original snapshot"))
    // the PLAIN retry lands on top of the foreign commit
    BucketStore.deleteWhere(name, _.getLong(0) == 1L)
    assert(BucketStore.currentVersion(name) > foreignV)
    assert(scan(name).count() === 15L)
    assert(BucketStore.retained(name).contains(foreignV),
      "the absorbed foreign version stays time-travel readable")
    BucketStore.drop(name)
  }

  test("the changefeed crosses an absorbed foreign commit: zero net delta, retry's events intact") {
    import java.nio.charset.StandardCharsets.UTF_8
    mk("cas_cdcref", n = 16, buckets = 2)
    val name = "cas_cdcref"
    val dir = BucketStore.tableDir(name)
    val v = BucketStore.currentVersion(name)
    val head = new String(Files.readAllBytes(dir.resolve(s"manifest-v$v.json")), UTF_8)
    val ts = BucketStore.get(name).commitTs
    val foreignV = v + 1000L
    Files.write(dir.resolve(s"manifest-v$foreignV.json"), head
      .replace(s""""version":$v,"firstVersion"""", s""""version":$foreignV,"firstVersion"""")
      .replace(s""""commitTs":$ts""", s""""commitTs":${ts + 1000000L}""")
      .getBytes(UTF_8))
    intercept[BucketStore.ConcurrentWriteException] {
      BucketStore.deleteWhere(name, _.getLong(0) == 2L)
    }
    BucketStore.deleteWhere(name, _.getLong(0) == 2L) // retry lands past foreignV
    val retryV = BucketStore.currentVersion(name)
    // batch CDC over (v, head]: the foreign commit shares every block
    // with v (COW identity survived the refresh), so it nets to ZERO
    // change events; the retry's delete is the only delta
    val changes = spark.read.format("graft-buckets").option("table", name)
      .option("mode", "cdc").option("changesstart", v.toString).load()
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col(CdcSchema.ChangeType),
        org.apache.spark.sql.functions.col(CdcSchema.CommitVersion))
      .collect()
    assert(changes.length === 1,
      s"an identical absorbed commit must net to zero events; got ${changes.toSeq}")
    assert(changes.head.getLong(0) === 2L)
    assert(changes.head.getString(1) === CdcSchema.Delete)
    assert(changes.head.getLong(2) === retryV)
    BucketStore.drop(name)
  }

  test("a torn publish (blocks spilled, manifest never landed) is ignored at reopen and swept by GC") {
    mk("cas_torn", n = 16, buckets = 2)
    val name = "cas_torn"
    val dir = BucketStore.tableDir(name)
    // simulate a crash between the block spill and the manifest CAS:
    // an orphan block file that NO manifest references
    val someBlock = Files.list(dir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val orphan = dir.resolve("b9-v999999.parquet")
    Files.copy(someBlock, orphan)
    // a restart reads THROUGH the manifests — the orphan is invisible
    val tdir = BucketStore.unload(name).get
    BucketStore.openFromDisk(name, tdir)
    assert(scan(name).count() === 16L)
    // the next trim's GC sweeps the orphan (unreferenced by any root)
    BucketStore.deleteWhere(name, _.getLong(0) == 1L) // a second version to drop
    BucketStore.vacuum(name, 1)
    assert(!Files.exists(orphan), "vacuum GC must sweep a torn publish's orphan files")
    assert(scan(name).count() === 15L)
    BucketStore.drop(name)
  }

  test("analyze succeeds while a WAP branch holds a higher-versioned manifest in the shared dir") {
    mk("cas_analyze", n = 16, buckets = 2)
    val name = "cas_analyze"
    BucketStore.createBranch(name, "wip")
    // the branch fork published at base-head+1 in the SAME directory;
    // analyze rewrites the BASE's current version in place — its
    // pre-flight must compare against this lineage's own head, not the
    // directory-wide filename max (which would conflict forever)
    assert(FileStore.maxManifestVersion(BucketStore.tableDir(name)) >
      BucketStore.currentVersion(name), "precondition: the branch owns the directory head")
    BucketStore.registerStatColumns(name, Seq("v"))
    BucketStore.refreshManifestStats(name) // threw ConcurrentWriteException before the fix
    // the rewritten manifest carries the stat registration durably
    val dir = BucketStore.unload(name).get
    BucketStore.openFromDisk(name, dir)
    assert(BucketStore.statColumnsOf(name).contains("v"))
    // a REAL foreign commit to this lineage still conflicts analyze
    val v = BucketStore.currentVersion(name)
    import java.nio.charset.StandardCharsets.UTF_8
    val head = new String(Files.readAllBytes(dir.resolve(s"manifest-v$v.json")), UTF_8)
    val foreignV = v + 1000L
    Files.write(dir.resolve(s"manifest-v$foreignV.json"), head
      .replace(s""""version":$v,"firstVersion"""", s""""version":$foreignV,"firstVersion"""")
      .getBytes(UTF_8))
    intercept[BucketStore.ConcurrentWriteException] {
      BucketStore.refreshManifestStats(name)
    }
    BucketStore.drop(name)
  }

  test("a deleted branch's recreated manifest path reports the NEW lineage (cache invalidation)") {
    import java.nio.charset.StandardCharsets.UTF_8
    val base = "cas_reuse"
    mk(base, n = 8, buckets = 2)
    BucketStore.createBranch(base, "dead")
    val bname = BucketStore.branchName(base, "dead")
    val bv = BucketStore.currentVersion(bname)
    val dir = BucketStore.tableDir(base)
    val reused = dir.resolve(s"manifest-v$bv.json")
    // warm the name cache at the branch's path, then drop the branch
    assert(FileStore.manifestIndex(dir).contains((bname, bv)))
    assert(BucketStore.dropBranch(base, "dead"))
    assert(!Files.exists(reused))
    // "another process" (independent version counter) re-allocates the
    // GC'd version for a DIFFERENT lineage at the exact same path
    val v = BucketStore.currentVersion(base)
    val head = new String(Files.readAllBytes(dir.resolve(s"manifest-v$v.json")), UTF_8)
    Files.write(reused, head
      .replace(s""""name":"$base"""", s""""name":"other_lineage"""")
      .replace(s""""version":$v,"firstVersion"""", s""""version":$bv,"firstVersion"""")
      .getBytes(UTF_8))
    assert(FileStore.manifestIndex(dir).contains(("other_lineage", bv)),
      "a stale path->name cache entry would report the DEAD branch here, " +
        "mis-rooting GC against the live foreign lineage")
    BucketStore.drop(base)
  }

  test("rollback after a failed publish keeps a same-app-id foreign mark absorbed mid-conflict") {
    import java.nio.charset.StandardCharsets.UTF_8
    mk("cas_txn_foreign", n = 8, buckets = 1)
    val name = "cas_txn_foreign"
    val dir = BucketStore.tableDir(name)
    val v = BucketStore.currentVersion(name)
    val ts = BucketStore.get(name).commitTs
    // a failover instance of the SAME app committed batch 9 in another
    // process: the foreign manifest carries txns {app: 9}
    val head = new String(Files.readAllBytes(dir.resolve(s"manifest-v$v.json")), UTF_8)
    val foreignV = v + 1000L
    Files.write(dir.resolve(s"manifest-v$foreignV.json"), head
      .replace(s""""version":$v,"firstVersion"""", s""""version":$foreignV,"firstVersion"""")
      .replace(s""""commitTs":$ts""", s""""commitTs":${ts + 1000000L}""")
      .replace(""""txns":{}""", """"txns":{"app":9}""")
      .getBytes(UTF_8))
    val epoch = BucketStore.get(name).layoutEpoch
    val batch: Array[Array[Row]] = Array(Array(Row(200L, "t-200", 2.0)))
    // our commit of batch 7 loses the race; the conflict path absorbs
    // the foreign head (and with it the app's mark 9)
    intercept[BucketStore.ConcurrentWriteException] {
      BucketStore.commitWrite(name, batch, truncate = false, epoch, txn = Some(("app", 7L)))
    }
    assert(BucketStore.txnVersionOf(name, "app") === Some(9L),
      "the rollback must not discard the absorbed foreign high-water mark")
    // a replay of the foreign batch 9 through THIS process stays a no-op
    BucketStore.commitWrite(name, batch, truncate = false, epoch, txn = Some(("app", 9L)))
    assert(scan(name).count() === 8L, "foreign batch 9 must not re-apply as a duplicate")
    BucketStore.drop(name)
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
