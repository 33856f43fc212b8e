package graft.sources.bucketed

/** The FOREIGN READER of the live auto-compaction race
  * ([[TwoJvmAutoCompactRaceSpec]] forks this main): opens the shared
  * table directory, pins the requested (pre-fold, MoR-carrying)
  * snapshot in ITS OWN heap, then serves the snapshot's LIVE rows —
  * base blocks folded with the pinned merge-on-read state, exactly
  * what a second job scanning that version computes — slowly, pausing
  * between buckets so the parent's auto-compaction (fold + rewrite +
  * publish in one statement) lands mid-scan. Prints:
  *
  *   READER OPEN                       — snapshot pinned, scan starting
  *   READ <b> rows=<n>                 — one bucket folded and served
  *   READER DONE count=<n> sum=<s>     — full scan (exit 0); `sum` is
  *                                       the Σ of the key column, the
  *                                       parent's exactness check
  *   READER STALE <message>            — the NAMED vacuum error (exit 3)
  *
  * args: tableDir tableName version pauseMs
  */
object CompactionReaderMain {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val name = args(1)
    val version = args(2).toLong
    val pauseMs = args(3).toLong
    BucketStore.openFromDisk(name, dir)
    val snap = BucketStore.snapshot(name, version)
    println("READER OPEN")
    System.out.flush()
    var count = 0L
    var sum = 0L
    try {
      (0 until snap.buckets.length).foreach { b =>
        val rows = BucketStore.effectiveRows(snap, b)
        count += rows.length
        rows.foreach(r => sum += r.getLong(0))
        println(s"READ $b rows=${rows.length}")
        System.out.flush()
        Thread.sleep(pauseMs)
      }
      println(s"READER DONE count=$count sum=$sum")
    } catch {
      case e: FileStore.VacuumedFilesException =>
        println(s"READER STALE ${e.getMessage}")
        System.out.flush()
        sys.exit(3)
    }
  }
}
