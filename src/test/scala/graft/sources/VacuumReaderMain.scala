package graft.sources.bucketed

/** The FOREIGN READER of the live cross-process vacuum race
  * ([[TwoJvmVacuumRaceSpec]] forks this main): opens the shared table
  * directory, pins the requested snapshot in ITS OWN heap (exactly
  * what a second job serving an old version holds), then reads the
  * snapshot's blocks SLOWLY — pausing between buckets so the parent
  * can vacuum mid-scan. Prints progress lines the parent polls:
  *
  *   READER OPEN                      — snapshot pinned, scan starting
  *   READ <b> rows=<n>                — one bucket served
  *   READER DONE rows=<total>         — scan completed (exit 0)
  *   READER STALE <message>           — the NAMED vacuum error (exit 3)
  *
  * args: tableDir tableName version pauseMs
  */
object VacuumReaderMain {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val name = args(1)
    val version = args(2).toLong
    val pauseMs = args(3).toLong
    BucketStore.openFromDisk(name, dir)
    val snap = BucketStore.snapshot(name, version)
    println("READER OPEN")
    System.out.flush()
    var total = 0L
    try {
      (0 until snap.buckets.length).foreach { b =>
        snap.buckets.block(b).file.filter(_.path.nonEmpty).foreach { f =>
          val rows = FileStore.readBlock(f).length
          total += rows
          println(s"READ $b rows=$rows")
          System.out.flush()
          Thread.sleep(pauseMs)
        }
      }
      println(s"READER DONE rows=$total")
    } catch {
      case e: FileStore.VacuumedFilesException =>
        println(s"READER STALE ${e.getMessage}")
        System.out.flush()
        sys.exit(3)
    }
  }
}
