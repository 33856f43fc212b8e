package graft.sources.bucketed

/** The FOREIGN CHANGEFEED CONSUMER of the live vacuum-vs-changefeed
  * race ([[TwoJvmCdcVacuumSpec]] forks this main): opens the shared
  * table directory in ITS OWN heap, then follows the feed one commit
  * window at a time — discovering foreign commits by re-listing the
  * directory (refreshFromDisk), consuming each (from, to] step through
  * the REAL CDC machinery ([[CdcPlanner]] + [[CdcPartitionReader]]),
  * evicting between windows (a long-lived consumer does not pin every
  * historic block in heap), and pausing so the parent can vacuum
  * mid-feed. Prints lines the parent polls:
  *
  *   CDC OPEN                                   — directory opened
  *   CDC WINDOW v<a>-><b> ins=<i> del=<d>       — one commit consumed
  *   CDC DONE ins=<i> del=<d>                   — all windows consumed (exit 0)
  *   CDC STALE <msg>                            — vacuumed blocks mid-feed (exit 3)
  *   CDC RESUME-STALE <msg>                     — resume offset left the MVCC window (exit 4)
  *   CDC TIMEOUT                                — no new commit within 60 s (exit 5)
  *
  * args: tableDir tableName startVersion windows pauseMs
  */
object CdcConsumerMain {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val name = args(1)
    val startV = args(2).toLong
    val windows = args(3).toInt
    val pauseMs = args(4).toLong
    try {
      BucketStore.openFromDisk(name, dir)
      val schema = BucketStore.get(name).schema
      var cur = startV
      var totIns = 0L
      var totDel = 0L
      var done = 0
      println("CDC OPEN")
      System.out.flush()
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (done < windows) {
        if (System.nanoTime() > deadline) { println("CDC TIMEOUT"); sys.exit(5) }
        BucketStore.refreshFromDisk(name): Unit
        val nexts = BucketStore.retained(name).filter(_ > cur)
        if (nexts.isEmpty) Thread.sleep(25)
        else {
          val next = nexts.head
          val parts = CdcPlanner.plan(name, cur, next)
          var ins = 0L
          var del = 0L
          parts.foreach { p =>
            val r = new CdcPartitionReader(p.asInstanceOf[CdcInputPartition], schema, 256)
            while (r.next()) {
              val kind = r.get().getUTF8String(schema.length).toString
              if (CdcSchema.Adds.contains(kind)) ins += 1 else del += 1
            }
          }
          println(s"CDC WINDOW v$cur->v$next ins=$ins del=$del")
          System.out.flush()
          totIns += ins
          totDel += del
          cur = next
          done += 1
          BucketStore.evictTable(name): Unit
          Thread.sleep(pauseMs)
        }
      }
      println(s"CDC DONE ins=$totIns del=$totDel")
      System.out.flush()
    } catch {
      case e: FileStore.VacuumedFilesException =>
        println(s"CDC STALE ${e.getMessage}")
        System.out.flush()
        sys.exit(3)
      case e: IllegalArgumentException if e.getMessage != null &&
          (e.getMessage.contains("MVCC window") ||
            e.getMessage.contains("vacuumed history")) =>
        println(s"CDC RESUME-STALE ${e.getMessage}")
        System.out.flush()
        sys.exit(4)
    }
  }
}
