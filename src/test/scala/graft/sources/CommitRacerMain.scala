package graft.sources.bucketed

/** The SECOND PROCESS of the live cross-process commit race
  * ([[TwoJvmCommitRaceSpec]] forks this main): opens the shared table
  * directory, lands `n` real commits (each deleting one distinct key),
  * riding the standard optimistic loop — lose the link(2) CAS, absorb
  * the foreign head ([[BucketStore.refreshFromDisk]] fires on the
  * conflict path), retry. No Spark session: the store substrate is
  * what's under test, exactly what a second ingest job exercises.
  *
  * args: tableDir tableName keyBase nCommits [pauseMsBetweenCommits]
  * (the optional pause paces the commit sequence so a FOLLOWING reader
  * — [[TwoJvmReaderFollowSpec]] — provably observes it mid-flight)
  */
object CommitRacerMain {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val name = args(1)
    val keyBase = args(2).toLong
    val n = args(3).toInt
    val pauseMs = if (args.length > 4) args(4).toLong else 0L
    BucketStore.openFromDisk(name, dir)
    var i = 0
    var retries = 0
    while (i < n) {
      val key = keyBase + i
      try {
        BucketStore.deleteWhere(name, _.getLong(0) == key)
        i += 1
        if (pauseMs > 0) Thread.sleep(pauseMs)
      } catch {
        case _: BucketStore.ConcurrentWriteException =>
          retries += 1
          if (retries > 1000) throw new IllegalStateException(
            s"racer livelocked after $retries lost races at commit $i")
      }
    }
    // the parent parses this line: final head + how contended it was
    println(s"RACER DONE version=${BucketStore.currentVersion(name)} retries=$retries")
  }
}
