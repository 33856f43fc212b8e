package graft.sources.bucketed

/** The FOREIGN SWEEPER of the durable-floor proof
  * ([[TwoJvmVacuumRaceSpec]] forks this main): a restarted/other
  * process opens the shared table directory and runs a FLOOR-LESS
  * vacuum — exactly the cross-process GC the durable retention floor
  * must govern. Whatever floor it honors can only have come from the
  * MANIFEST (this JVM's heap starts empty). Prints:
  *
  *   SWEEP floor=<ms>          — the floor restored at open
  *   SWEEP DONE dropped=<n>    — versions the floor-less vacuum dropped
  *
  * args: tableDir tableName
  */
object VacuumSweeperMain {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val name = args(1)
    BucketStore.openFromDisk(name, dir)
    println(s"SWEEP floor=${BucketStore.vacuumFloorOf(name)}")
    System.out.flush()
    val dropped = BucketStore.vacuum(name, 1) // floor-less: the restored floor governs
    println(s"SWEEP DONE dropped=$dropped")
    System.out.flush()
  }
}
