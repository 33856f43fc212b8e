package graft.sources.bucketed

import org.apache.spark.sql.SparkSession

/** Scratch probe for the q146 rerep anomaly (round 19, verdict #5):
  * runs the index-lifecycle query repeatedly in one JVM and prints
  * per-pass wall time plus store I/O counter deltas, to separate the
  * harness's own cost (index build amortized after pass 1) from
  * end-of-suite environment effects (heap-cache eviction, GC).
  * Run manually with the test classpath; findings go to SCALE.md.
  */
object Q146Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession
      .builder("q146-probe", "local[32]", shufflePartitions = 32).getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    (1 to 4).foreach { pass =>
      val (fr0, vr0, fw0) =
        (FileStore.filesRead.get(), FileStore.vectorReads.get(), FileStore.filesWritten.get())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q146_index_lifecycle")(spark, sf).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass $pass: $sec%6.2f s rows=$n filesRead=${FileStore.filesRead.get() - fr0} " +
        f"vectorReads=${FileStore.vectorReads.get() - vr0} " +
        f"filesWritten=${FileStore.filesWritten.get() - fw0}")
      spark.catalog.clearCache()
      if (args.contains("evict")) {
        // model the end-of-suite state: the store's LRU evicted the
        // index blocks under later queries' heap pressure
        BucketStore.tableNames().foreach(n0 => BucketStore.evictTable(n0): Unit)
        println(s"pass $pass: evicted store tables")
      }
    }
    spark.stop()
  }
}
