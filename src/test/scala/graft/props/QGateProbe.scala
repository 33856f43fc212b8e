package graft.sources.bucketed

/** Scratch runner: execute one SparkEntry query by name against a
  * testdata dir and print its rows — quick iteration on a single gate
  * without the full oracle sweep. args: <queryName> <sfDir> [passes]
  */
object QGateProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = args(1)
    val passes = if (args.length > 2) args(2).toInt else 1
    val spark = graft.GraftSession
      .builder("qgate-probe", "local[32]", shufflePartitions = 32).getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sf).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass $p: $sec%6.2f s rows=${rows.length}")
      rows.sortBy(_.toString).foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
