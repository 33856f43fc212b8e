package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dev profiling aid: time labeled stages of a query end-to-end.
  * `Profile <sfDir> <queryName> [reps]` prints per-rep wall times plus
  * the physical plan, so plan regressions (lost pushdown, extra
  * Exchange) are visible next to the numbers.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q36_shared_sql")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession
      .builder("graft-profile", s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tPlan = System.nanoTime()
      df.queryExecution.toRdd.count(): Unit
      val t1 = System.nanoTime()
      println(f"[profile] $name rep $r: build ${(tPlan - t0) / 1e9}%.3fs exec ${(t1 - tPlan) / 1e9}%.3fs")
      if (r == reps) println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
