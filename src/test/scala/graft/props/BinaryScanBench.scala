package graft.sources.bucketed

import org.apache.spark.sql.functions._

/** Scratch measurement for the round-20 SCALE.md note: a COLD sweep
  * projecting a BINARY content column through the row reader
  * (`columnar=false` — the only path binary had before round 20)
  * versus the vectorized cold path. Prints one line per leg.
  *
  * Run: java -cp target/scala-2.13/test-classes:target/scala-2.13/classes:<spark jars>
  *        <add-opens...> graft.sources.bucketed.BinaryScanBench [rows]
  */
object BinaryScanBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300000
    val spark = graft.GraftSession.builder().appName("BinaryScanBench").getOrCreate()
    import spark.implicits._
    val name = "binbench"
    BucketStore.drop(name)
    val df = spark.range(0, n.toLong).selectExpr("id AS k", "CAST(id % 7 AS INT) AS g",
      // ~120 bytes of deterministic content per row
      "CAST(repeat(concat('blob-', CAST(id AS STRING), '-'), 8) AS BINARY) AS content")
    BucketStore.load(spark, name, df, "k", 16)
    def sweep(columnar: Boolean): (Long, Double) = {
      BucketStore.evictTable(name)
      require(BucketStore.get(name).buckets.loadedCount == 0)
      val t0 = System.nanoTime()
      val rows = spark.read.format("graft-buckets").option("table", name)
        .option("columnar", columnar.toString).load()
        .select(sum(length(col("content"))).as("b"), count(lit(1)).as("n"))
        .collect()
      val s = (System.nanoTime() - t0) / 1e9
      (rows(0).getLong(1), s)
    }
    sweep(columnar = true) // JIT/profile warm-up on a throwaway pass
    for (_ <- 0 until 3; columnar <- Seq(false, true)) {
      val (cnt, s) = sweep(columnar)
      println(f"columnar=$columnar rows=$cnt sec=$s%.3f rows_per_s=${cnt / s}%.0f")
    }
    spark.stop()
  }
}
