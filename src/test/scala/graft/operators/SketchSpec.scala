package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tables.Tables

/** Sketch aggregates (HLL++): the approximate path for cardinalities
  * too large to count exactly — constant memory per group regardless
  * of input size, mergeable across partitions. Accuracy is bounded by
  * the configured relative standard deviation.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("sketches merge correctly across grouped partials") {
    val li = Tables.lineitem(spark, sf)
    val perFlag = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .as[(String, Long)].collect().toMap
    val exactPerFlag = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("e"))
      .as[(String, Long)].collect().toMap
    exactPerFlag.foreach { case (k, e) =>
      val a = perFlag(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k exact=$e approx=$a")
    }
  }
}
