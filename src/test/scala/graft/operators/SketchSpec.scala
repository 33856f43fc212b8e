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

  test("q80 sketch stats: HLL within error, approx percentiles within rank tolerance") {
    // the accuracy contract that gates the rows-only q80: per group,
    // approx_count_distinct tracks the exact distinct count and the
    // approx median/p95 fall within a small quantile band of the
    // exact percentile
    val got = FunctionFamilies.sketchStats(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
    got.foreach { case (etype, approxUsers, p50, p95) =>
      val slice = ev.filter(col("event_type") === etype)
      val exactUsers = slice.select(countDistinct(col("user_id"))).as[Long].head()
      assert(math.abs(approxUsers - exactUsers).toDouble / exactUsers < 0.1,
        s"$etype users exact=$exactUsers approx=$approxUsers")
      // rank tolerance: the approx quantile must sit between the exact
      // (q-eps) and (q+eps) quantiles of the same data
      val bounds = slice.select(
        expr("percentile(value, array(0.47, 0.53, 0.93, 0.97))")).as[Seq[Double]].head()
      assert(p50 >= bounds(0) && p50 <= bounds(1), s"$etype p50=$p50 not in $bounds")
      assert(p95 >= bounds(2) && p95 <= bounds(3), s"$etype p95=$p95 not in $bounds")
    }
  }
}
