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

  test("q80 sketch stats: every accuracy invariant holds and exact_users is right") {
    // q80 emits the sketch contract as booleans (hll within 5%, each
    // approx percentile inside the exact ±0.03 quantile band); the
    // oracle gate hash-matches iff they are ALL true, so this spec
    // asserts the same thing the driver will
    val got = FunctionFamilies.sketchStats(spark, sf)
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
    got.foreach { case (etype, exactUsers, hllOk, p50Ok, p95Ok) =>
      val recomputed = ev.filter(col("event_type") === etype)
        .select(countDistinct(col("user_id"))).as[Long].head()
      assert(exactUsers == recomputed, s"$etype exact_users=$exactUsers recomputed=$recomputed")
      assert(hllOk, s"$etype HLL estimate outside 5% of $exactUsers")
      assert(p50Ok, s"$etype approx p50 outside exact [0.47, 0.53] band")
      assert(p95Ok, s"$etype approx p95 outside exact [0.93, 0.97] band")
    }
  }
}
