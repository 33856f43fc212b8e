package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.bucketed._

/** S1/C1-C10 semantics: split-per-bucket, locality hints, pushdown
  * enforcement, snapshot check (SURVEY §5 item 2).
  */
class BucketedSourceSpec extends SparkSuite {

  private lazy val src = {
    BucketStore.ensureLoaded(spark, s"lineitem@$sf", sf, "lineitem", "l_orderkey", 16)
    spark.read.format("graft-buckets").option("table", s"lineitem@$sf").load()
  }

  test("round trip: connector read equals raw parquet read") {
    val viaSource = src.collect().map(_.toSeq).toSet
    val raw = graft.tables.Tables.lineitem(spark, sf).collect().map(_.toSeq).toSet
    assert(viaSource === raw)
    assert(viaSource.nonEmpty)
  }

  test("one Spark partition per bucket") {
    assert(src.rdd.getNumPartitions === 16)
  }

  test("every split carries its bucket's host list (locality)") {
    val scan = new BucketedScan(s"lineitem@$sf",
      BucketStore.get(s"lineitem@$sf").schema, Array.empty,
      BucketStore.get(s"lineitem@$sf").version)
    val parts = scan.planInputPartitions()
    assert(parts.length === 16)
    parts.zipWithIndex.foreach { case (p, i) =>
      assert(p.preferredLocations().toSeq === BucketStore.hostsFor(i, 4))
    }
  }

  test("filter and column pruning are pushed into the scan") {
    val q = src.filter(col("l_quantity") >= 30.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft-buckets"))
    assert(plan.contains("l_quantity"), plan)
    // pushdown enforced, not just claimed: results match raw parquet
    val got = q.collect().map(_.toSeq).toSet
    val exp = graft.tables.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 30.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity").collect().map(_.toSeq).toSet
    assert(got === exp)
  }

  test("co-partitioned join through the catalog has no Exchange on either side") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.bucketed.BucketedCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    BucketStore.ensureLoaded(spark, s"lineitem@$sf", sf, "lineitem", "l_orderkey", 16)
    val l = spark.table(s"graft.`lineitem@$sf`").select("l_orderkey", "l_quantity")
    val r = spark.table(s"graft.`lineitem@$sf`").select("l_orderkey", "l_extendedprice")
    val j = l.join(r, "l_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // and the shuffle-free plan still computes the right thing
    val raw = graft.tables.Tables.lineitem(spark, sf)
    val expected = raw.select(col("l_orderkey"), col("l_quantity"))
      .join(raw.select(col("l_orderkey"), col("l_extendedprice")), "l_orderkey").count()
    assert(j.count() === expected)
  }

  test("reader rejects a stale snapshot version") {
    val t = BucketStore.get(s"lineitem@$sf")
    val stale = BucketInputPartition(s"lineitem@$sf", 0, Array("host-0"), t.version - 1)
    val ex = intercept[IllegalArgumentException] {
      new BucketedPartitionReader(stale, t.schema, Array.empty)
    }
    assert(ex.getMessage.contains("snapshot violated"))
  }
}
