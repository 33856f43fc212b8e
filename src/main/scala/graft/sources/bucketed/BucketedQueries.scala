package graft.sources.bucketed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated queries driving the graft-buckets DSv2 source
  * end-to-end: load the table into the bucket store (modeling the
  * external cluster already holding it), read back through
  * `spark.read.format("graft-buckets")`, and compare against DuckDB
  * on the raw parquet. Timestamps are emitted as epoch micros
  * (timezone-free compare).
  */
object BucketedQueries {

  val NumBuckets = 16

  private def bucketedLineitem(spark: SparkSession, dir: String): DataFrame = {
    BucketStore.ensureLoaded(spark, s"lineitem@$dir", dir, "lineitem", "l_orderkey", NumBuckets)
    spark.read.format("graft-buckets").option("table", s"lineitem@$dir").load()
  }

  /** Full-table scan through the connector — row-for-row identical to
    * the raw parquet (the reference's SnappydataConnectorTest does the
    * same via count+print, SnappydataConnectorTest.scala:17-23).
    */
  def scanQuery(spark: SparkSession, dir: String): DataFrame =
    bucketedLineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"),
      // l_shipdate arrives as TIMESTAMP_NTZ (parquet isAdjustedToUTC
      // unset); cast through the UTC session for the epoch compare
      unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))

  val scanSql: String =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      | l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      | CAST(epoch_us(l_shipdate) AS BIGINT) AS ship_us
      |FROM lineitem""".stripMargin

  /** Filtered + projected scan: the predicate and the column pruning
    * are pushed into the connector (visible as `pushed=[...] cols=[...]`
    * in the scan description) and enforced inside the per-bucket
    * reader — the strict improvement over the reference's `SELECT *`.
    */
  def pushdownQuery(spark: SparkSession, dir: String): DataFrame =
    bucketedLineitem(spark, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  val pushdownSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30.0""".stripMargin

  /** Pushed-aggregate scan: COUNT/MIN/MAX with a GROUP BY evaluated
    * inside the per-bucket reader ([[BucketedAggPartitionReader]]) —
    * the connector ships one partial row per (bucket, group) and Spark
    * plans only the final merge. The reference pins buckets to push
    * computation to the storage node
    * (SnappyDataConnectorHelper.scala:23-25); this is the Spark-native
    * version: at 100 TB a `SELECT count(*)` moves `buckets × groups`
    * rows, not the table. The plan shape (`pushedAggs=[...]` in the
    * scan, no raw-row read) is asserted in PlanAuditSpec.
    */
  def aggPushdownQuery(spark: SparkSession, dir: String): DataFrame =
    bucketedLineitem(spark, dir)
      .filter(col("l_quantity") >= 10.0)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_linestatus")).as("min_status"))

  val aggPushdownSql: String =
    """SELECT l_returnflag, count(*) AS n, min(l_quantity) AS min_qty,
      | max(l_extendedprice) AS max_price, min(l_linestatus) AS min_status
      |FROM lineitem WHERE l_quantity >= 10.0
      |GROUP BY l_returnflag""".stripMargin

  /** Co-partitioned join through the catalog: lineitem and orders are
    * both bucketed 16 ways on the join key, the catalog's
    * FunctionCatalog resolves the `bucket` transform, and with
    * `spark.sql.sources.v2.bucketing.enabled` Spark plans a
    * storage-partitioned join — zero Exchange on either join side
    * (asserted in BucketedSourceSpec). The 100 TB co-located-join
    * story of the reference connector, realized in the planner.
    */
  def copartitionJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    // Idempotent re-assert for sessions not built via GraftSession
    // (which already fixes both at session birth — see GraftSession).
    spark.conf.set("spark.sql.catalog.graft", classOf[BucketedCatalog].getName)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    BucketStore.ensureLoaded(spark, s"lineitem@$dir", dir, "lineitem", "l_orderkey", NumBuckets)
    BucketStore.ensureLoaded(spark, s"orders@$dir", dir, "orders", "o_orderkey", NumBuckets)
    val li = spark.table(s"graft.`lineitem@$dir`")
    val o = spark.table(s"graft.`orders@$dir`")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        org.apache.spark.sql.functions.sum(
          col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_price"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
  }

  val copartitionJoinSql: String =
    """SELECT o_orderpriority,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      | count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin
}
