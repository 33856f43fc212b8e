package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** SURVEY §2.8 — the user-extension surface, exercised as gated
  * queries. The reference's Flink SAM interfaces (MapFunction,
  * FlatMapFunction, KeySelector, ...) map to three Spark tiers, each
  * demonstrated here with an oracle:
  *
  *  1. `udf()` — a black-box Scala closure per row. Correct but
  *     opaque to Catalyst: no pushdown through it, no codegen inside
  *     it. The query keeps the udf OUT of the filter so pruning still
  *     reaches the scan.
  *  2. typed `Dataset.map` / `mapPartitions` — compiled closures over
  *     case classes; encoder-serialized, also optimizer-opaque.
  *  3. column expressions (everything else in this engine) — the
  *     preferred tier; see FunctionFamilies.
  *
  * At 100 TB tiers 1-2 cost one serialization boundary per row, which
  * is why they exist here as surface-parity demonstrations, not as
  * building blocks of the other operators.
  */
object UdfSurface {

  /** Tier 1: a registered Scala UDF banding prices, then a plain
    * grouped count over the band. Comparisons only — deterministic on
    * any engine.
    */
  def udfBands(spark: SparkSession, dir: String): DataFrame = {
    // boxed parameter ON PURPOSE: with a primitive Double, Spark
    // null-skips the UDF (band = NULL) while the oracle's CASE falls
    // through to 'LOW' — a latent gate divergence on any fixture with
    // a NULL price. Boxed + explicit null branch matches CASE exactly.
    val band = udf((p: java.lang.Double) =>
      if (p == null) "LOW"
      else if (p > 300000.0) "HIGH" else if (p > 100000.0) "MID" else "LOW")
    Tables.orders(spark, dir)
      .withColumn("band", band(col("o_totalprice")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
  }

  val udfBandsSql: String =
    """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'HIGH'
      |            WHEN o_totalprice > 100000.0 THEN 'MID'
      |            ELSE 'LOW' END AS band,
      | count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM orders GROUP BY 1""".stripMargin

  /** Input/output rows for the typed pipeline (top-level for stable
    * encoder derivation).
    */
  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
  case class Discounted(o_orderkey: Long, bucket: Long, discounted: Double)

  /** Tier 2: typed `map` (per-row closure) then `mapPartitions`
    * (per-partition closure — the reference's MapPartitionFunction,
    * SnappydataConnectorTest.scala:17-21). The arithmetic is one IEEE
    * multiply + integral division, deterministic cross-engine.
    */
  def typedPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      // primitive case-class fields cannot hold NULL: a null row would
      // throw "Null value appeared in non-nullable field" mid-job.
      // Dropping nulls here keeps the typed path total; the oracle
      // filters identically (vacuous on the current fixture).
      .na.drop(Seq("o_orderkey", "o_custkey", "o_totalprice"))
      .as[OrderRow]
      .map(o => Discounted(o.o_orderkey, o.o_custkey / 100L, o.o_totalprice * 0.9))
      .mapPartitions(_.filter(_.discounted > 250000.0))
      .toDF()
  }

  val typedPipelineSql: String =
    """SELECT o_orderkey, CAST(o_custkey // 100 AS BIGINT) AS bucket, o_totalprice * 0.9 AS discounted
      |FROM orders
      |WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      |  AND o_totalprice * 0.9 > 250000.0""".stripMargin

  /** q165 — the SQL-REGISTERED flavor of tier 1: the same banding
    * logic registered via `spark.udf.register` and invoked from a
    * `spark.sql` string — the path a SQL-first user (or a BI tool
    * emitting SQL) extends the engine through, vs q55's DSL `udf()`
    * column. Registration is session-scoped and idempotent;
    * evaluation characteristics are identical to q55's (opaque
    * closure, no pushdown through it — the WHERE on a plain column
    * still reaches the scan).
    */
  def sqlUdfQuery(spark: SparkSession, dir: String): DataFrame = {
    spark.udf.register("graft_band", (p: java.lang.Double) =>
      if (p == null) "LOW"
      else if (p > 300000.0) "HIGH" else if (p > 100000.0) "MID" else "LOW")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_udf")
    spark.sql(
      """SELECT graft_band(o_totalprice) AS band,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft_orders_udf
        |WHERE o_orderkey % 3 = 0
        |GROUP BY 1""".stripMargin)
  }

  val sqlUdfSql: String =
    """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'HIGH'
      |            WHEN o_totalprice > 100000.0 THEN 'MID'
      |            ELSE 'LOW' END AS band,
      | count(*) AS n,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderkey % 3 = 0
      |GROUP BY 1""".stripMargin

  /** q195 — the NATIVE-expression SQL front door: the same registry a
    * `spark.sql.extensions=graft.GraftExtensions` session injects
    * ([[graft.functions.GraftFunctions.register]] shares the triples),
    * exercised through `spark.sql` text — `graft_fingerprint64` and
    * `graft_mix64` composed in SQL, hash-gated by the HUGEINT mod-2⁶⁴
    * oracle replica. q165 gates the black-box `udf()` tier; this
    * gates the codegen'd-Expression tier at the SQL surface.
    */
  def sqlNativeFnsQuery(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("graft_docs_native")
    spark.sql(
      """SELECT doc_id,
        |  graft_fingerprint64(text) AS fp,
        |  graft_mix64(graft_fingerprint64(text)) AS mixed
        |FROM graft_docs_native""".stripMargin)
  }

  val sqlNativeFnsSql: String = {
    import graft.operators.SimHash
    val M = SimHash.Mod64
    def signed(h: String): String =
      s"CAST(CASE WHEN ($h) > 9223372036854775807::HUGEINT THEN ($h) - $M ELSE ($h) END AS BIGINT)"
    val fold = SimHash.byteFoldFpSql("text")
    val mixed = SimHash.fmixSql("h0")
    s"""WITH fp AS (SELECT doc_id, $fold AS h0 FROM documents)
       |SELECT doc_id, ${signed("h0")} AS fp, ${signed(mixed)} AS mixed
       |FROM fp""".stripMargin
  }
}
