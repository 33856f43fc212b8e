package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Batch relational operator suite (SURVEY §2.3-§2.7).
  *
  * Oracle-parity rule used throughout: aggregates over float columns go
  * through `DECIMAL(18,4)` so partial-aggregation order (Spark's
  * map-side combine vs DuckDB's sequential scan) cannot perturb the
  * result; the FINAL output column is always cast to DOUBLE (one
  * deterministic decimal→double conversion on both engines). Decimal
  * must never appear in an output schema — the driver's hasher renders
  * Spark-parquet decimals and DuckDB decimals differently, so a
  * value-equal decimal column still hash-mismatches (all 10 round-1
  * hash failures were exactly the decimal-output queries). This keeps
  * every query bit-deterministic across engines while Spark still gets
  * hash aggregation + whole-stage codegen.
  *
  * Scale notes per query are in each builder's doc.
  */
object Relational {

  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** A1 analog, TPC-H Q1 flavor: filter → groupBy → multi-agg.
    * The shipdate predicate reaches the parquet scan (PushedFilters);
    * the aggregation is partial+final HashAggregate — the only shuffle
    * carries ~|groups| rows.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec4(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        // scale-8 product sums are rounded to scale 4 IN DECIMAL before
        // the double cast: above ~2^53 the scaled integer stops being
        // exactly representable and DuckDB's decimal→double conversion
        // double-rounds (1-ulp divergence seen at sf0.1). At scale 4 the
        // conversion is exact on both engines; round() is half-away-
        // from-zero on both (DuckDB CAST would truncate — never use it
        // for scale reduction).
        round(sum(dec4(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec4(col("l_discount")))), 4)
          .cast("double").as("sum_disc_price"),
        (sum(dec4(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("cnt"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
      | count(*) AS cnt
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1997-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** J1 batch analog: customer ⋈ orders ⋈ lineitem with aggregation.
    * `customer` is tiny relative to the fact tables → explicit
    * broadcast keeps the big side shuffle-free on that join; the
    * orders⋈lineitem equi-join shuffles both sides on the order key
    * (sort-merge / shuffled-hash chosen by AQE at real scale).
    */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        round(sum(dec4(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec4(col("l_discount")))), 4)
          .cast("double").as("revenue"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
  }

  val joinAggSql: String =
    """SELECT c_mktsegment, o_orderpriority,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
      | count(DISTINCT o_orderkey) AS n_orders,
      | count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority""".stripMargin

  /** P1-P2 analog at relational level: projection + conjunctive filter,
    * fully pushed to the parquet scan (row-group pruning + column
    * pruning — ReadSchema carries only the 5 referenced columns).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_discount") >= lit(0.05) && col("l_quantity") < lit(10.0) &&
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))

  val filterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_quantity < 10.0
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'""".stripMargin

  /** Top-k: global sort + limit. Spark plans TakeOrderedAndProject —
    * per-partition top-k then a k-row merge on the driver; no global
    * sort materialization at any scale. Fully tie-broken for
    * determinism.
    */
  def topCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum(dec4(col("o_totalprice"))).cast("double").as("total_spent"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spent").desc, col("o_custkey").asc)
      .limit(10)

  val topCustomersSql: String =
    """SELECT o_custkey,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
      | count(*) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin

  /** DISTINCT — hash aggregation without aggregates. */
  def distinctStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_orderstatus"), col("o_orderpriority")).distinct()

  val distinctStatusSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  /** Set operations: INTERSECT (semi-join under the hood) and EXCEPT
    * (anti-join) composed with bag UNION ALL. Branches are disjoint by
    * construction (acctbal > 1000 vs < 0).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val withOrders = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    val highBal = c.filter(col("c_acctbal") > 1000).select(col("c_custkey"))
    val negBal = c.filter(col("c_acctbal") < 0).select(col("c_custkey"))
    highBal.intersect(withOrders).union(negBal.except(withOrders))
  }

  val setOpsSql: String =
    """SELECT c_custkey FROM customer WHERE c_acctbal > 1000
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders
      |UNION ALL
      |(SELECT c_custkey FROM customer WHERE c_acctbal < 0
      | EXCEPT
      | SELECT o_custkey AS c_custkey FROM orders)""".stripMargin

  /** Analytic window functions: per-group top-5 by ranked row_number
    * with a total tie-break (price desc, orderkey, linenumber) so the
    * result is a deterministic set.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
  }

  val windowRankSql: String =
    """SELECT * FROM (
      | SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      | FROM lineitem) t WHERE rn <= 5""".stripMargin

  /** W1 batch analog: tumbling 1-hour event-time windows over `events`
    * (the streaming variant with a watermark lives in
    * [[graft.streaming.StreamOps]]; at stream completion both produce
    * this exact result). Window start is emitted as epoch micros to
    * keep the comparison timezone-free.
    */
  def eventHourlyWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("win_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec4(col("value"))).cast("double").as("sum_value"))

  val eventHourlyWindowSql: String =
    """SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start, event_type,
      | count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Semi-structured JSON extraction from `events.props`. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))

  val jsonExtractSql: String =
    """SELECT k % 10 AS k_mod, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events) t
      |GROUP BY 1""".stripMargin

  /** TPC-H Q5 flavor: 6-way join through the star schema with a
    * region filter and per-nation revenue. The three dimension chains
    * (customer→nation→region, supplier→nation) broadcast; only
    * lineitem⋈orders shuffles. The classic c_nationkey = s_nationkey
    * local-supplier condition is preserved.
    */
  def regionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(dec4(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 4)) - dec4(col("l_discount")))), 4)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val regionalRevenueSql: String =
    """SELECT r_name, n_name,
      | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
      | count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY r_name, n_name""".stripMargin

  /** Anti join (NOT EXISTS): customers with no large order. The anti
    * side is filtered before the join, so the plan is a left-anti
    * hash join against the reduced orders set.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000.0)
    c.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin

  /** Cumulative window frame: running order total per customer in
    * (o_orderdate, o_orderkey) order — exact decimal running sum.
    */
  def runningOrderTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec4(col("o_totalprice"))).over(w).cast("double").as("running_total"))
  }

  val runningOrderTotalsSql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders""".stripMargin

  /** W8 — session windows (30-minute inactivity gap) per user over
    * `events`, via Spark's built-in `session_window`. A new session
    * starts when the gap from the previous event is ≥ the timeout
    * (session end is exclusive). Batch form; the identical expression
    * works under `readStream` with a watermark.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec4(col("value"))).cast("double").as("sum_value"))
      .select(unix_micros(col("sw.start")).as("sess_start"), col("user_id"),
        col("n"), col("sum_value"))

  val sessionWindowsSql: String =
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM ordered)
      |SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS sess_start, user_id,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid""".stripMargin

  /** W8 — sliding time windows: 1-hour windows every 15 minutes, so
    * each event lands in 4 overlapping windows. Spark's `window` with
    * a slide duration expands rows internally; the oracle replicates
    * it by cross-joining each event with its 4 window starts.
    */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start"), col("event_type"), col("n"))

  val slidingWindowsSql: String =
    """SELECT win_start, event_type, count(*) AS n
      |FROM (
      |  SELECT event_type,
      |    CAST(epoch_us(time_bucket(INTERVAL '15 minutes', ts)) AS BIGINT)
      |      - k.k * 900000000 AS win_start
      |  FROM events
      |  CROSS JOIN (SELECT unnest(range(4)) AS k) k) t
      |GROUP BY 1, 2""".stripMargin

  /** CUBE grouping sets with NULL-label coalescing. */
  def cubeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"))

  val cubeCountsSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** q161 — first-seen growth curve: per day, how many users appeared
    * for the FIRST time (the new-entities-per-period analytic every
    * growth dashboard and every corpus-ingest monitor runs — same
    * shape for "new domains per crawl day" on a document pipeline).
    * Two mergeable aggregations: min(event date) per user (the one
    * real shuffle, keyed on the high-cardinality id) then a count per
    * day (tiny). No window functions, no self-joins — the naive
    * "events LEFT JOIN all earlier events" formulation this replaces
    * is quadratic.
    */
  def newUsersDaily(spark: SparkSession, dir: String): DataFrame =
    graft.tables.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"))
      .groupBy(col("first_day"))
      .agg(count(lit(1)).as("new_users"))

  val newUsersDailySql: String =
    """SELECT first_day, count(*) AS new_users FROM (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      |  FROM events GROUP BY 1) t
      |GROUP BY 1""".stripMargin

  /** q171 — funnel conversion: of the users who clicked, how many
    * went on to purchase within an hour of their FIRST click (the
    * canonical product-analytics funnel; same shape measures
    * crawl→parse→dedup-survival stage conversion on a data pipeline).
    * Two mergeable aggregations and one equi-join on user_id — the
    * naive per-user ordered scan is a window sort this formulation
    * skips entirely. Conversion ratio reported in exact basis points
    * (integer micro-arithmetic, no float division).
    */
  def funnelQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.tables.Tables.events(spark, dir)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("p_ts"))
    val converted = firstClick.join(purchases,
        col("user_id") === col("pu") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id")).distinct()
    val nClicked = firstClick.agg(count(lit(1)).as("n_clicked"))
    val nConv = converted.agg(count(lit(1)).as("n_converted"))
    nClicked.crossJoin(nConv)
      .select(col("n_clicked"), col("n_converted"),
        expr("n_converted * 10000 div n_clicked").as("conv_bps"))
  }

  val funnelSql: String =
    """WITH fc AS (
      |  SELECT user_id, min(ts) AS c_ts FROM events
      |  WHERE event_type = 'click' GROUP BY 1),
      |conv AS (
      |  SELECT DISTINCT fc.user_id
      |  FROM fc JOIN events p ON p.user_id = fc.user_id
      |  WHERE p.event_type = 'purchase'
      |    AND p.ts > fc.c_ts AND p.ts <= fc.c_ts + INTERVAL 1 HOUR)
      |SELECT (SELECT count(*) FROM fc) AS n_clicked,
      |  (SELECT count(*) FROM conv) AS n_converted,
      |  CAST((SELECT count(*) FROM conv) * 10000
      |       // (SELECT count(*) FROM fc) AS BIGINT) AS conv_bps""".stripMargin

  /** q172 — cohort retention: users grouped by first-seen WEEK
    * (q161's first-touch machinery), crossed with the weeks they were
    * active in, as (cohort_week, weeks_since, n_active) — the
    * retention matrix every growth dashboard draws. Two mergeable
    * aggregations (first-touch per user, then distinct user-week
    * activity) and one equi-join on user_id; everything integer.
    * `weeks_since` derives from epoch-day arithmetic (date_diff in
    * days div 7) so both engines compute identical buckets with no
    * calendar-week-boundary disagreement.
    */
  def retentionQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val active = ev.distinct()
    active.join(firstSeen, Seq("user_id"))
      .select(col("user_id"),
        expr("cast(datediff(d0, date'1970-01-01') as bigint) div 7").as("cohort_week"),
        expr("cast(datediff(d, d0) as bigint) div 7").as("weeks_since"))
      .distinct()
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
  }

  val retentionSql: String =
    """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |fs AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY 1),
      |uw AS (
      |  SELECT DISTINCT ev.user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', fs.d0) // 7 AS BIGINT) AS cohort_week,
      |    CAST(date_diff('day', fs.d0, ev.d) // 7 AS BIGINT) AS weeks_since
      |  FROM ev JOIN fs ON ev.user_id = fs.user_id)
      |SELECT cohort_week, weeks_since, count(*) AS n_active
      |FROM uw GROUP BY 1, 2""".stripMargin
}
