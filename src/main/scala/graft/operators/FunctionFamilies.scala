package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** SURVEY §2.7's "declared in scope" scalar/aggregate function
  * families, exercised as oracle-gated queries: exact percentiles,
  * ROLLUP, pivot, date parts, string functions, math bucketing,
  * array functions, positional explode, and conditional aggregates.
  *
  * Everything here is pure `org.apache.spark.sql.functions` — codegen,
  * pushdown-friendly, nothing custom — the point is breadth of the
  * engine's built-in surface with cross-engine-deterministic results
  * (see Relational's scaladoc for the determinism rules).
  */
object FunctionFamilies {

  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** Exact grouped percentiles (type-7 linear interpolation — the same
    * definition DuckDB's `quantile_cont` uses). `percentile` sorts the
    * group's values exactly; at 100 TB swap in `approx_percentile`
    * (t-digest, one pass, no sort) — the exact form is the oracle-able
    * one. Rounded to 6dp: the interpolation arithmetic is the only
    * float step, and its last-ulp is engine-dependent.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75))).as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 6).as("p25"),
        round(element_at(col("ps"), 2), 6).as("p50"),
        round(element_at(col("ps"), 3), 6).as("p75"),
        col("n"))

  val percentilesSql: String =
    """SELECT l_returnflag,
      | round(qs[1], 6) AS p25, round(qs[2], 6) AS p50, round(qs[3], 6) AS p75, n
      |FROM (SELECT l_returnflag,
      |        quantile_cont(l_quantity, [0.25, 0.5, 0.75]) AS qs,
      |        count(*) AS n
      |      FROM lineitem GROUP BY l_returnflag) t""".stripMargin

  /** ROLLUP grouping sets (complements q11's CUBE): hierarchical
    * subtotals flag → (flag, status) → grand total.
    */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))

  val rollupSummarySql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Pivot: one column per pivoted `l_linestatus` value. The pivoted
    * value list is explicit — at scale an implicit pivot would add a
    * driver-side distinct pass over the column.
    */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec4(col("l_quantity"))).cast("double"))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))

  val pivotStatusSql: String =
    """SELECT l_returnflag,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Date-part extraction + calendar arithmetic over order dates. */
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"), dayofmonth(col("o_orderdate")).as("d"))
      .groupBy(col("y"), col("q"), col("m"))
      .agg(count(lit(1)).as("n"), count_distinct(col("d")).as("n_days"))

  val datePartsSql: String =
    """SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS y,
      | CAST(date_part('quarter', o_orderdate) AS INTEGER) AS q,
      | CAST(date_part('month', o_orderdate) AS INTEGER) AS m,
      | count(*) AS n,
      | count(DISTINCT CAST(date_part('day', o_orderdate) AS INTEGER)) AS n_days
      |FROM orders GROUP BY 1, 2, 3""".stripMargin

  /** String function family: case, substring, concatenation, length,
    * edit distance — all codegen'd builtins over the segment dimension.
    */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
      .select(col("seg"), col("n"),
        lower(col("seg")).as("seg_lower"),
        substring(col("seg"), 1, 3).as("seg3"),
        concat_ws("-", substring(col("seg"), 1, 1), reverse(col("seg"))).as("tagged"),
        length(col("seg")).as("len"),
        levenshtein(col("seg"), lit("AUTOMOBILE")).as("edit_auto"))

  val stringFuncsSql: String =
    """SELECT c_mktsegment AS seg, count(*) AS n,
      | lower(c_mktsegment) AS seg_lower,
      | substring(c_mktsegment, 1, 3) AS seg3,
      | concat_ws('-', substring(c_mktsegment, 1, 1), reverse(c_mktsegment)) AS tagged,
      | CAST(length(c_mktsegment) AS INTEGER) AS len,
      | CAST(levenshtein(c_mktsegment, 'AUTOMOBILE') AS INTEGER) AS edit_auto
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** Math bucketing (fixed-width histogram) over event values: the
    * bucket id is the only arithmetic (one division + floor, identical
    * in IEEE on both engines); min/max are selections, not sums.
    */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(floor(col("value") / 25.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))

  val valueHistogramSql: String =
    """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
      | count(*) AS n, min(value) AS lo, max(value) AS hi
      |FROM events GROUP BY 1""".stripMargin

  /** Array function family over embedding vectors: size, indexing,
    * ordered extremes — selections and exact float→double widenings
    * only, so no rounding is needed.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val vec = col("embedding").cast("array<double>")
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(vec, 1).as("first"),
        element_at(vec, -1).as("last"),
        array_max(vec).as("mx"),
        array_min(vec).as("mn"))
  }

  val arrayFuncsSql: String =
    """SELECT vec_id,
      | CAST(len(embedding) AS INTEGER) AS dim,
      | CAST(embedding AS DOUBLE[])[1] AS first,
      | CAST(embedding AS DOUBLE[])[-1] AS last,
      | list_max(CAST(embedding AS DOUBLE[])) AS mx,
      | list_min(CAST(embedding AS DOUBLE[])) AS mn
      |FROM embeddings WHERE vec_id < 100""".stripMargin

  /** Positional explode (UDTF shape — Flink's FlatMapFunction with an
    * index): every word of the first 20 documents with its position.
    */
  def posExplodeWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))

  val posExplodeWordsSql: String =
    """SELECT doc_id, CAST(i AS INTEGER) AS pos, ws[i + 1] AS word
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 20) t,
      | unnest(range(len(ws))) u(i)""".stripMargin

  /** A3 — global (ungrouped) aggregation: one partial per partition,
    * one single-row final merge; no data shuffle at any scale.
    */
  def globalStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("n"),
        count_distinct(col("l_orderkey")).as("n_orders"),
        sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"))

  val globalStatsSql: String =
    """SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_orders,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem""".stripMargin

  /** Sketch family — the 100 TB replacements for exact distinct counts
    * and sorted percentiles: HyperLogLog++ (`approx_count_distinct`)
    * and t-digest-style quantiles (`approx_percentile`). Both are
    * MERGEABLE one-pass sketches: partials combine map-side and the
    * shuffle carries one fixed-size sketch per (partition, group)
    * regardless of input volume — where exact distinct re-shuffles
    * every key and exact percentiles sort each group.
    *
    * Sketch estimates are engine-specific, so raw estimates can never
    * hash-match a DuckDB oracle. Instead the query emits the sketch
    * CONTRACT as oracle-expressible invariants: per group, the exact
    * distinct count (computable by both engines) plus booleans that
    * hold iff each sketch honors a bound — HLL++ (rsd 0.02) within 5%
    * of exact, and the approx percentiles obeying the cheap order
    * invariants against ADJACENT approx quantiles (p25 ≤ p50 ≤ p75,
    * p75 ≤ p95) plus exact min/max bounds — all one-pass aggregates,
    * no sort, but much tighter than [min,max] alone.
    * The oracle computes the exact count and literal TRUEs, so the
    * driver's hash matches iff every contract holds. The TIGHT
    * quantile-band check (approx p50/p95 inside the exact ±0.03
    * quantile band) lives in SketchSpec at small sf — exact
    * `percentile` is a full per-group sort, which is verification
    * scaffolding you cannot run at 100 TB and so is kept out of the
    * gated query's hot path.
    *
    * PLAN SHAPE (the part that matters at 100 TB): the exact
    * `count_distinct` is computed in its OWN aggregation and joined
    * back, never mixed into the sketch aggregation. Mixing them
    * triggers Spark's distinct-aggregate rewrite into a 3-level plan
    * keyed on (event_type, user_id), which builds one
    * QuantileSummaries/HLL buffer PER USER and merges millions of
    * heavyweight buffers through two shuffles — the exact opposite of
    * why sketches exist. Split, the sketch side is a plain 2-phase
    * ObjectHashAggregate with one buffer per event_type, and the
    * exact-distinct side shuffles bare (event_type, user_id) pairs.
    * Same shape as [[sketchRollup]]. PlanAuditSpec pins it: no
    * aggregate level in the sketch branch groups on user_id.
    */
  def sketchStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.tables.Tables.events(spark, dir)
    // Sketch branch: one fixed-size buffer per event_type, 2-phase agg.
    val sketches = ev
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("au"),
        percentile_approx(col("value"), lit(0.25), lit(10000)).as("p25s"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50s"),
        percentile_approx(col("value"), lit(0.75), lit(10000)).as("p75s"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95s"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
    // Exact-distinct branch: its own aggregation; the distinct rewrite
    // here shuffles only bare keys, no sketch buffers ride along.
    val exact = ev
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    // null-safe join key: a NULL event_type group must pair up across
    // the two branches exactly like the oracle's single GROUP BY keeps
    // it (a plain inner equi-join would silently drop it). The right
    // side's key is renamed first — both branches descend from the
    // same scan, so unaliased column refs would be ambiguous.
    sketches.join(exact.withColumnRenamed("event_type", "__et"),
        col("event_type") <=> col("__et"))
      .drop("__et")
      .select(col("event_type"), col("exact_users"),
        (abs(col("au") - col("exact_users")) <= col("exact_users") * lit(0.05)).as("hll_ok"),
        (col("p50s") >= col("vmin") && col("p50s") >= col("p25s") &&
          col("p50s") <= col("p75s") && col("p50s") <= col("p95s")).as("p50_ok"),
        (col("p95s") >= col("p75s") && col("p95s") <= col("vmax")).as("p95_ok"))
  }

  val sketchStatsSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      | TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Sketch ROLLUP — the pattern that makes sketches matter at 100 TB:
    * build fine-grained sketches once (per (event_type, day) — the
    * shape of a daily pre-aggregation job), then answer coarser
    * questions by MERGING sketches (`hll_union_agg`) without ever
    * rescanning the raw data. A 3-year backfill becomes a union of
    * ~1000 fixed-size Datasketches HLL buffers per group instead of a
    * re-shuffle of every raw key. Gated like q80: the oracle sees the
    * exact per-type distinct count plus a boolean that holds iff the
    * merged estimate lands within 5% of exact (lgConfigK=14 → ~0.8%
    * standard error, wide margin).
    */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.tables.Tables.events(spark, dir)
    val daily = ev
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    // null-safe pairing, same reason as sketchStats above: a NULL
    // event_type group must survive the join like the oracle's single
    // GROUP BY keeps it
    merged.join(exact.withColumnRenamed("event_type", "__et"),
        col("event_type") <=> col("__et"))
      .drop("__et")
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <= col("exact_users") * lit(0.05))
          .as("merge_ok"))
  }

  val sketchRollupSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS merge_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** q238 — sketch-driven JOIN-CARDINALITY estimation, the planning
    * meta-operation: estimate |A ⋈ B| from per-side row counts and
    * key-NDV sketches BEFORE running the join — System R's
    * containment-of-value-sets estimate, `|A|·|B| / max(ndv_A,
    * ndv_B)`, fed by Datasketches HLL (lgK=14, ~0.8% σ) instead of
    * exact NDVs. This is the number that decides broadcast-vs-shuffle
    * and join order at 100 TB, where computing it EXACTLY would cost
    * as much as the join it is supposed to plan: the sketch side is
    * two independent scans with fixed-size mergeable state (maintain
    * them incrementally per ingest batch, like q91's daily rollup,
    * and the planner's input becomes free).
    *
    * Gated like q80/q91: the oracle computes the EXACT join
    * cardinality and side stats; the sketch's worth is a boolean —
    * estimate within 5% of the true join size on an FK join, where
    * containment holds by construction. The exact true size rides
    * along so the estimator's error is auditable in the output.
    */
  def joinCardinalityQuery(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.tables.Tables.orders(spark, dir)
    val c = graft.tables.Tables.customer(spark, dir)
    val oStats = o.agg(count(lit(1)).as("n_orders"),
      expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))").as("ndv_o"))
    val cStats = c.agg(count(lit(1)).as("n_cust"),
      expr("hll_sketch_estimate(hll_sketch_agg(c_custkey, 14))").as("ndv_c"))
    val exact = o.join(c, col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("exact_join_rows"))
    oStats.crossJoin(cStats).crossJoin(exact) // three 1-row frames
      .select(col("n_orders"), col("n_cust"), col("exact_join_rows"),
        (abs(col("n_orders") * col("n_cust") / greatest(col("ndv_o"), col("ndv_c")) -
          col("exact_join_rows")) <= col("exact_join_rows") * lit(0.05)).as("est_ok"))
  }

  val joinCardinalitySql: String =
    """SELECT (SELECT count(*) FROM orders) AS n_orders,
      |  (SELECT count(*) FROM customer) AS n_cust,
      |  (SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
      |    AS exact_join_rows,
      |  TRUE AS est_ok""".stripMargin

  /** Global sort + pagination (LIMIT/OFFSET) with a total tie-break.
    * Spark plans sort + GlobalLimit; at scale a paged read like this
    * is a driver-side k-row merge, never a full materialized sort.
    */
  def sortPage(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(10)
      .limit(20)

  val sortPageSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin

  /** Structured JSON parsing: `from_json` with an explicit schema into
    * a struct column, field access, and a predicate on an extracted
    * field — the schema-on-read path (q10 covers the schemaless
    * `get_json_object` path).
    */
  def jsonStruct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT, tag STRING")).as("p"))
      // the fixture's props only ever carries 'k', so a raw p.tag
      // would be an ALL-NULL output column (the hash-hazard class this
      // file bans) AND a dead gate — both engines would emit NULL even
      // if struct-field extraction broke. The coalesce keeps the
      // missing-key path exercised with a non-null, comparable value.
      .select(col("event_id"), col("p.k").as("k"),
        coalesce(col("p.tag"), lit("absent")).as("tag"))
      .filter(col("k") % 7 === 0)

  val jsonStructSql: String =
    """SELECT event_id,
      | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      | COALESCE(json_extract_string(props, '$.tag'), 'absent') AS tag
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 = 0""".stripMargin

  /** Math function family — restricted to IEEE-exact operations
    * (sqrt, abs, sign, ceil, truncating int ops): libm-backed
    * functions (exp/ln/sin) are NOT cross-engine bit-stable and stay
    * out of oracle-gated outputs.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        // clamp at 0 on BOTH engines: Spark sqrt(negative) yields NaN
        // while DuckDB ERRORS — the clamp keeps the pair comparable on
        // any fixture (current values are non-negative; don't depend
        // on that)
        sqrt(greatest(col("value"), lit(0.0))).as("root"),
        abs(col("value") - 100.0).as("dist"),
        signum(col("value") - 100.0).as("sgn"),
        ceil(col("value")).cast("long").as("up"),
        (col("event_id") % 7).as("m7"))

  val mathFuncsSql: String =
    """SELECT event_id,
      | sqrt(greatest(value, 0.0)) AS root,
      | abs(value - 100.0) AS dist,
      | CAST(sign(value - 100.0) AS DOUBLE) AS sgn,
      | CAST(ceil(value) AS BIGINT) AS up,
      | event_id % 7 AS m7
      |FROM events WHERE event_id < 500""".stripMargin

  /** Date arithmetic family: day-level differences and offsets, output
    * as epoch-day integers (never raw date/timestamp values — see the
    * decimal lesson: engine-rendered temporal types are a hash hazard).
    */
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).as("epoch_day"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since_95"),
        datediff(date_add(to_date(col("o_orderdate")), 30), lit("1970-01-01").cast("date"))
          .as("due_epoch_day"))

  val dateArithSql: String =
    """SELECT o_orderkey,
      | CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_day,
      | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
      | CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE) + 30) AS INTEGER) AS due_epoch_day
      |FROM orders""".stripMargin

  /** lead/lag analytic frame: per-customer order-date gaps. One
    * window shuffle on the partition key; the lag is computed inside
    * the sorted partition stream, no self-join (the naive equivalent
    * joins the table to itself on a row-number offset).
    */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("d"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 500)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .withColumn("gap_days",
        // -1 marks "no previous order": NULL outputs are avoided
        // engine-wide (null-vs-null sort order differs across engines
        // and row-compare harnesses)
        coalesce(datediff(col("d"), lag(col("d"), 1).over(w)), lit(-1)))
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("d"), lit("1970-01-01").cast("date")).as("epoch_day"), col("gap_days"))
  }

  val orderGapsSql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS epoch_day,
      | CAST(COALESCE(date_diff('day',
      |   lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |                                        ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      |   CAST(o_orderdate AS DATE)), -1) AS INTEGER) AS gap_days
      |FROM orders WHERE o_custkey < 500""".stripMargin

  /** GROUPING SETS — the generalization of CUBE/ROLLUP (arbitrary
    * grouping combinations in ONE pass): Spark plans a single Expand +
    * aggregate, so the input is scanned once however many sets are
    * requested. `grouping_id` disambiguates a grouping NULL from a
    * data NULL.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      // grouping NULL markers → sentinel: output stays NULL-free
      // (engine-independent row ordering for the hash compare); gid
      // still disambiguates a marker from hypothetical data '(all)'
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("l_linestatus"),
        col("n"), col("sum_qty"), col("gid"))

  val groupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS l_returnflag,
      | COALESCE(l_linestatus, '(all)') AS l_linestatus, count(*) AS n,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** Distribution-rank analytic family: percent_rank / cume_dist /
    * ntile over a total order (value, key) — the tie-break makes every
    * rank a pure function of position, so the fractions are exact
    * integer ratios that agree bit-for-bit across engines.
    */
  def rankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .filter(col("c_custkey") < 1000)
      .select(col("c_mktsegment"), col("c_custkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).as("quartile"))
  }

  val rankFamilySql: String =
    """SELECT c_mktsegment, c_custkey,
      | round(percent_rank() OVER w, 6) AS pr,
      | round(cume_dist() OVER w, 6) AS cd,
      | CAST(ntile(4) OVER w AS INTEGER) AS quartile
      |FROM customer WHERE c_custkey < 1000
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin

  /** Ordered string aggregation (listagg WITHIN GROUP — new in Spark
    * 4): the ORDER BY inside the aggregate is what makes the
    * concatenation deterministic under distributed input order.
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") < 100)
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").as("names"),
        count(lit(1)).as("n"))

  val stringAggSql: String =
    """SELECT c_mktsegment AS seg,
      | string_agg(c_name, ',' ORDER BY c_name) AS names,
      | count(*) AS n
      |FROM customer WHERE c_custkey < 100
      |GROUP BY c_mktsegment""".stripMargin

  /** Conditional aggregates: FILTER-style counting, boolean
    * aggregation, and argmax — `max_by` keyed by the unique order key
    * so the result is total (no tie ambiguity).
    */
  def conditionalAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_totalprice") > 100000.0).as("n_big"),
        bool_or(col("o_totalprice") > 400000.0).as("any_huge"),
        bool_and(col("o_totalprice") > 0.0).as("all_positive"),
        max_by(col("o_custkey"), col("o_orderkey")).as("latest_cust"))

  val conditionalAggsSql: String =
    """SELECT o_orderpriority,
      | count(*) FILTER (WHERE o_totalprice > 100000.0) AS n_big,
      | bool_or(o_totalprice > 400000.0) AS any_huge,
      | bool_and(o_totalprice > 0.0) AS all_positive,
      | max_by(o_custkey, o_orderkey) AS latest_cust
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** q162 — UNPIVOT (melt): the inverse of q46's pivot, turning a
    * wide per-group metrics row into tidy (group, metric, value)
    * triples — the reshape every metrics-export and long-format
    * training-stats table needs. `Dataset.unpivot` compiles to an
    * Expand node (each input row emits k metric rows map-side): no
    * shuffle, no join — at 100 TB the cost is exactly k× the scan.
    * All metric columns are BIGINT so the melted `value` column is
    * exact under the hash gate.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n_items"),
        count_distinct(col("l_orderkey")).as("n_orders"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_qty"), col("n_items"), col("n_orders")),
      "metric", "value")
  }

  val unpivotMetricsSql: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
      |    count(*) AS n_items,
      |    count(DISTINCT l_orderkey) AS n_orders
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, CAST(sum_qty AS BIGINT) AS value FROM a
      |UNION ALL
      |SELECT l_returnflag, 'n_items', CAST(n_items AS BIGINT) FROM a
      |UNION ALL
      |SELECT l_returnflag, 'n_orders', CAST(n_orders AS BIGINT) FROM a""".stripMargin

  /** q167 — the MAP-type function family: per-document token-count
    * maps built with `map_from_entries`, then interrogated with the
    * map accessors and higher-order map functions (`element_at`,
    * `map_keys`, `map_values`, `map_filter`, `aggregate`). The map is
    * internal — outputs are scalars, so collect_list's partition
    * order (which the map's ENTRY order inherits) never reaches the
    * result, and the oracle verifies the same semantics computed
    * relationally from the token counts (the repo's oracle rule:
    * replicate results, not data structures).
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
    tf.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("tok"), col("cnt")))).as("m"))
      .select(col("doc_id"),
        size(col("m")).as("n_distinct"),
        coalesce(element_at(col("m"), "the"), lit(0L)).as("the_cnt"),
        expr("size(map_filter(m, (k, v) -> v >= 3))").as("n_freq"),
        element_at(array_sort(map_keys(col("m"))), 1).as("first_tok"),
        expr("aggregate(map_values(m), 0L, (a, b) -> a + b)").as("n_toks"))
  }

  val mapFuncsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, tok, count(*) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  WHERE tok <> '' GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(count(*) AS INTEGER) AS n_distinct,
      |  coalesce(max(CASE WHEN tok = 'the' THEN cnt END), 0) AS the_cnt,
      |  CAST(count(*) FILTER (WHERE cnt >= 3) AS INTEGER) AS n_freq,
      |  min(tok) AS first_tok,
      |  CAST(sum(cnt) AS BIGINT) AS n_toks
      |FROM tf GROUP BY 1""".stripMargin

  /** q163 — Pearson correlation + OLS slope of event value against
    * hour-of-day, per event type ("is this metric diurnal?") — the
    * statistics family (`corr`/`covar`/regression) made HASH-GATE
    * EXACT. The builtin float `corr` cannot be gated: its running
    * sums depend on partition visit order, so two runs differ in
    * ulps. Instead the inputs are fixed-pointed (value → integer
    * micro-units) and the five raw moments are summed as DECIMAL(38,0)
    * — exact integer arithmetic in any order, the same partial-agg
    * mergeability as any sum — and the closed forms
    * r = (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)(n·Syy − Sy²)),
    * β = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²) are evaluated once per
    * GROUP from those exact integers. One conversion to double at the
    * very end (both engines round-to-nearest from the same integers),
    * 6dp-rounded.
    */
  def corrDiurnal(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 1e6, 0).cast(d38).as("x"),
        hour(col("ts")).cast(d38).as("y"))
    val m = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    // + 0.0 normalizes IEEE negative zero: DuckDB's round can emit -0.0
    // on near-zero slopes while Spark emits +0.0 — same value, different
    // sign bit, hash mismatch. -0.0 + 0.0 = +0.0 on both engines.
    m.select(col("event_type"), col("n").cast("long").as("n"),
      (round(num / sqrt(dx * dy), 6) + lit(0.0)).as("r"),
      (round(num / dx, 6) + lit(0.0)).as("beta"))
  }

  val corrDiurnalSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(round(value * 1e6) AS HUGEINT) AS x,
      |    CAST(EXTRACT(hour FROM ts) AS HUGEINT) AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      |  FROM ev GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |               * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0.0 AS r,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |        / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS beta
      |FROM m""".stripMargin

  /** q197 — SKETCH ALGEBRA: audience-overlap estimation by
    * inclusion-exclusion over HLL sketches, |A∩B| ≈ |A|+|B|−|A∪B| —
    * how overlap is actually measured at 100 TB (three mergeable
    * constant-size sketches; the exact INTERSECT pays a full shuffle
    * of both audiences). Gated q80-style: the result carries the
    * exact counts plus a contract boolean (estimate within
    * max(10% of |A|+|B|, 15) of exact — ≥5σ at rsd 0.02 per sketch,
    * three sketches of compounding), and the oracle predicts the
    * exacts and TRUE, so a broken estimator hash-mismatches.
    */
  def audienceOverlapQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.tables.Tables.events(spark, dir)
    val a = ev.filter(col("event_type") === "click" && col("value") > 120)
      .select(col("user_id"))
    val b = ev.filter(col("event_type") === "purchase" && col("value") > 180)
      .select(col("user_id"))
    val exacts = a.distinct().intersect(b.distinct())
      .agg(count(lit(1)).as("exact_overlap"))
    val aEst = a.agg(count_distinct(col("user_id")).as("n_a"),
      approx_count_distinct(col("user_id"), 0.02).as("est_a"))
    val bEst = b.agg(count_distinct(col("user_id")).as("n_b"),
      approx_count_distinct(col("user_id"), 0.02).as("est_b"))
    val uEst = a.unionByName(b)
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est_u"))
    // four 1-row frames → one output row (bounded crossJoins)
    exacts.crossJoin(aEst).crossJoin(bEst).crossJoin(uEst)
      .select(col("n_a"), col("n_b"), col("exact_overlap"),
        (abs(col("est_a") + col("est_b") - col("est_u") - col("exact_overlap"))
          <= greatest((col("n_a") + col("n_b")) / 10, lit(15L))).as("est_ok"))
  }

  val audienceOverlapSql: String =
    """WITH a AS (SELECT DISTINCT user_id FROM events
      |           WHERE event_type = 'click' AND value > 120),
      |b AS (SELECT DISTINCT user_id FROM events
      |      WHERE event_type = 'purchase' AND value > 180)
      |SELECT (SELECT count(*) FROM a) AS n_a,
      |  (SELECT count(*) FROM b) AS n_b,
      |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t)
      |    AS exact_overlap,
      |  TRUE AS est_ok""".stripMargin
}
