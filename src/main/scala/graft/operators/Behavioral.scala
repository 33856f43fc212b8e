package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Behavioral / market-analytics operators over the `events` and
  * order tables: time-decayed engagement scoring, association-rule
  * mining, and exact-arithmetic anomaly flagging.
  *
  * All three follow the repo's determinism discipline: every scored
  * quantity is either pure integer arithmetic (fixed-point units,
  * binary shifts, exact DECIMAL sums) or a single double division of
  * two exact integers rounded once — so the DuckDB oracle matches by
  * hash, not by tolerance.
  */
object Behavioral {

  // ——— q177: time-decayed engagement (fixed-point EWMA) ———

  /** Per-user exponentially-decayed engagement score: the classic
    * "recent activity counts more" ranking signal (feature stores
    * keep one per user; fraud/abuse pipelines threshold it). With
    * decay α = 1/2 per event step, the score after a user's n-th
    * event is Σ_k v_k · 2^(k−n) — computed EXACTLY in fixed point:
    * values in 10⁻⁴ units, each contribution an integer right-shift
    * by its distance, contributions beyond [[EwmaMaxLag]] steps
    * dropped (they shift to < 2⁻³⁰ of a unit — zero in integer
    * arithmetic anyway for any realistic value).
    *
    * Scale shape: one shuffle by user_id; the intra-user pair join is
    * bounded by `EwmaMaxLag` per event (cost ≤ 30·|events|, never
    * |events-per-user|²); no window over a global ordering.
    */
  val EwmaMaxLag = 30

  def ewmaQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        // exact 10⁻⁴-unit fixed point; ties in ts broken by event_id
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_units"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
    // the CURRENT score only: each user's last row joined to its
    // ≤ EwmaMaxLag most recent events (scoring every prefix would
    // multiply the work 30× for rows the query then drops)
    val last = ev.groupBy(col("user_id"))
      .agg(max(col("rn")).as("rn_a"), count(lit(1)).as("n_events"))
    last.join(ev.select(col("user_id"), col("rn").as("rn_b"), col("v_units")), Seq("user_id"))
      .where(col("rn_b") <= col("rn_a") && col("rn_b") > col("rn_a") - EwmaMaxLag)
      .select(col("user_id"), col("n_events"),
        expr("v_units div shiftleft(1L, CAST(rn_a - rn_b AS INT))").as("term"))
      .groupBy(col("user_id"), col("n_events"))
      .agg(sum(col("term")).as("ewma_units"))
  }

  val ewmaSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(round(value * 10000) AS BIGINT) AS v_units,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |last AS (SELECT user_id, max(rn) AS rn_a, count(*) AS n_events
       |         FROM ev GROUP BY 1)
       |SELECT l.user_id, l.n_events,
       |  CAST(sum(p.v_units // (1::BIGINT << (l.rn_a - p.rn))) AS BIGINT) AS ewma_units
       |FROM last l JOIN ev p ON p.user_id = l.user_id
       |WHERE p.rn <= l.rn_a AND p.rn > l.rn_a - $EwmaMaxLag
       |GROUP BY 1, 2""".stripMargin

  // ——— q178: market-basket association rules ———

  /** Association rules over co-purchased part pairs: support (orders
    * containing both), confidence P(b|a), and lift
    * P(a,b)/(P(a)·P(b)) — the classic retail-analytics trio, and in
    * an LLM-data stack the same machinery scores tag/domain
    * co-occurrence. Pair generation is the bounded within-order
    * equi-join (fan-out ≤ order size²), support floor ≥ 3 prunes the
    * long tail before the stats join, and the scores are single
    * divisions of exact counts rounded once.
    */
  def marketBasketQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val itemN = li.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val nOrders = broadcast(li.select(col("k")).distinct().agg(count(lit(1)).as("n_orders")))
    val pairs = li.select(col("k"), col("p").as("id_a"))
      .join(li.select(col("k"), col("p").as("id_b")), "k")
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("support"))
      .where(col("support") >= 3)
    pairs
      .join(itemN.select(col("p").as("id_a"), col("n").as("n_a")), "id_a")
      .join(itemN.select(col("p").as("id_b"), col("n").as("n_b")), "id_b")
      .crossJoin(nOrders)
      .select(col("id_a"), col("id_b"), col("support"),
        round(col("support").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("support").cast("double") * col("n_orders") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
  }

  val marketBasketSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
      |item_n AS (SELECT p, count(*) AS n FROM li GROUP BY 1),
      |n_orders AS (SELECT count(DISTINCT k) AS n_orders FROM li),
      |pairs AS (
      |  SELECT a.p AS id_a, b.p AS id_b, count(*) AS support
      |  FROM li a JOIN li b ON a.k = b.k AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT id_a, id_b, support,
      |  round(CAST(support AS DOUBLE) / na.n, 6) AS confidence,
      |  round(CAST(support AS DOUBLE) * (SELECT n_orders FROM n_orders)
      |        / (na.n * nb.n), 6) AS lift
      |FROM pairs
      |JOIN item_n na ON na.p = id_a
      |JOIN item_n nb ON nb.p = id_b""".stripMargin

  // ——— q179: exact-arithmetic anomaly days ———

  /** Daily anomaly flags per event type: a (type, day) total is
    * anomalous when it deviates from that type's cross-day mean by
    * more than 2 sample standard deviations. The z-test is evaluated
    * WITHOUT computing mean or stddev as floats: multiplying
    * z² > 4 through by n²(n−1) gives
    *   (n−1) · (n·d − Σx)² > 4 · n · (n·Σx² − (Σx)²)
    * over exact integer day-totals (10⁻⁴-unit DECIMAL sums, squares
    * in DECIMAL(38,0)) — a pure integer comparison, so the flag is a
    * bit-identical function of the data on any engine and any
    * aggregation order. (Float variance would make the boundary rows
    * engine-dependent — unfalsifiable under a hash gate.)
    */
  def anomalyDaysQuery(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      // DECIMAL(18,4) sum is exact (repo float-agg convention), then
      // 10⁻⁴ fixed-point units as DECIMAL(38,0) for headroom
      .agg(sum(col("value").cast("decimal(18,4)")).as("d_dec"))
      .select(col("event_type"), col("day"),
        (col("d_dec") * 10000).cast("decimal(38,0)").as("d"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("d")).cast("decimal(38,0)").as("sx"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).cast("decimal(38,0)").as("sxx"))
    daily.join(stats, "event_type")
      .select(col("event_type"), col("day"), col("d").cast("long").as("day_units"),
        (((col("n") - 1) * (col("n") * col("d") - col("sx")) * (col("n") * col("d") - col("sx")))
          .cast("decimal(38,0)")
          > (lit(4) * col("n") * (col("n") * col("sxx") - col("sx") * col("sx")))
              .cast("decimal(38,0)")).as("anomalous"))
  }

  /** q216 — seasonal residual anomalies: q179 flags wild DAYS, but a
    * weekly-periodic metric (weekend dips, Monday spikes) makes every
    * honest weekend look anomalous to a season-blind gate. Here the
    * baseline is the per-(event_type, day-of-week) lower-median of
    * daily totals — the robust seasonal profile — and flagging runs on
    * RESIDUALS against that baseline through the q214 median/MAD gate.
    * Day-of-week is `epoch_day % 7` (pure integer; engine date-part
    * conventions disagree on week start, arithmetic doesn't). All
    * arithmetic stays in the q180/q214 exact-integer discipline:
    * DECIMAL-exact daily sums, rank-selected medians, the 51891/10000
    * rational threshold. Scale: daily totals are one mergeable groupBy;
    * both median selections window over low-cardinality keys.
    */
  def seasonalResidualsQuery(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("d_dec"))
      .select(col("event_type"), col("day"),
        (col("d_dec") * 10000).cast("decimal(38,0)").cast("long").as("d_units"),
        (datediff(col("day"), lit("1970-01-01").cast("date")) % 7).as("dow"))
    val wB = Window.partitionBy(col("event_type"), col("dow"))
    val ranked = daily
      .withColumn("rn", row_number().over(wB.orderBy(col("d_units"), col("day"))))
      .withColumn("cnt", count(lit(1)).over(wB))
    val base = ranked.filter(col("rn") === expr("(cnt - 1) div 2 + 1"))
      .select(col("event_type"), col("dow"), col("d_units").as("base_units"))
    val resid = daily.join(base, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"),
        abs(col("d_units") - col("base_units")).as("dev_units"))
    val wE = Window.partitionBy(col("event_type"))
    val rankedDev = resid
      .withColumn("drn", row_number().over(wE.orderBy(col("dev_units"), col("day"))))
      .withColumn("n", count(lit(1)).over(wE))
    val mad = rankedDev.filter(col("drn") === expr("(n - 1) div 2 + 1"))
      .select(col("event_type"), col("dev_units").as("mad_units"))
    rankedDev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"), max(col("mad_units")).as("mad_units"),
        sum(when(col("dev_units") * 10000L > col("mad_units") * 51891L, 1L).otherwise(0L))
          .as("n_out"),
        max(col("dev_units")).as("max_dev_units"))
  }

  val seasonalResidualsSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS DECIMAL(38,0)) AS BIGINT)
      |      AS d_units,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS dow
      |  FROM events GROUP BY 1, 2, 4),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type, dow
      |             ORDER BY d_units, day) AS rn,
      |    count(*) OVER (PARTITION BY event_type, dow) AS cnt
      |  FROM daily),
      |base AS (
      |  SELECT event_type, dow, d_units AS base_units FROM ranked
      |  WHERE rn = (cnt - 1) // 2 + 1),
      |resid AS (
      |  SELECT d.event_type, d.day, abs(d.d_units - b.base_units) AS dev_units
      |  FROM daily d JOIN base b USING (event_type, dow)),
      |rankedDev AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |             ORDER BY dev_units, day) AS drn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM resid),
      |mad AS (
      |  SELECT event_type, dev_units AS mad_units FROM rankedDev
      |  WHERE drn = (n - 1) // 2 + 1)
      |SELECT r.event_type, max(r.n) AS n_days, max(m.mad_units) AS mad_units,
      |  CAST(sum(CASE WHEN r.dev_units * 10000 > m.mad_units * 51891 THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_out,
      |  max(r.dev_units) AS max_dev_units
      |FROM rankedDev r JOIN mad m USING (event_type)
      |GROUP BY 1""".stripMargin

  /** q221 — Poisson-bootstrap confidence intervals for per-group
    * means: THE distributed bootstrap (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams") — instead of materializing
    * B resamples, each row draws a Poisson(1) WEIGHT per replicate, so
    * all B replicate means come out of ONE pass as a weighted
    * aggregation (mergeable; at 100 TB this is a B×-wide map-side
    * expansion of cheap integer ops, never a resample shuffle).
    *
    * House determinism: the Poisson draw inverts the exact CDF against
    * a Lehmer-hash uniform (the q121/q202 no-rand discipline — a pure
    * function of (event_id, replicate)); CDF thresholds are
    * precomputed integer constants in [0, 2^31); replicate means are
    * integer divisions of fixed-point units; the 90% CI is a RANK
    * selection (rank 2 / rank 39 of B=40 sorted replicate means —
    * ceil(0.05·B) and B+1−ceil(0.05·B)), never an interpolation.
    */
  def bootstrapCiQuery(spark: SparkSession, dir: String): DataFrame = {
    val B = 40
    // Poisson(1) inverse CDF over u ∈ [0, 2147483647)
    val thresholds = Seq(790015083L, 1580030167L, 1975037709L, 2106706890L,
      2139624185L, 2146207644L, 2147304887L)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_units"))
    val point = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("sum(v_units) div count(1)").as("point_mean_units"))
    val u = expr(s"(((event_id * 131 + b * 7919) % 2147483647) * 48271) % 2147483647 " +
      s"* 48271 % 2147483647")
    val w = thresholds.zipWithIndex.foldRight(lit(thresholds.size): org.apache.spark.sql.Column) {
      case ((t, k), els) => when(col("u") < t, lit(k)).otherwise(els)
    }
    val reps = ev.select(col("event_type"), col("event_id"), col("v_units"),
        explode(expr(s"sequence(0, ${B - 1})")).as("b"))
      .withColumn("u", u)
      .withColumn("w", w.cast("long"))
      .groupBy(col("event_type"), col("b"))
      .agg(expr("sum(w * v_units) div sum(w)").as("mean_units"))
    val loRank = 2; val hiRank = B - 1
    val ranked = reps.withColumn("rn", row_number().over(
      Window.partitionBy(col("event_type")).orderBy(col("mean_units"), col("b"))))
    val lo = ranked.filter(col("rn") === loRank)
      .select(col("event_type"), col("mean_units").as("ci_lo_units"))
    val hi = ranked.filter(col("rn") === hiRank)
      .select(col("event_type"), col("mean_units").as("ci_hi_units"))
    point.join(lo, "event_type").join(hi, "event_type")
      .select(col("event_type"), col("n"), col("point_mean_units"),
        col("ci_lo_units"), col("ci_hi_units"),
        (col("point_mean_units") >= col("ci_lo_units") &&
          col("point_mean_units") <= col("ci_hi_units")).as("point_in_ci"))
  }

  val bootstrapCiSql: String = {
    val thresholds = Seq(790015083L, 1580030167L, 1975037709L, 2106706890L,
      2139624185L, 2146207644L, 2147304887L)
    val wCase = thresholds.zipWithIndex.foldRight(thresholds.size.toString) {
      case ((t, k), els) => s"CASE WHEN u < $t THEN $k ELSE $els END"
    }
    s"""WITH ev AS (
       |  SELECT event_type, event_id, CAST(round(value * 10000) AS BIGINT) AS v_units
       |  FROM events),
       |point AS (
       |  SELECT event_type, count(*) AS n, sum(v_units) // count(*) AS point_mean_units
       |  FROM ev GROUP BY 1),
       |reps AS (
       |  SELECT event_type, b, sum(w * v_units) // sum(w) AS mean_units FROM (
       |    SELECT event_type, b, v_units, $wCase AS w FROM (
       |      SELECT event_type, event_id, v_units, b,
       |        ((event_id * 131 + b * 7919) % 2147483647) * 48271 % 2147483647
       |          * 48271 % 2147483647 AS u
       |      FROM ev, unnest(range(40)) t(b)) z) z2
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT event_type, mean_units,
       |    row_number() OVER (PARTITION BY event_type ORDER BY mean_units, b) AS rn
       |  FROM reps)
       |SELECT p.event_type, CAST(p.n AS BIGINT) AS n,
       |  CAST(p.point_mean_units AS BIGINT) AS point_mean_units,
       |  CAST(lo.mean_units AS BIGINT) AS ci_lo_units,
       |  CAST(hi.mean_units AS BIGINT) AS ci_hi_units,
       |  p.point_mean_units BETWEEN lo.mean_units AND hi.mean_units AS point_in_ci
       |FROM point p
       |JOIN (SELECT event_type, mean_units FROM ranked WHERE rn = 2) lo USING (event_type)
       |JOIN (SELECT event_type, mean_units FROM ranked WHERE rn = 39) hi USING (event_type)""".stripMargin
  }

  /** q223 — TIME-weighted average over irregularly spaced events (the
    * TWAP family): a plain mean over-weights bursts — 100 readings in
    * a hot minute count 100×, though they describe one minute of
    * state. Here each value is weighted by how long it REMAINED
    * CURRENT (lead-timestamp difference), the standard estimator for
    * sensor/price/state series, reported next to the plain mean so
    * the burst bias is visible in the output.
    *
    * Exactness: durations are integer microseconds; Σ value·duration
    * runs in DECIMAL(38,0) (a 10⁻⁴-unit value times an hours-long gap
    * overflows int64 at corpus scale — the q179 headroom convention);
    * the final TWAP is one integer division. One window per
    * event_type (low-cardinality shuffle), one mergeable aggregation.
    */
  def twapQuery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_units"))
      .withColumn("dur_us", lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("total_dur_us"),
        // div, NOT /: decimal true-division rounds at a derived scale
        // (and DuckDB's decimal cast rounds half-up where Spark's
        // truncates) — integral floor division is the only operation
        // both engines define identically here
        expr("CAST(sum(CAST(v_units AS DECIMAL(38,0)) * dur_us) div " +
          "sum(CAST(dur_us AS DECIMAL(38,0))) AS BIGINT)").as("twap_units"),
        expr("sum(v_units) div count(1)").as("plain_mean_units"))
  }

  val twapSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us, event_id,
      |    CAST(round(value * 10000) AS BIGINT) AS v_units,
      |    lead(epoch_us(ts)) OVER (PARTITION BY event_type
      |                             ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_intervals,
      |  CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
      |  CAST(sum(CAST(v_units AS HUGEINT) * dur_us)
      |       // sum(CAST(dur_us AS HUGEINT)) AS BIGINT) AS twap_units,
      |  CAST(sum(v_units) // count(*) AS BIGINT) AS plain_mean_units
      |FROM ev WHERE dur_us IS NOT NULL
      |GROUP BY 1""".stripMargin

  // ——— q187: event-transition bigrams (first-order Markov counts) ———

  /** Per-user event-type TRANSITION counts — the first-order Markov
    * matrix behind every "what do users do next" product question and
    * behind session-path anomaly detection (a transition that never
    * occurs organically lighting up is bot traffic). One window per
    * user ((ts, event_id) order — deterministic under timestamp
    * ties), `lead` for the successor, one mergeable count. Scale:
    * the window partitions by the high-cardinality user_id — exactly
    * the shuffle profile Spark's window operator is built for; no
    * global ordering anywhere.
    */
  def transitionsQuery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  val transitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |FROM seq WHERE next_type IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  // ——— q193: ordered sequence-pattern matching ———

  /** Strict-order sequence detection — "users who did click → signup
    * → purchase IN THAT ORDER (gaps allowed)": the MATCH_RECOGNIZE /
    * Flink-CEP query shape, compiled to a per-user ordered fold
    * instead of an NFA operator. Each user's event types are
    * collected in (ts, event_id) order and a sequential `aggregate`
    * advances a pattern cursor — subsequence matching in one linear
    * pass, no self-joins (the three-way min-ts-join formulation
    * breaks down the moment a step can repeat). Scale: one shuffle
    * by user_id; per-key arrays are bounded by per-user activity —
    * the same envelope every sessionization op here lives in. The
    * fold is the oracle's `list_reduce`, same order, exact integers.
    */
  def sequenceMatchQuery(spark: SparkSession, dir: String): DataFrame = {
    // pattern steps carry value floors ("HIGH-VALUE click → signup →
    // purchase") so gated densities produce every cursor state, not
    // one — and because real CEP predicates are per-step conditions,
    // not bare type equality
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click" && col("value") > 120, 1)
          .when(col("event_type") === "signup" && col("value") > 180, 2)
          .when(col("event_type") === "purchase" && col("value") > 250, 3)
          .otherwise(0).as("code"))
      .groupBy(col("user_id"))
      .agg(expr("transform(sort_array(collect_list(struct(ts, event_id, code))), " +
        "r -> r.code)").as("codes"))
    perUser
      .select(col("user_id"), size(col("codes")).as("n_events"),
        expr("""aggregate(codes, 0,
          |  (s, c) -> CASE WHEN s = 0 AND c = 1 THEN 1
          |                 WHEN s = 1 AND c = 2 THEN 2
          |                 WHEN s = 2 AND c = 3 THEN 3
          |                 ELSE s END)""".stripMargin).as("steps_matched"))
      .withColumn("matched", col("steps_matched") === 3)
  }

  /** Oracle: the greedy fold re-expressed as a MIN-CHAIN — the
    * earliest step-1 event, the earliest step-2 event after it, the
    * earliest step-3 after that (greedy earliest-match and the fold
    * are provably the same subsequence decision). Deliberately NOT an
    * ordered `list()` aggregate: DuckDB's ordered aggregates came out
    * NON-DETERMINISTIC under multi-threaded aggregation on this
    * table's row count (per-thread partials concatenate in arbitrary
    * order — measured: 5 runs, 2+ distinct results), which would make
    * the gate flaky. Events order by a single packed key
    * (epoch-micros ·10⁶ + event_id, exact in HUGEINT) replicating
    * the Spark side's (ts, event_id) struct sort.
    */
  val sequenceMatchSql: String =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id AS k,
      |    CASE WHEN event_type = 'click' AND value > 120 THEN 1
      |         WHEN event_type = 'signup' AND value > 180 THEN 2
      |         WHEN event_type = 'purchase' AND value > 250 THEN 3
      |         ELSE 0 END AS code
      |  FROM events),
      |n AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
      |s1 AS (SELECT user_id, min(k) AS k1 FROM e WHERE code = 1 GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(k) AS k2 FROM e JOIN s1 USING (user_id)
      |       WHERE code = 2 AND k > k1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(k) AS k3 FROM e JOIN s2 USING (user_id)
      |       WHERE code = 3 AND k > k2 GROUP BY 1)
      |SELECT n.user_id, CAST(n_events AS INTEGER) AS n_events,
      |  CASE WHEN k3 IS NOT NULL THEN 3 WHEN k2 IS NOT NULL THEN 2
      |       WHEN k1 IS NOT NULL THEN 1 ELSE 0 END AS steps_matched,
      |  k3 IS NOT NULL AS matched
      |FROM n LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)""".stripMargin

  // ——— q196: inter-event gap percentiles (latency distribution) ———

  /** Inter-event-time distribution per event type — the latency /
    * cadence analytics of any event pipeline ("how often do users
    * click?", "is error burstiness changing?"): per user, gaps
    * between consecutive SAME-TYPE events (lead over the per-user
    * order), then the exact p50/p95 ORDER STATISTICS of those gaps
    * per type — the q180 discipline (exact ranks, never a sketch
    * under a hash gate), with gaps as integer microseconds so there
    * is no float anywhere. Scale: one window by (user, type) + one
    * window by type; both partition on real keys.
    */
  def gapPercentilesQuery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))).as("gap_us"))
      .filter(col("gap_us").isNotNull)
    val ranked = gaps
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("gap_us"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    ranked
      .filter(col("rn") === expr("(50 * (n - 1)) div 100 + 1") ||
        col("rn") === expr("(95 * (n - 1)) div 100 + 1"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_gaps"),
        min(col("gap_us")).as("p50_us"), max(col("gap_us")).as("p95_us"))
  }

  val gapPercentilesSql: String =
    """WITH gaps AS (
      |  SELECT event_type, event_id,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
      |                             ORDER BY ts, event_id) - epoch_us(ts) AS gap_us
      |  FROM events),
      |ranked AS (
      |  SELECT event_type, gap_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY gap_us, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM gaps WHERE gap_us IS NOT NULL)
      |SELECT event_type, max(n) AS n_gaps,
      |  min(gap_us) AS p50_us, max(gap_us) AS p95_us
      |FROM ranked
      |WHERE rn = (50 * (n - 1)) // 100 + 1 OR rn = (95 * (n - 1)) // 100 + 1
      |GROUP BY 1""".stripMargin

  // ——— q189: audience segmentation (set algebra over behavior) ———

  /** Audience segment sizes from set algebra over user behavior —
    * "did X and Y but never Z" — the targeting/report query behind
    * every growth dashboard. Expressed as one aggregation: per user,
    * a boolean per behavior (mergeable max-of-flags), then one count
    * per segment combination — NO self-joins, no intersect chains;
    * at 100 TB this is a single shuffle by user_id followed by a
    * tiny rollup, where the naive INTERSECT/EXCEPT formulation pays
    * a shuffle per set operation.
    */
  def segmentsQuery(spark: SparkSession, dir: String): DataFrame = {
    val flags = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        // value floors keep the flags discriminative (every user has
        // SOME event of each type at gated densities; "high-value
        // click" is the realistic segment definition anyway)
        max(when(col("event_type") === "click" && col("value") > 120, 1).otherwise(0))
          .as("clicked"),
        max(when(col("event_type") === "purchase" && col("value") > 180, 1).otherwise(0))
          .as("purchased"),
        max(when(col("event_type") === "error" && col("value") > 240, 1).otherwise(0))
          .as("errored"))
    flags.groupBy(col("clicked"), col("purchased"), col("errored"))
      .agg(count(lit(1)).as("n_users"))
  }

  val segmentsSql: String =
    """WITH flags AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'click' AND value > 120 THEN 1 ELSE 0 END) AS clicked,
      |    max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS purchased,
      |    max(CASE WHEN event_type = 'error' AND value > 240 THEN 1 ELSE 0 END) AS errored
      |  FROM events GROUP BY 1)
      |SELECT clicked, purchased, errored, count(*) AS n_users
      |FROM flags GROUP BY 1, 2, 3""".stripMargin

  // ——— q190: distribution drift between time halves ———

  /** Two-sample drift detection — the train/serve-skew monitor every
    * production feature pipeline runs: histogram the metric in two
    * time windows, compare with a chi-square-style statistic, flag
    * types whose distribution moved. Fixed equal-width bins (value ∈
    * [0, 500) by construction, 8 bins of 62.5) so binning is a pure
    * per-row map; counts are exact integers; the statistic rounds
    * each cell's (c1−c2)²/(c1+c2) to micro-units ONCE before the
    * integer sum, so both engines land on the identical number. Two
    * mergeable aggregations end to end.
    */
  def driftQuery(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.events(spark, dir)
      .select(col("event_type"),
        (to_date(col("ts")) >= lit("2024-01-16")).as("h2"),
        least(floor(col("value") / 62.5), lit(7.0)).cast("int").as("bin"))
    val cells = binned.groupBy(col("event_type"), col("bin"))
      .agg(count(when(!col("h2"), 1)).as("c1"), count(when(col("h2"), 1)).as("c2"))
    cells
      .withColumn("cell_micro",
        when(col("c1") + col("c2") > 0,
          expr("CAST(round(1e6 * (c1 - c2) * (c1 - c2) / (c1 + c2)) AS BIGINT)"))
          .otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(sum(col("cell_micro")).as("chi2_micro"))
      .withColumn("drifted", col("chi2_micro") > lit(20000000L))
  }

  val driftSql: String =
    """WITH binned AS (
      |  SELECT event_type,
      |    CAST(ts AS DATE) >= DATE '2024-01-16' AS h2,
      |    CAST(least(floor(value / 62.5), 7) AS INTEGER) AS bin
      |  FROM events),
      |cells AS (
      |  SELECT event_type, bin,
      |    count(CASE WHEN NOT h2 THEN 1 END) AS c1,
      |    count(CASE WHEN h2 THEN 1 END) AS c2
      |  FROM binned GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type,
      |    CASE WHEN c1 + c2 > 0
      |         THEN CAST(round(1e6 * (c1 - c2) * (c1 - c2) / (c1 + c2)) AS BIGINT)
      |         ELSE 0 END AS cell_micro
      |  FROM cells)
      |SELECT event_type, CAST(sum(cell_micro) AS BIGINT) AS chi2_micro,
      |  CAST(sum(cell_micro) AS BIGINT) > 20000000 AS drifted
      |FROM scored GROUP BY 1""".stripMargin

  // ——— q180: exact-rank winsorization ———

  /** Per-type winsorized statistics: clip values at the exact p05/p95
    * ORDER STATISTICS (the value at rank ⌊q·(n−1)⌋+1 under a
    * deterministic (value, event_id) order) and report the clipped
    * sum — the robust-mean preprocessing every metrics pipeline runs
    * before averaging heavy-tailed signals. Exact ranks, not
    * `approx_percentile`: a sketch quantile is engine- and
    * merge-order-dependent, which a hash gate can't hold; the exact
    * rank is one window per type plus two rank lookups, and all
    * reported quantities are 10⁻⁴-unit integers.
    *
    * Scale: the window partitions by event_type (low cardinality —
    * the skewed-partition story is q174's); at petabyte group sizes
    * swap the in-partition sort for the store's range layout or a
    * two-pass histogram refine, same contract.
    */
  def winsorizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_units"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("v_units"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val bounds = ev
      .filter(col("rn") === expr("(5 * (n - 1)) div 100 + 1") ||
        col("rn") === expr("(95 * (n - 1)) div 100 + 1"))
      .groupBy(col("event_type"))
      .agg(min(col("v_units")).as("lo_units"), max(col("v_units")).as("hi_units"))
    ev.join(bounds, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(col("lo_units")).as("lo_units"), max(col("hi_units")).as("hi_units"),
        sum(least(greatest(col("v_units"), col("lo_units")), col("hi_units")))
          .as("winsorized_sum_units"))
  }

  val winsorizeSql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v_units,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY CAST(round(value * 10000) AS BIGINT), event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |bounds AS (
      |  SELECT event_type, min(v_units) AS lo_units, max(v_units) AS hi_units
      |  FROM ev
      |  WHERE rn = (5 * (n - 1)) // 100 + 1 OR rn = (95 * (n - 1)) // 100 + 1
      |  GROUP BY 1)
      |SELECT e.event_type, max(e.n) AS n,
      |  max(b.lo_units) AS lo_units, max(b.hi_units) AS hi_units,
      |  CAST(sum(least(greatest(e.v_units, b.lo_units), b.hi_units)) AS BIGINT)
      |    AS winsorized_sum_units
      |FROM ev e JOIN bounds b USING (event_type)
      |GROUP BY 1""".stripMargin

  /** q214 — robust per-group outlier profiling: median/MAD instead of
    * mean/stddev (one wild sensor day shifts a mean and inflates a
    * stddev enough to hide itself; the median absolute deviation is
    * breakdown-point-0.5 robust). Flag = |x − med| > 3.5·1.4826·MAD,
    * the standard robust z-score gate.
    *
    * House determinism style (the q180 winsorize discipline): values
    * fixed-point to 1e-4 units, medians are LOWER-median RANK
    * SELECTIONS (rank (n−1) div 2 + 1 under a fully tie-broken order)
    * — no interpolation, no floats anywhere — and the 3.5·1.4826
    * threshold is EXACTLY the rational 51891/10000, so the flag is the
    * integer comparison `10000·dev > 51891·mad`. Two rank-selection
    * passes (value, then deviation), each one window over the
    * low-cardinality group key; scale = two shuffles by event_type.
    */
  def madOutliersQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_units"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("v_units"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    val med = ev.filter(col("rn") === expr("(n - 1) div 2 + 1"))
      .select(col("event_type"), col("v_units").as("med_units"))
    val dev = ev.join(med, "event_type")
      .select(col("event_type"), col("event_id"), col("n"),
        abs(col("v_units") - col("med_units")).as("dev_units"), col("med_units"))
      .withColumn("drn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("dev_units"), col("event_id"))))
    val mad = dev.filter(col("drn") === expr("(n - 1) div 2 + 1"))
      .select(col("event_type"), col("dev_units").as("mad_units"))
    dev.join(mad, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(col("med_units")).as("med_units"), max(col("mad_units")).as("mad_units"),
        sum(when(col("dev_units") * 10000L > col("mad_units") * 51891L, 1L).otherwise(0L))
          .as("n_out"))
  }

  val madOutliersSql: String =
    """WITH ev AS (
      |  SELECT event_type, event_id, CAST(round(value * 10000) AS BIGINT) AS v_units,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY CAST(round(value * 10000) AS BIGINT), event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |med AS (
      |  SELECT event_type, v_units AS med_units FROM ev WHERE rn = (n - 1) // 2 + 1),
      |dev AS (
      |  SELECT e.event_type, e.event_id, e.n, abs(e.v_units - m.med_units) AS dev_units,
      |    m.med_units,
      |    row_number() OVER (PARTITION BY e.event_type
      |                       ORDER BY abs(e.v_units - m.med_units), e.event_id) AS drn
      |  FROM ev e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, dev_units AS mad_units FROM dev WHERE drn = (n - 1) // 2 + 1)
      |SELECT d.event_type, max(d.n) AS n,
      |  max(d.med_units) AS med_units, max(a.mad_units) AS mad_units,
      |  CAST(sum(CASE WHEN d.dev_units * 10000 > a.mad_units * 51891 THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_out
      |FROM dev d JOIN mad a USING (event_type)
      |GROUP BY 1""".stripMargin

  val anomalyDaysSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS HUGEINT) AS d
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(d) AS HUGEINT) AS sx, CAST(sum(d * d) AS HUGEINT) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.day, CAST(d.d AS BIGINT) AS day_units,
      |  (s.n - 1) * (s.n * d.d - s.sx) * (s.n * d.d - s.sx)
      |    > 4 * s.n * (s.n * s.sxx - s.sx * s.sx) AS anomalous
      |FROM daily d JOIN stats s USING (event_type)""".stripMargin

  // ——— q199: SCD2 state-change intervals (gaps-and-islands) ———

  /** SCD2-style interval compression — the slowly-changing-dimension
    * build every warehouse runs: a per-user derived attribute (an
    * engagement TIER from the event's value) is compressed from one
    * row per event to one row per CHANGE, each carrying its validity
    * interval `[valid_from, valid_to)` (valid_to NULL = current) —
    * the gaps-and-islands pattern. Shape: one `lag` to flag changes,
    * a running `sum` to number islands, one groupBy to collapse
    * them, one `lead` to close each interval — every window
    * partitions by `user_id`, so the whole build is ONE key shuffle
    * and no global sort; at 100 TB the dimension build costs the
    * same as any per-user aggregation. Timestamps ride as integer
    * microseconds (no float, hash-exact); ties order by `event_id`.
    */
  def scd2Query(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("value") < 10.0, "low").when(col("value") < 100.0, "mid")
          .otherwise("high").as("tier"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val flagged = ev
      .withColumn("chg",
        when(lag(col("tier"), 1).over(w).isNull ||
          col("tier") =!= lag(col("tier"), 1).over(w), 1L).otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = flagged.groupBy(col("user_id"), col("grp"), col("tier"))
      .agg(min(col("ts_us")).as("valid_from"), count(lit(1)).as("n_events"))
    // order by (valid_from, grp): two islands share a valid_from when a
    // tier change lands between same-timestamp events — grp is the
    // monotone island number, so the chain stays deterministic
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("valid_from"), col("grp"))
    islands.select(col("user_id"), col("tier"), col("valid_from"),
      lead(col("valid_from"), 1).over(w2).as("valid_to"), col("n_events"))
  }

  val scd2Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |    CASE WHEN value < 10.0 THEN 'low' WHEN value < 100.0 THEN 'mid'
      |         ELSE 'high' END AS tier
      |  FROM events),
      |f AS (
      |  SELECT *, CASE WHEN lag(tier) OVER w IS NULL
      |                   OR tier <> lag(tier) OVER w THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |g AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
      |  FROM f),
      |i AS (
      |  SELECT user_id, grp, tier, min(ts_us) AS valid_from,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM g GROUP BY 1, 2, 3)
      |SELECT user_id, tier, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id
      |                         ORDER BY valid_from, grp) AS valid_to,
      |  n_events
      |FROM i""".stripMargin
}
