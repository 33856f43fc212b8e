package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Round-2 streaming depth: the stream shapes Flink programs lean on
  * beyond the reference's own inner windowed join — outer windowed
  * joins (emit-unmatched-on-close), chained stateful operators
  * (join → windowed aggregation in ONE streaming query), and Spark
  * 4's `transformWithState` arbitrary-state API (the successor of
  * `flatMapGroupsWithState`, RocksDB-backed).
  */
object AdvancedStreams {

  /** One hour-windowed, watermarked side of the q58/q59/q209 joins —
    * the filter comes BEFORE the watermark so each side's watermark
    * tracks its own event type STRUCTURALLY, not via the optimizer
    * happening to push the filter below the EventTimeWatermark node.
    */
  private def hourWindowSide(ev: DataFrame, eventType: String, idAs: String): DataFrame =
    ev.filter(col("event_type") === eventType)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), window(col("ts"), "1 hour").as("w"), col("event_id").as(idAs))

  /** The q58-documented global-watermark threshold as a SQL scalar
    * subquery: least of the two per-side max timestamps, NULL when
    * either side is empty (an un-started watermark operator pins the
    * global watermark at 0, so no window ever closes). Shared by the
    * q58/q209 oracles so the convention cannot fork.
    */
  private val globalWatermarkSql: String =
    """(SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click') IS NOT NULL
      |              AND max(ts) FILTER (WHERE event_type = 'purchase') IS NOT NULL
      |        THEN least(max(ts) FILTER (WHERE event_type = 'click'),
      |                   max(ts) FILTER (WHERE event_type = 'purchase')) END
      | FROM events)""".stripMargin

  /** Left-outer windowed stream-stream join: matches emit in-batch;
    * unmatched clicks emit null-padded once the watermark proves no
    * purchase can still arrive for their window (state eviction).
    * Same state bound as the inner join: one open window per key side.
    */
  def outerWindowJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = StreamOps.eventsStream(spark, dir)
    val clicks = hourWindowSide(ev, "click", "click_id")
    val purchases = hourWindowSide(ev, "purchase", "purchase_id")
      .withColumnRenamed("user_id", "p_user_id").withColumnRenamed("w", "p_w")
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") && col("w") === col("p_w"), "left_outer")
      .select(col("user_id"), unix_micros(col("w.start")).as("win_start"),
        col("click_id"), col("purchase_id"))
    StreamOps.runToMemory(joined, "append")
  }

  /** Oracle: every matched pair (any window — inner results are never
    * withheld) plus unmatched clicks of CLOSED windows only. "Closed"
    * is governed by the GLOBAL watermark = min over the two watermark
    * operators; each side filters to its event type BEFORE its
    * watermark node, so a side's watermark tracks only its own
    * events' max ts. The threshold is therefore
    * least(max click ts, max purchase ts), not max(ts) overall — and
    * NULL when EITHER side is empty (an un-started watermark operator
    * pins the global watermark at 0, so no window ever closes; SQL
    * `least` would skip the NULL and wrongly close windows by the
    * other side's clock).
    */
  val outerWindowJoinSql: String =
    s"""SELECT a.user_id, CAST(epoch_us(date_trunc('hour', a.ts)) AS BIGINT) AS win_start,
       | a.event_id AS click_id, b.event_id AS purchase_id
       |FROM (SELECT * FROM events WHERE event_type = 'click') a
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
       |  ON a.user_id = b.user_id AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
       |WHERE b.event_id IS NOT NULL
       |   OR date_trunc('hour', a.ts) + INTERVAL 1 HOUR <=
       |      $globalWatermarkSql""".stripMargin

  /** q209 — FULL-outer windowed stream-stream join: the last cell of
    * the stream-join matrix (inner q14/q166, left-outer window q58,
    * left-outer interval q203). Matches emit in-batch; BOTH sides'
    * unmatched rows emit null-padded once the global watermark closes
    * their window — so the same state bound as the inner join governs,
    * and neither side's state can grow past one open window per key.
    * The output key columns coalesce across sides because a null-padded
    * row carries only its own side's key.
    */
  def fullOuterWindowJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = StreamOps.eventsStream(spark, dir)
    val clicks = hourWindowSide(ev, "click", "click_id")
    val purchases = hourWindowSide(ev, "purchase", "purchase_id")
      .withColumnRenamed("user_id", "p_user_id").withColumnRenamed("w", "p_w")
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") && col("w") === col("p_w"), "full_outer")
      .select(coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        unix_micros(coalesce(col("w.start"), col("p_w.start"))).as("win_start"),
        col("click_id"), col("purchase_id"))
    StreamOps.runToMemory(joined, "append")
  }

  /** Oracle: all matched pairs, plus each side's unmatched rows whose
    * window end the global watermark (= least of the two per-side max
    * timestamps, NULL when either side is empty — see q58) reached.
    */
  val fullOuterWindowJoinSql: String =
    s"""SELECT coalesce(a.user_id, b.user_id) AS user_id,
       | CAST(epoch_us(date_trunc('hour', coalesce(a.ts, b.ts))) AS BIGINT) AS win_start,
       | a.event_id AS click_id, b.event_id AS purchase_id
       |FROM (SELECT * FROM events WHERE event_type = 'click') a
       |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
       |  ON a.user_id = b.user_id AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
       |WHERE (a.event_id IS NOT NULL AND b.event_id IS NOT NULL)
       |   OR date_trunc('hour', coalesce(a.ts, b.ts)) + INTERVAL 1 HOUR <=
       |      $globalWatermarkSql""".stripMargin

  /** Chained stateful operators in one query (Spark ≥3.4 capability):
    * windowed stream-stream join feeding a windowed aggregation —
    * Flink's join→keyBy→window composition without materializing the
    * intermediate stream. Two state stores, one watermark lineage.
    */
  def joinThenWindowCount(spark: SparkSession, dir: String): DataFrame = {
    val ev = StreamOps.eventsStream(spark, dir)
    val clicks = hourWindowSide(ev, "click", "click_id")
    val purchases = hourWindowSide(ev, "purchase", "purchase_id")
      .withColumnRenamed("user_id", "p_user_id").withColumnRenamed("w", "p_w")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user_id") && col("w") === col("p_w"), "inner")
    // distinct aggregates are unsupported on streams — min/max are the
    // deterministic per-window extras here
    val agg = joined
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"))
      .select(unix_micros(col("w.start")).as("win_start"), col("n_pairs"),
        col("min_user"), col("max_user"))
    StreamOps.runToMemory(agg, "append")
  }

  /** Oracle: per-window pair counts over the inner join, windows whose
    * end the final watermark reached. The aggregation's watermark is
    * the JOIN's output watermark = min of the two (filter-pushed)
    * sides — least(max click ts, max purchase ts), as in q58.
    */
  val joinThenWindowCountSql: String =
    """SELECT CAST(epoch_us(date_trunc('hour', a.ts)) AS BIGINT) AS win_start,
      | count(*) AS n_pairs, min(a.user_id) AS min_user, max(a.user_id) AS max_user
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
      |WHERE date_trunc('hour', a.ts) + INTERVAL 1 HOUR <=
      |      (SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click') IS NOT NULL
      |                    AND max(ts) FILTER (WHERE event_type = 'purchase') IS NOT NULL
      |              THEN least(max(ts) FILTER (WHERE event_type = 'click'),
      |                         max(ts) FILTER (WHERE event_type = 'purchase')) END
      |       FROM events)
      |GROUP BY 1""".stripMargin

  // ——— transformWithState (Spark 4 arbitrary state API) ———

  case class EvRow(user_id: Long, value: Double)
  case class UserAgg(user_id: Long, n: Long, max_value: Double)

  /** Per-user running (count, max) in a `ValueState` — the
    * `transformWithState` analog of a Flink `KeyedProcessFunction`
    * with value state. Emits the running aggregate per key per batch
    * (update semantics); the memory sink therefore holds the final
    * totals once the single gated batch completes.
    */
  class UserAggProcessor extends StatefulProcessor[Long, EvRow, UserAgg] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvRow],
        timerValues: TimerValues): Iterator[UserAgg] = {
      var n = 0L
      var mx = Double.NegativeInfinity
      if (st.exists()) { val prev = st.get(); n = prev._1; mx = prev._2 }
      rows.foreach { r => n += 1; if (r.value > mx) mx = r.value }
      st.update((n, mx))
      Iterator.single(UserAgg(key, n, mx))
    }
  }

  /** transformWithState requires the RocksDB state store provider —
    * installed for this query only via [[StreamOps.withRocksDb]] (the
    * HDFS-backed default stays in place for every other streaming
    * query; the provider class is private[sql], referenced by name as
    * spark-submit would).
    */
  def transformWithStateAgg(spark: SparkSession, dir: String): DataFrame =
      StreamOps.withRocksDb(spark) {
    import spark.implicits._
    val ev = StreamOps.eventsStream(spark, dir)
      .select(col("user_id"), col("value")).as[EvRow]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new UserAggProcessor, TimeMode.None(), OutputMode.Update(),
        Encoders.product[UserAgg])
    StreamOps.runToMemory(out.toDF(), "update")
  }

  val transformWithStateAggSql: String =
    "SELECT user_id, count(*) AS n, max(value) AS max_value FROM events GROUP BY user_id"

  /** q166 — time-INTERVAL stream-stream join: purchases attributed to
    * a same-user click they follow within 30 minutes — the other
    * canonical Spark stream-stream join shape next to q14/q58's
    * window-struct equality. The range condition on the two event
    * times is what tells Spark how long to hold each side's state
    * (clicks evict once the purchase watermark passes ts + 30 min;
    * purchases once the click watermark passes their ts) — a
    * watermark-bounded state window, not a tumbling bucket, so a
    * click at :55 still matches a purchase at :10 across the hour
    * boundary that q14 would drop. Inner matches emit in-batch;
    * nothing is withheld for window closure, so the oracle is the
    * plain interval self-join. Gap reported in exact microseconds.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = StreamOps.eventsStream(spark, dir)
    def side(eventType: String) =
      ev.filter(col("event_type") === eventType).withWatermark("ts", "0 seconds")
    val clicks = side("click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val purchases = side("purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    StreamOps.runToMemory(joined, "append")
  }

  val intervalJoinSql: String =
    """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
      |  CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts
      | AND b.ts <= a.ts + INTERVAL 30 MINUTE""".stripMargin

  // ——— q205/q206: the remaining transformWithState state types ———

  case class TypedEv(user_id: Long, event_type: String, ts_us: Long, event_id: Long)
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-(user, type) running counts in a MAP STATE — the Flink
    * `MapState<K,V>` analog: one RocksDB map per user keyed by event
    * type, point-updated per row (`getValue`/`updateValue` touch ONE
    * entry; the map never materializes except to emit). The state
    * shape for per-key sub-keyed live aggregates — feature counters,
    * per-category tallies — where a ValueState would force
    * read-modify-write of the whole structure per event.
    */
  class TypeCountProcessor extends StatefulProcessor[Long, TypedEv, TypeCount] {
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEv],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { r =>
        val prev = if (st.containsKey(r.event_type)) st.getValue(r.event_type) else 0L
        st.updateValue(r.event_type, prev + 1L)
        touched += r.event_type
      }
      touched.iterator.map(t => TypeCount(key, t, st.getValue(t)))
    }
  }

  /** q205 — MapState gate: the per-(user, type) counts after the
    * single batch must equal the plain GROUP BY.
    */
  def mapStateCountsQuery(spark: SparkSession, dir: String): DataFrame =
      StreamOps.withRocksDb(spark) {
    import spark.implicits._
    val ev = StreamOps.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id")).as[TypedEv]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Update(),
        Encoders.product[TypeCount])
    StreamOps.runToMemory(out.toDF(), "update")
  }

  val mapStateCountsSql: String =
    "SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2"

  /** State-TTL exemplar: a per-key running count whose ValueState
    * carries a processing-time TTL — Spark evicts the entry once the
    * TTL elapses after its last write, so an abandoned key's state
    * disappears WITHOUT a timer, a tombstone batch, or any code path
    * touching the key again. This is the low-ceremony state bound for
    * 100 TB keyspaces where most keys go cold (session tokens, crawl
    * frontiers): watermark eviction needs event time, timers need
    * per-key scheduling — TTL is a blanket lease. Wall-clock-based, so
    * it is spec-pinned (TransformWithStateRecoverySpec), not
    * oracle-gated: a gate's output would depend on scheduling delay.
    */
  class TtlCountProcessor(ttlMillis: Long) extends StatefulProcessor[Long, TypedEv, TypeCount] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMillis)))

    override def handleInputRows(key: Long, rows: Iterator[TypedEv],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val prev = if (st.exists()) st.get() else 0L
      val n = prev + rows.size
      st.update(n)
      Iterator.single(TypeCount(key, "n", n))
    }
  }

  case class LastK(user_id: Long, recent_ids: Seq[Long])

  /** Per-user last-k event ids in a LIST STATE — the Flink
    * `ListState<T>` analog: appends are O(1) RocksDB merges (no
    * read-modify-write of the whole list on the hot path); the
    * truncate-to-k rewrite happens only when the list actually
    * exceeds k. The state shape for bounded recency buffers —
    * session tails, recent-item feature windows.
    */
  class LastKProcessor(k: Int) extends StatefulProcessor[Long, TypedEv, LastK] {
    @transient private var st: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[(Long, Long)]("recent",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEv],
        timerValues: TimerValues): Iterator[LastK] = {
      rows.foreach(r => st.appendValue((r.ts_us, r.event_id)))
      val all = st.get().toSeq.sortBy(t => (t._1, t._2))
      val kept = all.takeRight(k)
      if (all.length > k) st.put(kept.toArray) // fold down only past the bound
      Iterator.single(LastK(key, kept.map(_._2)))
    }
  }

  /** q206 — ListState gate: each user's recency buffer after the
    * single batch = the top-k most recent event ids, ascending by
    * (ts, id); the oracle rebuilds it relationally.
    */
  def listStateLastKQuery(spark: SparkSession, dir: String): DataFrame =
      StreamOps.withRocksDb(spark) {
    import spark.implicits._
    val ev = StreamOps.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id")).as[TypedEv]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new LastKProcessor(3), TimeMode.None(), OutputMode.Update(),
        Encoders.product[LastK])
    StreamOps.runToMemory(out.toDF(), "update")
      .select(col("user_id"),
        concat_ws(",", col("recent_ids")).as("recent_ids"))
  }

  val listStateLastKSql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id,
      |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rn DESC) AS recent_ids
      |FROM ranked WHERE rn <= 3 GROUP BY 1""".stripMargin

  // ——— event-time TIMERS: session-timeout detection ———

  case class SessRow(user_id: Long, ts_ms: Long)
  case class SessionOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /** Session-close detection with EVENT-TIME TIMERS — the
    * `transformWithState` analog of a Flink `KeyedProcessFunction`
    * registering `ctx.timerService().registerEventTimeTimer(...)`:
    * each batch of a user's events extends the open session and
    * RE-ARMS one timer at `last + gap`; when the WATERMARK passes
    * that expiry, [[handleExpiredTimer]] fires, emits the completed
    * session, and clears the state. Unlike the window-library
    * sessionization (q34/q71), the timer decides emission — the
    * shape to reach for when session close must trigger ACTION
    * (alerts, cache eviction, handoff), not just an aggregate row.
    * State per key: one (start, last, n) triple + one timer — O(1).
    * In-batch gap splits close sessions inline; the timer handles
    * the tail the stream never revisits.
    */
  class SessionTimeoutProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessRow, SessionOut] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessRow],
        timerValues: TimerValues): Iterator[SessionOut] = {
      var (start, last, n) =
        if (st.exists()) st.get() else (Long.MaxValue, Long.MinValue, 0L)
      val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
      rows.toSeq.sortBy(_.ts_ms).foreach { r =>
        if (n > 0 && r.ts_ms - last > gapMs) {
          out += SessionOut(key, start, last, n)
          start = Long.MaxValue; n = 0
        }
        start = math.min(start, r.ts_ms)
        last = math.max(last, r.ts_ms)
        n += 1
      }
      // one armed timer per key: re-arm at the new session horizon
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(last + gapMs)
      st.update((start, last, n))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (st.exists()) {
        val (start, last, n) = st.get()
        // a re-armed timer deletes its predecessor, but fire defensively
        // only when this expiry IS the session's current horizon
        if (last + gapMs == expiredTimerInfo.getExpiryTimeInMs) {
          st.clear()
          Iterator.single(SessionOut(key, start, last, n))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  // ——— q203: stream-stream LEFT OUTER interval join ———

  /** q166's interval join with LEFT OUTER semantics — the attribution
    * query as production runs it: every click emits, matched ones
    * with their purchase, unmatched ones with NULLs once the
    * watermark proves no purchase can arrive anymore (state for a
    * click evicts when the global watermark passes c_ts + 30 min;
    * Spark's no-data micro-batch flushes those evictions, which is
    * what makes this gateable in one pass). The oracle is the batch
    * left join restricted to clicks that are either MATCHED (inner
    * matches emit in-batch regardless) or CLOSED (interval end ≤ the
    * final watermark = least of the two sides' max event times —
    * each side carries its own 0s watermark and the join takes the
    * min). The unmatched-but-still-open tail is exactly what a
    * restart would resume, not rows to guess at.
    */
  def leftOuterIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = StreamOps.eventsStream(spark, dir)
    def side(eventType: String) =
      ev.filter(col("event_type") === eventType).withWatermark("ts", "0 seconds")
    val clicks = side("click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val purchases = side("purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    StreamOps.runToMemory(joined, "append")
  }

  val leftOuterIntervalJoinSql: String =
    """WITH wm AS (
      |  SELECT CASE WHEN max(ts) FILTER (WHERE event_type = 'click') IS NOT NULL
      |               AND max(ts) FILTER (WHERE event_type = 'purchase') IS NOT NULL
      |         THEN least(max(ts) FILTER (WHERE event_type = 'click'),
      |                    max(ts) FILTER (WHERE event_type = 'purchase')) END AS w
      |  FROM events)
      |SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') a
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts
      | AND b.ts <= a.ts + INTERVAL 30 MINUTE
      |WHERE b.event_id IS NOT NULL
      |   OR a.ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)""".stripMargin

  // ——— streaming EWMA (q183): the q177 score maintained live ———

  case class EwRow(user_id: Long, ts_us: Long, event_id: Long, v_units: Long)
  case class EwOut(user_id: Long, n_events: Long, ewma_units: Long)

  /** [[graft.operators.Behavioral.ewmaQuery]]'s fixed-point decayed
    * engagement score maintained AS STATE: per user, a (total count,
    * ring of the `EwmaMaxLag` most recent (ts, event_id, v_units))
    * pair in a `ValueState`. Each batch merges its rows into the
    * ring by the same (ts, event_id) order the batch operator sorts
    * by, truncates to the lag bound — state per key is O(lag),
    * CONSTANT in stream length — and re-emits the user's current
    * score. Late rows inside the ring's horizon reorder correctly;
    * a row older than the whole ring is beyond the score's 2⁻³⁰
    * resolution by construction, which is why the lag bound is also
    * the exactly-correct state bound.
    */
  class EwmaProcessor extends StatefulProcessor[Long, EwRow, EwOut] {
    private val MaxLag = graft.operators.Behavioral.EwmaMaxLag
    @transient private var st: ValueState[(Long, Seq[(Long, Long, Long)])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Seq[(Long, Long, Long)])]("ewma",
        Encoders.product[(Long, Seq[(Long, Long, Long)])], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EwRow],
        timerValues: TimerValues): Iterator[EwOut] = {
      val (prevN, prevRing) = if (st.exists()) st.get() else (0L, Seq.empty[(Long, Long, Long)])
      val incoming = rows.map(r => (r.ts_us, r.event_id, r.v_units)).toSeq
      val ring = (prevRing ++ incoming).sortBy(t => (t._1, t._2)).takeRight(MaxLag)
      val n = prevN + incoming.size
      st.update((n, ring))
      // lag 0 = most recent; v ≥ 0 so >> lag == div 2^lag
      val score = ring.reverseIterator.zipWithIndex.map { case ((_, _, v), lag) => v >> lag }.sum
      Iterator.single(EwOut(key, n, score))
    }
  }

  /** q183 — the streaming twin of q177: same RocksDB provider dance
    * as q60, same oracle as the batch EWMA (the single gated batch
    * must land exactly where the batch pipeline lands).
    */
  def streamEwma(spark: SparkSession, dir: String): DataFrame =
      StreamOps.withRocksDb(spark) {
    import spark.implicits._
    val ev = StreamOps.eventsStream(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("v_units"))
      .as[EwRow]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Update(),
        Encoders.product[EwOut])
    StreamOps.runToMemory(out.toDF(), "update")
  }
}
