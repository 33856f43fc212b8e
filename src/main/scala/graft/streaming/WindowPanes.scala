package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** W4/W5 — Flink's WindowFunction / ProcessWindowFunction analog:
  * per-element processing of a *closed* window pane with access to
  * window metadata (reference `NoChangeWindowFunction`
  * ParquetTableJoin.scala:119-130 and `CustomerProcessWindowFunction`
  * :103-116, which emits `context.window.maxTimestamp`).
  *
  * Spark's built-in `window()` aggregation can't hand the user the
  * pane's element list with metadata, so this is the SURVEY §7.3
  * custom stateful op: group by (key, window-start), buffer the pane
  * in state, arm an event-time timeout at window end; when the
  * watermark passes the end, the timeout fires, the pane function
  * runs over the buffered elements, and the state is freed. State is
  * O(pane) per open window and exactly one window per key is open at
  * steady state with a 0s watermark.
  *
  * Window-metadata convention (SURVEY §7.4 #2): Flink's
  * `maxTimestamp = windowEnd − 1ms`; we emit `max_ts_us = end_us − 1000`.
  */
object WindowPanes {

  /** `ts` must remain a member: the watermarked event-time column has
    * to flow into the stateful operator's input for EventTimeTimeout
    * to be allowed (a typed `.map` would sever the watermark).
    */
  case class PaneElement(key: Long, win_start_us: Long, id: Long, value: Double,
      ts: java.sql.Timestamp)

  /** One output row per element of a closed pane, enriched with the
    * pane size and the Flink-convention max timestamp (W5's shape).
    */
  case class PaneRow(key: Long, win_start_us: Long, id: Long, value: Double,
      pane_size: Int, max_ts_us: Long)

  /** Public: the state encoder's generated code must construct it. */
  case class PaneState(elements: List[PaneElement])

  /** The reusable pane processor (public for composition and tests). */
  def paneProcessor(windowUs: Long)(
      key: (Long, Long), rows: Iterator[PaneElement], state: GroupState[PaneState]): Iterator[PaneRow] = {
    if (state.hasTimedOut) {
      // prepend-accumulated order is irrelevant: the emission sorts by
      // id anyway, so no reverse pass
      val elems = state.getOption.map(_.elements).getOrElse(Nil)
      state.remove()
      val endUs = key._2 + windowUs
      val out = elems.sortBy(_.id)
        .map(e => PaneRow(e.key, e.win_start_us, e.id, e.value, elems.length, endUs - 1000L))
      out.iterator
    } else {
      val st = state.getOption.getOrElse(PaneState(Nil))
      state.update(PaneState(rows.foldLeft(st.elements)((acc, e) => e :: acc)))
      // fire when the watermark REACHES the window end: the timeout
      // fires on `timeout < watermark` (strict), so the Flink
      // maxTimestamp convention (end − 1ms) makes a watermark landing
      // EXACTLY on the boundary close the pane — the `end ≤ max ts`
      // contract the windowed-aggregation path and the oracle share.
      // With `end` itself as the timeout, a max event time in
      // [end, end+1ms) would strand the pane the oracle includes.
      state.setTimeoutTimestamp((key._2 + windowUs) / 1000L - 1L)
      Iterator.empty
    }
  }

  /** Apply pane processing to the `events` stream: key = user_id,
    * 1-hour tumbling event-time windows, 0s watermark.
    */
  def eventPanes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val windowUs = 3600L * 1000000L
    val elems = StreamOps.eventsStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(
        col("user_id").as("key"),
        unix_micros(date_trunc("hour", col("ts"))).as("win_start_us"),
        col("event_id").as("id"),
        col("value"),
        col("ts"))
    val fired = elems.as[PaneElement]
      .groupByKey(e => (e.key, e.win_start_us))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        paneProcessor(windowUs))
      .toDF()
    StreamOps.runToMemory(fired, "append")
  }

  /** Oracle: every element of every closed (end ≤ max ts) pane,
    * enriched with pane size and end−1ms in micros.
    */
  val eventPanesSql: String =
    """WITH e AS (
      |  SELECT user_id AS key,
      |    CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS win_start_us,
      |    event_id AS id, value, ts
      |  FROM events)
      |SELECT key, win_start_us, id, value,
      |  CAST(count(*) OVER (PARTITION BY key, win_start_us) AS INTEGER) AS pane_size,
      |  win_start_us + 3600000000 - 1000 AS max_ts_us
      |FROM e
      |WHERE win_start_us + 3600000000 <= (SELECT CAST(epoch_us(max(ts)) AS BIGINT) FROM events)""".stripMargin
}
