package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** W3 — Flink's sliding count window (`countWindow(size, slide)`,
  * reference WindowWordCount.scala:45), which Spark lacks as a
  * built-in: per key, fire on every `slide`-th element, aggregating
  * the last `min(size, seen)` elements.
  *
  * Implemented as the SURVEY §7.3 "custom stateful op":
  * `groupByKey(...).flatMapGroupsWithState` holding per-key state of
  * (elements seen, ring buffer of the last `size` values). The state
  * is O(size) per key — bounded regardless of stream length — and
  * lives in the state store, so the operator scales horizontally with
  * key-hash partitioning like any Spark stateful op. Works unchanged
  * on batch Datasets (Spark runs the same function with empty initial
  * state), which is how the oracle gate replays it.
  *
  * Determinism: within each micro-batch a key's rows are processed in
  * (ord, id) order (the iterator is sorted before folding); sums are
  * computed in DECIMAL(·,4), so the firing sequence is reproducible
  * and engine-independent.
  */
object CountWindows {

  /** One input element: key + two ordering columns + the value. */
  case class Element(key: Long, ord: Long, id: Long, value: Double)

  /** One window firing: after `n_seen` elements of `key`, the sum of
    * the last `win_size` values.
    */
  case class Firing(key: Long, n_seen: Long, win_size: Int, sum_value: Double)

  /** Ring-buffer state: total seen + last `size` values (oldest first). */
  // Vector, not List: the ring append (`:+` then takeRight) is
  // amortized O(1)/O(size) on Vector but O(size) COPY per element on
  // List — pure per-record overhead in the hot stateful operator
  case class State(seen: Long, buf: Vector[Double])

  private def scale4(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP)

  private def fire(key: Long, st: State): Firing = {
    val sum = st.buf.foldLeft(JBigDecimal.ZERO)((acc, v) => acc.add(scale4(v)))
    Firing(key, st.seen, st.buf.length, sum.doubleValue())
  }

  private def process(size: Int, slide: Int)(
      key: Long, rows: Iterator[Element], state: GroupState[State]): Iterator[Firing] = {
    val sorted = rows.toArray.sortBy(e => (e.ord, e.id))
    var st = state.getOption.getOrElse(State(0L, Vector.empty))
    val out = Iterator.newBuilder[Firing]
    sorted.foreach { e =>
      val buf = (st.buf :+ e.value).takeRight(size)
      st = State(st.seen + 1, buf)
      if (st.seen % slide == 0) out += fire(key, st)
    }
    state.update(st)
    out.result()
  }

  /** Apply the count window to a typed element stream (or batch). */
  def slidingCountWindow(ds: Dataset[Element], size: Int, slide: Int): Dataset[Firing] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(size, slide))
  }

  /** The oracle-gated query: countWindow(100, 10) over `events` keyed
    * by user, ordered by (ts, event_id), summing `value` — driven
    * through the streaming engine into a memory sink.
    */
  def eventCountWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val elems = StreamOps.eventsStream(spark, dir)
      .select(
        col("user_id").as("key"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("ord"),
        col("event_id").as("id"),
        col("value"))
      .as[Element]
    val fired = slidingCountWindow(elems, size = 100, slide = 10)
      .toDF("user_id", "n_seen", "win_size", "sum_value")
    StreamOps.runToMemory(fired, "append")
  }

  val eventCountWindowsSql: String =
    """WITH seq AS (
      |  SELECT user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |win AS (
      |  SELECT user_id, rn,
      |    CAST(sum(CAST(value AS DECIMAL(18,4)))
      |      OVER (PARTITION BY user_id ORDER BY rn
      |            ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_value,
      |    least(rn, 100) AS win_size
      |  FROM seq)
      |SELECT user_id, CAST(rn AS BIGINT) AS n_seen, CAST(win_size AS INTEGER) AS win_size,
      |  sum_value
      |FROM win WHERE rn % 10 = 0""".stripMargin
}
