package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Closed-form checks for the behavioral operators (q177-q179) —
  * the oracle gates prove engine agreement; these pin the MATH.
  */
class BehavioralSpec extends SparkSuite {
  import spark.implicits._

  test("EWMA fixed point: constant-value stream converges to 2v units") {
    // v at every step, α=1/2: score → v·Σ2^−k = 2v (minus the shifted
    // tail); with v = 1.0000 (10 000 units), 30 lags: Σ_{k=0}^{29}
    // 10000 >> k = 10000+5000+2500+… = 19998 units (integer floors)
    val expected = (0 until 30).map(10000L >> _).sum
    val rows = (1 to 40).map(i => (1L, Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"), i.toLong, 1.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    // drive the same pipeline shape as ewmaQuery via a temp events table
    val got = withEvents(df)(Behavioral.ewmaQuery)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 40L, expected)), s"got $got, want ewma=$expected")
  }

  test("EWMA: most recent event dominates (shift-0 term is unshifted)") {
    val rows = Seq(
      (7L, Timestamp.valueOf("2024-01-01 00:00:01"), 1L, 100.0), // lag 1 → /2
      (7L, Timestamp.valueOf("2024-01-01 00:00:02"), 2L, 3.0))   // lag 0 → whole
    val got = withEvents(rows.toDF("user_id", "ts", "event_id", "value"))(Behavioral.ewmaQuery)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((7L, 2L, 30000L + 500000L)), s"got $got")
  }

  test("anomaly flag: one wild day among uniform days is flagged, the rest are not") {
    // 9 days at 100.0, one at 1000.0 — the spike is >2σ out; a
    // uniform series has σ=0 so EVERY deviation flags, hence the
    // non-spike days (equal to each other but not to the mean pulled
    // up by the spike) need the exact test, not intuition:
    // n=10, d=1e6 units (100.0): n·d−Σx = 10e6−19e6 = −9e6;
    // rhs: 4·10·(10·(9·1e12+1e14)−(19e6)²) = 4·10·(1.09e15−3.61e14)>0
    // lhs: 9·8.1e13 = 7.29e14 < 2.916e16 → not anomalous. Spike:
    // n·d−Σx = 1e8−1.9e7·… (exact arithmetic asserted via result)
    val days = (1 to 9).map(i => (1L, Timestamp.valueOf(f"2024-01-$i%02d 12:00:00"), i.toLong, 100.0)) :+
      ((1L, Timestamp.valueOf("2024-01-10 12:00:00"), 10L, 1000.0))
    val df = days.map { case (u, ts, id, v) => (id, ts, u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = withRawEvents(df)(Behavioral.anomalyDaysQuery)
      .select(col("day").cast("string"), col("anomalous")).as[(String, Boolean)]
      .collect().toMap
    assert(got("2024-01-10"), "spike day not flagged")
    (1 to 9).foreach(i => assert(!got(f"2024-01-$i%02d"), s"day $i wrongly flagged"))
  }

  test("market basket: lift of a deterministic pair matches hand arithmetic") {
    // 4 orders: {1,2} ×3, {1} ×1 → support(1,2)=3, n1=4, n2=3, N=4
    // confidence = 3/4 = 0.75; lift = 3·4/(4·3) = 1.0
    // Drives the PRODUCTION path (marketBasketQuery over a lineitem
    // parquet dir), not an inlined replica that could drift from it.
    val li = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L), (13L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-basket").toString
    li.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val res = Behavioral.marketBasketQuery(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(res == Seq((1L, 2L, 3L, 0.75, 1.0)), s"got $res")
  }

  test("SCD2 intervals: tier changes compress to chained validity intervals") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: low(×2) → mid → low: three intervals, each valid_to
    // chaining to the next valid_from, last interval open (NULL)
    val df = Seq(
      (1L, ts(0), 1L, 5.0), (2L, ts(1), 1L, 7.0),
      (3L, ts(2), 1L, 50.0), (4L, ts(3), 1L, 3.0))
      .map { case (id, t, u, v) => (id, t, u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = withRawEvents(df)(Behavioral.scd2Query)
      .select(col("tier"), col("valid_from"), col("valid_to"), col("n_events"))
      .as[(String, Long, Option[Long], Long)].collect().sortBy(_._2)
    assert(got.map(r => (r._1, r._4)).toSeq === Seq(("low", 2L), ("mid", 1L), ("low", 1L)),
      s"islands wrong: ${got.toSeq}")
    assert(got(0)._3.contains(got(1)._2) && got(1)._3.contains(got(2)._2),
      "intervals must chain: valid_to == next valid_from")
    assert(got(2)._3.isEmpty, "the current interval stays open (valid_to NULL)")
  }

  /** Run an events-table query fn against an ad-hoc 4-column frame
    * (user_id, ts, event_id, value) written as a one-table testdata
    * dir.
    */
  private def withEvents(df: org.apache.spark.sql.DataFrame)(
      fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) = {
    val full = df.select(col("event_id"), col("ts"), col("user_id"),
      lit("view").as("event_type"), col("value"), lit("{}").as("props"))
    withRawEvents(full)(fn)
  }

  test("MAD outliers: one wild reading flags; the mean-shift it causes hides nothing") {
    // 20 values at 100.0±small jitter and ONE at 100000.0. A mean/std
    // gate at 3.5σ would be dragged by the spike; the median/MAD gate
    // flags exactly the spike. Hand arithmetic: med=1000000+ units
    // scale... asserted via result: n_out must be exactly 1 and the
    // jittered bulk must not flag.
    val base = (1 to 20).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), 1L, "view",
        100.0 + (i % 5) * 0.01, "{}"))
    val rows = base :+ ((21L, Timestamp.valueOf("2024-01-01 00:59:00"), 1L, "view", 100000.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = withRawEvents(df)(Behavioral.madOutliersQuery)
      .select(col("event_type"), col("n"), col("n_out")).as[(String, Long, Long)]
      .collect().head
    assert(got === (("view", 21L, 1L)), s"got $got")
  }

  test("seasonal residuals: weekend dips are baseline, only the planted wild Wednesday flags") {
    // 4 weeks: weekdays 100.0, weekends 10.0 — a season-blind gate
    // (q179's, or q214 applied to raw days) sees every weekend as an
    // outlier; the dow-median baseline absorbs them. One Wednesday at
    // 5000.0 is the true anomaly.
    val start = java.time.LocalDate.parse("2024-01-01") // a Monday
    val rows = (0 until 28).map { i =>
      val day = start.plusDays(i.toLong)
      val dow = day.getDayOfWeek.getValue // 1=Mon..7=Sun
      val v = if (day.toString == "2024-01-17") 5000.0 // the wild Wednesday
              else if (dow >= 6) 10.0 else 100.0
      (i.toLong, Timestamp.valueOf(s"$day 12:00:00"), 1L, "view", v, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = withRawEvents(df)(Behavioral.seasonalResidualsQuery)
      .select(col("event_type"), col("n_days"), col("n_out"), col("max_dev_units"))
      .as[(String, Long, Long, Long)].collect().head
    assert(got === (("view", 28L, 1L, 49000000L)), s"got $got")
  }

  test("bootstrap CI: interval brackets the point estimate and is tight at n≈2000") {
    val got = Behavioral.bootstrapCiQuery(spark, sf)
      .select("event_type", "n", "point_mean_units", "ci_lo_units", "ci_hi_units", "point_in_ci")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length === 5)
    got.foreach { case (t, n, point, lo, hi, inCi) =>
      assert(lo < hi, s"$t: degenerate interval [$lo, $hi]")
      assert(inCi && lo <= point && point <= hi, s"$t: point $point outside [$lo, $hi]")
      // mean of ~2000 heavy-ish draws: the 90% CI halfwidth should be
      // well under 15% of the mean — a broken weight draw (all-zero,
      // all-equal) would blow this up or collapse it to zero
      assert(hi - lo < point * 3 / 10 && hi - lo > 0, s"$t: implausible width ${hi - lo} vs $point")
    }
  }

  test("TWAP: burst of readings cannot dominate the time-weighted mean") {
    // v=100 held 9s, then a 3-reading burst of v=1000 at 1s gaps, then
    // a terminal event. plain mean = (1e6 + 3·1e7) div 4 = 7,750,000;
    // TWAP = (1e6·9e6 + 1e7·3e6) div 12e6 = 3,250,000 — the burst is
    // 75% of the readings but only 25% of the time
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 100.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:09"), 1L, "view", 1000.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 00:00:10"), 1L, "view", 1000.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-01 00:00:11"), 1L, "view", 1000.0, "{}"),
      (5L, Timestamp.valueOf("2024-01-01 00:00:12"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = withRawEvents(rows)(Behavioral.twapQuery)
      .select("event_type", "n_intervals", "total_dur_us", "twap_units", "plain_mean_units")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got === (("view", 4L, 12000000L, 3250000L, 7750000L)), s"got $got")
  }

  private def withRawEvents(full: org.apache.spark.sql.DataFrame)(
      fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-behavioral").toString
    full.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    fn(spark, dir)
  }
}
