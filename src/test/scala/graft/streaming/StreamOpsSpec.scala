package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSuite

/** W1/W2/W6/W7 semantics on MemoryStream with injected event times:
  * tumbling windows fire once the 0-slack watermark passes, and rows
  * behind the watermark are dropped (reference
  * `AssignerWithPeriodicWatermarks` with watermark = max observed ts,
  * no allowedLateness — ParquetTableJoin.scala:132-142).
  */
class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with 0s watermark emits closed windows and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "word", "v")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("word"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(DecimalType(18, 4))).as("s"))
      .select(col("window.start").cast("string").as("win"), col("word"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("w1").start()
    try {
      // hour-10 rows, then an hour-11 row that advances the watermark past 11:00
      mem.addData((ts("2024-01-01 10:00:01"), "a", 1.0), (ts("2024-01-01 10:30:00"), "a", 2.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 11:00:05"), "b", 3.0))
      q.processAllAvailable()
      // late row for hour 10 — behind the watermark, must be dropped (W7)
      mem.addData((ts("2024-01-01 10:45:00"), "a", 99.0))
      q.processAllAvailable()
      // advance watermark past hour 11 so b's window also closes
      mem.addData((ts("2024-01-01 12:00:10"), "c", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("w1").as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01 10:00:00", "a", 2L), // late row NOT counted
      ("2024-01-01 11:00:00", "b", 1L)))
  }

  test("stream-stream LEFT OUTER interval join: unmatched side emits nulls only after watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val clicksMem = MemoryStream[(Long, Timestamp, Long)]
    val buysMem = MemoryStream[(Long, Timestamp, Long)]
    val clicks = clicksMem.toDF().toDF("user_id", "c_ts", "click_id")
      .withWatermark("c_ts", "0 seconds")
    val buys = buysMem.toDF().toDF("p_user_id", "p_ts", "purchase_id")
      .withWatermark("p_ts", "0 seconds")
    val joined = clicks.join(buys,
        col("user_id") === col("p_user_id") &&
          col("p_ts") > col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("louter").start()
    try {
      // u1's click matches; u2's click has no purchase in its window
      clicksMem.addData((1L, ts("2024-01-01 10:00:00"), 100L),
        (2L, ts("2024-01-01 10:05:00"), 200L))
      buysMem.addData((1L, ts("2024-01-01 10:10:00"), 900L))
      q.processAllAvailable()
      val inner = spark.table("louter").as[(Long, Long, Option[Long])].collect().toSet
      assert(inner === Set((1L, 100L, Some(900L))),
        s"only the matched pair may emit before the watermark closes u2's window: $inner")
      // advance BOTH watermarks past 10:35 → u2's click can never
      // match anymore and must emit with a null purchase
      clicksMem.addData((9L, ts("2024-01-01 12:00:00"), 901L))
      buysMem.addData((8L, ts("2024-01-01 12:00:00"), 902L))
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("louter").as[(Long, Long, Option[Long])].collect().toSet
    assert(got.contains((2L, 200L, None)),
      s"watermark-closed unmatched click must emit the outer row: $got")
    assert(!got.exists(r => r._1 == 9L),
      "the watermark-advancing click is still open and must not emit yet")
  }

  test("stream-stream FULL OUTER window join: both sides' unmatched rows emit after close") {
    implicit val sqlCtx = spark.sqlContext
    val clicksMem = MemoryStream[(Long, Timestamp, Long)]
    val buysMem = MemoryStream[(Long, Timestamp, Long)]
    val clicks = clicksMem.toDF().toDF("user_id", "c_ts", "click_id")
      .withWatermark("c_ts", "0 seconds")
      .select(col("user_id"), window(col("c_ts"), "1 hour").as("w"), col("click_id"))
    val buys = buysMem.toDF().toDF("p_user_id", "p_ts", "purchase_id")
      .withWatermark("p_ts", "0 seconds")
      .select(col("p_user_id"), window(col("p_ts"), "1 hour").as("p_w"), col("purchase_id"))
    val joined = clicks.join(buys,
        col("user_id") === col("p_user_id") && col("w") === col("p_w"), "full_outer")
      .select(coalesce(col("user_id"), col("p_user_id")).as("uid"),
        col("click_id"), col("purchase_id"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("fouter").start()
    try {
      // u1 matches; u2 clicks without purchase; u3 purchases without click
      clicksMem.addData((1L, ts("2024-01-01 10:00:00"), 100L),
        (2L, ts("2024-01-01 10:05:00"), 200L))
      buysMem.addData((1L, ts("2024-01-01 10:10:00"), 900L),
        (3L, ts("2024-01-01 10:15:00"), 910L))
      q.processAllAvailable()
      val early = spark.table("fouter")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(early === Set((1L, Some(100L), Some(900L))),
        s"only the matched pair emits while hour 10 is open: $early")
      // push both watermarks past 11:00 → hour-10 closes on both sides
      clicksMem.addData((9L, ts("2024-01-01 12:00:00"), 901L))
      buysMem.addData((8L, ts("2024-01-01 12:00:00"), 902L))
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fouter").as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got.contains((2L, Some(200L), None)),
      s"unmatched click must null-pad after close: $got")
    assert(got.contains((3L, None, Some(910L))),
      s"unmatched purchase must null-pad after close: $got")
    assert(!got.exists(r => r._1 == 9L || r._1 == 8L),
      "hour-12 rows are still open and must not emit")
  }

  test("hourly window agg over events matches its closed-window contract") {
    val out = StreamOps.hourlyWindowAgg(spark, sf)
    val maxTs = graft.tables.Tables.events(spark, sf)
      .agg(max(unix_micros(date_trunc("hour", col("ts"))))).as[Long].head()
    // every emitted window start strictly precedes the hour of max ts
    assert(out.agg(max(col("win_start"))).as[Long].head() < maxTs)
    assert(out.count() > 0)
  }

  test("q166 interval join matches the batch replica and keeps cross-hour pairs") {
    val ev = graft.tables.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
    val batchPairs = batch.select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    val got = AdvancedStreams.intervalJoin(spark, sf)
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(got == batchPairs, s"streamed ${got.size} vs batch ${batchPairs.size}")
    // the property a window-equality join cannot express: pairs whose
    // click and purchase land in DIFFERENT hour buckets still match
    val crossers = batch
      .filter(date_trunc("hour", col("c_ts")) =!= date_trunc("hour", col("p_ts")))
      .count()
    assert(crossers > 0, "fixture has no hour-crossing pair — property untested")
  }
}
