package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkSuite
import graft.streaming.AdvancedStreams.{SessRow, SessionOut, SessionTimeoutProcessor}

/** Event-time TIMERS in `transformWithState` (the Flink
  * `KeyedProcessFunction.registerEventTimeTimer` analog): a session
  * stays open while events keep arriving inside the gap, the re-armed
  * timer fires only when the WATERMARK passes `last + gap`, and firing
  * emits the completed session exactly once and clears the state.
  */
class TransformWithStateTimerSpec extends SparkSuite {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = StreamOps.withRocksDb(spark)(body)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("session timer fires on watermark passage, emits once, clears state") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp)]
      val out = mem.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), (unix_micros(col("ts")) / 1000L).cast("long").as("ts_ms"))
        .as[SessRow]
        .groupByKey(_.user_id)
        .transformWithState(new SessionTimeoutProcessor(gapMs = 30L * 60000L),
          TimeMode.EventTime(), OutputMode.Append(), Encoders.product[SessionOut])
        .toDF()
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("sess_timer").start()
      try {
        // two in-gap events: session open, nothing may emit
        mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
        q.processAllAvailable()
        assert(spark.table("sess_timer").count() === 0L,
          "an open session must not emit before its timer fires")
        // an in-gap extension (before the 10:40 expiry) re-arms the
        // timer to 11:09 — the session keeps growing
        mem.addData((1L, ts("2024-01-01 10:39:00")))
        q.processAllAvailable()
        assert(spark.table("sess_timer").count() === 0L,
          "an extended session must not emit at the superseded expiry")
        // watermark jumps past 11:09 → the timer fires, u2's fresh
        // session stays open
        mem.addData((2L, ts("2024-01-01 12:00:00")))
        q.processAllAvailable()
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("sess_timer").as[SessionOut].collect().toSeq
      assert(got === Seq(SessionOut(1L,
        Timestamp.valueOf("2024-01-01 10:00:00").getTime,
        Timestamp.valueOf("2024-01-01 10:39:00").getTime, 3L)),
        s"expected exactly the closed 3-event session, got $got")
    }
  }

  test("in-batch gap split closes the earlier session inline, timer closes the tail") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Timestamp)]
      val out = mem.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), (unix_micros(col("ts")) / 1000L).cast("long").as("ts_ms"))
        .as[SessRow]
        .groupByKey(_.user_id)
        .transformWithState(new SessionTimeoutProcessor(gapMs = 30L * 60000L),
          TimeMode.EventTime(), OutputMode.Append(), Encoders.product[SessionOut])
        .toDF()
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName("sess_split").start()
      try {
        // one batch, two sessions 2h apart: the first closes inline
        mem.addData((5L, ts("2024-01-01 08:00:00")), (5L, ts("2024-01-01 08:05:00")),
          (5L, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        val inline = spark.table("sess_split").as[SessionOut].collect().toSeq
        assert(inline === Seq(SessionOut(5L,
          Timestamp.valueOf("2024-01-01 08:00:00").getTime,
          Timestamp.valueOf("2024-01-01 08:05:00").getTime, 2L)),
          s"in-batch split must close the earlier session inline: $inline")
        // watermark passage closes the tail session via the timer
        mem.addData((6L, ts("2024-01-01 13:00:00")))
        q.processAllAvailable()
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("sess_split").as[SessionOut].collect().toSet
      assert(got.contains(SessionOut(5L,
        Timestamp.valueOf("2024-01-01 10:00:00").getTime,
        Timestamp.valueOf("2024-01-01 10:00:00").getTime, 1L)),
        s"the tail session must close on watermark passage: $got")
      assert(got.size === 2, s"exactly two sessions: $got")
    }
  }
}
