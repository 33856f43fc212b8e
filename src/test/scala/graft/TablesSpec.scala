package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The events generator has shipped `ts` in two parquet physical
  * shapes across driver rounds — TIMESTAMP(NANOS) (Spark reads it
  * only as nanos-long under `legacy.parquet.nanosAsLong`) and
  * TIMESTAMP(MICROS) with isAdjustedToUTC unset (Spark reads
  * TIMESTAMP_NTZ). Round 10's testdata silently flipped from the
  * first to the second and every window/watermark query broke —
  * the streaming reader's declared nanos-long schema read raw micros
  * and `div 1000` shifted all of 2024 to ~1970. These fixtures pin
  * BOTH shapes through both readers so a future flip (either
  * direction) fails here, loudly, instead of in 18 gated queries.
  */
class TablesSpec extends SparkSuite {

  private def fixture(shape: String): String = {
    val url = getClass.getResource(s"/events_$shape/events.parquet")
    assert(url != null, s"missing test fixture events_$shape")
    new java.io.File(url.toURI).getParent
  }

  private val expectedHours = (0 until 6).map(h => f"2024-01-01 $h%02d:00:00")

  test("Tables.events normalizes TIMESTAMP(NANOS) parquet to session-zoned micros") {
    val df = graft.tables.Tables.events(spark, fixture("nanos"))
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got === expectedHours)
  }

  test("Tables.events normalizes TIMESTAMP(MICROS)/NTZ parquet identically") {
    val df = graft.tables.Tables.events(spark, fixture("micros"))
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got === expectedHours)
  }

  test("eventsStream probes the footer and normalizes both shapes to the same instants") {
    for (shape <- Seq("nanos", "micros")) {
      val stream = graft.streaming.StreamOps.eventsStream(spark, fixture(shape))
      assert(stream.schema("ts").dataType === TimestampType, s"shape=$shape")
      val got = graft.streaming.StreamOps.runToMemory(
          stream.select(col("event_id"), col("ts")), "append")
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(got === expectedHours, s"shape=$shape")
    }
  }

  test("the two fixture shapes agree row-for-row after normalization") {
    val a = graft.tables.Tables.events(spark, fixture("nanos"))
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .collect().map(_.toSeq).toSet
    val b = graft.tables.Tables.events(spark, fixture("micros"))
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === 6)
  }
}
