package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink facades covering SURVEY §2.2 K1-K4. */
object Sinks {

  /** K1 — text sink, overwrite mode (writeAsText + WriteMode.OVERWRITE,
    * KafkaWindowWordCount.scala:31). Batch form.
    */
  def writeTextOverwrite(ds: Dataset[String], path: String): Unit =
    ds.write.mode("overwrite").text(path)

  /** K1 streaming — per-trigger overwrite needs foreachBatch (Spark's
    * file sink is append-only). Accepts any SINGLE-column stream (cast
    * to string), like the batch form accepts any Dataset[String] —
    * a multi-column stream is rejected loudly instead of failing
    * per-trigger on a hard-coded column name.
    */
  def streamTextOverwrite(df: DataFrame, path: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(df.columns.length == 1,
      s"streamTextOverwrite writes ONE text column, got [${df.columns.mkString(", ")}] — " +
        "project the stream to a single column first")
    val c = df.columns.head
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.select(col(c).cast("string").as("value"))
        .write.mode("overwrite").text(path)
    }
  }

  /** K2 — CSV with a space field delimiter (WordCount.scala:36). */
  def writeCsv(df: DataFrame, path: String, fieldDelim: String = " "): Unit =
    df.write.mode("overwrite").option("sep", fieldDelim).csv(path)

  /** K3 — console sink: streaming console format; a BATCH frame shows
    * directly (calling writeStream on it would throw).
    */
  def console(df: DataFrame): Option[StreamingQuery] =
    if (df.isStreaming)
      Some(df.writeStream.format("console").trigger(Trigger.AvailableNow()).start())
    else { df.show(); None }

  /** K4 — Kafka producer facade (TimeWindowWordCount.scala:20-22).
    * HONESTY NOTE on the reference's setWriteTimestampToKafka(true):
    * Spark's Kafka sink recognizes only key/value/topic/partition/
    * headers columns — there is NO record-timestamp column, so exact
    * parity is impossible from Spark; records carry producer-append
    * time (or broker LogAppendTime). A pipeline that needs the event
    * time downstream ships it in the value payload or a header and
    * re-extracts it — documented here instead of claiming a mapping
    * the connector would silently ignore. Requires the spark-sql-kafka
    * connector jar.
    */
  def kafkaSink(df: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
