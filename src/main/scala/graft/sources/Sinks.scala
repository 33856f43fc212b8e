package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink facades covering SURVEY §2.2 K1-K4. */
object Sinks {

  /** K1 — text sink, overwrite mode (writeAsText + WriteMode.OVERWRITE,
    * KafkaWindowWordCount.scala:31). Batch form.
    */
  def writeTextOverwrite(ds: Dataset[String], path: String): Unit =
    ds.write.mode("overwrite").text(path)

  /** K1 streaming — per-trigger overwrite needs foreachBatch (Spark's
    * file sink is append-only).
    */
  def streamTextOverwrite(df: DataFrame, path: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.selectExpr("CAST(value AS STRING) AS value")
        .write.mode("overwrite").text(path)
    }

  /** K2 — CSV with a space field delimiter (WordCount.scala:36). */
  def writeCsv(df: DataFrame, path: String, fieldDelim: String = " "): Unit =
    df.write.mode("overwrite").option("sep", fieldDelim).csv(path)

  /** K3 — console sink: batch `show`, streaming console format. */
  def console(df: DataFrame): StreamingQuery =
    df.writeStream.format("console").trigger(Trigger.AvailableNow()).start()

  /** K4 — Kafka producer with record timestamps (the `timestamp`
    * column maps to the Kafka record timestamp, mirroring
    * setWriteTimestampToKafka(true), TimeWindowWordCount.scala:20-22).
    * Requires the spark-sql-kafka connector jar.
    */
  def kafkaSink(df: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
