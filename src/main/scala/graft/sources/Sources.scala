package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source facades covering SURVEY §2.1 S2-S6 (the reference's Kafka /
  * socket / text / collection sources) in Structured-Streaming form.
  */
object Sources {

  /** S2 — Kafka topic as a stream of (value: string). Requires the
    * spark-sql-kafka connector on the classpath (not bundled here;
    * zero-egress build). Mirrors FlinkKafkaConsumer010 +
    * SimpleStringSchema (KafkaWindowWordCount.scala:18-23).
    */
  def kafkaStringStream(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value", "timestamp AS ts")

  /** S3 — Kafka JSON topic with an explicit schema (the reference's
    * Kafka010JsonTableSource + TableSchema, ParquetTableJoin.scala:32-43).
    */
  def kafkaJsonStream(spark: SparkSession, bootstrapServers: String, topic: String,
      schema: StructType): DataFrame =
    kafkaStringStream(spark, bootstrapServers, topic)
      .select(from_json(col("value"), schema).as("data"), col("ts"))
      .select(col("data.*"), col("ts"))

  /** S4 — TCP socket text lines (TimeWindowWordCount.scala:16). */
  def socketTextStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port)
      .option("includeTimestamp", true)
      .load()

  /** S5 — text file lines: batch and streaming forms (WordCount.scala:23). */
  def textFile(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  def textFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** S6 — local collection (WordCount.scala:27 fromCollection). */
  def fromCollection[T: org.apache.spark.sql.Encoder](spark: SparkSession, data: Seq[T]): Dataset[T] =
    spark.createDataset(data)
}
