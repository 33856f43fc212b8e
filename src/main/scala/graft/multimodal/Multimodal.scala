package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Schema convention:
  *   media: struct<content: binary, meta: struct<format: string,
  *          n_bytes: long>>
  *
  * The decode step is a STUB — the real image/audio codecs are not in
  * this container. `decodeImageStub` derives deterministic fake
  * dimensions/features from the bytes (clearly marked below). What IS
  * real and load-bearing at 100 TB is everything around it: the
  * schema, the `mapPartitions` batch loop (the JVM analog of
  * `mapInPandas` with a bounded batch shape — decode `batchSize`
  * records at a time so codec buffers are reused and memory stays
  * bounded), and the partitioning control (`repartition` before the
  * decode so each task holds `batchSize × record` bytes, not a skewed
  * partition's worth).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType))))))

  case class DecodedMedia(
      id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, features: Array[Float])

  /** Wrap a string column as a media binary column (stand-in for real
    * image/audio payloads in the synthetic corpus).
    */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      struct(
        encode(col(payloadCol), "UTF-8").as("content"),
        struct(lit(format).as("format"),
          octet_length(col(payloadCol)).cast("long").as("n_bytes")).as("meta")).as("media"))

  /** ??? STUB ??? — deterministic fake decode: width/height derived
    * arithmetically from the byte length, features from a rolling
    * byte sum. A real deployment swaps ONLY the body of
    * `decodeBatch`; the partition/batch plumbing stays.
    */
  private def decodeBatch(batch: Seq[(Long, Array[Byte], String)]): Seq[DecodedMedia] =
    batch.map { case (id, bytes, fmt) =>
      val n = bytes.length.toLong
      val width = (n % 640).toInt
      val height = ((n / 7) % 480).toInt
      var acc = 0L
      val feats = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        acc += bytes(i) & 0xff
        feats(i % 8) += (bytes(i) & 0xff).toFloat / 255f
        i += 1
      }
      DecodedMedia(id, n, fmt, width, height, feats)
    }

  /** Batched partition-local decode: iterator → fixed-size batches →
    * codec → flat iterator. `numPartitions` bounds per-task memory.
    */
  def decodeImageStub(media: DataFrame, batchSize: Int = 64,
      numPartitions: Int = 0): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    val repart = if (numPartitions > 0) media.repartition(numPartitions) else media
    repart.select(col("id"), col("media.content"), col("media.meta.format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(decodeBatch)
      }
  }

  /** Frame sampling for (fake) video: one row per sampled frame index. */
  def frameSample(decoded: Dataset[DecodedMedia], everyN: Int): DataFrame =
    decoded.toDF().select(col("id"), col("width"), col("height"),
        explode(expr(s"sequence(0, greatest(cast(width / $everyN as int) - 1, 0))")).as("frame_idx"))

  /** Aspect-preserving resize planning (the metadata half of a resize
    * kernel — the pixel resample itself lives behind the same stub
    * seam as decode): fit (width, height) into a `box`² target,
    * never upscaling. Pure double arithmetic + floor, so the oracle
    * replicates it exactly.
    */
  def resizePlan(decoded: DataFrame, box: Int): DataFrame = {
    val w = greatest(col("width"), lit(1)).cast("double")
    val h = greatest(col("height"), lit(1)).cast("double")
    val scale = least(lit(box.toDouble) / w, lit(box.toDouble) / h, lit(1.0))
    decoded.select(col("id"), col("width"), col("height"),
      floor(w * scale).cast("int").as("out_w"),
      floor(h * scale).cast("int").as("out_h"))
  }

  /** Oracle-gated query: the full plumbing over `documents` text
    * payloads. The stub's width/height arithmetic is replicated in the
    * oracle SQL, so the mapPartitions path itself is hash-checked.
    */
  def multimodalQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = attachBinary(Tables.documents(spark, dir), "doc_id", "text", "txt")
    decodeImageStub(media, batchSize = 64).toDF()
      .select(col("id").as("doc_id"), col("n_bytes"), col("width"), col("height"))
  }

  val multimodalSql: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
      | CAST((octet_length(encode(text)) // 7) % 480 AS INTEGER) AS height
      |FROM documents""".stripMargin

  /** Gated resize-planning query: decode stub → fit into a 224² box. */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = attachBinary(Tables.documents(spark, dir), "doc_id", "text", "txt")
    resizePlan(decodeImageStub(media, batchSize = 64).toDF(), box = 224)
      .withColumnRenamed("id", "doc_id")
  }

  val resizeSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
      |    CAST((octet_length(encode(text)) // 7) % 480 AS INTEGER) AS height
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, width, height,
      |    CAST(greatest(width, 1) AS DOUBLE) AS w, CAST(greatest(height, 1) AS DOUBLE) AS h
      |  FROM d)
      |SELECT doc_id, width, height,
      |  CAST(floor(w * least(224.0 / w, 224.0 / h, 1.0)) AS INTEGER) AS out_w,
      |  CAST(floor(h * least(224.0 / w, 224.0 / h, 1.0)) AS INTEGER) AS out_h
      |FROM s""".stripMargin
}
