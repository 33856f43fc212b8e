package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Multimodal-column processing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Schema convention:
  *   media: struct<content: binary, meta: struct<format: string,
  *          n_bytes: long>>
  *
  * Two codecs sit behind the batch loop:
  *   - `png`/`jpg`/`jpeg` → a REAL `javax.imageio` decode (JDK-native,
  *     no external dependency): dimensions, an 8-bin luminance
  *     histogram, and the exact pixel-luminance sum. q85 gates this
  *     end-to-end — Spark encodes deterministic PNGs with
  *     `ImageIO.write`, decodes them back with `ImageIO.read`, and the
  *     DuckDB oracle predicts the decoded dimensions AND pixel sums
  *     arithmetically, so a codec that mangled a single pixel would
  *     hash-mismatch.
  *   - `txt` (and anything else) → a deterministic arithmetic
  *     derivation from the raw bytes, the stand-in for codecs the
  *     container lacks (audio/video). Its arithmetic is replicated in
  *     the q28/q61 oracles, so the batching path itself is
  *     hash-checked too.
  *
  * What is load-bearing at 100 TB is everything around the codec: the
  * schema, the `mapPartitions` batch loop (decode `batchSize` records
  * at a time so codec buffers are reused and memory stays bounded),
  * and the partitioning control (`repartition` before the decode so
  * each task holds `batchSize × record` bytes, not a skewed
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
      width: Int, height: Int, features: Array[Float], pix_sum: Long)

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

  /** Deterministic PNG geometry + pixels for id: a `(1 + id mod 64) ×
    * (1 + (id div 7) mod 48)` gray image with pixel value
    * `(7x + 13y + id) mod 256` — every quantity the oracle can predict
    * arithmetically after a real encode/decode round trip.
    */
  def pngWidth(id: Long): Int = (1 + id % 64).toInt
  def pngHeight(id: Long): Int = (1 + (id / 7) % 48).toInt

  /** Encode the deterministic image for `id` as real PNG bytes via
    * `ImageIO.write` (gray written as equal RGB channels — PNG is
    * lossless, so decode recovers every pixel exactly).
    */
  def encodePng(id: Long): Array[Byte] = {
    val w = pngWidth(id)
    val h = pngHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((7L * x + 13L * y + id) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Integer ITU-R BT.601 luminance of one packed RGB pixel:
    * `(299·R + 587·G + 114·B) / 1000`. The weights sum to 1000, so for
    * a gray pixel (R=G=B=v) the division is exact and Y = v — which is
    * what keeps q85's arithmetic pixel-sum oracle valid over gray
    * PNGs. (Round 6 verdict: the old code read `rgb & 0xff`, i.e. the
    * BLUE channel, while the scaladoc called it luminance — correct
    * for gray fixtures, mislabeled for color.)
    */
  private[multimodal] def luminance(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Real image decode: `ImageIO.read`, then one pass over the pixels
    * for the BT.601 luminance sum and an 8-bin luminance histogram.
    * Fails loudly on undecodable payloads — silent nulls at 100 TB
    * hide corrupt shards.
    *
    * Exact-sum contract: only LOSSLESS formats (png) can promise a
    * predictable `pix_sum` (q85 gates it); jpg/jpeg decode through the
    * same path but their sums are codec-dependent — never oracle-gate
    * a lossy format's pixel arithmetic.
    */
  private def decodeImage(id: Long, bytes: Array[Byte], fmt: String): DecodedMedia = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable $fmt payload for id=$id (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val feats = new Array[Float](8)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = luminance(img.getRGB(x, y))
        sum += v
        feats(v >> 5) += 1f
        x += 1
      }
      y += 1
    }
    DecodedMedia(id, bytes.length.toLong, fmt, w, h, feats, sum)
  }

  /** Synthetic codec for payloads with no in-container decoder (txt
    * stand-ins for audio/video): width/height derived arithmetically
    * from the byte length, features from a rolling byte sum. The
    * q28/q61 oracles replicate this arithmetic exactly.
    */
  private def decodeSynthetic(id: Long, bytes: Array[Byte], fmt: String): DecodedMedia = {
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
    DecodedMedia(id, n, fmt, width, height, feats, acc)
  }

  private def decodeBatch(batch: Seq[(Long, Array[Byte], String)]): Seq[DecodedMedia] =
    batch.map { case (id, bytes, fmt) =>
      fmt match {
        case "png" | "jpg" | "jpeg" => decodeImage(id, bytes, fmt)
        case _                      => decodeSynthetic(id, bytes, fmt)
      }
    }

  /** Batched partition-local decode: iterator → fixed-size batches →
    * codec → flat iterator. `numPartitions` bounds per-task memory.
    */
  def decodeMedia(media: DataFrame, batchSize: Int = 64,
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
    * kernel — the pixel resample itself lives behind the same codec
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
    * payloads. The synthetic codec's width/height arithmetic is
    * replicated in the oracle SQL, so the mapPartitions path itself is
    * hash-checked.
    */
  def multimodalQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = attachBinary(Tables.documents(spark, dir), "doc_id", "text", "txt")
    decodeMedia(media, batchSize = 64).toDF()
      .select(col("id").as("doc_id"), col("n_bytes"), col("width"), col("height"))
  }

  val multimodalSql: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
      | CAST((octet_length(encode(text)) // 7) % 480 AS INTEGER) AS height
      |FROM documents""".stripMargin

  /** Gated resize-planning query: synthetic codec → fit into a 224² box. */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = attachBinary(Tables.documents(spark, dir), "doc_id", "text", "txt")
    resizePlan(decodeMedia(media, batchSize = 64).toDF(), box = 224)
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

  /** Gated REAL-decode query: deterministic PNGs encoded with
    * `ImageIO.write` on the executors, pushed through the batched
    * decode path, and verified against an oracle that predicts the
    * decoded width, height, and exact pixel-luminance sum from
    * `doc_id` alone. PNG byte length is encoder-specific and excluded.
    * Capped at doc_id < 200 so the oracle's per-pixel lateral unnest
    * stays cheap at any SF.
    */
  def pngDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id")).as[Long]
      .map { id =>
        val bytes = encodePng(id)
        (id, bytes, "png", bytes.length.toLong)
      }
      .toDF("id", "content", "format", "n_bytes")
      .select(col("id"),
        struct(col("content"),
          struct(col("format"), col("n_bytes")).as("meta")).as("media"))
    decodeMedia(media, batchSize = 32).toDF()
      .select(col("id").as("doc_id"), col("width"), col("height"), col("pix_sum"))
  }

  val pngDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(1 + doc_id % 64 AS INTEGER) AS width,
      |    CAST(1 + (doc_id // 7) % 48 AS INTEGER) AS height
      |  FROM documents WHERE doc_id < 200)
      |SELECT d.doc_id, d.width, d.height,
      |  CAST(sum((7 * x.i + 13 * y.i + d.doc_id) % 256) AS BIGINT) AS pix_sum
      |FROM d, unnest(range(d.width)) x(i), unnest(range(d.height)) y(i)
      |GROUP BY 1, 2, 3""".stripMargin

  // ——— q204: REAL multi-frame video (animated GIF) frame sampling ———

  /** Frames in clip `id` (2..8) — the oracle replays this. */
  def gifFrameCount(id: Long): Int = (2 + id % 7).toInt

  /** Encode clip `id` as a REAL animated GIF via `ImageIO`'s sequence
    * writer: frame f holds gray pixels `(7x + 13y + id + 29f) mod
    * 256` at the q85 geometry. Gray occupies exactly the 256-entry
    * GIF palette, so the round trip is LOSSLESS (verified: zero
    * pixel mismatches) — which is what lets a multi-FRAME container
    * carry an exact arithmetic oracle the way q85 (PNG) and q184
    * (WAV) do.
    */
  def encodeGif(id: Long): Array[Byte] =
    writeGraySequenceGif(pngWidth(id), pngHeight(id), gifFrameCount(id),
      (x, y, f) => ((7L * x + 13L * y + id + 29L * f) % 256).toInt)

  /** The shared real-GIF sequence writer (interlacing OFF: the JDK
    * pair mis-round-trips INTERLACED frames of height 2-4 — rows past
    * the first read back as pixel (0,0), found by the q204 gate scan
    * across all heights; progressive mode is a transport nicety with
    * no place under an exact oracle). Gray fills the 256-entry GIF
    * palette, so any gray pixel function round-trips LOSSLESSLY.
    */
  private def writeGraySequenceGif(w: Int, h: Int, nFrames: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = pixel(x, y, f)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Two-SCENE clip for the shot-boundary gate (q241): 6 frames at
    * the q85 geometry — frames 0-2 are one luminance gradient field
    * (the q204 pattern), frames 3-5 a structurally different one
    * (different x/y gradient directions, not just a brightness
    * offset), so a gradient-based perceptual hash sees a real cut at
    * frame 3 while within-scene neighbors differ only by a constant
    * shift (plus mod-wrap edges).
    */
  val SceneGifFrames: Int = 6
  val SceneGifSplit: Int = 3

  def sceneGifPixel(id: Long, x: Int, y: Int, f: Int): Int =
    // within-scene motion is a SMALL brightness drift (+5/+7 per
    // frame — keeps mod-256 wrap edges rare so the gradient hash
    // stays stable inside a scene); the cut at SceneGifSplit rotates
    // the gradient FIELD itself
    if (f < SceneGifSplit) ((7L * x + 13L * y + id + 5L * f) % 256).toInt
    else ((11L * x + 5L * y + 3L * id + 7L * f) % 256).toInt

  def encodeSceneGif(id: Long): Array[Byte] =
    writeGraySequenceGif(pngWidth(id), pngHeight(id), SceneGifFrames,
      sceneGifPixel(id, _, _, _))

  case class DecodedFrame(id: Long, frame_idx: Int, width: Int, height: Int, pix_sum: Long)

  /** Decode ONLY the requested frames of an animated GIF — a real
    * container parse with frame seeks (`reader.read(i)` positions on
    * frame i; undecoded frames are never rasterized), which is the
    * video cost model that matters: sampling every Nth frame of a
    * 100 TB corpus pays for the sampled frames, not the footage.
    */
  def decodeGifFrames(id: Long, bytes: Array[Byte], frameIdx: Seq[Int]): Seq[DecodedFrame] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    // the stream must close too: with ImageIO's default disk cache,
    // createImageInputStream returns a FileCacheImageInputStream whose
    // temp file is freed only on close() — reader.dispose() alone
    // leaks one temp file per decoded clip in a long-lived executor
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    reader.setInput(iis)
    try {
      val n = reader.getNumImages(true)
      frameIdx.filter(f => f >= 0 && f < n).map { f =>
        val img = reader.read(f)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += luminance(img.getRGB(x, y))
            x += 1
          }
          y += 1
        }
        DecodedFrame(id, f, img.getWidth, img.getHeight, sum)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** q204 — every-2nd-frame sampling over real animated GIFs: encode,
    * then decode ONLY the sampled frames, one row each with an exact
    * pixel-luminance sum. Upgrades q28's metadata-level frame
    * sampling to a genuine multi-frame container round trip.
    */
  def gifFramesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") < 120).select(col("doc_id")).as[Long]
    ids.mapPartitions(_.grouped(16).flatMap(_.flatMap { id =>
        val sampled = 0 until gifFrameCount(id) by 2
        decodeGifFrames(id, encodeGif(id), sampled)
      }))
      .toDF()
      .select(col("id").as("doc_id"), col("frame_idx"), col("width"),
        col("height"), col("pix_sum"))
  }

  val gifFramesSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 64 AS INTEGER) AS w,
      |    CAST(1 + (doc_id // 7) % 48 AS INTEGER) AS h,
      |    CAST(2 + doc_id % 7 AS INTEGER) AS nf
      |  FROM documents WHERE doc_id < 120),
      |frames AS (
      |  SELECT doc_id, w, h, CAST(f.i AS INTEGER) AS frame_idx
      |  FROM d, unnest(range(d.nf)) f(i) WHERE f.i % 2 = 0)
      |SELECT doc_id, frame_idx, w AS width, h AS height,
      |  CAST(sum((7 * x.i + 13 * y.i + doc_id + 29 * frame_idx) % 256) AS BIGINT)
      |    AS pix_sum
      |FROM frames, unnest(range(w)) x(i), unnest(range(h)) y(i)
      |GROUP BY 1, 2, 3, 4""".stripMargin

  // ——— q200: perceptual difference-hash (dHash) image dedup ———

  /** 48-bit difference hash of a decoded image: BT.601 luminance
    * downsampled onto a 9×6 grid (cell of pixel (x,y) is
    * (x·9 div w, y·6 div h) — exact integer mapping, no resampling
    * kernel), then bit (cy·8+cx) set iff cell (cx,cy) is brighter
    * than its right neighbor. The classic near-dup signal for images
    * (robust to scale and brightness offsets); 48 bits rather than
    * the usual 64 so the hash rides a plain signed BIGINT in both
    * engines. Brightness comparison is the CROSS-MULTIPLIED integer
    * test `s_a·n_b > s_b·n_a` (never a float average), so the oracle
    * replays it exactly: max product 255·64·48·3072 < 2^32·2^12 fits
    * a Long. Requires w ≥ 9 and h ≥ 6 (every grid cell non-empty).
    */
  def dhash48(id: Long, bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload for id=$id")
    dhash48Image(id, img)
  }

  /** [[dhash48]] over an already-decoded frame — shared by the image
    * dedup (q200, one image per payload) and the shot-boundary pass
    * (q241, many frames per clip: decode once, hash each frame).
    */
  def dhash48Image(id: Long, img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 9 && h >= 6, s"dhash48 needs w>=9, h>=6; got ${w}x$h for id=$id")
    val s = Array.ofDim[Long](9, 6)
    val n = Array.ofDim[Long](9, 6)
    var y = 0
    while (y < h) {
      val cy = y * 6 / h
      var x = 0
      while (x < w) {
        val cx = x * 9 / w
        s(cx)(cy) += luminance(img.getRGB(x, y))
        n(cx)(cy) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 6) {
      var cx = 0
      while (cx < 8) {
        if (s(cx)(cy) * n(cx + 1)(cy) > s(cx + 1)(cy) * n(cx)(cy))
          hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** q200 — perceptual near-dup CLUSTERING by dHash: encode the
    * deterministic PNGs (q85's corpus), run the REAL decode +
    * downsample per image, and group by the 48-bit hash — images
    * whose luminance gradients agree after downsampling collapse to
    * one cluster regardless of resolution, which is exactly what
    * byte-level (q15) and text-level dedup cannot see. Scale: the
    * hash is one map-side pass per image (decode cost, like q85) and
    * the cluster step is a plain hash groupBy — no pairs, no
    * all-to-all; 100 TB of images dedup at scan cost. The oracle
    * replays pixel→cell→bit arithmetic from the generator formula.
    */
  /** The q200 per-image hash frame — real decode + downsample per
    * image, one map-side pass. Factored so the cross-modal verdict
    * (q246) consumes the SAME candidate generator as q200 itself.
    */
  def dhashFrame(spark: SparkSession, dir: String): DataFrame =
    dhashFrameWhere(spark, dir, lit(true))

  /** [[dhashFrame]] over a SLICE of the image corpus — the incremental
    * extension surface: when the corpus grows, only the NEW images'
    * hashes are decoded and appended to the stored artifact through
    * the store's ordinary write path (the q244 discipline; the grown
    * artifact is spec-pinned bit-identical to a from-scratch rebuild).
    */
  private[graft] def dhashFrameWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") < 500 && pred).select(col("doc_id")).as[Long]
    ids.mapPartitions(_.grouped(32).flatMap(_.flatMap { id =>
        if (pngWidth(id) >= 9 && pngHeight(id) >= 6)
          Some((id, dhash48(id, encodePng(id))))
        else None
      }))
      .toDF("doc_id", "dhash")
  }

  /** Build-if-absent, then read, the per-image dHash ARTIFACT — the
    * decode+downsample pass persisted ONCE through the store's write
    * path (the q231 pair-artifact pattern, the repo's standing lesson:
    * expensive stage → stored artifact, one build + N cheap reads) and
    * served bucket-partitioned to every consumer: q200's clustering
    * and q246's cross-modal verdict, which reads it TWICE for its
    * self-join and previously re-ran the PNG decode per side. Decode
    * is the expensive stage of any multimodal pipeline — at 100 TB it
    * runs once in the ingest tasks and lands in commit metadata+files,
    * never per consumer. This corpus is static; a growing one would
    * extend the artifact exactly like q244 extends the pair artifact
    * (append the new images' hashes through the same write path).
    */
  def dhashArtifact(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.bucketed.BucketStore
    val name = s"dhash_frame@$dir"
    if (!BucketStore.exists(name))
      BucketStore.load(spark, name, dhashFrame(spark, dir), "doc_id", numBuckets = 8)
    spark.read.format("graft-buckets").option("table", name).load()
  }

  def imageDhashQuery(spark: SparkSession, dir: String): DataFrame =
    dhashArtifact(spark, dir).groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_imgs"), min(col("doc_id")).as("rep_id"))

  /** The dHash pixel→cell→bit replay CTEs (`hashes` is the per-image
    * 48-bit hash) — shared by q200's oracle and q246's.
    */
  private[graft] val dhashCtes: String =
    """d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 64 AS INTEGER) AS w,
      |    CAST(1 + (doc_id // 7) % 48 AS INTEGER) AS h
      |  FROM documents
      |  WHERE doc_id < 500 AND 1 + doc_id % 64 >= 9 AND 1 + (doc_id // 7) % 48 >= 6),
      |px AS (
      |  SELECT doc_id, (x.i * 9) // w AS cx, (y.i * 6) // h AS cy,
      |    (7 * x.i + 13 * y.i + doc_id) % 256 AS lum
      |  FROM d, unnest(range(d.w)) x(i), unnest(range(d.h)) y(i)),
      |cells AS (
      |  SELECT doc_id, cx, cy, sum(lum) AS s, count(*) AS n
      |  FROM px GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT a.doc_id, a.cy * 8 + a.cx AS i,
      |    CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS bit
      |  FROM cells a
      |  JOIN cells b ON a.doc_id = b.doc_id AND a.cy = b.cy AND b.cx = a.cx + 1
      |  WHERE a.cx < 8),
      |hashes AS (
      |  SELECT doc_id, CAST(sum(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
      |  FROM bits GROUP BY 1)""".stripMargin

  val imageDhashSql: String =
    "WITH " + dhashCtes + """
      |SELECT dhash, count(*) AS n_imgs, min(doc_id) AS rep_id
      |FROM hashes GROUP BY 1""".stripMargin

  // ——— q246: CROSS-MODAL near-dup agreement (image + caption) ———

  /** q246 — the LAION-class drop decision: a (image, caption) document
    * pair is a true duplicate only when BOTH modalities agree; a
    * text-only match is boilerplate captioning, an image-only match is
    * re-captioned imagery — each gets a different curation action.
    * Candidates come from the TWO EXISTING generators, no new pair
    * machinery: image pairs are q200's dHash hash-groups (equal 48-bit
    * hash ⇒ pair — an equi-join within hash buckets, group-size
    * bounded), text pairs are q16's STORED pair artifact
    * ([[graft.operators.Dedup.pairArtifact]] — built once, read here;
    * the plan contains zero shingle machinery). One full-outer join on
    * the canonical (id_a, id_b) key classifies every candidate pair
    * into (modality_agree | text_only | image_only) over the shared
    * multimodal corpus (doc_id < 500). At 100 TB both generators are
    * scan-cost candidate builders and this verdict is one join of two
    * pair-sized tables — the cheapest stage of the pipeline.
    */
  /** The verdict join itself, over any two canonical (id_a < id_b)
    * pair frames — factored so the spec can plant all three verdict
    * classes (the testdata corpus happens to produce no agreeing
    * pair, so the gate alone exercises only two branches).
    */
  def crossModalVerdicts(txtPairs: DataFrame, imgPairs: DataFrame): DataFrame =
    txtPairs.select(col("id_a"), col("id_b"), lit(true).as("text_dup"))
      .join(imgPairs.select(col("id_a"), col("id_b"), lit(true).as("image_dup")),
        Seq("id_a", "id_b"), "full_outer")
      .select(col("id_a"), col("id_b"),
        coalesce(col("text_dup"), lit(false)).as("text_dup"),
        coalesce(col("image_dup"), lit(false)).as("image_dup"),
        when(col("text_dup") && col("image_dup"), "modality_agree")
          .when(col("text_dup"), "text_only")
          .otherwise("image_only").as("verdict"))

  def crossModalDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    // the STORED hash artifact, not the decode pass: the self-join
    // reads bucketed parquet twice instead of decoding the corpus twice
    val img = dhashArtifact(spark, dir)
    val imgPairs = img.as("a").join(img.as("b"),
        col("a.dhash") === col("b.dhash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val txtPairs = graft.operators.Dedup.pairArtifact(spark, dir)
      .filter(col("id_a") < 500 && col("id_b") < 500)
      .select(col("id_a"), col("id_b"))
    crossModalVerdicts(txtPairs, imgPairs)
  }

  /** Oracle: q16's shingle CTEs (text pairs at the same 0.8 gate,
    * corpus-restricted) + the dHash replay CTEs (image pairs = equal
    * hashes), full-outer joined and classified identically.
    */
  lazy val crossModalDedupSql: String =
    graft.operators.Dedup.overlapCandidatesCtes + ",\n" + dhashCtes + """,
      |txt AS (
      |  SELECT id_a, id_b
      |  FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8
      |    AND id_a < 500 AND id_b < 500),
      |img AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM hashes a JOIN hashes b ON a.dhash = b.dhash AND a.doc_id < b.doc_id)
      |SELECT coalesce(t.id_a, i.id_a) AS id_a, coalesce(t.id_b, i.id_b) AS id_b,
      |  (t.id_a IS NOT NULL) AS text_dup, (i.id_a IS NOT NULL) AS image_dup,
      |  CASE WHEN t.id_a IS NOT NULL AND i.id_a IS NOT NULL THEN 'modality_agree'
      |       WHEN t.id_a IS NOT NULL THEN 'text_only'
      |       ELSE 'image_only' END AS verdict
      |FROM txt t FULL OUTER JOIN img i ON t.id_a = i.id_a AND t.id_b = i.id_b""".stripMargin

  // ——— q241: shot-boundary detection (keyframe extraction) ———

  /** Decode EVERY frame of an animated GIF to its perceptual hash —
    * one container parse, one [[dhash48Image]] per frame.
    */
  def decodeGifHashes(id: Long, bytes: Array[Byte]): Seq[(Int, Long)] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    reader.setInput(iis)
    try {
      val n = reader.getNumImages(true)
      (0 until n).map(f => (f, dhash48Image(id, reader.read(f))))
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** q241 — SHOT-BOUNDARY detection over real multi-frame clips, the
    * keyframe-extraction front-end of a video training pipeline:
    * per clip, every frame's 48-bit dHash ([[dhash48Image]] — the
    * q200 perceptual hash), then the Hamming distance to the PREVIOUS
    * frame (one lag window per clip); a distance ≥ 12/48 flags a cut.
    * Within a scene, consecutive frames differ by a constant
    * brightness shift (plus mod-wrap edges) that the gradient hash
    * mostly ignores; at the planted scene change (frame 3: the
    * gradient FIELD rotates, not just brightness) the hash moves
    * wholesale. Downstream, `is_boundary` rows are the frames a
    * captioner/encoder actually processes — the 100 TB point being
    * that footage reduces to keyframes at decode cost, with no
    * pairwise frame comparison beyond the adjacent lag.
    *
    * Machinery: batched `mapPartitions` decode (the multimodal
    * altitude — per-row JVM codecs), hashes map-side, the lag window
    * partitioned per clip (frames-per-clip rows). The oracle replays
    * pixel→cell→bit→hash→lag arithmetic from the generator formula,
    * including the scene split — the real ImageIO round trip must
    * land on the closed form exactly (q200/q204's discipline).
    */
  def shotBoundariesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .filter(col("doc_id") < 200).select(col("doc_id")).as[Long]
    val frames = ids.mapPartitions(_.grouped(16).flatMap(_.flatMap { id =>
        if (pngWidth(id) >= 9 && pngHeight(id) >= 6)
          decodeGifHashes(id, encodeSceneGif(id)).map { case (f, hsh) => (id, f, hsh) }
        else Nil
      }))
      .toDF("doc_id", "frame_idx", "dhash")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev", lag(col("dhash"), 1).over(w))
      .withColumn("hamming_prev", expr("bit_count(dhash ^ prev)"))
      .withColumn("is_boundary", coalesce(col("hamming_prev") >= lit(12), lit(false)))
      .drop("prev")
  }

  /** Oracle: q200's pixel→cell→bit chain extended per frame with the
    * scene-split CASE, then the same lag/popcount arithmetic.
    */
  val shotBoundariesSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(1 + doc_id % 64 AS INTEGER) AS w,
      |    CAST(1 + (doc_id // 7) % 48 AS INTEGER) AS h
      |  FROM documents
      |  WHERE doc_id < 200 AND 1 + doc_id % 64 >= 9 AND 1 + (doc_id // 7) % 48 >= 6),
      |px AS (
      |  SELECT doc_id, f.i AS f, (x.i * 9) // w AS cx, (y.i * 6) // h AS cy,
      |    CASE WHEN f.i < 3 THEN (7 * x.i + 13 * y.i + doc_id + 5 * f.i) % 256
      |         ELSE (11 * x.i + 5 * y.i + 3 * doc_id + 7 * f.i) % 256 END AS lum
      |  FROM d, unnest(range(d.w)) x(i), unnest(range(d.h)) y(i), unnest(range(6)) f(i)),
      |cells AS (
      |  SELECT doc_id, f, cx, cy, sum(lum) AS s, count(*) AS n
      |  FROM px GROUP BY 1, 2, 3, 4),
      |bits AS (
      |  SELECT a.doc_id, a.f, a.cy * 8 + a.cx AS i,
      |    CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS bit
      |  FROM cells a
      |  JOIN cells b ON a.doc_id = b.doc_id AND a.f = b.f AND a.cy = b.cy AND b.cx = a.cx + 1
      |  WHERE a.cx < 8),
      |hashes AS (
      |  SELECT doc_id, f, CAST(sum(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS dhash
      |  FROM bits GROUP BY 1, 2),
      |lagged AS (
      |  SELECT doc_id, f AS frame_idx, dhash,
      |    lag(dhash) OVER (PARTITION BY doc_id ORDER BY f) AS prev
      |  FROM hashes)
      |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, dhash,
      |  CAST(bit_count(xor(dhash, prev)) AS INTEGER) AS hamming_prev,
      |  COALESCE(bit_count(xor(dhash, prev)) >= 12, FALSE) AS is_boundary
      |FROM lagged""".stripMargin

  // ——— real WAV (RIFF/PCM16) audio round trip (q184) ———

  case class DecodedAudio(
      id: Long, n_bytes: Long, sample_rate: Int, n_samples: Long,
      duration_us: Long, amp_sum: Long, energy: Long)

  val WavRate = 8000

  def wavSampleCount(id: Long): Int = (100 + id % 400).toInt

  /** Deterministic PCM sample i of clip `id`: a sawtooth in
    * [−1000, 1000] — pure integer arithmetic the oracle replays.
    */
  def wavSample(id: Long, i: Int): Int = (((id * 31 + i.toLong * 37) % 2001) - 1000).toInt

  /** Encode clip `id` as REAL WAV bytes: RIFF header, canonical
    * 16-byte PCM `fmt ` chunk (mono, 16-bit, 8 kHz), little-endian
    * samples. Byte-level, no codec library — the decode side has to
    * parse actual container structure, which is the point.
    */
  def encodeWav(id: Long): Array[Byte] =
    encodePcm16Wav(wavSampleCount(id), i => wavSample(id, i))

  /** The shared RIFF/PCM16 writer over any integer sample function. */
  private def encodePcm16Wav(n: Int, sample: Int => Int): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                 // PCM
      .putShort(1.toShort)                 // mono
      .putInt(WavRate)
      .putInt(WavRate * 2)                 // byte rate
      .putShort(2.toShort)                 // block align
      .putShort(16.toShort)                // bits/sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sample(i).toShort); i += 1 }
    buf.array()
  }

  /** Amplitude-MODULATED clip for the VAD gate (q242): 80-sample
    * frame f is VOICED iff (id + f) % 3 ≠ 0 — voiced frames carry the
    * q184 sawtooth (±1000), silence a ±50 dither — so frame energy
    * separates by ~400× and segment structure (islands of 1-2 voiced
    * frames between silences, id-dependent phase) is planted
    * deterministically.
    */
  def vadSampleCount(id: Long): Int = (400 + id % 400).toInt

  def vadSample(id: Long, i: Int): Int = {
    val f = i / 80
    if ((id + f) % 3 != 0) wavSample(id, i)
    else (((id * 13 + i.toLong * 7) % 101) - 50).toInt
  }

  def encodeVadWav(id: Long): Array[Byte] =
    encodePcm16Wav(vadSampleCount(id), i => vadSample(id, i))

  /** Parse WAV bytes back: validate the RIFF/WAVE magic, WALK the
    * chunk list to the `fmt `/`data` chunks (real files carry LIST/
    * fact chunks between them — offset-44 assumptions break), then
    * one pass over the PCM16 samples for Σ|x| and Σx² — integer
    * audio features (amplitude mass, energy) the oracle predicts
    * exactly. Fails loudly on malformed payloads, same contract as
    * [[decodeImage]].
    */
  def decodeWav(id: Long, bytes: Array[Byte]): DecodedAudio = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(ascii4() == "RIFF", s"not RIFF: id=$id")
    buf.getInt // riff size
    require(ascii4() == "WAVE", s"not WAVE: id=$id")
    var rate = -1
    var bits = -1
    var channels = -1
    var nSamples = -1L
    var ampSum = 0L
    var energy = 0L
    while (buf.remaining() >= 8) {
      val tag = ascii4()
      val len = buf.getInt
      // a garbage length (e.g. 0xFFFFFFFF → -1) would otherwise stall
      // the walk (position advances by len + pad = 0) — fail loudly
      require(len >= 0, s"negative chunk length $len: id=$id")
      tag match {
        case "fmt " =>
          val start = buf.position()
          val codec = buf.getShort
          require(codec == 1, s"not PCM (codec=$codec): id=$id")
          channels = buf.getShort.toInt
          rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          // len + pad: RIFF pads odd chunks with an uncounted byte
          buf.position(math.min(buf.limit(), start + len + (len & 1)))
        case "data" =>
          require(rate > 0 && bits == 16 && channels == 1,
            s"data chunk before canonical mono/16-bit fmt: id=$id")
          nSamples = len / 2L
          var i = 0L
          while (i < nSamples) {
            val x = buf.getShort.toLong
            ampSum += math.abs(x)
            energy += x * x
            i += 1
          }
          // An odd 16-bit-PCM data chunk leaves TWO trailing bytes:
          // the torn half-sample byte (counted in len) plus RIFF's
          // uncounted pad byte — both must be consumed or the walk
          // misaligns every later chunk (can't arise from our encoder;
          // a spec-conforming foreign WAV's can).
          if ((len & 1) == 1)
            buf.position(math.min(buf.limit(), buf.position() + 2))
        case _ => buf.position(buf.position() + len + (len & 1)) // skip, pad to even
      }
    }
    require(nSamples >= 0, s"no data chunk: id=$id")
    DecodedAudio(id, bytes.length.toLong, rate, nSamples,
      nSamples * 1000000L / rate, ampSum, energy)
  }

  /** q184 — the audio twin of q85: encode deterministic clips as real
    * WAV bytes, push them through the batched partition-local decode,
    * and report integer audio features the oracle predicts
    * arithmetically. A decoder that misread the header, dropped a
    * sample, or sign-flipped PCM would hash-mismatch.
    */
  def wavDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id")).as[Long]
      .repartition(8)
      .mapPartitions { ids =>
        ids.grouped(32).flatMap(_.map { id => decodeWav(id, encodeWav(id)) })
      }
      .toDF()
      .select(col("id").as("doc_id"), col("sample_rate"), col("n_samples"),
        col("duration_us"), col("amp_sum"), col("energy"))
  }

  val wavDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(100 + doc_id % 400 AS BIGINT) AS n
      |  FROM documents WHERE doc_id < 200),
      |s AS (
      |  SELECT d.doc_id, d.n, ((d.doc_id * 31 + i.i * 37) % 2001) - 1000 AS x
      |  FROM d, unnest(range(d.n)) i(i))
      |SELECT doc_id, 8000 AS sample_rate, max(n) AS n_samples,
      |  max(n) * 1000000 // 8000 AS duration_us,
      |  CAST(sum(abs(x)) AS BIGINT) AS amp_sum,
      |  CAST(sum(x * x) AS BIGINT) AS energy
      |FROM s GROUP BY doc_id""".stripMargin

  // ——— q225: framed audio FEATURE EXTRACTION (the VAD front-end) ———

  case class AudioFrame(id: Long, frame: Int, n: Int, peak: Long, energy: Long, zcr: Long)

  /** Per-frame features over decoded PCM: energy Σx², peak max|x|,
    * and zero crossings (adjacent-sample sign flips, both samples in
    * the frame) — the classic voice-activity / silence-trim front-end
    * that runs BEFORE any model sees audio. One pass over the data
    * chunk; the final partial frame is kept.
    */
  def decodeWavFrames(id: Long, bytes: Array[Byte], frameLen: Int): Seq[AudioFrame] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii4(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(ascii4() == "RIFF" && { buf.getInt; ascii4() == "WAVE" }, s"bad container: id=$id")
    val out = scala.collection.mutable.ListBuffer.empty[AudioFrame]
    var sawData = false
    while (buf.remaining() >= 8) {
      val tag = ascii4(); val len = buf.getInt
      require(len >= 0, s"negative chunk length $len: id=$id")
      tag match {
        case "data" =>
          sawData = true
          val nSamples = len / 2
          var f = 0
          var i = 0
          while (i < nSamples) {
            val end = math.min(i + frameLen, nSamples)
            var peak = 0L; var energy = 0L; var zcr = 0L
            var prev = 0L; var first = true
            while (i < end) {
              val x = buf.getShort.toLong
              if (math.abs(x) > peak) peak = math.abs(x)
              energy += x * x
              if (!first && prev * x < 0) zcr += 1
              prev = x; first = false
              i += 1
            }
            out += AudioFrame(id, f, (end - (f * frameLen)).min(frameLen), peak, energy, zcr)
            f += 1
          }
          // torn half-sample byte (counted) + uncounted RIFF pad
          if ((len & 1) == 1)
            buf.position(math.min(buf.limit(), buf.position() + 2))
        case _ => buf.position(math.min(buf.limit(), buf.position() + len + (len & 1)))
      }
    }
    require(sawData, s"no data chunk: id=$id")
    out.toList
  }

  /** q225 — feature extraction completes the multimodal verb set
    * (decode q184/q85, resize q61, frame-sample q204): real container
    * parse, then per-10ms-frame energy/peak/zero-crossing features —
    * all integer, all predicted arithmetically by the oracle. Scale =
    * q184's: per-clip JVM code inside batched mapPartitions, rows out
    * ∝ clips × frames.
    */
  def wavFeaturesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id")).as[Long]
      .repartition(8)
      .mapPartitions { ids =>
        ids.grouped(32).flatMap(_.flatMap { id =>
          decodeWavFrames(id, encodeWav(id), frameLen = 80) })
      }
      .toDF()
      .select(col("id").as("doc_id"), col("frame"), col("n"),
        col("peak"), col("energy"), col("zcr"))
  }

  /** q242 — VOICED-SEGMENT extraction (VAD islands), the audio verb
    * that completes decode (q184) / frame-features (q225): frames
    * whose energy clears the activity threshold merge into maximal
    * CONSECUTIVE runs — (clip, seg_start, seg_end, n_frames,
    * energy_sum) — the segments an ASR/captioning pipeline actually
    * transcribes, with silence never leaving the executor. Machinery:
    * the q225 frame pass (real RIFF parse per clip, batched
    * mapPartitions), then gaps-and-islands (the q81 pattern) as ONE
    * per-clip window + one grouped aggregate — segmentation at
    * 100 TB costs the decode plus a frames-per-clip-sized shuffle.
    * The oracle replays samples→frame-energies→threshold→islands
    * from the closed-form generator, so the real container round
    * trip must land on it exactly.
    */
  def voicedSegmentsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.documents(spark, dir)
      .filter(col("doc_id") < 200)
      .select(col("doc_id")).as[Long]
      .repartition(8)
      .mapPartitions { ids =>
        ids.grouped(32).flatMap(_.flatMap { id =>
          decodeWavFrames(id, encodeVadWav(id), frameLen = 80) })
      }
      .toDF()
      .select(col("id").as("doc_id"), col("frame"), col("energy"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    frames.filter(col("energy") >= 1000000L)
      .withColumn("grp", col("frame") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame")).as("seg_start"), max(col("frame")).as("seg_end"),
        count(lit(1)).as("n_frames"), sum(col("energy")).as("energy_sum"))
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("n_frames"), col("energy_sum"))
  }

  val voicedSegmentsSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(400 + doc_id % 400 AS BIGINT) AS n
      |  FROM documents WHERE doc_id < 200),
      |s AS (
      |  SELECT d.doc_id, CAST(i.i // 80 AS INTEGER) AS frame,
      |    CASE WHEN (d.doc_id + (i.i // 80)) % 3 <> 0
      |         THEN ((d.doc_id * 31 + i.i * 37) % 2001) - 1000
      |         ELSE ((d.doc_id * 13 + i.i * 7) % 101) - 50 END AS x
      |  FROM d, unnest(range(d.n)) i(i)),
      |fe AS (
      |  SELECT doc_id, frame, CAST(sum(x * x) AS BIGINT) AS energy
      |  FROM s GROUP BY 1, 2),
      |v AS (
      |  SELECT doc_id, frame, energy,
      |    frame - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS INTEGER) AS grp
      |  FROM fe WHERE energy >= 1000000)
      |SELECT doc_id, CAST(min(frame) AS INTEGER) AS seg_start,
      |  CAST(max(frame) AS INTEGER) AS seg_end,
      |  CAST(count(*) AS BIGINT) AS n_frames,
      |  CAST(sum(energy) AS BIGINT) AS energy_sum
      |FROM v GROUP BY doc_id, grp""".stripMargin

  val wavFeaturesSql: String =
    """WITH d AS (
      |  SELECT doc_id, CAST(100 + doc_id % 400 AS BIGINT) AS n
      |  FROM documents WHERE doc_id < 200),
      |s AS (
      |  SELECT d.doc_id, i.i AS i, CAST(i.i // 80 AS INTEGER) AS frame,
      |    ((d.doc_id * 31 + i.i * 37) % 2001) - 1000 AS x
      |  FROM d, unnest(range(d.n)) i(i)),
      |zc AS (
      |  SELECT a.doc_id, a.frame, count(*) AS zcr
      |  FROM s a JOIN s b ON b.doc_id = a.doc_id AND b.i = a.i - 1
      |    AND b.frame = a.frame
      |  WHERE b.x * a.x < 0
      |  GROUP BY 1, 2)
      |SELECT s.doc_id, s.frame, CAST(count(*) AS INTEGER) AS n,
      |  CAST(max(abs(s.x)) AS BIGINT) AS peak,
      |  CAST(sum(s.x * s.x) AS BIGINT) AS energy,
      |  CAST(COALESCE(max(zc.zcr), 0) AS BIGINT) AS zcr
      |FROM s LEFT JOIN zc ON zc.doc_id = s.doc_id AND zc.frame = s.frame
      |GROUP BY 1, 2""".stripMargin
}
