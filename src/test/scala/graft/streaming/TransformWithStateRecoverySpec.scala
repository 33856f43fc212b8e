package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.apache.spark.sql.Encoders

import graft.SparkSuite
import graft.streaming.AdvancedStreams.{EvRow, UserAgg, UserAggProcessor, EwRow, EwOut, EwmaProcessor, TypedEv, TypeCount, TypeCountProcessor}

/** Fault tolerance for the `transformWithState` arbitrary-state paths
  * (q60's ValueState aggregate, q183's EWMA ring): kill the query
  * after an epoch, restart from the RocksDB checkpoint, and the first
  * post-restart emission must reflect the PRE-restart state exactly —
  * the recovery story a 100 TB streaming deployment leans on.
  *
  * Sink: `foreachBatch` → parquet tagged with the batch id (memory
  * sinks don't support checkpoint recovery in update mode; foreachBatch
  * is also the production shape for update-mode state emissions).
  */
class TransformWithStateRecoverySpec extends SparkSuite {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = StreamOps.withRocksDb(spark)(body)

  /** Write one source batch as a flat part-file the file stream lists. */
  private def addBatch[T](dir: String, tag: String, rows: Dataset[T]): Unit = {
    val tmp = Files.createTempDirectory(s"graft_tws_$tag")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, java.nio.file.Paths.get(dir, s"$tag.parquet"))
  }

  private def runEpoch(out: DataFrame, ckpt: String, outDir: String): Unit = {
    val q = out.writeStream.outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("q60 shape: ValueState (count, max) survives a kill/restart from RocksDB checkpoint") {
    withRocksDb {
      val dir = Files.createTempDirectory("graft_tws_agg_src").toString
      val ckpt = Files.createTempDirectory("graft_tws_agg_ckpt").toString
      val outDir = Files.createTempDirectory("graft_tws_agg_out").toString

      def out() = spark.readStream.schema("user_id LONG, value DOUBLE")
        .parquet(dir).as[EvRow]
        .groupByKey(_.user_id)
        .transformWithState(new UserAggProcessor, TimeMode.None(), OutputMode.Update(),
          Encoders.product[UserAgg])
        .toDF()

      // epoch 1: user 1 sees (1,2,3), user 2 sees (5)
      addBatch(dir, "b1", Seq(EvRow(1L, 1.0), EvRow(1L, 2.0), EvRow(1L, 3.0),
        EvRow(2L, 5.0)).toDS())
      runEpoch(out(), ckpt, outDir)

      // kill happened (q.stop); restart from the checkpoint and feed one
      // more row per user — the emission must MERGE the recovered state
      addBatch(dir, "b2", Seq(EvRow(1L, 2.5), EvRow(2L, 7.0)).toDS())
      runEpoch(out(), ckpt, outDir)

      val all = spark.read.parquet(outDir)
      val lastBatch = all.agg(max(col("batch_id"))).head().getLong(0)
      val post = all.filter(col("batch_id") === lastBatch)
        .select(col("user_id"), col("n"), col("max_value"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      // n counts pre-restart rows; max remembers the pre-restart 3.0
      assert(post === Seq((1L, 4L, 3.0), (2L, 2L, 7.0)),
        s"recovered state wrong: $post")
    }
  }

  test("q205 shape: MapState per-type counters survive a kill/restart") {
    withRocksDb {
      val dir = Files.createTempDirectory("graft_tws_map_src").toString
      val ckpt = Files.createTempDirectory("graft_tws_map_ckpt").toString
      val outDir = Files.createTempDirectory("graft_tws_map_out").toString

      def out() = spark.readStream
        .schema("user_id LONG, event_type STRING, ts_us LONG, event_id LONG")
        .parquet(dir).as[TypedEv]
        .groupByKey(_.user_id)
        .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Update(),
          Encoders.product[TypeCount])
        .toDF()

      addBatch(dir, "b1", Seq(TypedEv(1L, "click", 1L, 1L), TypedEv(1L, "click", 2L, 2L),
        TypedEv(1L, "view", 3L, 3L)).toDS())
      runEpoch(out(), ckpt, outDir)

      // restart: one more click — the recovered map entry must continue
      addBatch(dir, "b2", Seq(TypedEv(1L, "click", 4L, 4L)).toDS())
      runEpoch(out(), ckpt, outDir)

      val all = spark.read.parquet(outDir)
      val lastBatch = all.agg(max(col("batch_id"))).head().getLong(0)
      val post = all.filter(col("batch_id") === lastBatch)
        .select(col("user_id"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      // only the touched entry re-emits, with the pre-restart count merged
      assert(post === Set((1L, "click", 3L)), s"recovered map state wrong: $post")
    }
  }

  test("q183 shape: EWMA ring state survives a kill/restart; score continues exactly") {
    withRocksDb {
      val dir = Files.createTempDirectory("graft_tws_ew_src").toString
      val ckpt = Files.createTempDirectory("graft_tws_ew_ckpt").toString
      val outDir = Files.createTempDirectory("graft_tws_ew_out").toString

      def out() = spark.readStream
        .schema("user_id LONG, ts_us LONG, event_id LONG, v_units LONG")
        .parquet(dir).as[EwRow]
        .groupByKey(_.user_id)
        .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Update(),
          Encoders.product[EwOut])
        .toDF()

      // epoch 1: two events → score = 8>>0 + 4>>1 = 10
      addBatch(dir, "b1", Seq(EwRow(1L, 1000L, 1L, 4L), EwRow(1L, 2000L, 2L, 8L)).toDS())
      runEpoch(out(), ckpt, outDir)
      val firstBatch = spark.read.parquet(outDir)
      val e1 = firstBatch.select(col("user_id"), col("n_events"), col("ewma_units"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(e1 === Seq((1L, 2L, 10L)), s"pre-restart score wrong: $e1")

      // restart; one newer event → ring (recovered) reorders under it:
      // score = 16>>0 + 8>>1 + 4>>2 = 21, n = 3
      addBatch(dir, "b2", Seq(EwRow(1L, 3000L, 3L, 16L)).toDS())
      runEpoch(out(), ckpt, outDir)
      val all = spark.read.parquet(outDir)
      val lastBatch = all.agg(max(col("batch_id"))).head().getLong(0)
      val post = all.filter(col("batch_id") === lastBatch)
        .select(col("user_id"), col("n_events"), col("ewma_units"))
        .as[(Long, Long, Long)].collect().toSeq
      assert(post === Seq((1L, 3L, 21L)), s"recovered score wrong: $post")
    }
  }

  test("state TTL: an expired ValueState restarts the count; a live one survives even a restart") {
    withRocksDb {
      import graft.streaming.AdvancedStreams.TtlCountProcessor
      // ProcessingTime mode schedules sweep batches CONTINUOUSLY under
      // the default trigger (and AvailableNow never reaches its
      // termination condition), so neither processAllAvailable nor
      // awaitTermination settles — each epoch is a hard ONE-batch run:
      // Trigger.Once processes exactly the available data and stops
      def runOnce(out: DataFrame, ckpt: String, outDir: String): Unit = {
        val q = out.writeStream.outputMode(OutputMode.Update)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.Once())
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id)).write.mode("append").parquet(outDir)
          }
          .start()
        try q.awaitTermination() finally q.stop()
      }
      def run(ttlMillis: Long, name: String, sleepMillis: Long): Seq[(Long, Long)] = {
        val dir = Files.createTempDirectory(s"graft_ttl_${name}_src").toString
        val ckpt = Files.createTempDirectory(s"graft_ttl_${name}_ckpt").toString
        val outDir = Files.createTempDirectory(s"graft_ttl_${name}_out").toString
        def out() = spark.readStream
          .schema("user_id LONG, event_type STRING, ts_us LONG, event_id LONG")
          .parquet(dir).as[TypedEv]
          .groupByKey(_.user_id)
          .transformWithState(new TtlCountProcessor(ttlMillis), TimeMode.ProcessingTime(),
            OutputMode.Update(), Encoders.product[AdvancedStreams.TypeCount])
          .toDF()
        addBatch(dir, "b1", Seq(TypedEv(1L, "click", 1L, 1L), TypedEv(1L, "click", 2L, 2L)).toDS())
        runOnce(out(), ckpt, outDir)
        Thread.sleep(sleepMillis)
        // restart from the checkpoint AFTER the sleep — TTL must hold
        // across recovery (expiration timestamps live in the state
        // store, not in JVM memory)
        addBatch(dir, "b2", Seq(TypedEv(1L, "click", 3L, 3L)).toDS())
        runOnce(out(), ckpt, outDir)
        val all = spark.read.parquet(outDir)
        val lastBatch = all.agg(max(col("batch_id"))).head().getLong(0)
        all.filter(col("batch_id") === lastBatch)
          .select(col("user_id"), col("n")).as[(Long, Long)].collect().toSeq
      }
      // 400 ms lease, 1.5 s cold: the key's state must have evicted —
      // the post-sleep batch counts from zero
      assert(run(400L, "short", 1500L) === Seq((1L, 1L)),
        "expired state must not leak into the new count")
      // 1 h lease, same sleep: the count accumulates across the restart
      assert(run(3600000L, "long", 1500L) === Seq((1L, 3L)),
        "live TTL state must survive sleep AND restart")
    }
  }
}
