package graft.sources.bucketed

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Offset into the bucket store's version sequence. The store bumps its
  * table version on every (re)load, so the version IS the replay
  * cursor: offset v = "snapshot v has been delivered".
  */
class BucketStreamOffset(val version: Long) extends Offset {
  override def json(): String = version.toString
}

object BucketStreamOffset {
  def of(o: Offset): Long = o match {
    case b: BucketStreamOffset => b.version
    case other => other.json().toLong
  }
}

/** Micro-batch streaming read of a bucket-store table — the
  * Spark-native analog of the reference's Kafka-source streaming
  * programs (KafkaWindowWordCount.scala:18-23, ParquetTableJoin
  * .scala:32-43) pointed at the bucket catalog instead of a broker.
  *
  * Semantics: a SNAPSHOT FEED. The offset axis is the store's table
  * version; each micro-batch (start, end] replays the full snapshot at
  * version `end` through one [[BucketInputPartition]] per bucket —
  * same locality hints, pooled paged readers, and snapshot-drift check
  * as the batch scan. A table that never reloads yields exactly one
  * batch; every reload yields one refresh batch. Consumers treat the
  * feed as "latest snapshot per version" (downstream dedup/latest-wins
  * if they need set semantics across refreshes).
  *
  * What carries to 100 TB: the streamed side arrives already
  * partitioned by the store's hash layout — one task per bucket, data
  * read host-locally — so a stateless enrichment join (broadcast dim)
  * processes the stream with ZERO shuffle of the streamed rows
  * (q92 + BucketedStreamSpec pin that plan).
  *
  * Feasibility boundary (verified against Spark 4.1 bytecode, round
  * 7): the store's KeyGroupedPartitioning CANNOT reach a streaming
  * join's state store. `DataSourceV2Strategy` constructs
  * `MicroBatchScanExec` with `keyGroupedPartitioning = None`
  * (defaults 6/7 of its constructor), so streaming scans never report
  * connector partitioning to the planner; and every stateful operator
  * requires `StatefulOpClusteredDistribution` — an EXACT Spark-hash
  * `HashPartitioning` pinned into the checkpoint — which
  * connector-reported partitioning is structurally unable to satisfy
  * (state-store layout must survive source re-bucketing). The
  * zero-shuffle streaming story is therefore the stateless-enrichment
  * plan above; stateful joins pay exactly one Exchange into state
  * partitioning, as they must. Documented in COVERAGE.md (q92).
  */
class BucketMicroBatchStream(name: String, required: StructType, filters: Array[Filter],
    fetchSize: Int) extends MicroBatchStream {

  override def initialOffset(): Offset = new BucketStreamOffset(0L)

  override def latestOffset(): Offset = {
    // staleness policy: a stream tailing a table another PROCESS
    // writes advances only if offset discovery absorbs the foreign
    // commits — opt-in via [[BucketStore.setRefreshPolicy]]
    BucketStore.maybeRefresh(name): Unit
    new BucketStreamOffset(BucketStore.getWithRetry(name).version)
  }

  override def deserializeOffset(json: String): Offset = new BucketStreamOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val endV = BucketStreamOffset.of(end)
    if (BucketStreamOffset.of(start) >= endV) Array.empty
    else BucketSplits.plan(name, filters, endV)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BucketedReaderFactory(required, filters, fetchSize)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
