package graft.sources.bucketed

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** In-JVM model of an external bucket-partitioned row store — the
  * stand-in for the reference's SnappyData server cluster
  * (SnappydataJdbcUtil.scala:21-33 discovers bucket→server topology;
  * SnappyDataConnectorHelper.scala:142-197 builds one split per
  * bucket with per-bucket server URLs).
  *
  * The store holds, per table: the schema, `numBuckets` row buckets
  * (hash of the partitioning key, like the server's hash-partitioned
  * region), a synthetic bucket→host mapping, and a monotonically
  * increasing version (the analog of the reference's
  * relation-destroy-version snapshot check,
  * SnappydataJdbcUtil.scala:92). In production the store is a remote
  * system and [[BucketedPartitionReader]] would open a pooled
  * connection to the owning host; the DSv2 plumbing — topology
  * discovery at planning, per-bucket InputPartitions, locality hints,
  * filter/column pushdown — is identical and is the part that must
  * scale.
  */
object BucketStore {

  final case class BucketTable(
      schema: StructType,
      keyCol: String,
      buckets: Array[Array[Row]],
      hosts: Array[Seq[String]],
      version: Long)

  private val tables = new ConcurrentHashMap[String, BucketTable]()
  private val versions = new java.util.concurrent.atomic.AtomicLong()

  /** Synthetic cluster: `nHosts` servers, buckets assigned round-robin
    * with one replica (mirrors the primary/secondary lists parsed in
    * SnappyDataConnectorHelper.scala:156-197).
    */
  def hostsFor(bucket: Int, nHosts: Int): Seq[String] =
    Seq(s"host-${bucket % nHosts}", s"host-${(bucket + 1) % nHosts}")

  /** Load a DataFrame into the store as `name`, hash-partitioned on
    * `keyCol` into `numBuckets` buckets. Idempotent per (name, version
    * of the data): repeated loads replace the table under a new
    * version.
    */
  def load(spark: SparkSession, name: String, df: DataFrame, keyCol: String,
      numBuckets: Int, nHosts: Int = 4): Unit = {
    val bucketed = df.withColumn("__b", pmod(hash(col(keyCol)), lit(numBuckets)))
    val collected = bucketed.collect()
    val schema = StructType(df.schema.fields)
    val byBucket = Array.fill(numBuckets)(Vector.newBuilder[Row])
    val bIdx = collected.headOption.map(_.fieldIndex("__b")).getOrElse(schema.length)
    collected.foreach { r =>
      val b = r.getInt(bIdx)
      byBucket(b) += Row.fromSeq(r.toSeq.dropRight(1))
    }
    val table = BucketTable(
      schema, keyCol,
      byBucket.map(_.result().toArray),
      Array.tabulate(numBuckets)(hostsFor(_, nHosts)),
      versions.incrementAndGet())
    tables.put(name, table)
  }

  /** Load from parquet if not already present (the common gated-query
    * path: model "the external cluster already holds this table").
    */
  def ensureLoaded(spark: SparkSession, name: String, dir: String, table: String,
      keyCol: String, numBuckets: Int): Unit = {
    val key = s"$name"
    if (!tables.containsKey(key)) synchronized {
      if (!tables.containsKey(key)) {
        // events needs the nanos-aware loader (raw parquet read throws
        // PARQUET_TYPE_ILLEGAL on its TIMESTAMP(NANOS) column)
        val df =
          if (table == "events") graft.tables.Tables.events(spark, dir)
          else graft.tables.Tables.load(spark, dir, table)
        load(spark, key, df, keyCol, numBuckets)
      }
    }
  }

  def exists(name: String): Boolean = tables.containsKey(name)

  /** Catalog CREATE TABLE: install an empty table (schema + layout, no
    * rows) under a fresh version. Fails loudly if the name is taken.
    */
  def createEmpty(name: String, schema: StructType, keyCol: String, numBuckets: Int,
      nHosts: Int = 4): Unit = {
    require(schema.fieldNames.contains(keyCol),
      s"bucket key '$keyCol' not in schema [${schema.fieldNames.mkString(", ")}]")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val empty = BucketTable(schema, keyCol,
      Array.fill(numBuckets)(Array.empty[Row]),
      Array.tabulate(numBuckets)(hostsFor(_, nHosts)),
      versions.incrementAndGet())
    val prev = tables.putIfAbsent(name, empty)
    require(prev == null, s"BucketStore table '$name' already exists")
  }

  /** Catalog DROP TABLE. */
  def drop(name: String): Boolean = tables.remove(name) != null

  /** Job-level atomic publish for the DSv2 write path: merge the
    * tasks' per-bucket rows into the table under ONE new version —
    * readers see the old snapshot or the new one, never a torn write
    * (aborted jobs publish nothing; [[BucketedBatchWrite.commit]] is
    * the only caller). `truncate` = replace rows (overwrite); else
    * append to the existing buckets.
    */
  def commitWrite(name: String, byBucket: Array[Array[Row]], truncate: Boolean): Unit =
    synchronized {
      val t = get(name)
      require(byBucket.length == t.buckets.length,
        s"write planned ${byBucket.length} buckets but '$name' has ${t.buckets.length}")
      val rows =
        if (truncate) byBucket
        else t.buckets.zip(byBucket).map { case (old, add) => old ++ add }
      tables.put(name, t.copy(buckets = rows, version = versions.incrementAndGet()))
      ()
    }

  /** Row-level DELETE: drop the rows matching `pred` from every bucket
    * under one new version (same atomic-publish discipline as
    * [[commitWrite]]). Returns the number of rows deleted.
    */
  def deleteWhere(name: String, pred: Row => Boolean): Long = synchronized {
    val t = get(name)
    var deleted = 0L
    val kept = t.buckets.map { rows =>
      val keep = rows.filterNot { r =>
        val d = pred(r)
        if (d) deleted += 1
        d
      }
      keep
    }
    tables.put(name, t.copy(buckets = kept, version = versions.incrementAndGet()))
    deleted
  }

  /** Group (bucket) replacement for COPY_ON_WRITE row-level operations
    * (UPDATE/MERGE/fallback-DELETE): buckets in `groups` are REPLACED
    * by the incoming rows (the rewrite read them in full — survivors +
    * updates land in `byBucket`); buckets outside `groups` keep their
    * rows and only APPEND incoming ones (an UPDATE that rewrites the
    * bucket key, or a MERGE insert, legally moves rows into buckets
    * the scan never touched). One version, atomic, like every publish.
    */
  def replaceGroups(name: String, byBucket: Array[Array[Row]], groups: Set[Int]): Unit =
    synchronized {
      val t = get(name)
      require(byBucket.length == t.buckets.length,
        s"write planned ${byBucket.length} buckets but '$name' has ${t.buckets.length}")
      val rows = t.buckets.zipWithIndex.map { case (old, b) =>
        if (groups.contains(b)) byBucket(b) else old ++ byBucket(b)
      }
      tables.put(name, t.copy(buckets = rows, version = versions.incrementAndGet()))
      ()
    }

  def get(name: String): BucketTable = {
    maybeInjectFailure()
    val t = tables.get(name)
    require(t != null, s"BucketStore has no table '$name' — call BucketStore.load first")
    t
  }

  /** Metadata fetch with ONE bounded retry (C9 — reference:
    * SnappydataJdbcUtil.scala:61-78 retries the topology query once
    * against an alternate locator before failing). Only transient
    * (IOException) failures retry; a missing table is not transient.
    */
  def getWithRetry(name: String, retries: Int = 1): BucketTable =
    try get(name)
    catch {
      case e: java.io.IOException if retries > 0 =>
        System.err.println(s"[graft-buckets] transient metadata failure for '$name' " +
          s"(${e.getMessage}); retrying (${retries} left)")
        getWithRetry(name, retries - 1)
    }

  // — transient-failure injection (spec hook for the C9 retry path) —
  private val injectedFailures = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Make the next `n` metadata fetches throw IOException. */
  def injectTransientFailures(n: Int): Unit = injectedFailures.set(n)

  private def maybeInjectFailure(): Unit =
    if (injectedFailures.getAndUpdate(i => if (i > 0) i - 1 else 0) > 0)
      throw new java.io.IOException("injected transient metadata failure")
}
