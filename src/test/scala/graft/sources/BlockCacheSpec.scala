package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.bucketed.{BlockCache, BucketStore, FileStore}

/** The byte-budgeted block cache ([[graft.sources.bucketed.BlockCache]],
  * round 16): in-heap row arrays are a CACHE over the parquet file
  * set, bounded by a global byte budget — a scan of a table larger
  * than the budget completes in bounded heap (least-recently-touched
  * blocks evict and reload lazily) with answers identical to the
  * unbounded run. C10's contract made literal: serving never requires
  * the whole table in memory.
  */
class BlockCacheSpec extends SparkSuite {
  import spark.implicits._

  private def scan(t: String) =
    spark.read.format("graft-buckets").option("table", t).load()

  // the ROW reader: loads blocks into heap (the cache's client). The
  // columnar/aggregate COLD paths deliberately bypass the heap cache
  // (they stream the file), so this spec pins the cache through the
  // path that actually uses it.
  private def rowScan(t: String) =
    spark.read.format("graft-buckets").option("table", t)
      .option("columnar", "false").load()

  test("scanning a larger-than-budget table: bounded heap, identical answers, LRU evictions") {
    val name = "bc_bound"
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (1 to 8000).map(i => (i.toLong, s"tag-$i-${"x" * 40}", i * 1.5)).toDF("k", "tag", "v"),
      "k", 8)
    // plain row collects: aggregates would push down and take the
    // stats-served / cold-projected paths, which never touch the cache
    val want = rowScan(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(want.size === 8000)

    val dir = BucketStore.tableDir(name)
    val blockSizes = FileStore.readManifests(dir).last.buckets
      .filter(_.path.nonEmpty).map(b => Files.size(Paths.get(b.path))).sorted
    assert(blockSizes.length === 8)
    val defaultBudget = BlockCache.budgetBytes
    try {
      // room for ~3 of 8 blocks — the table cannot fit
      val budget = blockSizes.take(3).sum
      BlockCache.budgetBytes = budget
      BucketStore.evictTable(name)
      assert(BucketStore.get(name).buckets.loadedCount === 0)

      val ev0 = BlockCache.evictions.get()
      val got = rowScan(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === want, "a budget-bounded scan must return the identical answer")
      assert(BlockCache.evictions.get() > ev0,
        "scanning past the budget must force evictions")
      assert(BucketStore.get(name).buckets.loadedCount < 8,
        "the whole table must never be resident under a 3-block budget")
      assert(BlockCache.loadedBytes <= budget + blockSizes.max,
        "steady-state residency must stay within budget + one in-flight block")

      // point lookups stay exact under the tiny budget (evict/reload loop)
      (1 to 5).foreach { i =>
        val k = i * 1000L
        assert(rowScan(name).filter(col("k") === k).head().getString(1)
          .startsWith(s"tag-$k-"))
      }
    } finally BlockCache.budgetBytes = defaultBudget
    BucketStore.drop(name)
  }

  test("under the default budget nothing evicts at test scale (bench fold stays flat)") {
    val name = "bc_default"
    BucketStore.drop(name)
    BucketStore.load(spark, name,
      (1 to 2000).map(i => (i.toLong, s"t-$i", i * 1.0)).toDF("k", "tag", "v"), "k", 4)
    val ev0 = BlockCache.evictions.get()
    assert(scan(name).agg(sum("v")).head().getDouble(0) === (1 to 2000).map(_.toDouble).sum)
    assert(BlockCache.evictions.get() === ev0,
      "a quarter-heap budget must never evict at spec scale")
    BucketStore.drop(name)
  }
}
