package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bloom runtime filter (q173): the no-false-negative contract, the
  * false-positive budget, and the plan shape that makes it a runtime
  * filter at all (membership evaluated as a Filter over the scan,
  * BEFORE the join exchange).
  */
class BloomFilterSpec extends SparkSuite {
  import spark.implicits._

  test("no false negatives: every built key passes membership") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val bits = BloomFilter.build(keys.toDF("k"), "k")
    assert(keys.forall(BloomFilter.contains(bits, _, 4)))
  }

  test("build tolerates null keys: dropped as non-members, no NPE") {
    val keys = Seq[java.lang.Long](1L, 2L, null, 3L).toDF("k")
    val bits = BloomFilter.build(keys, "k", mBits = 1024)
    Seq(1L, 2L, 3L).foreach(k =>
      assert(BloomFilter.contains(bits, k, 4), s"built key $k missing"))
  }

  test("false-positive rate stays near the analytic bound") {
    val keys = (0L until 2000L).toDF("k")
    val bits = BloomFilter.build(keys, "k", mBits = 1 << 17)
    // load: ≤ 8000 of 131072 bits → per-probe hit ≤ 6.1%, 4 probes →
    // p(fp) ≤ 1.4e-5; 100k non-members should see ~1, allow 20
    val fps = (1000000L until 1100000L).count(BloomFilter.contains(bits, _, 4))
    assert(fps <= 20, s"$fps false positives in 100k probes")
  }

  test("expression and JVM membership agree (codegen path)") {
    val keys = (0L until 100L).map(i => i * 31L)
    val bits = BloomFilter.build(keys.toDF("k"), "k", mBits = 1 << 12)
    val probed = (0L until 3200L).toDF("k")
      .withColumn("hit", BloomFilter.mightContain(col("k"), bits))
      .as[(Long, Boolean)].collect()
    probed.foreach { case (k, hit) =>
      assert(hit == BloomFilter.contains(bits, k, 4), s"key $k diverged")
    }
    // and membership is exhaustive over the built keys
    assert(probed.filter(_._2).map(_._1).toSet.intersect(keys.toSet) == keys.toSet)
  }

  test("bloomSemiJoin equals the exact semi-join and prunes before the exchange") {
    // a real parquet scan — an in-memory Seq would be constant-folded
    // by ConvertToLocalRelation and hide the Filter node
    val big = spark.read.parquet(s"$sf/lineitem.parquet")
    val small = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 450000d).select(col("o_orderkey"))
    val got = graft.operators.RuntimeFilter.bloomSemiJoin(big, "l_orderkey", small, "o_orderkey")
    val want = big.join(small.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "leftsemi")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // the membership predicate must sit in the filter stage of the
    // BIG side — visible in the physical plan before the join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"),
      s"bloom filter not in the physical plan:\n$plan")
  }

  test("build materializes at most mBits/64 words") {
    val bits = BloomFilter.build((0L until 100000L).toDF("k"), "k", mBits = 1 << 17)
    assert(bits.length == (1 << 17) / 64) // 2048 longs = 16 KiB
  }
}
