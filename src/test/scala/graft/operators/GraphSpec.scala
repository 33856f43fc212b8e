package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Fixed-point PageRank (q156): exactness and structure properties
  * a floating-point implementation couldn't pin.
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000000000000L

  test("uniform ring: every node ends with the identical rank") {
    // a directed cycle is vertex-transitive — any rank difference is a bug
    val n = 10L
    val ring = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val ranks = Graph.pageRank(ring).as[(Long, Long)].collect().toMap
    assert(ranks.size == n)
    assert(ranks.values.toSet.size == 1, s"ring ranks diverged: $ranks")
  }

  test("star graph: the hub out-ranks every leaf") {
    // leaves 1..8 all point at hub 0; hub points back at leaf 1
    val edges = ((1L to 8L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges).as[(Long, Long)].collect().toMap
    val hub = ranks(0L)
    (2L to 8L).foreach(l => assert(hub > ranks(l), s"hub=$hub <= leaf $l=${ranks(l)}"))
    // leaf 1 receives the hub's entire mass — it must also beat the other leaves
    (2L to 8L).foreach(l => assert(ranks(1L) > ranks(l)))
  }

  test("rank mass is conserved up to integer-division leakage") {
    val n = 10L
    val ring = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val total = Graph.pageRank(ring).agg(sum(col("rank_units"))).as[Long].head()
    // each of 5 iterations can leak < (100 + deg) units per node to
    // integer division; with n=10 that is well under 0.1% of SCALE
    assert(total <= Scale && total > Scale - Scale / 1000,
      s"mass $total outside (${Scale - Scale / 1000}, $Scale]")
  }

  test("determinism: two runs produce byte-identical ranks") {
    val edges = (0L until 50L).map(i => (i % 7, (i * 13) % 11)).toDF("src", "dst")
    val a = Graph.pageRank(edges).as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.pageRank(edges).as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }
}
