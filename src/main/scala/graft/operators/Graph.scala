package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Iterative graph analytics over edge tables — the join-iteration
  * shape (no vertex-program framework needed: each superstep is one
  * equi-join + one aggregation, which is exactly what Pregel compiles
  * to on a shuffle engine anyway).
  *
  * PageRank here is the scale-bearing companion to the connected-
  * components loop in [[Dedup.connectedComponents]]: CC powers the
  * drop-list machinery, PageRank powers graph-signal QUALITY WEIGHTING
  * (rank a link/citation graph, weight documents by the rank of their
  * source — the classic web-corpus curation signal). Same execution
  * hygiene as CC: per-iteration `localCheckpoint` lineage cuts, a
  * fixed iteration count (power iteration converges geometrically;
  * production runs pick 10-50 and stop), and per-iteration cost =
  * one shuffle of the edge table by src + one by dst — linear in
  * |E| per step, nothing driver-side, no n² anywhere.
  *
  * FIXED-POINT ARITHMETIC: ranks are BIGINT micro-units (SCALE =
  * 1e12), all updates integer div/mod — so the result is a pure
  * function of the graph, bit-identical on any engine and any
  * summation order. (Float PageRank sums partial contributions in
  * nondeterministic order; at 1e-6 tolerance that's fine for ranking
  * but unfalsifiable under a hash gate. Integer units make the gate
  * exact — same trick as the BM25/z-order fixed-pointing.)
  * Rank mass: each node gets base = (15·(SCALE div N)) div 100 plus
  * 85% of received contributions; integer division leaks a few units
  * per node per step (standard for fixed-point PR) — deterministically
  * on both engines.
  */
object Graph {

  private val Scale = 1000000000000L
  private val Iters = 5

  /** Fixed-point PageRank over an edge list (`src`, `dst` long
    * columns). Returns (node, rank_units).
    */
  def pageRank(edgesIn: DataFrame, iters: Int = Iters): DataFrame = {
    // the edge table is reused every superstep — cut its lineage once
    val edges = edgesIn.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val nodes = edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().localCheckpoint(true)
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val nAgg = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var r = nodes.crossJoin(nAgg)
      .select(col("id"), expr(s"$Scale div n_nodes").as("u"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val sums = r.join(edges, col("id") === col("src"))
        .join(outd, Seq("src"))
        .select(col("dst"), expr("u div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = nodes.join(sums, col("id") === col("dst"), "left")
        .crossJoin(nAgg)
        .select(col("id"), expr(
          s"(15 * ($Scale div n_nodes)) div 100 + (85 * coalesce(s, cast(0 as bigint))) div 100")
          .as("u"))
        .localCheckpoint(true)
    }
    r.select(col("id").as("node"), col("u").as("rank_units"))
  }

  /** q156 — PageRank over a supplier-to-supplier graph derived from
    * lineitem: src = l_suppkey, dst = (l_partkey mod |supplier|) + 1.
    * A dataset-derived cyclic directed graph (parts fold back into the
    * supplier id space), dense enough that ranks differentiate. The
    * supplier count enters as a broadcast 1-row aggregate, not a
    * driver collect — the whole pipeline is plan-side.
    */
  def pageRankQuery(spark: SparkSession, dir: String): DataFrame = {
    val scnt = broadcast(Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp")))
    val edges = Tables.lineitem(spark, dir).crossJoin(scnt)
      .select(col("l_suppkey").as("src"), (col("l_partkey") % col("n_supp") + 1).as("dst"))
    pageRank(edges)
  }

  /** DuckDB replica: the same 5 supersteps unrolled as CTEs, same
    * integer arithmetic. DuckDB's BIGINT sum() widens to HUGEINT —
    * harmless for // and *, cast back at the end.
    */
  val pageRankSql: String = {
    def step(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""s$i AS (
         |  SELECT e.dst AS id, sum(r.u // o.deg) AS s
         |  FROM $prev r JOIN edges e ON r.id = e.src JOIN outd o ON o.src = e.src
         |  GROUP BY 1),
         |r$i AS (
         |  SELECT nd.id,
         |    (15 * ($Scale // (SELECT n FROM n))) // 100
         |      + (85 * coalesce(s.s, 0)) // 100 AS u
         |  FROM nodes nd LEFT JOIN s$i s ON nd.id = s.id)""".stripMargin
    }
    s"""WITH scnt AS (SELECT count(*) AS s FROM supplier),
       |edges AS (
       |  SELECT DISTINCT l_suppkey AS src,
       |    (l_partkey % (SELECT s FROM scnt)) + 1 AS dst
       |  FROM lineitem),
       |nodes AS (SELECT DISTINCT id FROM (
       |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) t),
       |outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT id, $Scale // (SELECT n FROM n) AS u FROM nodes),
       |${(1 to Iters).map(step).mkString(",\n")}
       |SELECT id AS node, CAST(u AS BIGINT) AS rank_units FROM r$Iters""".stripMargin
  }
}
