package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomFilter
import graft.tables.Tables

/** Explicit Bloom-runtime-filtered semi-join — the pipeline author's
  * version of the runtime row filter (see [[graft.functions.BloomFilter]]
  * for why and where the planner's automatic variant doesn't fire).
  *
  * Shape at 100 TB: `big` is the fact table (its scan + shuffle
  * dominate), `small` the filtered dimension. The Bloom costs one
  * narrow aggregation over `small` plus a 16 KiB collect; evaluating
  * it inside the fact scan's codegen stage drops ~(1 − selectivity)
  * of the fact rows before the join exchange, so the shuffle pays
  * only for (matches + ~4e-6 false positives). The exact semi-join
  * stays — results are identical to the unfiltered plan by
  * construction, only the exchanged volume changes.
  */
object RuntimeFilter {

  /** `big ⋉ small` with a Bloom pre-filter on `big`'s key. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String): DataFrame = {
    val bits = BloomFilter.build(small, smallKey)
    big.filter(BloomFilter.mightContain(col(bigKey), bits))
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "leftsemi")
  }

  /** q173 — lineitems of high-value orders (o_totalprice > 450000,
    * ~10% of orders): Bloom-pruned semi-join, then a returnflag
    * rollup. The oracle is the plain EXISTS semi-join — equality
    * proves the Bloom admits every true match (no false negatives)
    * and that surviving false positives are removed by the exact join.
    */
  def bloomPruneQuery(spark: SparkSession, dir: String): DataFrame = {
    val hi = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 450000d)
      .select(col("o_orderkey"))
    bloomSemiJoin(Tables.lineitem(spark, dir), "l_orderkey", hi, "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).cast("long").as("sum_qty"))
  }

  val bloomPruneSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 450000)
      |GROUP BY l_returnflag""".stripMargin
}
