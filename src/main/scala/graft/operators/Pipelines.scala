package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Composed multi-operator pipelines — the shapes a real curation /
  * analytics job takes, exercising operator composition end-to-end
  * rather than one operator at a time.
  */
object Pipelines {

  /** Curation v2 — the full near-dup path composed end-to-end:
    * n-gram-Jaccard pairs → connected-components clustering → drop
    * every non-canonical cluster member → quality gate → per-language
    * counts over the surviving corpus. This is the drop-list shape a
    * 100 TB pretraining-data job runs: similarity candidates stay
    * sparse equi-joins, clustering is O(diameter) label-propagation
    * rounds, and everything downstream is row-local + one grouped
    * shuffle.
    */
  def curationV2Query(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8))
    val dropIds = clusters.filter(col("id") =!= col("keep_id"))
      .select(col("id").as("doc_id"))
    val kept = docs.join(dropIds, Seq("doc_id"), "left_anti")
    val scored = TextAnalysis.qualityScore(kept, "doc_id", "text")
      .filter(col("quality") >= 0.2)
    kept.join(scored, Seq("doc_id"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))
  }

  /** Composed from the SAME shared fragments the standalone oracles
    * use: [[Dedup.closureCtes]] (q65) and
    * [[TextAnalysis.qualityExprSql]] (q23/q40) — one definition each.
    */
  val curationV2Sql: String =
    s"""${Dedup.closureCtes(Dedup.ngramJaccardSql)},
       |dropped AS (SELECT id AS doc_id FROM comp WHERE id <> keep_id),
       |kept AS (SELECT d.* FROM documents d ANTI JOIN dropped USING (doc_id)),
       |scored AS (
       |  SELECT doc_id,
       |    ${TextAnalysis.qualityExprSql} AS quality
       |  FROM kept)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(length(text)) AS BIGINT) AS total_chars
       |FROM kept SEMI JOIN (SELECT doc_id FROM scored WHERE quality >= 0.2) s USING (doc_id)
       |GROUP BY lang""".stripMargin

  /** Corpus curation: exact-dedup representatives → quality scoring →
    * threshold filter → token statistics on the survivors. Each stage
    * is row-local or one hash shuffle; composition introduces no
    * extra shuffles beyond the dedup groupBy.
    */
  def curationQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val kept = docs.join(keep, Seq("doc_id"), "left_semi")
    val scored = TextAnalysis.qualityScore(kept, "doc_id", "text")
      .filter(col("quality") >= 0.2)
    TextAnalysis.tokenStats(kept, "doc_id", "text")
      .join(scored, Seq("doc_id"))
      .select(col("doc_id"), col("quality"), col("token_cnt"), col("uniq_tokens"))
  }

  val curationSql: String =
    s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
       |kept AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
       |scored AS (
       |  SELECT doc_id,
       |    ${TextAnalysis.qualityExprSql} AS quality
       |  FROM kept)
       |SELECT doc_id, quality,
       |  CAST(len(string_split(text, ' ')) AS INTEGER) AS token_cnt,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS uniq_tokens
       |FROM kept JOIN scored USING (doc_id)
       |WHERE quality >= 0.2""".stripMargin

  /** Correlated-aggregate pattern: customers above their own nation's
    * average balance. Planned as a grouped aggregate + equi-join —
    * the decorrelated form Catalyst produces for the equivalent
    * correlated subquery.
    */
  def aboveNationAvgQuery(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val nav = c.groupBy(col("c_nationkey"))
      .agg((sum(col("c_acctbal").cast(DecimalType(18, 4))).cast("double") / count(lit(1)))
        .as("nat_avg"))
    c.join(nav, Seq("c_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .filter(col("c_acctbal") > col("nat_avg"))
      .select(col("c_custkey"), col("c_acctbal"), col("n_name"), col("nat_avg"))
  }

  val aboveNationAvgSql: String =
    """WITH nav AS (
      |  SELECT c_nationkey,
      |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS nat_avg
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_custkey, c_acctbal, n_name, nat_avg
      |FROM customer
      |JOIN nav USING (c_nationkey)
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > nat_avg""".stripMargin
}
