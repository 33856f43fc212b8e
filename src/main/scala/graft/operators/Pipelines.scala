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
      Dedup.pairArtifact(spark, dir).select(col("id_a"), col("id_b")))
    val dropIds = clusters.filter(col("id") =!= col("keep_id"))
      .select(col("id").as("doc_id"))
    // `kept` feeds BOTH the quality branch and the final semi-join —
    // cached so the documents scan + drop-list anti-join run once, and
    // released after the eager materialization (Dedup's pattern)
    val kept = docs.join(dropIds, Seq("doc_id"), "left_anti").cache()
    val scored = TextAnalysis.qualityScore(kept, "doc_id", "text")
      .filter(col("quality") >= 0.2)
    val out = kept.join(scored, Seq("doc_id"), "left_semi")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))
    Dedup.materializeAndRelease(out, kept)
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

  /** Deterministic stratified sampling — the data-mixing step of a
    * pretraining pipeline: each language keeps a configured fraction
    * of its documents, selected by a Lehmer multiplicative hash of the
    * id (a·48271 mod 2³¹−1) so the sample is reproducible on any
    * engine, any partitioning, any rerun — no RNG state, no shuffle,
    * a row-local predicate that scales to any corpus size. Per-group
    * rates are the mixing weights.
    *
    * Overflow contract: each multiply happens on a value already
    * reduced mod 2³¹−1, so products stay ≤ (2³¹−2)·48271 ≈ 1.04·10¹⁴
    * — far inside Long — for EVERY possible id. (A mod-2³² Knuth hash
    * would overflow Long at id ≈ 3.5·10⁹ and, under Spark 4's default
    * ANSI mode, crash rather than wrap.) The step is applied twice:
    * one step leaves small ids (< m/48271) un-wrapped and therefore
    * all below any threshold; the second wrap spreads them across the
    * full modulus.
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(lehmerBucket(idCol) < rate * lit(LehmerM.toDouble))
  }

  /** The ONE Lehmer generator every sampling operator in this file
    * shares — [[stratifiedSample]], [[domainMix]], [[samplePerGroup]],
    * [[domainUpsample]] must agree byte-for-byte so their cross-operator
    * determinism contracts hold (e.g. a stratified prefilter keeps a
    * superset of the per-group sample's winners). Overflow analysis in
    * the [[stratifiedSample]] scaladoc.
    */
  private[operators] val LehmerM = 2147483647L // 2^31 - 1 (prime)
  private[operators] def lehmerBucket(idCol: String): org.apache.spark.sql.Column =
    pmod(pmod(pmod(col(idCol), lit(LehmerM)) * lit(48271L), lit(LehmerM)) * lit(48271L), lit(LehmerM))

  /** Shared ratio pipeline for [[domainMix]] / [[domainUpsample]]:
    * per-domain token totals (one map-side-combined aggregate) →
    * UNCLAMPED target ratio r = budget·w_d / tokens_d. Callers clamp
    * (mix) or epoch-expand (upsample).
    */
  private def domainRatios(toks: DataFrame, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      budgetTokens: Long): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    toks.groupBy(col(groupCol))
      .agg(sum(col("n_tokens")).as("toks"))
      .select(col(groupCol),
        (lit(budgetTokens.toDouble) * w / col("toks").cast("double")).as("r"))
  }

  def stratifiedSampleQuery(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 0.25), defaultRate = 1.0)
      .select(col("doc_id"), col("lang"))

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE (((doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647
      |      < (CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'fr' THEN 0.25 ELSE 1.0 END)
      |        * 2147483647""".stripMargin

  /** Sequence packing — GPT-style concatenate-and-chunk: per source,
    * documents are laid end to end in id order and each is assigned
    * the context-window chunk its first token lands in
    * (`floor(exclusive-cumulative-tokens / windowTokens)`). One window
    * partitioned by source — the shuffle carries (source) groups and
    * the running sum is a single streaming pass per group; at 100 TB
    * the same plan packs each source shard independently.
    */
  def sequencePack(df: DataFrame, idCol: String, groupCol: String, textCol: String,
      windowTokens: Int): DataFrame =
    sequencePackBy(df, idCol, groupCol,
      size(split(col(textCol), " ")).cast("long"), windowTokens)

  /** Packing generalized over the tokenizer: `tokenCount` is any
    * row-local expression giving the document's token count — the
    * whitespace count (q77), the BPE-style pre-token run count (q89),
    * or a real tokenizer's length column. The plan is identical in
    * every case: one window per source group.
    */
  def sequencePackBy(df: DataFrame, idCol: String, groupCol: String,
      tokenCount: org.apache.spark.sql.Column, windowTokens: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol), tokenCount.cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        expr(s"cum_before div $windowTokens").as("pack_id"))
  }

  def sequencePackQuery(spark: SparkSession, dir: String): DataFrame =
    sequencePack(Tables.documents(spark, dir), "doc_id", "source", "text",
      windowTokens = 2048)

  val sequencePackSql: String =
    """SELECT doc_id, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |             OVER (PARTITION BY source ORDER BY doc_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    // 2048 AS BIGINT) AS pack_id
      |FROM documents""".stripMargin

  /** Tokenizer-aware packing: token counts are the BPE-style
    * pre-token runs of [[TextAnalysis.tokenStats]] (alpha runs + digit
    * runs + punct runs — what a byte-pair pre-tokenizer splits on),
    * not whitespace words. Closer to real context-window budgeting:
    * punctuation-dense documents cost more tokens than their
    * whitespace count suggests.
    */
  def sequencePackBpeQuery(spark: SparkSession, dir: String): DataFrame = {
    val bpeCount =
      regexp_count(col("text"), lit("[A-Za-z]+")) +
        regexp_count(col("text"), lit("[0-9]+")) +
        regexp_count(col("text"), lit("[^A-Za-z0-9 ]+"))
    sequencePackBy(Tables.documents(spark, dir), "doc_id", "source",
      bpeCount.cast("long"), windowTokens = 2048)
  }

  val sequencePackBpeSql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
      |       + len(regexp_extract_all(text, '[0-9]+'))
      |       + len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT doc_id, source, n_tokens,
      |  CAST(COALESCE(sum(n_tokens)
      |             OVER (PARTITION BY source ORDER BY doc_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    // 2048 AS BIGINT) AS pack_id
      |FROM t""".stripMargin

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

  /** Token-budget domain mixing (the Pile/DoReMi-style resampling step
    * of a training-data pipeline): given target mixture WEIGHTS per
    * domain and a global token BUDGET, each domain's acceptance ratio
    * is `min(1, budget·w_d / tokens_d)` and documents are kept by the
    * same deterministic multiplicative hash [[stratifiedSample]] uses —
    * reproducible, inclusion-monotone in the budget, no RNG state.
    *
    * Plan shape at 100 TB: ONE map-side-combined aggregate reduces the
    * corpus to |domains| token totals, the ratio table BROADCASTS back
    * (a few hundred rows), and the sample itself is an embarrassingly
    * parallel filter — the corpus is never shuffled at all. Domains
    * above budget clip (r<1), under-budget domains keep everything;
    * both regimes are exercised at every SF.
    */
  def domainMix(df: DataFrame, idCol: String, groupCol: String,
      tokenCount: org.apache.spark.sql.Column, weights: Map[String, Double],
      defaultWeight: Double, budgetTokens: Long): DataFrame = {
    val toks = df.select(col(idCol), col(groupCol), tokenCount.cast("long").as("n_tokens"))
    val ratios = domainRatios(toks, groupCol, weights, defaultWeight, budgetTokens)
    toks.join(broadcast(ratios), groupCol)
      .filter(lehmerBucket(idCol) < least(lit(1.0), col("r")) * lit(LehmerM.toDouble))
  }

  def domainMixQuery(spark: SparkSession, dir: String): DataFrame =
    domainMix(Tables.documents(spark, dir), "doc_id", "source",
      size(split(col("text"), " ")),
      Map("src0" -> 0.30, "src1" -> 0.20, "src2" -> 0.10),
      defaultWeight = 0.02, budgetTokens = 2000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tok_kept"))

  /** Deterministic exact-k sample per group — the "n documents per
    * domain for eval/inspection" draw: within each group, keep the k
    * rows with the smallest Lehmer hash (ties broken by id, so the
    * order is total and the pick reproducible on any engine or
    * partitioning). Growing k only ever ADDS rows — the hash order is
    * fixed — so nested sample sizes give nested samples.
    *
    * Plan shape at 100 TB: the window sorts only a 3-column
    * (id, group, hash ≈ 24 B/row) projection, one shuffle on the group
    * key. When k ≪ group size, compose [[stratifiedSample]] with a
    * rate of ~4k/|group| in front to shrink the sort input first —
    * the hash prefilter keeps a superset of the k winners with
    * overwhelming probability and the same determinism.
    */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    require(k > 0, "samplePerGroup needs k > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", lehmerBucket(idCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__h", "__rk")
  }

  def samplePerGroupQuery(spark: SparkSession, dir: String): DataFrame =
    samplePerGroup(Tables.documents(spark, dir), "doc_id", "lang", k = 20)
      .select(col("doc_id"), col("lang"))

  // ——— q202: weighted (PPS) stratified sampling ———

  /** Deterministic weighted sampling — SEQUENTIAL POISSON SAMPLING
    * (Ohlsson 1998), the standard probability-proportional-to-size
    * draw: rank every row by priority w/u (u uniform from the row's
    * hash) and keep the top k per stratum; heavier rows win
    * proportionally more often, and the draw is a pure function of
    * the id, so it re-materializes identically on any engine or
    * partitioning (the q76/q112 no-`rand()` discipline). Fixed-point:
    * priority = (w << 40) div (h+1) with the shared Lehmer hash —
    * integer division both engines compute identically (w ≤ 8.3e6
    * keeps the product inside Int64). The curation use: "sample k
    * docs per language weighted by length/quality" instead of the
    * uniform k of [[samplePerGroup]]. Plan: one 4-column projection,
    * one window per stratum — same scale shape as q112.
    */
  def weightedSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("priority").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("__h", lehmerBucket("doc_id"))
      .withColumn("priority", expr("(n_chars * 1099511627776L) div (__h + 1L)"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("doc_id"), col("priority"), col("rn"))
  }

  // ——— q207: shard manifests (reproducibility / integrity audit) ———

  /** Shard MANIFESTS — the export-side integrity record every
    * reproducible training run needs: per shard, the row count, byte
    * volume, id range, and an ORDER-FREE content digest
    * (`bit_xor` of each row's Karp-Rabin fingerprint — XOR commutes
    * and never overflows, so the digest is identical under any
    * partitioning, task order, or engine; a re-export that silently
    * drops, duplicates, or mutates one document flips it). Shard
    * assignment rides the same Lehmer hash as the q112 shuffle, so
    * manifests describe the shards training actually reads. One
    * map-side fingerprint pass + one 8-group aggregation — manifest
    * cost is scan cost, and the digests are mergeable partials like
    * any other aggregate.
    */
  def shardManifestQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.Fingerprint64(col("text")).as("fp"))
      .withColumn("shard", pmod(lehmerBucket("doc_id"), lit(8L)).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(fp)").as("content_digest"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))

  val shardManifestSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, n_chars,
       |    ${TextAnalysis.fingerprintSignedSql(TextAnalysis.fingerprintHugeintSql)} AS fp,
       |    CAST((((doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647 % 8
       |         AS INTEGER) AS shard
       |  FROM documents)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  bit_xor(fp) AS content_digest,
       |  min(doc_id) AS min_id, max(doc_id) AS max_id
       |FROM f GROUP BY 1""".stripMargin

  val weightedSampleSql: String =
    """WITH h AS (
      |  SELECT lang, doc_id, n_chars,
      |    (((doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647 AS hh
      |  FROM documents),
      |p AS (
      |  SELECT lang, doc_id,
      |    CAST((n_chars * 1099511627776) // (hh + 1) AS BIGINT) AS priority
      |  FROM h)
      |SELECT lang, doc_id, priority, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT lang, doc_id, priority,
      |    row_number() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn
      |  FROM p) t WHERE rn <= 20""".stripMargin

  /** Deterministic corpus shuffle + shard assignment — the export step
    * between curation and training: every row gets a shard in [0, n)
    * and a dense position within its shard, both pure functions of the
    * id (Lehmer hash order, id tiebreak), so the SAME training order
    * re-materializes on any engine, partitioning, or rerun — no
    * `rand()` anywhere near the data order. Adjacent-id documents
    * (same crawl/source) scatter across shards, which is the point of
    * the pre-training shuffle.
    *
    * Plan shape at 100 TB: the window runs over the 3-column
    * (id, shard, hash) PROJECTION — enforced here, not left to the
    * caller's later pruning — so the payload never funnels through the
    * nShards-partition window sort (8 shards would mean 8 giant
    * partitions); it rejoins the assignment by id on normal
    * parallelism. Shards are balanced whp (multiplicative hash over a
    * prime modulus).
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "shardAssign needs nShards > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    val assignment = df.select(col(idCol))
      .withColumn("__h", lehmerBucket(idCol))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
    df.join(assignment, Seq(idCol))
  }

  def shardAssignQuery(spark: SparkSession, dir: String): DataFrame =
    shardAssign(Tables.documents(spark, dir), "doc_id", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))

  val shardAssignSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    (((doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647 AS hh
      |  FROM documents)
      |SELECT doc_id, hh % 8 AS shard,
      |       row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) - 1 AS pos
      |FROM h""".stripMargin

  val samplePerGroupSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    (((doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647 AS hh
      |  FROM documents),
      |r AS (SELECT doc_id, lang,
      |        row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rk
      |      FROM h)
      |SELECT doc_id, lang FROM r WHERE rk <= 20""".stripMargin

  /** Domain mixing with EPOCHS — the regime [[domainMix]] clips away:
    * when a domain's token budget exceeds its size (r > 1), a real
    * mixture (the Pile runs Wikipedia at ~3 epochs) REPEATS the domain
    * ⌊r⌋ times and takes a deterministic hash-fraction more for the
    * remainder, so every domain lands on budget·w_d tokens in
    * expectation whether it is up- or down-sampled. Each output row
    * carries its epoch index so downstream packing/shuffling can keep
    * copies apart.
    *
    * Plan shape at 100 TB: identical to [[domainMix]] — one
    * map-side-combined aggregate to |domains| rows, broadcast back,
    * then a row-local `explode(sequence(0, copies−1))`; the corpus is
    * never shuffled and the blow-up is exactly the intended epoch
    * count, materialized lazily inside the scan stage.
    */
  def domainUpsample(df: DataFrame, idCol: String, groupCol: String,
      tokenCount: org.apache.spark.sql.Column, weights: Map[String, Double],
      defaultWeight: Double, budgetTokens: Long): DataFrame = {
    val toks = df.select(col(idCol), col(groupCol), tokenCount.cast("long").as("n_tokens"))
    val ratios = domainRatios(toks, groupCol, weights, defaultWeight, budgetTokens)
    toks.join(broadcast(ratios), groupCol)
      .withColumn("__copies",
        floor(col("r")) + when(lehmerBucket(idCol) <
            (col("r") - floor(col("r"))) * lit(LehmerM.toDouble), 1L)
          .otherwise(0L))
      .filter(col("__copies") > 0)
      .select(col(idCol), col(groupCol), col("n_tokens"),
        explode(expr("sequence(0L, __copies - 1)")).as("epoch"))
  }

  def domainUpsampleQuery(spark: SparkSession, dir: String): DataFrame =
    domainUpsample(Tables.documents(spark, dir), "doc_id", "source",
      size(split(col("text"), " ")),
      Map("src0" -> 0.50, "src1" -> 0.02), defaultWeight = 0.06,
      budgetTokens = 120000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_tokens")).as("tok_total"),
        max(col("epoch")).as("max_epoch"))

  val domainUpsampleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), ratios AS (
      |  SELECT source,
      |         120000.0 *
      |           (CASE source WHEN 'src0' THEN 0.50 WHEN 'src1' THEN 0.02 ELSE 0.06 END)
      |           / CAST(sum(n_tokens) AS DOUBLE) AS r
      |  FROM toks GROUP BY source
      |), c AS (
      |  SELECT t.doc_id, t.source, t.n_tokens,
      |         CAST(floor(rr.r) AS BIGINT) +
      |         (CASE WHEN (((t.doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647
      |               < (rr.r - floor(rr.r)) * 2147483647 THEN 1 ELSE 0 END) AS copies
      |  FROM toks t JOIN ratios rr ON t.source = rr.source
      |), e AS (
      |  SELECT doc_id, source, n_tokens, unnest(range(copies)) AS epoch
      |  FROM c WHERE copies > 0
      |)
      |SELECT source, count(*) AS n_rows,
      |       CAST(sum(n_tokens) AS BIGINT) AS tok_total,
      |       CAST(max(epoch) AS BIGINT) AS max_epoch
      |FROM e GROUP BY source""".stripMargin

  val domainMixSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), ratios AS (
      |  SELECT source,
      |         least(1.0, 2000.0 *
      |           (CASE source WHEN 'src0' THEN 0.30 WHEN 'src1' THEN 0.20
      |                        WHEN 'src2' THEN 0.10 ELSE 0.02 END)
      |           / CAST(sum(n_tokens) AS DOUBLE)) AS r
      |  FROM toks GROUP BY source
      |)
      |SELECT t.source, count(*) AS n_kept,
      |       CAST(sum(t.n_tokens) AS BIGINT) AS tok_kept
      |FROM toks t JOIN ratios rr ON t.source = rr.source
      |WHERE (((t.doc_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647
      |      < rr.r * 2147483647
      |GROUP BY t.source""".stripMargin

  /** q150 — LEAKAGE-SAFE train/val/test split: each document is
    * assigned 80/10/10 by the Lehmer hash of its near-dup CLUSTER
    * representative (q65's connected components; singletons represent
    * themselves), never of its own id — so a near-dup cluster lands
    * WHOLLY in one split and a test document can never have a
    * training-set near-duplicate. This is the eval-contamination mode
    * a per-document split invites and dedup papers measure (train/test
    * leakage through near-dups survives per-doc splitting because the
    * copies hash independently); splitting by cluster closes it by
    * construction, at the cost of the CC pass the drop-list pipeline
    * already runs. Same Lehmer generator as every sampler here, so the
    * split composes deterministically with them; fractions hold per
    * CLUSTER whp (multiplicative hash over a prime modulus), hence per
    * doc up to cluster-size skew — exactly the guarantee a
    * leakage-safe split can offer.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    leakageSafeSplitFromPairs(docs, idCol,
      Dedup.ngramJaccardPairs(docs, idCol, textCol, n, threshold))

  /** The pair-consuming core of [[leakageSafeSplit]] — takes the
    * near-dup pair table directly so the gated query reads the
    * MATERIALIZED artifact instead of rebuilding candidates.
    */
  def leakageSafeSplitFromPairs(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
    val labeled = docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("keep_id"), col(idCol)))
    labeled
      .withColumn("__h", pmod(lehmerBucket("cluster_id"), lit(10L)))
      .withColumn("split",
        when(col("__h") < 8, "train").when(col("__h") === 8, "val").otherwise("test"))
      .select(col(idCol), col("cluster_id"), col("split"))
  }

  def leakageSafeSplitQuery(spark: SparkSession, dir: String): DataFrame =
    leakageSafeSplitFromPairs(Tables.documents(spark, dir), "doc_id",
      Dedup.pairArtifact(spark, dir))

  val leakageSafeSplitSql: String =
    Dedup.closureCtes(Dedup.ngramJaccardSql) +
      """,
        |clustered AS (
        |  SELECT d.doc_id, COALESCE(c.keep_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN hh < 8 THEN 'train' WHEN hh = 8 THEN 'val' ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id, cluster_id,
        |    (((cluster_id % 2147483647) * 48271) % 2147483647 * 48271) % 2147483647 % 10 AS hh
        |  FROM clustered) t""".stripMargin

  // ——— q194: column profiling (Deequ-lite data quality report) ———

  /** One-pass column profiler — the ANALYZE/Deequ-style report every
    * ingest job publishes next to its output: per column, row count,
    * null count, exact distinct count, and lo/hi bounds. One
    * aggregation JOB per profiled column over the same scan (Spark
    * collapses them into one stage each; at 100 TB run the column
    * set you care about, not SELECT *), all quantities exact
    * integers/strings — doubles are profiled in 10⁻⁴ fixed-point
    * units so the bounds hash-match across engines instead of
    * fighting float formatting.
    */
  def profileQuery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def statRow(colName: String, lo: org.apache.spark.sql.Column,
        hi: org.apache.spark.sql.Column) =
      o.agg(count(lit(1)).as("n"),
        count(when(col(colName).isNull, 1)).as("n_null"),
        count_distinct(col(colName)).as("n_distinct"),
        lo.cast("string").as("lo"), hi.cast("string").as("hi"))
        .select(lit(colName).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("lo"), col("hi"))
    statRow("o_orderstatus", min(col("o_orderstatus")), max(col("o_orderstatus")))
      .unionByName(statRow("o_orderpriority",
        min(col("o_orderpriority")), max(col("o_orderpriority"))))
      .unionByName(statRow("o_custkey", min(col("o_custkey")), max(col("o_custkey"))))
      .unionByName(statRow("o_totalprice",
        min(expr("CAST(round(o_totalprice * 10000) AS BIGINT)")),
        max(expr("CAST(round(o_totalprice * 10000) AS BIGINT)"))))
  }

  val profileSql: String =
    """SELECT 'o_orderstatus' AS col_name, count(*) AS n,
      |  count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_null,
      |  count(DISTINCT o_orderstatus) AS n_distinct,
      |  CAST(min(o_orderstatus) AS VARCHAR) AS lo,
      |  CAST(max(o_orderstatus) AS VARCHAR) AS hi
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority', count(*),
      |  count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
      |  count(DISTINCT o_orderpriority),
      |  CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
      |FROM orders
      |UNION ALL
      |SELECT 'o_custkey', count(*),
      |  count(CASE WHEN o_custkey IS NULL THEN 1 END),
      |  count(DISTINCT o_custkey),
      |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', count(*),
      |  count(CASE WHEN o_totalprice IS NULL THEN 1 END),
      |  count(DISTINCT o_totalprice),
      |  CAST(min(CAST(round(o_totalprice * 10000) AS BIGINT)) AS VARCHAR),
      |  CAST(max(CAST(round(o_totalprice * 10000) AS BIGINT)) AS VARCHAR)
      |FROM orders""".stripMargin

  // ——— q188: quarantine routing (dead-letter curation) ———

  /** Rule-gated routing with a QUARANTINE side, the dead-letter
    * pattern of every production ingest: instead of dropping rows a
    * quality gate rejects (evidence gone, thresholds untunable), rows
    * route to a quarantine table tagged with the FIRST failing rule.
    * Both routes land in real bucket-store tables through the
    * ordinary DSv2 write (two versioned tables, re-processable later
    * — loosen a rule, re-route quarantine), and the gate reads the
    * report BACK from the store so the round trip is what's hashed.
    * One scan, one CASE, two writes — no second pass over the corpus
    * per rule.
    */
  def quarantineQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.bucketed.BucketStore
    val routed = Tables.documents(spark, dir)
      .withColumn("reason",
        when(col("n_chars") < 100, "too_short")
          .when(!col("lang").isin("en", "de", "fr", "es"), "unsupported_lang")
          .otherwise("ok"))
    val clean = s"docs_clean@$dir"
    val quar = s"docs_quarantine@$dir"
    BucketStore.drop(clean)
    BucketStore.drop(quar)
    BucketStore.load(spark, clean,
      routed.filter(col("reason") === "ok").drop("reason"), "doc_id", numBuckets = 8)
    BucketStore.load(spark, quar,
      routed.filter(col("reason") =!= "ok"), "doc_id", numBuckets = 8)
    val cleanN = spark.read.format("graft-buckets").option("table", clean).load()
      .agg(count(lit(1))).head().getLong(0)
    val quarReport = spark.read.format("graft-buckets").option("table", quar).load()
      .groupBy(col("reason")).agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"))
    // The oracle GROUPs the routed rows, so an empty 'ok' group is
    // OMITTED there — emit the clean-count row only when it's non-empty
    // or the hash gate would diverge on a dataset with zero clean docs.
    val okRows = math.min(cleanN, 1L).toInt
    quarReport.unionByName(spark.range(okRows).select(lit("ok").as("reason"),
      lit(cleanN).as("n"), lit(null).cast("long").as("sum_chars")))
  }

  val quarantineSql: String =
    """WITH routed AS (
      |  SELECT n_chars,
      |    CASE WHEN n_chars < 100 THEN 'too_short'
      |         WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 'unsupported_lang'
      |         ELSE 'ok' END AS reason
      |  FROM documents)
      |SELECT reason, count(*) AS n,
      |  CASE WHEN reason = 'ok' THEN NULL
      |       ELSE CAST(sum(n_chars) AS BIGINT) END AS sum_chars
      |FROM routed GROUP BY reason""".stripMargin

  /** q229 — RESHARDING stability audit: when the shard count scales
    * 8 → 10, what fraction of the corpus moves? Naive `hash mod n`
    * reassigns ~(1 − 1/lcm-ish) ≈ 80% of documents — every move is a
    * re-download/re-index at 100 TB — while rendezvous (highest-
    * random-weight) hashing moves ONLY docs whose argmax lands on a
    * NEW shard, expected 2/10. The operator computes both assignments
    * at n=8 and n=10 in one pass and reports moved counts + ppm, so
    * the resharding cost is a measured number, not folklore. All
    * Lehmer-hash integer arithmetic (the q121/q202 no-rand family);
    * HRW's per-doc work is a 10-way argmax of hashes — map-side, no
    * shuffle beyond the final count.
    */
  def reshardStabilityQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    // w(doc, s): the repo's double-step Lehmer on a (doc, shard) mix
    val weighted = docs
      .select(col("doc_id"), explode(expr("sequence(0, 9)")).as("s"))
      .withColumn("w", expr(
        "((doc_id * 31 + s * 1000003) % 2147483647) * 48271 % 2147483647 * 48271 % 2147483647"))
    val hrw = weighted.groupBy(col("doc_id"))
      .agg(
        // composite key w·16 + (15 − s): larger weight wins, then the
        // SMALLER shard id — one BIGINT, so both engines' argmax agree
        // even on (astronomically unlikely) weight collisions
        expr("max_by(s, w * 16 + (15 - s)) FILTER (WHERE s < 8)").as("hrw8"),
        expr("max_by(s, w * 16 + (15 - s))").as("hrw10"))
    val modAssign = docs.select(col("doc_id"),
      expr("(doc_id % 2147483647) * 48271 % 2147483647 % 8").as("mod8"),
      expr("(doc_id % 2147483647) * 48271 % 2147483647 % 10").as("mod10"))
    val joined = hrw.join(modAssign, "doc_id")
    joined.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("mod8") =!= col("mod10"), 1L).otherwise(0L)).as("mod_moved"),
        sum(when(col("hrw8") =!= col("hrw10"), 1L).otherwise(0L)).as("hrw_moved"),
        sum(when(col("hrw8") =!= col("hrw10") && col("hrw10") < 8, 1L).otherwise(0L))
          .as("hrw_illegal_moves"))
      .select(col("n_docs"), col("mod_moved"),
        expr("mod_moved * 1000000L div n_docs").as("mod_moved_ppm"),
        col("hrw_moved"),
        expr("hrw_moved * 1000000L div n_docs").as("hrw_moved_ppm"),
        // THE rendezvous guarantee: a doc that moves can only move TO
        // a new shard (8 or 9) — this column must be zero
        col("hrw_illegal_moves"))
  }

  val reshardStabilitySql: String =
    """WITH w AS (
      |  SELECT doc_id, s.s AS s,
      |    ((doc_id * 31 + s.s * 1000003) % 2147483647) * 48271 % 2147483647
      |      * 48271 % 2147483647 AS w
      |  FROM documents, unnest(range(10)) s(s)),
      |hrw AS (
      |  SELECT doc_id,
      |    arg_max(s, w * 16 + (15 - s)) FILTER (WHERE s < 8) AS hrw8,
      |    arg_max(s, w * 16 + (15 - s)) AS hrw10
      |  FROM w GROUP BY 1),
      |m AS (
      |  SELECT doc_id,
      |    (doc_id % 2147483647) * 48271 % 2147483647 % 8 AS mod8,
      |    (doc_id % 2147483647) * 48271 % 2147483647 % 10 AS mod10
      |  FROM documents),
      |j AS (SELECT * FROM hrw JOIN m USING (doc_id))
      |SELECT count(*) AS n_docs,
      |  CAST(sum(CASE WHEN mod8 <> mod10 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved,
      |  CAST(sum(CASE WHEN mod8 <> mod10 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS mod_moved_ppm,
      |  CAST(sum(CASE WHEN hrw8 <> hrw10 THEN 1 ELSE 0 END) AS BIGINT) AS hrw_moved,
      |  CAST(sum(CASE WHEN hrw8 <> hrw10 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
      |    AS hrw_moved_ppm,
      |  CAST(sum(CASE WHEN hrw8 <> hrw10 AND hrw10 < 8 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hrw_illegal_moves
      |FROM j""".stripMargin

  // ——— q226: curriculum export (quality-ordered range shards) ———

  /** The range-partitioned export itself — the SCALE path: a total
    * order by (quality, doc_id) realized as RangePartitioning (sampled
    * boundaries, parallel sort within shards), never a single-partition
    * global sort. Boundary sampling is engine-internal, so THIS frame
    * is plan-pinned (PlanAuditSpec), while the GATE query reports the
    * deterministic ntile view of the same order.
    */
  def curriculumExportFrame(spark: SparkSession, dir: String, shards: Int): DataFrame = {
    val scored = graft.operators.TextAnalysis
      .qualityScore(Tables.documents(spark, dir), "doc_id", "text")
    scored.repartitionByRange(shards, col("quality"), col("doc_id"))
      .sortWithinPartitions(col("quality"), col("doc_id"))
  }

  /** q226 — curriculum sharding: order the corpus easy→hard by the q23
    * quality score and cut it into 8 contiguous shards — the export
    * step of curriculum training (feed cleaner/simpler shards first).
    * The gate reports per-shard counts and quality ranges from the
    * deterministic ntile view (fully tie-broken order); contiguity is
    * checkable in the output itself: shard k's max quality never
    * exceeds shard k+1's min.
    */
  def curriculumQueryQ226(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.TextAnalysis
      .qualityScore(Tables.documents(spark, dir), "doc_id", "text")
    scored
      .withColumn("shard", expr(
        "ntile(8) OVER (ORDER BY quality, doc_id)").cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_q"), max(col("quality")).as("max_q"),
        min(col("doc_id")).as("min_doc_id"))
  }

  val curriculumQ226Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, ${graft.operators.TextAnalysis.qualityExprSql} AS quality
       |  FROM documents),
       |sharded AS (
       |  SELECT doc_id, quality,
       |    CAST(ntile(8) OVER (ORDER BY quality, doc_id) AS INTEGER) AS shard
       |  FROM scored)
       |SELECT shard, count(*) AS n_docs,
       |  min(quality) AS min_q, max(quality) AS max_q,
       |  min(doc_id) AS min_doc_id
       |FROM sharded GROUP BY 1""".stripMargin
}
