package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Deduplication operators for large-scale corpus curation — the
  * beyond-reference pipeline block (BASELINE.json north star).
  *
  * Scale design: every variant is built so the only shuffles are
  * (a) hash-partition by a dedup key (exact), or (b) an equi-join on
  * a *sparse* candidate key (shingle / band signature / LSH bucket) —
  * never an all-pairs product. All-pairs O(n²) appears only inside a
  * candidate bucket, whose size is bounded by construction.
  */
object Dedup {

  // ——— exact ———

  /** Exact dedup: one representative (min id) per identical `keyCol`.
    * One hash shuffle on the key; partial aggregation collapses
    * duplicates map-side first.
    */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def exactQuery(spark: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("keep_id"), col("n_copies"))

  val exactSql: String =
    "SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY text"

  // ——— n-gram Jaccard ———

  /** Distinct word n-gram shingles per document as 64-bit hashes:
    * (id, shingle). The word array is materialized once per row (a
    * naive inline formulation re-splits the text for every shingle);
    * each shingle is `xxhash64` over the word slice directly —
    * codegen, no UDF, and no per-shingle string concatenation.
    *
    * Hashing before the shuffle is a deliberate accuracy trade: the
    * distinct / posting-list shuffles carry 8-byte longs instead of
    * ~25-byte strings (≈3× fewer shuffle bytes, no string compares),
    * and Jaccard math is unchanged UNLESS two distinct shingles
    * collide in 64 bits. On the gated corpus (~10⁵–10⁶ distinct
    * shingles) the birthday bound puts any collision below ~1e-8;
    * at 100 TB (~10¹² shingles) cross-doc collisions stay harmless
    * because a spurious +1 intersection cannot move Jaccard across a
    * 0.8 threshold for real-sized documents.
    */
  /** (id, arr) with `arr` the distinct shingle-hash array of the doc.
    * Per-doc dedup happens INSIDE the row (array_distinct) — a
    * post-explode .distinct() would shuffle every (id, shingle) pair
    * just to remove within-doc repeats that are local by definition.
    * Shingle-set sizes likewise come from `size(arr)` at the doc row,
    * never from a groupBy over the exploded pairs.
    */
  def shingleArrays(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col("id"), array_distinct(expr(
        s"transform(sequence(0, size(__w) - $n), i -> xxhash64(slice(__w, i + 1, $n)))"))
        .as("arr"))

  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleArrays(df, idCol, textCol, n)
      .select(col("id"), explode(col("arr")).as("shingle"))

  /** Default document-frequency cap for posting lists. A shingle shared
    * by more documents than this carries no discriminative signal (it
    * is boilerplate — license headers, templates) and is dropped from
    * the intersection counts; 10⁴ is far above any real near-dup
    * cluster size while bounding the per-shingle pair fan-out at
    * ~5·10⁷ regardless of corpus size. (All gated test corpora have
    * max df = 25, so the cap never fires there and the DuckDB oracles
    * are byte-identical with or without it.)
    */
  val DefaultMaxDf: Int = 10000

  /** Pairwise shingle-intersection counts: group by shingle into a
    * posting list, emit each (idᵢ, idⱼ) i<j pair, count per pair. One
    * shuffle on the shingle (map-side combined) and one on the pair —
    * versus a self-join's two full shuffles of the shingle set plus b²
    * join rows per bucket. Co-occurrence only: documents sharing
    * nothing never meet.
    *
    * Posting lists are collected with [[graft.functions.CappedPostingsAgg]]:
    * the aggregation buffer stops growing at `maxDf + 1` ids while the
    * exact df keeps counting, so a corpus-frequent stop shingle can
    * neither blow up an aggregation buffer (8 GB array at df = 10⁹)
    * nor explode ~df²/2 pairs in one task — the 100 TB failure mode of
    * a plain `collect_list`. Groups with `df > maxDf` are dropped
    * BEFORE pairing; kept arrays are complete by construction.
    *
    * Effect on Jaccard: dropped stop shingles no longer count toward
    * the intersection (the denominators from [[shingleArrays]] still
    * include them), so affected pairs' scores are a conservative lower
    * bound — dedup may MISS a pair whose overlap is mostly boilerplate,
    * never falsely merge one. Use [[droppedShingles]] to audit what a
    * given cap removes.
    */
  private[operators] def intersections(sh: DataFrame, maxDf: Int): DataFrame =
    sh.groupBy(col("shingle"))
      .agg(graft.functions.GraftFunctions.cappedPostings(col("id"), maxDf).as("p"))
      .filter(col("p.df") > 1 && col("p.df") <= maxDf)
      .select(array_sort(col("p.ids")).as("ids"))
      .select(explode(expr(
        "flatten(transform(sequence(0, size(ids) - 2), " +
          "i -> transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "j -> struct(ids[i] AS id_a, j AS id_b))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))

  /** Audit view of the stop shingles a df cap removes: (shingle, df)
    * for every shingle with df > maxDf. Run it (count / inspect) to
    * log what a production cap drops; it shares no state with
    * [[intersections]], which enforces the cap structurally.
    */
  def droppedShingles(df: DataFrame, idCol: String, textCol: String, n: Int, maxDf: Int): DataFrame =
    shingles(df, idCol, textCol, n)
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  /** Materialize `result` eagerly (localCheckpoint: computed once,
    * blocks on executors) and release the upstream caches it consumed.
    * Pair results are tiny (near-dup pairs, not the corpus), so the
    * checkpoint is cheap — and without this, every invocation of a
    * pair pipeline left its shingle-array cache resident for the rest
    * of the session (bench reps and long sessions accumulated executor
    * storage until eviction pressure). Cluster note: like
    * [[connectedComponents]]' default, localCheckpoint blocks don't
    * survive executor loss; rerun the query if that happens mid-job.
    */
  private[operators] def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist())
    out
  }

  /** Near-dup pairs by exact n-gram Jaccard ≥ `threshold`.
    * Jaccard = |∩| / (|A| + |B| − |∩|) from exact counts.
    * Eager (see [[materializeAndRelease]]): the shingle-array cache —
    * consumed by sizes and the exploded shingles — is dropped before
    * returning.
    */
  /** Shared candidate generator for the set-overlap scorers (Jaccard
    * resemblance, directed containment): undirected shingle
    * intersections with both sides' set sizes attached —
    * (id_a, id_b, n_inter, n_a, n_b). Returns the cached shingle
    * arrays too so callers can release them via
    * [[materializeAndRelease]]. ONE definition of the candidate
    * machinery; the scorers differ only in their ratio.
    */
  private def overlapCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Int): (DataFrame, DataFrame) = {
    val arrs = shingleArrays(df, idCol, textCol, n).cache()
    val sizes = arrs.select(col("id"), size(col("arr")).cast("long").as("n_sh"))
    val sh = arrs.select(col("id"), explode(col("arr")).as("shingle"))
    val joined = intersections(sh, maxDf)
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
    (joined, arrs)
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Int = DefaultMaxDf): DataFrame = {
    val (joined, arrs) = overlapCandidates(df, idCol, textCol, n, maxDf)
    materializeAndRelease(scoreJaccard(joined, threshold), arrs)
  }

  /** QUERY-RESTRICTED intersections: only pairs touching an id in
    * `queryIds` (a one-column frame named `id`). Instead of exploding
    * every posting list into C(df, 2) pairs and filtering afterwards
    * (corpus-scale work for a query-scale answer), semi-join ONE side
    * of the shingle equi-join to the query ids first: cost is
    * O(Σ df over the QUERY docs' shingles), not O(Σ df²) over all
    * shingles. Semantics are identical to
    * `intersections(sh, maxDf).filter(id_a ∈ Q or id_b ∈ Q)`:
    * the df cap is still computed over the WHOLE corpus (the stop-
    * shingle set is a corpus property — restricting df to the query
    * side would resurrect boilerplate shingles the full path drops),
    * `df` here is exact like [[CappedPostingsAgg]]'s, and the
    * canonicalize-then-distinct collapses the double emission of
    * query-query pairs.
    */
  private[operators] def intersectionsFor(sh: DataFrame, queryIds: DataFrame,
      maxDf: Int): DataFrame = {
    val live = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= maxDf)
      .select(col("shingle"))
    val shLive = sh.join(live, Seq("shingle"), "left_semi")
    val qSide = shLive.join(queryIds.select(col("id")), Seq("id"), "left_semi")
      .select(col("id").as("qid"), col("shingle"))
    shLive.select(col("id").as("oid"), col("shingle"))
      .join(qSide, Seq("shingle"))
      .filter(col("qid") =!= col("oid"))
      .select(least(col("qid"), col("oid")).as("id_a"),
        greatest(col("qid"), col("oid")).as("id_b"), col("shingle"))
      .distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
  }

  /** [[ngramJaccardPairs]] restricted to pairs with at least one side
    * in `queryIds` — same scoring, same df-cap semantics, but the
    * candidate build does query-scale work (see [[intersectionsFor]]).
    * This is the right entry point when the consumer only wants pairs
    * around a small query set (hard-negative mining, point-lookup
    * dedup audits); output equals the full pair table filtered to the
    * query set, by construction.
    */
  def ngramJaccardPairsFor(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, queryIds: DataFrame,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    val arrs = shingleArrays(df, idCol, textCol, n).cache()
    val sizes = arrs.select(col("id"), size(col("arr")).cast("long").as("n_sh"))
    val sh = arrs.select(col("id"), explode(col("arr")).as("shingle"))
    val joined = intersectionsFor(sh, queryIds, maxDf)
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
    materializeAndRelease(scoreJaccard(joined, threshold), arrs)
  }

  /** THE Jaccard scoring formula over a candidate frame carrying
    * (id_a, id_b, n_inter, n_a, n_b) — one definition shared by the
    * posting-list path and the LSH verify path, so a denominator or
    * rounding change cannot diverge between them.
    */
  private def scoreJaccard(cands: DataFrame, threshold: Double): DataFrame =
    cands
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  def ngramJaccardQuery(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", n = 3, threshold = 0.8)

  /** Shared SQL replica of [[overlapCandidates]] (trigram shingles) —
    * ONE definition of the candidate CTEs, composed by the Jaccard
    * and containment oracles so the machinery cannot silently diverge.
    */
  private[graft] val overlapCandidatesCtes: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] AS shingle
      |  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS i FROM w WHERE len(ws) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  val ngramJaccardSql: String = overlapCandidatesCtes +
    """
      |SELECT id_a, id_b,
      |  round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8""".stripMargin

  /** q219 — near-dup pair EXPLANATION: for every q16 Jaccard pair, the
    * top-3 SHARED shingles by corpus rarity (df asc — the rarest
    * shared n-grams are the most diagnostic; boilerplate shingles
    * shared with thousands of other docs explain nothing). This is the
    * audit surface a human reviews before trusting a drop-list: "these
    * two were merged BECAUSE of these phrases". Machinery: the same
    * candIds semi-join discipline as the verify stage — shingles are
    * re-materialized as STRINGS only for documents appearing in some
    * pair (pages ∝ pairs, not corpus), df is one sparse-key count,
    * top-3 one window per pair.
    */
  def pairExplainQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(__w) - 3), i -> array_join(slice(__w, i + 1, 3), ' '))")))
        .as("s"))
    val pairs = pairArtifact(spark, dir).select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    val candIds = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val shC = sh.join(candIds, Seq("doc_id"), "left_semi").cache()
    val dfq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val shared = shC.select(col("doc_id").as("id_a"), col("s"))
      .join(shC.select(col("doc_id").as("id_b"), col("s")), Seq("s"))
      .join(pairs, Seq("id_a", "id_b"), "left_semi")
    val out = shared.join(dfq, Seq("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id_a"), col("id_b"))
          .orderBy(col("df").asc, col("s").asc)))
      .filter(col("rn") <= 3)
      .select(col("id_a"), col("id_b"), col("rn"), col("s").as("shingle"), col("df"))
      .localCheckpoint(true)
    shC.unpersist()
    out
  }

  /** Oracle: the shared q16 candidate CTEs, its ≥0.8 pair filter, a
    * corpus-df count, and the rarity top-3 window.
    */
  val pairExplainSql: String = overlapCandidatesCtes +
    """,
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8),
      |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
      |shared AS (
      |  SELECT p.id_a, p.id_b, a.shingle
      |  FROM pairs p
      |  JOIN sh a ON a.doc_id = p.id_a
      |  JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle)
      |SELECT id_a, id_b, CAST(rn AS INTEGER) AS rn, shingle, df FROM (
      |  SELECT s.id_a, s.id_b, s.shingle, d.df,
      |    row_number() OVER (PARTITION BY s.id_a, s.id_b
      |      ORDER BY d.df, s.shingle) AS rn
      |  FROM shared s JOIN dfq d USING (shingle)) z
      |WHERE rn <= 3""".stripMargin

  /** q227 — the cross-SOURCE duplication matrix: q16's near-dup pairs
    * rolled up to (source_a, source_b) cells with a pair-density rate
    * — the mirror-site / syndication detector ("source X is 80%
    * copies of source Y") that decides whether to drop a whole source
    * rather than dedup it document by document. Density is pairs per
    * million cross-source document pairs (integer ppm of n_a·n_b), so
    * a small source that is mostly copies outranks a huge source with
    * incidental overlap. Rides the audited q16 machinery: rollup cost
    * beyond it is one join to the doc→source map and one group-by on
    * a (sources)²-bounded key.
    */
  def sourceDupMatrixQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = pairArtifact(spark, dir).select(col("id_a"), col("id_b"))
    val cells = pairs
      .join(docs.select(col("doc_id").as("id_a"), col("source").as("source_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("source").as("source_b")), "id_b")
      .select(least(col("source_a"), col("source_b")).as("src_lo"),
        greatest(col("source_a"), col("source_b")).as("src_hi"))
      .groupBy(col("src_lo"), col("src_hi")).agg(count(lit(1)).as("n_pairs"))
    cells
      .join(counts.select(col("source").as("src_lo"), col("n").as("n_lo")), "src_lo")
      .join(counts.select(col("source").as("src_hi"), col("n").as("n_hi")), "src_hi")
      .select(col("src_lo"), col("src_hi"), col("n_pairs"), col("n_lo"), col("n_hi"),
        expr("n_pairs * 1000000L div (n_lo * n_hi)").as("density_ppm"))
  }

  /** Oracle: the shared q16 CTEs, the source join, the unordered-cell
    * normalization, and the same integer ppm density.
    */
  val sourceDupMatrixSql: String = overlapCandidatesCtes +
    """,
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8),
      |counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |cells AS (
      |  SELECT least(da.source, db.source) AS src_lo,
      |         greatest(da.source, db.source) AS src_hi,
      |         count(*) AS n_pairs
      |  FROM pairs p
      |  JOIN documents da ON da.doc_id = p.id_a
      |  JOIN documents db ON db.doc_id = p.id_b
      |  GROUP BY 1, 2)
      |SELECT c.src_lo, c.src_hi, c.n_pairs,
      |  lo.n AS n_lo, hi.n AS n_hi,
      |  CAST(c.n_pairs * 1000000 // (lo.n * hi.n) AS BIGINT) AS density_ppm
      |FROM cells c
      |JOIN counts lo ON lo.source = c.src_lo
      |JOIN counts hi ON hi.source = c.src_hi""".stripMargin

  // ——— q231: the pair table as a FIRST-CLASS materialized artifact ———

  /** Build-if-absent, then read, the corpus near-dup PAIR ARTIFACT —
    * the q16 trigram-Jaccard pair table persisted ONCE through the
    * store's ordinary write path (the q134 signature-index pattern)
    * and served bucket-partitioned to every downstream consumer
    * (q219's pair explanations, q227's source matrix, q231's audit).
    *
    * Why this exists: at 100 TB the pair table IS the artifact — a
    * corpus-scale shingle pass produces it, then auditors, drop-list
    * builders, and rollups all read it. Recomputing the candidate
    * machinery per consumer (what q219/q227 did before round 13) is
    * the anti-pattern the signature index already solved for
    * incremental dedup; one build + N cheap reads is the only shape
    * that amortizes. The store versions the build (MVCC), so a
    * refreshed corpus republishes a new version and pinned readers
    * keep their snapshot.
    */
  def pairArtifact(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.bucketed.BucketStore
    val name = s"jaccard_pairs@$dir"
    if (!BucketStore.exists(name))
      BucketStore.load(spark, name, ngramJaccardQuery(spark, dir), "id_a", numBuckets = 8)
    spark.read.format("graft-buckets").option("table", name).load()
  }

  /** q244 — the pair artifact MAINTAINED INCREMENTALLY, closing the
    * build-if-absent-forever gap: [[pairArtifact]] is built once and
    * never grows, so after a q134-style ingest the stored pair table
    * went stale while the signature index and `<index>__df` moved on.
    * Here the full daily cycle runs TWICE (two batches admitted to an
    * indexed corpus), and each cycle extends ALL THREE artifacts
    * through the store's ordinary append path (one MVCC version per
    * day, the `<index>__df` pattern):
    *
    *   1. the day's batch dedups against the index
    *      ([[incrementalDedupPairs]] — candidates ∝ batch, exact
    *      verify ∝ candidates, corpus-scoped df cap);
    *   2. the verified NEW pairs append to the PAIR ARTIFACT;
    *   3. the batch's signatures append to the index and its shingle
    *      counts to the df table, so the NEXT batch sees today's
    *      documents.
    *
    * The gate is the q170/q234 bit-identity trick: after both
    * batches, the grown artifact must hash-equal a from-scratch
    * exact-Jaccard rebuild over the grown corpus (the plain-SQL
    * oracle, q16's CTEs) — every pair is either inside the original
    * history (day-0 seed), or touches batch 1 (cycle 1, including
    * batch1-history), or touches batch 2 (cycle 2, including
    * batch2-batch1 — WHICH ONLY WORKS if cycle 1's index extension
    * actually landed). At 100 TB this is the artifact lifecycle: one
    * corpus-scale build, then per-day cost ∝ batch + candidates,
    * never a rebuild.
    */
  def pairArtifactExtendQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.bucketed.{BucketStore, BucketedCatalog}
    spark.conf.set("spark.sql.catalog.graft", classOf[BucketedCatalog].getName)
    val docs = Tables.documents(spark, dir)
    val artifact = s"jaccard_pairs_ext@$dir"
    val indexName = s"minhash_idx_ext@$dir"
    val isB1 = col("doc_id") % 10 === 0
    val isB2 = col("doc_id") % 10 === 1
    if (!BucketStore.exists(artifact)) {
      val history = !(isB1 || isB2)
      // day 0: index + df + pair artifact, all over the same corpus
      BucketStore.load(spark, indexName,
        signatureIndexRows(docs.filter(history), "doc_id", "text", 3, 32, 16),
        "bkey", numBuckets = 16)
      BucketStore.load(spark, s"${indexName}__df",
        shingles(docs.filter(history), "doc_id", "text", 3)
          .groupBy(col("shingle")).agg(count(lit(1)).as("df")),
        "shingle", numBuckets = 16)
      BucketStore.load(spark, artifact,
        ngramJaccardPairs(docs.filter(history), "doc_id", "text", n = 3, threshold = 0.8),
        "id_a", numBuckets = 8)
      // two daily cycles; after each, corpus := corpus ∪ batch
      Seq(history || isB1, history || isB1 || isB2).foldLeft(history) {
        case (corpus, corpusAfter) =>
        val isBatch = corpusAfter && !corpus
        val admitted = docs.filter(corpus || isBatch)
        val newPairs = incrementalDedupPairs(spark, admitted, "doc_id", "text",
          indexName, isBatch, n = 3, numHashes = 32, bands = 16, threshold = 0.8)
        newPairs.writeTo(s"graft.`$artifact`").append()
        signatureIndexRows(docs.filter(isBatch), "doc_id", "text", 3, 32, 16)
          .writeTo(s"graft.`$indexName`").append()
        shingles(docs.filter(isBatch), "doc_id", "text", 3)
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .writeTo(s"graft.`${indexName}__df`").append()
        corpusAfter
      }
    }
    spark.read.format("graft-buckets").option("table", artifact).load()
  }

  /** Oracle: the from-scratch exact rebuild over the grown corpus —
    * q16's pair SQL verbatim (the whole documents table IS the grown
    * corpus: history ∪ batch1 ∪ batch2).
    */
  val pairArtifactExtendSql: String = ngramJaccardSql

  /** q231 — per-source dedup AUDIT over the stored pair artifact:
    * build once ([[pairArtifact]]), consume TWICE — a pair-level
    * rollup (pairs fully inside the source vs pairs crossing into
    * another source) and a doc-level rollup (how many of the source's
    * documents appear in at least one near-dup pair). The table a
    * curation decision actually reads: `pairs_within` high → the
    * source self-syndicates (dedup internally), `pairs_cross` high →
    * it mirrors others (consider dropping wholesale), `dup_docs/n
    * _docs` is the fraction of the source you would touch. Scale: the
    * heavy shingle pass is paid once at artifact build; this query is
    * two equi-joins to the doc→source map plus group-bys on source-
    * bounded keys — the plan contains NO shingle machinery (pinned).
    */
  def pairArtifactAuditQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val pairs = pairArtifact(spark, dir).select(col("id_a"), col("id_b"))
    val withSrc = pairs
      .join(docs.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
    val within = withSrc.filter(col("src_a") === col("src_b"))
      .select(col("src_a").as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("pairs_within"))
    val cross = withSrc.filter(col("src_a") =!= col("src_b"))
      .select(explode(array(col("src_a"), col("src_b"))).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("pairs_cross"))
    val dupDocs = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
      .join(docs, "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("dup_docs"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(within, Seq("source"), "left")
      .join(cross, Seq("source"), "left")
      .join(dupDocs, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("pairs_within"), lit(0L)).as("pairs_within"),
        coalesce(col("pairs_cross"), lit(0L)).as("pairs_cross"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"))
  }

  /** Oracle: the shared q16 candidate CTEs stand in for the stored
    * artifact (the store build is gated separately by q16 itself),
    * then the same two rollups.
    */
  val pairArtifactAuditSql: String = overlapCandidatesCtes +
    """,
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8),
      |ps AS (
      |  SELECT p.id_a, p.id_b, da.source AS src_a, db.source AS src_b
      |  FROM pairs p
      |  JOIN documents da ON da.doc_id = p.id_a
      |  JOIN documents db ON db.doc_id = p.id_b),
      |within_s AS (
      |  SELECT src_a AS source, count(*) AS pairs_within FROM ps
      |  WHERE src_a = src_b GROUP BY 1),
      |cross_s AS (
      |  SELECT source, count(*) AS pairs_cross FROM (
      |    SELECT src_a AS source FROM ps WHERE src_a <> src_b
      |    UNION ALL
      |    SELECT src_b FROM ps WHERE src_a <> src_b) t GROUP BY 1),
      |dd AS (
      |  SELECT d.source, count(*) AS dup_docs FROM (
      |    SELECT DISTINCT doc_id FROM (
      |      SELECT id_a AS doc_id FROM pairs
      |      UNION SELECT id_b FROM pairs) u) x
      |  JOIN documents d USING (doc_id) GROUP BY 1),
      |nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT nd.source, CAST(nd.n_docs AS BIGINT) AS n_docs,
      |  CAST(COALESCE(w.pairs_within, 0) AS BIGINT) AS pairs_within,
      |  CAST(COALESCE(c.pairs_cross, 0) AS BIGINT) AS pairs_cross,
      |  CAST(COALESCE(dd.dup_docs, 0) AS BIGINT) AS dup_docs
      |FROM nd
      |LEFT JOIN within_s w USING (source)
      |LEFT JOIN cross_s c USING (source)
      |LEFT JOIN dd USING (source)""".stripMargin

  /** DIRECTED n-gram containment (Broder): C(A→B) = |A∩B| / |A| — the
    * subsumption signal Jaccard resemblance misses. A short document
    * quoted whole inside a long one scores containment 1.0 while its
    * Jaccard is tiny (the union is dominated by B), so this is the
    * detector for quotes, boilerplate-wrapped copies, and
    * subset-crawls; curation usually drops the contained side.
    *
    * Same candidate generation as [[ngramJaccardPairs]] (shared
    * [[overlapCandidates]] — the df-capped posting-list equi-join,
    * never all-pairs); each undirected intersection then emits BOTH
    * directions ROW-LOCALLY (explode of a two-struct array), so the
    * directed view runs the join work once, not once per direction.
    * Exact integer ratio → engine-exact oracle.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Int = DefaultMaxDf): DataFrame = {
    val (joined, arrs) = overlapCandidates(df, idCol, textCol, n, maxDf)
    val directed = joined.select(explode(array(
      struct(col("id_a").as("id_contained"), col("id_b").as("id_container"),
        round(col("n_inter").cast("double") / col("n_a"), 6).as("containment")),
      struct(col("id_b").as("id_contained"), col("id_a").as("id_container"),
        round(col("n_inter").cast("double") / col("n_b"), 6).as("containment"))))
      .as("d"))
      .select(col("d.id_contained"), col("d.id_container"), col("d.containment"))
    materializeAndRelease(directed.filter(col("containment") >= threshold), arrs)
  }

  def containmentQuery(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(Tables.documents(spark, dir), "doc_id", "text",
      n = 3, threshold = 0.6)

  val containmentSql: String = overlapCandidatesCtes +
    """,
      |j AS (
      |  SELECT id_a, id_b, n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b
      |  FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id),
      |directed AS (
      |  SELECT id_a AS id_contained, id_b AS id_container,
      |         round(CAST(n_inter AS DOUBLE) / n_a, 6) AS containment FROM j
      |  UNION ALL
      |  SELECT id_b, id_a, round(CAST(n_inter AS DOUBLE) / n_b, 6) FROM j)
      |SELECT id_contained, id_container, containment
      |FROM directed WHERE containment >= 0.6""".stripMargin

  // ——— MinHash + LSH ———

  /** MinHash signatures: sig[i] = min over shingles of mixᵢ(shingle hash).
    * One [[graft.functions.MinHashAgg]] pass: the buffer is the
    * numHashes running minima, updated map-side — the shuffle carries
    * one numHashes-long vector per (partition, doc), never the
    * shingles. (A previous explode-by-hash-index formulation shuffled
    * |shingles|·numHashes rows and was 4× slower at sf0.1.) The
    * shingle column already IS the 64-bit base hash (see [[shingles]]).
    */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.groupBy(col("id"))
      .agg(graft.functions.GraftFunctions.minhash(col("shingle"), numHashes).as("sig"))

  /** MinHash-LSH near-dup pairs: band the signature (`bands` bands of
    * `numHashes / bands` rows), join on (band index, band content) to
    * get candidates, then verify candidates with exact Jaccard.
    * Candidate volume is controlled by the band collision probability
    * (s-curve around threshold^(1/rows-per-band)); the verify join
    * touches only candidate pairs.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, threshold: Double,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val arrs = shingleArrays(df, idCol, textCol, n).cache()
    val sh = arrs.select(col("id"), explode(col("arr")).as("shingle"))
    val sig = minHashSignatures(sh, numHashes)
    val banded = sig.select(col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> slice(sig, b * $rows + 1, $rows))"))
        .as(Seq("band", "bsig")))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
      .cache()
    // verify: exact Jaccard on candidate pairs only. Restrict the
    // shingle self-join to documents that appear in any candidate pair
    // (semi-join), THEN join on the shingle and keep candidate pairs —
    // the intersection count comes from the shingle equi-join, never
    // from an |A|×|B| cross product per pair.
    val candIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id"))).distinct()
    val shC = sh.join(candIds, Seq("id"), "left_semi")
    val sizes = arrs.select(col("id"), size(col("arr")).cast("long").as("n_sh"))
    val pairShingles = intersections(shC, maxDf)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
    val pairs = scoreJaccard(pairShingles
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b"),
      threshold)
    materializeAndRelease(pairs, arrs, candidates)
  }

  def minHashLshQuery(spark: SparkSession, dir: String): DataFrame =
    minHashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, threshold = 0.8)

  // ——— incremental dedup against a persisted signature index ———

  /** Banded MinHash signatures — (id, band, bsig) rows, the unit the
    * LSH candidate join keys on. Shared by the one-shot LSH pipeline
    * and the persisted-index incremental path.
    */
  private def bandedRows(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sig.select(col("id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> slice(sig, b * $rows + 1, $rows))"))
        .as(Seq("band", "bsig")))
  }

  /** The signature-index row shape: (bkey, id, band, bsig) with
    * `bkey = hash64(band, bsig)` — the LSH bucket id the index table
    * is bucketed on. Public because it is the index's MAINTENANCE
    * unit too: after a batch is deduped and admitted to the corpus,
    * appending `signatureIndexRows(admitted…)` through the catalog
    * (`writeTo(...).append()`) extends the index so the NEXT batch
    * sees today's documents — the full daily cycle, with the store's
    * two-phase commit versioning each day's extension.
    */
  def signatureIndexRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame =
    bandedRows(minHashSignatures(shingles(docs, idCol, textCol, n), numHashes),
      numHashes, bands)
      .select(xxhash64(col("band"), col("bsig")).as("bkey"),
        col("id"), col("band"), col("bsig"))

  /** q134 — INCREMENTAL dedup: a new batch of documents checked
    * against an already-indexed corpus WITHOUT recomputing anything
    * over the history. The corpus's banded MinHash signatures are
    * persisted once in the bucket store, keyed by a 64-bit hash of
    * (band, bsig) — the LSH bucket id. Each arriving batch then:
    *
    *   1. computes signatures for ITS OWN documents only;
    *   2. finds candidates as two equi-joins — batch bands against
    *      the stored index (new-vs-history) and batch bands against
    *      themselves (new-vs-new); never corpus-vs-corpus, never
    *      all-pairs;
    *   3. verifies candidates with exact n-gram Jaccard, recomputing
    *      shingles ONLY for documents appearing in some candidate
    *      pair (a semi-join into the corpus — pages ∝ candidates).
    *
    * Per-batch cost is ∝ batch + candidates; the full-corpus shingle
    * pass that the one-shot pipelines (q16/q17) pay every run is paid
    * once at index build and amortized forever. At 100 TB this is the
    * only shape a daily-crawl dedup can take: the history is petabytes
    * of signatures served bucket-partitioned on the LSH key, and the
    * day's batch shuffles only itself into that layout. Same bands and
    * same exact-verify as q17, so the result equals the full exact
    * computation restricted to pairs touching the batch — which is
    * exactly what the plain-SQL oracle computes.
    *
    * TWO CONTRACT CAVEATS (deterministic on the gated corpus, real at
    * production scale):
    *
    *   - Banding recall is probabilistic: a true pair at Jaccard j is
    *     surfaced only if at least one of the 16 bands collides, i.e.
    *     with probability 1 − (1 − j²)^16 (b=16 bands of r=2 rows).
    *     Above the 0.8 gate threshold that is ≥ 1 − (1 − 0.64)^16 ≈
    *     1 − 6e-8, so equality with the exact oracle holds on any
    *     corpus whose near-dups sit at the threshold or above — but a
    *     pair at exactly j≈0.8 still has a ~6e-8 chance of being
    *     missed, the same exposure q17 documents. The oracle-equality
    *     gate is therefore a (deterministic-here) check of a
    *     probabilistic contract, not an identity.
    *
    *   - (CLOSED in round 13) The exact-verify maxDf cap used to be
    *     scoped to the candidate-restricted shingle set, so when the
    *     cap fired a boilerplate shingle could be kept here and
    *     dropped by q16 — the two pipelines scoring the same pair
    *     differently. The corpus-wide shingle DF now PERSISTS next to
    *     the signature index (`<index>__df`, append-only increments
    *     summed on read); each batch joins its candidate shingles
    *     against stored-history + batch-local df and drops over-cap
    *     shingles BEFORE intersection counting — scoring is
    *     q16-identical even when the cap fires (DedupSpec plants a
    *     corpus where it does and pins the equality).
    *
    * The batch split here is deterministic (`doc_id % 10 = 0` models
    * "today's crawl") so the gated query is reproducible; production
    * would pass any batch DataFrame and `BucketStore.load`'s
    * layout-change republish semantics version the index.
    */
  def incrementalDedupPairs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, indexName: String, isBatch: Column,
      n: Int, numHashes: Int, bands: Int, threshold: Double,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    val (pairs, caches) = incrementalDedupFrames(spark, docs, idCol, textCol, indexName,
      isBatch, n, numHashes, bands, threshold, maxDf)
    materializeAndRelease(pairs, caches: _*)
  }

  /** The un-materialized incremental pipeline — split out so specs can
    * audit the pair plan (the public entry localCheckpoints, which
    * hides the joins from `executedPlan`). Returns (pairs, caches to
    * release after materialization).
    */
  private[operators] def incrementalDedupFrames(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, indexName: String, isBatch: Column,
      n: Int, numHashes: Int, bands: Int, threshold: Double,
      maxDf: Int = DefaultMaxDf): (DataFrame, Seq[DataFrame]) = {
    import graft.sources.bucketed.BucketStore
    // index build: once per corpus generation (modeling the nightly
    // index the pipeline maintains); load() is a no-op when present
    if (!BucketStore.exists(indexName)) {
      BucketStore.load(spark, indexName,
        signatureIndexRows(docs.filter(!isBatch), idCol, textCol, n, numHashes, bands),
        "bkey", numBuckets = 16)
    }
    // the corpus-wide shingle DF table, persisted NEXT to the
    // signature index (round 13 — closing the scaladoc's documented
    // cap-scoping caveat): the exact-verify cap must be a CORPUS
    // property, identical to q16's, not a property of whatever
    // shingles the day's candidates happen to restrict to. Built once
    // over the index's corpus; maintenance is append-only increment
    // rows (the reader SUMS per shingle), the same extension cycle as
    // the signatures. Retirement deliberately leaves df history: a
    // stop shingle stays stopped (conservative — scores only ever
    // under-count boilerplate overlap), and the shared q134/q146
    // oracles count every document the index has seen.
    val dfName = s"${indexName}__df"
    if (!BucketStore.exists(dfName)) {
      BucketStore.load(spark, dfName,
        shingles(docs.filter(!isBatch), idCol, textCol, n)
          .groupBy(col("shingle")).agg(count(lit(1)).as("df")),
        "shingle", numBuckets = 16)
    }
    val index = spark.read.format("graft-buckets").option("table", indexName).load()
    // batch signatures are batch-sized and consumed twice (vs-index
    // and vs-self) — materialize them ONCE, eagerly, instead of
    // recomputing the shingle+minhash pipeline per consumer
    val batchBanded =
      signatureIndexRows(docs.filter(isBatch), idCol, textCol, n, numHashes, bands)
        .localCheckpoint(true)
    // new-vs-history: equi-join on the LSH bucket key (bkey carries
    // the whole join entropy; band+bsig re-checked exactly), bucket-
    // co-located with the stored index's layout
    val newOld = batchBanded.as("x").join(index.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.band") === col("y.band") &&
          col("x.bsig") === col("y.bsig"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
    // new-vs-new: the batch against itself, standard LSH self-join
    val newNew = batchBanded.as("x").join(batchBanded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    // candidates are near-dup-pair-sized (tiny next to the corpus) and
    // consumed three times below — eager localCheckpoint. NOTE this
    // union mixes a branch carrying the store's simulated host
    // preferences (the index scan) with no-preference branches; in
    // local mode that stage shape starves under delay scheduling
    // unless spark.locality.wait=0 (set by GraftSession/SparkSuite —
    // see GraftSession for the full story).
    val candidates = newOld.union(newNew).distinct().localCheckpoint(true)
    // exact verify over candidate documents only — identical scoring
    // to the one-shot path (shared scoreJaccard), corpus touched via
    // semi-join
    val candIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id"))).distinct()
    // semi-join the RAW docs before shingling — filtering after
    // shingleArrays would shingle the whole corpus first and only then
    // drop non-candidates, making the verify pass ∝ corpus instead of
    // ∝ candidates (measured 30× slower at sf0.1)
    val arrs = shingleArrays(
      docs.join(candIds.withColumnRenamed("id", idCol), Seq(idCol), "left_semi"),
      idCol, textCol, n).cache()
    val sh = arrs.select(col("id"), explode(col("arr")).as("shingle"))
    val sizes = arrs.select(col("id"), size(col("arr")).cast("long").as("n_sh"))
    // CORPUS-scoped cap: total df = stored history df (semi-joined to
    // the candidate shingles FIRST, so the store scan is ∝ candidates
    // — bucket-partitioned on the shingle key at scale) + the batch's
    // own contribution; shingles over the cap are dropped BEFORE
    // intersection counting, exactly like q16's one-shot path. The
    // inner cap in [[intersections]] then never binds more tightly
    // (candidate-scoped df ≤ corpus df ≤ maxDf for every survivor).
    val candShingles = sh.select(col("shingle")).distinct()
    val dfHist = spark.read.format("graft-buckets").option("table", dfName).load()
      .join(candShingles, Seq("shingle"), "left_semi")
      .groupBy(col("shingle")).agg(sum(col("df")).as("df_hist"))
    val dfBatch = shingles(docs.filter(isBatch), idCol, textCol, n)
      .groupBy(col("shingle")).agg(count(lit(1)).as("df_b"))
    val overCap = candShingles
      .join(dfHist, Seq("shingle"), "left")
      .join(dfBatch, Seq("shingle"), "left")
      .filter(coalesce(col("df_hist"), lit(0L)) + coalesce(col("df_b"), lit(0L)) > maxDf)
      .select(col("shingle"))
    val shOk = sh.join(overCap, Seq("shingle"), "left_anti")
    val pairShingles = intersections(shOk, maxDf)
      .join(candidates, Seq("id_a", "id_b"), "left_semi")
    val pairs = scoreJaccard(pairShingles
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b"),
      threshold)
    (pairs, Seq(arrs))
  }

  def incrementalDedupQuery(spark: SparkSession, dir: String): DataFrame =
    incrementalDedupPairs(spark, Tables.documents(spark, dir), "doc_id", "text",
      indexName = s"minhash_idx@$dir", isBatch = col("doc_id") % 10 === 0,
      n = 3, numHashes = 32, bands = 16, threshold = 0.8)

  /** Oracle: the full exact-Jaccard pair set (same CTEs as q16's
    * oracle) restricted to pairs touching the batch — precisely the
    * incremental path's contract.
    */
  val incrementalDedupSql: String = overlapCandidatesCtes +
    """
      |SELECT id_a, id_b,
      |  round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8
      |  AND (id_a % 10 = 0 OR id_b % 10 = 0)""".stripMargin

  // ——— signature-index lifecycle (q146) ———

  /** Delete propagation for the persisted signature index — the
    * maintenance half of the nightly-index story ([[incrementalDedupPairs]]
    * tells the ingest half). Documents later dropped from the corpus
    * (canonicalization losers, quality-gate failures) must stop
    * generating candidates, or the append-only index grows forever
    * and its stale entries manufacture dead candidate pairs for every
    * future batch.
    *
    * Shape: recompute the DROPPED documents' banded signatures (cost
    * ∝ dropped batch — the signature is a pure function of the text,
    * so no reverse id→bucket mapping needs persisting) and MERGE on
    * the index's own bucket key: `ON t.bkey = s.bkey AND t.id = s.id`
    * is an equi-join carrying the bucket key, so at scale it touches
    * only the buckets that actually hold the dropped rows — the
    * store's row-level path (merge-on-read deletion vectors or COW
    * bucket rewrite, whichever the table's dml mode picks). `CALL
    * graft.compact` then folds the accumulated deletion state back to
    * clean bucket arrays, the same maintenance op every MoR table
    * schedules. Per-retire cost ∝ dropped + touched buckets, never
    * ∝ index.
    */
  def retireFromIndex(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      indexName: String, isDropped: Column, n: Int, numHashes: Int, bands: Int): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.bucketed.BucketedCatalog].getName)
    signatureIndexRows(docs.filter(isDropped), idCol, textCol, n, numHashes, bands)
      .createOrReplaceTempView("graft_idx_retire")
    spark.sql(s"MERGE INTO graft.`$indexName` t USING graft_idx_retire s " +
      "ON t.bkey = s.bkey AND t.id = s.id AND t.band = s.band WHEN MATCHED THEN DELETE")
    spark.sql(s"CALL graft.compact('$indexName')").collect()
  }

  /** q146 — the lifecycle gate: build the index WITHOUT the batch,
    * retire the docs `doc_id % 10 = 5` (modeling a canonicalization /
    * quality drop wave), then run the standard incremental dedup of
    * the `% 10 = 0` batch against the retired index. Retired docs
    * must generate ZERO candidates — the oracle is q134's exact
    * restriction with the dropped ids excluded, so a stale index row
    * surviving retirement surfaces as a hash mismatch, not a silent
    * extra pair.
    */
  def indexLifecycleQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.bucketed.BucketStore
    val docs = Tables.documents(spark, dir)
    val name = s"minhash_idx_lc@$dir"
    val isBatch = col("doc_id") % 10 === 0
    val isDropped = col("doc_id") % 10 === 5
    if (!BucketStore.exists(name)) {
      BucketStore.load(spark, name,
        signatureIndexRows(docs.filter(!isBatch), "doc_id", "text", 3, 32, 16),
        "bkey", numBuckets = 16)
      retireFromIndex(spark, docs, "doc_id", "text", name, isDropped, 3, 32, 16)
    }
    incrementalDedupPairs(spark, docs, "doc_id", "text", name, isBatch,
      n = 3, numHashes = 32, bands = 16, threshold = 0.8)
  }

  /** Oracle: q134's exact-Jaccard batch restriction minus pairs
    * touching a retired doc.
    */
  val indexLifecycleSql: String = overlapCandidatesCtes +
    """
      |SELECT id_a, id_b,
      |  round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.8
      |  AND (id_a % 10 = 0 OR id_b % 10 = 0)
      |  AND id_a % 10 <> 5 AND id_b % 10 <> 5""".stripMargin

  // ——— near-dup clustering (connected components) ———

  /** Connected components over a near-dup pair graph: each document
    * gets the MINIMUM doc id of its transitive duplicate cluster as
    * `keep_id` — the canonical-representative decision that turns
    * pairwise similarity into actual drop lists.
    *
    * ALTERNATING STAR ALGORITHM (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14 — the standard
    * MapReduce-era CC used at web scale). Each pass runs two edge
    * rewrites over the symmetric edge table:
    *
    *   - large-star: per vertex u, every STRICTLY LARGER neighbor is
    *     re-pointed at `m(u) = min(u, neighbors(u))` (one groupBy for
    *     m, one equi-join to rewrite). Each undirected edge is handled
    *     by its smaller endpoint's group, so the edge count never
    *     grows.
    *   - small-star: per vertex u, u and all its ≤-neighbors are
    *     re-pointed at the minimum of that set (same groupBy+join
    *     shape over the `dst < src` half).
    *
    * Stars centered at the component minimum are fixed points of both
    * steps, every pass strictly reduces a global potential until
    * stars form (the paper's Theorem 1 — convergence needs no
    * assumption about how ids are laid out along the graph), and the
    * final labels drop out of the star edges: `min(v, neighbors)`.
    *
    * Why this algorithm (round 11): the previous formulation —
    * min-label propagation plus a pointer jump through the previous
    * round's label table — met its O(log d) billing on FRIENDLY id
    * layouts (monotone chains: the 100-chain spec) but degraded
    * toward O(d) rounds on adversarial ones: a 256-link chain with
    * ids permuted by i·97 mod 257 needed >25 rounds, because a label
    * can point at a vertex whose own reach extends BACKWARD into
    * already-covered territory, making the jump a no-op round after
    * round. Invisible at sf0.1 (near-dup clusters have tiny
    * diameters), catastrophic at 100× — each round is a full
    * edge-set shuffle. The star algorithm has no layout-dependent
    * failure mode; the same permuted chain closes in a handful of
    * passes, and DedupSpec pins ≤10 via `maxIters = 10`.
    *
    * Two Spark jobs per pass (one localCheckpoint per phase, cutting
    * lineage): convergence is read from an accumulator filled DURING
    * each phase's materialization — a `chg` column records whether an
    * emitted edge differs from the edge it replaces, aggregated
    * per-distinct-edge, so a pass whose both phases re-emit the edge
    * set unchanged reads 0 and ends the loop with no separate
    * count()/isEmpty job. Accumulator updates in transformations are
    * at-least-once under task retry: a retry can only OVERcount moved
    * edges (worst case one extra no-op pass), never report 0 when an
    * edge moved, so convergence is never missed.
    *
    * `maxIters` bounds a non-converging graph defensively: exceeding
    * it throws rather than looping silently. Fault
    * tolerance: `localCheckpoint` trades recoverability for speed —
    * blocks live on executors only, so an executor loss mid-loop is
    * unrecoverable. That is the right trade in local mode and for
    * short jobs; on a multi-tenant cluster where executor loss is
    * expected, set a checkpoint dir and flip `reliableCheckpoint =
    * true` to use fault-tolerant `checkpoint()` epochs instead.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50,
      reliableCheckpoint: Boolean = false): DataFrame =
    connectedComponentsWithRounds(pairs, maxIters, reliableCheckpoint)._1

  /** [[connectedComponents]] plus the number of label-propagation
    * rounds it ran — exposed so the O(log diameter) claim is
    * spec-pinnable as a NUMBER (DedupSpec's 256-chain test), not
    * inferred from job counts.
    */
  private[graft] def connectedComponentsWithRounds(pairs: DataFrame, maxIters: Int = 50,
      reliableCheckpoint: Boolean = false): (DataFrame, Int) = {
    def cut(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    // symmetrize in ONE pass: a union of two selects over `pairs`
    // would compute the whole upstream pair pipeline twice (Spark does
    // no cross-branch common-subexpression sharing)
    val sym = cut(pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")))
    // the vertex universe is captured BEFORE dropping self-loops so a
    // degenerate self-pair still yields a (v, v) label row
    val vertices = cut(sym.select(col("src").as("id")).distinct())
    // no up-front distinct: duplicate input pairs only re-emit the
    // same edges, which the first pass's per-edge aggregate collapses
    // anyway — a full-edge-set dedup shuffle here would be pure cost
    var edges = sym.where(col("src") =!= col("dst"))
    val sc = pairs.sparkSession.sparkContext
    var changed = true
    var iters = 0
    while (changed) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIters rounds — the pair graph is " +
            "still contracting (astronomically deep chain or a livelocked label cycle, " +
            "which would be a bug); raise maxIters or pre-filter the pair graph")
      iters += 1
      val acc = sc.longAccumulator(s"graft-cc-moved-$iters")
      // nondeterministic so Catalyst neither collapses nor re-evaluates
      // the side-effecting marker
      val mark = udf { chg: Boolean => if (chg) acc.add(1L); chg }.asNondeterministic()
      // (a, b, chg) emissions → symmetric deduped edge table; the mark
      // rides the per-distinct-edge aggregate so dedup still works and
      // the accumulator sees one update per moved edge
      def toEdges(emit: DataFrame): DataFrame =
        cut(emit.where(col("a") =!= col("b"))
          .select(explode(array(
            struct(col("a").as("s"), col("b").as("d"), col("chg")),
            struct(col("b").as("s"), col("a").as("d"), col("chg")))).as("e"))
          .groupBy(col("e.s").as("src"), col("e.d").as("dst"))
          .agg(mark(max(col("e.chg"))).as("live")))
          .select(col("src"), col("dst"))
      // large-star: each undirected edge, handled by its SMALLER
      // endpoint's group, re-points the larger endpoint at that
      // group's neighborhood min
      val lm = edges.groupBy(col("src")).agg(min(col("dst")).as("nmin"))
        .select(col("src"), least(col("src"), col("nmin")).as("m"))
      edges = toEdges(edges.join(lm, "src").where(col("dst") > col("src"))
        .select(col("dst").as("a"), col("m").as("b"), (col("m") =!= col("src")).as("chg")))
      // small-star: each vertex and its ≤-neighbors re-point at their
      // min (each undirected edge handled by its LARGER endpoint)
      val lower = edges.where(col("dst") < col("src"))
      val sm = lower.groupBy(col("src")).agg(min(col("dst")).as("m"))
      edges = toEdges(lower.join(sm, "src")
        .select(col("dst").as("a"), col("m").as("b"), (col("m") =!= col("src")).as("chg"))
        .union(sm.select(col("src").as("a"), col("m").as("b"), lit(false).as("chg"))))
      changed = acc.value > 0
    }
    // final star edges → labels: min(v, neighbors); vertices with no
    // surviving edge (self-paired only) label themselves
    val starMin = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("nmin"))
    val labels = vertices.join(starMin, Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("nmin"), col("id"))).as("keep_id"))
    (labels, iters)
  }

  /** Gated query: cluster the exact-Jaccard near-dup graph (q16's
    * pairs, read from the MATERIALIZED [[pairArtifact]] — round 13's
    * build-once discipline: the CC consumer pays two equi-joins per
    * round over the stored pair table, never the shingle pass) and
    * emit each clustered doc's canonical representative.
    */
  def clusterQuery(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(pairArtifact(spark, dir).select(col("id_a"), col("id_b")))
      .select(col("id").as("doc_id"), col("keep_id"))

  /** Shared oracle fragment: `WITH RECURSIVE` chain from a pair query
    * to `comp(id, keep_id)` — the transitive-closure replica of
    * [[connectedComponents]]. Single definition, used by q65's oracle
    * and recomposed by q66's (so a closure change can't silently
    * diverge between them).
    */
  def closureCtes(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS (
       |$pairsSql
       |),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
       |comp AS (SELECT id, min(r) AS keep_id FROM reach GROUP BY id)""".stripMargin

  /** Oracle: transitive closure of the same pair graph via a recursive
    * CTE, component label = min reachable id.
    */
  val clusterSql: String =
    closureCtes(ngramJaccardSql) + "\nSELECT id AS doc_id, keep_id FROM comp"

  // ——— cluster canonicalization (dedup with representative choice) ———

  /** Canonical representative per near-dup cluster by QUALITY: the
    * n-gram Jaccard pair graph clusters via [[connectedComponents]]
    * (min-id label), then each cluster's canonical member is re-chosen
    * as its highest-quality doc (token count here; any deterministic
    * score works, id tiebreak) — the curation answer to "which copy do
    * we keep", where q65's drop list only said "drop the rest".
    * Singleton docs are their own canonical.
    *
    * Scale: the pair graph + CC are the q65 machinery (posting-list
    * equi-join, log-round label propagation); on top there is ONE
    * window over the 3-column (id, cluster, quality) projection and
    * one equi-join of the |clusters|-row canon table back — payload
    * never moves.
    */
  def canonicalPerCluster(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      quality: org.apache.spark.sql.Column): DataFrame =
    canonicalPerClusterFromPairs(df, idCol,
      ngramJaccardPairs(df, idCol, textCol, n, threshold), quality)

  /** The pair-consuming core of [[canonicalPerCluster]] — takes the
    * near-dup pair table directly so a deployment (and the gated
    * query) can feed the MATERIALIZED artifact instead of rebuilding
    * the candidate machinery per consumer.
    */
  def canonicalPerClusterFromPairs(df: DataFrame, idCol: String,
      pairs: DataFrame,
      quality: org.apache.spark.sql.Column): DataFrame = {
    val comps = connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .withColumnRenamed("id", "__cid")
    // NO cast on the quality expression: truncating a fractional score
    // to long would silently degenerate the ranking to the id tiebreak
    val lab = df.select(col(idCol), quality.as("__q"))
      .join(comps, col(idCol) === col("__cid"), "left")
      .select(col(idCol), coalesce(col("keep_id"), col(idCol)).as("cluster_id"), col("__q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("__q").desc, col(idCol).asc)
    val canon = lab.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("cluster_id"), col(idCol).as("canon_id"))
    lab.join(canon, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("canon_id"),
        (col(idCol) === col("canon_id")).as("kept"))
  }

  def canonicalQuery(spark: SparkSession, dir: String): DataFrame =
    canonicalPerClusterFromPairs(Tables.documents(spark, dir), "doc_id",
      pairArtifact(spark, dir), quality = size(split(col("text"), " ")))

  /** Oracle: q65's recursive-closure clusters, then the same
    * quality-ranked canonical choice in SQL.
    */
  val canonicalSql: String =
    closureCtes(ngramJaccardSql) +
      """,
        |lab AS (
        |  SELECT d.doc_id,
        |         COALESCE(c.keep_id, d.doc_id) AS cluster_id,
        |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS q
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |canon AS (
        |  SELECT cluster_id, doc_id AS canon_id FROM (
        |    SELECT doc_id, cluster_id,
        |           row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rk
        |    FROM lab) r WHERE rk = 1)
        |SELECT l.doc_id, l.cluster_id, cn.canon_id, l.doc_id = cn.canon_id AS kept
        |FROM lab l JOIN canon cn ON l.cluster_id = cn.cluster_id""".stripMargin

  // ——— eval-set decontamination ———

  /** Benchmark decontamination: find corpus documents sharing any
    * word n-gram with a (small) evaluation set — the standard
    * pretraining-hygiene check that keeps test data out of training
    * data. The eval side's distinct shingles BROADCAST (eval suites
    * are ~10⁴-10⁶ n-grams even when the corpus is 100 TB), so the
    * corpus is scanned once, map-side filtered by the broadcast hash
    * join, and only contaminated (doc, shingle) hits reach the
    * per-doc count shuffle.
    */
  def decontamination(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalSh = shingles(evalSet, idCol, textCol, n).select(col("shingle")).distinct()
    shingles(corpus, idCol, textCol, n)
      .join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // shingles() is per-doc distinct already
  }

  /** Gated query: docs with id < 100 stand in for the benchmark; the
    * rest of the corpus is screened against their 5-grams.
    */
  def decontaminationQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontamination(docs.filter(col("doc_id") >= 100), docs.filter(col("doc_id") < 100),
      "doc_id", "text", n = 5)
  }

  val decontaminationSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] AS s
      |  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 4)) AS i FROM w WHERE len(ws) >= 5)),
      |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < 100)
      |SELECT doc_id, count(*) AS n_shared
      |FROM sh JOIN ev USING (s)
      |WHERE doc_id >= 100
      |GROUP BY doc_id""".stripMargin

  // ——— embedding cosine near-dup (LSH-bucketed) ———

  /** Embedding near-dup pairs, the scale path: sign-random-projection
    * LSH buckets generate candidates via an EQUI-join on (band,
    * bucket) — never an all-pairs product — then exact cosine verifies
    * each candidate against the threshold.
    *
    * This replaced a broadcast-nested-loop probe scan whose cost grew
    * O(n²/50): here candidate volume is Σ bucket² per band, bounded by
    * the signature resolution. `bitsPerBand = nbits/bands` is THE
    * scale knob: expected bucket occupancy is n / 2^bitsPerBand, so it
    * must grow with log₂(n) (8 bits suits the gated corpora; a 100 TB
    * corpus wants 16-20 bits and more bands to restore recall —
    * recall per band at cosine s is (1 − arccos(s)/π)^bitsPerBand).
    */
  def cosineLshPairs(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      nbits: Int, bands: Int, seed: Long, threshold: Double): DataFrame = {
    val b = Similarity.lshBuckets(emb, idCol, vecCol, dim, nbits, bands, seed)
      .select(col("id"), col("band"), col("bucket"))
    val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val vecs = emb.select(col(idCol).as("vid"), col(vecCol).as("v"))
    cand
      .join(vecs.withColumnRenamed("vid", "id_a").withColumnRenamed("v", "va"), "id_a")
      .join(vecs.withColumnRenamed("vid", "id_b").withColumnRenamed("v", "vb"), "id_b")
      .withColumn("sim", round(graft.functions.GraftFunctions.cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  def cosinePairsQuery(spark: SparkSession, dir: String): DataFrame =
    cosineLshPairs(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", dim = 64, nbits = 32, bands = 4, seed = 42L, threshold = 0.4)

  /** DuckDB replica of the LSH near-dup pipeline (same construction as
    * [[Similarity.lshKnnSql]]): seed-42 hyperplanes embedded as double
    * literals, sign bits via `list_inner_product` (same index-order
    * accumulation as [[graft.functions.DotProduct]]), 8-bit band
    * buckets via the same fold, candidate equi-join, rounded verify.
    */
  lazy val cosinePairsSql: String = {
    val planes = Similarity.hyperplanes(dim = 64, nbits = 32, seed = 42L)
    val hs = planes.map(h => "[" + h.mkString(", ") + "]").mkString("[", ", ", "]")
    s"""WITH hs AS (SELECT $hs AS planes),
       |bits AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
       |    list_transform(range(32), i ->
       |      CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), planes[CAST(i AS INT) + 1]) >= 0
       |           THEN 1::BIGINT ELSE 0::BIGINT END) AS bits
       |  FROM embeddings, hs),
       |banded AS (
       |  SELECT id, CAST(b.band AS INT) AS band,
       |    list_reduce(list_prepend(0::BIGINT,
       |      bits[CAST(b.band AS INT) * 8 + 1 : CAST(b.band AS INT) * 8 + 8]),
       |      (a, x) -> a * 2 + x) AS bucket
       |  FROM bits, unnest(range(4)) b(band)),
       |cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id)
       |SELECT id_a, id_b, sim FROM (
       |  SELECT id_a, id_b,
       |    round(list_cosine_similarity(a.vec, b.vec), 6) AS sim
       |  FROM cand JOIN bits a ON id_a = a.id JOIN bits b ON id_b = b.id) t
       |WHERE sim >= 0.4""".stripMargin
  }

  // ——— semantic dedup (SemDeDup-style) ———

  /** Semantic dedup à la SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with a coarse quantizer, compare
    * vectors only WITHIN their cluster, and keep one representative
    * per connected group of semantic near-dups. The drop list is every
    * (vec_id, keep_id) with vec_id ≠ keep_id.
    *
    * Composition of three scale-safe pieces, no new shuffle shapes:
    * [[Similarity.ivfAssign]] (map-side argmax over broadcast
    * centroids — no Exchange), a within-cluster pair EQUI-join on
    * `cent_id` (O(Σ cluster²), never all-pairs — cluster count is the
    * scale knob exactly as in the paper, nlist ∝ n), and
    * [[connectedComponents]] (O(diameter) rounds). The returned drop
    * list is what a 100 TB curation job anti-joins against the corpus.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, threshold: Double, kmeansIters: Int = 0): DataFrame = {
    val centroids =
      if (kmeansIters > 0) Similarity.kmeansCentroids(emb, idCol, vecCol, nlist, kmeansIters)
      else Similarity.sampleCentroids(emb, idCol, vecCol, nlist)
    // cached: the self-join below consumes it twice; eagerly dropped
    // after connectedComponents has materialized the edge set
    val assigned = Similarity.ivfAssign(emb, idCol, vecCol, centroids).cache()
    try {
      val pairs = assigned.as("a").join(assigned.as("b"),
          col("a.cent_id") === col("b.cent_id") && col("a.id") < col("b.id"))
        .withColumn("sim",
          round(graft.functions.GraftFunctions.cosine(col("a.vec"), col("b.vec")), 6))
        .filter(col("sim") >= threshold)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      // connectedComponents checkpoints the edge frame eagerly, so the
      // result is independent of `assigned` by the time we return
      connectedComponents(pairs)
        .filter(col("id") =!= col("keep_id"))
        .select(col("id").as("vec_id"), col("keep_id"))
    } finally assigned.unpersist()
  }

  /** Gated query: semantic dedup over the embeddings table (nlist=16
    * centroids refined by one Lloyd step, cosine ≥ 0.3 within-cluster
    * pairs).
    */
  def semDedupQuery(spark: SparkSession, dir: String): DataFrame =
    semDedup(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", nlist = 16, threshold = 0.3, kmeansIters = 1)

  /** Oracle: the same composition in SQL — q33's centroid/argmax CTEs
    * feeding within-cluster pairs, closed under [[closureCtes]]'
    * recursive transitive closure. Assignment ranks on the raw cosine
    * (identical IEEE accumulation order in both engines, as q33
    * proves); only the verify threshold uses the rounded sim.
    */
  val semDedupSql: String = {
    val pairsSql =
      s"""WITH ${Similarity.refinedCentSql},
        |assigned AS (
        |  SELECT id, vec, cent_id FROM (
        |    SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS vec, c.cent_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
        |                 c.cent_id) AS arn
        |    FROM embeddings e CROSS JOIN cent c) t WHERE arn = 1)
        |SELECT a.id AS id_a, b.id AS id_b
        |FROM assigned a JOIN assigned b
        |  ON a.cent_id = b.cent_id AND a.id < b.id
        |WHERE round(list_cosine_similarity(a.vec, b.vec), 6) >= 0.3""".stripMargin
    closureCtes(pairsSql) + "\nSELECT id AS vec_id, keep_id FROM comp WHERE id <> keep_id"
  }

  // ——— cross-document repeated substrings (Lee et al. 2022 style) ———

  /** Repeated-substring detection at segment granularity — the exact
    * substring-dedup signal of "Deduplicating Training Data Makes
    * Language Models Better" (Lee et al., ACL 2022), re-expressed as a
    * Spark plan instead of a suffix array: each document is cut into
    * tumbling `segTokens`-token segments ([[TextAnalysis.chunkDocuments]]
    * with stride = length), a segment is "duplicated" when its exact
    * text occurs in more than one distinct document, and every document
    * reports how much of it is made of such shared spans — the
    * drop/trim signal a curation pipeline thresholds on. Only
    * FULL-length segments are duplicate-eligible: a trailing partial
    * (as short as one token) would otherwise match the trailing
    * remnant of unrelated documents and systematically inflate
    * `dup_frac` — the reason Lee et al. impose a minimum match length.
    * Partials still count in `n_segs`, so the fraction stays a share
    * of the whole document.
    *
    * Scale: two shuffles, both on sparse keys — segments hash-group by
    * their text (at 100 TB, swap the raw text key for the 8-byte
    * [[graft.functions.Fingerprint64]] of it: same plan, ~20× fewer
    * shuffle bytes, and the q24 oracle already proves the fingerprint
    * replicable), then duplicated segments equi-join back and re-group
    * by document with map-side combine. Nothing is ever all-pairs; the
    * suffix array's arbitrary-length matches are traded for fixed
    * segment boundaries, the standard distributed approximation. Like
    * [[TextAnalysis.vocabCoverage]], the corpus is segmented twice
    * (build-shared-set and probe branches can't share a subtree) —
    * two scan-local passes, persist the segment projection at scale
    * if that dominates.
    */
  def dupSegments(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    val segs = TextAnalysis.chunkDocuments(df, idCol, textCol,
      chunkTokens = segTokens, stride = segTokens)
      .select(col(idCol), col("chunk_text"), col("n_tok"))
    val shared = segs.filter(col("n_tok") === segTokens)
      .groupBy(col("chunk_text"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("chunk_text"), lit(1).as("__dup"))
    segs.join(shared, Seq("chunk_text"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(coalesce(col("__dup"), lit(0))).cast("long").as("n_dup_segs"))
      .withColumn("dup_frac", col("n_dup_segs").cast("double") / col("n_segs"))
  }

  def dupSegmentsQuery(spark: SparkSession, dir: String): DataFrame =
    dupSegments(Tables.documents(spark, dir), "doc_id", "text", segTokens = 6)

  /** Oracle: q90's list-slicing segmentation, then the same
    * shared-segment semi-join and per-doc roll-up.
    */
  val dupSegmentsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws,
      |                  len(string_split(text, ' ')) AS n
      |           FROM documents),
      |c AS (SELECT doc_id, ws,
      |        unnest(range(((greatest(n - 6, 0) + 5) // 6) + 1)) AS i
      |      FROM t),
      |segs AS (SELECT doc_id,
      |           array_to_string(ws[CAST(i*6 + 1 AS INT) : CAST(i*6 + 6 AS INT)], ' ') AS seg,
      |           len(ws[CAST(i*6 + 1 AS INT) : CAST(i*6 + 6 AS INT)]) AS seg_len
      |         FROM c),
      |shared AS (SELECT seg, 1 AS dup FROM segs WHERE seg_len = 6
      |           GROUP BY seg HAVING count(DISTINCT doc_id) > 1)
      |SELECT s.doc_id, count(*) AS n_segs,
      |       CAST(sum(COALESCE(sh.dup, 0)) AS BIGINT) AS n_dup_segs,
      |       CAST(sum(COALESCE(sh.dup, 0)) AS DOUBLE) / count(*) AS dup_frac
      |FROM segs s LEFT JOIN shared sh ON s.seg = sh.seg
      |GROUP BY s.doc_id""".stripMargin

  // ——— corpus-level overlap estimation (sketch algebra) ———

  /** q210 — CORPUS-level overlap: how much does the training corpus's
    * shingle set overlap an eval corpus's, as ONE number — the
    * dataset-vs-benchmark contamination RATE that decides whether a
    * source is admissible at all (q74 answers the per-document
    * question; this answers the per-corpus one, and at 100 TB it is
    * the only one you can afford to monitor continuously).
    *
    * The estimator is corpus-level MinHash agreement: each corpus's
    * shingle SET is collapsed to a 64-component signature — component
    * i = min over shingles of splitmixᵢ(hash(shingle)) — by the same
    * [[graft.functions.MinHashAgg]] the per-doc LSH uses, just grouped
    * by corpus instead of doc_id. The buffer is 64 longs regardless of
    * corpus size, partials merge map-side, and signatures of disjoint
    * shards merge by component-min — so a 100 TB corpus's signature
    * costs one scan and 512 bytes, can be maintained incrementally as
    * shards land, and E[agreements/64] = exact Jaccard. The exact
    * intersection/union (one equi-join on the shingle hash) rides
    * along — affordable at gate SF, and the pair of numbers makes the
    * estimator's error auditable in the output itself.
    *
    * Hash chain: Karp-Rabin [[graft.functions.Fingerprint64]] over the
    * 3-word shingle STRING, then murmur [[graft.functions.Mix64]] —
    * the q24/q25 pair chosen because both have exact HUGEINT mod-2^64
    * DuckDB replicas, which is what lets a MinHash SKETCH be
    * hash-gated at all (q17's banding recall argument gates pair
    * OUTPUT, not sketch internals; here the oracle replays splitmix
    * itself and must reproduce every component min bit-for-bit).
    */
  def corpusOverlapQuery(spark: SparkSession, dir: String): DataFrame = {
    val (out, hashes) = corpusOverlapFrame(spark, dir)
    // the cache is load-bearing for the shared-shuffle plan (sketch,
    // counts, and exact intersection all read it once), but the
    // returned frame is lazy, so without an eager materialization
    // there is no release point and every invocation would pin the
    // hash set in executor storage for the session lifetime.
    // localCheckpoint(eager) computes the single output row, then the
    // cache drops — the pairExplainQuery discipline.
    materializeAndRelease(out, hashes)
  }

  /** The LAZY q210 frame plus its load-bearing (corpus, hash) cache —
    * split out so the plan audit can pin the shared-shuffle shape
    * (InMemoryTableScan fan-out) BEFORE [[corpusOverlapQuery]]
    * checkpoints it away. Callers of this variant own the unpersist.
    */
  private[graft] def corpusOverlapFrame(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import graft.functions.{Fingerprint64, GraftFunctions, Mix64}
    val H = 64
    // distinct (corpus, shingle-hash): shared by the sketch AND the
    // exact join — one shuffle on the hash feeds both
    val hashes = Tables.documents(spark, dir)
      .select(when(col("doc_id") % 10 === 0, lit("eval")).otherwise(lit("train")).as("corpus"),
        split(col("text"), " ").as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("corpus"), explode(array_distinct(expr(
        "transform(sequence(0, size(__w) - 3), i -> array_join(slice(__w, i + 1, 3), ' '))")))
        .as("s"))
      .select(col("corpus"), Mix64(Fingerprint64(col("s"))).as("h"))
      .distinct()
      .cache()
    val sig = hashes.groupBy(col("corpus"))
      .agg(GraftFunctions.minhash(col("h"), H).as("sig"))
    val est = sig.filter(col("corpus") === "train").select(col("sig").as("sa"))
      .crossJoin(sig.filter(col("corpus") === "eval").select(col("sig").as("sb")))
      .select(expr(s"aggregate(sequence(0, ${H - 1}), 0L, " +
        "(acc, i) -> acc + IF(sa[i] = sb[i], 1L, 0L))").as("est_matches"))
    val nTrain = hashes.filter(col("corpus") === "train").agg(count(lit(1)).as("n_train"))
    val nEval = hashes.filter(col("corpus") === "eval").agg(count(lit(1)).as("n_eval"))
    val inter = hashes.filter(col("corpus") === "train").select(col("h"))
      .join(hashes.filter(col("corpus") === "eval").select(col("h")), Seq("h"))
      .agg(count(lit(1)).as("n_inter"))
    val out = est.crossJoin(nTrain).crossJoin(nEval).crossJoin(inter)
      .select(lit(H).as("h_funcs"), col("est_matches"),
        expr(s"est_matches * 1000000L div $H").as("est_jacc_micro"),
        col("n_train"), col("n_eval"), col("n_inter"),
        (col("n_train") + col("n_eval") - col("n_inter")).as("n_union"),
        expr("n_inter * 1000000L div (n_train + n_eval - n_inter)").as("exact_jacc_micro"))
    (out, hashes)
  }

  /** DuckDB replica: byte-fold fingerprint → fmix64 (q24/q25 CTEs),
    * splitmix64 per component in HUGEINT (wrapping multiplies split at
    * 2^32 — [[SimHash.mulmodSql]]), min per (corpus, i) under the
    * SIGNED int64 view to match the JVM's signed comparisons.
    */
  /** The q210 oracle's sketch-building CTE chain (corpus split →
    * shingles → fingerprint∘fmix → per-component splitmix mins),
    * shared verbatim by the batch gate (q210) and the streaming twin
    * (q217) so the replica cannot fork. splitmix64 is unrolled as
    * STACKED subqueries — every mulmod/xorshift references a NAMED
    * column from the layer below, so the rendered SQL stays linear
    * instead of exponentially duplicating the chain.
    */
  private def corpusSigCtes(h: Int): String = {
    import SimHash.{mulmodSql, Mod64}
    def xs(e: String, n: Int): String = s"xor(($e), ($e) >> $n)"
    val sigCte =
      s"""sig AS (
         |  SELECT corpus, i,
         |    min(CAST(CASE WHEN z4 > 9223372036854775807::HUGEINT
         |             THEN z4 - $Mod64 ELSE z4 END AS BIGINT)) AS m
         |  FROM (SELECT corpus, i, ${xs("z3", 31)} AS z4 FROM (
         |    SELECT corpus, i, ${mulmodSql(xs("z2", 27), "10723151780598845931")} AS z3 FROM (
         |      SELECT corpus, i, ${mulmodSql(xs("z1", 30), "13787848793156543929")} AS z2 FROM (
         |        SELECT corpus, i, (uh + seed) % $Mod64 AS z1
         |        FROM hs, (SELECT i, ${mulmodSql("CAST(i + 1 AS HUGEINT)", "11400714819323198485")} AS seed
         |                  FROM unnest(range($h)) t(i)) sd) a) b) c) d
         |  GROUP BY 1, 2)""".stripMargin
    s"""w AS (
       |  SELECT CASE WHEN doc_id % 10 = 0 THEN 'eval' ELSE 'train' END AS corpus,
       |         string_split(text, ' ') AS ws
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT DISTINCT corpus, s FROM (
       |    SELECT corpus, unnest(list_transform(range(len(ws) - 2),
       |      i -> array_to_string(ws[i + 1:i + 3], ' '))) AS s FROM w) t),
       |hs AS (
       |  SELECT DISTINCT corpus, ${SimHash.fmixSql(SimHash.byteFoldFpSql("s"))} AS uh
       |  FROM sh),
       |$sigCte""".stripMargin
  }

  val corpusOverlapSql: String = {
    val H = 64
    s"""WITH ${corpusSigCtes(H)},
       |est AS (
       |  SELECT count(*) FILTER (WHERE a.m = b.m) AS est_matches
       |  FROM (SELECT i, m FROM sig WHERE corpus = 'train') a
       |  JOIN (SELECT i, m FROM sig WHERE corpus = 'eval') b USING (i)),
       |cnt AS (
       |  SELECT count(*) FILTER (WHERE corpus = 'train') AS n_train,
       |         count(*) FILTER (WHERE corpus = 'eval') AS n_eval
       |  FROM hs),
       |inter AS (
       |  SELECT count(*) AS n_inter
       |  FROM (SELECT uh FROM hs WHERE corpus = 'train') a
       |  JOIN (SELECT uh FROM hs WHERE corpus = 'eval') b USING (uh))
       |SELECT CAST($H AS INTEGER) AS h_funcs,
       |  CAST(est_matches AS BIGINT) AS est_matches,
       |  CAST(est_matches * 1000000 // $H AS BIGINT) AS est_jacc_micro,
       |  CAST(n_train AS BIGINT) AS n_train, CAST(n_eval AS BIGINT) AS n_eval,
       |  CAST(n_inter AS BIGINT) AS n_inter,
       |  CAST(n_train + n_eval - n_inter AS BIGINT) AS n_union,
       |  CAST(n_inter * 1000000 // (n_train + n_eval - n_inter) AS BIGINT) AS exact_jacc_micro
       |FROM est, cnt, inter""".stripMargin
  }

  /** q217 — the q210 corpus signature as a STREAMING aggregation: the
    * same shingle→fingerprint∘fmix chain feeds `MinHashAgg` grouped by
    * corpus under update mode, and because component-min is idempotent
    * and order-free, the streamed signature is BIT-IDENTICAL to the
    * batch one — no tolerance band, the hash gate compares the sketch
    * internals directly (the q159/q160 streamed-equals-batch family,
    * at exactness instead of a 5% contract). Deployment meaning: the
    * contamination monitor runs ON the ingest stream — signatures stay
    * current as shards land, nothing ever recomputes history. The
    * streamed agg needs no distinct: duplicate shingle hashes cannot
    * move a min, so the state per corpus stays the 64-long buffer.
    */
  def streamCorpusMinhashQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Fingerprint64, GraftFunctions, Mix64}
    import org.apache.spark.sql.types._
    val H = 64
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = spark.readStream.schema(schema).parquet(s"$dir/{documents.parquet}")
    val hashes = docs
      .select(when(col("doc_id") % 10 === 0, lit("eval")).otherwise(lit("train")).as("corpus"),
        split(col("text"), " ").as("__w"))
      .filter(size(col("__w")) >= 3)
      .select(col("corpus"), explode(array_distinct(expr(
        "transform(sequence(0, size(__w) - 3), i -> array_join(slice(__w, i + 1, 3), ' '))")))
        .as("s"))
      .select(col("corpus"), Mix64(Fingerprint64(col("s"))).as("h"))
    val sig = hashes.groupBy(col("corpus")).agg(GraftFunctions.minhash(col("h"), H).as("sig"))
    graft.streaming.StreamOps.runToMemory(sig, "update")
      .select(col("corpus"), posexplode(col("sig")).as(Seq("i", "m")))
  }

  /** Oracle: the SAME CTE chain as q210 — the sketch internals, one
    * row per (corpus, component).
    */
  val streamCorpusMinhashSql: String =
    s"""WITH ${corpusSigCtes(64)}
       |SELECT corpus, CAST(i AS INTEGER) AS i, m FROM sig""".stripMargin
}
