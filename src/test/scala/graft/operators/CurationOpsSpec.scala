package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-3 pipeline operators: denylist scrubbing, eval-set
  * decontamination, repetition scoring, deterministic stratified
  * sampling, sequence packing.
  */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  test("scrub redacts every denylisted token and counts hits") {
    val docs = Seq(
      (1L, "the customer gave the user a key"),
      (2L, "no sensitive words here"),
      (3L, "keyboard is not a key word boundary test key")).toDF("doc_id", "text")
    val got = TextAnalysis.scrub(docs, "doc_id", "text")
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 2L)) // "keyboard" untouched (\b)
    // scrubbed hash must differ from the raw hash exactly when hits > 0
    val raw = docs.select(col("doc_id"), md5(col("text")).as("m")).as[(Long, String)].collect().toMap
    val scrubbed = TextAnalysis.scrub(docs, "doc_id", "text")
      .select("doc_id", "scrub_md5").as[(Long, String)].collect().toMap
    assert(scrubbed(2L) === raw(2L))
    assert(scrubbed(1L) !== raw(1L))
    assert(scrubbed(3L) !== raw(3L))
  }

  test("decontamination flags docs overlapping the eval set, counts distinct shared n-grams") {
    val evalSet = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "x alpha beta gamma delta epsilon y"), // shares 5-grams with eval
      (101L, "completely different words entirely here now"),
      (102L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text") // exact eval copy
    val got = Dedup.decontamination(corpus, evalSet, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(100L -> 1L, 102L -> 1L)) // 101 clean, absent
  }

  test("repetition ratio: alternating text scores 0.5, all-distinct scores 0") {
    val docs = Seq(
      (1L, "a b a b a b"), // 3-grams: aba,bab,aba,bab -> 4 total, 2 distinct
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "rep_ratio").as[(Long, Int, Double)].collect().toSet
    assert(got === Set((1L, 4, 0.5), (2L, 4, 0.0)))
  }

  test("shard manifest: digest is content-sensitive (drop/dup/mutation flip it) and count-checked") {
    def manifest(rows: Seq[(Long, String)]): Map[Int, (Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
      rows.map { case (id, t) => (id, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Pipelines.shardManifestQuery(spark, dir)
        .select("shard", "n_docs", "content_digest")
        .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    }
    val base = (1L to 64L).map(i => (i, s"document number $i body"))
    val m0 = manifest(base)
    assert(m0.values.map(_._1).sum === 64L)
    // re-export in a different order: digests identical (XOR commutes)
    assert(manifest(scala.util.Random.shuffle(base)) === m0)
    // drop one row: that shard's digest AND count flip
    val dropped = manifest(base.filterNot(_._1 == 7L))
    assert(dropped !== m0)
    // mutate one body: count unchanged, digest flips
    val mutated = manifest(base.map { case (i, t) => (i, if (i == 9L) t + "!" else t) })
    assert(mutated.values.map(_._1).sum === 64L)
    assert(mutated !== m0)
    // duplicating a row XORs its fingerprint twice — the digest alone
    // returns to baseline, which is exactly why the manifest carries
    // the COUNT next to it
    val duped = manifest(base :+ (11L, "document number 11 body"))
    assert(duped.values.map(_._1).sum === 65L, "the count must expose a duplicated row")
  }

  test("weighted PPS sample: priorities match the hand formula; weight dominates hash luck in aggregate") {
    // independent replay of the priority formula: (w << 40) div (h+1)
    // with the Lehmer hash h = ((id mod M)·48271 mod M)·48271 mod M
    val M = 2147483647L
    def lehmer(id: Long) = ((id % M) * 48271 % M) * 48271 % M
    def prio(id: Long, w: Long) = (w * (1L << 40)) / (lehmer(id) + 1L)
    // uniform weights: reduces to the inverse-hash order
    val docs = (1L to 400L).map(i => (i, "en", if (i <= 200) 10000L else 10L))
    val dir = java.nio.file.Files.createTempDirectory("graft-pps").toString
    docs.toDF("doc_id", "lang", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipelines.weightedSampleQuery(spark, dir)
      .select("doc_id", "priority", "rn").as[(Long, Long, Int)].collect().sortBy(_._3)
    // exact priorities per the formula, ranked descending
    got.foreach { case (id, p, _) =>
      val w = if (id <= 200) 10000L else 10L
      assert(p === prio(id, w), s"priority mismatch for doc $id")
    }
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq, "rank order must follow priority desc")
    // PPS property: the 1000×-heavier half should dominate the sample
    val heavy = got.count(_._1 <= 200)
    assert(heavy >= 18, s"heavy docs won only $heavy of 20 slots — weight must dominate")
  }

  test("stratified sample: rate 1 keeps all, rate 0 drops all, and selection is reproducible") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val all = Pipelines.stratifiedSample(df, "doc_id", "lang", Map("en" -> 1.0), 1.0).count()
    assert(all === 1000L)
    val none = Pipelines.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.0), 1.0)
    assert(none.filter(col("lang") === "en").count() === 0L)
    assert(none.filter(col("lang") === "de").count() === 500L)
    val s1 = Pipelines.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.3), 0.7)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Pipelines.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.3), 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2) // no RNG state: the sample is a pure function of ids
    // the multiplicative hash should land near the configured rates
    val enRate = s1.count(_ % 2 == 0) / 500.0
    assert(enRate > 0.2 && enRate < 0.4, s"en sampled at $enRate, expected ~0.3")
  }

  test("stratified sample survives ids past the 32-bit overflow regime") {
    // ids >= ~3.5e9 overflowed the old mod-2^32 multiply under ANSI
    // mode; the Lehmer hash must sample them without error and
    // deterministically
    val big = Seq(3500000000L, 4294967296L, Long.MaxValue - 1, Long.MaxValue / 2)
      .map((_, "en")).toDF("doc_id", "lang")
    val s1 = Pipelines.stratifiedSample(big, "doc_id", "lang", Map("en" -> 0.5), 0.5)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Pipelines.stratifiedSample(big, "doc_id", "lang", Map("en" -> 0.5), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 === s2) // no exception, reproducible
    assert(Pipelines.stratifiedSample(big, "doc_id", "lang", Map("en" -> 1.0), 1.0).count() === 4L)
  }

  test("sequence packing: docs chunk by exclusive cumulative tokens per source") {
    val docs = Seq(
      (1L, "s1", "a b c"),          // 3 tokens, cum_before 0 -> pack 0
      (2L, "s1", "d e f g"),        // cum_before 3 -> pack 0
      (3L, "s1", "h i"),            // cum_before 7 -> pack 1
      (4L, "s1", "j"),              // cum_before 9 -> pack 1
      (10L, "s2", "k l m n o")).toDF("doc_id", "source", "text") // own group -> pack 0
    val got = Pipelines.sequencePack(docs, "doc_id", "source", "text", windowTokens = 5)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 10L -> 0L))
  }

  test("domain mix: over-budget domains clip, under-budget keep all, sample reproducible") {
    // two domains, 10 docs × 10 tokens each = 100 tokens per domain
    val docs = (1 to 10).map(i => (i.toLong, "big", ("t " * 9).trim + " x")) ++
      (101 to 110).map(i => (i.toLong, "small", ("t " * 9).trim + " x"))
    val df = docs.toDF("doc_id", "source", "text")
    def mix(budget: Long) = Pipelines.domainMix(df, "doc_id", "source",
      size(split(col("text"), " ")), Map("big" -> 0.25), defaultWeight = 1.0,
      budgetTokens = budget)
    // budget 200: big's target 50 < 100 → clips; small's 200 > 100 → r=1
    val kept = mix(200L).groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 10L, "under-budget domain must keep everything")
    assert(kept.getOrElse("big", 0L) < 10L, "over-budget domain must clip")
    // reproducible: the deterministic hash keeps the same docs
    val ids1 = mix(200L).select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = mix(200L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
    // inclusion-monotone in the budget: a bigger budget never drops a doc
    val idsBigger = mix(300L).select("doc_id").as[Long].collect().toSet
    assert(ids1.toSet.subsetOf(idsBigger))
  }

  test("per-group sample: exact k, reproducible, and nested under growing k") {
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 3}")).toDF("doc_id", "lang")
    val s5 = Pipelines.samplePerGroup(df, "doc_id", "lang", k = 5)
    val byGroup = s5.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byGroup === Map("g0" -> 5L, "g1" -> 5L, "g2" -> 5L))
    val ids1 = s5.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Pipelines.samplePerGroup(df, "doc_id", "lang", k = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2, "hash order must be engine-deterministic")
    // nested: the k=2 sample is a subset of the k=5 sample
    val ids2of5 = Pipelines.samplePerGroup(df, "doc_id", "lang", k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(ids2of5.subsetOf(ids1.toSet))
    // groups smaller than k are kept whole, not padded
    val tiny = Seq((1L, "solo")).toDF("doc_id", "lang")
    assert(Pipelines.samplePerGroup(tiny, "doc_id", "lang", k = 5).count() === 1L)
  }

  test("domain upsample: over-budget domain clips, under-budget domain repeats whole epochs") {
    val df = ((1 to 10).map(i => (i.toLong, "big", "a b c d e f g h i j")) ++
      (11 to 20).map(i => (i.toLong, "small", "a b c d e f g h i j")))
      .toDF("doc_id", "source", "text")
    // budget 200, weights 0.25/0.75: big targets 50 of its 100 tokens
    // (down-sample), small targets 150 of its 100 (r = 1.5 → epochs).
    val up = Pipelines.domainUpsample(df, "doc_id", "source",
      size(split(col("text"), " ")), Map("big" -> 0.25, "small" -> 0.75),
      defaultWeight = 0.0, budgetTokens = 200L)
    val rows = up.select("doc_id", "source", "epoch").as[(Long, String, Long)].collect()
    val bySource = rows.groupBy(_._2)
    assert(bySource("big").length < 10, "r<1 domain must clip rows")
    assert(bySource("big").forall(_._3 == 0L), "clipped domain never repeats")
    // every small doc appears at epoch 0 (floor(1.5) = 1 full copy) and
    // the hash-fraction remainder adds epoch-1 copies for some subset
    val smallE0 = bySource("small").filter(_._3 == 0L).map(_._1).toSet
    assert(smallE0 === (11L to 20L).toSet)
    val smallE1 = bySource("small").filter(_._3 == 1L).map(_._1).toSet
    assert(smallE1.nonEmpty && smallE1.size < 10, "remainder must be a strict hash-fraction")
    // deterministic across runs
    val again = Pipelines.domainUpsample(df, "doc_id", "source",
      size(split(col("text"), " ")), Map("big" -> 0.25, "small" -> 0.75),
      defaultWeight = 0.0, budgetTokens = 200L)
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect()
    assert(rows.sortBy(r => (r._1, r._3)).toSeq === again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("vocab coverage: in-vocabulary docs score 1.0, OOV tokens lower the exact ratio") {
    // vocabSize=2 over a corpus where "a" and "b" dominate
    val df = Seq(
      (1L, "a b a b"),         // fully in-vocab
      (2L, "a b zebra"),       // 2 of 3
      (3L, "zebra quux corge") // rare tokens only
    ).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "doc_id", "text", vocabSize = 2)
      .select("doc_id", "n_tokens", "n_in_vocab", "coverage")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((4L, 4L, 1.0)))
    assert(got(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) === ((3L, 0L, 0.0)))
  }

  test("gopher rules: each rule flags its own violation, breakdown explains the verdict") {
    val goodText = ("the quick brown animals jumped over many lazy dogs and " * 8).trim
    val docs = Seq(
      (1L, goodText),                                     // passes all
      (2L, "the of short"),                               // too few tokens
      (3L, Seq.fill(60)("a").mkString(" ")),              // mean len 1 < 3
      (4L, ("the of " + Seq.fill(60)("#word#").mkString(" ")).trim), // symbol-heavy
      (5L, Seq.fill(60)("zebra").mkString(" "))           // no stopword evidence
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "ok_token_count", "ok_mean_len", "ok_symbols", "ok_stopwords", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._6, s"the good doc must pass: ${got(1L)}")
    assert(!got(2L)._2 && !got(2L)._6)
    assert(!got(3L)._3 && !got(3L)._6)
    assert(!got(4L)._4 && !got(4L)._6)
    assert(!got(5L)._5 && !got(5L)._6)
  }

  test("shard assignment: deterministic, dense per-shard positions, full coverage") {
    val df = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
    val a = Pipelines.shardAssign(df, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(a.length === 1000)
    assert(a.map(_._1).toSet === (1L to 1000L).toSet, "every doc gets exactly one slot")
    assert(a.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are dense 0..k-1 within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // shards are reasonably balanced (hash, 1000 rows over 4 shards)
    assert(a.groupBy(_._2).values.map(_.length).forall(n => n > 150 && n < 350))
    // byte-identical on rerun — the reproducible-training-order contract
    val b = Pipelines.shardAssign(df, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
  }

  test("domain mix plan: corpus is never shuffled — ratios broadcast back") {
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 4}", "a b c d")).toDF("doc_id", "source", "text")
    val mixed = Pipelines.domainMix(df, "doc_id", "source",
      size(split(col("text"), " ")), Map.empty, defaultWeight = 0.5, budgetTokens = 100L)
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"ratios must broadcast:\n${plan.take(800)}")
    // the only Exchange feeds the |domains| aggregate, and it moves
    // partial rows, not the corpus: no hashpartitioning on doc_id
    assert(!plan.contains("hashpartitioning(doc_id"), plan.take(1200))
  }

  test("leakage-safe split: near-dup clusters never straddle splits, every doc assigned, rerun-identical") {
    import graft.operators.{Dedup, Pipelines}
    // planted: {1,2,3} one near-dup cluster, {10,11} another, 20/21
    // singletons — 60 extra unique docs give the hash room to use all
    // three splits
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = (Seq(
      (1L, base), (2L, base.replace("w20", "zz")), (3L, base),
      (10L, (100 to 140).map(i => s"v$i").mkString(" ")),
      (11L, (100 to 140).map(i => s"v$i").mkString(" ") + " tail"),
      (20L, (200 to 230).map(i => s"a$i").mkString(" ")),
      (21L, (300 to 330).map(i => s"b$i").mkString(" "))) ++
      (100L to 159L).map(i => (i, (i * 50 to i * 50 + 30).map(j => s"u$j").mkString(" "))))
      .toDF("doc_id", "text")
    val got = Pipelines.leakageSafeSplit(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length === 67, "every document gets exactly one split row")
    val byDoc = got.map(r => r._1 -> r._3).toMap
    // THE property: all members of a cluster share one split
    assert(Set(byDoc(1L), byDoc(2L), byDoc(3L)).size === 1, "cluster {1,2,3} straddles splits")
    assert(byDoc(10L) === byDoc(11L), "cluster {10,11} straddles splits")
    // cluster ids are the CC representative (min id), singletons themselves
    val byDocCluster = got.map(r => r._1 -> r._2).toMap
    assert(byDocCluster(2L) === 1L && byDocCluster(3L) === 1L && byDocCluster(11L) === 10L)
    assert(byDocCluster(20L) === 20L && byDocCluster(21L) === 21L)
    // all three splits are populated on this corpus, and a rerun is
    // byte-identical (pure function of the data)
    assert(got.map(_._3).toSet === Set("train", "val", "test"))
    val rerun = Pipelines.leakageSafeSplit(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rerun.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("q194 profiler counts nulls and bounds a null-bearing column correctly") {
    // the gated orders table has zero nulls, so the null path needs
    // its own fixture: nulls must count, be excluded from distinct,
    // and not poison min/max
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, null), (3L, "c"), (null, "c"), (5L, null))
      .toDF("o_custkey", "o_orderstatus")
      .withColumn("o_orderpriority", lit("P"))
      .withColumn("o_totalprice", when(col("o_custkey").isNull, lit(null)
        .cast("double")).otherwise(col("o_custkey").cast("double") * 1.5))
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = Pipelines.profileQuery(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(rows("o_custkey") == ((5L, 1L, 4L, "1", "5")))
    assert(rows("o_orderstatus") == ((5L, 2L, 2L, "a", "c")))
    // 1.5 * {1,2,3,5} in 1e-4 units → lo 15000, hi 75000; 1 null
    assert(rows("o_totalprice") == ((5L, 1L, 4L, "15000", "75000")))
  }

  test("q229 reshard stability: rendezvous moves only to new shards and far less than mod") {
    val r = Pipelines.reshardStabilityQuery(spark, sf).collect().head
    val (n, modPpm, hrwPpm, illegal) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("mod_moved_ppm"), r.getAs[Long]("hrw_moved_ppm"),
      r.getAs[Long]("hrw_illegal_moves"))
    assert(n > 0)
    // THE rendezvous guarantee: scaling 8→10 can move a doc only TO a
    // new shard — a single illegal move means the argmax is broken
    assert(illegal === 0L, s"HRW moved $illegal docs to an old shard")
    // theory: HRW moves ≈ 2/10 of docs; mod moves ~4/5. Loose bands
    // absorb the fixed corpus's sampling noise
    assert(hrwPpm > 50000 && hrwPpm < 350000, s"HRW move rate $hrwPpm implausible")
    assert(modPpm > 600000, s"mod move rate $modPpm implausibly low")
    assert(hrwPpm * 2 < modPpm, "HRW must beat mod by a wide margin")
  }
}
