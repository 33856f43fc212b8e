package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** P1-P3 + A1 word-count parity: tokenizer `lower.split("\\W+")` minus
  * empties, grouped counts (reference WordCount.scala:30-33), checked
  * against an independently computed plain-Scala oracle over a
  * public-domain Hamlet fixture (the reference's golden corpus is the
  * same soliloquy).
  */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune",
    "Or to take arms against a sea of troubles,",
    "And by opposing end them?--To die,--to sleep,--",
    "No more; and by a sleep to say we end",
    "The heartache, and the thousand natural shocks",
    "That flesh is heir to,--'tis a consummation",
    "Devoutly to be wish'd. To die,--to sleep;--",
    "To sleep! perchance to dream:--ay, there's the rub;")

  private def expected: Map[String, Long] =
    corpus.flatMap(_.toLowerCase.split("\\W+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("wordCount matches a hand-computed oracle on the Hamlet corpus") {
    val df = corpus.toDF("line")
    val got = TextOps.wordCount(df, col("line"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("tokenize drops empty tokens and lowercases") {
    val toks = TextOps.tokenize(Seq("A--B  c!").toDF("t"), col("t"))
      .as[String].collect().toSeq
    assert(toks === Seq("a", "b", "c"))
  }

  test("q158 LM cross-entropy: common-token doc scores below rare-token doc") {
    // "the" dominates the corpus (low surprisal); doc 2 is one-off
    // rare tokens (each ln(total/1), max surprisal)
    val docs = Seq(
      (0L, "the the the the the the the the"),
      (1L, "the the the cat"),
      (2L, "xqzt vwpl njrd kfgh"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmXent(docs, "doc_id", "text")
      .select("doc_id", "avg_xent_micro", "keep")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L)._1 < got(1L)._1 && got(1L)._1 < got(2L)._1,
      s"surprisal must order all-common < mostly-common < all-rare: $got")
    // exact value check: doc 0 is 8×"the", cnt(the)=11, total=16 →
    // every token's surprisal = round(ln(16/11)·1e6) = 374693
    assert(got(0L)._1 == math.round(math.log(16.0 / 11.0) * 1e6))
    assert(got(0L)._2, "the all-common doc must pass the 8-nat gate")
  }

  test("q159 shape: streamed CMS cells equal the batch sketch (operator-level)") {
    // the gated query pins this against DuckDB at the driver; here the
    // same claim at spec scale via the exposed batch cell table
    val batch = CountMin.sketchCells(
      graft.tables.Tables.documents(spark, sf), "text")
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val streamed = CountMin.streamCmsQuery(spark, sf)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(streamed == batch)
  }

  test("q220 BPE training: hand-computed merges on a planted corpus") {
    // words: "abab"×3, "ab"×2.
    // round 1 pairs: (a,b) = 3·2 + 2·1 = 8; (b,a) = 3·1 = 3 → merge (a,b)
    //   "abab"→[ab,ab], "ab"→[ab]; tokens = 3·2 + 2·1 = 8
    // round 2 pairs: (ab,ab) = 3 → merge → "abab"→[abab]; tokens = 3 + 2 = 5
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("w", "freq")
    val got = TextAnalysis.bpeTrain(wf, rounds = 2)
      .select("rank", "left", "right", "pair_count", "tokens_after")
      .as[(Int, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1, "a", "b", 8L, 8L), (2, "ab", "ab", 3L, 5L)), s"got $got")
  }

  test("q222 BPE segmentations: planted words collapse to single tokens after their merges") {
    val wf = Seq(("abab", 3L), ("ab", 2L), ("ba", 1L)).toDF("w", "freq")
    val segs = TextAnalysis.bpeSegmentations(wf, rounds = 2)
      .as[(String, Long)].collect().toMap
    // round 1 merges (a,b): ab→[ab]; round 2 merges (ab,ab): abab→[abab]
    assert(segs === Map("abab" -> 1L, "ab" -> 1L, "ba" -> 2L), s"got $segs")
  }

  test("q213 tf-idf keywords: 5 ranked terms per source; a corpus-ubiquitous term can never top") {
    val out = TextAnalysis.tfidfKeywordsQuery(spark, sf)
      .select("source", "tok", "tf", "df", "score_micro", "rn")
      .as[(String, String, Long, Long, Long, Int)].collect()
    val bySrc = out.groupBy(_._1)
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    bySrc.values.foreach { rows =>
      assert(rows.length === 5)
      val sorted = rows.sortBy(_._6)
      assert(sorted.map(_._5).toSeq === sorted.map(_._5).sortBy(-_).toSeq,
        "score must be descending in rank")
      // a term present in EVERY document has idf = ln(1) = 0 — it can
      // never outrank a discriminative term regardless of tf
      assert(!rows.exists(r => r._4 === nDocs && r._5 > 0L))
    }
  }

  test("q240 zipf audit: a planted Zipfian corpus reads near slope -1, a uniform one near 0") {
    def slopeOf(text: String): Double = {
      val dirTmp = java.nio.file.Files.createTempDirectory("zipf").toString
      Seq((1L, text)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dirTmp/documents.parquet")
      val r = TextAnalysis.zipfAuditQuery(spark, dirTmp).head()
      r.getAs[Long]("slope_num").toDouble / r.getAs[Long]("slope_den")
    }
    // token i appears floor(600/i) times, i = 1..40 — frequency ∝ 1/rank
    val zipfian = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"t$i")).mkString(" ")
    val sZipf = slopeOf(zipfian)
    assert(sZipf < -0.85 && sZipf > -1.15, s"Zipfian corpus should fit ~-1, got $sZipf")
    // every token equally frequent — slope ~0
    val uniform = (1 to 40).flatMap(i => Seq.fill(15)(s"u$i")).mkString(" ")
    val sUni = slopeOf(uniform)
    assert(math.abs(sUni) < 0.05, s"uniform corpus should fit ~0, got $sUni")
  }

  test("q236 label agreement: hand-checked kappa identities on the gate corpus") {
    val rows = TextAnalysis.labelAgreementQuery(spark, sf)
      .select("source", "n", "n11", "n10", "n01", "n00",
        "po_micro", "pe_micro", "kappa_num", "kappa_den", "kappa_micro")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, n11, n10, n01, n00, po, pe, kn, kd, km) =>
      assert(n === n11 + n10 + n01 + n00, s"$src: cells must partition n")
      // the identities the fixed-point columns encode
      assert(po === 1000000L * (n11 + n00) / n)
      val chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
      assert(pe === 1000000L * chance / (n * n))
      assert(kn === n * (n11 + n00) - chance)
      assert(kd === n * n - chance)
      assert(km === 1000000L * kn / kd)
      // kappa ≤ 1 always; these LFs are positively associated on the
      // gate corpus, and non-negativity also shields the one engine
      // divergence the rational form exists to avoid (trunc vs floor
      // integer division of a NEGATIVE numerator)
      assert(kn <= kd && kn >= 0, s"$src: kappa out of expected range: $kn/$kd")
    }
    // the statistic discriminates: not every source agrees perfectly
    assert(rows.exists(_._11 < 1000000L), "some source should disagree somewhere")
  }

  test("q236 label agreement: kappa catches prevalence-inflated agreement (the statistic's point)") {
    // 90% of rows are (1,1) by prevalence; the rest anti-agree: po is
    // high but kappa must be near zero/negative-side-of-po — computed
    // here directly from the operator's cells on a planted frame
    val planted = ((1 to 90).map(i => (s"d$i", "s", "xx " * 70 + "tail")) ++  // 214 chars, 71 tokens → (1,1)
      (91 to 95).map(i => (s"d$i", "s", ("y " * 60).trim)) ++                // >=40 toks, <200 chars? "y "*60=120 chars → (0,1)
      (96 to 100).map(i => (s"d$i", "s", "z" * 250))                          // >=200 chars, 1 token → (1,0)
      ).toDF("doc_id", "source", "text")
    // run the same labeling projection the operator uses
    val d = planted.select(col("source"),
      (org.apache.spark.sql.functions.length(col("text")) >= 200).cast("int").as("a"),
      (org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")) >= 40).cast("int").as("b"))
    val cells = d.groupBy("source").agg(
      org.apache.spark.sql.functions.count(col("a")).as("n"),
      org.apache.spark.sql.functions.sum((col("a") === 1 && col("b") === 1).cast("long")).as("n11"),
      org.apache.spark.sql.functions.sum((col("a") === 1 && col("b") === 0).cast("long")).as("n10"),
      org.apache.spark.sql.functions.sum((col("a") === 0 && col("b") === 1).cast("long")).as("n01"),
      org.apache.spark.sql.functions.sum((col("a") === 0 && col("b") === 0).cast("long")).as("n00"))
      .head()
    val (n, n11, n10, n01, n00) =
      (cells.getLong(1), cells.getLong(2), cells.getLong(3), cells.getLong(4), cells.getLong(5))
    assert(n === 100L && n11 === 90L && n10 === 5L && n01 === 5L && n00 === 0L)
    val chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val kappa = (n * (n11 + n00) - chance).toDouble / (n * n - chance)
    val po = (n11 + n00).toDouble / n
    assert(po === 0.9, "raw agreement looks excellent")
    assert(kappa < 0.0, s"kappa must expose prevalence-only agreement, got $kappa")
  }
}
