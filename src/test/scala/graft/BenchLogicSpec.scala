package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench prior contract (round-7 verdict's last credibility gap):
  * BENCH_local.json holds quiet-machine minima; a noisy run must never
  * raise an entry, and outlier re-rep selection must catch both the
  * worst-ratio AND the worst-absolute phantoms.
  */
class BenchLogicSpec extends AnyFunSuite {

  test("mergePrior: a noisy run cannot raise any prior entry") {
    val prior = Map("q01_a" -> 0.30, "q17_lsh" -> 2.05, "q90_x" -> 0.10)
    val noisy = Seq("q01_a" -> 0.95, "q17_lsh" -> 6.50, "q90_x" -> 0.08)
    val merged = Bench.mergePrior(prior, noisy)
    assert(merged("q01_a") === 0.30) // noisy reading ignored
    assert(merged("q17_lsh") === 2.05) // round 7's exact poisoning, now impossible
    assert(merged("q90_x") === 0.08) // faster reading DOES lower the minimum
    merged.foreach { case (n, v) => assert(v <= prior(n)) }
  }

  test("mergePrior: new queries enter, failed keep prior, unregistered drop") {
    val prior = Map("q01_a" -> 0.30, "q99_gone" -> 0.50, "q17_lsh" -> 2.05)
    val run = Seq("q01_a" -> 0.40, "q108_new" -> 1.20, "q17_lsh" -> -1.0)
    val merged = Bench.mergePrior(prior, run)
    assert(merged === Map("q01_a" -> 0.30, "q108_new" -> 1.20, "q17_lsh" -> 2.05))
  }

  test("selectOutliers: worst-by-absolute survives a cap filled by ratio blips") {
    val prior = (1 to 12).map(i => f"q$i%02d_r" -> 0.10).toMap +
      ("q17_lsh" -> 2.05)
    // 12 small ratio-5 blips (+0.4s each) compete for a cap of 10 with
    // q17's +4.45s phantom at ratio ~3.2 — round 7's selector dropped
    // q17; the union selector must keep it.
    val results = (1 to 12).map(i => f"q$i%02d_r" -> 0.50) :+ ("q17_lsh" -> 6.50)
    val picked = Bench.selectOutliers(results, prior, cap = 10).map(_._1)
    assert(picked.contains("q17_lsh"))
    assert(picked.size <= 20 && picked.distinct.size === picked.size)
  }

  test("selectOutliers: thresholds — needs BOTH >1.5x and >0.3s excess") {
    val prior = Map("qa_r" -> 1.00, "qb_r" -> 0.10, "qc_r" -> 5.00, "qd_r" -> 1.00)
    val results = Seq(
      "qa_r" -> 1.45, // 1.45x, +0.45s — ratio below 1.5 → not flagged
      "qb_r" -> 0.35, // 3.5x, +0.25s — below absolute floor → not flagged
      "qc_r" -> 8.00, // 1.6x, +3.0s — flagged
      "qd_r" -> -1.0) // failed — never flagged
    assert(Bench.selectOutliers(results, prior).map(_._1) === Seq("qc_r"))
  }

  test("selectOutliers: the standing watchlist re-reps even when quiet (round-12 task 7)") {
    val prior = Map("q169_store_bm25" -> 0.80, "q34_session_windows" -> 0.40, "qa_r" -> 1.0)
    val results = Seq(
      "q169_store_bm25" -> 0.82,    // quiet — watchlist keeps it anyway
      "q34_session_windows" -> 0.41,
      "qa_r" -> 1.05)               // quiet, not watched → dropped
    val picked = Bench.selectOutliers(results, prior).map(_._1)
    assert(picked.toSet === Set("q169_store_bm25", "q34_session_windows"))
    // a failed watched query is not re-repped (nothing to measure)
    val failed = Seq("q169_store_bm25" -> -1.0, "q34_session_windows" -> 0.41)
    assert(Bench.selectOutliers(failed, prior).map(_._1) === Seq("q34_session_windows"))
  }

  test("parsePrior: reads only the queries object, not run/rerep echoes") {
    val txt = """{"metric":"total","value":3.1,"unit":"sec","cpus":32,"failed":[],""" +
      """"queries":{"q01_a":0.30,"q17_lsh": 2.05},""" +
      """"run_value":9.9,"run":{"q01_a":0.95,"q17_lsh":6.50},""" +
      """"rerep":{"q17_lsh":{"suite":6.50,"rerun":1.97}},"sf":"x"}"""
    assert(Bench.parsePrior(txt) === Map("q01_a" -> 0.30, "q17_lsh" -> 2.05))
  }

  test("parsePrior: legacy flat format and pretty-printed separators still parse") {
    val legacy = """{"metric":"total","queries":{"q01_a": 0.30,
      "q02_b":  1.5}, "sf":"x"}"""
    assert(Bench.parsePrior(legacy) === Map("q01_a" -> 0.30, "q02_b" -> 1.5))
  }
}
