package graft.operators

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("an inverted interval (end <= start) matches nothing instead of exploding buckets") {
    import spark.implicits._
    val points = Seq((1L, 500L)).toDF("key", "ts_us")
    // end far BELOW start: a descending sequence would materialize a
    // huge bucket array; the guard filters the row instead
    val intervals = Seq((1L, 1700000000000000000L, 0L, "bad"),
      (1L, 400L, 600L, "good")).toDF("key", "start_us", "end_us", "tag")
    val got = graft.operators.RangeJoin.pointInInterval(points, intervals, bucketUs = 1000L)
      .select("tag").as[String].collect()
    assert(got.toSeq === Seq("good"))
  }

  test("bucketed point-in-interval equals the naive inequality join, incl. bucket edges") {
    // intervals of length 100 over bucket size 100 → spans crossing
    // bucket boundaries, points exactly at start (match) and end (no
    // match, end-exclusive)
    val points = Seq(
      (1L, 100L, "pA"), (1L, 199L, "pB"), (1L, 200L, "pC"),
      (1L, 250L, "pD"), (2L, 150L, "pE")).toDF("key", "ts_us", "pid")
    val intervals = Seq(
      (1L, 100L, 200L, "i1"), // covers pA (start-inclusive), pB; NOT pC (end-exclusive)
      (1L, 150L, 260L, "i2"), // crosses bucket edge: covers pB, pC, pD
      (2L, 200L, 300L, "i3")). // pE before start → no match
      toDF("key", "start_us", "end_us", "iid")
    val got = RangeJoin.pointInInterval(points, intervals, bucketUs = 100L)
      .select("pid", "iid").as[(String, String)].collect().toSet
    assert(got === Set(
      ("pA", "i1"), ("pB", "i1"), ("pB", "i2"), ("pC", "i2"), ("pD", "i2")))
  }

  test("interval overlap: multi-bucket pairs match ONCE; half-open endpoints; exact durations") {
    import spark.implicits._
    val a = Seq(
      (1L, 10L, 0L, 500L),    // spans 5 buckets
      (1L, 11L, 600L, 700L),  // touches b21 at its end — half-open, no match
      (2L, 12L, 0L, 100L))    // other key
      .toDF("key", "a_id", "a_start", "a_end")
    val b = Seq(
      (1L, 20L, 250L, 450L),  // overlaps a10 across 3 shared buckets → once, 200us
      (1L, 21L, 500L, 600L),  // a10 ends AT 500, a11 starts AT 600 → neither matches
      (2L, 22L, 50L, 150L))   // cross-key overlap 50us
      .toDF("key", "b_id", "b_start", "b_end")
    val got = RangeJoin.intervalOverlap(a, b, bucketUs = 100L)
      .select("a_id", "b_id", "overlap_us").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 20L, 200L), (12L, 22L, 50L)), s"got $got")
  }
}
