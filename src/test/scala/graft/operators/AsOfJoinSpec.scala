package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf matches the most recent right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (1L, ts("2024-01-01 09:00:00"), "e0"), // before any right row
      (2L, ts("2024-01-01 11:00:00"), "e3")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:30:00"), 200L),
      (2L, ts("2024-01-01 11:00:00"), 300L)). // exact tie: matches (>= semantics)
      toDF("k", "t", "pid")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ev"), Seq("pid"))
      .select("ev", "pid").as[(String, Option[Long])].collect().toMap
    assert(got === Map(
      "e0" -> None,        // no prior right row
      "e1" -> Some(100L),  // 09:30 is latest <= 10:00
      "e2" -> Some(200L),  // 11:30 is latest <= 12:00
      "e3" -> Some(300L))) // equal timestamp matches
  }

  test("null right payloads survive and never mix fields across right rows") {
    // The newest right row has pid=NULL: the match must carry that row's
    // (NULL, "new") as a unit — not pid from the older row + tag from the
    // newer one, which per-column carrying would produce.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100L), "old"),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Long], "new"))
      .toDF("k", "t", "pid", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ev"), Seq("pid", "tag"))
      .select("pid", "tag").as[(Option[Long], String)].head()
    assert(got === (None, "new"))
  }

  test("right-side ts ties carry the max tie-break row, deterministically") {
    // two purchases at the identical (key, ts): without a tie-break the
    // carried payload is engine-chosen; with tieBreak the max pid row
    // (whole struct: pid AND its value) wins.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 7L, "seven"),
      (1L, ts("2024-01-01 11:00:00"), 9L, "nine"),
      (1L, ts("2024-01-01 11:00:00"), 8L, "eight")).toDF("k", "t", "pid", "tag")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ev"), Seq("pid", "tag"),
      tieBreak = Seq("pid"))
      .select("pid", "tag").as[(Long, String)].head()
    assert(got === ((9L, "nine")))

    // same contract through the self-join path
    val src = Seq(
      (1L, ts("2024-01-01 11:00:00"), "p", 7L, "seven"),
      (1L, ts("2024-01-01 11:00:00"), "p", 9L, "nine"),
      (1L, ts("2024-01-01 12:00:00"), "click", 0L, "")).toDF("k", "t", "kind", "pid", "tag")
    import org.apache.spark.sql.functions.col
    val got2 = AsOfJoin.asOfSelf(src, "k", "t", col("kind") === "p",
      Seq("kind"), Seq("pid", "tag"), tieBreak = Seq("pid"))
      .filter(col("kind") === "click")
      .select("pid", "tag").as[(Long, String)].head()
    assert(got2 === ((9L, "nine")))
  }

  test("tieBreak columns outside rightCols are rejected loudly") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "e1")).toDF("k", "t", "ev")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 7L, "seven")).toDF("k", "t", "pid", "tag")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "t", Seq("ev"), Seq("pid"), tieBreak = Seq("tag"))
    }
    assert(ex.getMessage.contains("tieBreak") && ex.getMessage.contains("tag"))
  }

  test("a right row with NULL ts (or NULL key) never matches — SQL ASOF semantics") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "early"),
      (1L, ts("2024-01-01 12:00:00"), "late")).toDF("k", "t", "ev")
    val right = Seq(
      (Some(1L), None, 99L), // NULL ts: must never be carried
      (Some(1L), Some(ts("2024-01-01 11:00:00")), 7L),
      (None, Some(ts("2024-01-01 09:00:00")), 55L) // NULL key: unmatchable
    ).toDF("k", "t", "pid")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ev"), Seq("pid"))
      .select("ev", "pid").as[(String, Option[Long])].collect().toMap
    assert(got("early").isEmpty, "before the first REAL purchase the payload must be NULL")
    assert(got("late").contains(7L))
  }

  test("keys never mix") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "t", "ev")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 9L)).toDF("k", "t", "pid")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ev"), Seq("pid"))
      .select("pid").as[Option[Long]].head()
    assert(got.isEmpty)
  }
}
