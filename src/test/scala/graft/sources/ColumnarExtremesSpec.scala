package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.bucketed._

/** Columnar fillers under extreme values: IEEE specials, integral
  * extrema, empty/multibyte strings, epoch-boundary timestamps — the
  * row and columnar paths must agree bit-for-bit on all of them
  * (NaN bits included: both paths read the same stored Row, so a
  * mismatch means a filler bug, not data ambiguity).
  */
class ColumnarExtremesSpec extends SparkSuite {
  import spark.implicits._

  test("extreme values roundtrip identically through both read paths") {
    BucketStore.drop("colx_t")
    val rows = Seq(
      (0L, Double.NaN, Long.MinValue, "", false,
        new java.sql.Timestamp(0L)),
      (1L, Double.PositiveInfinity, Long.MaxValue, "multi-byte αβγ", true,
        new java.sql.Timestamp(-1L)),
      (2L, Double.NegativeInfinity, -1L, "a b", false,
        java.sql.Timestamp.valueOf("2262-01-01 00:00:00")),
      (3L, -0.0, 0L, " leading and trailing ", true,
        java.sql.Timestamp.valueOf("1677-09-22 00:00:00")),
      (4L, Double.MinPositiveValue, 42L, "plain", false,
        new java.sql.Timestamp(1700000000123L)))
    BucketStore.load(spark, "colx_t",
      rows.toDF("k", "d", "l", "s", "b", "ts"), "k", 2)
    def read(columnar: Boolean) =
      spark.read.format("graft-buckets").option("table", "colx_t")
        .option("columnar", columnar.toString).load()
        .orderBy("k").collect().map(_.toSeq)
    val viaRow = read(columnar = false)
    val viaCol = read(columnar = true)
    assert(viaCol.length === 5)
    viaRow.zip(viaCol).zipWithIndex.foreach { case ((r, c), i) =>
      r.zip(c).foreach {
        case (a: Double, b: Double) =>
          assert(java.lang.Double.doubleToRawLongBits(a) ===
            java.lang.Double.doubleToRawLongBits(b), s"row $i double bits diverge: $a vs $b")
        case (a, b) => assert(a === b, s"row $i field diverges: $a vs $b")
      }
    }
    // and a filter over the specials agrees (NaN semantics ride the
    // engine, not the reader — both paths must feed it identical bits)
    def nanCount(columnar: Boolean) =
      spark.read.format("graft-buckets").option("table", "colx_t")
        .option("columnar", columnar.toString).load()
        .filter(isnan(col("d"))).count()
    assert(nanCount(columnar = true) === nanCount(columnar = false))
  }
}
