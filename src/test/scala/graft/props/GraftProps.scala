package graft.props

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.streaming.CountWindows
import graft.streaming.CountWindows.{Element, Firing}

/** Property-based invariants (SURVEY §5.4). Spark-backed properties
  * run 10 cases each (a Spark round trip per case).
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scale4(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP)

  /** Reference simulation of Flink countWindow(size, slide). */
  private def simulate(values: Seq[Double], size: Int, slide: Int): Seq[Firing] =
    (1 to values.length).filter(_ % slide == 0).map { i =>
      val win = values.take(i).takeRight(size)
      Firing(1L, i.toLong, win.length,
        win.foldLeft(JBigDecimal.ZERO)((a, v) => a.add(scale4(v))).doubleValue())
    }

  private val genCase = for {
    n <- Gen.choose(0, 50)
    values <- Gen.listOfN(n, Gen.choose(-10000, 10000).map(_ / 100.0))
    size <- Gen.choose(1, 10)
    slide <- Gen.choose(1, 5)
  } yield (values, size, slide)

  property("countWindow matches the reference simulation") = forAll(genCase) {
    case (values, size, slide) =>
      import spark.implicits._
      val in = values.zipWithIndex.map { case (v, i) => Element(1L, i.toLong, i.toLong, v) }.toDS()
      val got = CountWindows.slidingCountWindow(in, size, slide)
        .collect().sortBy(_.n_seen).toSeq
      got == simulate(values, size, slide)
  }

  private val genAsOf = for {
    nLeft <- Gen.choose(0, 30)
    nRight <- Gen.choose(0, 30)
    // small key/ts domains force key collisions, ts ties, and null payloads
    left <- Gen.listOfN(nLeft, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L)))
    right <- Gen.listOfN(nRight,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L), Gen.option(Gen.choose(0L, 9L))))
  } yield (left, right)

  /** As-of join vs an in-memory brute force: each left row must match
    * a right row of the LATEST rightTs <= leftTs for its key (among
    * equal-ts right rows the distributed sort's pick is unspecified —
    * any of them is correct), and the carried (rid, payload) must be
    * CONSISTENT, i.e. come from the same right row — the struct-carry
    * invariant; per-column carrying broke exactly this when a payload
    * was null.
    */
  property("asOf matches brute force incl. null payloads and ts ties") = forAll(genAsOf) {
    case (left, right) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val r = right.zipWithIndex.map { case ((k, ts, pay), i) => (k, ts, i.toLong, pay) }
      val lDf = left.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("k", "t", "lid")
      val rDf = r.toDF("k", "t", "rid", "payload")
      val got = graft.operators.AsOfJoin.asOf(lDf, rDf, "k", "t",
          Seq("lid"), Seq("rid", "payload"))
        .select(col("lid"), col("rid"), col("payload"))
        .as[(Long, Option[Long], Option[Long])].collect()
      val byId = r.map(rr => rr._3 -> rr).toMap
      got.forall { case (lid, rid, payload) =>
        val (k, ts) = left(lid.toInt)
        val matches = r.filter(rr => rr._1 == k && rr._2 <= ts)
        if (matches.isEmpty) rid.isEmpty && payload.isEmpty
        else rid.exists { id =>
          val m = byId(id)
          m._1 == k && m._2 == matches.map(_._2).max && payload == m._4
        }
      } && got.length == left.length
  }

  /** Karp-Rabin composition: h(a ++ b) = h(a)·257^|b| + h(b) in
    * wrapping 64-bit arithmetic — the property that makes rolling
    * computation and distributed chunked hashing agree.
    */
  property("fingerprint64 composes over concatenation") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      import org.apache.spark.unsafe.types.UTF8String
      def h(s: String): Long = graft.functions.Fingerprint64.hash(UTF8String.fromString(s))
      val bLen = b.getBytes("UTF-8").length
      var p = 1L
      (0 until bLen).foreach(_ => p *= 257L)
      h(a + b) == h(a) * p + h(b)
    }
}
