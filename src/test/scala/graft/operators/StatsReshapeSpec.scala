package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q162 unpivot, q163 exact-moment statistics, q164 boilerplate
  * stripping — planted-fixture properties the oracle gates can't
  * express as pointedly.
  */
class StatsReshapeSpec extends SparkSuite {
  import spark.implicits._

  test("q163 machinery: planted perfect correlation gives r = ±1, beta exact") {
    // y = 2x exactly (in micro-unit space) → r = 1, beta = 2·1e6
    // (x is micro-scaled, y is raw hours in the real query; here both
    // go through the same moment pipeline via a stand-in frame)
    val d38 = "decimal(38,0)"
    val ev = Seq((1.0, 2L), (2.0, 4L), (3.0, 6L), (4.0, 8L))
      .toDF("value", "h")
      .select(lit("t").as("event_type"),
        round(col("value") * 1e6, 0).cast(d38).as("x"),
        col("h").cast(d38).as("y"))
    val m = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val (r, beta) = m.select(round(num / sqrt(dx * dy), 6), round(num / dx, 9))
      .as[(Double, Double)].head()
    assert(r == 1.0, s"perfectly linear data must give r=1, got $r")
    assert(beta == 2e-6, s"y = 2·(x/1e6) → beta = 2e-6 in micro-unit space, got $beta")
  }

  test("q163: every |r| <= 1 and n matches the group size on real data") {
    val got = FunctionFamilies.corrDiurnal(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, n, r, _) =>
      assert(n > 0 && math.abs(r) <= 1.0, s"$et n=$n r=$r")
    }
  }

  test("q162: unpivot emits exactly one row per (group, metric), values match the wide frame") {
    val wide = FunctionFamilies.unpivotMetrics(spark, sf)
    val rows = wide.as[(String, String, Long)].collect()
    val groups = rows.map(_._1).distinct
    assert(rows.length == groups.length * 3, "k metrics → k rows per group")
    // spot-check: sum_qty in melted form equals a direct aggregate
    val direct = graft.tables.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("v"))
      .as[(String, Long)].collect().toMap
    rows.filter(_._2 == "sum_qty").foreach { case (g, _, v) =>
      assert(direct(g) == v, s"melted sum_qty for $g: $v != ${direct(g)}")
    }
  }

  test("q164: a 9-of-10 token is stripped per source, order preserved, cross-source kept") {
    // srcA: "menu" in 9/10 docs (boilerplate), "deep" in 1 (kept).
    // srcB: "menu" in 1/10 docs — NOT boilerplate there, must survive.
    val a = (0L until 10L).map { i =>
      val t = if (i < 9) s"menu w$i deep$i" else s"w$i deep$i clean"
      (i, t, "srcA")
    }
    val b = (10L until 20L).map { i =>
      val t = if (i == 10) s"menu only here" else s"b$i other words"
      (i, t, "srcB")
    }
    val docs = (a ++ b).toDF("doc_id", "text", "source")
    val got = TextAnalysis.stripBoilerplate(docs, "doc_id", "text", "source")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    (0L until 9L).foreach { i =>
      assert(got(i) == s"w$i deep$i", s"doc $i: '${got(i)}' — menu must strip, order keep")
    }
    assert(got(10L).contains("menu"), "srcB's one-off 'menu' is not boilerplate there")
  }
}
