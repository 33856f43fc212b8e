package graft

/** Plan-shape regression guards: the properties that make these
  * queries scale are asserted, not assumed. If a refactor silently
  * drops a pushdown or a broadcast, these fail before any benchmark
  * notices.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: shipdate predicate reaches the parquet scan") {
    val p = plan("q02_pricing_summary")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("LessThan(l_shipdate"), "shipdate filter not pushed")
  }

  test("q04: column pruning — scan reads only the 5 referenced columns + filter cols") {
    val p = plan("q04_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      readSchema)
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q30: the 6-way star join broadcasts every dimension chain") {
    val p = plan("q30_regional_revenue")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    // exactly one shuffle join side: lineitem⋈orders may be broadcast at
    // tiny SF; assert no cartesian anywhere
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q27: pushed filters are consumed by the DSv2 scan (no residual Filter)") {
    val p = plan("q27_bucketed_pushdown")
    assert(p.contains("pushed=[") && p.contains("GreaterThanOrEqual(l_quantity,30.0)"), p)
    assert(!p.linesIterator.exists(l => l.trim.startsWith("Filter ")),
      "filters should be fully consumed by the source")
  }

  test("q01: tokenize pipeline stays in whole-stage codegen") {
    // AQE's pre-execution plan string hides codegen stages — ask for
    // the codegen explain explicitly
    val qe = SparkEntry.queries("q01_wordcount")(spark, sf).queryExecution
    val p = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p.take(500))
  }
}
