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

  test("q46: pivot plans as aggregation only, no explode/join") {
    // Spark's pivot is two HashAggregates: (rf, ls) partials, then a
    // pivotfirst over |groups| rows — the second exchange carries
    // groups, not input. Joins or explodes here would mean the pivot
    // degraded to a manual reshape.
    val p = plan("q46_pivot")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"pivot should need at most two shuffles, got $exchanges\n${p.take(800)}")
    assert(!p.contains("Join"), "pivot must not plan a join")
    assert(!p.contains("Expand"), "explicit value list should avoid Expand")
  }

  test("q54: stream-static enrichment is a stateless broadcast join") {
    // build the streaming side without running it: same join, static dim
    val df = graft.streaming.StreamOps.streamStaticJoin(spark, sf)
    // the executed micro-batches already ran inside the builder; assert
    // the logical shape via a fresh batch-equivalent plan instead
    val ev = graft.tables.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val dim = org.apache.spark.sql.functions.broadcast(
      graft.tables.Tables.customer(spark, sf)
        .select(org.apache.spark.sql.functions.col("c_custkey"),
          org.apache.spark.sql.functions.col("c_mktsegment")))
    val p = ev.join(dim, org.apache.spark.sql.functions.col("user_id") ===
      org.apache.spark.sql.functions.col("c_custkey")).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("StateStore"), "enrichment join must not be stateful")
    assert(df.count() > 0)
  }

  test("q56: typed closures do not break scan column pruning") {
    val p = plan("q56_typed_pipeline")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && !readSchema.contains("o_orderpriority"),
      s"typed pipeline should scan only the 3 selected columns: $readSchema")
  }

  test("q38: as-of join is one key shuffle, no join operator at all") {
    val p = plan("q38_asof_join")
    assert(!p.contains("Join"), "union-and-carry must not plan a join")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"as-of should shuffle once on the key, got $exchanges")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), "carry window missing")
  }

  test("q39: range join stays an equi-join — no nested loop, no cartesian") {
    val p = plan("q39_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n${p.take(600)}")
  }

  test("q01: tokenize pipeline stays in whole-stage codegen") {
    // AQE's pre-execution plan string hides codegen stages — ask for
    // the codegen explain explicitly
    val qe = SparkEntry.queries("q01_wordcount")(spark, sf).queryExecution
    val p = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p.take(500))
  }
}
