package graft.functions

import graft.SparkSuite

class TypedAggregatorsSpec extends SparkSuite {
  import spark.implicits._

  test("weighted mean over groupByKey matches hand computation") {
    val ds = Seq(
      ("a", 10.0, 1.0), ("a", 20.0, 3.0), // (10·1 + 20·3) / 4 = 17.5
      ("b", 5.0, 2.0)).toDS()
    val got = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TypedAggregators.WeightedMean.toColumn)
      .collect().toMap
    assert(got === Map("a" -> 17.5, "b" -> 5.0))
  }

  test("zero total weight yields NaN, not a crash") {
    val got = Seq(("a", 1.0, 0.0)).toDS().groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TypedAggregators.WeightedMean.toColumn)
      .collect().head._2
    assert(got.isNaN)
  }
}
