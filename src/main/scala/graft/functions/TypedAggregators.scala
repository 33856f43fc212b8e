package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed aggregators (`Aggregator[IN, BUF, OUT]`) — the
  * SURVEY §2.8 surface for user-defined aggregation over typed
  * Datasets (`ds.groupByKey(...).agg(WeightedMean.toColumn)`), the
  * Spark-idiomatic replacement for Flink's `AggregateFunction`.
  * Decomposable by construction: `reduce` runs map-side, `merge`
  * combines partial buffers, so the shuffle carries one buffer per
  * (partition, key).
  */
object TypedAggregators {

  /** Gated query: quantity-weighted mean extended price per return
    * flag through the typed Dataset API. Output rounded to 4 decimals
    * (double summation order differs between engines at ~1e-13
    * relative — see the oracle-parity notes in Relational).
    */
  def weightedMeanQuery(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.tables.Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(WeightedMean.toColumn.name("wmean"))
      .toDF("l_returnflag", "wmean")
      .select($"l_returnflag", org.apache.spark.sql.functions.round($"wmean", 4).as("wmean"))
  }

  val weightedMeanSql: String =
    """SELECT l_returnflag,
      | round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Weighted mean of (value, weight) pairs. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
