package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CappedPostingsAgg, CosineSimilarity, DotProduct, Fingerprint64, MinHashAgg, Mix64, NormalizeText}

/** The standard Spark library integration point: load every graft
  * function into ANY session with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), no code changes — the same
  * mechanism Delta/Iceberg use. `GraftSession.create()` remains the
  * programmatic front door; this class is the config-only one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.GraftExtensions", null, name, usage, "")

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples for every graft SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_fingerprint64"),
      info("graft_fingerprint64", "graft_fingerprint64(s) - Karp-Rabin 64-bit content fingerprint"),
      (es: Seq[Expression]) => Fingerprint64(es.head)),
    (FunctionIdentifier("graft_mix64"),
      info("graft_mix64", "graft_mix64(h) - murmur fmix64 avalanche of a bigint"),
      (es: Seq[Expression]) => Mix64(es.head)),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(hash, k) - k-permutation MinHash signature aggregate"),
      (es: Seq[Expression]) =>
        MinHashAgg(es.head, litInt(es(1), "graft_minhash k")).toAggregateExpression()),
    (FunctionIdentifier("graft_capped_postings"),
      info("graft_capped_postings",
        "graft_capped_postings(id, maxDf) - df-capped posting list: struct(df, ids complete iff df <= maxDf)"),
      (es: Seq[Expression]) =>
        CappedPostingsAgg(es.head, litInt(es(1), "graft_capped_postings maxDf")).toAggregateExpression()),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(hash) - 64-bit SimHash signature aggregate"),
      (es: Seq[Expression]) =>
        graft.operators.SimHash.SimHashAgg(es.head).toAggregateExpression()),
    (FunctionIdentifier("graft_normalize_text"),
      info("graft_normalize_text",
        "graft_normalize_text(s) - NFC + lowercase + whitespace-collapse normalization"),
      (es: Seq[Expression]) => NormalizeText(es.head)))
}
