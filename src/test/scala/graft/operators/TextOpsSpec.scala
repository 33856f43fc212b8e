package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** P1-P3 + A1 word-count parity: tokenizer `lower.split("\\W+")` minus
  * empties, grouped counts (reference WordCount.scala:30-33), checked
  * against an independently computed plain-Scala oracle over a
  * public-domain Hamlet fixture (the reference's golden corpus is the
  * same soliloquy).
  */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    "To be, or not to be,--that is the question:--",
    "Whether 'tis nobler in the mind to suffer",
    "The slings and arrows of outrageous fortune",
    "Or to take arms against a sea of troubles,",
    "And by opposing end them?--To die,--to sleep,--",
    "No more; and by a sleep to say we end",
    "The heartache, and the thousand natural shocks",
    "That flesh is heir to,--'tis a consummation",
    "Devoutly to be wish'd. To die,--to sleep;--",
    "To sleep! perchance to dream:--ay, there's the rub;")

  private def expected: Map[String, Long] =
    corpus.flatMap(_.toLowerCase.split("\\W+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("wordCount matches a hand-computed oracle on the Hamlet corpus") {
    val df = corpus.toDF("line")
    val got = TextOps.wordCount(df, col("line"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("tokenize drops empty tokens and lowercases") {
    val toks = TextOps.tokenize(Seq("A--B  c!").toDF("t"), col("t"))
      .as[String].collect().toSeq
    assert(toks === Seq("a", "b", "c"))
  }
}
