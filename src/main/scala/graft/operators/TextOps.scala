package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizing projections and the word-count pipeline.
  *
  * Reference semantics: `line.toLowerCase.split("\\W+")` then drop
  * empties then `(w, 1)` then `groupBy(0).sum(1)`
  * (flinksamples `WordCount.scala:30-33`, SURVEY §2.3 P1-P3, §2.5 A1).
  *
  * Implemented with codegen'd built-ins (`split`/`explode`/`lower`),
  * not closures, so the whole pipeline stays inside whole-stage
  * codegen and the final aggregation gets map-side partial
  * aggregation — at 100 TB the only shuffle is the partial-aggregated
  * (word, count) pairs, not the raw tokens.
  */
object TextOps {

  /** `\W+` tokenization of `col` → one lowercase non-empty token per row
    * in output column `word`.
    */
  def tokenize(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(lower(textCol), "\\W+")).as("word"))
      .where(length(col("word")) > 0)

  /** word → occurrence count over the tokenized column. */
  def wordCount(df: DataFrame, textCol: Column): DataFrame =
    tokenize(df, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
}
