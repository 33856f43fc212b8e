package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** S5/S6 sources and K1/K2 sinks round-trip, plus P4 (identity
  * mapPartitions) — the remaining small SURVEY §2 rows.
  */
class SourcesSinksSpec extends SparkSuite {
  import spark.implicits._

  test("text sink overwrite + text source round trip (K1/S5)") {
    val dir = Files.createTempDirectory("graft_text").toString
    Sinks.writeTextOverwrite(Seq("alpha", "beta").toDS(), dir)
    Sinks.writeTextOverwrite(Seq("gamma", "delta").toDS(), dir) // overwrite, not append
    val back = Sources.textFile(spark, dir).collect().toSet
    assert(back === Set("gamma", "delta"))
  }

  test("csv sink with space delimiter (K2, reference WordCount.scala:36)") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Sinks.writeCsv(Seq(("hamlet", 7L), ("king", 3L)).toDF("word", "cnt"), dir)
    val back = spark.read.option("sep", " ").csv(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("hamlet", "7"), ("king", "3")))
  }

  test("collection source + identity mapPartitions (S6/P4)") {
    val ds = Sources.fromCollection(spark, Seq(1, 2, 3))
    val passed = ds.mapPartitions(it => it) // SnappydataConnectorTest.scala:17-21
    assert(passed.collect().sorted.toSeq === Seq(1, 2, 3))
    assert(passed.count() === 3L)
  }
}
