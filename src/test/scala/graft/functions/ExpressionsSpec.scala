package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine matches hand-computed value on float arrays (codegen path)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(GraftFunctions.cosine(col("a"), col("b"))).as[Double].head()
    val exp = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val df = Seq(
      (Array(0.5f, -0.25f), Array(0.5f, -0.25f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val got = df.select(round(GraftFunctions.cosine(col("a"), col("b")), 9)).as[Double].collect()
    assert(got.toSeq === Seq(1.0, 0.0))
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path through an aggregation-less collect on
    // a wide filter (codegen) vs direct expression eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = CosineSimilarity(Literal.create(Array(1.0, 2.0)), Literal.create(Array(2.0, 1.0)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaDf = Seq((Array(1.0, 2.0), Array(2.0, 1.0))).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(interpreted - viaDf) < 1e-15)
  }

  test("length mismatch and null elements yield NULL, not truncated/garbage math") {
    GraftFunctions.register(spark)
    // codegen path (DataFrame select) and interpreted path agree: NULL
    val mismatch = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b")).as("c"),
        GraftFunctions.dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(mismatch.isNullAt(0) && mismatch.isNullAt(1))
    val withNullElem = spark.sql(
      "SELECT graft_cosine(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS c, " +
        "graft_dot(array(1.0D, 2.0D), array(NULL, 2.0D)) AS d").collect().head
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(CosineSimilarity(
      Literal.create(Array(1.0, 2.0, 3.0)), Literal.create(Array(1.0, 2.0))).eval(null) == null)
  }

  test("dot via SQL registration") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head()
    assert(got === 11.0)
  }

  test("fingerprint, minhash, and simhash are SQL-reachable") {
    GraftFunctions.register(spark)
    val fp = spark.sql("SELECT graft_fingerprint64('ab')").as[Long].head()
    assert(fp === 97L * 257 + 98)
    val agg = spark.sql(
      """SELECT graft_minhash(xxhash64(w), 4) AS mh, graft_simhash(xxhash64(w)) AS sh
        |FROM VALUES ('a'), ('b'), ('c') AS t(w)""".stripMargin).collect().head
    assert(agg.getSeq[Long](0).length === 4)
    assert(agg.getLong(1) != 0L) // deterministic signature from 3 word hashes
  }

  test("fingerprint64 golden values") {
    // h("ab") = 'a'*257 + 'b' = 97*257 + 98 = 25027
    val got = Seq("ab", "", "a").toDF("t")
      .select(Fingerprint64(col("t"))).as[Long].collect().toSeq
    assert(got === Seq(97L * 257 + 98, 0L, 97L))
  }

  test("fingerprint64 equals only on equal content") {
    val fps = graft.tables.Tables.documents(spark, sf)
      .select(Fingerprint64(col("text"))).as[Long].collect()
    assert(fps.distinct.length === fps.length) // sf0.001 docs are all distinct
  }

  test("normalize_text: NFC composition, casefold, whitespace collapse, exact edge strip") {
    val got = Seq(
      "école",          // combining accent → composed é
      "HeLLo\t WORLD",        // case + tab+space run
      "  a  b  ",             // leading/trailing + inner runs
      " \t ",                 // all whitespace → empty
      "x"         // control chars are NOT whitespace: kept
    ).toDF("t").select(NormalizeText(col("t"))).as[String].collect().toSeq
    assert(got === Seq("école", "hello world", "a b", "", "x"))
    // null in, null out (UnaryExpression null contract)
    val n = Seq[Option[String]](None).toDF("t")
      .select(NormalizeText(col("t"))).collect().head
    assert(n.isNullAt(0))
    // normalized variants share a fingerprint, distinct content does not
    val fp = Seq("A  B", "a\tb", "a c").toDF("t")
      .select(Fingerprint64(NormalizeText(col("t")))).as[Long].collect().toSeq
    assert(fp(0) === fp(1))
    assert(fp(0) !== fp(2))
  }
}
