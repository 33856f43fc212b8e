package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.tables.Tables

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("brute-force knn returns k neighbors per query, ranked by cosine") {
    val out = Similarity.knnQuery(spark, sf)
      .select("query_id", "cand_id", "sim", "rn").as[(Long, Long, Double, Int)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length === 5)
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sortBy(-_).toSeq) // sim desc by rank
      assert(!rows.exists(r => r._2 == r._1)) // self excluded
    }
  }

  test("lsh knn recall vs brute force is substantial on sf0.001") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val brute = Similarity.bruteForceKnn(c, q, 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshKnn(emb, "vec_id", "embedding", dim = 64, k = 5)
      .filter(col("query_id") < 50)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall > 0.3, s"recall $recall too low") // 16-bit sign-LSH on random vectors
  }

  test("kmeans refinement improves the quantizer objective over the id-sample seed") {
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
        .join(cents, Seq("cent_id"))
        .select(avg(graft.functions.GraftFunctions.cosine(col("vec"), col("cent_vec"))))
        .as[Double].head()
    val seed = objective(Similarity.sampleCentroids(emb, "vec_id", "embedding", 16))
    val one = objective(Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 1))
    val two = objective(Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2))
    assert(one >= seed, s"1 Lloyd step must not regress: $one < $seed")
    assert(two >= one, s"2nd Lloyd step must not regress: $two < $one")
  }

  test("kmeans centroids: always nlist rows, and empty clusters keep their seed") {
    // Seeds 0 and 1 are IDENTICAL vectors, so every point (including
    // vec 1 itself) ties between them and the argmax's cent_id
    // tie-break sends it to cluster 0 -> cluster 1 is empty after one
    // step and must keep its seed centroid via the COALESCE.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 2, 1)
      .orderBy("cent_id").as[(Long, Array[Double])].collect()
    assert(cents.length === 2)
    assert(cents.map(_._1).toSeq === Seq(0L, 1L))
    assert(cents(1)._2.toSeq === Seq(1.0, 0.0)) // empty cluster kept its seed
    cents.foreach { case (_, v) => assert(v.length === 2 && v.forall(x => !x.isNaN)) }
  }
}
