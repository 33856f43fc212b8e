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
}
