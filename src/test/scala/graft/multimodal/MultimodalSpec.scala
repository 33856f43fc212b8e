package graft.multimodal

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "abc"), (3L, "x" * 1000))

  test("attachBinary produces the media schema convention") {
    val media = Multimodal.attachBinary(docs.toDF("doc_id", "text"), "doc_id", "text", "txt")
    assert(media.schema.fieldNames.toSeq === Seq("id", "media"))
    assert(media.schema("media").dataType.catalogString === Multimodal.mediaSchema.catalogString)
    val metas = media.selectExpr("media.meta.n_bytes").as[Long].collect().toSet
    assert(metas === Set(11L, 3L, 1000L))
  }

  test("decode stub is deterministic, batch-shaped, and metadata-consistent") {
    val media = Multimodal.attachBinary(docs.toDF("doc_id", "text"), "doc_id", "text", "txt")
    val out = Multimodal.decodeImageStub(media, batchSize = 2, numPartitions = 2)
      .collect().sortBy(_.id)
    assert(out.map(_.id).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.n_bytes).toSeq === Seq(11L, 3L, 1000L))
    assert(out.forall(_.features.length == 8))
    val again = Multimodal.decodeImageStub(media, batchSize = 64).collect().sortBy(_.id)
    assert(out.map(_.width).toSeq === again.map(_.width).toSeq) // batch size invariant
    assert(out.map(m => m.features.toSeq).toSeq === again.map(m => m.features.toSeq).toSeq)
  }

  test("frameSample explodes sampled frame indices") {
    val media = Multimodal.attachBinary(docs.toDF("doc_id", "text"), "doc_id", "text", "txt")
    val frames = Multimodal.frameSample(Multimodal.decodeImageStub(media), 100)
    // doc 3: width = 1000 % 640 = 360 → frames 0..2; others width < 100 → 1 frame
    val byId = frames.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(byId(3L) === 3L)
    assert(byId(1L) === 1L)
  }
}
