package graft.multimodal

import graft.SparkSpec

/** Stub-codec semantics + batched extraction checks. */
class BinaryOpsSpec extends SparkSpec {

  test("histogram buckets count every byte exactly once") {
    val payload = "hello world".getBytes("UTF-8")
    val h = BinaryOps.FakeCodec.histogram(payload)
    assert(h.sum == payload.length)
    assert(h(6) == payload.count(b => (b & 0xff) >> 4 == 6))
  }

  test("thumbnail keeps every 4th byte") {
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val t = BinaryOps.FakeCodec.thumbnail(payload)
    assert(t.toSeq == Seq[Byte](0, 4, 8))
  }

  test("feature extraction is batch-size invariant") {
    import spark.implicits._
    val media = BinaryOps.synthesize(spark, sfDir)
    val a = BinaryOps.extractFeatures(media, batchSize = 1)
      .map(f => (f.media_id, f.n_bytes, f.histogram.toSeq, f.n_frames, f.thumb_bytes))
      .collect().sortBy(_._1)
    val b = BinaryOps.extractFeatures(media, batchSize = 64)
      .map(f => (f.media_id, f.n_bytes, f.histogram.toSeq, f.n_frames, f.thumb_bytes))
      .collect().sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("payload survives the binary round-trip untouched") {
    import spark.implicits._
    val doc = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    BinaryOps.synthesize(spark, sfDir).collect().take(20).foreach { m =>
      assert(new String(m.payload, "UTF-8") == doc(m.media_id))
    }
  }
}
