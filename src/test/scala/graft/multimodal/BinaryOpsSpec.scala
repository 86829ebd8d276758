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

  test("q88 chunks cover every payload byte exactly once and copies are honest") {
    val rows = graft.SparkEntry.queries("q88_media_chunk_dedup")(spark, sfDir)
      .collect()
    val byMedia = rows.groupBy(_.getAs[Long]("media_id"))
    val payloads = BinaryOps.synthesize(spark, sfDir).collect()
      .map(m => m.media_id -> m.payload).toMap
    // indices are contiguous 0..n-1 and the md5s reproduce the slices
    val md = java.security.MessageDigest.getInstance("MD5")
    byMedia.take(20).foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_idx"))
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq ==
        sorted.indices.toSeq, s"media $id indices not contiguous")
      val p = payloads(id)
      assert(sorted.length == (p.length + 63) / 64)
      sorted.foreach { c =>
        val i = c.getAs[Int]("chunk_idx") * 64
        val slice = p.slice(i, math.min(i + 64, p.length))
        val want = md.digest(slice).map("%02x".format(_)).mkString
        assert(c.getAs[String]("chunk_md5") == want, s"media $id chunk $i")
      }
    }
    // n_copies is the global hash frequency
    val freq = rows.groupBy(_.getAs[String]("chunk_md5")).view.mapValues(_.length)
    rows.take(500).foreach { r =>
      assert(r.getAs[Long]("n_copies") == freq(r.getAs[String]("chunk_md5")))
    }
  }
}
