package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming packing: parity with batch q53 when batches arrive in
  * doc_id order, and O(1)-state continuation across micro-batches. */
class PackStreamSpec extends SparkSpec {

  test("streamed packing matches the batch prefix-sum across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)

    val input = MemoryStream[(Long, String, Long)]
    val query = PackStream.packed(input.toDF().toDF("doc_id", "source", "n_tok"))
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append")
      .start()

    // three batches in doc_id order: spans that continue across a batch
    // boundary only line up if the offset state persists
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val streamed = spark.table("pack_stream")
      .select("doc_id", "start_tok", "first_seq", "last_seq").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // expected: the batch q53 semantics — per-source prefix sum in
    // doc_id order, chunked at 256
    var offsets = Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (docId, source, nTok) =>
      val start = offsets(source)
      offsets += source -> (start + nTok)
      val expect = (start, start / 256L, (start + nTok - 1) / 256L)
      assert(streamed(docId) == expect,
        s"doc $docId: streamed ${streamed(docId)} != batch $expect")
    }
    assert(streamed.size == docs.size)
  }

  test("zero-token documents are dropped, never emitted with an inverted span") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, Long)]
    val query = PackStream.packed(input.toDF().toDF("doc_id", "source", "n_tok"))
      .writeStream.format("memory").queryName("pack_stream_empty")
      .outputMode("append")
      .start()
    // doc 2 is empty mid-stream: without the guard it would report
    // first_seq=1, last_seq=0 (start=256, n_tok=0) — an invalid span
    input.addData((1L, "s", 256L), (2L, "s", 0L), (3L, "s", 10L))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("pack_stream_empty")
      .select("doc_id", "start_tok", "first_seq", "last_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L), s"empty doc leaked: ${out.toSeq}")
    // the empty doc also doesn't shift anyone else's offsets
    assert(out.toSeq == Seq((1L, 0L, 0L, 0L), (3L, 256L, 1L, 1L)))
    out.foreach { case (id, _, fs, ls) =>
      assert(fs <= ls, s"doc $id: inverted span $fs..$ls")
    }
  }

  test("out-of-order arrival still packs gap-free per stream (arrival-order contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .as[(Long, String, Long)].collect().toSeq

    val input = MemoryStream[(Long, String, Long)]
    val query = PackStream.packed(input.toDF().toDF("doc_id", "source", "n_tok"))
      .writeStream.format("memory").queryName("pack_stream_ooo")
      .outputMode("append")
      .start()

    // reversed doc_id order across batches: spans differ from the batch
    // assignment, but the packing INVARIANTS must hold regardless
    val batches = docs.sortBy(-_._1).grouped((docs.size + 1) / 2).toSeq
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val out = spark.table("pack_stream_ooo")
      .select("source", "doc_id", "n_tok", "start_tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == docs.length)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val spans = rows.map(r => (r._4, r._4 + r._3)).sortBy(_._1).toSeq
      // contiguous: starts at 0, each span begins where the previous ended
      assert(spans.head._1 == 0L, s"$src: first span starts at ${spans.head._1}")
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(e1 == s2, s"$src: gap/overlap between spans ($e1 vs $s2)")
        case _ =>
      }
      // conservation: total packed tokens == the stream's token mass
      val expected = docs.filter(_._2 == src).map(_._3).sum
      assert(spans.last._2 == expected, s"$src: packed ${spans.last._2} of $expected")
    }
  }

  test("restoring a v1 state blob fails with the engine's message, not a decode trace") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val v1 = PackStream.PackState(1, 512L)
    val restored = TestGroupState.create[PackStream.PackState](
      org.apache.spark.api.java.Optional.of(v1), GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      PackStream.packGroup("web", Iterator((1L, "web", 10L)), restored)
    }
    assert(e.getMessage.contains("schema v1"), e.getMessage)
    assert(e.getMessage.contains("new checkpoint directory"), e.getMessage)

    // a current-version state restores and continues the offset
    val ok = TestGroupState.create[PackStream.PackState](
      org.apache.spark.api.java.Optional.of(
        PackStream.PackState(PackStream.StateVersion, 512L)),
      GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out = PackStream.packGroup("web", Iterator((1L, "web", 10L)), ok).toSeq
    assert(out == Seq(PackStream.PackedDoc(1L, "web", 10L, 512L, 2L, 2L)))
    assert(ok.get == PackStream.PackState(PackStream.StateVersion, 522L))
  }
}
