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
}
