package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.converter.{SpanConverter, Spans}

/** Streaming converter ingest: batch/stream parity and exactly-once
  * resume across restarts. */
class SpansStreamSpec extends SparkSpec {

  test("streamed conversion matches the batch converter; restarts don't double-convert") {
    import spark.implicits._
    val base = Files.createTempDirectory("spans_stream")
    val inDir = base.resolve("in").toString
    val outDir = base.resolve("out").toString
    val ckDir = base.resolve("ck").toString
    Files.createDirectories(base.resolve("in"))

    val spans = Spans.synthesize(spark, sfDir).toDF.cache()
    val batchRecords = SpanConverter.convert(spark, spans)
    val expected = batchRecords.count()

    // land the corpus as two JSONL files, whole traces per file
    val half = spans.filter($"trace_id".substr(7, 10).cast("long") % 2 === 0)
    val other = spans.filter($"trace_id".substr(7, 10).cast("long") % 2 =!= 0)
    half.coalesce(1).write.mode("append").json(inDir)
    SpansStream.runOnce(spark, inDir, outDir, ckDir)
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst > 0 && afterFirst < expected)

    // second landing + restart: only the NEW file converts
    other.coalesce(1).write.mode("append").json(inDir)
    SpansStream.runOnce(spark, inDir, outDir, ckDir)
    val streamed = spark.read.parquet(outDir)
    assert(streamed.count() == expected, "no duplicates, no losses across restarts")

    // parity with the batch DAG, record by record
    val batchDf = batchRecords.toDF
      .select($"trace_id", $"span_id", $"agent_name", $"finish_reason", $"n_tool_calls")
    val streamDf = streamed
      .select($"trace_id", $"span_id", $"agent_name", $"finish_reason", $"n_tool_calls")
    assert(batchDf.exceptAll(streamDf).isEmpty && streamDf.exceptAll(batchDf).isEmpty)

    // crash-replay idempotence: re-running a batch with the SAME batchId
    // (what a failure between parquet write and checkpoint commit causes)
    // overwrites its own directory — counts don't change
    val replayBatch = spark.read.schema(Spans.schema).json(inDir)
    SpansStream.writeBatch(spark, replayBatch, batchId = 0L, outDir = outDir)
    SpansStream.writeBatch(spark, replayBatch, batchId = 0L, outDir = outDir)
    assert(spark.read.parquet(outDir).filter($"batch_id" === 0L).count() == expected,
      "a replayed batch must not duplicate records")
    spans.unpersist()
  }

  test("sink layout version: marker written on start, incompatible sink rejected by name") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_v").toString
    // fresh sink: marker is written
    SpansStream.checkOrWriteMarker(spark, dir)
    val marker = java.nio.file.Paths.get(dir, "_graft_sink_version")
    assert(java.nio.file.Files.exists(marker))
    assert(new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
      == SpansStream.SinkVersion.toString)
    // same-version sink: resume is fine
    SpansStream.checkOrWriteMarker(spark, dir)
    // incompatible sink layout: rejected with the engine's message
    // (rewrite through Hadoop FS so the local-FS checksum stays valid)
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_sink_version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    o.write("99\n".getBytes("UTF-8")); o.close()
    val e = intercept[IllegalStateException] {
      SpansStream.checkOrWriteMarker(spark, dir)
    }
    assert(e.getMessage.contains("layout v99"), e.getMessage)
    assert(e.getMessage.contains("new output directory"), e.getMessage)
  }
}
