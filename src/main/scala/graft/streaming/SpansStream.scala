package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.converter.{SpanConverter, Spans}

/** Streaming converter ingest: span JSONL files landing in a directory
  * stream through the SAME batch converter DAG, micro-batch by
  * micro-batch, with converted records appended to a parquet landing zone.
  *
  * This is the streaming generalization of the reference's convert loop
  * (`run_end_to_end.py` converts one trace FILE at a time as downloads
  * land — a hand-rolled micro-batch scheduler). `foreachBatch` alone is
  * only at-least-once (a crash between the parquet write and the
  * checkpoint commit replays the batch), so each batch writes to a
  * batchId-derived partition directory with OVERWRITE: a replayed batch
  * rewrites its own directory instead of appending duplicates, making the
  * sink idempotent and the pipeline exactly-once end to end. The reference
  * approximates the same with existing-file checks.
  *
  * Correctness contract, same as the reference's: all spans of a trace
  * arrive in one file (the fetcher lands whole traces — S2/S3), so the A1
  * window and J3 topology groupBy see complete traces inside a batch.
  */
object SpansStream {

  /** v1 = batch_id=<id> partition layout with overwrite-replay idempotency.
    * Bump with any change to the sink layout or record schema semantics. */
  final val SinkVersion = 1

  private val MarkerName = "_graft_sink_version"

  /** The durable artifact here is the SINK (batch_id partitions), not
    * GroupState — so the version marker lives in the sink directory: a
    * marker file is written on start and validated on every later start,
    * turning "resume into a directory written by an incompatible layout"
    * into an engine error naming this operator (the DedupStream contract)
    * instead of silently mixing layouts. */
  private[streaming] def checkOrWriteMarker(spark: SparkSession, outDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(outDir, MarkerName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) {
      val in = fs.open(path)
      val found = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      if (found != SinkVersion.toString) throw new IllegalStateException(
        s"SpansStream sink at $outDir carries layout v$found, but this " +
          s"engine writes v$SinkVersion: the sink was written by an " +
          "incompatible version of the operator and cannot be appended to. " +
          "Land into a new output directory (sink layout evolution " +
          "contract — see SpansStream scaladoc).")
    } else {
      val out = fs.create(path, true)
      try out.write(s"$SinkVersion\n".getBytes("UTF-8")) finally out.close()
    }
  }

  /** Convert one micro-batch and land it idempotently: the output goes to
    * `outDir/batch_id=<id>` with overwrite, so a crash-replay of the same
    * batch (same id, same checkpointed file set) rewrites the directory
    * instead of duplicating records. Readers see batch_id as an ordinary
    * partition column via discovery. */
  def writeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      outDir: String, nexauMode: Boolean = false): Unit = {
    val clean = batch
      .filter(batch("_corrupt_record").isNull && batch("trace_id").isNotNull)
      .drop("_corrupt_record")
    val records = SpanConverter.convert(spark, clean, nexauMode)
    records.toDF.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** Tail `inDir` for span JSONL files and convert each micro-batch. */
  def start(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, nexauMode: Boolean = false,
      availableNow: Boolean = true): StreamingQuery = {
    checkOrWriteMarker(spark, outDir)
    val stream = spark.readStream
      .schema(Spans.schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(inDir)

    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(spark, batch, batchId, outDir, nexauMode)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Convert everything currently in `inDir` and block until done. */
  def runOnce(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): Unit =
    start(spark, inDir, outDir, checkpointDir).awaitTermination()
}
