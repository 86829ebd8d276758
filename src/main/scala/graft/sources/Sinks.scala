package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources/sinks beyond plain parquet (SURVEY.md §2.1): JSONL append
  * (S8), small-result JSON (S9), stats documents (S10), trace enhancement
  * (S11/S12), and the anti-join resume pattern (J7/S3) that replaces the
  * reference's existing-file checks.
  */
object Sinks {

  /** S8: append-mode JSONL — the engine's landing-zone format. One file
    * per partition; callers coalesce when the consumer wants few files. */
  def appendJsonl(df: DataFrame, dir: String, coalesceTo: Option[Int] = None): Unit = {
    val out = coalesceTo.map(df.coalesce).getOrElse(df)
    out.write.mode(SaveMode.Append).json(dir)
  }

  /** S9: small results as one JSON array string on the driver (the
    * reference's collect-then-write exporter). Guard with a hard limit so
    * a mis-call can't OOM the driver. */
  def collectJsonArray(df: DataFrame, limit: Int = 10000): String = {
    val rows = df.limit(limit + 1).toJSON.collect()
    require(rows.length <= limit, s"result exceeds driver-side limit $limit")
    rows.mkString("[", ",", "]")
  }

  /** S10: one-row stats document. */
  def writeStatsJson(df: DataFrame, path: String): Unit = {
    val json = collectJsonArray(df, limit = 1)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** S11/S12: enhancement — attach query/framework/trace metadata to every
    * span (or record) of its trace via a broadcast join; the reference
    * does this file-at-a-time (`run_end_to_end.py:342-396`). */
  def enhance(spans: DataFrame, queries: DataFrame): DataFrame =
    spans.join(
      broadcast(queries.select(
        col("trace_id"), col("query"), col("framework"),
        col("trace_id").as("langfuse_trace_id"))),
      Seq("trace_id"), "left")
      .withColumn("stop", lit(""))

  /** J7/S3: resume-safe ingest — keep only rows whose trace has not
    * already landed. The anti-join replaces per-file existence checks and
    * scales to any id-set size (broadcast when small, shuffle otherwise). */
  def notYetLanded(incoming: DataFrame, landedIds: DataFrame): DataFrame =
    incoming.join(landedIds.select("trace_id").distinct(),
      Seq("trace_id"), "left_anti")

  /** Read the landed-id set back from a JSONL/parquet landing dir. */
  def landedIds(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).select("trace_id").distinct()

  /** F21: metadata sanitization — drop a nested field (e.g.
    * "fuzzifier.original_query") from a struct column via a struct
    * rebuild; no row-level UDF, stays inside codegen. */
  def dropMetadataField(df: DataFrame, column: String, nestedField: String): DataFrame =
    df.withColumn(column, col(column).dropFields(nestedField))

  /** S16: failure side-log — split a converted frame on its validity
    * flag, append the rejects to a dedicated JSONL dir (the reference
    * appends malformed responses to a failure log,
    * `fuzzifier_agent.py:234-246`), and return the clean rows. One pass
    * over a cached split, so the input isn't recomputed per branch. */
  def writeFailureSideLog(records: DataFrame, failureDir: String,
      validCol: String = "valid"): DataFrame = {
    val cached = records.cache()
    appendJsonl(cached.filter(!col(validCol)), failureDir)
    // eager checkpoint so the returned frame owns its data and the
    // cache entry can be released immediately
    val valid = cached.filter(col(validCol)).localCheckpoint(eager = true)
    cached.unpersist(blocking = false)
    valid
  }

  /** S13: per-query log sink — one structured log row per query/trace
    * (the engine-scope equivalent of the reference's per-query log files,
    * `run_end_to_end.py:736-799`). Partitioning by the RAW key would mint
    * one directory + one tiny file per trace per append — the exact
    * million-tiny-files failure this sink exists to avoid — so the layout
    * key is a bounded hash bucket of it; the key itself stays an ordinary
    * column (still predicate-pushable: a point lookup prunes to one
    * bucket's directory via the same crc32 expression). The repartition
    * lands ONE file per bucket per append. */
  def writePerQueryLogs(logs: DataFrame, dir: String,
      keyCol: String = "trace_id", nBuckets: Int = 64): Unit =
    logs
      .withColumn("log_bucket", pmod(crc32(col(keyCol).cast("string")), lit(nBuckets)))
      .repartition(col("log_bucket"))
      .write.mode(SaveMode.Append).partitionBy("log_bucket").json(dir)
}
