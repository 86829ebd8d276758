package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus interchange — the wire format document corpora actually
  * move in between organizations (one JSON object per line: the
  * HuggingFace datasets / Dolma / RedPajama convention), beside the
  * engine-native parquet. Reference analogue: the span/persona JSONL
  * readers (S1/S5) read record streams the same way; this is the corpus
  * table's version of that surface.
  *
  * Scale rules, both load-bearing at 100 TB:
  *   - the reader takes an EXPLICIT schema, never inference — schema
  *     inference is a full extra pass over the corpus before the real
  *     read even starts;
  *   - malformed lines surface as rows (PERMISSIVE mode with a
  *     `_corrupt_record` column) so one truncated upload in a 10⁵-file
  *     drop quarantines instead of killing the job; `strict = true`
  *     switches to FAILFAST for pipelines that prefer the crash.
  */
object CorpusInterchange {

  /** The documents table's interchange schema (TESTDATA.md columns). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  private val corruptCol = "_corrupt_record"

  /** Write a documents frame as JSONL shards. Column order is pinned to
    * the interchange schema; `shards` bounds file count (a real corpus
    * keeps the natural partitioning instead of coalescing). */
  def writeDocumentsJsonl(df: DataFrame, dir: String,
      shards: Option[Int] = None): Unit = {
    val cols = documentsSchema.fields.map(f => col(f.name)).toSeq
    val out = shards.fold(df.select(cols: _*))(n => df.select(cols: _*).coalesce(n))
    out.write.mode("overwrite").json(dir)
  }

  /** Read a JSONL documents corpus. Valid rows carry a NULL
    * `_corrupt_record`; malformed lines carry the raw line there with
    * every schema column NULL. Callers split on that column —
    * [[readDocumentsJsonlClean]] is the common case. */
  def readDocumentsJsonl(spark: SparkSession, dir: String,
      strict: Boolean = false): DataFrame = {
    val schema = documentsSchema.add(StructField(corruptCol, StringType))
    spark.read
      .schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(dir)
  }

  /** The valid rows only, interchange columns, corrupt lines dropped. */
  def readDocumentsJsonlClean(spark: SparkSession, dir: String): DataFrame =
    readDocumentsJsonl(spark, dir)
      .filter(col(corruptCol).isNull)
      .select(documentsSchema.fields.map(f => col(f.name)).toSeq: _*)

  /** The quarantine stream: raw malformed lines for a side-log
    * ([[Sinks.writeFailureSideLog]]'s input shape). Spelled as a text
    * scan + `from_json` rather than a filter on [[readDocumentsJsonl]]:
    * Spark refuses any JSON scan whose pruned schema is ONLY the
    * corrupt-record column (UNSUPPORTED_FEATURE.
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN — and column pruning reduces every
    * quarantine-only query to exactly that), while a text scan carries
    * the raw line as a first-class column. Same parser, same verdicts. */
  def corruptLines(spark: SparkSession, dir: String): DataFrame = {
    val schema = documentsSchema.add(StructField(corruptCol, StringType))
    spark.read.text(dir)
      .filter(from_json(col("value"), schema, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol))
        .getField(corruptCol).isNotNull)
      .select(col("value").as("raw_line"))
  }
}
