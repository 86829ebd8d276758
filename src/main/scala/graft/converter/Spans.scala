package graft.converter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Span data model: one Langfuse-style observation per row (schema per
  * FIXTURES.md §A1; behavioral reference `langfuse_utils.py:105-125`).
  * Explicit StructType + PERMISSIVE corrupt-record handling reproduces the
  * reference's skip-bad-line tolerance (S1) with columnar pruning.
  */
final case class SpanMessage(role: String, content: String)

final case class Span(
    trace_id: String,
    span_id: String,
    span_type: String,
    span_name: String,
    model: Option[String],
    input: Seq[SpanMessage],
    output: Option[SpanMessage],
    startTime: Option[String],
    parentObservationId: Option[String],
    level: Int)

object Spans extends Serializable {

  val GenerationMarker = "OpenAI-generation"

  val messageType: StructType = StructType(Seq(
    StructField("role", StringType), StructField("content", StringType)))

  val schema: StructType = StructType(Seq(
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("span_type", StringType),
    StructField("span_name", StringType),
    StructField("model", StringType),
    StructField("input", ArrayType(messageType)),
    StructField("output", messageType),
    StructField("startTime", StringType),
    StructField("parentObservationId", StringType),
    StructField("level", IntegerType),
    StructField("_corrupt_record", StringType)))

  /** S1: span-per-line JSONL reader, tolerant of bad lines. The filter
    * also requires trace_id (spans are unusable without one), which keeps
    * the plan legal — Spark refuses queries whose referenced columns are
    * ONLY the corrupt-record column. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .filter(col("_corrupt_record").isNull && col("trace_id").isNotNull)
      .drop("_corrupt_record")

  /** P4 + S1: tolerant JSONL reader for REAL span dumps, where `output`
    * arrives as either a single message object or a list of them (the
    * reference normalizes list → first element,
    * `convert_spans_to_chatcompletion.py:1526-1532`). A static schema
    * can't union the two shapes, so `output` is re-extracted from the raw
    * line and parsed per shape — the dispatch keys on the JSON text's
    * first character, the columnar spelling of the reference's
    * isinstance check. (A plain `coalesce` of the two parses would be
    * wrong: `from_json` with a struct schema over array text yields a
    * struct of NULLs, not NULL.) */
  def readJsonlNormalized(spark: SparkSession, path: String): DataFrame = {
    val withoutOutput = StructType(schema.fields.filterNot(_.name == "output"))
    spark.read.textFile(path).toDF("value")
      .select(
        from_json(col("value"), withoutOutput).as("s"),
        get_json_object(col("value"), "$.output").as("output_raw"))
      .select(col("s.*"),
        when(ltrim(col("output_raw")).startsWith("["),
          // get() not element_at(): NULL (not an ANSI error) for output: []
          get(from_json(col("output_raw"), ArrayType(messageType)), lit(0)))
          .otherwise(from_json(col("output_raw"), messageType))
          .as("output"))
      .filter(col("_corrupt_record").isNull && col("trace_id").isNotNull)
      .drop("_corrupt_record")
      // keep the canonical column order regardless of parse shape
      .select(schema.fieldNames.filterNot(_ == "_corrupt_record")
        .map(col).toIndexedSeq: _*)
  }

  /** S4 + P7: query JSONL reader with framework filter — load the query
    * table, keep only target frameworks, drop blank queries (behavioral
    * reference `run_end_to_end.py:159-184` + the empty-query guard
    * `:827-830`). An empty `frameworks` list means no framework filter,
    * as in the reference. */
  val querySchema: StructType = StructType(Seq(
    StructField("query", StringType),
    StructField("framework", StringType),
    StructField("trace_id", StringType),
    StructField("_corrupt_record", StringType)))

  def readQueries(spark: SparkSession, path: String,
      frameworks: Seq[String] = Seq.empty): DataFrame = {
    val base = spark.read.schema(querySchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .filter(col("_corrupt_record").isNull &&
        length(trim(col("query"))) > 0)
      .drop("_corrupt_record")
    if (frameworks.isEmpty) base
    else base.filter(col("framework").isin(frameworks: _*))
  }

  /** Deterministic span synthesis from the `documents` table — the test
    * corpus for the converter DAG (the driver provides no span parquet).
    * Each document becomes one trace:
    *   - an agent SPAN (name "meta" for every 5th doc → exercises the P2
    *     drop; otherwise "Sub-agent: <lang>_agent" → exercises prefix strip),
    *   - two GENERATION spans under it with increasing startTime
    *     (exercises A1 last-per-group),
    *   - input = [system(with tool docs), user, assistant(tool_use XML),
    *     user("Tool execution results:...")] (exercises F5/F3/J5),
    *   - output = assistant content with a tool_use (and a parallel block
    *     on every 3rd doc) built from the document's own tokens.
    */
  def synthesize(spark: SparkSession, dir: String): Dataset[Span] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang")
      // single-file source = one scan partition; spread the synthesis map
      // (explicit count so AQE can't coalesce the small exchange)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String, String)]
      .flatMap { case (docId, text, lang) =>
        val toks = text.split(" ")
        def tok(i: Int): String = toks(i % toks.length)
        val trace = s"trace_$docId"
        val agentSpan = s"span_${docId}_agent"
        val agentName = if (docId % 5 == 0) "meta" else s"Sub-agent: ${lang}_agent"

        val sysPrompt =
          s"""You are ${lang}_agent, a helpful assistant.
             |<TOOL_DEFINITIONS_START>
             |Tool: search — finds ${tok(0)}.
             |<TOOL_DEFINITIONS_END>
             |## Available Sub-Agents
             |- ${lang}_helper
             |When you use tools or sub-agents, emit NexAU XML.
             |
             |IMPORTANT: answer faithfully.""".stripMargin
        val toolUse =
          s"""<tool_use>
             |<tool_name>search</tool_name>
             |<parameter>
             |<query>${tok(1)} ${tok(2)}</query>
             |<limit>5</limit>
             |</parameter>
             |</tool_use>""".stripMargin
        val toolResults =
          s"""Tool execution results:
             |<tool_result><tool_name>search</tool_name><result>found ${tok(3)}</result></tool_result>""".stripMargin
        val parallelBlock =
          s"""<use_parallel_tool_calls>
             |<parallel_tool><tool_name>fetch</tool_name><parameter><url>${tok(4)}</url></parameter></parallel_tool>
             |<parallel_tool><tool_name>rank</tool_name><parameter><k>3</k></parameter></parallel_tool>
             |</use_parallel_tool_calls>""".stripMargin
        val outContent =
          if (docId % 3 == 0) s"Working on ${tok(5)}.\n$parallelBlock"
          else s"Done: ${tok(5)}.\n$toolUse"

        val input = Seq(
          SpanMessage("system", sysPrompt),
          SpanMessage("user", s"Please research: ${toks.take(8).mkString(" ")}"),
          SpanMessage("assistant", s"Starting.\n$toolUse"),
          SpanMessage("user", toolResults))

        Seq(
          Span(trace, agentSpan, "SPAN", agentName, None, Seq.empty, None,
            Some(f"2025-01-01T00:00:00.${docId % 1000}%03dZ"), None, 0),
          Span(trace, s"span_${docId}_gen_a", "GENERATION", GenerationMarker,
            Some("nex-1"), input, Some(SpanMessage("assistant", s"draft ${tok(6)}")),
            Some("2025-01-01T00:01:00.000Z"), Some(agentSpan), 1),
          Span(trace, s"span_${docId}_gen_b", "GENERATION", GenerationMarker,
            Some("nex-1"), input, Some(SpanMessage("assistant", outContent)),
            Some("2025-01-01T00:02:00.000Z"), Some(agentSpan), 1))
      }
  }
}
