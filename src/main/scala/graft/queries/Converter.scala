package graft.queries

import graft.{GraftQuery, Tables}
import graft.converter.{SpanConverter, Spans}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The converter DAG exposed through the driver contract. Spans are
  * synthesized deterministically from `documents` (the driver ships no span
  * parquet), so results are stable across runs; correctness of the text
  * semantics is pinned by the ScalaTest suites over graft.core.text — these
  * registry entries carry rows-only checks (no SQL-expressible oracle).
  */
object Converter {

  /** Q40: full spans → ChatCompletion conversion (P1→A1→J3→F5/F3/J5→P2).
    * One row per converted training record. */
  private val q40 = GraftQuery(
    "q40_convert_spans",
    (spark, dir) => {
      val records = SpanConverter.convert(spark, Spans.synthesize(spark, dir).toDF)
      records.select(
        col("trace_id"), col("span_id"), col("agent_name"),
        col("finish_reason"), col("n_tool_calls"),
        size(col("messages")).as("n_messages"), col("valid"))
        .orderBy("trace_id", "span_id")
    },
    None,
    headline = true)

  /** Q41: agent distribution over converted records (A3,
    * `convert_spans_to_chatcompletion.py:1857-1877`). */
  private val q41 = GraftQuery(
    "q41_agent_distribution",
    (spark, dir) =>
      SpanConverter.convert(spark, Spans.synthesize(spark, dir).toDF)
        .groupBy("agent_name", "finish_reason")
        .count()
        .orderBy("agent_name", "finish_reason"),
    None)

  /** Q42: XML quality gate (P9/F13) over synthesized assistant content —
    * valid/invalid counts + first error kinds, the A4 stats rollup. */
  private val q42 = GraftQuery(
    "q42_xml_validation_stats",
    (spark, dir) => {
      TextFunctions.register(spark)
      Spans.synthesize(spark, dir).toDF
        .filter(col("output.content").isNotNull)
        .select(col("trace_id"),
          expr("xml_valid(output.content)").as("valid"),
          expr("size(xml_errors(output.content))").as("n_errors"))
        .groupBy("valid")
        .agg(count(lit(1)).as("n_spans"), sum(col("n_errors")).as("total_errors"))
        .orderBy("valid")
    },
    None)

  /** Q43: dialect rewriting (F11/F12) — every synthesized assistant output
    * re-emitted in each target dialect; md5 over the result pins the exact
    * bytes without storing them. */
  private val q43 = GraftQuery(
    "q43_dialect_convert",
    (spark, dir) => {
      TextFunctions.register(spark)
      val dialects = Seq("qwen", "minimax", "glm", "openrouter", "deepseek")
      Spans.synthesize(spark, dir).toDF
        .filter(col("span_id").endsWith("_gen_b"))
        .select(col("trace_id") +:
          dialects.map(d =>
            md5(expr(s"convert_dialect(output.content, '$d')")).as(s"${d}_md5")): _*)
        .orderBy("trace_id")
    },
    None)

  /** Q44: difficulty-answer parsing (F16) as a generator — one row per
    * parsed (difficulty, content) pair from a synthetic LLM response. */
  private val q44 = GraftQuery(
    "q44_parse_difficulty",
    (spark, dir) => {
      TextFunctions.register(spark)
      Tables.documents(spark, dir)
        .withColumn("resp", concat(
          lit("**EASY:** easy about "), col("doc_id"),
          lit("\n**MEDIUM:** medium about "), col("lang"),
          lit("\n**HARD:** hard "), substring(col("text"), 1, 20)))
        .select(col("doc_id"),
          explode(expr("parse_difficulty(resp)")).as("q"))
        .select(col("doc_id"), col("q._1").as("difficulty"), col("q._2").as("content"))
        .orderBy("doc_id", "difficulty")
    },
    // A real parse oracle: DuckDB (RE2) has no lookahead, so instead of the
    // engine's one-pass `(?=\*\*\w+:\*\*|$)` regex each difficulty is
    // extracted independently with the NEXT marker as its delimiter —
    // byte-identical results on this corpus. trim matches Scala's
    // String.trim (space/tab/newline/CR at both ends).
    Some("""
      WITH resp AS (
        SELECT doc_id,
               '**EASY:** easy about ' || doc_id || chr(10) ||
               '**MEDIUM:** medium about ' || lang || chr(10) ||
               '**HARD:** hard ' || substring(text, 1, 20) AS r
        FROM documents),
      parsed AS (
        SELECT doc_id, 'easy' AS difficulty,
               regexp_extract(r, '(?s)\*\*EASY:\*\*\s*(.*?)\*\*MEDIUM:\*\*', 1) AS content
        FROM resp
        UNION ALL
        SELECT doc_id, 'medium',
               regexp_extract(r, '(?s)\*\*MEDIUM:\*\*\s*(.*?)\*\*HARD:\*\*', 1)
        FROM resp
        UNION ALL
        SELECT doc_id, 'hard',
               regexp_extract(r, '(?s)\*\*HARD:\*\*\s*(.*)$', 1)
        FROM resp)
      SELECT doc_id, difficulty,
             trim(content, ' ' || chr(9) || chr(10) || chr(13)) AS content
      FROM parsed
      ORDER BY doc_id, difficulty"""))

  /** Q45: NexAU-mode conversion (tool calls stay inline; restore-only
    * path, the per-framework converter override). */
  private val q45 = GraftQuery(
    "q45_convert_nexau",
    (spark, dir) =>
      SpanConverter.convert(spark, Spans.synthesize(spark, dir).toDF, nexauMode = true)
        .toDF
        .select(
          col("trace_id"), col("span_id"), col("agent_name"),
          col("finish_reason"), size(col("messages")).as("n_messages"),
          md5(col("messages")(2).getField("content")).as("assistant_md5"),
          col("valid"))
        .orderBy("trace_id", "span_id"),
    None)

  /** Q46: record-level dialect map (F12) — NexAU-mode records (tool calls
    * still inline in content) converted per-message with the reference's
    * role scoping: system/assistant rewritten, user/tool untouched. md5
    * pins the exact post-conversion bytes per record and dialect. */
  private val q46 = GraftQuery(
    "q46_record_dialect",
    (spark, dir) => {
      import spark.implicits._
      val records = SpanConverter.convert(
        spark, Spans.synthesize(spark, dir).toDF, nexauMode = true)
      // One narrow pass computes every dialect (vs a per-dialect
      // self-join that would re-run the whole converter per dialect and
      // shuffle to re-align rows).
      val dialects = Seq("qwen", "glm", "deepseek")
      records.map { r =>
        val digests = dialects.map { d =>
          SpanConverter.md5Hex(SpanConverter.recordDialect(r, d)
            .messages.map(_.content.getOrElse("")).mkString(" "))
        }
        (r.trace_id, r.span_id, digests(0), digests(1), digests(2))
      }.toDF("trace_id", "span_id", "qwen_md5", "glm_md5", "deepseek_md5")
        .orderBy("trace_id", "span_id")
    },
    None)

  val all: Seq[GraftQuery] = Seq(q40, q41, q42, q43, q44, q45, q46)
}
