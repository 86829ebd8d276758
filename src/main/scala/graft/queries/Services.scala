package graft.queries

import graft.{GraftQuery, Tables}
import graft.services.{StubServiceClient, UrlPipeline}
import org.apache.spark.sql.functions._

/** X3 URL-pipeline queries. The chain (extract → HEAD validate → ≤3
  * repair attempts → rewrite) runs record-locally inside mapPartitions
  * against the deterministic [[StubServiceClient]]; every stub decision is
  * an md5-keyed draw, so the SAME decisions are computable in DuckDB SQL
  * and the whole control flow is hash-checked, not just row-counted.
  *
  * Synthetic corpus: every document gets one primary URL; every third
  * document a second (mirror) URL — so single-URL, multi-URL, kept,
  * repaired (first/second candidate), and removed (irreparable verdict
  * and exhausted-candidates) paths all occur at any SF.
  */
object Services {

  private val U = Sampling.Rand

  /** SQL for the stub's 80% HEAD-accessible draw over an expression. */
  private def okSql(u: String): String =
    s"${U.u32Sql(s"md5('head:' || $u)")} % 5 != 0"

  /** SQL for the stub's 25% irreparable draw. */
  private def hopelessSql(u: String): String =
    s"${U.u32Sql(s"md5('repair:' || $u)")} % 4 = 0"

  /** SQL for the first accessible fix candidate (NULL when both fail). */
  private def fixedSql(u: String): String =
    s"""CASE WHEN ${okSql(s"($u || '#fix1')")} THEN $u || '#fix1'
             WHEN ${okSql(s"($u || '#fix2')")} THEN $u || '#fix2' END"""

  /** Shared synthetic query/URL corpus CTE. */
  private val corpusSql =
    """q AS (
      SELECT doc_id,
             'Analyze https://data.example.org/doc' || doc_id ||
               CASE WHEN doc_id % 3 = 0
                    THEN ' and https://mirror.example.net/d' || doc_id
                    ELSE '' END || ' please' AS query,
             'https://data.example.org/doc' || doc_id AS url1,
             CASE WHEN doc_id % 3 = 0
                  THEN 'https://mirror.example.net/d' || doc_id END AS url2
      FROM documents)"""

  private def syntheticQueries(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(
          lit("Analyze https://data.example.org/doc"), col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" and https://mirror.example.net/d"), col("doc_id")))
            .otherwise(lit("")),
          lit(" please")).as("query"))
      // the single-file test source scans as ONE partition; the chain is
      // service-bound per row in production, so spread it explicitly
      // (bounded per-partition concurrency × many partitions)
      .repartition(spark.sparkContext.defaultParallelism)

  /** Q47: per-URL chain verdicts — kept / repaired / removed, the URL that
    * replaces it, and how many repair consultations it took. */
  private val q47 = GraftQuery(
    "q47_url_pipeline",
    (spark, dir) => {
      import spark.implicits._
      syntheticQueries(spark, dir).as[(Long, String)]
        .mapPartitions { it =>
          val client = StubServiceClient
          it.flatMap { case (id, q) =>
            UrlPipeline.processQuery(q, "english", client).outcomes.map(o =>
              (id, o.url, o.outcome, o.final_url.getOrElse(""), o.repair_attempts))
          }
        }
        .toDF("doc_id", "url", "outcome", "final_url", "repair_attempts")
        .orderBy("doc_id", "url")
    },
    Some(s"""
      WITH $corpusSql,
      u AS (
        SELECT doc_id,
               unnest(CASE WHEN url2 IS NULL THEN [url1] ELSE [url1, url2] END) AS url
        FROM q),
      o AS (
        SELECT doc_id, url,
               ${okSql("url")} AS ok,
               ${hopelessSql("url")} AS hopeless,
               ${fixedSql("url")} AS fixed
        FROM u)
      SELECT doc_id, url,
             CASE WHEN ok THEN 'kept'
                  WHEN NOT hopeless AND fixed IS NOT NULL THEN 'repaired'
                  ELSE 'removed' END AS outcome,
             CASE WHEN ok THEN url
                  WHEN NOT hopeless AND fixed IS NOT NULL THEN fixed
                  ELSE '' END AS final_url,
             CAST(CASE WHEN ok THEN 0
                       WHEN hopeless THEN 1
                       WHEN fixed IS NOT NULL THEN 1
                       ELSE 2 END AS INT) AS repair_attempts
      FROM o
      ORDER BY doc_id, url"""))

  /** Q48: per-query url_stats + the rewritten query — the metadata struct
    * the reference's router attaches (`router_agent.py:152-163`). */
  private val q48 = GraftQuery(
    "q48_url_stats",
    (spark, dir) => {
      import spark.implicits._
      syntheticQueries(spark, dir).as[(Long, String)]
        .mapPartitions { it =>
          val client = StubServiceClient
          it.map { case (id, q) =>
            val p = UrlPipeline.processQuery(q, "english", client)
            (id, p.stats.total_extracted, p.stats.accessible,
              p.stats.repaired, p.stats.removed, p.processed_query)
          }
        }
        .toDF("doc_id", "n_extracted", "n_accessible", "n_repaired",
          "n_removed", "processed_query")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $corpusSql,
      r AS (
        SELECT doc_id, query, url1, url2,
               ${okSql("url1")} AS ok1,
               CASE WHEN ${okSql("url1")} THEN url1
                    WHEN ${hopelessSql("url1")} THEN NULL
                    ELSE ${fixedSql("url1")} END AS repl1,
               url2 IS NOT NULL AND ${okSql("url2")} AS ok2,
               CASE WHEN url2 IS NULL THEN NULL
                    WHEN ${okSql("url2")} THEN url2
                    WHEN ${hopelessSql("url2")} THEN NULL
                    ELSE ${fixedSql("url2")} END AS repl2
        FROM q)
      SELECT doc_id,
             CAST(CASE WHEN url2 IS NULL THEN 1 ELSE 2 END AS INT) AS n_extracted,
             CAST((CASE WHEN ok1 THEN 1 ELSE 0 END) +
                  (CASE WHEN ok2 THEN 1 ELSE 0 END) AS INT) AS n_accessible,
             CAST((CASE WHEN NOT ok1 AND repl1 IS NOT NULL THEN 1 ELSE 0 END) +
                  (CASE WHEN url2 IS NOT NULL AND NOT ok2 AND repl2 IS NOT NULL
                        THEN 1 ELSE 0 END) AS INT) AS n_repaired,
             CAST((CASE WHEN NOT ok1 AND repl1 IS NULL THEN 1 ELSE 0 END) +
                  (CASE WHEN url2 IS NOT NULL AND NOT ok2 AND repl2 IS NULL
                        THEN 1 ELSE 0 END) AS INT) AS n_removed,
             replace(
               replace(query, url1, coalesce(repl1, '[URL removed]')),
               coalesce(url2, chr(1)),
               coalesce(repl2, '[URL removed]')) AS processed_query
      FROM r
      ORDER BY doc_id"""),
    headline = true)

  /** Q49: the X4 file-provisioning chain at file grain. Synthetic corpus:
    * every even document is file-dependent with one https URL; every tenth
    * also plans an http:// URL (exercising the downloader's https-only
    * rejection) and every fourth a base64 data: URL (the local-decode
    * branch). Odd documents are classified not-file-dependent and produce
    * no rows. All stub verdicts are md5-keyed, so statuses, byte counts
    * and content digests are hash-checked in DuckDB. */
  private val q49 = GraftQuery(
    "q49_file_provisioning",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          concat(
            lit("Process doc"), col("doc_id"),
            when(col("doc_id") % 2 === 0, concat(
              lit(" dataset from https://files.example.org/f"), col("doc_id"), lit(".csv"),
              when(col("doc_id") % 10 === 0,
                concat(lit(" and http://insecure.example/x"), col("doc_id"), lit(".bin")))
                .otherwise(lit("")),
              when(col("doc_id") % 4 === 0,
                concat(lit(" and data:text/csv;base64,"),
                  base64(concat(lit("id,"), col("doc_id")).cast("binary"))))
                .otherwise(lit(""))))
              .otherwise(lit(" with no files")))
            .as("query"))
        // same single-partition-source consideration as syntheticQueries
        .repartition(spark.sparkContext.defaultParallelism)
        .as[(Long, String)]
        .mapPartitions { it =>
          val client = StubServiceClient
          it.flatMap { case (id, q) =>
            graft.services.FilePipeline.provision(q, "graft", "english", client)
              .files.map(f => (id, f.url, f.local_path, f.status,
                f.error.orNull, f.n_bytes, f.content_md5.orNull))
          }
        }
        .toDF("doc_id", "url", "local_path", "status", "error",
          "n_bytes", "content_md5")
        .orderBy("doc_id", "url")
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id,
               'https://files.example.org/f' || doc_id || '.csv' AS https_url,
               CASE WHEN doc_id % 10 = 0
                    THEN 'http://insecure.example/x' || doc_id || '.bin' END AS http_url,
               CASE WHEN doc_id % 4 = 0
                    THEN 'data:text/csv;base64,' || to_base64(encode('id,' || doc_id)) END AS data_url
        FROM documents WHERE doc_id % 2 = 0),
      planned AS (
        SELECT doc_id,
               unnest(list_filter([
                 {'url': https_url, 'kind': 'https',
                  'fname': 'f' || doc_id || '.csv'},
                 {'url': http_url, 'kind': 'http',
                  'fname': 'x' || doc_id || '.bin'},
                 {'url': data_url, 'kind': 'data',
                  'fname': 'data_' || (CASE WHEN http_url IS NULL THEN 1 ELSE 2 END) || '.csv'}
               ], s -> s.url IS NOT NULL)) AS f
        FROM base),
      rows_out AS (
        SELECT doc_id, f.url AS url,
               'downloads/graft/bundle/' || f.fname AS local_path,
               CASE f.kind
                 WHEN 'https' THEN CASE WHEN ${U.u32Sql("md5('get:' || f.url)")} % 5 != 0
                                        THEN 'downloaded' ELSE 'failed' END
                 WHEN 'http' THEN 'failed'
                 ELSE 'downloaded' END AS status,
               CASE f.kind
                 WHEN 'https' THEN CASE WHEN ${U.u32Sql("md5('get:' || f.url)")} % 5 != 0
                                        THEN NULL ELSE 'HTTP 404' END
                 WHEN 'http' THEN 'unsupported URL scheme: http'
                 ELSE NULL END AS error,
               CASE f.kind
                 WHEN 'https' THEN CASE WHEN ${U.u32Sql("md5('get:' || f.url)")} % 5 != 0
                                        THEN strlen('content:' || f.url) ELSE 0 END
                 WHEN 'http' THEN 0
                 ELSE strlen('id,' || doc_id) END AS n_bytes,
               CASE f.kind
                 WHEN 'https' THEN CASE WHEN ${U.u32Sql("md5('get:' || f.url)")} % 5 != 0
                                        THEN md5('content:' || f.url) END
                 WHEN 'http' THEN NULL
                 ELSE md5('id,' || doc_id) END AS content_md5
        FROM planned)
      SELECT doc_id, url, local_path, status, error,
             CAST(n_bytes AS INT) AS n_bytes, content_md5
      FROM rows_out
      ORDER BY doc_id, url"""),
    headline = true)

  /** Q66 (F15): trace-id extraction from agent run logs
    * (`run_end_to_end.py:270-277` — `re.search(r"LangfuseTraceID:\s*(...)")`
    * over the whole log, first match wins, absent on no match). Synthetic
    * corpus: every 3k document's log carries the marker once (an md5 id,
    * hex ⊂ the allowed charset); every 3k+1 document twice, the first id
    * stopping at an out-of-charset underscore (first-match + charset-stop
    * in one row); the rest carry no marker (NULL). DuckDB rebuilds the
    * same logs and runs the same pattern, so the regex semantics — not
    * just the expected answers — are hash-checked. */
  private val q66 = GraftQuery(
    "q66_trace_id_extract",
    (spark, dir) => {
      val logs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("boot doc"), col("doc_id"),
              lit("\nLangfuseTraceID: trace-"), md5(col("doc_id").cast("string")),
              lit("\nend")))
          .when(col("doc_id") % 3 === 1,
            concat(lit("LangfuseTraceID:  run_"), col("doc_id"),
              lit("\nLangfuseTraceID: second-"), col("doc_id")))
          .otherwise(concat(lit("no marker doc"), col("doc_id"))).as("log"))
      graft.services.TraceFetcher.extractTraceId(logs)
        .select("doc_id", "trace_id").orderBy("doc_id")
    },
    Some("""
      WITH logs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'boot doc' || doc_id || chr(10) ||
                         'LangfuseTraceID: trace-' || md5(CAST(doc_id AS VARCHAR)) ||
                         chr(10) || 'end'
                    WHEN doc_id % 3 = 1
                    THEN 'LangfuseTraceID:  run_' || doc_id || chr(10) ||
                         'LangfuseTraceID: second-' || doc_id
                    ELSE 'no marker doc' || doc_id END AS log
        FROM documents)
      SELECT doc_id,
             nullif(regexp_extract(log, 'LangfuseTraceID:\s*([a-zA-Z0-9-]+)', 1),
                    '') AS trace_id
      FROM logs ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q47, q48, q49, q66)
}
