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
      ORDER BY doc_id"""))

  val all: Seq[GraftQuery] = Seq(q47, q48)
}
