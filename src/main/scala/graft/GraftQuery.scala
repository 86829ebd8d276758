package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name    stable query id (also the output parquet dir name)
  * @param fn      (session, sfDir) => result DataFrame. Column names MUST
  *                match the oracle's aliases exactly (the driver sorts
  *                columns by name before hashing values).
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables (registered as bare table names). None => the
  *                driver records a weaker rows-only check.
  * @param headline whether Bench times this query per-round.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
