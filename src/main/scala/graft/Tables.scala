package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided deterministic parquet tables
  * (TESTDATA.md). All reads are plain parquet scans so Catalyst pushes
  * filters/column pruning into the source; at cluster scale these would be
  * partitioned/bucketed tables but the read API is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  def region(s: SparkSession, d: String)     = table(s, d, "region")
  def nation(s: SparkSession, d: String)     = table(s, d, "nation")
  def customer(s: SparkSession, d: String)   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)   = table(s, d, "supplier")
  def part(s: SparkSession, d: String)       = table(s, d, "part")
  def orders(s: SparkSession, d: String)     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String)  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively; read it as a nanos long and truncate to microseconds with
    * integer division (matches DuckDB's ns->us truncation, and avoids the
    * double-precision loss of `/ 1000` on ~1.7e18 nanos values).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The legacy-nanos switch is only consulted at parquet schema
    // conversion and has no per-read (DataFrameReader.option) form; guard
    // the session mutation so repeated loads don't re-write shared conf.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
