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

  /** Driver-side freshness signature of one table's data files — (name,
    * length, mtime) per file, sorted. Metadata-class (a local listing, no
    * Spark job): build-once consumers (Similarity.corpusCount's memo, the
    * index ensure-built memos) key on it so an in-process rewrite of the
    * dir invalidates them, while repeated reads of an unchanged dir stay
    * free. */
  private[graft] def listingSignature(dir: String, name: String): String = {
    val root = java.nio.file.Paths.get(dir, s"$name.parquet")
    if (!java.nio.file.Files.exists(root)) ""
    else
      // Files.walk must be closed (it holds directory handles), and a
      // file vanishing mid-listing is exactly the concurrent-rewrite
      // case the signature exists to catch — treat any listing race as
      // "changed" (a unique signature that matches no memo entry) rather
      // than crashing the caller or leaking the stream's fds.
      try scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator.asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => s"${root.relativize(p)}:${java.nio.file.Files.size(p)}:" +
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toSeq.sorted.mkString("|")
      }
      catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          s"listing-race:${java.util.UUID.randomUUID()}"
      }
  }

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which Spark
    * cannot read natively — surfaces as a nanos LongType under the legacy
    * switch) and TIMESTAMP(MICROS) (reads natively as TimestampType).
    * Dispatch on the loaded schema: nanos longs are truncated to micros
    * with integer division (matches DuckDB's ns->us truncation, and avoids
    * the double-precision loss of `/ 1000` on ~1.7e18 nanos values);
    * native timestamps pass through untouched.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The legacy-nanos switch is only consulted at parquet schema
    // conversion and has no per-read (DataFrameReader.option) form; guard
    // the session mutation so repeated loads don't re-write shared conf.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    normalizeEventTs(raw)
  }

  /** Normalize whatever `ts` type the parquet surfaced to a plain
    * TIMESTAMP: nanos LongType → integer-divide to micros;
    * TIMESTAMP_NTZ (isAdjustedToUTC=false files) → cast, which under the
    * UTC session timezone is value-preserving and matches DuckDB's naive
    * timestamp semantics. Keeps `unix_micros`/`date_trunc` callers
    * agnostic to how the driver generated the file. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
}
