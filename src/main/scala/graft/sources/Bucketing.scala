package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins: writing both sides of a
  * recurring equi-join bucketed by the join key lets every subsequent join
  * run shuffle-free (each bucket pair joins locally). This is THE layout
  * decision for a 100 TB fact⋈fact join that runs daily — pay one write,
  * skip the exchange on every read. Bucketing requires a saveAsTable
  * warehouse (bucket metadata lives in the catalog, not the files).
  */
object Bucketing {

  /** Write `df` bucketed by `key` into the session catalog. Drops any
    * previous incarnation first: an in-memory catalog forgets tables
    * between sessions while their warehouse directories persist, and
    * saveAsTable refuses a "new" table whose location already exists. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val leftover = new java.io.File(
      new java.io.File(warehouse.getPath), table.toLowerCase).toPath
    if (java.nio.file.Files.exists(leftover)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(leftover).iterator.asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — with matching bucket
    * counts Catalyst plans a SortMergeJoin with NO exchange on either
    * side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
