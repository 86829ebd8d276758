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

  /** Compact a bucketed table in place — the maintenance pass every
    * append-heavy bucketed layout eventually needs: each bucketed
    * INSERT (AnnIndex.appendVectors, PostingsIndex.appendDocs, the
    * streaming curatedIndexed loop) adds its own file per touched
    * bucket, so a long-lived index accumulates files linear in the
    * append count — the classic small-files pathology (per-file open
    * cost and task overhead on every probe, even pruned ones). This
    * rewrites the table to ONE FILE PER BUCKET and restores the
    * engine's `graft.*` properties (collection stats, banding), so
    * probes before and after are row-identical (spec-pinned on both
    * index families) and append contracts keep holding.
    *
    * Mechanics worth stating: the snapshot is eagerly checkpointed
    * BEFORE the drop (the rewrite must not lazily re-read files it just
    * deleted — the saveIngestState rule), and the rewrite repartitions
    * on the bucket key with numBuckets partitions: repartition's
    * Murmur3 `pmod` IS the bucketing hash, so every bucket's rows land
    * in exactly one task and each task emits exactly one bucket file.
    * At 100 TB this is the standard compaction trade — one full rewrite
    * buys every subsequent probe a files-per-bucket floor of 1. */
  def compact(spark: SparkSession, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalStateException(
      s"$table is not bucketed — nothing to compact against"))
    val key = spec.bucketColumnNames.head
    val props = meta.properties.filter(_._1.startsWith("graft."))
    val snapshot = spark.table(table).localCheckpoint(true)
    writeBucketed(
      snapshot.repartition(spec.numBuckets, snapshot(key)),
      table, key, spec.numBuckets)
    if (props.nonEmpty)
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
        props.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ") + ")")
  }
}
