package graft.queries

import graft.GraftQuery
import graft.multimodal.BinaryOps
import org.apache.spark.sql.functions._

/** Multimodal operators through the driver contract. q50's scalar columns
  * (byte length, payload md5, frame count) are oracle-checkable because the
  * synthetic payload is the document's UTF-8 bytes; the histogram/thumbnail
  * features are stub-decoder outputs pinned by BinaryOpsSpec (rows-only
  * here). */
object Multimodal {

  /** Q50: binary payload scalar features — oracle-backed. */
  private val q50 = GraftQuery(
    "q50_media_bytes",
    (spark, dir) => {
      val media = BinaryOps.synthesize(spark, dir)
      media.toDF
        .select(
          col("media_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          (length(col("payload")).cast("long") / 256).cast("int").as("n_frames"),
          col("format"))
        .orderBy("media_id")
    },
    Some("""
      SELECT doc_id AS media_id,
             strlen(text) AS n_bytes,
             md5(text) AS payload_md5,
             CAST(strlen(text) // 256 AS INTEGER) AS n_frames,
             CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format
      FROM documents
      ORDER BY media_id"""))

  /** Q51: batched stub-decode features aggregated per format — the
    * mapPartitions pipeline exercised end-to-end. The stub codec is
    * deterministic integer math over the payload bytes, so the oracle
    * mirrors it in SQL (the q65-style md5-replay idea, arithmetic
    * flavor): n_frames = bytes div 256, thumbnail length = ⌈bytes/4⌉,
    * and histogram bucket 6 (high nibble 0x6) counts exactly the ASCII
    * characters `` ` ``–`o` — UTF-8 multibyte sequences only use bytes
    * ≥ 0x80, so a regex over characters reproduces the byte-level count. */
  private val q51 = GraftQuery(
    "q51_media_features",
    (spark, dir) => {
      val feats = BinaryOps.extractFeatures(BinaryOps.synthesize(spark, dir))
      val media = BinaryOps.synthesize(spark, dir).toDF.select("media_id", "format")
      feats.toDF.join(media, "media_id")
        .groupBy("format")
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("n_frames")).as("total_frames"),
          sum(col("thumb_bytes")).as("total_thumb_bytes"),
          sum(element_at(col("histogram"), 7)).as("bucket6_total"))
        .orderBy("format")
    },
    Some("""
      SELECT CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
             count(*) AS n_media,
             CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
             CAST(sum(strlen(text) // 256) AS BIGINT) AS total_frames,
             CAST(sum((strlen(text) + 3) // 4) AS BIGINT) AS total_thumb_bytes,
             CAST(sum(length(regexp_replace(text, '[^`a-o]', '', 'g'))) AS BIGINT) AS bucket6_total
      FROM documents
      GROUP BY 1
      ORDER BY format"""))

  val all: Seq[GraftQuery] = Seq(q50, q51)
}
