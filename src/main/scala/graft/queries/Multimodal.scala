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

  /** Q88: content-addressed chunk dedup over binary payloads — the
    * fixed-size-block dedup pattern of CAS/backup systems applied to a
    * media corpus: slice every payload into 64-byte blocks, hash each,
    * count content copies across the corpus. At 100 TB this is how
    * shared media (re-encoded thumbnails, repeated intro frames,
    * re-uploaded assets) is found without ever comparing payloads
    * pairwise: one corpus-linear flatMap (q83's chunking shape, binary
    * flavor) and ONE keyed shuffle on the chunk hash, whose md5 keyspace
    * is unbounded so occupancy tracks true duplication at any scale.
    * Block size is a parameter — 64 B here for testdata granularity, MBs
    * for real video.
    *
    * Oracle-expressible because the synthetic payload is the document's
    * UTF-8 bytes and the corpus is ASCII (strlen == length verified), so
    * DuckDB's char-substring md5 equals Spark's byte-substring md5. */
  private val q88 = GraftQuery(
    "q88_media_chunk_dedup",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val media = BinaryOps.synthesize(spark, dir).toDF
        .filter(length(col("payload")) > 0)
        .select(col("media_id"), col("payload"))
      val chunks = media
        .withColumn("chunk_idx",
          explode(expr("sequence(0, CAST((length(payload) + 63) div 64 AS INT) - 1)")))
        .select(col("media_id"), col("chunk_idx"),
          md5(expr("substring(payload, chunk_idx * 64 + 1, 64)")).as("chunk_md5"))
      chunks
        .withColumn("n_copies",
          count(lit(1)).over(Window.partitionBy("chunk_md5")).cast("long"))
        .orderBy("media_id", "chunk_idx")
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, text FROM documents WHERE strlen(text) > 0),
      c AS (
        SELECT media_id,
               CAST(unnest(generate_series(0,
                 CAST((strlen(text) + 63) // 64 AS INTEGER) - 1)) AS INTEGER) AS chunk_idx,
               text
        FROM m),
      h AS (
        SELECT media_id, chunk_idx,
               md5(substring(text, chunk_idx * 64 + 1, 64)) AS chunk_md5
        FROM c)
      SELECT media_id, chunk_idx, chunk_md5,
             CAST(count(*) OVER (PARTITION BY chunk_md5) AS BIGINT) AS n_copies
      FROM h
      ORDER BY media_id, chunk_idx"""),
    headline = true)

  val all: Seq[GraftQuery] = Seq(q50, q51, q88)
}
