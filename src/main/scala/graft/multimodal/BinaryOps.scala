package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in batches via mapPartitions
  * (the JVM analogue of the Arrow-batched python UDF path). The actual
  * media decode is STUBBED — this container ships no image/audio codecs —
  * behind [[FakeCodec]], a deterministic stand-in; everything Spark-side
  * (schema, batching, partitioning, feature shape) is real and tested.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no string
  * round-trip); feature extraction is a narrow map over batches, so the
  * only shuffle in a typical featurize→cluster pipeline is the final
  * aggregation. Batch size trades task-heap high-water mark against
  * per-batch overhead — 64 rows of ~1 MB payloads ≈ 64 MB per in-flight
  * batch per core.
  */
object BinaryOps extends Serializable {

  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,  // "img" | "audio" | "video" (synthetic)
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      histogram: Array[Long], // 16 buckets over the high nibble
      n_frames: Int,
      thumb_bytes: Int)

  /** STUB decoder — deterministic byte-level fakes in place of real codecs.
    * A production build swaps this trait implementation for one backed by
    * javax.imageio / ffmpeg without touching the pipeline below. */
  object FakeCodec {
    /** "decode + histogram": 16 buckets over the high nibble of each byte. */
    def histogram(payload: Array[Byte]): Array[Long] = {
      val h = new Array[Long](16)
      payload.foreach(b => h((b & 0xff) >> 4) += 1)
      h
    }

    /** "frame count": synthetic 256-byte frames. */
    def frameCount(payload: Array[Byte]): Int = payload.length / 256

    /** "resize": keep every 4th byte — stands in for a real downscale. */
    def thumbnail(payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte]((payload.length + 3) / 4)
      var i = 0
      while (i < out.length) { out(i) = payload(i * 4); i += 1 }
      out
    }
  }

  /** Synthesize a media table from `documents` (text bytes stand in for
    * the opaque payload; metadata derived deterministically). */
  def synthesize(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val fmt = (id % 3) match {
          case 0 => "img"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, payload, fmt, 64 + (id % 64).toInt, 64 + (id % 48).toInt)
      }
  }

  /** Batched feature extraction: mapPartitions with explicit micro-batches
    * (the batch loop is where an Arrow/vectorized codec call would go). */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "codec call" per batch, not per row
        batch.map { m =>
          MediaFeatures(
            m.media_id,
            m.payload.length.toLong,
            FakeCodec.histogram(m.payload),
            FakeCodec.frameCount(m.payload),
            FakeCodec.thumbnail(m.payload).length)
        }
      }
    }
  }
}
