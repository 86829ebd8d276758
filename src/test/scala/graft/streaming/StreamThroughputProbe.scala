package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only throughput/state-size probe for the stateful streaming twins
  * (AsOfStream, QuotaStream): 10⁶ events through each operator in 10
  * micro-batches, reporting wall, records/s, state rows, state bytes and
  * bytes/key from the engine's own StateOperatorProgress. Verifies the
  * documented state bounds (AsOf: O(retained versions + pending probes)
  * per key; Quota: two Longs per domain) with measured numbers.
  * Test scope, not shipped. */
object StreamThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def report(name: String, q: org.apache.spark.sql.streaming.StreamingQuery,
        wallS: Double, nIn: Long, nKeys: Long): Unit = {
      val so = q.lastProgress.stateOperators
      val rows = if (so.isEmpty) -1L else so(0).numRowsTotal
      val bytes = if (so.isEmpty) -1L else so(0).memoryUsedBytes
      println(f"[streamprobe] $name: $nIn%d events in $wallS%.2f s = " +
        f"${nIn / wallS}%.0f rec/s; state rows=$rows bytes=$bytes " +
        f"(${if (rows > 0) bytes.toDouble / rows else 0}%.0f B/row, $nKeys keys)")
    }

    // ---- AsOfStream: 500k versions + 500k probes over 10k keys --------
    {
      val pIn = MemoryStream[AsOfStream.Probe]
      val vIn = MemoryStream[AsOfStream.Version]
      val q = AsOfStream.enrich(pIn.toDS(), vIn.toDS(), lateness = "10 minutes")
        .writeStream.format("noop").outputMode("append").start()
      val nKeys = 10000L
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        val base = b * 3600000L // one hour per batch -> watermark advances
        vIn.addData((0 until 50000).map { i =>
          val k = i % nKeys
          AsOfStream.Version(k, new Timestamp(base + i / 100), b * 50000L + i)
        })
        pIn.addData((0 until 50000).map { i =>
          val k = i % nKeys
          AsOfStream.Probe(b * 50000L + i, k, new Timestamp(base + 250 + i / 100))
        })
        q.processAllAvailable()
      }
      // flush: advance the watermark far enough to ripen every probe
      vIn.addData(AsOfStream.Version(-1L, new Timestamp(12L * 3600000L), -1L))
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      report("asof 1M (10k keys)", q, wall, 1000000L, nKeys)
      q.stop()
    }

    // ---- PackStream: 1M docs over 1k streams ---------------------------
    {
      val in = MemoryStream[(Long, String, Long)]
      val q = PackStream.packed(in.toDF().toDF("doc_id", "source", "n_tok"))
        .writeStream.format("noop").outputMode("append").start()
      val nKeys = 1000L
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          (id, s"s${id % nKeys}", 50L + id % 300)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("pack 1M (1k streams)", q, wall, 1000000L, nKeys)
      q.stop()
    }

    // ---- MixStream: 1M docs over 50 sources (driver-state foreachBatch) -
    {
      val in = MemoryStream[(Long, String, Long)]
      var emitted = 0L
      val q = MixStream.writer(in.toDF().toDF("doc_id", "source", "n_tok")) {
        (admitted, _) => emitted += admitted.count()
      }.start()
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          (id, s"s${id % 50}", 50L + id % 300)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streamprobe] mix 1M (50 sources): 1000000 events in " +
        f"$wall%.2f s = ${1000000 / wall}%.0f rec/s; admitted=$emitted " +
        "(driver state: 50 Longs)")
      q.stop()
    }

    // ---- DedupStream: 100k docs through the MinHash band pipeline ------
    {
      val in = MemoryStream[(Long, String)]
      val q = DedupStream.nearDupCandidates(
          in.toDF().toDF("doc_id", "text"))
        .writeStream.format("noop").outputMode("append").start()
      // synthetic docs: 12 words from a 400-word pool, every 10th doc a
      // near-dup of its predecessor — sparse buckets, some candidates
      val words = (0 until 400).map(i => s"w$i")
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 10000).map { i =>
          val id = b * 10000L + i
          val base = if (i % 10 == 9) id - 1 else id
          val txt = (0 until 12).map(j =>
            words(((base * 31 + j * 7) % 400).toInt)).mkString(" ")
          (id, txt)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("dedup 100k (minhash bands)", q, wall, 100000L, -1L)
      q.stop()
    }

    // ---- QuotaStream: 1M docs over 20k domains ------------------------
    {
      val in = MemoryStream[(Long, Long, Long)]
      val q = QuotaStream.capped(
          in.toDF().toDF("doc_id", "domain", "n_chars"))
        .writeStream.format("noop").outputMode("append").start()
      val nKeys = 20000L
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          (id, id % nKeys, 100L + id % 400)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("quota 1M (20k domains)", q, wall, 1000000L, nKeys)
      q.stop()
    }
    spark.stop()
  }
}
