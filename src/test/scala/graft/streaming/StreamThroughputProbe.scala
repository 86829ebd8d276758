package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only throughput/state-size probe for the stateful streaming twins
  * (AsOfStream, QuotaStream): 10⁶ events through each operator in 10
  * micro-batches, reporting wall, records/s, state rows, state bytes and
  * bytes/key from the engine's own StateOperatorProgress. Verifies the
  * documented state bounds (AsOf: O(retained versions + pending probes)
  * per key; Quota: two Longs per domain) with measured numbers.
  *
  * Usage: `sbt "Test/runMain graft.streaming.StreamThroughputProbe
  * [rocksdb] [section...]"` — sections: asof pack mix dedup dedup-expr
  * dedup-state dedup-state-cap8 dedup-sparse dedup-sparse-rocks decontam classifier
  * decontam-hoisted quota chain chain-quality chain-retrieval
  * (no args = all; unknown names abort).
  * CAVEAT (round-16 lesson): same-JVM comparisons BETWEEN sections
  * carry a section-order JIT bias of ~10% — the later section runs
  * warmer. To compare two sections, run each alone in a fresh JVM
  * (the batch probes' rule) and compare the isolated min-of-N. The `rocksdb` flag runs
  * every selected section under RocksDBStateStoreProvider — the
  * documented PRODUCTION default for the stateful twins (round-14
  * measurement: identical wall, 10× lower state memory; see SCALING.md
  * round 15) — and tags each report line `[rocksdb]`. Note the provider
  * is checkpoint-bound in real deployments: this probe's streams are
  * throwaway, so flipping it here is safe.
  * Each section runs SPARK_GRAFT_STREAM_REPS
  * times (default 3) with pinned micro-batch count/size, and the final
  * `[streamprobe-best]` lines report the BEST run per section — the
  * min-of-N rule the batch harness uses (a transient can only ADD time),
  * which round 13's single-run rows lacked (run-to-run spread ~2×).
  * The dedup-expr / dedup-state pair decomposes DedupStream's cost:
  * expr = signatures+banding only (stateless noop sink); state = the
  * same row volume and bucket keyspace through flatMapGroupsWithState
  * with signatures replaced by 12 substrings of one md5 (trivial
  * expression cost). Test scope, not shipped. */
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

    val known = Set("asof", "pack", "mix", "dedup", "dedup-expr",
      "dedup-state", "dedup-state-cap8", "dedup-sparse",
      "dedup-sparse-rocks", "decontam", "decontam-hoisted", "quota", "chain",
      "classifier", "chain-quality", "chain-retrieval", "rollover",
      "chain-indexed", "chain-band")
    val rocksAll = args.contains("rocksdb")
    if (rocksAll)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val only = args.toSet - "rocksdb"
    val unknown = only -- known
    require(unknown.isEmpty,
      s"unknown section(s) ${unknown.mkString(", ")}; known: ${known.toSeq.sorted.mkString(", ")}")
    val reps = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPS", "3").toInt
    val best = scala.collection.mutable.LinkedHashMap.empty[String, (Double, String)]

    def section(name: String)(body: => Unit): Unit =
      if (only.isEmpty || only(name)) (1 to reps).foreach(_ => body)

    def reportPlain(name0: String, wallS: Double, line: String): Unit = {
      val name = if (rocksAll) s"$name0 [rocksdb]" else name0
      println(s"[streamprobe] $name: $line")
      if (best.get(name).forall(wallS < _._1)) best(name) = (wallS, line)
    }

    def report(name: String, q: org.apache.spark.sql.streaming.StreamingQuery,
        wallS: Double, nIn: Long, nKeys: Long): Unit = {
      val so = q.lastProgress.stateOperators
      val rows = if (so.isEmpty) -1L else so(0).numRowsTotal
      val bytes = if (so.isEmpty) -1L else so(0).memoryUsedBytes
      reportPlain(name, wallS,
        f"$nIn%d events in $wallS%.2f s = " +
        f"${nIn / wallS}%.0f rec/s; state rows=$rows bytes=$bytes " +
        f"(${if (rows > 0) bytes.toDouble / rows else 0}%.0f B/row, $nKeys keys)")
    }

    // ---- AsOfStream: 500k versions + 500k probes over 10k keys --------
    section("asof") {
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
    section("pack") {
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
    section("mix") {
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
      reportPlain("mix 1M (50 sources)", wall,
        f"1000000 events in $wall%.2f s = ${1000000 / wall}%.0f rec/s; " +
        s"admitted=$emitted (driver state: 50 Longs)")
      q.stop()
    }

    // ---- DedupStream: 100k docs through the MinHash band pipeline ------
    // shared generator: 12 words from a 400-word pool, every 10th doc a
    // near-dup of its predecessor — sparse buckets, some candidates
    val dedupWords = (0 until 400).map(i => s"w$i")
    // pooled text: only ~400 distinct texts — every bucket saturates at
    // maxPerBucket, the documented worst case
    def pooledText(base: Long): String =
      (0 until 12).map(j =>
        dedupWords(((base * 31 + j * 7) % 400).toInt)).mkString(" ")
    // unique text: id-derived tokens — sparse buckets, the expected case
    def uniqueText(base: Long): String =
      (0 until 12).map(j => s"u${base}x$j").mkString(" ")

    def dedupBatch(b: Int, text: Long => String): Seq[(Long, String)] =
      (0 until 10000).map { i =>
        val id = b * 10000L + i
        val base = if (i % 10 == 9) id - 1 else id // every 10th a near-dup
        (id, text(base))
      }

    def dedupRun(name: String, pipe: DataFrame => DataFrame,
        text: Long => String = pooledText): Unit = {
      val in = MemoryStream[(Long, String)]
      val q = pipe(in.toDF().toDF("doc_id", "text"))
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData(dedupBatch(b, text))
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report(name, q, wall, 100000L, -1L)
      q.stop()
    }

    section("dedup") {
      dedupRun("dedup 100k (minhash bands)",
        docs => DedupStream.nearDupCandidates(docs).toDF())
    }

    // expression cost alone: signatures + banding, stateless sink
    section("dedup-expr") {
      dedupRun("dedup-expr 100k (sigs+bands, no state)",
        docs => DedupStream.bandRows(DedupStream.signatures(docs)).toDF())
    }

    // state cost alone: same row volume + bucket keyspace (docs with equal
    // text still collide in all four bands), signatures replaced by 12
    // substrings of ONE md5 — trivial expression cost, so the measured
    // wall is the flatMapGroupsWithState + state-store side
    section("dedup-state") {
      dedupRun("dedup-state 100k (fake sigs, full state)", { docs =>
        val fakeSigs = docs
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.expr(
              "transform(sequence(1, 12), i -> substring(md5(text), 1, 8))")
              .as("sigs"))
        DedupStream.candidates(DedupStream.bandRows(fakeSigs)).toDF()
      })
    }

    // realistic-occupancy run: mostly-unique docs keep buckets sparse
    // (occupancy 1-2) — the regime banding is designed for, vs the
    // pooled generator's every-bucket-at-cap worst case
    section("dedup-sparse") {
      dedupRun("dedup-sparse 100k (unique docs)",
        docs => DedupStream.nearDupCandidates(docs).toDF(), uniqueText)
    }

    // same sparse run under the RocksDB state store provider — the
    // documented Spark remedy when per-batch HDFSBackedStateStore
    // maintenance dominates at large key counts
    section("dedup-sparse-rocks") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try dedupRun("dedup-sparse-rocks 100k (unique docs)",
        docs => DedupStream.nearDupCandidates(docs).toDF(), uniqueText)
      finally if (!rocksAll) // keep the global flag's provider in force
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    // state cost with small buckets: if wall tracks maxPerBucket, the
    // dominant cost is re-encoding/rewriting the whole bucket VALUE per
    // arrival, not the per-row store round trip
    section("dedup-state-cap8") {
      dedupRun("dedup-state-cap8 100k (fake sigs, maxPerBucket=8)", { docs =>
        val fakeSigs = docs
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.expr(
              "transform(sequence(1, 12), i -> substring(md5(text), 1, 8))")
              .as("sigs"))
        DedupStream.candidates(DedupStream.bandRows(fakeSigs),
          maxPerBucket = 8).toDF()
      })
    }

    // ---- DecontamStream: 1M docs vs a 1k-doc benchmark (stateless) ----
    section("decontam") {
      import spark.implicits._
      // benchmark: 1k docs of 16 tokens from a "bench" namespace; stream
      // docs are 16 unique tokens each, every 50th carrying a benchmark
      // doc's text verbatim (planted contamination, ~2%)
      def benchText(k: Long): String =
        (0 until 16).map(j => s"bm${k}t$j").mkString(" ")
      val benchDf = (0 until 1000).map(k => (k.toLong, benchText(k)))
        .toDF("doc_id", "text")
      val bg = DecontamStream.benchmarkGrams(spark, benchDf) // materialized inside
      val in = MemoryStream[(Long, String)]
      var verdicts = 0L
      var contaminated = 0L
      val q = DecontamStream.writer(in.toDF().toDF("doc_id", "text"), bg) {
        (v, _) =>
          val c = v.agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum(
                org.apache.spark.sql.functions.when(
                  org.apache.spark.sql.functions.col("contaminated"), 1L)
                  .otherwise(0L)),
              org.apache.spark.sql.functions.lit(0L))).head()
          verdicts += c.getLong(0); contaminated += c.getLong(1)
      }.start()
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          val txt = if (i % 50 == 49) benchText(id % 1000)
                    else (0 until 16).map(j => s"u${id}x$j").mkString(" ")
          (id, txt)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      reportPlain("decontam 1M (1k-doc benchmark)", wall,
        f"1000000 events in $wall%.2f s = ${1000000 / wall}%.0f rec/s; " +
        s"verdicts=$verdicts contaminated=$contaminated (state: none)")
      q.stop()
    }

    // ---- ClassifierStream: 1M docs scored by TRAINED literal weights --
    section("classifier") {
      import spark.implicits._
      // weights through the real training path on a small separable
      // labeled corpus (training cost is q131's probe story, not this
      // section's — here it is one-time setup)
      val trainDocs = (0 until 2000).map { i =>
        val words =
          if (i % 4 == 0) (0 until 16).map(j => s"g${(i + j) % 32}")
          else (0 until 16).map(j => s"b${(i + j) % 64}")
        (i.toLong, words.mkString(" "), if (i % 4 == 0) "src0" else "src1")
      }.toDF("doc_id", "text", "source")
      val w = graft.queries.Text.perceptronTrain(
        graft.queries.Text.perceptronDb(spark, trainDocs))
      val in = MemoryStream[(Long, String)]
      val q = ClassifierStream.verdicts(in.toDF().toDF("doc_id", "text"), w)
        .writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          (id, (0 until 16).map(j => s"u${id}x$j").mkString(" "))
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      reportPlain("classifier 1M (trained literal weights)", wall,
        f"1000000 events in $wall%.2f s = ${1000000 / wall}%.0f rec/s " +
        "(stateless narrow map, state: none)")
      q.stop()
    }

    // ---- Streaming index ingestion, UNGATED vs CONTENT-GATED: what the
    // q126 gate (fingerprint + bloom probe + exact anti-join + sealed-
    // store append) costs the curatedIndexed loop per batch, measured on
    // the same stream shape. Both variants run per rep (same-JVM order
    // bias ~10% — read the ratio, not the absolutes).
    section("chain-indexed") {
      import spark.implicits._
      val t0ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val nBatches = 10
      val perBatch = 20000
      def batch(b: Int): Seq[(Long, java.sql.Timestamp, String, String)] =
        (0 until perBatch).map { i =>
          val id = b * perBatch.toLong + i
          (id, t0ts, s"src${id / 20}",
            (0 until 8).map(j => s"ci${id}x$j").mkString(" "))
        }
      def drive(name: String,
          mk: org.apache.spark.sql.DataFrame =>
            org.apache.spark.sql.streaming.DataStreamWriter[
              org.apache.spark.sql.Row]): Unit = {
        val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
        val q = mk(in.toDF().toDF("doc_id", "ts", "source", "text")).start()
        val t0 = System.nanoTime()
        for (b <- 0 until nBatches) {
          in.addData(batch(b): _*); q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        q.stop()
        val n = nBatches.toLong * perBatch
        reportPlain(name, wall,
          f"$n%d docs in $wall%.2f s = ${n / wall}%.0f rec/s")
      }
      graft.sources.PostingsIndex.build(spark, "/root/testdata/sf0.001",
        "tp_idx_plain", corpusPred = org.apache.spark.sql.functions.lit(false),
        buckets = 16)
      drive("chain-indexed (ungated)",
        docs => CurationChain.curatedIndexed(docs, "tp_idx_plain"))
      graft.sources.PostingsIndex.build(spark, "/root/testdata/sf0.001",
        "tp_idx_gated", corpusPred = org.apache.spark.sql.functions.lit(false),
        buckets = 16)
      graft.queries.Curation.sealStore("tp_sealed",
        Seq.empty[String].toDF("text")
          .select(graft.queries.Curation.bowFingerprint.as("fp")),
        buckets = 16)
      val bloom = spark.range(1)
        .select(org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("id")).as("h"))
        .stat.bloomFilter("h", nBatches.toLong * perBatch, 0.01)
      drive("chain-indexed (q126 content gate)",
        docs => CurationChain.curatedGatedIndexed(docs, "tp_sealed",
          "tp_idx_gated", bloom, capacity = nBatches.toLong * perBatch))
    }

    // ---- chain-band: what the NEAR-DUP gate costs the indexing loop —
    // the chain-indexed comparison extended to the fourth family: per
    // batch the band gate pays shingle+minhash banding, the size-routed
    // store probe (20k docs → 80k band rows → the full metadata-scale
    // scan route), the within-batch smaller-id self-join, the anti-join,
    // and the O(admitted) band append. All texts unique → the gate
    // admits everything, so this measures the gate's FULL bill with no
    // drop savings (the conservative number). Compare against
    // chain-indexed's isolated runs (fresh JVM each, the session-order
    // rule).
    section("chain-band") {
      import spark.implicits._
      val t0ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val nBatches = 10
      val perBatch = 20000
      graft.sources.BandIndex.build(spark, "/root/testdata/sf0.001",
        "tp_bands", corpusPred = org.apache.spark.sql.functions.lit(false),
        buckets = 16)
      val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
      val q = CurationChain.curatedBandIndexed(
        in.toDF().toDF("doc_id", "ts", "source", "text"), "tp_bands")()
        .start()
      val t0 = System.nanoTime()
      for (b <- 0 until nBatches) {
        in.addData((0 until perBatch).map { i =>
          val id = b * perBatch.toLong + i
          (id, t0ts, s"src${id / 20}",
            (0 until 8).map(j => s"cb${id}x$j").mkString(" "))
        }: _*)
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      q.stop()
      val n = nBatches.toLong * perBatch
      reportPlain("chain-band (near-dup gate)", wall,
        f"$n%d docs in $wall%.2f s = ${n / wall}%.0f rec/s")
    }

    // ---- Retrain ROLLOVER downtime: the deployment cost of swapping the
    // classifier's literal weights by restarting the chain query on the
    // same checkpoint (ClassifierStream's documented rollover contract,
    // ClassifierStreamSpec pins the semantics) — measured with REALISTIC
    // state under RocksDB: 500k dedup keys + quota/pack state populated
    // before the swap, then stop → start(new weights) → first batch.
    // What the numbers decompose into: `stop` is Spark's query shutdown;
    // `restart` is planning + RocksDB store re-open from the checkpoint
    // (the state survives on disk, nothing is rebuilt); `first batch`
    // carries the store load and the new plan's first JIT pass, compared
    // against the steady-state batch wall right before the stop.
    section("rollover") {
      import spark.implicits._
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
        val ckpt = java.nio.file.Files.createTempDirectory("rollprobe").toString
        val t0ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
        def start(w: Array[Long]) = CurationChain.curatedQualityPacked(
            in.toDF().toDF("doc_id", "ts", "source", "text"), w)
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        def batch(b: Int): Seq[(Long, java.sql.Timestamp, String, String)] =
          (0 until 100000).map { i =>
            val id = b * 100000L + i
            (id, t0ts, s"src${id % 500}",
              (0 until 16).map(j => s"u${id}x$j").mkString(" "))
          }
        val wOld = Array.fill(256)(1L)
        val wNew = Array.fill(256)(3L)
        val q1 = start(wOld)
        var steadyS = 0.0
        for (b <- 0 until 5) {
          in.addData(batch(b): _*)
          val t0 = System.nanoTime()
          q1.processAllAvailable()
          steadyS = (System.nanoTime() - t0) / 1e9
        }
        val so = q1.lastProgress.stateOperators
        val stateRows = so.map(_.numRowsTotal).sum
        val tStop0 = System.nanoTime()
        q1.stop()
        val stopS = (System.nanoTime() - tStop0) / 1e9
        val tRe0 = System.nanoTime()
        val q2 = start(wNew)
        val restartS = (System.nanoTime() - tRe0) / 1e9
        in.addData(batch(5): _*)
        val tFb0 = System.nanoTime()
        q2.processAllAvailable()
        val firstS = (System.nanoTime() - tFb0) / 1e9
        q2.stop()
        reportPlain("rollover (chain, RocksDB, 500k-key state)",
          stopS + restartS + firstS,
          f"steady batch ${steadyS}%.2f s | stop ${stopS}%.2f s + " +
          f"restart ${restartS}%.2f s + first batch ${firstS}%.2f s " +
          f"= ${stopS + restartS + firstS}%.2f s rollover wall " +
          f"(state rows=$stateRows across ${so.length} operators)")
      } finally
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    // ---- DecontamStream, HOISTED-DISTINCT variant — the round-15
    // advice's suggested spelling, MEASURED AND REJECTED in round 16
    // (SCALING.md): distinct+checkpoint once at stream start, batches
    // join the checkpointed frame. Kept inline so the comparison stays
    // reproducible against the shipped per-batch `decontam` section
    // (which measured ~13% faster: the per-batch aggregate gives AQE a
    // freshly-stated build side to broadcast; this variant joins a bare
    // checkpoint scan and parks a second gram-set copy in block store).
    section("decontam-hoisted") {
      import spark.implicits._
      def benchText(k: Long): String =
        (0 until 16).map(j => s"bm${k}t$j").mkString(" ")
      val benchDf = (0 until 1000).map(k => (k.toLong, benchText(k)))
        .toDF("doc_id", "text")
      val bg = DecontamStream.benchmarkGrams(spark, benchDf)
      val benchDistinct = bg.select("gram").distinct().localCheckpoint(true)
      val in = MemoryStream[(Long, String)]
      var verdicts = 0L
      val q = in.toDF().toDF("doc_id", "text")
        .writeStream.foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val v = DecontamStream.verdictsOnDistinct(batch, benchDistinct)
            val c = v.agg(org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)),
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.sum(
                  org.apache.spark.sql.functions.when(
                    org.apache.spark.sql.functions.col("contaminated"), 1L)
                    .otherwise(0L)),
                org.apache.spark.sql.functions.lit(0L))).head()
            verdicts += c.getLong(0)
        }.start()
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          val txt = if (i % 50 == 49) benchText(id % 1000)
                    else (0 until 16).map(j => s"u${id}x$j").mkString(" ")
          (id, txt)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      reportPlain("decontam-hoisted 1M (1k-doc benchmark)", wall,
        f"1000000 events in $wall%.2f s = ${1000000 / wall}%.0f rec/s; " +
        s"verdicts=$verdicts (hoisted distinct+checkpoint — rejected variant)")
      q.stop()
    }

    // ---- QuotaStream: 1M docs over 20k domains ------------------------
    section("quota") {
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
    // ---- CurationChain: 1M docs, dedup -> quota -> pack in ONE plan ----
    // 5% of each batch re-delivers earlier doc_ids (the dedup stage's
    // work), 20k sources (the quota/pack keyspace). Measures the
    // COMPOSED cost against the individual quota/pack sections above —
    // the delta is the dedup stage + the extra exchange, not a new
    // state regime.
    section("chain") {
      val in = MemoryStream[(Long, Timestamp, String, String)]
      val q = CurationChain.curatedPacked(
          in.toDF().toDF("doc_id", "ts", "source", "text"))
        .writeStream.format("noop").outputMode("append").start()
      val nKeys = 20000L
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val fresh = b * 95000L + (i % 95000)
          val id = if (i >= 95000) math.max(0L, fresh - 95000L) else fresh
          (id, new Timestamp(3600000L * b),
            s"s${id % nKeys}", s"w${id} x y z")
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val so = q.lastProgress.stateOperators
      reportPlain("chain 1M (dedup->quota->pack, 20k sources)", wall,
        f"1000000 events in $wall%.2f s = ${1000000L / wall}%.0f rec/s; " +
        s"state ops=${so.length} rows=${so.map(_.numRowsTotal).mkString("/")} " +
        s"bytes=${so.map(_.memoryUsedBytes).sum}")
      q.stop()
    }

    // ---- Chain + plan-native classifier gate (curatedQualityPacked) ----
    section("chain-quality") {
      // trained weights over a tiny separable corpus (setup, not timed);
      // the probe stream's texts are all "junk"-class so roughly half the
      // quota-kept docs pass the gate only if their tokens collide into
      // positive buckets — use good-vocab text on even ids so the gate
      // does real selective work on a realistic ~50% pass rate
      val trainDocs2 = (0 until 2000).map { i =>
        val words =
          if (i % 4 == 0) (0 until 8).map(j => s"g${(i + j) % 32}")
          else (0 until 8).map(j => s"b${(i + j) % 64}")
        (i.toLong, words.mkString(" "), if (i % 4 == 0) "src0" else "src1")
      }.toDF("doc_id", "text", "source")
      val w2 = graft.queries.Text.perceptronTrain(
        graft.queries.Text.perceptronDb(spark, trainDocs2))
      val in = MemoryStream[(Long, Timestamp, String, String)]
      val q = CurationChain.curatedQualityPacked(
          in.toDF().toDF("doc_id", "ts", "source", "text"), w2)
        .writeStream.format("noop").outputMode("append").start()
      val nKeys = 20000L
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          val txt =
            if (id % 2 == 0) (0 until 4).map(j => s"g${(id + j) % 32}").mkString(" ")
            else (0 until 4).map(j => s"b${(id + j) % 64}").mkString(" ")
          (id, new Timestamp(3600000L * b), s"s${id % nKeys}", txt)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val so = q.lastProgress.stateOperators
      reportPlain("chain-quality 1M (dedup->quota->classifier->pack)", wall,
        f"1000000 events in $wall%.2f s = ${1000000L / wall}%.0f rec/s; " +
        s"state ops=${so.length} rows=${so.map(_.numRowsTotal).mkString("/")}")
      q.stop()
    }

    // ---- Chain + retrieval-verdict splice (curatedRetrievalVerdicts) ----
    section("chain-retrieval") {
      import spark.implicits._
      // fixed benchmark: 100 items × 10 rare terms (the eval-set-bounded
      // query side); every 100th stream doc embeds two bench terms so
      // the per-batch BM25 rendezvous does real selective work
      val bench = (0 until 100).map(b =>
          (100000000L + b, (0 until 10).map(j => s"bench${b}t$j").mkString(" ")))
        .toDF("doc_id", "text")
      val in = MemoryStream[(Long, Timestamp, String, String)]
      var verdicts = 0L
      var flagged = 0L
      val q = CurationChain.curatedRetrievalVerdicts(
          in.toDF().toDF("doc_id", "ts", "source", "text"), bench) { (df, _) =>
        import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
        val f = df.groupBy().agg(
          count(lit(1)),
          coalesce(sum(when(
            org.apache.spark.sql.functions.col("flagged"), 1L)
            .otherwise(0L)), lit(0L))).head()
        verdicts += f.getLong(0); flagged += f.getLong(1)
      }.start()
      val nKeys = 20000L
      val t0 = System.nanoTime()
      for (b <- 0 until 10) {
        in.addData((0 until 100000).map { i =>
          val id = b * 100000L + i
          val txt =
            if (id % 100 == 0)
              s"bench${id % 100000 / 1000}t1 bench${id % 100000 / 1000}t2 w$id x y"
            else s"w$id x y z"
          (id, new Timestamp(3600000L * b), s"s${id % nKeys}", txt)
        })
        q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      reportPlain("chain-retrieval 1M (dedup->quota->BM25 verdict splice)", wall,
        f"1000000 events in $wall%.2f s = ${1000000L / wall}%.0f rec/s; " +
        s"verdicts=$verdicts flagged=$flagged")
      q.stop()
    }

    best.foreach { case (name, (_, line)) =>
      println(s"[streamprobe-best] $name: $line")
    }
    spark.stop()
  }
}
