package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic + plan checks for the round-12 operators: q89 bigram-LM
  * familiarity, q90 token-budget sharding (+ writer), q91 domain
  * frequency capping, q92 perceptual media near-dup. Hash-level
  * correctness runs against the DuckDB oracle; these pin semantics
  * against independent driver-side recomputations, the plan properties
  * the scale stories depend on, and (q92) a crafted near-dup fixture the
  * organic testdata lacks. */
class R12OpsSpec extends SparkSpec {

  private def docs: Seq[(Long, String, String)] =
    graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sortBy(_._1)

  test("q89 matches a brute-force bigram-LM scoring") {
    val bigrams = for {
      (id, t, _) <- docs
      toks = t.split(" ", -1).toSeq
      if toks.length >= 2
      bg <- toks.zip(toks.tail)
    } yield (id, bg)
    val train = bigrams.filter(_._1 % 10 == 0).map(_._2)
    val c2 = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expect = bigrams.filter(_._1 % 10 != 0).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (id, bgs) =>
        val ps = bgs.map(b => c2.get(b._2).map(_.toDouble / c1(b._2._1)))
        val psum = ps.flatten.sorted.foldLeft(0.0)(_ + _)
        val nOov = ps.count(_.isEmpty).toLong
        (id, bgs.size.toLong, nOov, nOov.toDouble / bgs.size, psum / bgs.size)
      }
    val got = SparkEntry.queries("q89_lm_familiarity")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
    assert(expect.exists(_._3 > 0), "fixture must exercise OOV bigrams")
    assert(expect.exists(_._5 > 0), "fixture must exercise in-model bigrams")
  }

  test("q89 plan joins the corpus bigram stream exactly once") {
    // the model is denormalized (c1 folded onto the bigram rows) at train
    // time, so the CORPUS-side stream meets exactly one join — a second
    // corpus join would double the shuffled volume at 100 TB. Two joins
    // total: model-build (tiny) + corpus-vs-model.
    val plan = SparkEntry.queries("q89_lm_familiarity")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val joins = "(?i)(sortmergejoin|broadcasthashjoin|shuffledhashjoin)".r
      .findAllIn(plan).size
    assert(joins == 2, s"expected 2 joins, got $joins in:\n$plan")
  }

  test("q90 shard assignment is greedy, contiguous, and token-complete") {
    val b = 2048L
    val manifest = SparkEntry.queries("q90_token_shards")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val bySource = manifest.groupBy(_._1)
    val totals = docs.groupBy(_._3).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    bySource.foreach { case (src, shards) =>
      val sorted = shards.sortBy(_._2)
      // shards numbered contiguously from 0
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      // token-complete: manifest accounts for every token of the source
      assert(sorted.map(_._4).sum == totals(src))
      // greedy budget: every non-final shard's cumulative end crosses its
      // budget boundary (the next shard's first doc started past it)
      val cums = sorted.map(_._4).scanLeft(0L)(_ + _).drop(1)
      sorted.dropRight(1).zip(cums).foreach { case (s, cumEnd) =>
        assert(cumEnd >= (s._2 + 1) * b,
          s"$src shard ${s._2} ends at $cumEnd < budget ${(s._2 + 1) * b}")
      }
      // doc_id ranges are ordered and disjoint across consecutive shards
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(a._6 < c._5)
        case _           => ()
      }
    }
  }

  test("q90 writeShards layout matches the manifest") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Curation.writeShards(spark, sfDir, out)
    // partition discovery infers the `shard` directory values as int —
    // normalize to long for the comparison
    val back = spark.read.parquet(out)
      .groupBy(col("source"), col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val manifest = SparkEntry.queries("q90_token_shards")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(back == manifest)
  }

  test("q91 matches a brute-force domain cap and the cap binds") {
    val k = 20
    val byDomain = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (id, _) => math.sqrt((id % 10000).toDouble).toLong }
    val expect = byDomain.toSeq.sortBy(_._1).map { case (dom, ds) =>
      val kept = ds.sortBy { case (id, nc) => (-nc, id) }.take(k)
      (dom, ds.length.toLong, kept.length.toLong,
        ds.map(_._2).sum, kept.map(_._2).sum)
    }
    val got = SparkEntry.queries("q91_domain_cap")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    assert(expect.exists(d => d._3 < d._2),
      "fixture must contain a domain the cap actually bites")
  }

  test("q92 finds crafted near-dup payloads and rejects unrelated ones") {
    // organic sf0.001/sf0.01 documents share no 64-byte blocks, so the
    // production fixture exercises only the empty result; craft a corpus
    // where A/B differ in ONE block (near-dup), C is A's exact copy, and
    // the rest are unrelated. Fixed-block SimHash must pair (A,B), (A,C),
    // (B,C) and nothing else at Hamming <= 3.
    val base = ("x" * 63 + " ") * 8 // 512 bytes = 8 aligned blocks
    val nearDup = base.substring(0, 448) + ("y" * 63 + " ") // last block differs
    val rows = Seq(
      (0L, base), (1L, nearDup), (2L, base),
      (3L, ("z" * 31 + " ") * 16), (4L, "entirely different content here")
    ).map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("q92fix").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q92_media_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = got.map(p => (p._1, p._2)).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"got ${got.mkString(",")}")
    // exact copies at distance 0; the one-block edit within the radius
    assert(got.find(p => (p._1, p._2) == ((0L, 2L))).get._3 == 0L)
    assert(got.find(p => (p._1, p._2) == ((0L, 1L))).get._3 <= 3L)
  }

  /** Reference BPE trainer: greedy left-to-right non-overlapping merge
    * application, overlap-counted adjacent pairs (the string-replace
    * semantics the engine implements via double-space separators). */
  private def bruteBpe(
      corpus: Seq[String], nMerges: Int): Seq[(Long, String, String, Long)] = {
    def applyMerge(sy: List[String], l: String, r: String): List[String] =
      sy match {
        case a :: b :: rest if a == l && b == r => (l + r) :: applyMerge(rest, l, r)
        case a :: rest                          => a :: applyMerge(rest, l, r)
        case Nil                                => Nil
      }
    val words = corpus.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    var vocab: Seq[(List[String], Long)] =
      words.map { case (w, f) => w.map(_.toString).toList -> f }
    val merges = (1 to nMerges).iterator.map { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((sy, f) <- vocab; Seq(a, b) <- sy.sliding(2) if sy.length >= 2)
        counts((a, b)) += f
      if (counts.isEmpty) None
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.map { case (sy, f) => (applyMerge(sy, l, r), f) }
        Some((step.toLong, l, r, n))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
    lastBpeVocab = vocab.map { case (sy, _) => (sy.mkString, sy.length.toLong) }.toMap
    merges
  }

  /** Final word -> symbol-count map of the last bruteBpe run (the merged
    * symbols concatenate back to the word, so mkString recovers it). */
  private var lastBpeVocab: Map[String, Long] = Map.empty

  test("q93 matches a brute-force BPE trainer on the corpus") {
    val expect = bruteBpe(docs.map(_._2), 8)
    val got = SparkEntry.queries("q93_bpe_merges")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    assert(expect.map(t => t._2 + t._3).distinct.size == 8)
  }

  test("q93 merge application is greedy non-overlapping (the 'a a a' case)") {
    // one doc of a triple-repeat word: pair (z,z) counts 2 (overlap-
    // counted) but only ONE merge applies per scan, so step 2 must see
    // (zz, z), not (zz, zz)
    val rows = Seq((0L, "zzz zzz qq", "en", "synthetic", 10L))
    val dir = java.nio.file.Files.createTempDirectory("q93fix").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q93_bpe_merges")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == bruteBpe(Seq("zzz zzz qq"), 8))
    assert(got.head._2 == "z" && got.head._3 == "z" && got.head._4 == 4L)
    assert(got(1) == ((2L, "zz", "z", 2L)))
  }

  test("q94 resynchronizes after an insertion where fixed blocks cannot") {
    // B = 7-byte prefix + A: every fixed 64-byte block of B differs from
    // A's (the shift is not a multiple of the block size), but CDC cut
    // positions are content-determined, so boundaries past the first cut
    // realign and the chunk streams share everything except the head.
    val a = docs.maxBy(_._2.length)._2
    val rows = Seq((0L, a), (1L, "PREFIX!" + a))
      .map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("q94fix").toString
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cdc = SparkEntry.queries("q94_cdc_chunk_dedup")(spark, dir)
      .select("media_id", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val Seq(ca, cb) = Seq(0L, 1L).map(id => cdc.filter(_._1 == id).map(_._2).toSet)
    val shared = (ca intersect cb).size
    assert(ca.size >= 4, s"fixture doc too short to chunk (${ca.size} chunks)")
    assert(shared >= ca.size - 2,
      s"CDC failed to resync: $shared shared of ${ca.size}")
    // the fixed-block contrast: q88 on the same corpus shares NOTHING
    // (every block of B is shifted by 7 bytes)
    val fixedCopies = SparkEntry.queries("q88_media_chunk_dedup")(spark, dir)
      .select("n_copies").collect().map(_.getLong(0))
    assert(fixedCopies.forall(_ == 1L),
      "fixed-block chunking unexpectedly survived the shift")
  }

  test("q94 chunk streams reassemble to the payload (partition property)") {
    // chunks are a PARTITION of the byte stream: lengths sum to the doc
    // length and every doc is covered
    val got = SparkEntry.queries("q94_cdc_chunk_dedup")(spark, sfDir)
      .groupBy("media_id").agg(sum("chunk_len").as("n"), count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = docs.filter(_._2.nonEmpty).map(d => d._1 -> d._2.length.toLong).toMap
    assert(got == expect)
  }

  test("q95 tokenizer application matches the brute-force trained vocab") {
    bruteBpe(docs.map(_._2), 8)
    val vocab = lastBpeVocab
    val expect = docs.map { case (id, t, _) =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(vocab).sum)
    }.filter(_._2 > 0).map { case (id, nw, nc, nt) =>
      (id, nw, nc, nt, nc.toDouble / nt) }
    val got = SparkEntry.queries("q95_bpe_tokenize")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
    // the 8 merges must actually compress: strictly fewer tokens than chars
    assert(got.forall(d => d._4 < d._3))
  }

  test("q96 matches a brute-force PMI-ratio ranking") {
    val allToks = docs.map(_._2.split(" ", -1).toSeq)
    val uni = allToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allToks.map(_.size.toLong).sum
    val big = allToks.filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 5)
    val expect = big.toSeq.map { case ((w1, w2), c12) =>
      (w1, w2, c12, uni(w1), uni(w2), c12.toDouble * n / (uni(w1).toDouble * uni(w2)))
    }.sortBy { case (w1, w2, _, _, _, r) => (-r, w1, w2) }.take(50)
    val got = SparkEntry.queries("q96_collocations")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
    assert(expect.head._6 > 1.0, "top collocation must beat independence")
  }

  test("q96 top-k compiles to TakeOrderedAndProject, never a global sort") {
    val s = SparkEntry.queries("q96_collocations")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k heaps:\n$s")
  }

  test("q92 candidate join is keyed (no cartesian) and verifies exactly") {
    val plan = SparkEntry.queries("q92_media_phash_neardup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"),
      s"all-pairs join in q92 plan:\n$plan")
  }
}
