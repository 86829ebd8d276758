package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic checks for the dedup + ANN batch on sf0.001 (hash-level
  * correctness runs against the DuckDB oracle). */
class DedupSimilaritySpec extends SparkSpec {

  test("q27 winnowing detects every pair sharing a >= 55-char verbatim run") {
    // the winnowing guarantee (W=48, K=8): any shared substring of length
    // >= W+K-1 yields a shared selected fingerprint — verified against a
    // brute-force driver-side scan for common 55-char substrings
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val L = 55
    val bySub = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, t) =>
      (0 to t.length - L).foreach { i =>
        bySub.getOrElseUpdate(t.substring(i, i + L), scala.collection.mutable.Set.empty) += id
      }
    }
    val exact = (for {
      ids <- bySub.valuesIterator if ids.size > 1
      s = ids.toSeq.sorted
      a <- s; b <- s if a < b
    } yield (a, b)).toSet
    val got = SparkEntry.queries("q27_substring_dedup")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(got), s"winnowing missed: ${exact -- got}")
    assert(exact.nonEmpty, "corpus must contain at least one long verbatim run")
    // and every reported pair shares at least one exact 48-char window
    SparkEntry.queries("q27_substring_dedup")(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= 1)
    }
  }

  test("q28 duplicated spans are well-formed and cover exactly q27's later docs") {
    val spans = SparkEntry.queries("q28_dup_spans")(spark, sfDir).collect()
    assert(spans.nonEmpty)
    // well-formed, and non-overlapping per doc (gap-merge guarantees it)
    spans.groupBy(_.getAs[Long]("doc_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("span_start"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("span_start") >= 1)
        assert(r.getAs[Long]("span_end") > r.getAs[Long]("span_start"))
        assert(r.getAs[Long]("n_windows") >= 1)
      }
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1).getAs[Long]("span_start") > pair(0).getAs[Long]("span_end"),
          s"overlapping spans: ${pair(0)} / ${pair(1)}")
      }
    }
    // keep-first policy: a doc has duplicated spans iff it is the LATER
    // side of at least one q27 pair
    val q28Docs = spans.map(_.getAs[Long]("doc_id")).toSet
    val q27Later = SparkEntry.queries("q27_substring_dedup")(spark, sfDir)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(q28Docs == q27Later,
      s"q28-only: ${q28Docs -- q27Later}; q27-only: ${q27Later -- q28Docs}")
  }

  test("q52 strips exactly the q28 spans: char accounting, pass-through, no residual runs") {
    val cleaned = SparkEntry.queries("q52_strip_dup_spans")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("dropped_chars")))
      .sortBy(_._1)
    val orig = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned.length == orig.size, "every document must come through")
    cleaned.foreach { case (id, ct, nSpans, dropped) =>
      assert(orig(id).length - ct.length == dropped,
        s"doc $id: dropped_chars=$dropped but lengths differ by ${orig(id).length - ct.length}")
      if (nSpans == 0) assert(ct == orig(id), s"doc $id altered without spans")
      else assert(dropped > 0, s"doc $id claims $nSpans spans but dropped 0 chars")
    }
    // keep-first policy, end to end: after stripping, no cleaned document
    // shares a >= 55-char verbatim run with any EARLIER original document
    // (the winnowing guarantee says any such run would have produced a
    // flagged fingerprint, hence a span covering its core)
    val L = 55
    val earlier = scala.collection.mutable.Map.empty[String, Long]
    cleaned.foreach { case (id, ct, _, _) =>
      (0 to ct.length - L).foreach { i =>
        val s = ct.substring(i, i + L)
        val hit = earlier.get(s)
        assert(hit.isEmpty,
          s"doc $id still shares a 55-char run with earlier doc ${hit.getOrElse(-1L)}")
      }
      val t = orig(id)
      (0 to t.length - L).foreach { i =>
        val s = t.substring(i, i + L)
        if (!earlier.contains(s)) earlier(s) = id
      }
    }
  }

  test("q30 minhash pairs are symmetric-free and above threshold") {
    val rows = SparkEntry.queries("q30_minhash_lsh_dedup")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("q30 LSH candidates recover all high-jaccard pairs (recall vs exact)") {
    // Exact all-pairs word-shingle jaccard >= 0.5 on the tiny SF.
    val toks = split(col("text"), " ")
    val sh = graft.Tables.documents(spark, sfDir)
      .filter(size(toks) >= 3)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))).as("sh"))
    val jac = size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
      size(array_union(col("a.sh"), col("b.sh")))
    val exact = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), jac.as("j"))
      .filter(col("j") >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q30_minhash_lsh_dedup")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands x 3 rows: P(collide) at j=0.5 is ~1-(1-0.125)^4 = 0.41 per pair,
    // but true near-dups here have j>0.9 => P ~ 1-(1-0.73)^4 > 0.994.
    val high = exact // all exact pairs in this data are j>0.9 (bimodal)
    assert(high.subsetOf(lsh), s"LSH missed pairs: ${high -- lsh}")
  }

  test("q67 pairs are a subset of exact q32 with identical jaccard values") {
    // q67 = q32's similarity space behind LSH blocking: the LSH only
    // decides which pairs are LOOKED AT, the shared verify decides what
    // is emitted — so every q67 row must appear in exact q32's output
    // with the same (bit-identical) jaccard
    val exact = SparkEntry.queries("q32_ngram_jaccard_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("q67_lsh_jaccard_dedup")(spark, sfDir).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key), s"q67 emitted $key not in exact q32")
      assert(exact(key) == r.getDouble(2),
        s"jaccard mismatch for $key: exact ${exact(key)} vs lsh ${r.getDouble(2)}")
    }
  }

  test("q68 source-overlap matrix accounts for every q30 pair exactly once") {
    val pairs = SparkEntry.queries("q30_minhash_lsh_dedup")(spark, sfDir).collect()
    val audit = SparkEntry.queries("q68_source_overlap")(spark, sfDir).collect()
    // the audit is a partition of the verified pair stream: totals match
    assert(audit.map(_.getAs[Long]("n_pairs")).sum == pairs.length,
      "sum of per-source-pair counts must equal the q30 pair count")
    // source pairs are canonically ordered, so each cell appears once
    val cells = audit.map(r => (r.getString(0), r.getString(1)))
    assert(cells.distinct.length == cells.length)
    assert(cells.forall { case (a, b) => a <= b })
    // max_jaccard never exceeds the global max and respects q30's threshold
    val maxJ = pairs.map(_.getAs[Double]("jaccard")).max
    assert(audit.forall { r =>
      val m = r.getAs[Double]("max_jaccard"); m >= 0.5 && m <= maxJ
    })
  }

  test("q34 brute-force knn returns 5 ranked neighbors per query") {
    val df = SparkEntry.queries("q34_knn_bruteforce")(spark, sfDir)
    val perQuery = df.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach(r => assert(r.getAs[Long]("count") == 5))
    // cosine must be within [-1, 1]
    df.collect().foreach(r => {
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0001 && c <= 1.0001)
    })
  }

  test("q35 ANN results are a subset-ranking consistent with brute force") {
    val bf = SparkEntry.queries("q34_knn_bruteforce")(spark, sfDir)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = SparkEntry.queries("q35_ann_lsh")(spark, sfDir).collect()
    ann.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      // every ANN cosine must equal the exact cosine for that pair when the
      // pair also appears in the brute-force top-5
      bf.get(key).foreach(exact => assert(exact == r.getAs[Double]("cosine")))
    }
    // sanity: ANN produced some candidates
    assert(ann.nonEmpty)
  }

  test("q38 int8 quantization preserves the exact top-5 ranking (recall vs q34)") {
    val exact = SparkEntry.queries("q34_knn_bruteforce")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = SparkEntry.queries("q38_quantized_ann")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 over 64 dims: quantization noise is ~0.4% of cosine — at most a
    // boundary neighbor swap. Require recall@5 >= 0.9 overall.
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@5 = $recall")
    // and the quantized scores stay true cosines
    SparkEntry.queries("q38_quantized_ann")(spark, sfDir).collect().foreach { r =>
      val c = r.getAs[Double]("qcosine")
      assert(c >= -1.0001 && c <= 1.0001)
    }
  }

  test("q125 LSH hard negatives: recall@3 vs exact q122, identical cosines on shared pairs") {
    val exact = SparkEntry.queries("q122_hard_negatives")(spark, sfDir)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("q125_hard_negatives_lsh")(spark, sfDir).collect()
    // the q112 audit rule: LSH candidates are a subset, and every pair
    // the LSH path surfaces that the exact path also ranks must carry
    // the IDENTICAL exact cosine (same fold, same arithmetic)
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exact.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
      // the cross-label contract survives the candidate swap
      assert(r.getAs[Any]("query_label") != r.getAs[Any]("neighbor_label"))
    }
    val lshPairs = lsh.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact.keySet & lshPairs).size.toDouble / exact.size
    // 8 OR-amplified 4-BIT tables (NOT q35's 4x8): hard negatives live at
    // lower cosine than same-label neighbors, where 8-bit bands almost
    // never collide (measured recall 0.03 under 4x8) — the short-band
    // high-amplification shape is what makes this bound reachable
    assert(recall >= 0.5, s"LSH hard-negative recall@3 = $recall")
    assert(lsh.nonEmpty)
  }

  test("q132 triplets: positive is the same-label argmax, negatives match q122 " +
      "exactly, margins are the literal cosine differences") {
    val rows = SparkEntry.queries("q132_contrastive_triplets")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("positive_id"),
        r.getAs[Long]("negative_id"), r.getAs[Int]("neg_rank"),
        r.getAs[Double]("pos_cosine"), r.getAs[Double]("neg_cosine"),
        r.getAs[Double]("margin")))
    assert(rows.nonEmpty)
    // the negatives ARE q122's output: same pairs, same ranks, same cosines
    val q122 = SparkEntry.queries("q122_hard_negatives")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("cosine"))).toMap
    rows.foreach { case (q, _, n, nr, _, nc, _) =>
      val (r122, c122) = q122((q, n))
      assert(r122 == nr && c122 == nc,
        s"triplet negative ($q, $n) disagrees with q122: ($r122, $c122) vs ($nr, $nc)")
    }
    // the positive is the same-label argmax: strictly better than any
    // other same-label candidate (recomputed from q34's full exact list
    // is not available at k=5 depth, so verify the margin identity and
    // per-anchor uniqueness instead, plus sign: a positive should sit
    // ABOVE the cross-label boundary for most anchors on this corpus)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).distinct.length == 1, s"anchor $q has two positives")
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length).toSeq,
        s"anchor $q negative ranks not dense")
    }
    rows.foreach { case (_, _, _, _, pc, nc, m) =>
      assert(m == pc - nc, "margin must be the literal IEEE difference")
    }
  }

  test("q125 adaptive banding resolves to the oracle SQL's 8x4 at both test corpora") {
    // q125's Spark side derives (tables, bits) from the corpus count but
    // its oracle SQL is STATIC at 8x4 — this is the tripwire that makes a
    // testdata resize fail here by name instead of as a silent oracle
    // hash mismatch. Embeddings: sf0.01 = 500 vecs, sf0.1 = 2000 vecs.
    assert(Similarity.adaptiveBanding(500L) == ((8, 4)))
    assert(Similarity.adaptiveBanding(2000L) == ((8, 4)))
    // the SAME count the live entry point sizes against (raw parquet
    // rows via Similarity.corpusCount) — spec and lshTopKAdaptive can
    // never straddle a banding boundary on different counts
    val here = Similarity.corpusCount(spark, sfDir)
    assert(Similarity.adaptiveBanding(here) == ((8, 4)),
      s"this corpus ($here vecs) no longer resolves to the static oracle banding — " +
        "regenerate q125's oracle SQL at the new (tables, bits)")
  }

  test("adaptive banding: anchor balance + occupancy cap, tables grow with bits") {
    // at the probe's 20-anchor set the balance term keeps 4 bits through
    // 100x — the round-15 probe MEASURED that (8x4 recall 0.87-0.90 and
    // faster wall than wider bandings; occupancy 12.4k/bucket not binding)
    assert(Similarity.adaptiveBanding(59420L) == ((8, 4)))   // 30x probe corpus
    assert(Similarity.adaptiveBanding(198020L) == ((8, 4)))  // 100x probe corpus
    // ...until the occupancy cap (16384) binds: the 300x corpus crosses it
    assert(Similarity.adaptiveBanding(594020L) == ((16, 6))) // 300x probe corpus
    // anchor-balance term: a production-size anchor set (mine negatives
    // for EVERY doc) pushes bits to the b·2^b >= anchors solution
    assert(Similarity.adaptiveBanding(1000000L, anchors = 1000000L)._2 == 16)
    // tables cap: amplification growth is bounded
    assert(Similarity.adaptiveBanding(Long.MaxValue / 4)._1 == 32)
    // monotone non-decreasing in n (no resize can shrink the index)
    val pts = Seq(1L, 512L, 2048L, 10000L, 60000L, 200000L, 1000000L, 100000000L)
      .map(Similarity.adaptiveBanding(_))
    pts.sliding(2).foreach { case Seq(a, b) =>
      assert(b._1 >= a._1 && b._2 >= a._2)
    }
    // the extended hyperplane pool is a prefix-stable extension: the
    // first 32 planes are byte-identical to the original static pool
    assert(Similarity.hyperplanePool(40).take(32) == Similarity.hyperplanes)
  }

  test("q31 simhash emits only low-hamming pairs") {
    SparkEntry.queries("q31_simhash_dedup")(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("hamming") <= 3)
    }
  }

  test("q31 4-block index is pigeonhole-complete: recall 1.0 vs all-pairs hamming") {
    // brute-force: recompute every fingerprint on the driver and compare
    // the blocked result against the full quadratic hamming scan
    val toks = split(col("text"), " ")
    val shingles = graft.Tables.documents(spark, sfDir)
      .filter(size(toks) >= 3)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    def md5hex(s: String) = graft.converter.SpanConverter.md5Hex(s)
    def half(hs: Seq[String]): String = (0 until 32).map { j =>
      val vote = hs.map(h => if (h.charAt(j) >= '8') 1 else -1).sum
      if (vote > 0) '1' else '0'
    }.mkString
    // 64-bit fingerprint: second 'b:'-salted md5 stream for bits 33-64
    val fps = shingles.map { case (id, sh) =>
      id -> (half(sh.map(md5hex)) + half(sh.map(s => md5hex("b:" + s))))
    }
    val exact = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      ham = fa.zip(fb).count { case (x, y) => x != y } if ham <= 3
    } yield (a, b)).toSet
    val blocked = SparkEntry.queries("q31_simhash_dedup")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == exact,
      s"missed: ${exact -- blocked}; extra: ${blocked -- exact}")
    assert(exact.nonEmpty, "the corpus must contain at least one near-dup pair")
  }
}
