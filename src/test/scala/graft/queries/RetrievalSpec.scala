package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-structure tests for the retrieval family (q127 BM25
  * more-like-this, q128 hybrid RRF) plus property pins for the q129
  * annealing schedule and the DetMath deterministic-ln kernel they ride on.
  *
  * The planted corpus: anchor doc 0 carries 20 rare terms; doc 50 is its
  * exact bag twin (must top the lexical list AND the fused list — it also
  * gets a near-identical embedding), doc 60 shares half the terms
  * (lexical-only candidate), doc 70 is textually disjoint but
  * embedding-close (vector-only candidate: must surface in the fusion with
  * lex_rank = −1). Filler docs 20..45 share nothing with anchor 0, so its
  * lexical candidate set is exactly {50, 60}.
  */
class RetrievalSpec extends SparkSpec {

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("retrieval").toString
    import spark.implicits._
    val rare = words("zq", 20)
    val docs =
      // anchors 0..7 — disjoint vocabularies so each query's candidates
      // are independent
      Seq((0L, rare.mkString(" "))) ++
      (1 to 7).map(i => (i.toLong, words(s"anch$i", 12).mkString(" "))) ++
      // filler: common words only, no overlap with any anchor
      (20 to 45).map(i => (i.toLong, Seq.fill(15)(s"w${i % 5}").mkString(" "))) ++
      Seq(
        (50L, rare.mkString(" ")),                                // bag twin
        (60L, (rare.take(10) ++ words("only60", 10)).mkString(" ")), // half overlap
        (70L, words("v70", 20).mkString(" ")))                    // disjoint text
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    def unit(dim: Int): Seq[Float] =
      (0 until 64).map(j => if (j == dim) 1.0f else 0.0f)
    def mix(a: Int, b: Int, wa: Float, wb: Float): Seq[Float] =
      (0 until 64).map(j =>
        (if (j == a) wa else 0.0f) + (if (j == b) wb else 0.0f))
    val vecs =
      Seq((0L, unit(0), 0)) ++
      (1 to 7).map(i => (i.toLong, unit(i), 0)) ++
      Seq(
        (50L, mix(0, 8, 0.99f, 0.05f), 0),  // near anchor 0
        (60L, unit(9), 0),                  // orthogonal to anchor 0
        (70L, mix(0, 10, 0.9f, 0.3f), 0))   // embedding-close, text-disjoint
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val lex =
    Retrieval.bm25Ranked(spark, dir, nAnchors = 8, k = 10)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_terms")),
        r.getDouble(r.fieldIndex("score")),
        r.getInt(r.fieldIndex("rank"))))

  test("q127: the planted bag twin tops anchor 0's lexical list") {
    val q0 = lex.filter(_._1 == 0L).sortBy(_._5)
    assert(q0.map(_._2).toSeq == Seq(50L, 60L),
      s"query 0 candidates must be exactly twin+half-overlap: ${q0.toSeq}")
    val (_, top, nTerms, _, _) = (q0.head._1, q0.head._2, q0.head._3, q0.head._4, q0.head._5)
    assert(top == 50L && nTerms == 20L)
  }

  test("q127: more matched terms at equal tf beats fewer (score order)") {
    val q0 = lex.filter(_._1 == 0L)
    val s50 = q0.find(_._2 == 50L).get._4
    val s60 = q0.find(_._2 == 60L).get._4
    assert(s50 > s60, s"twin score $s50 must exceed half-overlap $s60")
    assert(q0.find(_._2 == 60L).get._3 == 10L)
  }

  test("q127: textually disjoint docs never surface (no dense scoring)") {
    assert(!lex.exists(t => t._1 == 0L && t._2 == 70L))
    assert(!lex.exists(t => t._1 == 0L && (20L to 45L).contains(t._2)))
  }

  test("q128: fusion ranks the both-list twin first; vector-only doc carries lex_rank = -1") {
    val fused = SparkEntry_q128(dir)
    val q0 = fused.filter(_._1 == 0L)
    assert(q0.minBy(_._6)._2 == 50L, s"fused top-1 for query 0: ${q0.toSeq}")
    val d70 = q0.find(_._2 == 70L)
    assert(d70.isDefined, "embedding-close doc 70 must surface via the vector list")
    assert(d70.get._3 == -1L && d70.get._4 > 0L,
      "doc 70 is vector-only: lex_rank -1, vec_rank set")
    val d60 = q0.find(_._2 == 60L)
    assert(d60.isDefined && d60.get._3 > 0L)
  }

  test("q128: rrf_score is exactly the rank-reciprocal sum of its two columns") {
    val fused = SparkEntry_q128(dir)
    fused.foreach { case (_, _, lexR, vecR, rrf, _) =>
      val expect =
        (if (lexR > 0) 1.0 / (60 + lexR) else 0.0) +
          (if (vecR > 0) 1.0 / (60 + vecR) else 0.0)
      assert(math.abs(rrf - expect) < 1e-15, s"rrf $rrf != $expect")
    }
  }

  private def SparkEntry_q128(d: String) =
    graft.SparkEntry.queries("q128_hybrid_rrf")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))

  test("the documented production swap composes: fuseRrf over lshTopKAdaptive's list " +
      "surfaces the same planted structure as the exact fusion") {
    import org.apache.spark.sql.functions.col
    val lex = Retrieval.bm25Ranked(spark, dir, nAnchors = 8, k = 20)
    // lshTopKAdaptive anchors on vec_id < 20 (its own predicate) — wider
    // than the 8 BM25 anchors; restrict to the shared anchor set. The
    // planted unit-vector corpus resolves the static 8x4 banding, and the
    // cosine-0.9+ plants collide in some table with near-certainty.
    val vecLsh = Similarity.lshTopKAdaptive(spark, dir, k = 20,
        crossLabelOnly = false)
      .filter(col("query_id") < 8)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val fused = Retrieval.fuseRrf(lex, vecLsh, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0 = fused.filter(_._1 == 0L)
    assert(q0.nonEmpty)
    // the bag twin (both lists) must still rank first under the LSH list
    assert(q0.head._2 == 50L, s"LSH-fused top-1 for query 0: ${q0.toSeq}")
    // the embedding-close, textually disjoint plant must still surface
    // through the LSH list alone (lex_rank = -1)
    val d70 = q0.find(_._2 == 70L)
    assert(d70.isDefined && d70.get._3 == -1L,
      s"doc 70 must arrive vector-only via LSH: ${q0.toSeq}")
  }

  test("the INDEX-SERVED hybrid composes: fuseRrf over the persisted " +
      "AnnIndex probe — the production stack (persisted lexical + " +
      "persisted vector) through the same fusion seam") {
    import org.apache.spark.sql.functions.col
    // vector side: the persisted index probe (build-once, bucket-pruned),
    // not a recompute — AnnIndex.topK output is already (query_id,
    // neighbor_id, cosine, rank)
    graft.sources.AnnIndex.build(spark, dir, "retr_ann_idx")
    val vecIdx = graft.sources.AnnIndex.topK(spark, "retr_ann_idx",
        nAnchors = 8, k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    // lexical side: the persisted postings index probe, same corpus
    graft.sources.PostingsIndex.build(spark, dir, "retr_post_idx")
    val lexIdx = graft.sources.PostingsIndex.topKFor(spark, "retr_post_idx",
      graft.Tables.documents(spark, dir).filter(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"), col("text")),
      k = 20)
    val fused = Retrieval.fuseRrf(lexIdx, vecIdx, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val q0 = fused.filter(_._1 == 0L)
    assert(q0.nonEmpty)
    // the bag twin (both lists) must still rank first under the
    // fully-index-served fusion
    assert(q0.head._2 == 50L, s"index-served top-1 for query 0: ${q0.toSeq}")
    // the embedding-close, textually disjoint plant must still surface
    // through the persisted vector index alone (lex_rank = -1)
    val d70 = q0.find(_._2 == 70L)
    assert(d70.isDefined && d70.get._3 == -1L,
      s"doc 70 must arrive vector-only via the AnnIndex probe: ${q0.toSeq}")
    // and the lexical-only plant through the postings index alone
    val d60 = q0.find(_._2 == 60L)
    assert(d60.isDefined && d60.get._3 > 0L,
      s"doc 60 must carry a lexical rank from the postings probe: ${q0.toSeq}")
  }

  test("q133: a paraphrase sharing the benchmark's rare terms tops its review " +
      "list; the benchmark slice never searches itself") {
    import org.apache.spark.sql.functions.lit
    val d = java.nio.file.Files.createTempDirectory("rdecontam").toString
    import spark.implicits._
    val bmTerms = words("bmrare", 12)
    val otherBm = words("bmother", 12)
    val docs = Seq(
      // benchmark slice (doc_id % 100 == 7)
      (7L, bmTerms.mkString(" ")),
      (107L, otherBm.mkString(" ")),
      // the paraphrase: half of benchmark 7's rare terms + its own filler
      (1L, (bmTerms.take(6) ++ words("para", 6)).mkString(" ")),
      // clean corpus docs — no overlap with either benchmark item
      (2L, words("clean2", 12).mkString(" ")),
      (3L, words("clean3", 12).mkString(" ")),
      // a SECOND benchmark-slice doc carrying bm 7's terms: must never
      // appear as a candidate (the slice is not part of the collection)
      (207L, bmTerms.mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("q133_retrieval_decontam")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    // benchmark 7's strongest lexical match is the paraphrase
    val b7 = rows.filter(_._1 == 7L).sortBy(_._3)
    assert(b7.nonEmpty && b7.head._2 == 1L,
      s"bench 7 must surface the paraphrase first: ${b7.toSeq}")
    // candidates only ever come from the corpus side: no benchmark-slice
    // doc (7, 107, 207) appears as a matched document
    assert(rows.forall(r => r._2 % 100 != 7),
      s"benchmark slice leaked into the candidates: ${rows.toSeq}")
    // no cross-benchmark noise: bench 107 shares no terms with the corpus
    assert(!rows.exists(_._1 == 107L),
      s"bench 107 has no lexical matches, got: ${rows.filter(_._1 == 107L).toSeq}")
  }

  test("q129: anneal buckets sit strictly above main buckets and respect the token budget greedily") {
    val out = graft.SparkEntry.queries("q129_anneal_schedule")(spark, sfDir)
      .select("bucket", "n_tokens", "phase").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
    val total = out.map(_._2).sum
    val anneal = out.filter(_._3 == "anneal")
    val main = out.filter(_._3 == "main")
    assert(main.nonEmpty, "a 10% budget can never swallow the whole corpus")
    if (anneal.nonEmpty) {
      assert(anneal.map(_._1).min > main.map(_._1).max,
        "anneal must be a quality-bucket prefix from the top")
      assert(anneal.map(_._2).sum * 10 <= total, "anneal overshot the budget")
    }
    // Greedy maximality: pulling in the next (highest main) bucket must
    // break the budget.
    val nextBucket = main.map(_._1).max
    val withNext = anneal.map(_._2).sum +
      main.filter(_._1 == nextBucket).map(_._2).sum
    assert(withNext * 10 > total,
      "the highest main bucket would still have fit — split is not greedy-maximal")
  }

  test("q130: a complete permutation, phase-major (anneal strictly last), " +
      "dense per-(phase, shard) positions, and phase parity with q129") {
    val rows = graft.SparkEntry.queries("q130_curriculum_order")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    val allIds = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == allIds && rows.length == allIds.size,
      "every document schedules exactly once")
    // phase_order encodes the phase, and anneal is the LAST block in the
    // loader's (phase_order, shard, pos) consumption order by construction
    rows.foreach { case (_, phase, po, _, _) =>
      assert((phase == "main") == (po == 0), s"phase/phase_order disagree: $phase/$po")
    }
    // dense positions within each (phase, shard)
    rows.groupBy(r => (r._3, r._4)).foreach { case (g, rs) =>
      assert(rs.map(_._5).sorted.toSeq == (1L to rs.length.toLong),
        s"group $g positions not dense")
    }
    // the phase sets equal q129's (same machinery, spec'd as the contract)
    val q129Phases = graft.SparkEntry.queries("q129_anneal_schedule")(spark, sfDir)
      .select("doc_id", "phase").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, phase, _, _, _) =>
      assert(q129Phases(id) == phase, s"doc $id phase differs from q129")
    }
    // within a phase the order is a real shuffle, not the identity
    val mainInOrder = rows.filter(_._3 == 0).sortBy(r => (r._4, r._5)).map(_._1)
    assert(mainInOrder.toSeq != mainInOrder.sorted.toSeq)
  }

  test("the multi-probe dial composed into the hybrid serving row: " +
      "dial-on equals fuseRrf over the expanded recompute vector list; " +
      "dial-off is exactly the registered q136") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf_score",
        "fused_rank")
        .orderBy("query_id", "fused_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getInt(5)))
        .toSeq
    val got = rows(Retrieval.hybridIndexServed(spark, sfDir,
      multiProbe = true))
    // the recompute reference: same persisted lexical probe, the
    // EXPANDED recompute LSH list as the vector half, same fusion
    val lexTable = graft.sources.PostingsIndex.ensureFor(spark, sfDir,
      tag = "hybrid")
    val bench = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))
    val lex = graft.sources.PostingsIndex.topKFor(spark, lexTable, bench, 20)
    val vec = Similarity.lshTopKMultiProbe(spark, sfDir, k = 20)
      .filter(col("query_id") < 8)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val want = rows(Retrieval.fuseRrf(lex, vec, 10))
    assert(got == want,
      "dial-on hybrid diverges from the expanded-recompute composition")
    // the refactor pin: the registered row's client-signed vector half
    // must equal the PRE-refactor composition (the AnnIndex.topK
    // self-probe feeding the same fusion) — comparing the registered
    // function to itself would be a tautology
    val annTable = graft.sources.AnnIndex.ensureFor(spark, sfDir,
      tag = "q135")
    val oldVec = graft.sources.AnnIndex.topK(spark, annTable,
        nAnchors = 8, k = 20)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    assert(rows(Retrieval.hybridIndexServed(spark, sfDir,
        multiProbe = false)) ==
      rows(Retrieval.fuseRrf(lex, oldVec, 10)),
      "the client-signed vector half diverges from the self-probe composition")
  }
}
