package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-structure test of the q124 composite: a synthetic corpus with
  * KNOWN defects — a sealed twin, an exact duplicate pair, a near-dup
  * pair with a quality gap, a benchmark-contaminated doc, and an
  * over-quota source — and doc_id-level assertions that each stage
  * removes exactly its plant and nothing else that matters. The organic
  * CurationPipelineSpec pins invariants; this pins DETECTIONS. */
class CurationPlantedSpec extends SparkSpec {

  // doc_id conventions the pipeline keys on: % 10 == 7 -> sealed,
  // % 20 == 7 -> benchmark (subset of sealed)
  private def tokens(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("planted").toString
    import spark.implicits._
    val aToks = tokens("a", 50)
    val c1 = tokens("c", 90)
    val dDoc = (tokens("d", 40) ++ tokens("b", 8) ++
      (40 until 80).map(i => s"d$i")).mkString(" ")
    def filler(word: String) = Seq.fill(10)(word).mkString(" ")
    val rows =
      Seq(
        // sealed source sS: the twin (7) and the benchmark doc (27)
        (7L, aToks.mkString(" "), "en", "sS"),
        (27L, (tokens("b", 8) ++ Seq("bb8", "bb9", "bb10", "bb11")).mkString(" "), "en", "sS"),
        // sA: gate plant — same bag-of-words as sealed 7, different order
        (11L, aToks.reverse.mkString(" "), "en", "sA"),
        (101L, filler("junkA1"), "en", "sA"),
        (102L, filler("junkA2"), "en", "sA"),
        (103L, filler("junkA3"), "en", "sA"),
        // sB: exact-dup plant — identical 100-token text, keep min id
        (12L, tokens("x", 100).mkString(" "), "en", "sB"),
        (22L, tokens("x", 100).mkString(" "), "en", "sB"),
        (111L, filler("junkB1"), "en", "sB"),
        (112L, filler("junkB2"), "en", "sB"),
        (113L, filler("junkB3"), "en", "sB"),
        // sC: near-dup plant — C2 is C1's 80-token prefix (shingle
        // jaccard 78/88 ~ 0.886, quality 0.94 < C1's 0.97)
        (13L, c1.mkString(" "), "en", "sC"),
        (23L, c1.take(80).mkString(" "), "en", "sC"),
        (121L, filler("junkC1"), "en", "sC"),
        (122L, filler("junkC2"), "en", "sC"),
        (123L, filler("junkC3"), "en", "sC"),
        // sD: decontam plant — carries benchmark 27's b0..b7 run verbatim
        (14L, dDoc, "en", "sD"),
        (131L, filler("junkD1"), "en", "sD"),
        (132L, filler("junkD2"), "en", "sD"),
        (133L, filler("junkD3"), "en", "sD"),
        // sF: single-doc source — the stage-2 small-source guard's plant:
        // a percentile gate over n=1 gives the doc percent_rank 0 and
        // would annihilate the source without the guard
        (401L, tokens("f", 40).mkString(" "), "en", "sF")) ++
      // sE: over-quota source — 28 docs, quality strictly increasing
      // with doc_id (72..99 all-unique tokens), disjoint namespaces
      (0 until 28).map { i =>
        val id = 300L + 10 * i
        (id, tokens(s"e${id}_", 72 + i).mkString(" "), "en", "sE")
      }
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val st = CurationPipeline.stages(spark, dir)
  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("ingest gate drops exactly the sealed twin (bag-of-words, order-insensitive)") {
    val admitted = ids(st.admitted)
    assert(!admitted.contains(11L), "the reordered sealed twin slipped the gate")
    assert(Set(101L, 102L, 103L).subsetOf(admitted), "gate dropped innocent docs")
    assert(Set(12L, 22L, 13L, 23L, 14L).subsetOf(admitted))
  }

  test("exact dedup keeps the smaller id of the planted identical pair") {
    val scored = ids(st.scored)
    assert(Set(12L, 22L).subsetOf(scored), "quality gate ate the exact-dup plant")
    val exact = ids(st.exactKept)
    assert(exact.contains(12L) && !exact.contains(22L))
    assert(Set(13L, 23L, 14L).subsetOf(exact))
  }

  test("fuzzy sweep drops the lower-quality member of the planted near-dup pair") {
    val labels = st.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.get(13L) == Some(13L) && labels.get(23L) == Some(13L),
      s"planted near-dup pair not clustered: $labels")
    val fuzzy = ids(st.fuzzyKept)
    assert(fuzzy.contains(13L) && !fuzzy.contains(23L),
      "keep-best must retain the higher-quality member")
    assert(fuzzy.contains(14L) && fuzzy.contains(12L))
  }

  test("decontamination drops exactly the benchmark-contaminated doc") {
    assert(ids(st.contaminated) == Set(14L),
      s"expected only the planted doc contaminated, got ${ids(st.contaminated)}")
    val clean = ids(st.clean)
    assert(!clean.contains(14L) && clean.contains(12L) && clean.contains(13L))
  }

  test("small-source guard: the quality gate spares sources under MinCalibrationDocs") {
    // sF has exactly one admitted doc (percent_rank 0 — the un-guarded
    // gate would drop it); sA has three after the sealed twin dies at
    // the ingest gate. Both are under the guard threshold, so ALL their
    // admitted docs must survive stage 2.
    val scored = ids(st.scored)
    assert(scored.contains(401L), "single-doc source annihilated by its own calibration")
    assert(Set(101L, 102L, 103L).subsetOf(scored),
      "three-doc source lost a doc to a gate the guard should have skipped")
    // ...and the guard does NOT spare sources at/over the threshold: sE
    // (28 admitted) still loses its bottom quartile
    assert(st.scored.filter(col("source") === "sE").count() == 21)
  }

  test("the single-doc source's doc reaches the split output") {
    assert(ids(st.split).contains(401L))
  }

  test("domain cap keeps exactly the top-15 by quality in the over-quota source") {
    val sE = st.capped.filter(col("source") === "sE")
    // 28 admitted, bottom 7 die at the quality gate (pct < 0.25),
    // 21 survive, the cap keeps the top 15 by (quality desc, doc_id) —
    // quality increases with doc_id, so that is the 15 HIGHEST ids
    val expected = (13 until 28).map(i => 300L + 10 * i).toSet
    assert(ids(sE) == expected, s"got ${ids(sE).toSeq.sorted}")
  }

  test("plants never reach the split; survivors all do, leakage-free") {
    val split = st.split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!split.contains(11L) && !split.contains(22L) &&
      !split.contains(23L) && !split.contains(14L))
    assert(split.contains(12L) && split.contains(13L))
    assert(split.keySet.forall(id => id % 10 != 7), "a sealed id leaked into the split")
  }
}
