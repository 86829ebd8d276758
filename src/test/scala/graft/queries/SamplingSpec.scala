package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantic checks for the deterministic sampling batch on sf0.001. */
class SamplingSpec extends SparkSpec {

  test("q60 produces exactly one brand per draw, reproducibly") {
    val a = SparkEntry.queries("q60_weighted_sample")(spark, sfDir).collect()
    assert(a.length == 100)
    assert(a.map(_.getLong(0)).distinct.length == 100, "each draw picks exactly once")
    val b = SparkEntry.queries("q60_weighted_sample")(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "draws are deterministic")
  }

  test("q61 stratified rates land near their targets") {
    val df = SparkEntry.queries("q61_stratified_sample")(spark, sfDir)
    val byLang = df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val rate = byLang.getOrElse(lang, 0L).toDouble / n
      val target = if (lang == "en") 0.5 else 0.2
      assert(math.abs(rate - target) < 0.25, s"$lang rate $rate far from $target")
    }
  }

  test("q62 depth is always within [2, n_tokens - 1]") {
    SparkEntry.queries("q62_truncate_path")(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val d = r.getAs[Int]("depth")
      assert(d >= 2 && d <= n - 1, s"depth $d out of [2, ${n - 1}]")
    }
  }

  test("q63 difficulty split approximates .2/.5/.3") {
    val m = SparkEntry.queries("q63_difficulty_select")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = m.values.sum.toDouble
    assert(math.abs(m.getOrElse("easy", 0L) / total - 0.2) < 0.15)
    assert(math.abs(m.getOrElse("medium", 0L) / total - 0.5) < 0.15)
    assert(math.abs(m.getOrElse("hard", 0L) / total - 0.3) < 0.15)
  }

  test("q69 importance scores exclude the target source and rank target-like docs first") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q69_importance_score")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // ranking is by score descending with doc_id tiebreak
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
    // the target slice itself must never appear in the candidate ranking
    val targetIds = graft.Tables.documents(spark, sfDir)
      .filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !targetIds.contains(r.getAs[Long]("doc_id"))),
      "target-source docs must be excluded from scoring")
    // every per-occurrence likelihood ratio is positive, so a doc's score
    // strictly exceeds 0 and n_feats is its bigram multiplicity (>= 1)
    assert(rows.forall(r => r.getAs[Double]("score") > 0.0 &&
      r.getAs[Long]("n_feats") >= 1))
  }

  test("q69 is deterministic across runs") {
    val a = SparkEntry.queries("q69_importance_score")(spark, sfDir).collect()
    val b = SparkEntry.queries("q69_importance_score")(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }
}
