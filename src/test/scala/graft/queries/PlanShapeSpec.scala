package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan assertions — the properties that keep these queries
  * viable at 100 TB must hold in the plan, not just in intent: filters
  * reach the parquet scan, dimension joins broadcast, top-k never does a
  * global sort, and sessionization's two windows + groupBy share one
  * shuffle.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan
  }

  private def planString(name: String): String = plan(name).toString

  /** hash-partitioned shuffles only (the final presentation ORDER BY adds
    * one range exchange that a sink would not need). */
  private def countHashShuffles(p: SparkPlan): Int =
    "Exchange hashpartitioning".r.findAllIn(p.toString).length

  test("q02: predicate and projection are pushed into the parquet scan") {
    val s = planString("q02_filter_project")
    assert(s.contains("PushedFilters: ["), s"no pushed filters in:\n$s")
    assert(s.contains("IsNotNull(event_type)") || s.contains("EqualTo(event_type"),
      s"event_type filter not pushed:\n$s")
    // projection pruning: the scan must not read props (unused 6th column)
    assert(!s.contains("ReadSchema") || !s.split("ReadSchema")(1).take(300).contains("props"),
      s"props column not pruned:\n$s")
  }

  test("q04: dimension joins broadcast (no shuffle of the fact side)") {
    val s = planString("q04_region_suppliers")
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$s")
    assert(!s.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$s")
  }

  test("q09: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val s = planString("q09_top_orders")
    assert(s.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$s")
  }

  test("q15: both windows and the groupBy share a single shuffle") {
    // lag + running-sum windows and the session groupBy all key on
    // user_id; Catalyst must not re-exchange between them
    val n = countHashShuffles(plan("q15_sessionize"))
    assert(n == 1, s"expected exactly 1 hash shuffle, got $n")
  }

  test("q01: aggregation is partial (map-side combine before the shuffle)") {
    val s = planString("q01_pricing_summary")
    assert(s.contains("HashAggregate"), s)
    // partial + final pair => the string contains two HashAggregate nodes
    assert(s.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
      s"expected partial+final aggregation:\n$s")
  }

  test("q34: the query side is broadcast (brute-force scan stays narrow)") {
    val s = planString("q34_knn_bruteforce")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      s"expected the 20-vector query side broadcast:\n$s")
  }

  test("q32: candidates come from the prefix-gram index, never a lang-only block") {
    // the candidate self-join must key on the prefix GRAM (plus lang) so
    // shuffle cardinality tracks rare-gram occupancy, not language
    // population — a lang-only key would be one O(n²) block per language.
    // Any equi-join flavor is fine — at the tiny test fixture the stats
    // legitimately pick BroadcastHashJoin; what must hold at every scale
    // is the KEY LIST, not the exchange strategy.
    val s = planString("q32_ngram_jaccard_dedup")
    val joinKeys =
      "(?s)(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*\\], \\[[^\\]]*\\]"
        .r.findAllIn(s).toList
    assert(joinKeys.nonEmpty, s"expected an equi-join in:\n$s")
    assert(joinKeys.exists(k => k.contains("gram") && k.contains("lang")),
      s"candidate join must key on (gram, lang), got: $joinKeys")
    assert(!joinKeys.exists(k => k.contains("lang") && !k.contains("gram")
        && !k.contains("doc_")),
      s"found a lang-only block join: $joinKeys")
    // the gram build is materialized once via localCheckpoint, so the
    // join DAG must contain ZERO char_ngrams calls — round 8's repartition
    // "barrier" left 6 copies of the gram subtree (18 evaluations, some in
    // the parquet scan filter via InferFiltersFromGenerate)
    val nGramBuilds = "char_ngrams".r.findAllIn(s).length
    assert(nGramBuilds == 0,
      s"char_ngrams leaked into the join DAG $nGramBuilds times:\n$s")
  }

  test("q32 gram stage: one char_ngrams call, never inside a filter") {
    // the stage that IS allowed to compute grams: exactly one call, in a
    // Project, never in a Filter (the round-7 defect was constraint
    // inference re-expanding the call into the scan filter, tripling the
    // most expensive expression's per-row cost)
    val gp = Dedup.q32Grams(spark, sfDir).queryExecution.executedPlan.toString
    val n = "char_ngrams".r.findAllIn(gp).length
    assert(n == 1, s"expected exactly one gram build, got $n:\n$gp")
    val filterLines = gp.linesIterator.filter(l =>
      l.contains("Filter") || l.contains("PushedFilters") || l.contains("DataFilters"))
    assert(filterLines.forall(!_.contains("char_ngrams")),
      s"char_ngrams inside a filter:\n$gp")
  }

  test("q30: candidates come from a keyed (band, sig) bucket join, never all-pairs") {
    val s = planString("q30_minhash_lsh_dedup")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"q30 degraded to an all-pairs join:\n$s")
    val joinKeys =
      "(?s)(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*\\], \\[[^\\]]*\\]"
        .r.findAllIn(s).toList
    assert(joinKeys.exists(k => k.contains("band") && k.contains("sig")),
      s"bucket join must key on (band, sig), got: $joinKeys")
  }

  test("q64: uniform pick compiles to TakeOrderedAndProject (O(k) driver memory)") {
    val s = planString("q64_uniform_pick")
    assert(s.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k heaps, not a global sort:\n$s")
  }

  test("q19: exact deciles rank inside band partitions, never one global window") {
    // the scale contract: rank = driver-broadcast band offset + a window
    // PARTITIONED on the price band — a WindowExec with an empty
    // partition spec would move every order through one task
    val s = planString("q19_price_deciles")
    val windows = "(?s)Window \\[[^\\]]*\\], \\[[^\\]]*band[^\\]]*\\]".r.findAllIn(s).toList
    assert(windows.nonEmpty,
      s"expected the rank window partitioned by the price band:\n$s")
    assert(!s.contains("Exchange SinglePartition"),
      s"decile pipeline must not funnel rows through one partition:\n$s")
  }

  test("q31: candidate blocking slices 16-bit fingerprint blocks, not 8-bit") {
    // the block keyspace bounds candidate volume: 8-bit blocks (256 keys)
    // made pair count O(n²/256) — measured super-linear at the round-9
    // 10x scale probe (SCALING.md). 16-bit slices = 65 536 keys per block.
    val s = planString("q31_simhash_dedup")
    assert("substring\\(fp#\\d+, \\d+, 16\\)".r.findAllIn(s).nonEmpty,
      s"expected 16-bit fingerprint block slices:\n$s")
    assert("substring\\(fp#\\d+, \\d+, 8\\)".r.findAllIn(s).isEmpty,
      s"found 8-bit block slices (the quadratic round-8 shape):\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"q31 candidates must come from an equi-join on block keys:\n$s")
  }

  test("q40: the converter is ONE keyed shuffle, no join, single source pass") {
    // the whole spans→records DAG must cluster once on trace_id and do
    // everything else trace-locally; a window+topology-join regression
    // would re-read the source and add joins/exchanges
    val s = planString("q40_convert_spans")
    val n = countHashShuffles(plan("q40_convert_spans"))
    assert(n == 1, s"expected exactly 1 hash shuffle in the converter, got $n:\n$s")
    assert(!s.contains("Join"), s"converter must not join:\n$s")
    assert("Scan parquet".r.findAllIn(s).length == 1,
      s"source must be read exactly once:\n$s")
  }
}
