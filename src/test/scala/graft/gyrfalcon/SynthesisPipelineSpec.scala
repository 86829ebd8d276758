package graft.gyrfalcon

import graft.SparkSpec
import graft.services.StubServiceClient

/** End-to-end offline synthesis pipeline checks (X1 stubbed). */
class SynthesisPipelineSpec extends SparkSpec {

  private val paths = Seq("root/a/a1", "root/a/a2", "root/b")
  private val personas = Seq("nurse", "analyst", "teacher")

  test("100 rounds produce 100 parseable query records, deterministically") {
    val r = SynthesisPipeline.rounds(spark, paths, personas, 100)
    val a = SynthesisPipeline.synthesize(r, StubServiceClient).collect().sortBy(_.round_id)
    assert(a.length == 100)
    a.foreach { q =>
      assert(Set("easy", "medium", "hard")(q.difficulty))
      assert(q.query.nonEmpty)
      assert(paths.contains(q.path_id) && personas.contains(q.persona))
    }
    val b = SynthesisPipeline.synthesize(r, StubServiceClient).collect().sortBy(_.round_id)
    assert(a.map(_.query).sameElements(b.map(_.query)), "pipeline must be deterministic")
  }

  test("difficulty selection tracks the .2/.5/.3 distribution") {
    val r = SynthesisPipeline.rounds(spark, paths, personas, 500)
    val recs = SynthesisPipeline.synthesize(r, StubServiceClient)
    val byDiff = recs.collect().groupBy(_.difficulty).view.mapValues(_.length).toMap
    assert(math.abs(byDiff.getOrElse("medium", 0) / 500.0 - 0.5) < 0.12)
    assert(math.abs(byDiff.getOrElse("easy", 0) / 500.0 - 0.2) < 0.1)
    assert(math.abs(byDiff.getOrElse("hard", 0) / 500.0 - 0.3) < 0.1)
  }

  test("statistics frame aggregates per difficulty") {
    val r = SynthesisPipeline.rounds(spark, paths, personas, 60)
    val stats = SynthesisPipeline.statistics(
      SynthesisPipeline.synthesize(r, StubServiceClient)).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 60)
    stats.foreach(row => assert(row.getAs[Long]("n_paths") <= paths.length))
  }

  test("web research stage: gated, ordered-deduped queries, truncated tagged results") {
    val r = SynthesisPipeline.rounds(spark, paths, personas, 400)
    val researched = SynthesisPipeline
      .withSearchContext(r, StubServiceClient, p = 0.3).collect()
    assert(researched.length == 400)
    val used = researched.filter(_.search_used)
    assert(math.abs(used.length / 400.0 - 0.3) < 0.1, s"gate rate ${used.length / 400.0}")
    researched.filterNot(_.search_used).foreach(x =>
      assert(x.search_queries.isEmpty && x.search_results.isEmpty))
    used.foreach { x =>
      // problem type first; persona+type second; ordered dedup keeps ≤ 2
      assert(x.search_queries.nonEmpty && x.search_queries.size <= 2)
      assert(x.search_queries.head == x.path_id.split("/").last)
      assert(x.search_queries == x.search_queries.distinct)
      assert(x.search_results.size <= 5)
      // results carry their originating query tag
      x.search_results.foreach(res => assert(res.startsWith("[")))
    }
    // the context renders into the F20 prompt block
    val sample = used.head
    val block = Prompts.searchContextBlock(
      sample.search_queries,
      sample.search_results.map(s => Prompts.SearchResult(s, "", "", "")))
    assert(block.contains("- Recent Findings from Web Search:"))
    // deterministic across runs
    val again = SynthesisPipeline
      .withSearchContext(r, StubServiceClient, p = 0.3).collect()
    assert(again.map(_.toString).sorted.sameElements(researched.map(_.toString).sorted))
  }

  test("F22: difficulty-distribution strings parse with full validation") {
    import SynthesisPipeline.parseDifficultyDistribution
    assert(parseDifficultyDistribution("easy:0.2,medium:0.5,hard:0.3") ==
      Right(Map("easy" -> 0.2, "medium" -> 0.5, "hard" -> 0.3)))
    // whitespace + case tolerance, float rounding tolerance
    assert(parseDifficultyDistribution(" EASY : 0.333 , medium:0.333, hard:0.334").isRight)
    assert(parseDifficultyDistribution("easy:0.2,medium:0.5").left.exists(_.contains("Missing difficulties: hard")))
    assert(parseDifficultyDistribution("easy:0.2,medium:0.5,extreme:0.3").left.exists(_.contains("Invalid difficulty level 'extreme'")))
    assert(parseDifficultyDistribution("easy=0.2").left.exists(_.contains("Invalid format")))
    assert(parseDifficultyDistribution("easy:0.2,medium:0.5,hard:0.9").left.exists(_.contains("must sum to 1.0")))
    assert(parseDifficultyDistribution("easy:1.5,medium:0.5,hard:0.3").left.exists(_.contains("between 0 and 1")))
    assert(parseDifficultyDistribution("easy:x,medium:0.5,hard:0.3").left.exists(_.contains("Invalid probability")))
  }

  test("suitability gate passes most queries and rewrites the rest") {
    val r = SynthesisPipeline.rounds(spark, paths, personas, 200)
    val enriched = SynthesisPipeline.withSuitability(
      SynthesisPipeline.synthesize(r, StubServiceClient), StubServiceClient).collect()
    assert(enriched.length == 200)
    val (ok, rewritten) = enriched.partition(_.suitable)
    assert(ok.nonEmpty && rewritten.nonEmpty, "both branches must be exercised")
    ok.foreach(e => assert(e.final_query == e.query))
    rewritten.foreach(e => assert(e.final_query.startsWith("rewritten[")))
    val rate = ok.length.toDouble / enriched.length
    assert(rate > 0.6 && rate < 0.95, s"suitable rate $rate far from ~0.8")
  }
}
