package graft.gyrfalcon

import graft.core.text.TextOps
import graft.services.ServiceClient
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The Gyrfalcon query-synthesis data plane as one Spark job
  * (SURVEY.md §3.1): N generation rounds flow as rows through
  * sample → enrich → LLM (X1, behind [[ServiceClient]]) → parse (F16) →
  * difficulty-select (R5) → output. The reference forks a process pool and
  * re-creates all components per worker; here rounds are just rows and the
  * LLM stage is `mapPartitions` with one client per partition.
  */
object SynthesisPipeline extends Serializable {

  final case class Round(round_id: Long, path_id: String, persona: String)

  final case class QueryRecord(
      round_id: Long,
      path_id: String,
      persona: String,
      difficulty: String,
      query: String)

  /** Assemble rounds: deterministic path + persona assignment per round
    * (R1/R3 — hash-uniform picks over broadcast-small path/persona sets). */
  def rounds(spark: SparkSession, paths: Seq[String], personas: Seq[String], n: Int): Dataset[Round] = {
    import spark.implicits._
    val pathsB = spark.sparkContext.broadcast(paths.toIndexedSeq)
    val persB = spark.sparkContext.broadcast(personas.toIndexedSeq)
    spark.range(n).map { i =>
      val u = graft.converter.SpanConverter.callId("round", i.toString, 0)
      val pIdx = math.abs(u.hashCode) % pathsB.value.size
      val perIdx = math.abs((u + "p").hashCode) % persB.value.size
      Round(i, pathsB.value(pIdx), persB.value(perIdx))
    }
  }

  /** S5/S7 wiring: assemble rounds from a validated framework config file
    * and a persona JSONL file — the reference's startup path
    * (`framework_manager.py:155-202`): config validates or the run refuses
    * to start; personas load tolerantly (bad lines dropped, counted by the
    * caller via [[FrameworkLoader.loadPersonas]]'s error column). Persona
    * sets are config-scale, so collecting them to broadcast matches the
    * reference's in-memory list. */
  def roundsFromFiles(spark: SparkSession, paths: Seq[String],
      configPath: String, personaPath: String, n: Int): Either[Seq[String], Dataset[Round]] =
    // Framework name = the config's directory name, as in the reference's
    // per-framework layout; resolve via absolute path so a bare filename
    // ("config.json") still has a parent to name it after.
    FrameworkLoader.loadConfig(
      Option(java.nio.file.Paths.get(configPath).toAbsolutePath.normalize.getParent)
        .flatMap(p => Option(p.getFileName)).map(_.toString)
        .getOrElse("framework"),
      configPath)
      .map { _ =>
        val personas = FrameworkLoader
          .validPersonas(FrameworkLoader.loadPersonas(spark, personaPath))
          .collect().map(_._1).toSeq
        rounds(spark, paths, personas, n)
      }

  /** F22: difficulty-distribution config parse ("easy:0.2,medium:0.5,
    * hard:0.3") with the reference's validation rules
    * (`Gyrfalcon/main.py:58-124`): known labels only, all three present,
    * each probability in [0,1], total within 0.001 of 1.0. Left = the
    * first validation error, like the reference's fail-fast ValueError. */
  def parseDifficultyDistribution(s: String): Either[String, Map[String, Double]] = {
    val required = Set("easy", "medium", "hard")
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (part <- s.split(",", -1)) {
      if (!part.contains(":"))
        return Left(s"Invalid format for part '$part'. Expected format: 'difficulty:probability'")
      val Array(d0, p0) = part.trim.split(":", 2)
      val d = d0.trim.toLowerCase
      if (!required(d))
        return Left(s"Invalid difficulty level '$d'. Must be one of: easy, medium, hard")
      val p =
        try p0.trim.toDouble
        catch { case _: NumberFormatException =>
          return Left(s"Invalid probability '${p0.trim}' for '$d'")
        }
      if (p < 0 || p > 1)
        return Left(s"Probability for '$d' must be between 0 and 1, got $p")
      acc(d) = p
    }
    if (acc.keySet != required) {
      val missing = required -- acc.keySet
      return Left(s"Missing difficulties: ${missing.toSeq.sorted.mkString(", ")}")
    }
    val total = acc.values.sum
    if (math.abs(total - 1.0) > 0.001)
      Left(f"Probabilities must sum to 1.0, got $total%.4f")
    else Right(acc.toMap)
  }

  /** X1 + F16 + R5 in one partition-local pass: call the (stubbed) LLM once
    * per round, parse the difficulty-tagged variants, keep the one selected
    * by the round's seeded categorical draw (.2/.5/.3). */
  def synthesize(roundsDs: Dataset[Round], client: ServiceClient): Dataset[QueryRecord] = {
    import roundsDs.sparkSession.implicits._
    roundsDs.mapPartitions { it =>
      it.flatMap { r =>
        val prompt = s"Generate 3 queries for persona [${r.persona}] on topic [${r.path_id}]"
        val parsed = TextOps.parseDifficultyAnswers(client.complete(prompt))
        if (parsed.isEmpty) None
        else {
          // R5: deterministic categorical draw over easy .2 / medium .5 / hard .3
          val u = (java.lang.Long.parseLong(
            graft.converter.SpanConverter.callId("diff", r.round_id.toString, 0)
              .drop(5).take(8), 16).toDouble) / 4294967296.0
          val want = if (u < 0.2) "easy" else if (u < 0.7) "medium" else "hard"
          val pick = parsed.find(_._1 == want).getOrElse(parsed.head)
          Some(QueryRecord(r.round_id, r.path_id, r.persona, pick._1, pick._2))
        }
      }
    }
  }

  final case class ResearchedRound(
      round_id: Long,
      path_id: String,
      persona: String,
      search_queries: Seq[String],
      search_results: Seq[String],
      search_used: Boolean)

  /** X2 + R6 + A9/A10: the web-research enrichment stage (behavioral
    * reference `web_research_agent.py:80-160`): a probability gate decides
    * per round; enabled rounds build ≤2 candidate queries (problem type,
    * shortened-persona + problem type) with ordered dedup, run each
    * through the search client, tag results with their query, and keep
    * the first `maxResults`. Per-round failures would be collected, not
    * thrown (the stub client cannot fail). The produced context feeds
    * [[Prompts.searchContextBlock]] in the synthesis prompt. */
  def withSearchContext(roundsDs: Dataset[Round], client: ServiceClient,
      p: Double, maxResults: Int = 5): Dataset[ResearchedRound] = {
    import roundsDs.sparkSession.implicits._
    roundsDs.mapPartitions { it =>
      it.map { r =>
        val u = java.lang.Long.parseLong(
          graft.converter.SpanConverter.callId("web", r.round_id.toString, 0)
            .drop(5).take(8), 16).toDouble / 4294967296.0
        if (u >= p) ResearchedRound(r.round_id, r.path_id, r.persona,
          Seq.empty, Seq.empty, search_used = false)
        else {
          val problemType = r.path_id.split("/").last.trim
          val queries = buildSearchQueries(r.persona, problemType)
          val aggregated = queries.flatMap(q =>
            client.search(q, maxResults).map(res => s"[$q] $res"))
          ResearchedRound(r.round_id, r.path_id, r.persona,
            queries, aggregated.take(maxResults), search_used = true)
        }
      }
    }
  }

  /** Candidate search queries with ordered dedup (A9) — problem type
    * alone, then the 80-char persona fragment plus problem type. */
  def buildSearchQueries(persona: String, problemType: String): Seq[String] = {
    val fragment = TextOps.shorten(persona, 80, "").trim
    val candidates = Seq(problemType, s"$fragment $problemType".trim)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    candidates.filter(_.nonEmpty).foreach(seen += _)
    if (seen.isEmpty) Seq(problemType) else seen.toSeq
  }

  final case class EnrichedQuery(
      round_id: Long,
      path_id: String,
      persona: String,
      difficulty: String,
      query: String,
      suitable: Boolean,
      final_query: String)

  /** X5: persona-suitability gate + rewrite (behavioral reference
    * `rewrite_agent.py:49-168`): one evaluation call per record; on
    * NOT_SUITABLE a second call rewrites the query for the persona. Both
    * calls stay in the same partition-local pass. */
  def withSuitability(records: Dataset[QueryRecord], client: ServiceClient): Dataset[EnrichedQuery] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val verdict = client.complete(
          s"Evaluate suitability of persona [${r.persona}] for:\n${r.query}")
        val suitable = verdict.startsWith("SUITABLE")
        val finalQuery =
          if (suitable) r.query
          else client.complete(s"Rewrite for persona [${r.persona}]:\n${r.query}")
        EnrichedQuery(r.round_id, r.path_id, r.persona, r.difficulty, r.query,
          suitable, finalQuery)
      }
    }
  }

  /** A5: run statistics — difficulty and path distributions. */
  def statistics(records: Dataset[QueryRecord]): DataFrame =
    records.toDF
      .groupBy(col("difficulty"))
      .agg(count(lit(1)).as("n"), countDistinct(col("path_id")).as("n_paths"))
      .orderBy("difficulty")
}
