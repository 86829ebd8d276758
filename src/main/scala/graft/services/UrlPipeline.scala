package graft.services

import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.text.TextOps

/** X3: the URL-processing pipeline — extract → validate → repair (bounded
  * retry) → rewrite, with accumulated url_stats (behavioral reference:
  * orchestration `url_processing_agent.py:38-300`, extraction
  * `url_extraction_agent.py:81-166`, validation
  * `url_validator_agent.py:118-175`, repair `url_repair_agent.py:82-171`,
  * rewrite fallback `url_query_rewrite_agent.py:86-132`, stats surfaced
  * into metadata `router_agent.py:152-163`).
  *
  * All service calls go through [[ServiceClient]]; the pipeline itself is
  * a pure per-row function, so in the data plane it runs inside
  * `mapPartitions` with one client per partition — rows never shuffle and
  * the chain's bounded-retry control flow stays record-local.
  */
object UrlPipeline extends Serializable {

  final case class UrlChange(original_url: String, action: String, new_url: Option[String])

  /** Per-URL verdict: `outcome` ∈ kept | repaired | removed. */
  final case class UrlOutcome(
      url: String,
      accessible: Boolean,
      outcome: String,
      final_url: Option[String],
      repair_attempts: Int)

  /** The `url_stats` struct the reference accumulates into metadata. */
  final case class UrlStats(
      total_extracted: Int,
      accessible: Int,
      repaired: Int,
      removed: Int)

  final case class Processed(
      query: String,
      processed_query: String,
      outcomes: Vector[UrlOutcome],
      stats: UrlStats)

  private def mapper = new ObjectMapper()

  private def jsonField(text: String, field: String): Option[String] =
    TextOps.extractJsonObject(text).flatMap(j =>
      Try(Option(mapper.readTree(j).get(field)).filterNot(_.isNull)).toOption.flatten
        .map(n => if (n.isTextual) n.asText else n.toString))

  /** Step 1: LLM URL extraction (F17 JSON parse; unparseable → no URLs,
    * the reference's log-and-continue). */
  def extractUrls(query: String, language: String, client: ServiceClient): Vector[String] = {
    val prompt =
      s"""You are a URL extraction expert. Extract all real, directly accessible URLs from the following query.
         |
         |Query:
         |$query
         |
         |Requirements:
         |1. Only extract real URLs (must start with http:// or https://)
         |2. Exclude placeholder URLs (containing {}, <>, etc.)
         |Return ONLY JSON of shape {"urls": [{"url", "description", "context"}]}, no extra explanation.""".stripMargin
    val resp = client.complete(prompt)
    (for {
      j <- TextOps.extractJsonObject(resp)
      root <- Try(mapper.readTree(j)).toOption
      urls <- Option(root.get("urls"))
    } yield {
      val it = urls.elements()
      val out = Vector.newBuilder[String]
      while (it.hasNext) {
        val u = Option(it.next().get("url")).map(_.asText).getOrElse("")
        if (u.startsWith("http://") || u.startsWith("https://")) out += u
      }
      out.result()
    }).getOrElse(Vector.empty)
  }

  /** Step 3 inner call: one repair consultation — (action, suggestions). */
  def repairSuggestions(url: String, error: String, context: String,
      language: String, client: ServiceClient): (String, Vector[String]) = {
    val prompt =
      s"""You are a URL repair expert. Analyze this broken URL and provide repair solutions.
         |
         |Original URL: $url
         |Error: $error
         |Context: $context
         |
         |Return STRICT JSON {"repairable", "suggested_urls", "reasoning", "action"}, no extra explanation.""".stripMargin
    val resp = client.complete(prompt)
    (for {
      j <- TextOps.extractJsonObject(resp)
      root <- Try(mapper.readTree(j)).toOption
    } yield {
      val action = Option(root.get("action")).map(_.asText).getOrElse("remove")
      val sugg = Option(root.get("suggested_urls")).toVector.flatMap { arr =>
        val it = arr.elements()
        val out = Vector.newBuilder[String]
        while (it.hasNext) out += it.next().asText
        out.result()
      }
      (action, sugg)
    }).getOrElse(("remove", Vector.empty)) // unparseable answer = irreparable
  }

  /** Step 4: LLM query rewrite; on an unparseable answer fall back to
    * literal replacement (repaired → new URL, removed → "[URL removed]"),
    * exactly the reference's fallback. */
  def rewriteQuery(query: String, changes: Seq[UrlChange], language: String,
      client: ServiceClient): String = {
    val changeLines = changes.map {
      case UrlChange(from, "replace", Some(to)) => s"$from -> $to"
      case UrlChange(from, _, _)                => s"$from -> [URL removed]"
    }.mkString("\n")
    val prompt =
      s"""You are a query rewriting expert. Rewrite the query applying these URL changes and return STRICT JSON {"rewritten_query"}.
         |
         |Query:
         |$query
         |Changes:
         |$changeLines""".stripMargin
    jsonField(client.complete(prompt), "rewritten_query").getOrElse {
      changes.foldLeft(query) { (acc, c) =>
        acc.replace(c.original_url, c.new_url.getOrElse("[URL removed]"))
      }
    }
  }

  /** The full per-query chain with the reference's bounded-retry control
    * semantics: for each broken URL, up to `maxRepairAttempts` repair
    * consultations; each attempt's suggestions are HEAD-tested in order,
    * failures feed the next attempt's error context; an agent answer of
    * action != repair (or no suggestions) ends the loop early. */
  def processQuery(query: String, language: String, client: ServiceClient,
      maxRepairAttempts: Int = 3): Processed = {
    val urls = extractUrls(query, language, client)
    if (urls.isEmpty)
      return Processed(query, query, Vector.empty, UrlStats(0, 0, 0, 0))

    val validations = urls.map(u => u -> client.head(u))
    val outcomes = Vector.newBuilder[UrlOutcome]
    val changes = Vector.newBuilder[UrlChange]

    validations.foreach { case (url, v) =>
      if (v.accessible) outcomes += UrlOutcome(url, accessible = true, "kept", Some(url), 0)
      else {
        var working: Option[String] = None
        var currentError = v.error.getOrElse("Unknown")
        var attempts = 0
        var continueLoop = true
        while (continueLoop && working.isEmpty && attempts < maxRepairAttempts) {
          val (action, suggestions) =
            repairSuggestions(url, currentError, "query url", language, client)
          attempts += 1
          if (action == "repair" && suggestions.nonEmpty) {
            val it = suggestions.iterator
            while (working.isEmpty && it.hasNext) {
              val cand = it.next()
              val probe = client.head(cand)
              if (probe.accessible) working = Some(cand)
              else currentError =
                s"Previous attempt: $cand - ${probe.error.getOrElse("Unknown")}"
            }
          } else continueLoop = false // agent says the URL can't be repaired
        }
        working match {
          case Some(w) =>
            outcomes += UrlOutcome(url, accessible = false, "repaired", Some(w), attempts)
            changes += UrlChange(url, "replace", Some(w))
          case None =>
            outcomes += UrlOutcome(url, accessible = false, "removed", None, attempts)
            changes += UrlChange(url, "remove", None)
        }
      }
    }

    val allChanges = changes.result()
    val processed =
      if (allChanges.isEmpty) query
      else rewriteQuery(query, allChanges, language, client)
    val outs = outcomes.result()
    Processed(query, processed, outs,
      UrlStats(
        urls.size,
        outs.count(_.outcome == "kept"),
        outs.count(_.outcome == "repaired"),
        outs.count(_.outcome == "removed")))
  }
}
