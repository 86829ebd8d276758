package graft.services

import java.security.MessageDigest

/** External-service boundary (SURVEY.md §2.7): every LLM/HTTP row operator
  * (X1–X5, R7 tag generation) goes through this trait so the data plane is
  * testable offline — this environment has zero egress, and the reference
  * itself separates conversion (pure CPU) from generation (LLM-bound).
  *
  * A production deployment drops in an HTTP-backed implementation with a
  * pooled client; the engine only ever calls it inside `mapPartitions`
  * with bounded per-partition concurrency, mirroring the reference's
  * worker-pool semantics.
  */
trait ServiceClient extends Serializable {
  /** X1: chat completion. */
  def complete(prompt: String): String
  /** X2: web search — top-k snippet strings. */
  def search(query: String, k: Int): Seq[String]
  /** X3: HTTP HEAD probe (url_validator_agent.py:118-175 — retry and
    * redirect handling live in the implementation, the pipeline only sees
    * the final verdict). */
  def head(url: String): HeadResult
  /** X4: HTTP GET for file provisioning (file_system_agent.py:215-226). */
  def fetch(url: String): FetchResult
  /** S15: raw `tools/list` answer from an MCP server (the reference shells
    * out to `mcp dev <url> --method tools/list`, mcp_preloader.py:160-176). */
  def mcpToolsList(url: String): String
}

/** Outcome of a HEAD probe: terminal status and the validator's verdict. */
final case class HeadResult(statusCode: Int, accessible: Boolean, error: Option[String])

/** Outcome of a GET: body bytes on success, error otherwise. */
final case class FetchResult(statusCode: Int, content: Option[Array[Byte]], error: Option[String])

/** Deterministic offline stub: responses are pure functions of the prompt
  * (md5-seeded), shaped so the downstream parsers (F16 difficulty parse,
  * F17 JSON extraction) accept them — the whole synthesis pipeline runs
  * end-to-end with stable, hash-checkable output.
  */
object StubServiceClient extends ServiceClient {

  private def h(s: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** First 8 md5 hex digits as a uniform in [0, 2^32) — the same value
    * DuckDB's `u32Sql` fold computes, so stub decisions are replicable in
    * oracle SQL. */
  private def u32(s: String): Long = java.lang.Long.parseLong(h(s).take(8), 16)

  /** Prompt-shaped dispatch: suitability prompts get a SUITABLE /
    * NOT_SUITABLE verdict (~80/20, hash-decided), rewrite prompts get a
    * rewritten query, URL-pipeline prompts (X3) get the strict-JSON
    * answers their parsers expect, everything else gets the
    * three-difficulty answer format the reference's synthesis prompt
    * requests (**EASY/MEDIUM/HARD** markers). */
  override def complete(prompt: String): String = {
    val seed = h(prompt).take(8)
    if (prompt.startsWith("Evaluate suitability"))
      if ((Integer.parseInt(seed.take(4), 16) % 10) < 8) "SUITABLE"
      else s"NOT_SUITABLE: mismatch $seed"
    else if (prompt.startsWith("Rewrite"))
      s"rewritten[$seed] ${prompt.linesIterator.toSeq.last.trim}"
    else if (prompt.startsWith("You are a URL extraction expert"))
      extractionAnswer(prompt)
    else if (prompt.startsWith("You are a URL repair expert"))
      repairAnswer(prompt)
    else if (prompt.startsWith("You are a query rewriting expert"))
      rewriteAnswer(prompt)
    else if (prompt.startsWith("You are a file requirement analyst"))
      requirementAnswer(prompt)
    else if (prompt.startsWith("You are a file provisioning planner"))
      planAnswer(prompt)
    else if (prompt.startsWith("You are a taxonomy expansion expert"))
      // X7: bilingual tag proposal wrapped in prose, so the caller's
      // embedded-JSON extraction (F17) is genuinely exercised.
      s"""Sure, here is a new category proposal:
         |{"id": "tag_$seed", "en": "topic $seed", "zh": "主题 $seed"}
         |Let me know if you need another.""".stripMargin
    else
      s"""**EASY:** easy task $seed
         |**MEDIUM:** medium task $seed covering ${prompt.take(24).trim}
         |**HARD:** hard task $seed with multiple constraints""".stripMargin
  }

  override def search(query: String, k: Int): Seq[String] =
    (0 until k).map(i => s"result $i for ${query.take(32)}: ${h(s"$i:$query").take(12)}")

  /** X3 HEAD stub: ~80% of URLs accessible, md5-decided — replicated in
    * oracle SQL as `u32(md5('head:' || url)) % 5 != 0`. */
  override def head(url: String): HeadResult =
    if (u32(s"head:$url") % 5 != 0) HeadResult(200, accessible = true, None)
    else HeadResult(404, accessible = false, Some("HTTP 404"))

  /** X4 GET stub: same 80% success draw as HEAD but keyed on 'get:', so a
    * URL's HEAD and GET verdicts are independent; body bytes are the
    * deterministic string "content:<url>" (oracle: `md5('content:'||url)`). */
  override def fetch(url: String): FetchResult =
    if (u32(s"get:$url") % 5 != 0)
      FetchResult(200, Some(s"content:$url".getBytes("UTF-8")), None)
    else FetchResult(404, None, Some("HTTP 404"))

  /** S15 stub: 1–3 deterministic tools per server, keyed on the url. */
  override def mcpToolsList(url: String): String = {
    val seed = h(s"mcp:$url").take(8)
    val n = 1 + (u32(s"mcp:$url") % 3).toInt
    val tools = (0 until n).map(i =>
      s"""{"name": "${seed}_tool_$i", "description": "stub tool $i of $url"}""")
    s"""{"tools": [${tools.mkString(", ")}]}"""
  }

  private val UrlRe = "https?://[^\\s\"'<>\\)\\]]+".r

  /** Extraction: regex the real URLs out of the prompt's query block
    * (placeholder URLs with {} or <> excluded), answer in the strict JSON
    * shape the reference's extractor returns. */
  private def extractionAnswer(prompt: String): String = {
    val body = prompt.split("Query:\n", 2).lift(1).map(_.split("\nRequirements")(0))
      .getOrElse("")
    val urls = UrlRe.findAllIn(body).toVector.distinct
      .filterNot(u => u.contains("{") || u.contains("<"))
    val items = urls.map(u =>
      s"""{"url": "$u", "description": "stub", "context": "stub"}""")
    s"""{"urls": [${items.mkString(", ")}]}"""
  }

  /** Repair: 25% of broken URLs are declared irreparable (md5-decided,
    * `u32(md5('repair:' || url)) % 4 == 0`); the rest get two fix
    * candidates `url#fix1` / `url#fix2` on the first attempt. A repeat
    * call for the same URL (its error line mentions a previous #fix
    * candidate) answers action=remove — the reference's "agent says the
    * URL can't be repaired" terminal. */
  private def repairAnswer(prompt: String): String = {
    val url = "(?m)^Original URL: (.*)$".r.findFirstMatchIn(prompt)
      .map(_.group(1).trim).getOrElse("")
    val error = "(?m)^Error: (.*)$".r.findFirstMatchIn(prompt)
      .map(_.group(1).trim).getOrElse("")
    if (u32(s"repair:$url") % 4 == 0 || error.contains("#fix"))
      """{"repairable": false, "suggested_urls": [], "action": "remove"}"""
    else
      s"""{"repairable": true, "suggested_urls": ["$url#fix1", "$url#fix2"],
         | "reasoning": "stub", "action": "repair"}""".stripMargin
  }

  private def queryBlock(prompt: String): String =
    prompt.split("Query:\n", 2).lift(1)
      .map(b => b.split("\nReturn")(0).split("\nRequired items:")(0).trim)
      .getOrElse("")

  /** X4 classify: a query is file-dependent iff it mentions a dataset —
    * deterministic and mirrored by the oracle's corpus construction. */
  private def requirementAnswer(prompt: String): String = {
    val q = queryBlock(prompt)
    if (q.contains("dataset"))
      """{"requires_files": true, "reason": "mentions a dataset",
        | "required_items": ["dataset"]}""".stripMargin
    else """{"requires_files": false, "reason": "", "required_items": []}"""
  }

  private val AnySchemeUrlRe = "(?:https?://|data:)[^\\s\"'<>\\)\\]]+".r

  /** X4 plan: every URL in the query (any scheme — the DOWNLOADER enforces
    * https-only, not the planner) becomes one file entry, in order. */
  private def planAnswer(prompt: String): String = {
    val urls = AnySchemeUrlRe.findAllIn(queryBlock(prompt)).toVector.distinct
    val items = urls.map(u => s"""{"url": "$u", "description": "stub file"}""")
    s"""{"directory_name": null, "files": [${items.mkString(", ")}]}"""
  }

  /** Rewrite: apply the requested url_changes literally (the reference's
    * fallback semantics, here as the primary answer) and return the
    * strict-JSON shape the rewrite parser expects. */
  private def rewriteAnswer(prompt: String): String = {
    val query = prompt.split("Query:\n", 2).lift(1).map(_.split("\nChanges:\n")(0).trim)
      .getOrElse("")
    val changes = prompt.split("Changes:\n", 2).lift(1).getOrElse("")
    val rewritten = changes.linesIterator.foldLeft(query) { (acc, line) =>
      line.split(" -> ", 2) match {
        case Array(from, to) => acc.replace(from.trim, to.trim)
        case _               => acc
      }
    }
    val esc = rewritten.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"rewritten_query": "$esc"}"""
  }
}
