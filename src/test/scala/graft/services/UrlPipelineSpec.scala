package graft.services

import org.scalatest.funsuite.AnyFunSuite

/** X3 URL-pipeline control semantics against scripted clients — the
  * reference's retry/fallback behavior (`url_processing_agent.py:130-300`)
  * reproduced on fixture rows. No SparkSession needed: the chain is a pure
  * per-row function (that's what makes it mapPartitions-safe). */
class UrlPipelineSpec extends AnyFunSuite {

  /** Scripted client: programmable HEAD verdicts + canned LLM answers,
    * recording every call. */
  private class Scripted(
      accessible: String => Boolean,
      repairAnswers: Iterator[String] = Iterator.continually(
        """{"repairable": false, "suggested_urls": [], "action": "remove"}"""))
      extends ServiceClient {
    val prompts = scala.collection.mutable.Buffer.empty[String]
    val heads = scala.collection.mutable.Buffer.empty[String]
    override def complete(prompt: String): String = {
      prompts += prompt
      if (prompt.startsWith("You are a URL extraction expert"))
        StubServiceClient.complete(prompt) // regex extraction is fine here
      else if (prompt.startsWith("You are a URL repair expert")) repairAnswers.next()
      else if (prompt.startsWith("You are a query rewriting expert"))
        "not json at all" // force the literal-replacement fallback
      else ""
    }
    override def search(q: String, k: Int): Seq[String] = Seq.empty
    override def mcpToolsList(url: String): String = """{"tools": []}"""
    override def fetch(url: String): FetchResult =
      FetchResult(200, Some(Array.emptyByteArray), None)
    override def head(url: String): HeadResult = {
      heads += url
      if (accessible(url)) HeadResult(200, accessible = true, None)
      else HeadResult(404, accessible = false, Some("HTTP 404"))
    }
  }

  test("no URLs: query passes through with zero stats and no service calls beyond extraction") {
    val c = new Scripted(_ => true)
    val p = UrlPipeline.processQuery("plain query with no links", "english", c)
    assert(p.processed_query == "plain query with no links")
    assert(p.stats == UrlPipeline.UrlStats(0, 0, 0, 0))
    assert(c.heads.isEmpty)
    assert(c.prompts.size == 1) // extraction only
  }

  test("accessible URLs are kept; no repair consultation happens") {
    val c = new Scripted(_ => true)
    val p = UrlPipeline.processQuery("see https://ok.example/a", "english", c)
    assert(p.outcomes.map(_.outcome) == Vector("kept"))
    assert(p.stats == UrlPipeline.UrlStats(1, 1, 0, 0))
    assert(p.processed_query == "see https://ok.example/a")
    assert(!c.prompts.exists(_.startsWith("You are a URL repair expert")))
  }

  test("broken URL repaired on the second suggested candidate") {
    val c = new Scripted(
      accessible = u => u.endsWith("#b"),
      repairAnswers = Iterator(
        """{"repairable": true, "suggested_urls": ["https://x.example/p#a", "https://x.example/p#b"], "action": "repair"}"""))
    val p = UrlPipeline.processQuery("fetch https://x.example/p now", "english", c)
    assert(p.outcomes.head.outcome == "repaired")
    assert(p.outcomes.head.final_url.contains("https://x.example/p#b"))
    assert(p.outcomes.head.repair_attempts == 1)
    // fallback literal rewrite replaced the broken URL
    assert(p.processed_query == "fetch https://x.example/p#b now")
    // both candidates were HEAD-tested, in order
    assert(c.heads.containsSlice(Seq("https://x.example/p#a", "https://x.example/p#b")))
  }

  test("failed candidates feed the next attempt's error context; attempts are bounded at 3") {
    val answers = Iterator.continually(
      """{"repairable": true, "suggested_urls": ["https://y.example/q#z"], "action": "repair"}""")
    val c = new Scripted(_ => false, answers)
    val p = UrlPipeline.processQuery("read https://y.example/q today", "english", c)
    assert(p.outcomes.head.outcome == "removed")
    assert(p.outcomes.head.repair_attempts == 3) // the hard cap
    val repairPrompts = c.prompts.filter(_.startsWith("You are a URL repair expert"))
    assert(repairPrompts.size == 3)
    assert(repairPrompts(1).contains("Previous attempt: https://y.example/q#z"),
      "attempt 2 must carry attempt 1's failure as its error context")
    assert(p.processed_query == "read [URL removed] today")
    assert(p.stats == UrlPipeline.UrlStats(1, 0, 0, 1))
  }

  test("an action != repair verdict ends the loop early") {
    val c = new Scripted(_ => false)
    val p = UrlPipeline.processQuery("get https://z.example/r", "english", c)
    assert(p.outcomes.head.outcome == "removed")
    assert(p.outcomes.head.repair_attempts == 1)
    assert(c.prompts.count(_.startsWith("You are a URL repair expert")) == 1)
  }

  test("an unparseable repair answer is treated as irreparable, not a crash") {
    val c = new Scripted(_ => false, Iterator("the llm rambled with no json"))
    val p = UrlPipeline.processQuery("get https://w.example/s", "english", c)
    assert(p.outcomes.head.outcome == "removed")
  }

  test("multi-URL query: outcomes are independent per URL") {
    val c = new Scripted(u => u.contains("ok"))
    val p = UrlPipeline.processQuery(
      "compare https://ok.example/1 with https://bad.example/2", "english", c)
    assert(p.outcomes.map(_.outcome) == Vector("kept", "removed"))
    assert(p.stats == UrlPipeline.UrlStats(2, 1, 0, 1))
    assert(p.processed_query == "compare https://ok.example/1 with [URL removed]")
  }

  test("stub client end-to-end: rewrite goes through the LLM JSON path") {
    // StubServiceClient's rewrite answers strict JSON applying the changes,
    // so the parsed (non-fallback) path is exercised too.
    val q = "Analyze https://data.example.org/doc7 please"
    val p = UrlPipeline.processQuery(q, "english", StubServiceClient)
    assert(p.outcomes.size == 1)
    if (p.outcomes.head.outcome == "kept") assert(p.processed_query == q)
    else assert(p.processed_query != q)
  }
}
