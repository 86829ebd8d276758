package graft.services

import org.scalatest.funsuite.AnyFunSuite

/** Pagination + retry semantics for the ingest connector (no Spark). */
class TraceFetcherSpec extends AnyFunSuite {

  import TraceFetcher._

  /** 3 pages of 2 spans; pages `failOn` throw once per (page, attempt). */
  private class FlakyStore(failures: Map[Int, Int]) extends SpanStore[String] {
    val attempts = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    override def fetchPage(traceId: String, page: Int): Page[String] = {
      attempts(page) += 1
      if (attempts(page) <= failures.getOrElse(page, 0))
        throw new RuntimeException(s"transient error on page $page")
      Page(Seq(s"$traceId-p$page-a", s"$traceId-p$page-b"),
        if (page < 2) Some(page + 1) else None)
    }
  }

  test("pages are concatenated in order") {
    val r = fetchTrace(new FlakyStore(Map.empty), "t1", backoff = _ => ())
    assert(r.spans == Seq("t1-p0-a", "t1-p0-b", "t1-p1-a", "t1-p1-b", "t1-p2-a", "t1-p2-b"))
    assert(r.attempts == 3) // one per page
  }

  test("transient failures retry with backoff and still succeed") {
    var backoffs = 0
    val r = fetchTrace(new FlakyStore(Map(1 -> 2)), "t1",
      maxRetries = 3, backoff = _ => backoffs += 1)
    assert(r.spans.size == 6)
    assert(backoffs == 2)
    assert(r.attempts == 5) // 3 pages + 2 retries
  }

  test("a page failing more than maxRetries propagates the error") {
    intercept[RuntimeException] {
      fetchTrace(new FlakyStore(Map(2 -> 5)), "t1", maxRetries = 3, backoff = _ => ())
    }
  }

  test("F15: extractTraceId finds the reference's exact pattern, first match wins") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val logs = Seq(
      // the reference pattern with arbitrary surrounding log noise
      ("r1", "booting...\nLangfuseTraceID: abc-123-DEF\ndone"),
      // whitespace after the colon is \s* — tabs and multiple spaces match
      ("r2", "LangfuseTraceID:\t  trace-9"),
      // first match wins when the marker appears twice (re.search semantics)
      ("r3", "LangfuseTraceID: first-id\nLangfuseTraceID: second-id"),
      // underscore is OUTSIDE [a-zA-Z0-9-]: the capture stops before it
      ("r4", "LangfuseTraceID: abc_def"),
      // no marker at all -> NULL, not empty string
      ("r5", "no trace id in this log")).toDF("run", "log")
    val got = TraceFetcher.extractTraceId(logs).orderBy("run")
      .select("run", "trace_id").as[(String, String)].collect()
    assert(got === Seq(
      ("r1", "abc-123-DEF"), ("r2", "trace-9"), ("r3", "first-id"),
      ("r4", "abc"), ("r5", null)))
  }

  test("batch fetch isolates per-trace failures") {
    val store = new SpanStore[String] {
      override def fetchPage(traceId: String, page: Int): Page[String] =
        if (traceId == "bad") throw new RuntimeException("boom")
        else Page(Seq(s"$traceId-span"), None)
    }
    val (ok, failed) = fetchAll(store, Seq("a", "bad", "b"),
      maxRetries = 1, backoff = _ => ())
    assert(ok.keySet == Set("a", "b"))
    assert(failed.keySet == Set("bad"))
  }
}
