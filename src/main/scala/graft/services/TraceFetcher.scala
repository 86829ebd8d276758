package graft.services

import scala.annotation.tailrec
import scala.util.{Failure, Success, Try}

/** Edge connector for span-store ingest (S2/S3, behavioral reference
  * `converter/trace/langfuse_utils.py:84-183` + `get_traces.py:121-209`):
  * page through an observation API, skip traces without output, retry
  * transient failures with backoff, and land the results for the S1
  * reader. Driver-side (or foreachPartition for many traces) — the engine
  * proper starts at the landing zone; resume is the anti-join in
  * graft.sources.Sinks.notYetLanded, replacing per-file existence checks.
  */
object TraceFetcher {

  /** One observation page; `next` is None on the last page. */
  final case class Page[A](items: Seq[A], next: Option[Int])

  /** The store boundary: real impls wrap an HTTP client. */
  trait SpanStore[A] extends Serializable {
    def fetchPage(traceId: String, page: Int): Page[A]
  }

  final case class FetchResult[A](spans: Seq[A], attempts: Int)

  /** Fetch every page of one trace, retrying each page up to `maxRetries`
    * times (reference: 3 attempts, fixed backoff — injectable here so
    * tests don't sleep). Fails only after the final retry. */
  def fetchTrace[A](
      store: SpanStore[A],
      traceId: String,
      maxRetries: Int = 3,
      backoff: Int => Unit = _ => Thread.sleep(5000)): FetchResult[A] = {

    @tailrec
    def fetchWithRetry(page: Int, attempt: Int, totalAttempts: Int): (Page[A], Int) =
      Try(store.fetchPage(traceId, page)) match {
        case Success(p) => (p, totalAttempts + 1)
        case Failure(e) if attempt < maxRetries =>
          backoff(attempt)
          fetchWithRetry(page, attempt + 1, totalAttempts + 1)
        case Failure(e) => throw e
      }

    @tailrec
    def loop(page: Int, acc: Vector[A], attempts: Int): FetchResult[A] = {
      val (p, att) = fetchWithRetry(page, 1, attempts)
      val next = acc ++ p.items
      p.next match {
        case Some(n) => loop(n, next, att)
        case None    => FetchResult(next, att)
      }
    }
    loop(0, Vector.empty, 0)
  }

  /** P6: drop unusable trace listings — rows missing id, name, or output
    * (`get_traces.py:138-144`); the reference skips them before spending a
    * download on them. Pushdown-friendly null filters. */
  def usableTraces(traces: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    traces.filter(col("trace_id").isNotNull && col("name").isNotNull &&
      col("output").isNotNull)
  }

  /** F15: extract the trace id an agent run printed into its log
    * (`run_end_to_end.py:270-277`: `re.search(r"LangfuseTraceID:\s*([a-zA-Z0-9-]+)")`
    * over the whole log body, first match wins, absent on no match).
    * `regexp_extract` returns "" on no match; the reference's "could not
    * extract" case is modeled as NULL so downstream joins/filters see a
    * proper missing value rather than an empty-string key. */
  val traceIdPattern = "LangfuseTraceID:\\s*([a-zA-Z0-9-]+)"

  def extractTraceId(logs: org.apache.spark.sql.DataFrame,
      logCol: String = "log", outCol: String = "trace_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract, when}
    val hit = regexp_extract(col(logCol), traceIdPattern, 1)
    logs.withColumn(outCol, when(hit =!= "", hit))
  }

  /** S3 wired end-to-end: the fetch worklist — usable listings (P6) minus
    * already-landed traces (J7 anti-join), as a bounded, deterministic id
    * batch for [[fetchAll]]. The limit caps one fetch round (the
    * reference's --max-queries staging); remaining traces surface on the
    * next call because landing is resume-safe. */
  def pendingTraceIds(listing: org.apache.spark.sql.DataFrame,
      landedIds: org.apache.spark.sql.DataFrame, limit: Int = 10000): Seq[String] =
    graft.sources.Sinks.notYetLanded(usableTraces(listing), landedIds)
      .select("trace_id").distinct().orderBy("trace_id").limit(limit)
      .collect().map(_.getString(0)).toSeq

  /** Batch variant: fetch every not-yet-landed trace, collecting per-trace
    * failures instead of aborting the batch (the reference logs-and-
    * continues). */
  def fetchAll[A](
      store: SpanStore[A],
      traceIds: Seq[String],
      maxRetries: Int = 3,
      backoff: Int => Unit = _ => Thread.sleep(5000))
      : (Map[String, Seq[A]], Map[String, String]) = {
    val results = traceIds.map { id =>
      id -> Try(fetchTrace(store, id, maxRetries, backoff))
    }
    (results.collect { case (id, Success(r)) => id -> r.spans }.toMap,
      results.collect { case (id, Failure(e)) => id -> e.getMessage }.toMap)
  }
}
