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
}

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

  /** Prompt-shaped dispatch: suitability prompts get a SUITABLE /
    * NOT_SUITABLE verdict (~80/20, hash-decided), rewrite prompts get a
    * rewritten query, everything else gets the three-difficulty answer
    * format the reference's synthesis prompt requests
    * (**EASY/MEDIUM/HARD** markers). */
  override def complete(prompt: String): String = {
    val seed = h(prompt).take(8)
    if (prompt.startsWith("Evaluate suitability"))
      if ((Integer.parseInt(seed.take(4), 16) % 10) < 8) "SUITABLE"
      else s"NOT_SUITABLE: mismatch $seed"
    else if (prompt.startsWith("Rewrite"))
      s"rewritten[$seed] ${prompt.linesIterator.toSeq.last.trim}"
    else
      s"""**EASY:** easy task $seed
         |**MEDIUM:** medium task $seed covering ${prompt.take(24).trim}
         |**HARD:** hard task $seed with multiple constraints""".stripMargin
  }

  override def search(query: String, k: Int): Seq[String] =
    (0 until k).map(i => s"result $i for ${query.take(32)}: ${h(s"$i:$query").take(12)}")
}
