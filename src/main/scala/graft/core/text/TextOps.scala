package graft.core.text

import scala.util.matching.Regex

/** Remaining pure text operators: system-prompt section stripping (F5,
  * behavioral reference `convert_spans_to_chatcompletion.py:590-627`),
  * LLM-answer difficulty parsing (F16, `query_generator.py:629-685`),
  * embedded-JSON extraction (F17, `fuzzifier_agent.py:248-255`), and name
  * sanitization (F14, `get_traces.py:57-64`).
  */
object TextOps extends Serializable {

  // ---- F5: system-prompt section stripping -------------------------------

  private val SectionFamilies: Seq[Seq[Regex]] = Seq(
    Seq( // tool definitions
      "(?s)<TOOL_DEFINITIONS_START>.*?<TOOL_DEFINITIONS_END>".r,
      "(?s)## Available Tools\\s*\\n.*?(?=## Available Sub-Agents|## Available Sub-agents|$)".r),
    Seq( // sub-agent docs
      "(?s)<SUB_AGENTS_DEFINITIONS_START>.*?<SUB_AGENTS_DEFINITIONS_END>".r,
      "(?s)## Available Sub-Agents.*?(?=\\nWhen you use tools|\\nFor parallel execution|\\nFor batch processing|$)".r),
    Seq( // usage instructions
      "(?s)<TOOL_USAGE_INSTRUCTIONS_START>.*?<TOOL_USAGE_INSTRUCTIONS_END>".r,
      "(?s)\\nWhen you use tools or sub-agents.*?(?=\\n\\n[A-Z]|\\n\\nIMPORTANT:|$)".r))

  /** Strip tool-definition / sub-agent / usage-instruction documentation
    * from a system prompt. Per family, the first matching pattern is the
    * one removed (tag-delimited wins over heading-delimited). */
  def stripSysPromptSections(content: String): String =
    SectionFamilies.foldLeft(content) { (acc, family) =>
      family.find(_.findFirstIn(acc).isDefined) match {
        case Some(re) => re.replaceAllIn(acc, "")
        case None     => acc
      }
    }

  // ---- F16: difficulty-tagged answer parsing -----------------------------

  private val EnQuery: Regex =
    "(?s)\\*\\*(\\w+):\\*\\*\\s*(.*?)(?=\\*\\*\\w+:\\*\\*|$)".r
  private val ZhQuery: Regex =
    "(?s)\\*\\*(简单|中等|困难):\\*\\*\\s*(.*?)(?=\\*\\*(?:简单|中等|困难):\\*\\*|$)".r
  private val ZhMap = Map("简单" -> "easy", "中等" -> "medium", "困难" -> "hard")

  /** Parse "**EASY:** ..." / "**MEDIUM:** ..." / "**HARD:** ..." (or the
    * Chinese 简单/中等/困难 forms) into (difficulty, content) rows. Unknown
    * English labels are dropped, mirroring the reference. */
  def parseDifficultyAnswers(response: String): Vector[(String, String)] = {
    val en = EnQuery.findAllMatchIn(response).collect {
      case m if Set("EASY", "MEDIUM", "HARD")(m.group(1).toUpperCase) =>
        m.group(1).toLowerCase -> m.group(2).trim
    }.toVector
    if (en.nonEmpty) en
    else ZhQuery.findAllMatchIn(response)
      .map(m => ZhMap.getOrElse(m.group(1), "unknown") -> m.group(2).trim)
      .toVector
  }

  // ---- F17: embedded-JSON extraction -------------------------------------

  private val Fence: Regex = "(?s)```(?:json)?\\s*(.*?)```".r

  /** Return the first-{ to last-} span of the text (after stripping a
    * ```json fence if present); None when no object is detectable. */
  def extractJsonObject(text: String): Option[String] = {
    val body = Fence.findFirstMatchIn(text).map(_.group(1)).getOrElse(text)
    val start = body.indexOf('{')
    val end = body.lastIndexOf('}')
    if (start == -1 || end <= start) None else Some(body.substring(start, end + 1))
  }

  // ---- F19: word-boundary shortening -------------------------------------

  /** Shorten to at most `width` chars, cutting at a word boundary and
    * appending an ellipsis placeholder (textwrap.shorten semantics for the
    * common case: collapse whitespace first). */
  def shorten(text: String, width: Int, placeholder: String = " [...]"): String = {
    val collapsed = text.trim.split("\\s+").mkString(" ")
    if (collapsed.length <= width) collapsed
    else {
      val budget = width - placeholder.length
      val cut = collapsed.lastIndexOf(' ', budget)
      (if (cut > 0) collapsed.substring(0, cut) else collapsed.take(math.max(budget, 0)))
        .stripTrailing + placeholder
    }
  }

  // ---- F14: name sanitization --------------------------------------------

  private val Unsafe: Regex = "[^\\w.-]+".r

  /** Collapse filesystem-unsafe runs to `_`, trim, cap at 100 chars. */
  def sanitizeName(name: String): String = {
    val cleaned = Unsafe.replaceAllIn(name.trim, "_")
      .stripPrefix("_").stripSuffix("_")
    cleaned.take(100)
  }
}
