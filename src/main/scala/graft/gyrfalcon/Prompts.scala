package graft.gyrfalcon

/** F20: prompt block formatting — the framework-description and
  * search-context blocks the synthesis prompt embeds (behavioral
  * reference `query_generator.py:438-506`). Pure driver-side templates;
  * the A9/A10 truncations (3 queries, 5 results) are applied here. */
object Prompts {

  final case class SearchResult(
      title: String, source: String, date: String, snippet: String)

  /** Framework-suitability constraint block; empty description → empty
    * block (the reference's skip). */
  def frameworkDescriptionBlock(description: String, language: String = "english"): String =
    if (description.isEmpty) ""
    else if (language.equalsIgnoreCase("chinese"))
      s"""
         |
         |**⚠️ 框架适配性要求（重要）:**
         |生成的查询必须严格参考下述框架描述，确保查询内容适合该框架解决。生成的每个查询都应该在框架的能力范围内，不要生成超出框架能力范围的任务。
         |
         |- 框架描述: $description""".stripMargin
    else
      s"""
         |
         |**⚠️ FRAMEWORK SUITABILITY REQUIREMENT (IMPORTANT):**
         |The generated queries MUST strictly reference the framework description provided below and ensure that the query content is suitable for this framework to solve. Every generated query should be within the framework's capability scope - do NOT generate tasks that are beyond the framework's abilities.
         |
         |- Framework Description: $description""".stripMargin

  /** Search-context block: first-3 queries, first-5 results, optional
    * source/date descriptor and snippet line per result; nothing to show →
    * empty block. */
  def searchContextBlock(queries: Seq[String], results: Seq[SearchResult],
      language: String = "english"): String = {
    if (queries.isEmpty && results.isEmpty) return ""
    val zh = language.equalsIgnoreCase("chinese")
    val lines = Vector.newBuilder[String]
    lines += (if (zh) "- 最新外部检索摘要：" else "- Recent Findings from Web Search:")
    if (queries.nonEmpty)
      lines += (if (zh) "  检索词：" + queries.take(3).mkString("；")
                else "  Queries: " + queries.take(3).mkString(", "))
    results.take(5).zipWithIndex.foreach { case (r, i) =>
      val title =
        if (r.title.nonEmpty) r.title else if (zh) "(无标题)" else "(no title)"
      val extras = Seq(r.source, r.date).filter(_.nonEmpty).mkString(" ")
      val descriptor =
        if (extras.isEmpty) title
        else if (zh) s"$title（来源：$extras）"
        else s"$title — $extras"
      lines += s"  ${i + 1}. $descriptor"
      if (r.snippet.nonEmpty)
        lines += (if (zh) s"     摘要：${r.snippet}" else s"     Summary: ${r.snippet}")
    }
    lines.result().mkString("\n")
  }
}
