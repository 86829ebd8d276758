package graft.gyrfalcon

import org.scalatest.funsuite.AnyFunSuite

/** F20 prompt block formatting (pure templates, no Spark). */
class PromptsSpec extends AnyFunSuite {

  test("framework description block: bilingual, empty in → empty out") {
    assert(Prompts.frameworkDescriptionBlock("") == "")
    val en = Prompts.frameworkDescriptionBlock("A research framework")
    assert(en.contains("FRAMEWORK SUITABILITY REQUIREMENT"))
    assert(en.contains("- Framework Description: A research framework"))
    val zh = Prompts.frameworkDescriptionBlock("研究框架", "chinese")
    assert(zh.contains("框架适配性要求") && zh.contains("- 框架描述: 研究框架"))
  }

  test("search context block truncates to 3 queries / 5 results with per-result detail") {
    assert(Prompts.searchContextBlock(Nil, Nil) == "")
    val results = (1 to 7).map(i =>
      Prompts.SearchResult(s"Title $i", if (i == 2) "src" else "",
        if (i == 2) "2025" else "", if (i <= 2) s"snippet $i" else ""))
    val block = Prompts.searchContextBlock(
      Seq("q1", "q2", "q3", "q4"), results)
    assert(block.startsWith("- Recent Findings from Web Search:"))
    assert(block.contains("Queries: q1, q2, q3") && !block.contains("q4"))
    assert(block.contains("5. Title 5") && !block.contains("Title 6"),
      "results truncate at 5")
    assert(block.contains("2. Title 2 — src 2025"), "source/date descriptor")
    assert(block.contains("     Summary: snippet 2"))
    assert(!block.contains("Summary: snippet 3") &&
      "Summary:".r.findAllIn(block).length == 2)
    val zh = Prompts.searchContextBlock(Seq("词"), results.take(1), "chinese")
    assert(zh.contains("检索词：词") && zh.contains("摘要：snippet 1"))
  }
}
