package graft.core.text

import org.scalatest.funsuite.AnyFunSuite

/** Recovery-chain tests for the robust tool-call XML parser (F2). */
class RobustXmlSpec extends AnyFunSuite {

  test("a DOCTYPE + entity body NEVER expands (secure parsing, all strategies)") {
    // untrusted LLM output could carry a billion-laughs preamble; the
    // secure loader rejects any DOCTYPE, so no strategy may ever emit the
    // expanded entity text — checked over every (preamble, body) pairing
    val doctypes = Seq(
      "<!DOCTYPE root [<!ENTITY a \"AAAA\"><!ENTITY b \"&a;&a;&a;&a;\">]>",
      "<!DOCTYPE root [<!ENTITY a \"AAAA\">]>",
      "<!DOCTYPE root SYSTEM \"file:///etc/hostname\">")
    val bodies = Seq(
      "<tool_name>t</tool_name><parameter><q>&b;</q></parameter>",
      "<tool_name>t</tool_name><parameter><q>&a;</q></parameter>",
      "<q>&a;</q>")
    for (doctype <- doctypes; body <- bodies) {
      val parsed = RobustXml.parse(doctype + body)
      // either the body is rejected outright or whatever a later recovery
      // strategy salvages contains no expanded entity value
      assert(!parsed.map(_.text).exists(_.contains("AAAA")),
        s"entity expanded: $parsed")
      val tool = RobustXml.parseToolUse(doctype + body)
      assert(!tool.exists(_._2.exists(_._2.contains("AAAA"))), s"expanded: $tool")
    }
  }

  test("a DOCTYPE-free body is unaffected by the secure loader") {
    // the hardening must not change F2 semantics for ordinary bodies
    // (q40/q45 parity): same parse as before on the happy path
    val r = RobustXml.parseToolUse(
      "<tool_name>search</tool_name><parameter><q>spark &amp; scala</q></parameter>")
    assert(r == Some(("search", Vector("q" -> "spark & scala"))))
  }

  test("strategy 1: well-formed body parses as-is") {
    val r = RobustXml.parseToolUse(
      "<tool_name>search</tool_name><parameter><q>spark</q><k>5</k></parameter>")
    assert(r == Some(("search", Vector("q" -> "spark", "k" -> "5"))))
  }

  test("unbalanced parameter body still yields the call, with empty args") {
    // every XML strategy fails on the unbalanced <q>; the regex fallback
    // keeps the call but finds no <k>v</k> pair, and (reference parity)
    // the "content" fallback fires only for tag-FREE parameter text —
    // tagged-but-unpaired content maps to {}
    var n = -1
    val content =
      """<tool_use><tool_name>search</tool_name>
        |<parameter>
        |<q>unterminated value
        |</parameter></tool_use>""".stripMargin
    val (clean, calls) = NexXml.extractToolCalls(content, () => { n += 1; s"c$n" })
    assert(clean.isEmpty)
    assert(calls.head.name == "search")
    assert(calls.head.argumentsJson == "{}")
  }

  test("strategy 3: raw markup inside a parameter value is escaped") {
    val body =
      "<tool_name>write</tool_name><parameter><html><div>hello</div></html></parameter>"
    val r = RobustXml.parseToolUse(body)
    assert(r.map(_._1) == Some("write"))
    // the value's inner markup collapses to its text content, as in the
    // reference's ET itertext() handling
    assert(r.get._2.map(_._1) == Vector("html"))
  }

  test("raw ampersand in a value survives the chain") {
    val body = "<tool_name>t</tool_name><parameter><q>a & b</q></parameter>"
    val r = RobustXml.parseToolUse(body)
    assert(r.map(_._1) == Some("t"))
    assert(r.get._2 == Vector("q" -> "a & b"))
  }

  test("CDATA values collapse to their text") {
    val body = "<tool_name>t</tool_name><parameter><q><![CDATA[x < y]]></q></parameter>"
    val r = RobustXml.parseToolUse(body)
    assert(r.get._2 == Vector("q" -> "x < y"))
  }

  test("strategy 5: garbage around a recognizable tool_name still yields a call") {
    val body = "<<<broken <tool_name>rescue</tool_name> %% <unclosed"
    val r = RobustXml.parseToolUse(body)
    assert(r.map(_._1) == Some("rescue"))
  }

  test("plain prose parses as text (strategy 1) but yields no tool call") {
    // reference parity: ET parses bare text fine, finds no tool_name, and
    // the block is left in place — the "unknown" rebuild only fires when
    // strategies 1-4 all fail
    assert(RobustXml.parseToolUse("just some prose").isEmpty)
  }

  test("extractToolCalls integrates the chain (raw & no longer breaks extraction)") {
    var n = -1
    val content =
      "<tool_use><tool_name>t</tool_name><parameter><q>a & b</q></parameter></tool_use>"
    val (clean, calls) = NexXml.extractToolCalls(content, () => { n += 1; s"c$n" })
    assert(clean.isEmpty)
    assert(calls.head.argumentsJson == """{"q": "a & b"}""")
  }
}
