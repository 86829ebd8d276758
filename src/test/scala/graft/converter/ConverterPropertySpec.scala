package graft.converter

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-fuzz the converter with HOSTILE span trees — parent cycles,
  * self-loops, missing parents, >32-hop chains, lone surrogates, empty and
  * tag-soup contents. Two layers:
  *
  *   1. the pure core (`resolveAgent`, `recordOf`) under raw ScalaCheck —
  *      total, terminating, and internally consistent on any input;
  *   2. the distributed DAG (`convert`) against a LOCAL reference
  *      evaluation of the same pure functions — the groupByKey /
  *      flatMapGroups / encoder plumbing must preserve pure semantics
  *      exactly (and be deterministic run-to-run), which is the same
  *      distributed==reference contract the DuckDB oracle checks for the
  *      SQL-expressible queries.
  *
  * Raw Gens driven by a fixed-seed sampler, as in TextPropertySpec (the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class ConverterPropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 200)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // ---- hostile building blocks -------------------------------------------

  /** Valid-UTF-8 hostility — safe through Spark's UTF8String plane. */
  private val e2eContent: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const("Tool execution results:"),
    Gen.const("Tool execution results:\n<tool_result><tool_name>x</tool_name>" +
      "<result>found</result></tool_result>"),
    Gen.const("Tool execution results:\n<tool_result><tool_name>other</tool_name>" +
      "<result>mismatched name</result></tool_result>"),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('<'),
      Gen.const('>'), Gen.const('&'), Gen.const('"'))).map(_.mkString),
    Gen.const("emoji 😀 astral 🤖 CJK 中文测试 bidi \u202e"),
    Gen.const("<tool_use><tool_name>t</tool_name><parameter><q>v</q></parameter>"),
    Gen.const("<tool_use>\n<tool_name>search</tool_name>\n<parameter>\n" +
      "<q>ok</q>\n</parameter>\n</tool_use>"),
    Gen.const("<use_parallel_tool_calls><parallel_tool><tool_name>a</tool_name>" +
      "<parameter><x>1</x></parameter></parallel_tool></use_parallel_tool_calls>"))

  /** Adds LONE SURROGATES — invalid UTF-16 the pure layer must tolerate.
    * Kept out of the e2e generator: Spark (like any UTF-8 surface,
    * including the JSONL sources) normalizes them to replacement bytes on
    * ingestion, so the distributed string is legitimately != the JVM one. */
  private val hostileContent: Gen[String] = Gen.oneOf(
    e2eContent, Gen.const("lone high surrogate \uD800 end"),
    Gen.const("\uDC00 lone low surrogate first"))

  private val role: Gen[String] =
    Gen.frequency(3 -> "user", 3 -> "assistant", 2 -> "system", 1 -> "tool", 1 -> "")

  private val message: Gen[SpanMessage] =
    Gen.zip(role, hostileContent).map { case (r, c) => SpanMessage(r, c) }

  private val e2eMessage: Gen[SpanMessage] =
    Gen.zip(role, e2eContent).map { case (r, c) => SpanMessage(r, c) }

  // ---- pure core: resolveAgent on arbitrary (cyclic) topologies ----------

  private val topology: Gen[Map[String, SpanConverter.SpanLite]] = for {
    n <- Gen.choose(1, 10)
    ids = (0 until n).map(i => s"s$i").toVector
    entries <- Gen.sequence[Vector[(String, SpanConverter.SpanLite)], (String, SpanConverter.SpanLite)](
      ids.map { id =>
        for {
          tpe <- Gen.oneOf("SPAN", "GENERATION", "EVENT")
          name <- Gen.oneOf("meta", "Sub-agent: alpha", "beta_agent", "")
          parent <- Gen.frequency(
            2 -> Gen.const(Option.empty[String]),
            6 -> Gen.oneOf(ids).map(Option(_)), // includes SELF → cycles
            1 -> Gen.const(Option("ghost")))    // missing parent
        } yield id -> SpanConverter.SpanLite(
          "t", id, tpe, name, parent, None, Seq.empty, None)
      })
  } yield entries.toMap

  test("resolveAgent terminates on cycles/self-loops/ghosts; a hit is a real SPAN") {
    forAll(Gen.zip(topology, Gen.choose(0, 10)), n = 500) { case (byId, startIdx) =>
      val start = byId.keys.toVector.sorted.lift(startIdx)
      val r = SpanConverter.resolveAgent(byId, start) // must not hang or throw
      r.foreach { name =>
        assert(byId.values.exists(s => s.span_type == "SPAN" &&
          s.span_name.stripPrefix("Sub-agent: ").trim == name),
          s"agent '$name' not attributable to any SPAN in $byId")
      }
    }
  }

  test("resolveAgent walks >32-hop chains to None, shorter chains to the SPAN") {
    def chain(len: Int): Map[String, SpanConverter.SpanLite] = {
      val top = SpanConverter.SpanLite("t", "agent", "SPAN", "Sub-agent: deep",
        None, None, Seq.empty, None)
      val hops = (0 until len).map { i =>
        val parent = if (i == len - 1) "agent" else s"h${i + 1}"
        s"h$i" -> SpanConverter.SpanLite("t", s"h$i", "EVENT", "", Some(parent),
          None, Seq.empty, None)
      }
      (hops :+ ("agent" -> top)).toMap
    }
    // start at h0: len intermediate hops + the SPAN itself = len+1 lookups
    assert(SpanConverter.resolveAgent(chain(30), Some("h0")).contains("deep"))
    assert(SpanConverter.resolveAgent(chain(40), Some("h0")).isEmpty,
      "a >32-hop chain must hit the hop bound, not walk forever")
  }

  // ---- pure core: recordOf on hostile message lists -----------------------

  test("recordOf is total and internally consistent on hostile inputs") {
    val args = for {
      msgs <- Gen.listOf(message).map(_.take(6))
      out <- Gen.option(hostileContent)
    } yield (msgs, out)
    forAll(args, n = 300) { case (msgs, out) =>
      val r = SpanConverter.recordOf("trace😀", "span 中", Some("a"), msgs, out)
      // n_tool_calls is the sum over messages — the A4-stats contract
      assert(r.n_tool_calls == r.messages.map(_.tool_calls.size).sum)
      // every input turn maps to >=1 message, plus one response turn
      assert(r.messages.size >= msgs.size + 1)
      assert(r.messages.last.role == "assistant")
      // J5 pairing assigns id and name TOGETHER; a raw role="tool" input
      // turn passes through with neither (the reference's inputs never
      // carry tool roles, so passthrough is the honest behavior)
      r.messages.filter(_.role == "tool").foreach { m =>
        assert(m.tool_call_id.nonEmpty == m.name.nonEmpty)
      }
      assert(r.finish_reason == "stop" || r.finish_reason == "tool_calls")
      // determinism of the pure function (call ids are seeded, not uuid4)
      assert(r == SpanConverter.recordOf("trace😀", "span 中", Some("a"), msgs, out))
    }
  }

  // ---- distributed DAG == local reference on hostile trees ----------------

  private def hostileTrace(traceId: String): Gen[Vector[Span]] = for {
    n <- Gen.choose(1, 7)
    ids = (0 until n).map(i => s"${traceId}_s$i").toVector
    spans <- Gen.sequence[Vector[Span], Span](ids.map { id =>
      for {
        tpe <- Gen.frequency(3 -> Gen.const("GENERATION"),
          2 -> Gen.const("SPAN"), 1 -> Gen.const("EVENT"))
        name <- tpe match {
          case "SPAN" => Gen.oneOf("meta", "Sub-agent: alpha", "beta_agent")
          case _ => Gen.frequency(
            3 -> Gen.const(s"x-${Spans.GenerationMarker}"),
            1 -> Gen.const("unmarked"))
        }
        parent <- Gen.frequency(
          2 -> Gen.const(Option.empty[String]),
          6 -> Gen.oneOf(ids).map(Option(_)),
          1 -> Gen.const(Option(s"${traceId}_ghost")))
        start <- Gen.oneOf(Option.empty[String], Some("2025-01-01T00:00:00Z"),
          Some("not a timestamp"), Some(""))
        msgs <- Gen.listOf(e2eMessage).map(_.take(4))
        out <- Gen.option(e2eContent.map(SpanMessage("assistant", _)))
      } yield Span(traceId, id, tpe, name, None, msgs, out, start, parent, 0)
    })
  } yield spans

  /** The >32-hop chain and the 2-cycle as deterministic fixtures unioned
    * into every sample (Gen rarely produces them at full length). */
  private def fixtureTraces: Vector[Span] = {
    val marker = s"g-${Spans.GenerationMarker}"
    val msg = Seq(SpanMessage("user", "hello"))
    val chain = (0 until 40).map { i =>
      Span("fx_chain", s"c$i", "EVENT", "", None, Seq.empty, None, None,
        Some(if (i == 39) "c_agent" else s"c${i + 1}"), 0)
    } ++ Seq(
      Span("fx_chain", "c_agent", "SPAN", "Sub-agent: deep", None, Seq.empty,
        None, None, None, 0),
      Span("fx_chain", "gen", "GENERATION", marker, None, msg,
        Some(SpanMessage("assistant", "ok")), None, Some("c0"), 0))
    val cycle = Seq(
      Span("fx_cycle", "a", "EVENT", "", None, Seq.empty, None, None, Some("b"), 0),
      Span("fx_cycle", "b", "EVENT", "", None, Seq.empty, None, None, Some("a"), 0),
      Span("fx_cycle", "gen", "GENERATION", marker, None, msg,
        Some(SpanMessage("assistant", "ok")), None, Some("a"), 0))
    (chain ++ cycle).toVector
  }

  /** Local reference evaluation: the same pure functions, no Spark. */
  private def reference(spans: Seq[Span], nexau: Boolean): Seq[SpanConverter.ChatRecord] =
    spans.groupBy(_.trace_id).toSeq.flatMap { case (traceId, ts) =>
      val lites = ts.map(s => SpanConverter.SpanLite(s.trace_id, s.span_id,
        s.span_type, s.span_name, s.parentObservationId, s.startTime,
        s.input, s.output.map(_.content)))
      val byId = lites.map(s => s.span_id -> s).toMap
      SpanConverter.lastGenerationsLocal(lites).sortBy(_.span_id).flatMap { g =>
        val agent = SpanConverter.resolveAgent(byId, g.parentObservationId)
        if (agent.contains("meta")) None
        else Some(
          if (nexau) SpanConverter.recordOfNexau(traceId, g.span_id, agent, g.input, g.out_content)
          else SpanConverter.recordOf(traceId, g.span_id, agent, g.input, g.out_content))
      }
    }

  test("convert == local reference on hostile trees, and is run-deterministic") {
    import spark.implicits._
    val sample = Gen.sequence[Vector[Vector[Span]], Vector[Span]](
      (0 until 12).map(t => hostileTrace(s"t$t")))
    forAll(sample, n = 6) { traces =>
      val spans = traces.flatten ++ fixtureTraces
      val df = spans.toDS.toDF
      def run(nexau: Boolean) = SpanConverter.convert(spark, df, nexau)
        .collect().sortBy(r => (r.trace_id, r.span_id)).toSeq
      def diff(a: Seq[SpanConverter.ChatRecord], b: Seq[SpanConverter.ChatRecord],
          label: String): Unit = {
        assert(a.size == b.size, s"$label: ${a.size} vs ${b.size} records; " +
          s"keys ${a.map(r => (r.trace_id, r.span_id))} vs ${b.map(r => (r.trace_id, r.span_id))}")
        a.zip(b).foreach { case (x, y) =>
          assert(x == y, s"$label first divergence at (${x.trace_id}, ${x.span_id}):\n  got: $x\n  ref: $y")
        }
      }
      val got = run(nexau = false)
      diff(got, reference(spans, nexau = false).sortBy(r => (r.trace_id, r.span_id)),
        "distributed vs local")
      assert(got == run(nexau = false), "convert is not run-deterministic")
      val gotNexau = run(nexau = true)
      diff(gotNexau, reference(spans, nexau = true).sortBy(r => (r.trace_id, r.span_id)),
        "nexau distributed vs local")
      // nexau keeps tool calls inline: message count is input+1 exactly
      gotNexau.foreach { r =>
        assert(r.finish_reason == "stop" && r.n_tool_calls == 0)
      }
      // the chain fixture: 40 hops > 32 bound => agent unresolved, record kept
      val chainRec = got.find(_.trace_id == "fx_chain")
      assert(chainRec.exists(_.agent_name.isEmpty))
      // the cycle fixture: walk terminates with no agent, record kept
      val cycleRec = got.find(_.trace_id == "fx_cycle")
      assert(cycleRec.exists(_.agent_name.isEmpty))
    }
  }
}
