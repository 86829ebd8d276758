package graft.services

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.text.NexXml
import graft.gyrfalcon.SynthesisPipeline

/** Totality properties for the round-3 parsers: these consume UNTRUSTED
  * LLM/HTTP text in the data plane, so for arbitrary input they must
  * return (never throw) and hold their invariants. Raw ScalaCheck Gens
  * with a fixed-seed sampler (no scalatest bridge on the offline
  * classpath). */
class ServicePropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 300)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val junk: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('{', '}', '"', ':', ',', '[', ']', 'a', ' ', '\n'))
      .map(_.mkString),
    Gen.const(""),
    Gen.const("""{"urls": [{"url": "https://x.example/a"}]}"""),
    Gen.const("""{"repairable": true, "suggested_urls": ["u"], "action": "repair"}"""))

  test("F10 normalizeArguments is total and idempotent") {
    forAll(junk) { s =>
      val once = NexXml.normalizeArguments(s)
      assert(NexXml.normalizeArguments(once) == once)
    }
  }

  test("data-URL decode is total; base64 round-trips") {
    forAll(junk)(s => FilePipeline.decodeDataUrl(s)) // must not throw
    forAll(Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)) { bytes =>
      val url = "data:application/octet-stream;base64," +
        java.util.Base64.getEncoder.encodeToString(bytes)
      val decoded = FilePipeline.decodeDataUrl(url)
      assert(decoded.exists(_.sameElements(bytes)))
    }
  }

  test("difficulty-distribution parse is total; valid inputs round-trip") {
    forAll(junk)(s => SynthesisPipeline.parseDifficultyDistribution(s))
    val dist = for {
      e <- Gen.choose(0, 1000)
      m <- Gen.choose(0, 1000 - e)
    } yield (e / 1000.0, m / 1000.0, (1000 - e - m) / 1000.0)
    forAll(dist) { case (e, m, h) =>
      val parsed = SynthesisPipeline.parseDifficultyDistribution(
        f"easy:$e%.3f,medium:$m%.3f,hard:$h%.3f")
      assert(parsed.isRight, parsed)
      parsed.foreach(p => assert(math.abs(p.values.sum - 1.0) < 0.002))
    }
  }

  test("URL pipeline never throws on hostile LLM answers") {
    forAll(junk, n = 100) { answer =>
      val client = new ServiceClient {
        override def complete(prompt: String): String = answer
        override def search(q: String, k: Int): Seq[String] = Seq.empty
        override def mcpToolsList(url: String): String = answer
        override def head(url: String): HeadResult =
          HeadResult(404, accessible = false, Some("HTTP 404"))
        override def fetch(url: String): FetchResult =
          FetchResult(404, None, Some("HTTP 404"))
      }
      val p = UrlPipeline.processQuery("see https://a.example/x", "english", client)
      // whatever the answers were, stats stay consistent
      assert(p.stats.total_extracted ==
        p.stats.accessible + p.stats.repaired + p.stats.removed)
      FilePipeline.provision("analyze data", "fw", "english", client)
      new graft.gyrfalcon.McpCatalog(client).toolsFor("http://x") // total too
    }
  }
}
