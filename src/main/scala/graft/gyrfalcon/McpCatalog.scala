package graft.gyrfalcon

import java.nio.file.{Files, Path}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import graft.services.ServiceClient

/** S15: MCP tools/list fetch with an md5(url)-keyed cache (behavioral
  * reference: fetch `converter/mcp_preloader.py:160-176`, flock-guarded
  * JSON cache `convert_spans_to_chatcompletion.py:260-452`).
  *
  * Spark shape: the catalog is driver-side metadata resolved ONCE per run
  * and broadcast with the framework config — the reference's per-worker
  * cache + fcntl locking exists because every Python worker re-fetches;
  * with a single driver resolving before the plan runs there is nothing
  * to lock. The optional cache file persists across runs with the same
  * md5-of-url keying as the reference, so a warm cache never re-fetches.
  */
final class McpCatalog(client: ServiceClient, cacheFile: Option[Path] = None) {

  private def mapper = new ObjectMapper()

  private def cacheKey(url: String): String =
    graft.converter.SpanConverter.md5Hex(url)

  private val mem = TrieMap.empty[String, Seq[Framework.Tool]]

  /** Observability for tests and run stats. */
  @volatile var fetches: Int = 0

  // Warm from the persisted cache: {md5(url): [{"name","description"}]}
  cacheFile.filter(Files.exists(_)).foreach { f =>
    Try {
      val root = mapper.readTree(Files.readAllBytes(f))
      root.properties.asScala.foreach { e =>
        val tools = e.getValue.elements.asScala.map(t =>
          Framework.Tool(
            Option(t.get("name")).map(_.asText).getOrElse(""),
            Option(t.get("description")).map(_.asText).getOrElse(""))).toVector
        mem.put(e.getKey, tools)
      }
    }
  }

  private def persist(): Unit = cacheFile.foreach { f =>
    Try {
      val root = mapper.createObjectNode()
      mem.foreach { case (k, tools) =>
        val arr = root.putArray(k)
        tools.foreach { t =>
          val o = arr.addObject()
          o.put("name", t.name)
          o.put("description", t.description)
        }
      }
      Option(f.getParent).foreach(Files.createDirectories(_))
      Files.write(f, mapper.writeValueAsBytes(root))
    }
  }

  /** Tools for one server URL — memoized, fetching at most once per URL
    * (a failed or unparseable fetch caches as empty, the reference's
    * return-[]-on-error). */
  def toolsFor(url: String): Seq[Framework.Tool] = {
    val key = cacheKey(url)
    mem.get(key) match {
      case Some(tools) => tools
      case None =>
        fetches += 1
        val parsed = Try {
          val root = mapper.readTree(client.mcpToolsList(url))
          Option(root.get("tools")).toVector.flatMap(_.elements.asScala).flatMap { t =>
            Option(t.get("name")).map(_.asText).filter(_.nonEmpty).map(n =>
              Framework.Tool(n,
                Option(t.get("description")).map(_.asText).getOrElse("")))
          }
        }.getOrElse(Vector.empty)
        mem.put(key, parsed)
        persist()
        parsed
    }
  }
}
