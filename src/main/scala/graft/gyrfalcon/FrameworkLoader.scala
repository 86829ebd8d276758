package graft.gyrfalcon

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{Dataset, SparkSession}

/** S7 + S5: framework-config and persona loading (behavioral reference:
  * `Gyrfalcon/frameworks/framework_manager.py:155-202` loads
  * `config.json` + `persona.jsonl` per framework directory;
  * `converter/schema/framework_config_schema.py:29-141` validates the
  * config — required fields, bounded numerics, non-empty agent and LLM
  * lists).
  *
  * Spark shape: the config is driver-side metadata (parsed once, carried
  * into the plane via broadcast — exactly how the reference treats it);
  * personas are DATA (a JSONL file of unbounded size) and stream through
  * `spark.read.textFile` with per-line tolerant parsing, bad lines
  * surviving as counted rejects instead of failing the job.
  */
object FrameworkLoader {

  /** LLM config entry (defaults per the reference schema: max_tokens 4000,
    * temperature 0.7, timeout 60). */
  final case class LlmConfig(
      llmName: String,
      provider: String,
      model: String,
      maxTokens: Int,
      temperature: Double,
      timeout: Int)

  final case class Loaded(
      name: String,
      description: String,
      entranceAgent: Option[String],
      llmConfigs: Seq[LlmConfig],
      config: Framework.Config,
      mcpServerUrls: Map[String, String] = Map.empty)

  // YAML is a superset of JSON: one mapper reads both config.json and
  // config.yaml (snakeyaml + jackson-dataformat-yaml ship with Spark).
  private def mapper = new ObjectMapper(new YAMLFactory())

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)

  private def seqOf(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull).toSeq.flatMap(_.elements.asScala)

  /** Parse + validate one framework config document. Returns every
    * validation error (field path + message), not just the first — the
    * reference's pydantic model reports the full error list the same way. */
  def parseConfig(name: String, text: String): Either[Seq[String], Loaded] = {
    val root = Try(mapper.readTree(text)).toEither.left
      .map(e => Seq(s"unparseable config: ${e.getMessage.linesIterator.next()}"))
    root.flatMap { r =>
      val errs = Seq.newBuilder[String]

      val agents = seqOf(r, "agents").zipWithIndex.map { case (a, i) =>
        val agentName = optText(a, "agent_name")
        if (agentName.isEmpty) errs += s"agents[$i].agent_name: required"
        if (optText(a, "sysprompt_path").isEmpty)
          errs += s"agents[$i].sysprompt_path: required"
        val llmRef = optText(a, "llm_config")
        if (llmRef.isEmpty) errs += s"agents[$i].llm_config: required"
        Framework.Agent(
          agentName.getOrElse(""),
          optText(a, "description").getOrElse(""),
          seqOf(a, "tools").map(_.asText),
          seqOf(a, "mcp_servers").map(_.asText)) -> llmRef
      }
      if (agents.isEmpty) errs += "agents: at least one agent is required"

      val llms = seqOf(r, "llm_configs").zipWithIndex.map { case (l, i) =>
        val llmName = optText(l, "llm_name")
        if (llmName.isEmpty) errs += s"llm_configs[$i].llm_name: required"
        if (optText(l, "provider").isEmpty) errs += s"llm_configs[$i].provider: required"
        if (optText(l, "model").isEmpty) errs += s"llm_configs[$i].model: required"
        val maxTokens = Option(l.get("max_tokens")).map(_.asInt).getOrElse(4000)
        if (maxTokens < 1 || maxTokens > 200000)
          errs += s"llm_configs[$i].max_tokens: $maxTokens out of [1, 200000]"
        val temperature = Option(l.get("temperature")).map(_.asDouble).getOrElse(0.7)
        if (temperature < 0.0 || temperature > 2.0)
          errs += s"llm_configs[$i].temperature: $temperature out of [0.0, 2.0]"
        val timeout = Option(l.get("timeout")).map(_.asInt).getOrElse(60)
        if (timeout < 1 || timeout > 300)
          errs += s"llm_configs[$i].timeout: $timeout out of [1, 300]"
        LlmConfig(llmName.getOrElse(""), optText(l, "provider").getOrElse(""),
          optText(l, "model").getOrElse(""), maxTokens, temperature, timeout)
      }
      if (llms.isEmpty) errs += "llm_configs: at least one LLM config is required"

      // Cross-reference: every agent's llm_config must name a defined entry
      // (the loader-level check the reference does on first use).
      val llmNames = llms.map(_.llmName).toSet
      agents.foreach { case (a, llmRef) =>
        llmRef.filterNot(llmNames).foreach(ref =>
          errs += s"agent '${a.name}': llm_config '$ref' is not defined")
      }

      val tools = seqOf(r, "tools").zipWithIndex.map { case (t, i) =>
        val toolName = optText(t, "tool_name")
        if (toolName.isEmpty) errs += s"tools[$i].tool_name: required"
        if (optText(t, "description").isEmpty) errs += s"tools[$i].description: required"
        // The reference's FrameworkTool also requires the YAML config path
        // and the `module.path:function` binding
        // (framework_config_schema.py:66-75).
        if (optText(t, "config_path").isEmpty) errs += s"tools[$i].config_path: required"
        if (optText(t, "binding").isEmpty) errs += s"tools[$i].binding: required"
        Framework.Tool(toolName.getOrElse(""), optText(t, "description").getOrElse(""))
      }

      val workflow = Option(r.get("workflow")).filterNot(_.isNull).toSeq.flatMap { w =>
        // A workflow block must carry a name; nodes need a unique id and a
        // type from {agent, tool, mcp} (framework_config_schema.py:78-103).
        if (optText(w, "name").isEmpty) errs += "workflow.name: required"
        val nodeIds = seqOf(w, "nodes").zipWithIndex.map { case (nd, i) =>
          val id = optText(nd, "id")
          if (id.isEmpty) errs += s"workflow.nodes[$i].id: required"
          val tpe = optText(nd, "type")
          if (tpe.isEmpty) errs += s"workflow.nodes[$i].type: required"
          else if (!Set("agent", "tool", "mcp")(tpe.get))
            errs += s"workflow.nodes[$i].type: '${tpe.get}' not one of agent|tool|mcp"
          id.getOrElse("")
        }
        nodeIds.diff(nodeIds.distinct).distinct.foreach(dup =>
          errs += s"workflow.nodes: duplicate id '$dup'")
        seqOf(w, "edges").zipWithIndex.map { case (e, i) =>
          val from = optText(e, "from")
          val to = optText(e, "to")
          if (from.isEmpty) errs += s"workflow.edges[$i].from: required"
          if (to.isEmpty) errs += s"workflow.edges[$i].to: required"
          Framework.WorkflowEdge(from.getOrElse(""), to.getOrElse(""))
        }
      }

      seqOf(r, "mcp_servers").zipWithIndex.foreach { case (s, i) =>
        if (optText(s, "name").isEmpty) errs += s"mcp_servers[$i].name: required"
        if (optText(s, "type").isEmpty) errs += s"mcp_servers[$i].type: required"
        if (optText(s, "url").isEmpty) errs += s"mcp_servers[$i].url: required"
      }
      val mcpServers = seqOf(r, "mcp_servers")
        .flatMap(s => optText(s, "name").map(_ -> optText(s, "url").getOrElse("")))

      val entrance = optText(r, "framework_entrance_agent")
      entrance.foreach { e =>
        if (!agents.exists(_._1.name == e))
          errs += s"framework_entrance_agent: '$e' is not a defined agent"
      }

      val collected = errs.result()
      if (collected.nonEmpty) Left(collected)
      else Right(Loaded(
        optText(r, "framework_name").getOrElse(name),
        optText(r, "description").getOrElse(""),
        entrance,
        llms,
        Framework.Config(
          tools,
          agents.map(_._1),
          // Tool lists per MCP server attach later (S15 fetch/cache via
          // [[attachMcpTools]]); the loader records the declared servers
          // with empty tool sets.
          mcpServers.map(_._1 -> Seq.empty[Framework.Tool]).toMap,
          workflow),
        mcpServers.toMap))
    }
  }

  /** S15 wiring: resolve every declared MCP server's tool list through the
    * catalog (md5-cached fetch) and attach it to the config — the step the
    * reference runs in its preloader before conversion starts. The result
    * is what callers broadcast. */
  def attachMcpTools(loaded: Loaded, catalog: McpCatalog): Loaded =
    loaded.copy(config = loaded.config.copy(
      mcpServerTools = loaded.mcpServerUrls.map { case (serverName, url) =>
        serverName -> (if (url.isEmpty) Seq.empty else catalog.toolsFor(url))
      }))

  /** Load + validate a framework config file (JSON or YAML). */
  def loadConfig(name: String, path: String): Either[Seq[String], Loaded] = {
    val text = Try(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    text.toEither.left.map(e => Seq(s"unreadable config $path: ${e.getMessage}"))
      .flatMap(parseConfig(name, _))
  }

  /** One persona line: parsed fields or the rejected raw line. The
    * reference keeps `persona` + `persona_chinese` and folds every other
    * field into metadata (`framework_manager.py:40-48`). */
  final case class PersonaParse(
      persona: Option[String],
      persona_chinese: Option[String],
      metadata: Map[String, String],
      error: Option[String])

  /** S5: tolerant persona JSONL read — blank lines skipped, invalid JSON
    * lines carried through as counted rejects (`framework_manager.py:
    * 180-202` logs-and-continues the same way). Distributed: the file
    * streams through textFile partitions, one jackson mapper per
    * partition. */
  def loadPersonas(spark: SparkSession, path: String): Dataset[PersonaParse] = {
    import org.apache.spark.sql.functions.{length, trim}
    import spark.implicits._
    spark.read.textFile(path)
      .filter(length(trim($"value")) > 0)
      .mapPartitions { it =>
        val m = mapper
        it.map { line =>
          Try(m.readTree(line)).toOption match {
            case Some(n) if n.isObject =>
              val fields = n.properties.asScala.map(e => e.getKey -> e.getValue)
              PersonaParse(
                optText(n, "persona").orElse(Some("")),
                optText(n, "persona_chinese").orElse(Some("")),
                fields.collect {
                  case (k, v) if k != "persona" && k != "persona_chinese" =>
                    k -> (if (v.isTextual) v.asText else v.toString)
                }.toMap,
                None)
            case _ =>
              PersonaParse(None, None, Map.empty, Some(line.take(120)))
          }
        }
      }
  }

  /** Valid personas only (the reference returns this list). */
  def validPersonas(parsed: Dataset[PersonaParse]): Dataset[(String, String)] = {
    import parsed.sparkSession.implicits._
    parsed.filter(_.error.isEmpty)
      .map(p => (p.persona.getOrElse(""), p.persona_chinese.getOrElse("")))
  }
}
