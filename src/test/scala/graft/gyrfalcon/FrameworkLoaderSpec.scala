package graft.gyrfalcon

import java.nio.file.Files

import graft.SparkSpec

/** S7 config loading + validation and S5 persona JSONL reads, on realistic
  * fixtures (field surface mirrors the reference's pydantic schema,
  * `converter/schema/framework_config_schema.py:29-141`). J4 agent→tools
  * resolution runs on the LOADED config, closing the file→data-plane loop.
  */
class FrameworkLoaderSpec extends SparkSpec {

  private val goodConfig =
    """{
      |  "framework_name": "deep_research",
      |  "description": "multi-agent research framework",
      |  "framework_entrance_agent": "planner",
      |  "agents": [
      |    {"agent_name": "planner", "description": "plans research",
      |     "sysprompt_path": "prompts/planner.md", "llm_config": "main",
      |     "tools": ["web_search"], "mcp_servers": ["docs"]},
      |    {"agent_name": "writer", "description": "writes the report",
      |     "sysprompt_path": "prompts/writer.md", "llm_config": "main",
      |     "tools": []}
      |  ],
      |  "llm_configs": [
      |    {"llm_name": "main", "provider": "openai", "model": "gpt-4",
      |     "max_tokens": 8000, "temperature": 0.4, "timeout": 120}
      |  ],
      |  "tools": [
      |    {"tool_name": "web_search", "description": "Search the web. Usage: q",
      |     "config_path": "tools/web_search.yaml",
      |     "binding": "tools.web:search"}
      |  ],
      |  "mcp_servers": [
      |    {"name": "docs", "type": "sse", "url": "http://localhost:9/sse"}
      |  ],
      |  "workflow": {
      |    "name": "research_flow",
      |    "nodes": [{"id": "planner", "type": "agent"},
      |              {"id": "writer", "type": "agent"}],
      |    "edges": [{"from": "planner", "to": "writer"}]
      |  }
      |}""".stripMargin

  test("realistic config parses; J4 resolution runs on the loaded config") {
    val loaded = FrameworkLoader.parseConfig("deep_research", goodConfig)
    assert(loaded.isRight, loaded.left.getOrElse(Nil).mkString("; "))
    val l = loaded.toOption.get
    assert(l.name == "deep_research")
    assert(l.entranceAgent.contains("planner"))
    assert(l.llmConfigs.head.maxTokens == 8000)
    // J4 on the loaded config: planner gets its static tool plus the
    // workflow-successor sub-agent; writer (a sink node) gets none.
    val tools = Framework.agentTools(l.config)
    assert(tools("planner").exists(_.name == "web_search"))
    assert(tools("planner").exists(_.name == "writer_sub_agent"))
    assert(tools("writer").isEmpty)
  }

  test("YAML spelling of the same config loads identically") {
    val yaml =
      """framework_name: deep_research
        |agents:
        |  - agent_name: planner
        |    sysprompt_path: prompts/planner.md
        |    llm_config: main
        |llm_configs:
        |  - llm_name: main
        |    provider: openai
        |    model: gpt-4
        |""".stripMargin
    val loaded = FrameworkLoader.parseConfig("deep_research", yaml)
    assert(loaded.isRight, loaded.left.getOrElse(Nil).mkString("; "))
    assert(loaded.toOption.get.llmConfigs.head.temperature == 0.7) // default
  }

  test("validation reports the full error list, not just the first") {
    val bad =
      """{
        |  "agents": [{"description": "no name or prompt or llm"}],
        |  "llm_configs": [
        |    {"llm_name": "m", "provider": "openai", "model": "gpt-4",
        |     "max_tokens": 0, "temperature": 3.5, "timeout": 301}
        |  ],
        |  "tools": [{"tool_name": "t", "description": "d"}],
        |  "workflow": {"nodes": [{"id": "a", "type": "robot"},
        |                         {"id": "a", "type": "agent"}],
        |               "edges": [{"from": "a"}]}
        |}""".stripMargin
    val errs = FrameworkLoader.parseConfig("f", bad).left.getOrElse(Nil)
    assert(errs.exists(_.contains("agents[0].agent_name")))
    assert(errs.exists(_.contains("agents[0].sysprompt_path")))
    assert(errs.exists(_.contains("agents[0].llm_config")))
    assert(errs.exists(_.contains("max_tokens")))
    assert(errs.exists(_.contains("temperature")))
    assert(errs.exists(_.contains("timeout")))
    // Reference schema requires tool config_path + binding
    // (framework_config_schema.py:66-75) and workflow name + typed nodes.
    assert(errs.exists(_.contains("tools[0].config_path")))
    assert(errs.exists(_.contains("tools[0].binding")))
    assert(errs.exists(_.contains("workflow.name")))
    assert(errs.exists(_.contains("workflow.nodes[0].type")))
    assert(errs.exists(_.contains("duplicate id 'a'")))
    assert(errs.exists(_.contains("workflow.edges[0].to")))
  }

  test("unknown llm_config reference and unknown entrance agent are caught") {
    val bad =
      """{"agents": [{"agent_name": "a", "sysprompt_path": "p",
        |             "llm_config": "missing"}],
        |  "llm_configs": [{"llm_name": "m", "provider": "p", "model": "x"}],
        |  "framework_entrance_agent": "ghost"}""".stripMargin
    val errs = FrameworkLoader.parseConfig("f", bad).left.getOrElse(Nil)
    assert(errs.exists(_.contains("llm_config 'missing' is not defined")))
    assert(errs.exists(_.contains("'ghost' is not a defined agent")))
  }

  test("S15: MCP tool catalog fetches once per URL, caches by md5, persists") {
    import graft.services.StubServiceClient
    val cacheFile = Files.createTempDirectory("mcp").resolve("mcp_tools_cache.json")
    val catalog = new McpCatalog(StubServiceClient, Some(cacheFile))
    val loaded = FrameworkLoader.parseConfig("deep_research", goodConfig).toOption.get
    assert(loaded.mcpServerUrls == Map("docs" -> "http://localhost:9/sse"))

    val wired = FrameworkLoader.attachMcpTools(loaded, catalog)
    val docsTools = wired.config.mcpServerTools("docs")
    assert(docsTools.nonEmpty && catalog.fetches == 1)
    // J4 now surfaces the MCP tools on the agent that declares the server
    val tools = Framework.agentTools(wired.config)
    docsTools.foreach(t => assert(tools("planner").exists(_.name == t.name)))

    // second resolution: cache hit, no new fetch
    FrameworkLoader.attachMcpTools(loaded, catalog)
    assert(catalog.fetches == 1)

    // a NEW catalog warm-started from the persisted file never fetches
    val warm = new McpCatalog(StubServiceClient, Some(cacheFile))
    assert(warm.toolsFor("http://localhost:9/sse") == docsTools)
    assert(warm.fetches == 0)
  }

  test("persona JSONL loads tolerantly: bad lines counted, not fatal") {
    val f = Files.createTempFile("personas", ".jsonl")
    Files.write(f,
      ("""{"persona": "nurse", "persona_chinese": "护士", "age": 34}""" + "\n" +
        "not json at all\n" +
        "\n" +
        """{"persona": "analyst"}""" + "\n" +
        """[1,2,3]""" + "\n").getBytes("UTF-8"))
    try {
      val parsed = FrameworkLoader.loadPersonas(spark, f.toString).collect()
      assert(parsed.length == 4) // blank line skipped
      assert(parsed.count(_.error.isDefined) == 2)
      val nurse = parsed.find(_.persona.contains("nurse")).get
      assert(nurse.persona_chinese.contains("护士"))
      assert(nurse.metadata("age") == "34")
      val valid = FrameworkLoader
        .validPersonas(FrameworkLoader.loadPersonas(spark, f.toString))
        .collect().map(_._1).toSet
      assert(valid == Set("nurse", "analyst"))
    } finally Files.delete(f)
  }

  test("roundsFromFiles wires config validation + personas into rounds") {
    val dir = Files.createTempDirectory("fw")
    val cfg = dir.resolve("config.json")
    val personas = dir.resolve("persona.jsonl")
    Files.write(cfg, goodConfig.getBytes("UTF-8"))
    Files.write(personas,
      ("""{"persona": "nurse"}""" + "\n" + """{"persona": "analyst"}""" + "\n")
        .getBytes("UTF-8"))
    try {
      val rounds = SynthesisPipeline.roundsFromFiles(
        spark, Seq("root/a", "root/b"), cfg.toString, personas.toString, 20)
      assert(rounds.isRight)
      val rows = rounds.toOption.get.collect()
      assert(rows.length == 20)
      assert(rows.forall(r => Set("nurse", "analyst")(r.persona)))
      // An invalid config refuses to start (the reference's startup gate).
      val badCfg = dir.resolve("bad.json")
      Files.write(badCfg, """{"agents": []}""".getBytes("UTF-8"))
      val refused = SynthesisPipeline.roundsFromFiles(
        spark, Seq("root/a"), badCfg.toString, personas.toString, 5)
      assert(refused.isLeft)
    } finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
  }
}
