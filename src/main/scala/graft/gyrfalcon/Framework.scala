package graft.gyrfalcon

import graft.core.text.ToolDefs
import graft.core.text.ToolDefs.ToolDef

/** Framework configuration as driver-side case classes (SURVEY.md §1.1
  * "Framework config" + J4 agent→tools resolution, behavioral reference
  * `convert_spans_to_chatcompletion.py:119-258`): static tools resolve
  * from their descriptions, MCP server tools attach per agent, and
  * workflow agent→agent edges turn successor agents into callable
  * `<name>_sub_agent` tools. Driver-computed once, broadcast to executors
  * by callers that need it in the data plane.
  */
object Framework {

  final case class Tool(name: String, description: String)
  final case class Agent(
      name: String,
      description: String,
      tools: Seq[String],
      mcpServers: Seq[String])
  final case class WorkflowEdge(from: String, to: String)
  final case class Config(
      tools: Seq[Tool],
      agents: Seq[Agent],
      mcpServerTools: Map[String, Seq[Tool]],
      workflow: Seq[WorkflowEdge])

  /** J4: per-agent callable tool set — static + MCP + workflow-successor
    * sub-agents (only successors: the DAG direction defines who may call
    * whom). */
  def agentTools(config: Config): Map[String, Seq[ToolDef]] = {
    val staticDefs: Map[String, ToolDef] =
      config.tools.map(t => t.name -> ToolDefs.fromDescription(t.name, t.description)).toMap
    val mcpDefs: Map[String, Seq[ToolDef]] =
      config.mcpServerTools.view.mapValues(_.map(t =>
        ToolDefs.fromDescription(t.name, t.description))).toMap
    val agentNames = config.agents.map(_.name).toSet
    val successors: Map[String, Seq[String]] = config.workflow
      .filter(e => agentNames(e.from) && agentNames(e.to))
      .groupBy(_.from).view.mapValues(_.map(_.to)).toMap
    val byName = config.agents.map(a => a.name -> a).toMap

    config.agents.map { agent =>
      val static = agent.tools.flatMap(staticDefs.get)
      val mcp = agent.mcpServers.flatMap(mcpDefs.getOrElse(_, Seq.empty))
      val subAgents = successors.getOrElse(agent.name, Seq.empty)
        .flatMap(byName.get)
        .map(sub => ToolDef(
          s"${sub.name}_sub_agent",
          s"Delegate a task to the ${sub.name} agent. ${sub.description}".trim,
          Vector(ToolDefs.Param("message", "string",
            "The task description for the sub-agent", required = true))))
      agent.name -> (static ++ mcp ++ subAgents)
    }.toMap
  }
}
