package graft.gyrfalcon

import graft.SparkSpec
import graft.core.text.TextOps
import org.apache.spark.sql.functions._

/** J4 agent→tools resolution, F19 shortening, F21 metadata sanitization. */
class FrameworkSpec extends SparkSpec {

  private val config = Framework.Config(
    tools = Seq(
      Framework.Tool("search", "Finds things.\nUsage: <tool_use><tool_name>search</tool_name><q>query (required)</q></tool_use>"),
      Framework.Tool("fetch", "Fetches a URL.")),
    agents = Seq(
      Framework.Agent("planner", "plans work", Seq("search"), Seq.empty),
      Framework.Agent("worker", "does work", Seq("search", "fetch"), Seq("files")),
      Framework.Agent("reviewer", "reviews", Seq.empty, Seq.empty)),
    mcpServerTools = Map(
      "files" -> Seq(Framework.Tool("read_file", "Reads a file."))),
    workflow = Seq(
      Framework.WorkflowEdge("planner", "worker"),
      Framework.WorkflowEdge("worker", "reviewer"),
      Framework.WorkflowEdge("reviewer", "nonexistent")))

  test("agent tools = static + mcp + workflow-successor sub-agents") {
    val tools = Framework.agentTools(config)
    assert(tools("planner").map(_.name) == Seq("search", "worker_sub_agent"))
    assert(tools("worker").map(_.name) ==
      Seq("search", "fetch", "read_file", "reviewer_sub_agent"))
    // edge to a non-agent target contributes nothing
    assert(tools("reviewer").map(_.name) == Seq.empty)
    // the search tool definition carried its Usage-block parameter
    val search = tools("planner").find(_.name == "search").get
    assert(search.params.map(_.name) == Vector("q"))
    assert(search.params.head.required)
    // sub-agent tools take a required message param
    val sub = tools("planner").find(_.name == "worker_sub_agent").get
    assert(sub.params.map(_.name) == Vector("message"))
  }

  test("shorten cuts at word boundaries") {
    assert(TextOps.shorten("a short string", 80) == "a short string")
    val s = TextOps.shorten("the quick brown fox jumps over the lazy dog", 20)
    assert(s.length <= 20)
    assert(s.endsWith(" [...]"))
    assert(s == "the quick [...]")
    // whitespace collapses first, like textwrap.shorten
    assert(TextOps.shorten("a   b\n c", 80) == "a b c")
  }

  test("metadata field drop rebuilds the struct without a UDF") {
    import spark.implicits._
    val df = Seq(("q1", ("orig", 3)), ("q2", ("keep?", 5)))
      .toDF("query", "metadata")
      .withColumn("metadata", struct(
        col("metadata._1").as("original_query"), col("metadata._2").as("rounds")))
    val out = graft.sources.Sinks.dropMetadataField(df, "metadata", "original_query")
    assert(out.select("metadata.*").columns.toSeq == Seq("rounds"))
    assert(out.count() == 2)
  }
}
