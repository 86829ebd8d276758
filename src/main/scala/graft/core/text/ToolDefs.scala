package graft.core.text

import scala.util.matching.Regex

/** F6: synthesize an OpenAI-function JSON-schema tool definition from a
  * tool's free-text description (behavioral reference
  * `convert_spans_to_chatcompletion.py:680-748`): the `Usage: <tool_use>…`
  * block yields parameter names; `(required…)` and `type: <t>` markers in a
  * parameter's description set required/type; parenthesized asides are
  * stripped from descriptions; the definition's description is the first
  * line of the tool's text.
  */
object ToolDefs extends Serializable {

  final case class Param(name: String, tpe: String, description: String, required: Boolean)
  final case class ToolDef(name: String, description: String, params: Vector[Param]) {
    def toJson: String = {
      import NexXml.Json
      val props = params.map(p => Json.str(p.name) + ": " + Json.objRaw(Vector(
        "type" -> Json.str(p.tpe),
        "description" -> Json.str(p.description))))
        .mkString("{", ", ", "}")
      val required = params.filter(_.required).map(p => Json.str(p.name))
        .mkString("[", ", ", "]")
      val parameters =
        s"""{"type": "object", "properties": $props, "required": $required}"""
      Json.objRaw(Vector(
        "type" -> Json.str("function"),
        "function" -> Json.objRaw(Vector(
          "name" -> Json.str(name),
          "description" -> Json.str(description),
          "parameters" -> parameters))))
    }
  }

  private val Usage: Regex = "(?s)Usage:\\s*<tool_use>(.*?)</tool_use>".r
  private val Pair: Regex = "(?s)<(\\w+)>(.*?)</\\1>".r
  private val RequiredMark: Regex = "\\(required".r
  private val TypeMark: Regex = "type:\\s*(\\w+)".r
  private val Aside: Regex = "\\s*\\(.*?\\)".r

  def fromDescription(toolName: String, description: String): ToolDef = {
    val params = Usage.findFirstMatchIn(description).map { um =>
      Pair.findAllMatchIn(um.group(1)).collect {
        case m if m.group(1) != "tool_name" && m.group(1) != "parameter" =>
          val desc = m.group(2)
          Param(
            m.group(1),
            TypeMark.findFirstMatchIn(desc).map(_.group(1)).getOrElse("string"),
            Aside.replaceAllIn(desc, "").trim,
            RequiredMark.findFirstIn(desc).isDefined)
      }.toVector
    }.getOrElse(Vector.empty)
    val headline = description.linesIterator.nextOption().map(_.trim)
      .filter(_.nonEmpty).getOrElse(s"Tool: $toolName")
    ToolDef(toolName, headline, params)
  }
}
