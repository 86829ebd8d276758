package graft.core.text

import scala.collection.mutable
import scala.util.matching.Regex

/** Structural validator for NexAU-XML assistant content (behavioral
  * reference: `converter/trace/filter_xml_errors.py:63-498`). Returns the
  * list of problems; an empty list means the content passes the
  * training-data quality gate (P9). Pure function — wrapped as a filter UDF
  * and as the codegen Catalyst expression `xml_valid`.
  */
object XmlValidator extends Serializable {

  private val Comment: Regex = "(?s)<!--.*?-->".r

  /** letters / digits / underscore / CJK / colon / hyphen tag names;
    * optional attributes; optional self-closing slash. */
  private val Tag: Regex =
    "<(/?)([a-zA-Z\\u4e00-\\u9fff][\\w\\u4e00-\\u9fff:-]*)(?:\\s+[^>]*)?\\s*(/?)>".r

  private val HtmlVoid = Set("br", "img", "hr", "input", "meta", "link")

  /** Stack-based open/close matching over every tag in the text. */
  def checkTagsBalanced(text: String): List[String] = {
    val cleaned = Comment.replaceAllIn(text, "")
    val stack = mutable.Stack.empty[(String, Int)]
    val errors = mutable.ListBuffer.empty[String]
    for (m <- Tag.findAllMatchIn(cleaned)) {
      val closing = m.group(1) == "/"
      val name = m.group(2)
      val selfClosing = m.group(3) == "/"
      val pos = m.start
      if (!selfClosing && !(HtmlVoid.contains(name.toLowerCase) && !closing)) {
        if (!closing) stack.push((name, pos))
        else if (stack.isEmpty)
          errors += s"Unmatched closing tag </$name> at position $pos"
        else {
          val (top, topPos) = stack.pop()
          if (top != name)
            errors += s"Tag mismatch: <$top> (position $topPos) vs </$name> (position $pos)"
        }
      }
    }
    // anything left open is an error, innermost last
    stack.toList.reverse.foreach { case (name, pos) =>
      errors += s"Unclosed tag <$name> at position $pos"
    }
    errors.toList
  }

  private val ToolUseBlock: Regex = "(?s)<tool_use>(.*?)</tool_use>".r
  private val ToolNameIn: Regex = "(?s)<tool_name>(.*?)</tool_name>".r
  private val ParamIn: Regex = "(?s)<parameter>(.*?)</parameter>".r
  private val PtBlock: Regex =
    "(?s)<use_parallel_tool_calls>(.*?)</use_parallel_tool_calls>".r
  private val Pt: Regex = "(?s)<parallel_tool>(.*?)</parallel_tool>".r
  private val PaBlock: Regex =
    "(?s)<use_parallel_sub_agents>(.*?)</use_parallel_sub_agents>".r
  private val Pa: Regex = "(?s)<parallel_agent>(.*?)</parallel_agent>".r
  private val AgentNameIn: Regex = "(?s)<agent_name>(.*?)</agent_name>".r
  private val MessageIn: Regex = "(?s)<message>(.*?)</message>".r
  private val BaBlock: Regex = "(?s)<use_batch_agent>(.*?)</use_batch_agent>".r

  /** tool_use blocks must carry tool_name + parameter, and the parameter
    * body must itself be tag-balanced. */
  def validateToolUse(content: String): List[String] = {
    val blocks = ToolUseBlock.findAllMatchIn(content).toList
    if (blocks.isEmpty)
      return if (content.contains("<tool_use>"))
        List("Found unclosed <tool_use> tag")
      else Nil
    blocks.zipWithIndex.flatMap { case (m, i) =>
      val block = m.group(1)
      val where = s"tool_use block #${i + 1} (position ${m.start})"
      val nameErr =
        if (ToolNameIn.findFirstIn(block).isEmpty)
          List(s"$where missing <tool_name>...</tool_name>")
        else Nil
      ParamIn.findFirstMatchIn(block) match {
        case None => nameErr :+ s"$where missing <parameter>...</parameter>"
        case Some(pm) =>
          val inner = checkTagsBalanced(pm.group(1))
          if (inner.isEmpty) nameErr
          else nameErr ++ (s"$where parameter internal tag mismatch" ::
            inner.map("  └─ " + _))
      }
    }
  }

  /** use_parallel_tool_calls blocks need ≥1 well-formed parallel_tool, each
    * carrying tool_name + parameter. */
  def validateParallelTools(content: String): List[String] = {
    val blocks = PtBlock.findAllMatchIn(content).toList
    if (blocks.isEmpty)
      return if (content.contains("<use_parallel_tool_calls>"))
        List("Found unclosed <use_parallel_tool_calls> tag")
      else Nil
    blocks.zipWithIndex.flatMap { case (m, i) =>
      val where = s"use_parallel_tool_calls block #${i + 1} (position ${m.start})"
      val tools = Pt.findAllMatchIn(m.group(1)).toList
      if (tools.isEmpty) List(s"$where missing <parallel_tool>...</parallel_tool>")
      else tools.zipWithIndex.flatMap { case (t, j) =>
        val twhere = s"$where parallel_tool #${j + 1}"
        val body = t.group(1)
        (if (ToolNameIn.findFirstIn(body).isEmpty)
          List(s"$twhere missing <tool_name>") else Nil) ++
          (if (ParamIn.findFirstIn(body).isEmpty)
            List(s"$twhere missing <parameter>") else Nil)
      }
    }
  }

  /** use_parallel_sub_agents blocks need ≥1 parallel_agent or
    * parallel_tool; agents need agent_name + message. */
  def validateParallelAgents(content: String): List[String] = {
    val blocks = PaBlock.findAllMatchIn(content).toList
    if (blocks.isEmpty)
      return if (content.contains("<use_parallel_sub_agents>"))
        List("Found unclosed <use_parallel_sub_agents> tag")
      else Nil
    blocks.zipWithIndex.flatMap { case (m, i) =>
      val where = s"use_parallel_sub_agents block #${i + 1} (position ${m.start})"
      val body = m.group(1)
      val agents = Pa.findAllMatchIn(body).toList
      val tools = Pt.findAllMatchIn(body).toList
      if (agents.isEmpty && tools.isEmpty)
        List(s"$where missing <parallel_agent> or <parallel_tool>")
      else agents.zipWithIndex.flatMap { case (a, j) =>
        val awhere = s"$where parallel_agent #${j + 1}"
        val abody = a.group(1)
        (if (AgentNameIn.findFirstIn(abody).isEmpty)
          List(s"$awhere missing <agent_name>") else Nil) ++
          (if (MessageIn.findFirstIn(abody).isEmpty)
            List(s"$awhere missing <message>") else Nil)
      }
    }
  }

  /** use_batch_agent blocks need agent_name, input_data_source, message. */
  def validateBatchAgent(content: String): List[String] = {
    val blocks = BaBlock.findAllMatchIn(content).toList
    if (blocks.isEmpty)
      return if (content.contains("<use_batch_agent>"))
        List("Found unclosed <use_batch_agent> tag")
      else Nil
    blocks.zipWithIndex.flatMap { case (m, i) =>
      val where = s"use_batch_agent block #${i + 1} (position ${m.start})"
      val body = m.group(1)
      Seq(
        "agent_name" -> AgentNameIn, "message" -> MessageIn,
        "input_data_source" -> "(?s)<input_data_source>(.*?)</input_data_source>".r
      ).collect {
        case (tag, re) if re.findFirstIn(body).isEmpty => s"$where missing <$tag>"
      }.toList
    }
  }

  /** Full gate: balance plus every block validator. Empty = valid. */
  def validate(content: String): List[String] =
    checkTagsBalanced(content) ++ validateToolUse(content) ++
      validateParallelTools(content) ++ validateParallelAgents(content) ++
      validateBatchAgent(content)

  def isValid(content: String): Boolean = validate(content).isEmpty
}
