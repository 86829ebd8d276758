package graft.services

import org.scalatest.funsuite.AnyFunSuite

/** X4 file-provisioning control semantics (reference:
  * file_requirement_agent / file_system_agent / file_augmentation_agent).
  * Pure per-row chain — no SparkSession needed. */
class FilePipelineSpec extends AnyFunSuite {

  private class Scripted(
      classifyAnswer: String,
      planAnswer: String,
      fetchOk: String => Boolean = _ => true)
      extends ServiceClient {
    val prompts = scala.collection.mutable.Buffer.empty[String]
    override def complete(prompt: String): String = {
      prompts += prompt
      if (prompt.startsWith("You are a file requirement analyst")) classifyAnswer
      else if (prompt.startsWith("You are a file provisioning planner")) planAnswer
      else if (prompt.startsWith("You are a query rewriting expert"))
        StubServiceClient.complete(prompt) // literal-replacement JSON answer
      else ""
    }
    override def search(q: String, k: Int): Seq[String] = Seq.empty
    override def mcpToolsList(url: String): String = """{"tools": []}"""
    override def head(url: String): HeadResult = HeadResult(200, accessible = true, None)
    override def fetch(url: String): FetchResult =
      if (fetchOk(url)) FetchResult(200, Some(s"body:$url".getBytes("UTF-8")), None)
      else FetchResult(500, None, Some("HTTP 500"))
  }

  test("not file-dependent: chain stops after classification") {
    val c = new Scripted(
      """{"requires_files": false, "reason": "", "required_items": []}""", "")
    val p = FilePipeline.provision("plain question", "fw", "english", c)
    assert(!p.requires_files && p.files.isEmpty)
    assert(p.augmented_query == "plain question")
    assert(c.prompts.size == 1)
  }

  test("unparseable classification defaults to not-file-dependent") {
    val c = new Scripted("the model rambled", "")
    val p = FilePipeline.provision("q", "fw", "english", c)
    assert(!p.requires_files)
  }

  test("https files download; non-https schemes are rejected by the downloader") {
    val c = new Scripted(
      """{"requires_files": true, "reason": "needs data", "required_items": ["csv"]}""",
      """{"directory_name": "My Bundle!", "files": [
        |  {"url": "https://a.example/data.csv", "description": "d"},
        |  {"url": "http://a.example/plain.txt", "description": "p"},
        |  {"url": "ftp://a.example/old.zip", "description": "f"}]}""".stripMargin)
    val p = FilePipeline.provision("analyze the dataset", "fw", "english", c)
    assert(p.requires_files && p.reason == "needs data" && p.required_items == Vector("csv"))
    assert(p.files.map(_.status) == Vector("downloaded", "failed", "failed"))
    assert(p.files(1).error.contains("unsupported URL scheme: http"))
    assert(p.files(2).error.contains("unsupported URL scheme: ftp"))
    // sanitized plan directory + inferred filename in the local path
    assert(p.files.head.local_path == "downloads/fw/My_Bundle/data.csv")
    assert(p.files.head.n_bytes == "body:https://a.example/data.csv".length)
  }

  test("data URLs decode locally: base64 and percent-encoded; malformed fails") {
    val b64 = java.util.Base64.getEncoder.encodeToString("x,y\n1,2".getBytes("UTF-8"))
    val c = new Scripted(
      """{"requires_files": true, "reason": "r", "required_items": []}""",
      s"""{"directory_name": null, "files": [
         |  {"url": "data:text/csv;base64,$b64", "description": "b"},
         |  {"url": "data:text/plain,hello%20world", "description": "p"},
         |  {"url": "data:text/plain", "description": "broken"}]}""".stripMargin)
    val p = FilePipeline.provision("q", "fw", "english", c)
    assert(p.files(0).status == "downloaded" && p.files(0).n_bytes == 7)
    assert(p.files(0).local_path == "downloads/fw/bundle/data_0.csv")
    assert(p.files(1).status == "downloaded" && p.files(1).n_bytes == 11)
    assert(p.files(1).local_path == "downloads/fw/bundle/data_1.txt")
    assert(p.files(2).status == "failed" && p.files(2).error.contains("malformed data URL"))
  }

  test("augmentation rewrites the query to local paths; only downloaded files participate") {
    val c = new Scripted(
      """{"requires_files": true, "reason": "r", "required_items": []}""",
      """{"directory_name": null, "files": [
        |  {"url": "https://ok.example/a.csv", "description": ""},
        |  {"url": "https://bad.example/b.csv", "description": ""}]}""".stripMargin,
      fetchOk = _.contains("ok"))
    val p = FilePipeline.provision(
      "join https://ok.example/a.csv with https://bad.example/b.csv",
      "fw", "english", c)
    assert(p.augmented_query.contains("downloads/fw/bundle/a.csv"))
    assert(p.augmented_query.contains("https://bad.example/b.csv"),
      "failed downloads must NOT be rewritten to local paths")
  }

  test("empty plan means zero files but a successful run") {
    val c = new Scripted(
      """{"requires_files": true, "reason": "r", "required_items": []}""",
      """{"directory_name": null, "files": []}""")
    val p = FilePipeline.provision("q", "fw", "english", c)
    assert(p.requires_files && p.files.isEmpty && p.augmented_query == "q")
  }
}
