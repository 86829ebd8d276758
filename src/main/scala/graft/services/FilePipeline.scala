package graft.services

import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.text.{TextOps => T}

/** X4: the file-provisioning chain — LLM requirement classification →
  * LLM download plan → downloads (https-only enforcement, data-URL decode
  * branch, per-file status records) → query augmentation referencing the
  * provisioned paths (behavioral reference: classification
  * `file_requirement_agent.py:44-117`, plan + downloads
  * `file_system_agent.py:63-279`, augmentation
  * `file_augmentation_agent.py:44-95`, wiring `router_agent.py:168-191`).
  *
  * Spark shape: one pure function per record inside `mapPartitions`. The
  * reference writes bytes straight to disk; here downloads land as DATA
  * (bytes + status columns on the row) so a normal sink persists them —
  * the engine never does per-row driver I/O. Deterministic stand-ins for
  * the reference's wall-clock names: the plan ordinal replaces the
  * timestamp in generated filenames.
  */
object FilePipeline extends Serializable {

  final case class FileRecord(
      url: String,
      description: String,
      local_path: String,
      status: String, // downloaded | failed
      error: Option[String],
      n_bytes: Int,
      content_md5: Option[String])

  final case class Provisioned(
      query: String,
      requires_files: Boolean,
      reason: String,
      required_items: Vector[String],
      files: Vector[FileRecord],
      augmented_query: String)

  private def mapper = new ObjectMapper()

  /** Step 1: requirement classification (unparseable → not file-dependent,
    * the reference's safe-parse default). */
  def classify(query: String, language: String, client: ServiceClient)
      : (Boolean, String, Vector[String]) = {
    val prompt =
      s"""You are a file requirement analyst. Decide whether this query needs supporting files to be answerable.
         |
         |Query:
         |$query
         |
         |Return STRICT JSON {"requires_files", "reason", "required_items"}, no extra explanation.""".stripMargin
    (for {
      j <- T.extractJsonObject(client.complete(prompt))
      root <- Try(mapper.readTree(j)).toOption
    } yield {
      val items = Option(root.get("required_items")).toVector.flatMap { arr =>
        val it = arr.elements(); val out = Vector.newBuilder[String]
        while (it.hasNext) { val v = it.next().asText; if (v.nonEmpty) out += v }
        out.result()
      }
      (Option(root.get("requires_files")).exists(_.asBoolean),
        Option(root.get("reason")).map(_.asText.trim).getOrElse(""),
        items)
    }).getOrElse((false, "", Vector.empty))
  }

  /** Step 2: download plan — (sanitized directory name, files). Entries
    * without a url are dropped; an unparseable plan means no files. */
  def plan(query: String, requiredItems: Seq[String], language: String,
      client: ServiceClient): (Option[String], Vector[(String, String)]) = {
    val prompt =
      s"""You are a file provisioning planner. Produce the list of supporting files to download for this query.
         |
         |Query:
         |$query
         |Required items: ${requiredItems.mkString(", ")}
         |
         |Return STRICT JSON {"directory_name", "files": [{"url", "description"}]}, no extra explanation.""".stripMargin
    (for {
      j <- T.extractJsonObject(client.complete(prompt))
      root <- Try(mapper.readTree(j)).toOption
    } yield {
      val dir = Option(root.get("directory_name")).filterNot(_.isNull)
        .map(n => T.sanitizeName(n.asText)).filter(_.nonEmpty)
      val files = Option(root.get("files")).toVector.flatMap { arr =>
        val it = arr.elements(); val out = Vector.newBuilder[(String, String)]
        while (it.hasNext) {
          val e = it.next()
          Option(e.get("url")).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
            .foreach(u => out +=
              (u -> Option(e.get("description")).map(_.asText.trim).getOrElse("")))
        }
        out.result()
      }
      (dir, files)
    }).getOrElse((None, Vector.empty))
  }

  private val DataExt = Map(
    "text/plain" -> ".txt", "text/csv" -> ".csv",
    "text/tab-separated-values" -> ".tsv", "application/json" -> ".json")

  /** Filename inference (`file_system_agent.py:234-248`), with the plan
    * ordinal standing in for the reference's wall-clock millis. */
  def inferFilename(url: String, ordinal: Int): String =
    if (url.startsWith("data:")) {
      val mediaType = url.stripPrefix("data:").split("[;,]", 2)(0)
      s"data_$ordinal${DataExt.getOrElse(mediaType, ".txt")}"
    } else {
      val path = url.split("[?#]")(0).replaceAll("^[a-z]+://[^/]*", "")
      val base = path.substring(path.lastIndexOf('/') + 1)
      if (base.nonEmpty) base else s"file_$ordinal"
    }

  /** data: URL decoding (`file_system_agent.py:259-272`): base64 payloads
    * decoded strictly, anything else percent-decoded; a malformed URL (no
    * comma) is a failed download, not an exception. */
  def decodeDataUrl(url: String): Either[String, Array[Byte]] =
    url.split(",", 2) match {
      case Array(header, body) =>
        if (header.endsWith(";base64") || header.contains(";base64;"))
          Try(java.util.Base64.getDecoder.decode(body)).toEither.left
            .map(e => s"invalid base64 data URL: ${e.getMessage}")
        else
          // URLDecoder throws on malformed %-escapes — a hostile data URL
          // must become a failed download record, not a task failure
          Try(java.net.URLDecoder.decode(body, "UTF-8").getBytes("UTF-8"))
            .toEither.left.map(e => s"invalid data URL encoding: ${e.getMessage}")
      case _ => Left("malformed data URL")
    }

  /** Step 3: the downloader — data: decoded locally, https fetched through
    * the client, every other scheme rejected (the reference's https-only
    * rule). One record per planned file, failures recorded not thrown. */
  def download(files: Seq[(String, String)], framework: String,
      dirName: Option[String], client: ServiceClient): Vector[FileRecord] = {
    val bundle = dirName.getOrElse("bundle")
    files.iterator.zipWithIndex.map { case ((url, desc), i) =>
      val filename = inferFilename(url, i)
      val localPath = s"downloads/$framework/$bundle/$filename"
      val fetched: Either[String, Array[Byte]] =
        if (url.startsWith("data:")) decodeDataUrl(url)
        else {
          val scheme = url.split(":", 2)(0)
          if (scheme != "https") Left(s"unsupported URL scheme: $scheme")
          else client.fetch(url) match {
            case FetchResult(_, Some(bytes), _) => Right(bytes)
            case FetchResult(_, None, err)      => Left(err.getOrElse("Unknown"))
          }
        }
      fetched match {
        // md5 of the FETCHED BYTES — a String round-trip would replace
        // invalid UTF-8 with U+FFFD and stop being an integrity digest
        case Right(bytes) => FileRecord(url, desc, localPath, "downloaded", None,
          bytes.length, Some(graft.converter.SpanConverter.md5Hex(bytes)))
        case Left(err) => FileRecord(url, desc, localPath, "failed", Some(err), 0, None)
      }
    }.toVector
  }

  /** Step 4: augmentation — rewrite the query to reference the provisioned
    * local paths; only successfully-downloaded files participate, and with
    * none the query is untouched (`file_augmentation_agent.py:49-58`). */
  def augment(query: String, files: Seq[FileRecord], language: String,
      client: ServiceClient): String = {
    val usable = files.filter(_.status == "downloaded")
    if (usable.isEmpty) query
    else {
      val changeLines = usable.map(f => s"${f.url} -> ${f.local_path}").mkString("\n")
      val prompt =
        s"""You are a query rewriting expert. Rewrite the query so it references the provisioned local files and return STRICT JSON {"rewritten_query"}.
           |
           |Query:
           |$query
           |Changes:
           |$changeLines""".stripMargin
      (for {
        j <- T.extractJsonObject(client.complete(prompt))
        root <- Try(mapper.readTree(j)).toOption
        n <- Option(root.get("rewritten_query")).filterNot(_.isNull)
      } yield n.asText).getOrElse(query)
    }
  }

  /** The full chain for one query. */
  def provision(query: String, framework: String, language: String,
      client: ServiceClient): Provisioned = {
    val (requires, reason, items) = classify(query, language, client)
    if (!requires)
      return Provisioned(query, requires_files = false, reason, items,
        Vector.empty, query)
    val (dirName, planned) = plan(query, items, language, client)
    val files = download(planned, framework, dirName, client)
    Provisioned(query, requires_files = true, reason, items, files,
      augment(query, files, language, client))
  }
}
