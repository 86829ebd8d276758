package graft.gyrfalcon

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Problem-type tree data-plane (SURVEY.md §2.5): the reference keeps a
  * recursive bilingual taxonomy in JSON (`tree_manager.py:39-171`) guarded
  * by file locks; here the tree is parsed once on the driver (trees are
  * tiny — ≤ a few thousand nodes) and flattened into a root→leaf `paths`
  * DataFrame that every sampling/stats operator runs against. Mutation
  * (R7 expansion) is epoch-merged instead of lock-reload-save: proposals
  * are validated with an anti-join and unioned in, which is associative
  * and therefore safe under any execution order.
  */
object Tree extends Serializable {

  final case class Node(id: String, en: String, zh: String, children: Seq[Node])

  final case class PathRow(path_id: String, depth: Int, ids: Seq[String], labels: Seq[String])

  /** S6: parse a `{"framework": ..., "tree": {...}}` document (driver-side
    * recursion; Jackson ships with Spark). */
  def parse(json: String): Node = {
    val root = new ObjectMapper().readTree(json)
    val tree = if (root.has("tree")) root.get("tree") else root
    def walk(n: JsonNode): Node = Node(
      Option(n.get("id")).map(_.asText).getOrElse(""),
      Option(n.get("en")).map(_.asText).getOrElse(""),
      Option(n.get("zh")).map(_.asText).getOrElse(""),
      Option(n.get("children")).map(c =>
        (0 until c.size).map(i => walk(c.get(i)))).getOrElse(Seq.empty))
    walk(tree)
  }

  /** Enumerate every root→leaf path. */
  def enumeratePaths(root: Node): Seq[PathRow] = {
    def walk(n: Node, ids: Vector[String], labels: Vector[String]): Seq[PathRow] = {
      val ids2 = ids :+ n.id
      val labels2 = labels :+ n.en
      if (n.children.isEmpty) Seq(PathRow(ids2.mkString("/"), ids2.length, ids2, labels2))
      else n.children.flatMap(walk(_, ids2, labels2))
    }
    walk(root, Vector.empty, Vector.empty)
  }

  /** Paths as a DataFrame — the sampling/statistics substrate. */
  def pathsDf(spark: SparkSession, root: Node): DataFrame = {
    import spark.implicits._
    enumeratePaths(root).toDF
  }

  /** A6: tree statistics over the paths frame (single-pass agg; the node
    * count needs a generator, see [[nodeCount]]). */
  def stats(paths: DataFrame): DataFrame =
    paths.agg(
      count(lit(1)).as("total_paths"),
      max(col("depth")).as("max_depth"),
      min(col("depth")).as("min_depth"),
      sum(col("depth")).cast("double").divide(count(lit(1))).as("avg_depth"))

  /** A6 (node count): distinct nodes across all paths. */
  def nodeCount(paths: DataFrame): Long =
    paths.select(explode(col("ids")).as("id")).distinct().count()

  /** A7: associative sampling-stats merge — replaces the reference's
    * fcntl-locked read-modify-write with `union ++ groupBy.sum`, correct
    * under any parallel execution order. */
  def mergeStats(old: DataFrame, deltas: DataFrame): DataFrame =
    old.unionByName(deltas)
      .groupBy(col("path_id"))
      .agg(sum(col("count")).as("count"))

  /** S14: tree statistics report as a self-contained HTML document
    * (driver-side; the reference ships a D3 visualizer — here the stats
    * DataFrame renders into a static table, which is the part that
    * belongs to the engine). */
  def statsHtml(paths: DataFrame, title: String): String = {
    val s = stats(paths).head()
    val rows = paths.orderBy(col("path_id"))
      .collect()
      .map(r => s"<tr><td>${r.getAs[String]("path_id")}</td><td>${r.getAs[Int]("depth")}</td></tr>")
      .mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>$title</title></head><body>
       |<h1>$title</h1>
       |<p>paths: ${s.getAs[Long]("total_paths")},
       | depth: ${s.getAs[Int]("min_depth")}–${s.getAs[Int]("max_depth")}
       | (avg ${"%.2f".format(s.getAs[Double]("avg_depth"))})</p>
       |<table border="1"><tr><th>path</th><th>depth</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }

  /** S14: full tree visualization as ONE self-contained HTML document —
    * a tidy-tree SVG (depth → column, DFS leaf order → row, internal
    * nodes centered over their children) with bilingual labels, plus the
    * A6 stats banner. The reference renders the same structure with a
    * 650-line D3 page (`visualizer.py:37-88`); computing the layout
    * driver-side and emitting static SVG keeps the report dependency-free
    * and byte-deterministic. Trees are config-scale, so driver rendering
    * is the right plane. */
  def visualizationHtml(root: Node, title: String): String = {
    val colW = 220; val rowH = 34; val r = 5
    var nextLeaf = 0
    final case class Pos(x: Int, y: Double, n: Node)
    val nodes = Vector.newBuilder[Pos]
    val edges = Vector.newBuilder[(Pos, Pos)]
    def layout(n: Node, depth: Int): Pos = {
      val pos =
        if (n.children.isEmpty) {
          val y = nextLeaf * rowH + rowH / 2.0; nextLeaf += 1
          Pos(depth * colW + 20, y, n)
        } else {
          val kids = n.children.map(layout(_, depth + 1))
          val p = Pos(depth * colW + 20, kids.map(_.y).sum / kids.size, n)
          kids.foreach(k => edges += (p -> k))
          p
        }
      nodes += pos
      pos
    }
    layout(root, 0)
    val all = nodes.result()
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val maxDepth = all.map(_.x).max
    val width = maxDepth + colW
    val height = math.max(nextLeaf, 1) * rowH + rowH
    val svgEdges = edges.result().map { case (p, c) =>
      f"""<path d="M ${p.x + r} ${p.y}%.1f C ${p.x + colW / 2} ${p.y}%.1f, ${p.x + colW / 2} ${c.y}%.1f, ${c.x - r} ${c.y}%.1f" class="edge"/>"""
    }.mkString("\n")
    val svgNodes = all.map { p =>
      f"""<circle cx="${p.x}" cy="${p.y}%.1f" r="$r" class="${if (p.n.children.isEmpty) "leaf" else "branch"}"/>
         |<text x="${p.x + r + 4}" y="${p.y + 4}%.1f">${esc(p.n.en)}<tspan class="zh"> ${esc(p.n.zh)}</tspan></text>""".stripMargin
    }.mkString("\n")
    val paths = enumeratePaths(root)
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>${esc(title)}</title>
       |<style>
       | body { font: 13px sans-serif; }
       | .edge { fill: none; stroke: #bbb; stroke-width: 1.2; }
       | circle.branch { fill: #4a7ebb; } circle.leaf { fill: #7fbf7f; }
       | text { dominant-baseline: auto; } .zh { fill: #888; }
       |</style></head><body>
       |<h1>${esc(title)}</h1>
       |<p>${paths.size} paths, depth ${paths.map(_.depth).min}–${paths.map(_.depth).max}, ${all.size} nodes (${nextLeaf} leaves)</p>
       |<svg width="$width" height="$height" xmlns="http://www.w3.org/2000/svg">
       |$svgEdges
       |$svgNodes
       |</svg></body></html>""".stripMargin
  }

  final case class Proposal(round_id: Long, parent_id: String, id: String,
      en: String, zh: String)

  /** R7+X7 end-to-end expansion epoch (behavioral reference
    * `tree_manager.py:400-486` + `sampling_manager.py:335-491`): each
    * gated round samples a path and a non-root parent on it, asks the LLM
    * for a distinct sibling `{id,en,zh}` (sibling labels in the prompt as
    * constraints), extracts the embedded JSON (F17), prefixes the id with
    * the parent's (the reference's uniqueness rule) — then the whole
    * proposal batch is validated in one shot ([[validateExpansions]]:
    * parent exists, label is new, intra-batch dedup) and unioned into the
    * next epoch's paths. The reference's lock-reload-save cycle becomes an
    * associative epoch merge: no locks, any execution order.
    *
    * Returns (accepted proposals, next epoch's paths). Draws are
    * md5-seeded (`seed` + round), so epochs are reproducible. */
  def expansionEpoch(spark: SparkSession, root: Node,
      client: graft.services.ServiceClient, nRounds: Int, p: Double,
      seed: String = "epoch"): (DataFrame, DataFrame) = {
    import spark.implicits._
    val allPaths = enumeratePaths(root).toVector
    // Trees are config-scale (≤ a few thousand nodes — they ride to
    // executors as one broadcast, exactly how the reference holds the
    // whole tree in memory per worker).
    val pathsB = spark.sparkContext.broadcast(allPaths)
    // children per node (sibling context for the generation prompt)
    val childrenB = spark.sparkContext.broadcast {
      val m = scala.collection.mutable.Map.empty[String, Vector[(String, String)]]
      def walk(n: Node): Unit = {
        m(n.id) = n.children.map(c => (c.en, c.zh)).toVector
        n.children.foreach(walk)
      }
      walk(root)
      m.toMap
    }
    val labelsB = spark.sparkContext.broadcast {
      def collect(n: Node): Map[String, (String, String)] =
        n.children.map(collect).foldLeft(Map(n.id -> ((n.en, n.zh))))(_ ++ _)
      collect(root)
    }

    def u32(s: String): Long = java.lang.Long.parseLong(
      graft.converter.SpanConverter.callId(seed, s, 0).drop(5).take(8), 16)

    val proposals = spark.range(nRounds).flatMap { round =>
      // R6 gate, then R1-style uniform path + non-root parent pick
      if (u32(s"gate:$round").toDouble / 4294967296.0 >= p) None
      else {
        val paths = pathsB.value
        val path = paths((u32(s"path:$round") % paths.size).toInt)
        val nonRoot = path.ids.drop(1)
        if (nonRoot.isEmpty) None
        else {
          val parentId = nonRoot((u32(s"parent:$round") % nonRoot.size).toInt)
          val (parentEn, parentZh) = labelsB.value(parentId)
          val siblings = childrenB.value.getOrElse(parentId, Vector.empty)
          val prompt =
            s"""You are a taxonomy expansion expert. Propose ONE new problem-type category as a child of the given parent, distinct from every existing sibling.
               |
               |Parent: $parentEn / $parentZh
               |Existing siblings: ${siblings.map(_._1).mkString(", ")}
               |Round: $round
               |
               |Return JSON {"id", "en", "zh"} embedded anywhere in your answer.""".stripMargin
          for {
            json <- graft.core.text.TextOps.extractJsonObject(client.complete(prompt))
            node <- scala.util.Try(
              new ObjectMapper().readTree(json)).toOption
            id <- Option(node.get("id")).map(_.asText).filter(_.nonEmpty)
            en <- Option(node.get("en")).map(_.asText).filter(_.nonEmpty)
            zh <- Option(node.get("zh")).map(_.asText).filter(_.nonEmpty)
          } yield Proposal(round, parentId, s"${parentId}_$id", en, zh)
        }
      }
    }.toDF

    val paths = allPaths.toDF
    // Deterministic intra-batch dedup: the earliest round wins a
    // (parent, label) collision (dropDuplicates alone keeps an arbitrary
    // row, which would make epochs run-order-dependent).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("parent_id", "en").orderBy("round_id")
    val firstPerLabel = proposals
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val accepted = validateExpansions(paths, firstPerLabel)

    // Materialize the accepted batch into new leaf paths: parent prefix +
    // the new node. The prefix map is tree-scale, broadcast like the tree.
    val prefixB = spark.sparkContext.broadcast {
      val m = scala.collection.mutable.Map.empty[String, (Vector[String], Vector[String])]
      allPaths.foreach { pr =>
        pr.ids.indices.foreach { i =>
          m.getOrElseUpdate(pr.ids(i),
            (pr.ids.take(i + 1).toVector, pr.labels.take(i + 1).toVector))
        }
      }
      m.toMap
    }
    val newPaths = accepted.select("parent_id", "id", "en").as[(String, String, String)]
      .map { case (parentId, id, en) =>
        val (ids, labels) = prefixB.value(parentId)
        val ids2 = ids :+ id
        PathRow(ids2.mkString("/"), ids2.length, ids2, labels :+ en)
      }.toDF
    (accepted, paths.unionByName(newPaths))
  }

  /** R7 (epoch model): validate expansion proposals (parent must exist,
    * sibling label must be new — anti-join) and emit the accepted rows;
    * the caller unions them into the next epoch's tree table. */
  def validateExpansions(paths: DataFrame, proposals: DataFrame): DataFrame = {
    val parents = paths.select(explode(col("ids")).as("parent_id")).distinct()
    val existingLabels = paths
      .select(explode(arrays_zip(col("ids"), col("labels"))).as("z"))
      .select(col("z.ids").as("node_id"), col("z.labels").as("label"))
      .distinct()
    proposals
      .join(parents, Seq("parent_id"), "left_semi")
      .join(existingLabels.withColumnRenamed("label", "en"),
        Seq("en"), "left_anti")
      .dropDuplicates("parent_id", "en")
  }
}
