package graft.gyrfalcon

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tree data-plane checks (S6/A6/A7/R7). */
class TreeSpec extends SparkSpec {

  private val treeJson =
    """{"framework": "demo", "tree": {
      "id": "root", "en": "Root", "zh": "根",
      "children": [
        {"id": "a", "en": "Alpha", "zh": "甲", "children": [
          {"id": "a1", "en": "Alpha One", "zh": "甲一", "children": []},
          {"id": "a2", "en": "Alpha Two", "zh": "甲二", "children": []}
        ]},
        {"id": "b", "en": "Beta", "zh": "乙", "children": []}
      ]}}"""

  private lazy val root = Tree.parse(treeJson)
  private lazy val paths = Tree.pathsDf(spark, root)

  test("parse + path enumeration") {
    assert(root.children.map(_.id) == Seq("a", "b"))
    val p = Tree.enumeratePaths(root)
    assert(p.map(_.path_id).toSet ==
      Set("root/a/a1", "root/a/a2", "root/b"))
    assert(p.map(_.depth).sorted == Seq(2, 3, 3))
  }

  test("tree stats and node count") {
    val s = Tree.stats(paths).head()
    assert(s.getAs[Long]("total_paths") == 3)
    assert(s.getAs[Int]("max_depth") == 3)
    assert(s.getAs[Int]("min_depth") == 2)
    assert(Tree.nodeCount(paths) == 5)
  }

  test("stats merge is associative (lock-free A7)") {
    import spark.implicits._
    val old = Seq(("root/a/a1", 3L), ("root/b", 1L)).toDF("path_id", "count")
    val d1 = Seq(("root/a/a1", 2L)).toDF("path_id", "count")
    val d2 = Seq(("root/b", 4L), ("root/a/a2", 1L)).toDF("path_id", "count")
    val merged = Tree.mergeStats(Tree.mergeStats(old, d1), d2)
      .orderBy("path_id").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(merged.toSeq == Seq(
      "root/a/a1" -> 5L, "root/a/a2" -> 1L, "root/b" -> 5L))
    // other merge order, same result
    val merged2 = Tree.mergeStats(Tree.mergeStats(old, d2), d1)
      .orderBy("path_id").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(merged.sameElements(merged2))
  }

  test("expansion proposals: unknown parents and duplicate labels rejected") {
    import spark.implicits._
    val proposals = Seq(
      ("a", "Alpha Three", "甲三"),   // ok
      ("nope", "Gamma", "丙"),        // unknown parent
      ("b", "Alpha", "甲"),           // duplicate label
      ("a", "Alpha Three", "甲三x")   // duplicate of first proposal
    ).toDF("parent_id", "en", "zh")
    val accepted = Tree.validateExpansions(paths, proposals).collect()
    assert(accepted.length == 1)
    assert(accepted.head.getAs[String]("en") == "Alpha Three")
  }

  test("expansion epoch end-to-end: proposals survive validation and land in the next epoch") {
    import graft.services.StubServiceClient
    val (accepted, nextPaths) =
      Tree.expansionEpoch(spark, root, StubServiceClient, nRounds = 300, p = 0.2)
    val acc = accepted.collect()
    assert(acc.nonEmpty, "a 0.2 gate over 300 rounds must accept something")
    // the gate: far fewer proposals than rounds
    assert(acc.length < 150)
    acc.foreach { r =>
      val parent = r.getAs[String]("parent_id")
      assert(parent != "root", "parents are picked from non-root path nodes")
      assert(r.getAs[String]("id").startsWith(parent + "_"),
        "new ids carry the parent prefix (the reference's uniqueness rule)")
      assert(r.getAs[String]("zh").nonEmpty)
    }
    // no (parent, label) collisions survived
    val keys = acc.map(r => (r.getAs[String]("parent_id"), r.getAs[String]("en")))
    assert(keys.distinct.length == keys.length)
    // every accepted proposal became a leaf path in the next epoch
    val nextIds = nextPaths.select(explode(col("ids")).as("id"))
      .distinct().collect().map(_.getString(0)).toSet
    acc.foreach(r => assert(nextIds.contains(r.getAs[String]("id"))))
    assert(nextPaths.count() == paths.count() + acc.length)
    // reproducible: same seed, same epoch
    val (again, _) =
      Tree.expansionEpoch(spark, root, StubServiceClient, nRounds = 300, p = 0.2)
    assert(again.orderBy("round_id").collect().map(_.toString).toSeq ==
      accepted.orderBy("round_id").collect().map(_.toString).toSeq)
  }

  test("sinks: enhancement and anti-join resume") {
    import spark.implicits._
    val spans = Seq(("t1", "s1"), ("t1", "s2"), ("t2", "s3"))
      .toDF("trace_id", "span_id")
    val queries = Seq(("t1", "find x", "fw1")).toDF("trace_id", "query", "framework")
    val enhanced = graft.sources.Sinks.enhance(spans, queries)
    assert(enhanced.filter(col("trace_id") === "t1")
      .select("query").distinct().head().getString(0) == "find x")
    assert(enhanced.columns.contains("stop"))

    val landed = Seq("t1").toDF("trace_id")
    val remaining = graft.sources.Sinks.notYetLanded(spans, landed)
    assert(remaining.select("trace_id").distinct().collect().map(_.getString(0)).toSeq == Seq("t2"))
  }

  test("tree visualization renders every node and edge as self-contained SVG") {
    val html = Tree.visualizationHtml(root, "demo taxonomy")
    assert(html.contains("<svg"))
    // every node appears with both labels; no external scripts
    Seq("Root", "Alpha", "Alpha One", "Alpha Two", "Beta").foreach(l =>
      assert(html.contains(s">$l<"), s"missing label $l"))
    assert(html.contains("甲一") && html.contains("根"))
    assert(!html.contains("<script"))
    // n-1 edges for n nodes
    assert("class=\"edge\"".r.findAllIn(html).length == 4)
    assert("<circle".r.findAllIn(html).length == 5)
    assert(html.contains("3 paths, depth 2–3, 5 nodes (3 leaves)"))
    // XML-unsafe labels are escaped
    val spiky = Tree.Node("r", "a<b & c", "", Seq(Tree.Node("c1", "leaf", "", Nil)))
    assert(Tree.visualizationHtml(spiky, "t").contains("a&lt;b &amp; c"))
  }

  test("stats html report renders paths and summary") {
    val html = Tree.statsHtml(paths, "demo tree")
    assert(html.contains("<title>demo tree</title>"))
    assert(html.contains("paths: 3"))
    assert(html.contains("root/a/a1"))
    assert(html.contains("(avg 2.67)"))
  }
}
