package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing.compact — the small-files maintenance pass for the
  * append-heavy index lifecycle: after a build + repeated appends, a
  * compaction must shrink the table to one file per bucket while
  * leaving probe output row-identical, the engine's graft.* properties
  * intact, and bucket pruning alive. */
class CompactionSpec extends SparkSpec {

  private def dataFiles(table: String): Seq[java.nio.file.Path] = {
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir"))
    val dir = java.nio.file.Paths.get(warehouse.getPath, table)
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(dir)) { st =>
      st.iterator.asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .toSeq
    }
  }

  test("postings: build + 2 appends accumulate files; compact rewrites to " +
      "one file per occupied bucket with probes row-identical, stats and " +
      "pruning preserved") {
    PostingsIndex.build(spark, sfDir, "compact_post",
      corpusPred = col("doc_id") % 3 === 0, buckets = 8)
    PostingsIndex.append(spark, sfDir, "compact_post",
      pred = col("doc_id") % 3 === 1)
    PostingsIndex.append(spark, sfDir, "compact_post",
      pred = col("doc_id") % 3 === 2)
    val q = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))
    def rows() = PostingsIndex.topKFor(spark, "compact_post", q, k = 10)
      .select("query_id", "doc_id", "n_terms", "score", "rank")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4))).toSeq
    val before = rows()
    val statsBefore = PostingsIndex.stats(spark, "compact_post")
    val filesBefore = dataFiles("compact_post").size
    assert(filesBefore > 8,
      s"three bucketed writes must exceed one file per bucket, got $filesBefore")

    Bucketing.compact(spark, "compact_post")

    val filesAfter = dataFiles("compact_post").size
    assert(filesAfter <= 8 && filesAfter < filesBefore,
      s"compaction must reach one file per occupied bucket: $filesBefore -> $filesAfter")
    assert(PostingsIndex.stats(spark, "compact_post") == statsBefore,
      "compaction must carry the collection stats through the rewrite")
    assert(rows() == before, "compaction changed probe output")
    val plan = PostingsIndex.topKFor(spark, "compact_post",
        spark.createDataFrame(Seq((0L, "alpha beta"))).toDF("query_id", "text"),
        k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"compaction broke bucket pruning:\n$plan")
  }

  test("ann: compaction preserves the banding properties, so appends keep " +
      "their mismatch guard and probes stay equal") {
    AnnIndex.build(spark, sfDir, "compact_ann", tables = 4, bits = 8,
      buckets = 8)
    val e = graft.Tables.embeddings(spark, sfDir)
    AnnIndex.appendVectors("compact_ann", e.filter(col("vec_id") >= 10000))
    def rows() = AnnIndex.topK(spark, "compact_ann", nAnchors = 20, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val before = rows()
    Bucketing.compact(spark, "compact_ann")
    assert(rows() == before, "compaction changed the ANN probe")
    // the banding survived: a mismatched append still fails loudly
    val err = intercept[IllegalArgumentException] {
      AnnIndex.appendVectors("compact_ann", e.limit(0), tables = 2, bits = 4)
    }
    assert(err.getMessage.contains("banding"))
  }

  test("compact refuses an unbucketed table") {
    import spark.implicits._
    // the writeBucketed leftover-dir cleanup, for a FLAT table: an
    // in-memory catalog forgets tables between JVMs while the warehouse
    // dir persists, and saveAsTable refuses the "new" location
    spark.sql("DROP TABLE IF EXISTS compact_flat")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val leftover = java.nio.file.Paths.get(warehouse.getPath, "compact_flat")
    if (java.nio.file.Files.exists(leftover)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(leftover).iterator.asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    Seq((1L, "x")).toDF("id", "v").write.saveAsTable("compact_flat")
    val err = intercept[IllegalStateException] {
      Bucketing.compact(spark, "compact_flat")
    }
    assert(err.getMessage.contains("not bucketed"))
  }
}
