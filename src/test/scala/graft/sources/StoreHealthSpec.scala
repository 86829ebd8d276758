package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintenance scheduler's page: one inventory row per persisted
  * store, every signal from catalog metadata (plus the verdict-scale
  * tombstone count) — family classification from the identity
  * properties, files-per-bucket for the compaction trigger, pending
  * tombstones for the deferred-purge backlog, the recorded
  * banding/fit/stats, and the streaming batch marker. */
class StoreHealthSpec extends SparkSpec {

  private def row(table: String) =
    StoreHealth.inventory(spark).filter(col("table") === table)
      .collect().toSeq

  test("every family classifies with its recorded identity; appends, " +
      "deferred deletes, batch markers and compaction all show") {
    import spark.implicits._
    PostingsIndex.build(spark, sfDir, "health_post", buckets = 8)
    AnnIndex.build(spark, sfDir, "health_ann", tables = 4, bits = 8,
      buckets = 16)
    BandIndex.build(spark, sfDir, "health_band")
    IvfIndex.build(spark, sfDir, "health_ivf")
    IvfIndex.buildSq(spark, sfDir, "health_ivfsq")

    val inv = StoreHealth.inventory(spark)
    assert(inv.columns.toSeq == Seq("table", "family", "recorded",
      "buckets", "data_files", "companion_files", "last_batch",
      "tombstones_pending", "advisories_pending"))
    val fams = inv.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fams("health_post") == "postings")
    assert(fams("health_ann") == "ann")
    assert(fams("health_band") == "band")
    assert(fams("health_ivf") == "ivf_float")
    assert(fams("health_ivfsq") == "ivf_sq")
    // companions never list as stores of their own
    assert(!fams.contains("health_post_df") &&
      !fams.contains("health_ivf_cent"),
      "companion tables must fold into their parent's row")

    val post = row("health_post").head
    assert(post.getString(2).startsWith("n_docs="),
      "postings row must carry the recorded collection stats")
    assert(post.getInt(3) == 8 && post.getInt(4) >= 8,
      "bucket count and data files must come from the catalog + listing")
    assert(post.getInt(5) > 0, "the df companion's files must fold in")
    assert(post.getLong(6) == -1L && post.getLong(7) == 0L)

    // a deferred delete surfaces as pending tombstones...
    PostingsIndex.deleteDeferred(spark, "health_post",
      Seq(3L, 17L).toDF("doc_id"))
    assert(row("health_post").head.getLong(7) > 0L,
      "pending tombstones must surface in the inventory")
    // ...and the compaction that folds them zeroes the backlog
    PostingsIndex.compact(spark, "health_post")
    val folded = row("health_post").head
    assert(folded.getLong(7) == 0L,
      "compact must zero the tombstone backlog")
    assert(folded.getInt(4) == 8,
      "compact must land one file per bucket")

    // the streaming batch marker reads through
    Bucketing.recordBatch(spark, "health_band", 41L)
    assert(row("health_band").head.getLong(6) == 41L)
    // banding identity renders for the reband decision
    assert(row("health_band").head.getString(2) ==
      "shingle=3 hashes=12 bands=4")
    assert(row("health_ann").head.getString(2) == "tables=4 bits=8")
    assert(row("health_ivfsq").head.getString(2).startsWith("fit="))

    // the drift advisor's backlog rides the page: advise, see it, drain
    graft.streaming.SqDriftAdvisor.clearAll()
    graft.streaming.SqDriftAdvisor.check(spark, "health_ivfsq",
      skewThreshold = 0.0)
    assert(row("health_ivfsq").head.getInt(8) > 0,
      "a pending drift advisory must surface in the inventory")
    graft.streaming.SqDriftAdvisor.drain("health_ivfsq")
    assert(row("health_ivfsq").head.getInt(8) == 0)
  }

  test("the tombstone probe plan: bucket pruning survives the broadcast " +
      "anti-join; a tombstone-free store plans with no anti-join at all") {
    import spark.implicits._
    PostingsIndex.build(spark, sfDir, "health_plan", buckets = 16)
    val bench = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 4)
      .select(col("doc_id").as("query_id"), col("text"))
    def plan() = PostingsIndex.topKFor(spark, "health_plan", bench, 5)
      .queryExecution.executedPlan.toString
    val before = plan()
    assert(before.contains("SelectedBucketsCount"),
      s"pruning missing before tombstones:\n$before")
    assert(!before.contains("LeftAnti"),
      "a tombstone-free probe must not pay an anti-join")
    PostingsIndex.deleteDeferred(spark, "health_plan",
      Seq(42L).toDF("doc_id"))
    val after = plan()
    assert(after.contains("SelectedBucketsCount"),
      s"the tombstone anti-join must sit ABOVE the pruned scan:\n$after")
    assert(after.contains("LeftAnti") && after.contains("Broadcast"),
      s"pending tombstones must subtract via a broadcast anti-join:\n$after")
  }
}
