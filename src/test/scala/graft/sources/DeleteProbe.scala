package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only cost profile of the DELETE verb at one corpus dir — the
  * scale question is "what does a purge cost relative to the build it
  * replaces, and does the probe recover its pre-delete wall": delete is
  * compaction-class by design (an anti-join staged rewrite of the whole
  * store — Bucketing.deleteByKey's scaladoc), so the interesting numbers
  * are (build, delete, probe-before, probe-after) on the postings family
  * (the one with derived stats to fold) and (delete) on the band family
  * (the sweep-fed case). Run fresh-JVM per scale dir, the R12Probe
  * protocol. Args: <dir>. */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val corpusPred = col("doc_id") % 100 =!= 7
    val bench = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 100 === 7).limit(50)
      .select(col("doc_id").as("query_id"), col("text"))
      .localCheckpoint(true)
    // the condemned set: ~2% of the corpus, sweep-verdict-scale
    val condemned = graft.Tables.documents(spark, dir)
      .filter(corpusPred && col("doc_id") % 53 === 11)
      .select("doc_id").localCheckpoint(true)
    println(s"[dprobe] dir=$dir condemned=${condemned.count()}")

    t("postings build")(
      PostingsIndex.build(spark, dir, "dprobe_post", corpusPred))
    t("probe before")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post", bench, 5)))
    t("probe before #2")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post", bench, 5)))
    t("DELETE (postings: purge + neg df deltas + stats fold)")(
      PostingsIndex.delete(spark, "dprobe_post", condemned))
    t("probe after")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post", bench, 5)))
    t("probe after #2")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post", bench, 5)))
    t("compact after delete (collapses deltas)")(
      PostingsIndex.compact(spark, "dprobe_post"))
    t("probe after compact")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post", bench, 5)))

    t("band build")(
      BandIndex.build(spark, dir, "dprobe_band", corpusPred))
    t("DELETE (band: pure purge)")(
      BandIndex.delete(spark, "dprobe_band", condemned))

    // ---- the DEFERRED verb at the same scale: the O(condemned) claim —
    // tombstone-append cost vs the eager rewrite above, and the probe's
    // anti-join overhead while tombstones are pending vs after the fold
    t("postings build (deferred leg)")(
      PostingsIndex.build(spark, dir, "dprobe_post_t", corpusPred))
    t("probe before (deferred leg)")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post_t", bench, 5)))
    t("DEFERRED DELETE (postings: tombstone append + neg df deltas + stats fold)")(
      PostingsIndex.deleteDeferred(spark, "dprobe_post_t", condemned))
    t("probe with pending tombstones")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post_t", bench, 5)))
    t("probe with pending tombstones #2")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post_t", bench, 5)))
    t("compact folds the tombstones (the deferred physical purge)")(
      PostingsIndex.compact(spark, "dprobe_post_t"))
    t("probe after fold")(
      sink(PostingsIndex.topKFor(spark, "dprobe_post_t", bench, 5)))

    t("band build (deferred leg)")(
      BandIndex.build(spark, dir, "dprobe_band_t", corpusPred))
    t("DEFERRED DELETE (band: tombstone append only)")(
      BandIndex.deleteDeferred(spark, "dprobe_band_t", condemned))
    t("sweep with pending tombstones")(
      sink(BandIndex.nearDupPairs(spark, "dprobe_band_t",
        graft.Tables.documents(spark, dir).filter(corpusPred))))
    spark.stop()
  }
}
