package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only cost profile of q149's RECURRING-crawl claim at scale — the
  * number the r19 verdict asked for: the single-shot indexed composite
  * honestly loses to the recompute at 30× (it pays the band-store build
  * on top of the same pipeline), and the operator's case is the store
  * PERSISTING across crawls. This probe measures that case: crawl A
  * builds the store; crawl B (the full corpus — A plus ~20% new
  * arrivals) reconciles the delta and sweeps; a repeat run over the
  * unchanged corpus pays the reconcile no-op + sweep alone. Compare
  * against the full recompute composite (q124's shape) and the
  * single-shot indexed build over the same union. Fresh JVM per leg,
  * the R12Probe protocol. Args: <dir>. */
object TwoCrawlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[twocrawl] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(df: org.apache.spark.sql.DataFrame): Long = df.count()

    // crawl A: 4 of 5 doc_ids (the sealed % 10 == 7 slice is id-keyed,
    // so A keeps its share of it and the gate works on both crawls)
    val dirA = java.nio.file.Files.createTempDirectory("crawlA").toString
    graft.Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 4)
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val store = "twocrawl_probe_store"
    spark.sql(s"DROP TABLE IF EXISTS $store")
    println(s"[twocrawl] dir=$dir crawlA=$dirA")

    t("crawl A: indexed composite, builds the persisted store")(
      run(CurationPipeline.accounting(spark, dirA, indexServed = true,
        bandTable = Some(store))))
    t("crawl B: indexed composite over the PERSISTED store " +
        "(reconcile ~20% new arrivals + sweep)")(
      run(CurationPipeline.accounting(spark, dir, indexServed = true,
        bandTable = Some(store))))
    t("crawl B repeat: unchanged corpus (reconcile no-op + sweep)")(
      run(CurationPipeline.accounting(spark, dir, indexServed = true,
        bandTable = Some(store))))
    t("recompute composite over the union (q124's shape)")(
      run(CurationPipeline.accounting(spark, dir)))
    t("single-shot indexed over the union (fresh store build)")(
      run(CurationPipeline.accounting(spark, dir, indexServed = true)))
    spark.stop()
  }
}
