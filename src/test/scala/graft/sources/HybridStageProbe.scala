package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profile of q136 (the fully index-served hybrid) —
  * where the round-start 58 s bench reading came from: the row is three
  * composable stages (postings probe, ANN probe, RRF fusion), and the
  * round-19 change moved its vector half from the SELF-PROBE
  * (AnnIndex.topK: one un-pruned anchor-fetch scan of the store + the
  * pruned candidate scan) to the client-signed serving probe
  * (signatureRowsOf at the recorded banding + topKFor: exactly one
  * pruned scan) — this probe times old vs new vector halves and each
  * stage alone, min-of-3 after one warmup, the PostingsProbe protocol.
  * Args: <dir>. */
object HybridStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mins(label: String, n: Int = 3)(f: => Unit): Unit = {
      f // warmup
      val xs = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[hprobe] $label: min=${xs.min}%.2f med=${xs.sorted.apply(n / 2)}%.2f s")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    PostingsIndex.build(spark, dir, "hprobe_lex")
    AnnIndex.build(spark, dir, "hprobe_ann")
    val bench = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))

    mins("lex half: PostingsIndex.topKFor k=20") {
      sink(PostingsIndex.topKFor(spark, "hprobe_lex", bench, 20))
    }
    mins("vec half OLD: AnnIndex.topK self-probe (extra un-pruned scan)") {
      sink(AnnIndex.topK(spark, "hprobe_ann", nAnchors = 8, k = 20))
    }
    val (tb, bb) = AnnIndex.recordedBanding(spark, "hprobe_ann")
    def signedAnchors = graft.queries.Similarity.signatureRowsOf(
      graft.queries.Similarity.normedVectors(spark, dir)
        .filter(col("vec_id") < 8), tb, bb)
    mins("vec half NEW: client-signed topKFor (one pruned scan)") {
      sink(AnnIndex.topKFor(spark, "hprobe_ann", signedAnchors, 20))
    }
    mins("vec half NEW + multi-probe expansion") {
      sink(AnnIndex.topKFor(spark, "hprobe_ann",
        graft.queries.Similarity.multiProbeExpand(signedAnchors, bb), 20))
    }
    // the registered row itself, memo-served (builds paid in warmup) —
    // dial off (= q136) and on (the composed recall lever's wall cost)
    mins("full q136 row (dial off)") {
      sink(graft.queries.Retrieval.hybridIndexServed(spark, dir,
        multiProbe = false))
    }
    mins("full q136 row (dial ON)") {
      sink(graft.queries.Retrieval.hybridIndexServed(spark, dir,
        multiProbe = true))
    }
    mins("q147 row (dial off)") {
      sink(graft.queries.Similarity.hardNegIndexServed(spark, dir,
        multiProbe = false))
    }
    mins("q147 row (dial ON)") {
      sink(graft.queries.Similarity.hardNegIndexServed(spark, dir,
        multiProbe = true))
    }
    spark.stop()
  }
}
