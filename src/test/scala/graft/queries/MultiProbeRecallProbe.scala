package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only recall/cost audit for multi-probe LSH (q145/q146): on a
  * corpus dir, measures recall@5 against the exact top-5 for the
  * single-probe store serve (q135's shape) and the multi-probe serve
  * (q146's — SAME store, expanded anchors), with probe walls and the
  * store's pruned-bucket counts. Args: <dir> [tables bits] — the
  * optional banding override measures the dial at OTHER store layouts
  * (round 20: the adaptive rule's 16×6 transition banding for ≥590k
  * vectors, where the operating rule's 4×8-pays / 8×4-hurts bracketing
  * needed its middle point: a radius-1 flip probes 7/64 of each
  * table's keyspace — between 4×8's 9/256 and 8×4's 5/16). Fresh JVM
  * per scale, per SCALING.md's method (corpora via TileVectors). */
object MultiProbeRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val (tables, bits) = if (args.length >= 3)
      (args(1).toInt, args(2).toInt) else (4, 8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val table = "mprobe_ann"
    graft.sources.AnnIndex.build(spark, dir, table, tables, bits)
    val anchors = Similarity.normedVectors(spark, dir)
      .filter(col("vec_id") < 20).localCheckpoint(true)
    val single = Similarity.signatureRowsOf(anchors, tables, bits)
      .localCheckpoint(true)
    val multi = Similarity.multiProbeExpand(single, bits)
      .localCheckpoint(true)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def probe(a: org.apache.spark.sql.DataFrame) =
      graft.sources.AnnIndex.topKFor(spark, table, a, 5)
    def timedMin(f: => Set[(Long, Long)]): (Set[(Long, Long)], Double) = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).min)
    }

    val exact = pairs(Similarity.cosineTopK(spark, dir, k = 5,
      crossLabelOnly = false))
    val (pSingle, tSingle) = timedMin(pairs(probe(single)))
    val (pMulti, tMulti) = timedMin(pairs(probe(multi)))
    def recall(s: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (exact & s).size.toDouble / exact.size
    def sel(a: org.apache.spark.sql.DataFrame): String =
      "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(probe(a).queryExecution.executedPlan.toString)
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")
    println(f"[mprobe] dir=$dir banding=${tables}x$bits " +
      f"single: recall=${recall(pSingle)}%.3f wall=$tSingle%.2f buckets=${sel(single)} | " +
      f"multi: recall=${recall(pMulti)}%.3f wall=$tMulti%.2f buckets=${sel(multi)}")
    spark.stop()
  }
}
