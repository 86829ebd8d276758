package graft.sources

import org.apache.spark.sql.SparkSession

/** Dev-only probe: pruned index probe vs recompute-per-run lshTopK on a
  * large embeddings corpus. Args: <dir> [nAnchors]. Build cost reported
  * separately — it amortizes over every later probe. */
object AnnIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nAnchors = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    AnnIndex.build(spark, dir, "ann_idx_probe", tables = 4, bits = 8,
      buckets = 64)
    println(f"[annprobe] build: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def time(label: String)(f: => Long): Unit = {
      f
      val times = (1 to 3).map { _ =>
        val s = System.nanoTime(); val n = f
        ((System.nanoTime() - s) / 1e9, n)
      }
      println(f"[annprobe] $label: min=${times.map(_._1).min}%.2f s rows=${times.head._2}")
    }
    time(s"indexed probe ($nAnchors anchors)") {
      AnnIndex.topK(spark, "ann_idx_probe", nAnchors, 5).count()
    }
    val plan = AnnIndex.topK(spark, "ann_idx_probe", nAnchors, 5)
      .queryExecution.executedPlan.toString
    "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      .foreach(m => println(s"[annprobe] pruning: ${m.group(1)} of ${m.group(2)} buckets"))
    time("recompute lshTopK (20 anchors, its fixed set)") {
      graft.SparkEntry.queries("q35_ann_lsh")(spark, dir).count()
    }
    spark.stop()
  }
}
