package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only recall audit for q125's corpus-adaptive banding (round 15):
  * on a scale corpus, measures recall@3 against the exact cross-label
  * ranking (q122 semantics — the q112 audit pattern) for BOTH the
  * adaptive banding chosen by [[Similarity.adaptiveBanding]] and the
  * round-14 static 8×4, with wall clocks. Args: <dir>. Fresh JVM per
  * scale, per SCALING.md's method; corpora are the round-12 sign-flip
  * isometry replicas (anchors `vec_id < 20` kept at one copy). */
object R15RecallProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // size banding from the SAME count the q125 entry point uses
    // (raw parquet rows — metadata-served, see Similarity.corpusCount)
    val n = Similarity.corpusCount(spark, dir)
    val (tables, bits) = Similarity.adaptiveBanding(n)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (exact, tExact) =
      timed(pairs(Similarity.cosineTopK(spark, dir, k = 3, crossLabelOnly = true)))
    val (adaptive, tAdapt) = timed(pairs(
      Similarity.lshTopK(spark, dir, k = 3, crossLabelOnly = true, tables, bits)))
    val (static84, tStatic) = timed(pairs(
      Similarity.lshTopK(spark, dir, k = 3, crossLabelOnly = true, tables = 8, bits = 4)))

    def recall(s: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (exact & s).size.toDouble / exact.size
    println(f"[r15recall] dir=$dir n=$n adaptive=${tables}x$bits " +
      f"occ=${n / (1L << bits)}/bucket (static occ=${n / 16}) " +
      f"exactPairs=${exact.size} exactWall=$tExact%.2f s | " +
      f"adaptive recall@3=${recall(adaptive)}%.3f wall=$tAdapt%.2f s | " +
      f"static 8x4 recall@3=${recall(static84)}%.3f wall=$tStatic%.2f s")
    spark.stop()
  }
}
