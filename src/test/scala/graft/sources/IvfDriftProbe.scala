package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Dev-only: the FIT-DRIFT pathology and the [[IvfIndex.refit]] payoff,
  * measured — the evidence leg for the round-18 refit surface the way
  * CompactionProbe measured compact's: a store built at a fit the
  * ingested distribution then drifts away from piles the new vectors
  * into few hot cells ([[IvfIndex.cellStats]] is the trigger metric),
  * and a probe whose n-probe cells are the hot ones scans a
  * corpus-sized slice — probe cost degrades toward the full scan while
  * the bucket-pruned plan still LOOKS pruned. refit reassigns under a
  * fit covering both populations and restores the cost.
  *
  *   sbt "Test/runMain graft.sources.IvfDriftProbe [dir]"
  *
  * Drift model: the appended population is the base corpus NEGATED
  * (the SCALING.md embeddings sign-flip recipe) under offset ids —
  * maximally far from every base centroid, so the whole appended half
  * crowds into whichever base cells face it; queries are drawn from the
  * drifted population (the realistic case: fresh queries track the
  * fresh distribution). Each leg reports occupied cells, max/mean
  * occupancy, min-of-3 probe seconds, and recall@3 vs exact over the
  * same store. */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = "driftprobe_ivf"
    val base = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding")
    val maxId = base.agg(max("vec_id")).head.getLong(0)
    val n = base.count()
    val drifted = base.select((col("vec_id") + maxId + 1).as("vec_id"),
      col("label"),
      transform(col("embedding"), x => -x).as("embedding"))
    println(s"[driftprobe] dir=$dir base=$n maxId=$maxId")

    // the store: built at the 8-centroid base fit, then the drifted
    // population streams in (the frozen-fit append path)
    IvfIndex.build(spark, dir, table, buckets = 16, nCentroids = 8)
    IvfIndex.appendVectors(table, drifted)

    // queries from the drifted distribution, held out of the store
    // (fresh ids past both populations)
    val anchors = Similarity.normedVectorsOf(spark,
        base.filter(col("vec_id") >= 100 && col("vec_id") < 120)
          .select((col("vec_id") + 2 * (maxId + 1)).as("vec_id"),
            col("label"),
            transform(col("embedding"), x => -x).as("embedding")))
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
      .localCheckpoint(true)

    def exactTop3(): Set[(Long, Long)] = {
      val cos = Similarity.dot(col("qv"), col("v")) /
        (col("qnrm") * col("nrm"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      spark.table(table)
        .crossJoin(broadcast(anchors
          .select(col("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm"))))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cos.as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    def leg(name: String): Unit = {
      val occ = IvfIndex.cellStats(spark, table)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val (occupied, maxOcc) = (occ.length, occ.map(_._2).max)
      val meanOcc = occ.map(_._2).sum.toDouble / occ.length
      val probeS = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        IvfIndex.topKFor(spark, table, anchors, k = 3)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      val got = IvfIndex.topKFor(spark, table, anchors, k = 3)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = exactTop3()
      val recall = got.intersect(truth).size.toDouble / truth.size
      println(f"[driftprobe] $name%-8s occupied=$occupied%3d " +
        f"max_occ=$maxOcc%7d mean_occ=$meanOcc%9.1f " +
        f"probe_s=$probeS%6.2f recall@3=$recall%.3f")
    }

    leg("drifted")

    // the refit: a fit covering BOTH populations — 8 base + 8 drifted
    // centroid rows (production would hand a k-means fit; the two-sided
    // deterministic pick is the spec-replayable stand-in)
    val cent = Similarity.normedVectorsOf(spark,
        base.filter(col("vec_id") < 8)
          .unionByName(drifted.filter(col("vec_id") <= maxId + 8)))
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val t0 = System.nanoTime()
    IvfIndex.refit(spark, table, cent)
    println(f"[driftprobe] refit_s=${(System.nanoTime() - t0) / 1e9}%.2f")

    leg("refit")
    spark.stop()
  }
}
