package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   sbt "Test/runMain graft.sources.IvfDriftProbe [dir] [copies]"
  *
  * Corpus: the base embeddings tiled `copies`× by the round-10
  * per-copy sign-flip isometry (within-copy cosine structure exact,
  * cross-copy decorrelated), vec_id salted per copy. Drift model: the
  * drifted population is the base corpus shrunk 4× and OFFSET along a
  * fixed direction — the "new domain entering the crawl" shape: every
  * drifted vector points mostly along the shared direction, so under
  * the base fit the whole population crowds into the one or two cells
  * facing it, at ANY corpus scale. Queries are held-out drifted
  * vectors (fresh queries track the fresh distribution). Each leg
  * reports occupied cells, max/mean occupancy, and min-of-3 probe
  * seconds + recall@3 vs exact over the same store at nProbe = 2 AND
  * 4: after a refit that doubles nlist, the matched-SCAN-FRACTION
  * comparison is (drifted, nProbe=2: 2/8 of cells) vs (refit,
  * nProbe=4: 4/16) — comparing at fixed nProbe conflates the fit with
  * the recall-for-scan-volume dial. */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = "driftprobe_ivf"
    val base0 = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding")
    val span = base0.agg(max("vec_id")).head.getLong(0) + 1

    def signLit(c: Int): Column = typedLit((0 until 64).map(i =>
      if (((c * 2654435761L >>> (i % 31)) & 1L) == 1L) -1.0f else 1.0f))
    val base = (0 until copies).map(c => base0.select(
        (col("vec_id") + lit(c * span)).as("vec_id"), col("label"),
        zip_with(col("embedding"), signLit(c), (x, s) => x * s)
          .as("embedding")))
      .reduce(_ unionByName _)
    val nBase = copies * base0.count()

    // the shared drift direction — any fixed non-degenerate unit-ish
    // vector; the offset dominates the 2x-shrunk residual structure in
    // cosine (so the population crowds under the base fit) while the
    // residual keeps realistic INTERNAL spread (so a trained fit can
    // split the mass — a 4x shrink makes it one tight Euclidean cluster
    // that k-means correctly, and uselessly, keeps whole)
    val dirLit = typedLit((0 until 64).map(i => ((i % 7) - 3) * 0.1f))
    def drift(df: DataFrame, idOffset: Long): DataFrame = df.select(
      (col("vec_id") + lit(idOffset)).as("vec_id"), col("label"),
      zip_with(col("embedding"), dirLit, (x, d) => x * 0.5f + d)
        .as("embedding"))
    val drifted = drift(base, copies * span)
    println(s"[driftprobe] dir=$dir copies=$copies base=$nBase " +
      s"store=${2 * nBase}")

    // the store: built at the 8-centroid base fit, then the drifted
    // population streams in (the frozen-fit append path)
    IvfIndex.build(spark, dir, table, buckets = 16, nCentroids = 8)
    if (copies > 1)
      IvfIndex.appendVectors(table,
        base.filter(col("vec_id") >= span)) // copies 1.. of the base
    val t0a = System.nanoTime()
    IvfIndex.appendVectors(table, drifted)
    println(f"[driftprobe] drift_append_s=${(System.nanoTime() - t0a) / 1e9}%.2f")

    // queries from the drifted distribution, held out of the store
    val anchors = Similarity.normedVectorsOf(spark,
        drift(base0.filter(col("vec_id") >= 100 && col("vec_id") < 120),
          (2L * copies + 1L) * span))
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
      val meanOcc = occ.map(_._2).sum.toDouble / occ.length
      println(f"[driftprobe] $name%-8s occupied=${occ.length}%3d " +
        f"max_occ=${occ.map(_._2).max}%8d mean_occ=$meanOcc%10.1f")
      val truth = exactTop3()
      Seq(2, 4).foreach { nProbe =>
        val probeS = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          IvfIndex.topKFor(spark, table, anchors, k = 3, nProbe = nProbe)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        val got = IvfIndex.topKFor(spark, table, anchors, k = 3,
            nProbe = nProbe)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = got.intersect(truth).size.toDouble / truth.size
        println(f"[driftprobe] $name%-8s nProbe=$nProbe " +
          f"probe_s=$probeS%6.2f recall@3=$recall%.3f")
      }
    }

    leg("drifted")

    // the refit: a fit covering BOTH populations — 8 base + 8 drifted
    // centroid rows (production would hand a k-means fit; the two-sided
    // deterministic pick is the spec-replayable stand-in)
    val cent = Similarity.normedVectorsOf(spark,
        base0.filter(col("vec_id") < 8)
          .unionByName(drift(base0.filter(col("vec_id") < 8),
            copies * span)))
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val t0 = System.nanoTime()
    IvfIndex.refit(spark, table, cent)
    println(f"[driftprobe] refit_s=${(System.nanoTime() - t0) / 1e9}%.2f")

    leg("refit")

    // the PRODUCTION fit, ablated on seeding: Lloyd over the store's own
    // rows, (a) seeded from the first 16 ids — all BASE vectors, the
    // naive carry-over of the build rule; (b) seeded from an
    // evenly-spaced id sample of the CURRENT store — the deterministic
    // stand-in for sampling-based seeding (k-means++ practice)
    val storeVecs = spark.table(table).select(col("vec_id"),
      lit(0).as("label"), col("v").as("embedding")).localCheckpoint(true)
    def kmLeg(name: String, seedIds: Option[Seq[Long]]): Unit = {
      val t1 = System.nanoTime()
      val kmFit = graft.queries.Clustering.kmeansFitOf(spark, storeVecs,
        iters = 3, k = 16, seedIds = seedIds)
      IvfIndex.refit(spark, table, kmFit)
      println(f"[driftprobe] $name fit_plus_refit_s=" +
        f"${(System.nanoTime() - t1) / 1e9}%.2f")
      leg(name)
    }
    kmLeg("km-base", None)
    val step = 2 * nBase / 16
    kmLeg("km-spread", Some((0 until 16).map(i => i * step)))
    spark.stop()
  }
}
