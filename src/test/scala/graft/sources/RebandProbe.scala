package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Dev-only: the [[AnnIndex.reband]] cost and the banding-transition
  * payoff, measured on a tiled store — the evidence leg for the
  * round-18 reband surface: adaptiveBanding's rule says a store grown
  * past ~590 k vectors wants 16×6 where it was built at 8×4 (the
  * round-15 transition); reband re-signs the store's OWN rows (no
  * corpus re-read) and swaps rows + banding properties in one staged
  * rewrite. Reports the reband duration and, at each banding, the
  * probe min-of-3 and recall@5 vs exact for 20 held-out anchors.
  *
  *   sbt "Test/runMain graft.sources.RebandProbe [dir] [copies]"
  */
object RebandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val table = "reband_probe"
    val base0 = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding")
    val span = base0.agg(max("vec_id")).head.getLong(0) + 1
    def signLit(c: Int): Column = typedLit((0 until 64).map(i =>
      if (((c * 2654435761L >>> (i % 31)) & 1L) == 1L) -1.0f else 1.0f))
    val tiled = (0 until copies).map(c => base0.select(
        (col("vec_id") + lit(c * span)).as("vec_id"), col("label"),
        zip_with(col("embedding"), signLit(c), (x, s) => x * s)
          .as("embedding")))
      .reduce(_ unionByName _)
    println(s"[rebandprobe] dir=$dir copies=$copies " +
      s"store=${copies * base0.count()}")

    // built at the SMALL banding (the corpus has since outgrown it)
    val t0 = System.nanoTime()
    AnnIndex.build(spark, dir, table, tables = 8, bits = 4, buckets = 64)
    if (copies > 1)
      AnnIndex.appendVectors(table, tiled.filter(col("vec_id") >= span),
        tables = 8, bits = 4)
    println(f"[rebandprobe] build_plus_appends_s=${(System.nanoTime() - t0) / 1e9}%.2f")

    // held-out anchors (fresh ids, one extra sign-flip copy)
    val anchorVecs = base0.filter(col("vec_id") >= 50 && col("vec_id") < 70)
      .select((col("vec_id") + (copies + 1) * span).as("vec_id"),
        col("label"),
        zip_with(col("embedding"), signLit(copies + 1), (x, s) => x * s)
          .as("embedding"))
    val normed = Similarity.normedVectorsOf(spark, anchorVecs)
      .localCheckpoint(true)

    val truth: Set[(Long, Long)] = {
      val cos = Similarity.dot(col("qv"), col("v")) /
        (col("qnrm") * col("nrm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      spark.table(table).filter(col("tbl") === 0)
        .crossJoin(broadcast(normed
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qnrm"))))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cos.as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    def leg(name: String): Unit = {
      val (tables, bits) = AnnIndex.recordedBanding(spark, table)
      val anchors = Similarity.signatureRowsOf(normed, tables, bits)
        .localCheckpoint(true)
      val probeS = (1 to 3).map { _ =>
        val t = System.nanoTime()
        AnnIndex.topKFor(spark, table, anchors, k = 5)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }.min
      val got = AnnIndex.topKFor(spark, table, anchors, k = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = got.intersect(truth).size.toDouble / truth.size
      println(f"[rebandprobe] $name%-10s banding=${tables}x$bits " +
        f"probe_s=$probeS%6.2f recall@5=$recall%.3f")
    }

    leg("built")
    val t1 = System.nanoTime()
    AnnIndex.reband(spark, table, tables = 16, bits = 6)
    println(f"[rebandprobe] reband_s=${(System.nanoTime() - t1) / 1e9}%.2f")
    leg("rebanded")
    spark.stop()
  }
}
