package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only corpus builder for the vector-family scale probes: tiles a
  * base embeddings table `copies`× by the round-10 per-copy sign-flip
  * isometry (within-copy cosine structure exact, cross-copy
  * decorrelated), vec_id salted +span·copy with copy 0 the identity —
  * so the fixed anchor slice (`vec_id < 20`) and the deterministic
  * centroid fit (`vec_id < 8`) survive at one copy, as a real holdout /
  * frozen fit would. Writes `<outDir>/embeddings.parquet` for R12Probe
  * runs (the probe corpora under /tmp are wiped between sessions — this
  * is the re-generation recipe SCALING.md's vector legs reference).
  *
  *   sbt "Test/runMain graft.sources.TileVectors <baseDir> <outDir> <copies>"
  */
object TileVectors {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, copiesS) = args
    val copies = copiesS.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.Tables.embeddings(spark, baseDir)
      .select("vec_id", "label", "embedding")
    val span = base.agg(max("vec_id")).head.getLong(0) + 1
    def signLit(c: Int): Column = typedLit((0 until 64).map(i =>
      if (((c * 2654435761L >>> (i % 31)) & 1L) == 1L) -1.0f else 1.0f))
    val tiled = (0 until copies).map(c => base.select(
        (col("vec_id") + lit(c * span)).as("vec_id"), col("label"),
        zip_with(col("embedding"), signLit(c), (x, s) => x * s)
          .as("embedding")))
      .reduce(_ unionByName _)
    tiled.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")
    println(s"[tilevectors] $outDir: ${copies}x of $baseDir " +
      s"(${copies * span} vec_ids)")
    spark.stop()
  }
}
