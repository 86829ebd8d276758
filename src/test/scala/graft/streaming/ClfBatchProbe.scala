package graft.streaming

import org.apache.spark.sql.SparkSession

/** Dev-only scan-rate reference for ClassifierStream's fused scorer: the
  * same 1M 16-token docs the probe's `classifier` section streams, but
  * as a 32-partition batch frame — isolating the OPERATOR's rate from
  * MemoryStream's source partitioning (the known few-partitions gotcha:
  * the streaming section measures the source, not the map). Round-16
  * numbers: 560 k rec/s here vs 45 k rec/s through MemoryStream. */
object ClfBatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = Array.fill(256)(3L)
    val docs = spark.range(0, 1000000, 1, 32)
      .selectExpr("id as doc_id",
        "concat_ws(' ', transform(sequence(1,16), j -> concat('u', id, 'x', j))) as text")
    def pass(): Double = {
      val t0 = System.nanoTime()
      ClassifierStream.verdicts(docs, w).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    pass()
    val times = (1 to 3).map(_ => pass())
    println(f"[clfbatch] 1M docs 32 partitions: min=${times.min}%.2f s = ${1000000 / times.min}%.0f rec/s")
    spark.stop()
  }
}
