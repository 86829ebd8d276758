package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only round-21 probe: does ObjectHashAggregate's sort-based
  * fallback (spark.sql.objectHashAggregate.sortBased.fallbackThreshold,
  * default 128 in-memory groups) cost the BM25 scoring tail anything at
  * its ~247k-group volume? Interleaved same-JVM A/B of q134 with the
  * threshold at default vs raised. Run:
  * `sbt "Test/runMain graft.queries.R21OhaProbe /root/testdata/sf0.1"`. */
object R21OhaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q134_postings_decontam")
    def run(): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    run() // warmup (memo build)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    (1 to 4).foreach { i =>
      spark.conf.set(key, "128")
      val a = t(run())
      spark.conf.set(key, "10000000")
      val b = t(run())
      println(f"[r21oha] pass$i default128=$a%.2f raised10M=$b%.2f")
    }
    spark.stop()
  }
}
