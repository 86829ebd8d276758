package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only isolated q32 timing probe (test scope, not shipped). */
object Q32Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): (Double, Long) = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val st = Dedup.q32Stages(spark, dir)
      val n = st.result.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (1 to 5).foreach { i =>
      val (t, n) = run()
      println(f"[q32probe] pass $i: $t%.2f s, $n rows")
    }
    val st = Dedup.q32Stages(spark, dir)
    println(s"[q32probe] cand pairs: ${st.cand.count()}")
    spark.stop()
  }
}
