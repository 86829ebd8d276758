package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only scale probe for the round-12 operators (q84–q87). Args:
  * <query> <dir>. Fresh JVM per (query, scale) — run via separate sbt
  * invocations, per SCALING.md's established method. */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val Array(q, dir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(q)
    // Materialize through the noop sink, NOT count(): count() lets
    // Catalyst prune every unused projection (q86's margin fold) and
    // eliminate cardinality-preserving outer joins (q87's scoring join)
    // — the first probe of this round measured a bare scan that way.
    def pass(): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def rows(): Long = fn(spark, dir).count()
    pass(); pass() // double warm
    val samples = (1 to 3).map(_ => pass())
    println(f"[r12probe] $q $dir min=${samples.min}%.2f med=${samples.sorted.apply(1)}%.2f rows=${rows()}")
    spark.stop()
  }
}
