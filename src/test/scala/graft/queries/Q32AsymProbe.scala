package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only probe: measures what the asymmetric PPJoin index prefix
  * (Xiao WWW'08 §3.2) buys on a HEAVY-TAILED corpus — the round-12
  * bench corpus is vocabulary-saturated (every gram common, no prefix
  * selective), so the claimed candidate cut was argued, not measured.
  * Runs the q32 candidate stage twice from ONE shared prefix index
  * (asymmetric on/off) and reports exploded index rows, join events
  * (pre-distinct), distinct candidate pairs, and wall time per arm.
  * Args: <dir>. Test scope, not shipped. */
object Q32AsymProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    val g = Dedup.q32HashGrams(spark, dir).localCheckpoint(eager = true)
    val prefix = Dedup.q32Prefix(g)
    println(s"[q32asym] dir=$dir prefixRows=${prefix.count()}")
    for (asym <- Seq(false, true); pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val (xSide, joinedRaw, joined, cand) = Dedup.q32CandStages(prefix, asym)
      val nc = cand.count()
      val wall = (System.nanoTime() - t0) / 1e9
      if (pass == 3) {
        val nx = xSide.count()
        val nr = joinedRaw.count()
        val nj = joined.count()
        println(f"[q32asym] asym=$asym xSideRows=$nx preFilterEvents=$nr " +
          f"joinEvents=$nj candPairs=$nc wall=$wall%.2f s")
      } else println(f"[q32asym] asym=$asym warm pass $pass wall=$wall%.2f s")
    }
    spark.stop()
  }
}
