package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic + plan checks for the round-13 operators. Hash-level
  * correctness runs against the DuckDB oracle; these pin the guarantees
  * the implementations claim (q97: sketch-routed output EQUALS the full
  * GROUP BY answer) against independent driver-side recomputations. */
class R13OpsSpec extends SparkSpec {

  test("q97 equals the exact full-group-by heavy-hitter answer") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val grams = texts.flatMap { t =>
      val toks = t.split(" ", -1)
      if (toks.length < 3) Seq.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toSeq
    }
    val n = grams.length.toLong
    val expect = grams.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 5000L > n }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q97_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(expect.nonEmpty, "fixture must produce at least one heavy hitter")
  }

  test("q97 output is invariant to partition layout (sketch only routes)") {
    // The Misra-Gries survivor SET depends on stream order; the final
    // output must not. Re-run under a different scan parallelism.
    val base = SparkEntry.queries("q97_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = SparkEntry.queries("q97_heavy_hitters")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(alt == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }
}
