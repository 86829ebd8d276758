package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profile of the postings-index probe vs the recompute
  * path at one dir: where does q134's time go. Args: <dir>. */
object PostingsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val corpusPred = col("doc_id") % 100 =!= 7 || col("doc_id") >= 5000
    val benchPred = col("doc_id") % 100 === 7 && col("doc_id") < 5000

    t("build")(PostingsIndex.build(spark, dir, "pprobe_idx", corpusPred))
    println(s"[pprobe] index rows=${spark.table("pprobe_idx").count()} " +
      s"stats=${PostingsIndex.stats(spark, "pprobe_idx")}")

    val bench = graft.Tables.documents(spark, dir).filter(benchPred)
      .select(col("doc_id").as("query_id"), col("text"))
    val qterms = bench.select(col("query_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val queryTerms = t("vocab collect")(
      qterms.select("term").distinct().collect().map(_.getString(0)).toSeq)
    println(s"[pprobe] |query vocab| = ${queryTerms.length}")

    (1 to 2).foreach { i =>
      t(s"slice read (isin literals) #$i")(
        spark.table("pprobe_idx").filter(col("term").isin(queryTerms: _*))
          .select("doc_id", "dl", "term", "tf")
          .write.format("noop").mode("overwrite").save())
    }
    (1 to 2).foreach { i =>
      t(s"slice read (broadcast semi) #$i")(
        spark.table("pprobe_idx")
          .join(broadcast(qterms.select("term").distinct()), Seq("term"),
            "left_semi")
          .select("doc_id", "dl", "term", "tf")
          .write.format("noop").mode("overwrite").save())
    }
    (1 to 2).foreach { i =>
      t(s"recompute postings derivation #$i") {
        val toks = graft.queries.Retrieval.tokenizedDocs(spark, dir)
          .filter(corpusPred)
        toks.select(col("doc_id"), size(col("toks")).as("dl"),
            explode(col("toks")).as("term"))
          .join(broadcast(qterms.select("term").distinct()), Seq("term"))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    // df-source comparison: the OLD probe shape derived df from the
    // pruned slice (a second pruned read + per-term count), the shipped
    // shape reads the persisted (term, df) companion (vocab-sized pruned
    // read + delta sum). Same arithmetic, different I/O.
    (1 to 3).foreach { i =>
      t(s"df from slice (old two-read shape) #$i") {
        val slice = spark.table("pprobe_idx")
          .filter(col("term").isin(queryTerms: _*))
          .select("doc_id", "dl", "term", "tf")
        val (n, s) = PostingsIndex.stats(spark, "pprobe_idx")
        val statsDf = spark.range(1)
          .select(lit(n).as("n_docs"), lit(s).as("sum_dl"))
        graft.queries.Retrieval.scoreTail(qterms, slice, statsDf, 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      t(s"full q134 probe (df companion) #$i")(
        PostingsIndex.topKFor(spark, "pprobe_idx", bench, 5)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
