package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only round-20 probe: isolates the ordered-fold aggregation cost in
  * the BM25 scoring tail (q127/q133/q134 family). Args: <dir>. */
object R20FoldProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[r20fold] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val bench = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
      .select(col("doc_id").as("query_id"), col("text"))
    val table = graft.sources.PostingsIndex.ensureFor(spark, dir,
      tag = "decontam",
      corpusPred = col("doc_id") % 100 =!= 7 || col("doc_id") >= 5000)
    val qterms = bench.select(col("query_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val qvocab = qterms.select("term").distinct().localCheckpoint(true)
    val slice = spark.table(table).join(broadcast(qvocab), Seq("term"))
      .select("doc_id", "dl", "term", "tf")
    val dfreq = spark.table(table + "_df").join(broadcast(qvocab), Seq("term"))
      .groupBy("term").agg(sum(col("df")).as("df"))
    val (n, s) = graft.sources.PostingsIndex.stats(spark, table)
    val statsDf = spark.range(1)
      .select(lit(n).as("n_docs"), lit(s).as("sum_dl"))
    val qvocabIdf = dfreq.crossJoin(broadcast(statsDf))
      .withColumn("x",
        lit(1.0) + ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("idf", DetMath.lnCol(col("x")))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .select("term", "idf", "avgdl")
    val contrib = col("idf") * (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
    val scored = slice
      .join(broadcast(qvocabIdf), Seq("term"))
      .select(col("doc_id"), col("term"), contrib.as("c"))
    val paired = broadcast(qterms.as("q"))
      .join(scored.as("p"),
        col("p.term") === col("q.term") && col("p.doc_id") =!= col("q.query_id"))
      .select(col("q.query_id"), col("p.doc_id"), col("q.term"), col("p.c"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))

    t("pairs.noop")(noop(paired))
    println(s"[r20fold] pair rows=${paired.count()}")
    (1 to 2).foreach { i =>
      t(s"agg+fold+window pass$i")(noop(
        paired.groupBy("query_id", "doc_id")
          .agg(
            aggregate(
              array_sort(collect_list(struct(col("term"), col("c")))),
              lit(0.0), (acc, x) => acc + x.getField("c")).as("score"),
            count(lit(1)).as("n_terms"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)))
      t(s"agg+plainsum+window pass$i")(noop(
        paired.groupBy("query_id", "doc_id")
          .agg(sum(col("c")).as("score"), count(lit(1)).as("n_terms"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)))
      t(s"agg+collectonly+window pass$i")(noop(
        paired.groupBy("query_id", "doc_id")
          .agg(
            size(array_sort(collect_list(struct(col("term"), col("c")))))
              .cast("double").as("score"),
            count(lit(1)).as("n_terms"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)))
    }
    spark.stop()
  }
}
