package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only round-20 probe: sub-stage timing of the q134-shaped postings
  * probe against an existing memo store. Args: <dir>. */
object R20StageProbe {
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
      println(f"[r20stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val bench = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
      .select(col("doc_id").as("query_id"), col("text"))

    for (tag <- Seq("decontam", "deldecontam")) {
      val table = graft.sources.PostingsIndex.ensureFor(spark, dir, tag = tag,
        corpusPred = col("doc_id") % 100 =!= 7 || col("doc_id") >= 5000)
      println(s"== store $table")
      // warm
      noop(graft.sources.PostingsIndex.topKFor(spark, table, bench, 5))
      val qterms = bench.select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      val qvocab = qterms.select("term").distinct().localCheckpoint(true)
      println(s"[r20stage] $tag qvocab=${qvocab.count()}")
      val slice = spark.table(table).join(broadcast(qvocab), Seq("term"))
        .select("doc_id", "dl", "term", "tf")
      t(s"$tag slice.noop")(noop(slice))
      println(s"[r20stage] $tag slice rows=${slice.count()}")
      val dfreq = spark.table(table + "_df").join(broadcast(qvocab), Seq("term"))
        .groupBy("term").agg(sum(col("df")).as("df"))
      t(s"$tag dfreq.noop")(noop(dfreq))
      (1 to 2).foreach { i =>
        t(s"$tag topKFor.noop pass$i")(
          noop(graft.sources.PostingsIndex.topKFor(spark, table, bench, 5)))
      }
    }
    spark.stop()
  }
}
