package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: what fragmentation costs a probe, and what compaction buys
  * back. Builds the postings index as 1 build + 19 appends (simulating
  * 20 ingest epochs), probes fragmented, compacts, probes again.
  * Args: <dir>. */
object CompactionProbe {
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
      println(f"[cprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def files(): Int = {
      val w = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(
        java.nio.file.Paths.get(w.getPath, "cprobe_idx"))) { st =>
        st.iterator.asScala.count(_.toString.endsWith(".parquet"))
      }
    }

    t("build (epoch 0)")(PostingsIndex.build(spark, dir, "cprobe_idx",
      corpusPred = col("doc_id") % 20 === 0))
    (1 until 20).foreach { k =>
      PostingsIndex.append(spark, dir, "cprobe_idx",
        pred = col("doc_id") % 20 === k)
    }
    println(s"[cprobe] fragmented files=${files()}")
    val bench = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
      .select(col("doc_id").as("query_id"), col("text"))
    def probe(label: String): Unit = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        PostingsIndex.topKFor(spark, "cprobe_idx", bench, 5)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cprobe] $label probe min=${samples.min}%.2f med=${samples.sorted.apply(1)}%.2f")
    }
    probe("fragmented (20 epochs)")
    t("compact")(Bucketing.compact(spark, "cprobe_idx"))
    println(s"[cprobe] compacted files=${files()}")
    probe("compacted")
    spark.stop()
  }
}
