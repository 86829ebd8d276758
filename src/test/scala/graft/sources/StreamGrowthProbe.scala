package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CurationChain

/** Dev-only: the BETWEEN-BATCH probe cost curve under streaming index
  * growth — the evidence leg CompactionProbe's end-state numbers
  * (fragmented once vs compacted once) cannot show: how q134-style
  * probe latency evolves ACROSS a 20-epoch streamed ingest, with and
  * without curatedIndexed's file-count compaction trigger. Run each
  * variant in its OWN JVM (the session-order JIT bias rule):
  *
  *   sbt "Test/runMain graft.sources.StreamGrowthProbe <dir> none"
  *   sbt "Test/runMain graft.sources.StreamGrowthProbe <dir> trigger [threshold]"
  *
  * The stream carries the q134 collection (everything outside the
  * benchmark slice) in 20 epoch batches; after every epoch the probe
  * (the FIXED benchmark, the recurring-decontam shape) is timed twice
  * and the min recorded, beside the pair's data-file count. Sources are
  * synthesized at one per ~20 docs so the chain's per-source quota
  * (Cap = 20) never rejects — the subject here is maintenance, not
  * gating. */
object StreamGrowthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("none")
    val threshold = args.lift(2).map(_.toInt).getOrElse(1200)
    val epochs = 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val T0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val benchPred = col("doc_id") % 100 === 7 && col("doc_id") < 5000
    val corpusPred = col("doc_id") % 100 =!= 7 || col("doc_id") >= 5000
    val table = "sgprobe_idx"
    val compactAbove = if (mode == "trigger") threshold else 0

    // the corpus rides the stream: one driver collect, epoch-sliced
    val corpus = graft.Tables.documents(spark, dir).filter(corpusPred)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    println(s"[sgprobe] mode=$mode threshold=$compactAbove " +
      s"corpus=${corpus.length} epochs=$epochs")

    PostingsIndex.build(spark, dir, table, corpusPred = lit(false))
    val bench = graft.Tables.documents(spark, dir).filter(benchPred)
      .select(col("doc_id").as("query_id"), col("text"))
      .localCheckpoint(true)

    def pairFiles(): Int =
      Bucketing.dataFileCount(spark, table) +
        Bucketing.dataFileCount(spark, PostingsIndex.dfTableOf(table))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "source", "text")
    val q = CurationChain.curatedIndexed(docs, table,
      compactAboveFiles = compactAbove).start()
    try (0 until epochs).foreach { k =>
      input.addData(corpus.filter(_._1 % epochs == k)
        .map(r => (r._1, T0, s"s${r._1 / 20}", r._2)): _*)
      val tIngest0 = System.nanoTime()
      q.processAllAvailable()
      val ingestS = (System.nanoTime() - tIngest0) / 1e9
      val probeS = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        PostingsIndex.topKFor(spark, table, bench, 5)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[sgprobe] epoch=${k + 1}%2d files=${pairFiles()}%5d " +
        f"ingest=${ingestS}%5.2f probe=${probeS}%5.2f")
    } finally q.stop()
    spark.stop()
  }
}
