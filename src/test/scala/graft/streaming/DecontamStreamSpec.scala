package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** DecontamStream parity with batch q29 and the stateless contract:
  * identical verdicts under any micro-batch slicing, every doc exactly
  * one verdict, short docs clean by definition. */
class DecontamStreamSpec extends SparkSpec {

  private def corpusDocs = Tables.documents(spark, sfDir)
    .filter(col("doc_id") % 20 =!= 7)
    .select("doc_id", "text")

  private lazy val bench = DecontamStream.benchmarkGrams(spark,
    Tables.documents(spark, sfDir).filter(col("doc_id") % 20 === 7))

  private def streamVerdicts(nSlices: Int): Map[Long, (Long, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = corpusDocs.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    val q = DecontamStream.writer(
      in.toDF().toDF("doc_id", "text"), bench) { (verdicts, _) =>
        verdicts.collect().foreach { r =>
          val id = r.getLong(0)
          assert(!got.contains(id), s"doc $id got two verdicts")
          got(id) = (r.getLong(1), r.getBoolean(2))
        }
      }.start()
    val slice = math.max(1, rows.size / nSlices)
    rows.grouped(slice).foreach { g => in.addData(g); q.processAllAvailable() }
    q.stop()
    got.toMap
  }

  test("stream verdicts match batch q29's contaminated set, invariant to slicing") {
    val q29Docs = SparkEntry.queries("q29_decontaminate")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneBatch = streamVerdicts(1)
    val sliced = streamVerdicts(7)
    assert(oneBatch == sliced, "verdicts depend on micro-batch slicing")
    val contaminated = oneBatch.collect { case (id, (_, true)) => id }.toSet
    assert(contaminated == q29Docs,
      s"stream/batch disagree: only-stream=${contaminated -- q29Docs} " +
        s"only-batch=${q29Docs -- contaminated}")
    // every corpus doc got exactly one verdict (one-per-doc pinned in
    // the writer callback); short docs are clean by definition
    assert(oneBatch.size == corpusDocs.count())
    val short = corpusDocs
      .filter(size(split(col("text"), " ")) < 8)
      .collect().map(_.getLong(0))
    short.foreach(id => assert(oneBatch(id) == ((0L, false))))
  }

  test("duplicate deliveries: same-batch copies collapse; cross-batch re-emit the identical verdict") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val doc = corpusDocs.join(
        spark.createDataset(Seq(1L)).toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).head
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val q = DecontamStream.writer(
      in.toDF().toDF("doc_id", "text"), bench) { (v, _) =>
        got ++= v.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      }.start()
    in.addData(Seq(doc, doc)); q.processAllAvailable() // same-batch dup
    in.addData(Seq(doc)); q.processAllAvailable()      // cross-batch redelivery
    q.stop()
    assert(got.size == 2, s"same-batch duplicates must collapse: $got")
    assert(got(0) == got(1), s"re-delivered verdict must be identical: $got")
  }

  test("n_shared counts the doc's distinct grams found anywhere in the benchmark") {
    // recompute independently with plain batch ops over the shared kernel
    val expected = graft.queries.Dedup.gram8On(spark, corpusDocs)
      .join(bench, "gram")
      .groupBy("doc_id").agg(countDistinct("gram").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = streamVerdicts(3)
    expected.foreach { case (id, n) =>
      assert(got(id)._1 == n, s"doc $id: stream ${got(id)._1} vs batch $n")
    }
  }
}
