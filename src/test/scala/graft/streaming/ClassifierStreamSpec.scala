package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** ClassifierStream (train batch, score stream) parity and contract:
  * the fused literal-weights expression scores a stream to EXACTLY
  * batch q131's margins, plan-native in append mode with zero state,
  * invariant to micro-batch slicing. */
class ClassifierStreamSpec extends SparkSpec {

  private lazy val weights = {
    val db = graft.queries.Text.perceptronDb(spark,
      Tables.documents(spark, sfDir))
    graft.queries.Text.perceptronTrain(db)
  }

  private lazy val batchByDoc: Map[Long, (Long, Long)] =
    SparkEntry.queries("q131_classifier_train")(spark, sfDir)
      .select("doc_id", "margin", "predicted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def streamVerdicts(nSlices: Int): Map[Long, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    // append mode with NO foreachBatch: verdicts() is a narrow map, so
    // the scored stream is itself a valid append-mode streaming frame
    val scored = ClassifierStream.verdicts(
      in.toDF().toDF("doc_id", "text"), weights)
    val q = scored.writeStream.format("memory")
      .queryName(s"clf_stream_$nSlices").outputMode("append").start()
    val slice = math.max(1, rows.size / nSlices)
    rows.grouped(slice).foreach { g => in.addData(g); q.processAllAvailable() }
    q.stop()
    val got = spark.table(s"clf_stream_$nSlices").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got
  }

  test("stream margins equal batch q131's exactly; short docs score 0/-1; " +
      "slicing-invariant; zero stateful operators in the plan") {
    val oneBatch = streamVerdicts(1)
    val sliced = streamVerdicts(5)
    assert(oneBatch == sliced, "verdicts depend on micro-batch slicing")
    // parity on every doc q131 trains/scores on (>= 2 tokens)
    batchByDoc.foreach { case (id, (margin, pred)) =>
      assert(oneBatch(id) == ((margin, pred)),
        s"doc $id: stream ${oneBatch(id)} vs batch ($margin, $pred)")
    }
    // docs q131 drops from training (< 2 tokens) still stream a verdict:
    // zero bigrams fold to margin 0, predicted -1 (the zero-margin rule)
    val shortIds = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) < 2)
      .select("doc_id").collect().map(_.getLong(0))
    shortIds.foreach(id => assert(oneBatch(id) == ((0L, -1L))))
    assert(oneBatch.size == batchByDoc.size + shortIds.length)
  }

  test("retrain rollover: restarting on the SAME checkpoint with new weights " +
      "resumes offsets (no re-delivery) and applies the new margins from " +
      "the next batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("clfroll").toString
    val seen =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (doc_id, margin)
    def start(weights: Array[Long]) =
      ClassifierStream.verdicts(in.toDF().toDF("doc_id", "text"), weights)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= batch.select("doc_id", "margin").collect()
              .map(r => (r.getLong(0), r.getLong(1)))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    // closed-form weight vectors: margin = w × (n_tokens − 1) bigrams
    val wOld = Array.fill(256)(1L)
    val wNew = Array.fill(256)(3L)
    val q1 = start(wOld)
    in.addData((1L, "a b c"), (2L, "d e f g"))
    q1.processAllAvailable(); q1.stop()
    // the rollover: same checkpoint, new literal — the scaladoc's
    // "restart the query" contract; checkpoints carry only source offsets
    val q2 = start(wNew)
    in.addData((3L, "h i j"))
    q2.processAllAvailable(); q2.stop()
    val byDoc = seen.groupBy(_._1)
    // offsets resumed: batch-1 docs delivered exactly once, under the OLD
    // weights — never re-scored by the restarted query
    assert(byDoc(1L).toSeq == Seq((1L, 2L)) && byDoc(2L).toSeq == Seq((2L, 3L)),
      s"pre-rollover docs must score once with the old weights: $seen")
    // the new literal applies from the first post-restart batch
    assert(byDoc(3L).toSeq == Seq((3L, 6L)),
      s"post-rollover doc must score with the new weights: $seen")
    assert(seen.size == 3, s"re-delivery after restart: $seen")
  }

  test("the scoring plan is a stateless narrow map: no state store, no exchange") {
    import spark.implicits._
    // verdicts() is source-agnostic — the batch twin resolves the same
    // operator tree the streaming runtime executes per micro-batch, so
    // its physical plan IS the per-batch plan: no aggregate, no join, no
    // exchange, and therefore nothing for streaming to put in a state
    // store (the append-mode start in the parity test proves the runtime
    // agrees — a stateful op would fail or add a watermark requirement)
    val twin = ClassifierStream.verdicts(
      Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text"), weights)
    val s = twin.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange") && !s.contains("Join") &&
      !s.contains("StateStore") && !s.contains("HashAggregate"),
      s"scoring must be a narrow map:\n$s")
  }
}
