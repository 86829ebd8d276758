package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Streaming mixture sampling: bit-exact parity with batch q56 when the
  * corpus arrives in one batch, incremental rate evolution across
  * batches, and replay-safe absorption. */
class MixStreamSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_tok"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
  }

  private def runBatches(batches: Seq[Seq[(Long, String, Long)]])
      : mutable.Buffer[(Long, Array[Row])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val emitted = mutable.Buffer.empty[(Long, Array[Row])]
    val query = MixStream.writer(
        input.toDF().toDF("doc_id", "source", "n_tok")) { (df, id) =>
        emitted += id -> df.collect()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    emitted
  }

  test("one-batch arrival reproduces batch q56 bit-exactly, rate included") {
    val emitted = runBatches(Seq(corpus()))
    assert(emitted.size == 1)
    val streamed = emitted.head._2
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = SparkEntry.queries("q56_mixture_sample")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch,
      s"streamed/batch mismatch: only-streamed=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("multi-batch rates evolve with cumulative counts and gate deterministically") {
    val docs = corpus()
    val batches = docs.grouped((docs.size + 2) / 3).toSeq
    val emitted = runBatches(batches)
    assert(emitted.size == batches.size)
    // replicate the contract in the test: thresholds from counts
    // INCLUDING the current batch, q56's md5 gate per doc
    var tok = Map.empty[String, Long]
    batches.zip(emitted).foreach { case (b, (_, rows)) =>
      b.foreach { case (_, s, n) => tok += s -> (tok.getOrElse(s, 0L) + n) }
      val thr = MixStream.thresholds(tok)
      val expect = b.flatMap { case (docId, s, n) =>
        val (rate, t) = thr(s)
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"mix:$docId".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val u = h.take(8).foldLeft(0L)((acc, c) =>
          acc * 16 + (if (c <= '9') c - '0' else c - 'a' + 10))
        if (u < t) Some((docId, s, n, rate)) else None
      }.toSet
      val got = rows
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == expect,
        s"batch mismatch: only-got=${(got -- expect).take(3)} " +
          s"only-expected=${(expect -- got).take(3)}")
    }
  }

  test("a zero-token stream takes Spark's least(1.0, NaN) = 1.0 branch, not JVM NaN") {
    val thr = MixStream.thresholds(Map("empty" -> 0L, "real" -> 100L))
    assert(thr("empty")._1 == 1.0 && thr("empty")._2 == 4294967296L)
    assert(!thr("real")._1.isNaN)
  }

  test("absorption is batchId-idempotent (replay does not double-count)") {
    val st = new MixStream.MixState
    st.absorb(0L, Map("a" -> 10L, "b" -> 5L))
    st.absorb(0L, Map("a" -> 10L, "b" -> 5L)) // replayed batch
    assert(st.totals == Map("a" -> 10L, "b" -> 5L))
    st.absorb(1L, Map("a" -> 1L))
    assert(st.totals == Map("a" -> 11L, "b" -> 5L))
  }

  test("snapshot/restore round-trips; an incompatible snapshot fails with the engine's message") {
    val st = new MixStream.MixState
    st.absorb(0L, Map("a" -> 10L, "b" -> 5L))
    val snap = st.snapshot
    assert(snap == MixStream.MixSnapshot(
      MixStream.StateVersion, 0L, Map("a" -> 10L, "b" -> 5L)))

    // restore resumes batchId idempotency AND totals
    val st2 = MixStream.MixState.restore(snap)
    st2.absorb(0L, Map("a" -> 10L, "b" -> 5L)) // replay of absorbed batch
    assert(st2.totals == Map("a" -> 10L, "b" -> 5L))
    st2.absorb(1L, Map("a" -> 1L))
    assert(st2.totals == Map("a" -> 11L, "b" -> 5L))

    val e = intercept[IllegalStateException] {
      MixStream.MixState.restore(snap.copy(version = 99))
    }
    assert(e.getMessage.contains("schema v99"), e.getMessage)
    assert(e.getMessage.contains("incompatible version"), e.getMessage)
  }
}
