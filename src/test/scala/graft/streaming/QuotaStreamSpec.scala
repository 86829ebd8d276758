package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming domain quotas: one-batch parity with batch q91's kept set,
  * cross-batch quota persistence, and per-domain decision accounting. */
class QuotaStreamSpec extends SparkSpec {

  private def docs: Seq[(Long, Long, Long)] =
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        floor(sqrt((col("doc_id") % 10000).cast("double"))).cast("long"),
        col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def run(name: String, batches: Seq[Seq[(Long, Long, Long)]])
      : Map[Long, (Long, Long, Long, Boolean, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val query = QuotaStream.capped(
        input.toDF().toDF("doc_id", "domain", "n_chars"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    query.stop()
    spark.table(name).collect().map { r =>
      r.getLong(0) -> (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5))
    }.toMap
  }

  test("one-batch arrival reproduces batch q91's kept set") {
    val all = docs
    val got = run("quota_one", Seq(all))
    // batch q91 semantics: top-Cap per domain by (n_chars desc, doc_id)
    val expectKept = all.groupBy(_._2).flatMap { case (_, ds) =>
      ds.sortBy(d => (-d._3, d._1)).take(QuotaStream.Cap.toInt).map(_._1)
    }.toSet
    assert(got.size == all.size, "every document gets a decision row")
    all.foreach { case (id, _, _) =>
      assert(got(id)._4 == expectKept.contains(id),
        s"doc $id kept=${got(id)._4}, batch q91 says ${expectKept.contains(id)}")
    }
    // accounting: per domain, admitted_after tops out at min(cap, n_docs)
    got.values.groupBy(_._2).foreach { case (_, rows) =>
      val n = rows.size.toLong
      assert(rows.map(_._5).max == math.min(QuotaStream.Cap, n))
      assert(rows.map(_._6).max == n)
    }
  }

  test("the quota binds ACROSS micro-batches (state persists)") {
    // one domain, cap 20: batch 1 brings 15 docs, batch 2 brings 15 more
    // -> only 5 of batch 2 admitted, and they are batch 2's largest
    val b1 = (1L to 15L).map(i => (i, 7L, 100L + i))
    val b2 = (16L to 30L).map(i => (i, 7L, 200L + i))
    val got = run("quota_cross", Seq(b1, b2))
    assert(b1.forall(d => got(d._1)._4), "first batch fits the quota")
    val keptB2 = b2.filter(d => got(d._1)._4).map(_._1).toSet
    // batch 2 is ranked within itself: its 5 largest (ids 26..30) admit
    assert(keptB2 == Set(26L, 27L, 28L, 29L, 30L), s"got $keptB2")
    // batch 2 ranks largest-first, so doc 30 decides FIRST (admitted 16)
    // and doc 26 is the one that saturates the quota
    assert(got(30L)._5 == 16L)
    assert(got(26L)._5 == 20L, "admitted counter saturates at the cap")
    assert(got.values.filter(_._2 == 7L).map(_._5).max == 20L)
    assert(got.values.filter(_._2 == 7L).map(_._6).max == 30L)
  }

  test("a replayed batch reproduces identical decisions (purity)") {
    val b = (1L to 25L).map(i => (i, 3L, 50L + (i % 7)))
    val first = run("quota_replay_a", Seq(b))
    val second = run("quota_replay_b", Seq(b))
    assert(first == second)
  }
}
