package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The iterated ingest gate (q126 / Curation.iteratedIngest): planted
  * multi-epoch admissions — every rejection class exercised by name —
  * plus loop ≡ closed-form parity on real data and bloom-sizing
  * independence (the sketch routes, never decides). */
class IteratedIngestSpec extends SparkSpec {

  import spark.implicits._

  private def fps(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "fp")

  test("planted epochs: sealed rejects everywhere, epoch-1 admission " +
      "rejects its epoch-3 twin, in-batch twins keep-first") {
    val sealed0 = Seq("S").toDF("fp")
    val batches = Seq(
      // epoch 1: A admits; S is sealed; B admits once (doc 3 < doc 4)
      fps(1L -> "A", 2L -> "S", 3L -> "B", 4L -> "B"),
      // epoch 2: A now sealed by epoch 1; C admits
      fps(10L -> "A", 11L -> "C"),
      // epoch 3: A (epoch 1), C (epoch 2), S (sealed), B (epoch 1's
      // in-batch winner) all reject; D admits
      fps(20L -> "A", 21L -> "C", 22L -> "S", 23L -> "D", 24L -> "B"))
    val out = Curation.iteratedIngest(sealed0, batches, capacity = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, 1L, "A"), (1L, 3L, "B"), (2L, 11L, "C"), (3L, 23L, "D")))
  }

  test("loop matches the closed form on real data (engine-side oracle twin)") {
    // same decomposition as q126; closed form = globally-first arrival
    // of each unsealed fingerprint, ordered by (epoch, doc_id)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Curation.bowFingerprint.as("fp"))
    val sealed0 = docs.filter(col("doc_id") % 10 === 7).select("fp")
    val rest = docs.filter(col("doc_id") % 10 =!= 7)
    val batches = (0 until 3).map(k => rest.filter(col("doc_id") % 3 === k))
    val loop = Curation.iteratedIngest(sealed0, batches,
        capacity = docs.count())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val w = Window.partitionBy("fp").orderBy("epoch", "doc_id")
    val closed = rest.withColumn("epoch", col("doc_id") % 3 + 1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(sealed0.distinct(), Seq("fp"), "left_anti")
      .select(col("epoch"), col("doc_id"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(loop == closed)
    assert(loop.nonEmpty)
  }

  test("bloom sizing cannot change the output — an undersized filter " +
      "only routes more rows to the exact join") {
    val sealed0 = Seq("S").toDF("fp")
    val batches = Seq(
      fps(1L -> "A", 2L -> "S", 3L -> "B"),
      fps(10L -> "A", 11L -> "C", 12L -> "B"))
    def run(capacity: Long) =
      Curation.iteratedIngest(sealed0, batches, capacity)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // capacity = 1: near-every probe is a (false) positive -> exact join
    assert(run(1L) == run(1000L))
  }
}
