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

  test("save/load between runs: a resumed loop admits exactly what the " +
      "uninterrupted loop admits (cross-RUN dedup, no sealed re-derive)") {
    val sealed0 = Seq("S").toDF("fp")
    val b1 = fps(1L -> "A", 2L -> "S", 3L -> "B")
    val b2 = fps(10L -> "A", 11L -> "C")
    val b3 = fps(20L -> "A", 21L -> "C", 22L -> "B", 23L -> "D")

    // run 1: epochs 1-2, then persist the state
    val dir = java.nio.file.Files.createTempDirectory("ingeststate").toString
    var st = Curation.ingestStateOf(sealed0, capacity = 100L)
    val (a1, st1) = Curation.ingestEpoch(st, b1)
    val (a2, st2) = Curation.ingestEpoch(st1, b2)
    Curation.saveIngestState(st2, dir)

    // run 2 (fresh state object from disk): epoch 3
    val resumed = Curation.loadIngestState(spark, dir)
    val (a3, _) = Curation.ingestEpoch(resumed, b3)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 23 ("D") is the only novel fingerprint in epoch 3: A/B sealed
    // by run 1's epoch 1 (ACROSS the save/load), C by its epoch 2
    assert(ids(a1) == Set(1L, 3L) && ids(a2) == Set(11L))
    assert(ids(a3) == Set(23L))
    // and the resumed loop's union equals the uninterrupted loop
    val direct = Curation.iteratedIngest(sealed0, Seq(b1, b2, b3), 100L)
    assert(ids(direct) == ids(a1) ++ ids(a2) ++ ids(a3))
  }

  test("stored sealed set (the bucketed production spelling): epochs " +
      "append O(admitted) rows, admissions equal the in-memory loop, and " +
      "the sealed side of the anti-join never exchanges") {
    val sealed0 = Seq("S").toDF("fp")
    val b1 = fps(1L -> "A", 2L -> "S", 3L -> "B", 4L -> "B")
    val b2 = fps(10L -> "A", 11L -> "C")
    val b3 = fps(20L -> "A", 21L -> "C", 22L -> "S", 23L -> "D", 24L -> "B")

    Curation.sealStore("sealed_store", sealed0, buckets = 8)
    val bloom = sealed0.select(xxhash64(col("fp")).as("h"))
      .stat.bloomFilter("h", 100L, 0.01)
    def ids(df: DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val a1 = ids(Curation.ingestEpochStored("sealed_store", b1, bloom, 100L))
    val a2 = ids(Curation.ingestEpochStored("sealed_store", b2, bloom, 100L))
    val a3 = ids(Curation.ingestEpochStored("sealed_store", b3, bloom, 100L))
    // same admissions as the planted in-memory loop above
    assert(a1 == Set(1L, 3L) && a2 == Set(11L) && a3 == Set(23L),
      s"stored-epoch admissions diverge: $a1 / $a2 / $a3")
    // the store accumulated exactly sealed0 + every admitted fp
    spark.catalog.refreshTable("sealed_store")
    assert(spark.table("sealed_store").collect().map(_.getString(0))
      .sorted.toSeq == Seq("A", "B", "C", "D", "S"))

    // plan pin: the sealed side reads its bucket layout shuffle-free.
    // At spec scale the tiny sealed side would broadcast (hiding the
    // layout question entirely), so pin the AT-SCALE shape: broadcast
    // off, shuffle partitions = bucket count — the sort-merge anti-join
    // then consumes the store's pre-hashed scan directly (one exchange
    // total: the batch's keep-first window), where an unbucketed sealed
    // frame pays its own exchange (two).
    val (bcast0, parts0) = (
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.shuffle.partitions"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      def exchanges(sealedFps: DataFrame): Int =
        "Exchange hashpartitioning".r.findAllIn(
          Curation.epochAdmit(b3, sealedFps, bloom)
            .queryExecution.executedPlan.toString).length
      val stored = exchanges(spark.table("sealed_store"))
      val unbucketed = exchanges(
        spark.table("sealed_store").collect().map(_.getString(0)).toSeq
          .toDF("fp"))
      assert(stored < unbucketed,
        s"bucketed sealed store must skip its exchange: stored=$stored unbucketed=$unbucketed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast0)
      spark.conf.set("spark.sql.shuffle.partitions", parts0)
    }
  }

  test("saving into the SAME state dir a loaded state reads from does " +
      "not destroy its own input (the production run-over-run cycle)") {
    val dir = java.nio.file.Files.createTempDirectory("ingestcycle").toString
    val st0 = Curation.ingestStateOf(Seq("S").toDF("fp"), capacity = 100L)
    val (_, st1) = Curation.ingestEpoch(st0, fps(1L -> "A", 2L -> "B"))
    Curation.saveIngestState(st1, dir)
    // run 2: load from dir, advance, save BACK INTO dir (lazy sealedFps
    // reads the very parquet the save overwrites)
    val r2 = Curation.loadIngestState(spark, dir)
    val (a2, st2) = Curation.ingestEpoch(r2, fps(10L -> "A", 11L -> "C"))
    Curation.saveIngestState(st2, dir)
    // run 3 sees the full sealed set: S, A, B, C all reject
    val r3 = Curation.loadIngestState(spark, dir)
    assert(r3.sealedFps.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("A", "B", "C", "S"))
    val (a3, _) = Curation.ingestEpoch(r3,
      fps(20L -> "A", 21L -> "B", 22L -> "C", 23L -> "S", 24L -> "E"))
    assert(a2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(11L))
    assert(a3.select("doc_id").collect().map(_.getLong(0)).toSet == Set(24L))
  }

  test("unsealStore re-opens the gate for purged content — and the SAME " +
      "bloom keeps working (a stale positive routes to the exact check, " +
      "which now admits; no rebuild needed by construction)") {
    val sealed0 = Seq("S", "T").toDF("fp")
    Curation.sealStore("unseal_store", sealed0, buckets = 8)
    val bloom = sealed0.select(xxhash64(col("fp")).as("h"))
      .stat.bloomFilter("h", 100L, 0.01)
    def ids(df: DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // sealed content is rejected (the bloom positive -> exact hit)
    assert(ids(Curation.ingestEpochStored("unseal_store",
      fps(1L -> "S", 2L -> "A"), bloom, 100L)) == Set(2L))
    // unseal "S": purge it from the store; the bloom still says "maybe"
    Curation.unsealStore("unseal_store", Seq("S").toDF("fp"))
    spark.catalog.refreshTable("unseal_store")
    assert(!spark.table("unseal_store").collect()
      .map(_.getString(0)).contains("S"), "unseal left the fp sealed")
    // the SAME bloom re-admits the same content: the stale positive
    // routes to the exact anti-join, which finds nothing
    assert(ids(Curation.ingestEpochStored("unseal_store",
      fps(10L -> "S", 11L -> "T"), bloom, 100L)) == Set(10L),
      "unsealed content must re-admit through the unchanged bloom")
    // and the re-admission re-sealed it: a second arrival rejects again
    assert(ids(Curation.ingestEpochStored("unseal_store",
      fps(20L -> "S"), bloom, 100L)) == Set.empty,
      "re-admitted content must be sealed again")
    // idempotent on absent fps (the deleteByKey contract)
    Curation.unsealStore("unseal_store", Seq("NEVER").toDF("fp"))
  }
}
