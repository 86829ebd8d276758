package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-20 compiled SimHash kernels bit-equal to the
  * interpreted higher-order spellings they replace — the hash-stability
  * contract of q31 (64-bit word-shingle SimHash) and q92 (128-bit media
  * pHash), whose oracles rebuild the same fingerprints in DuckDB. */
class SimHashKernelSpec extends SparkSpec {

  test("simhash_fp32 == interpreted vote fold on md5 streams, " +
      "boundary nibbles and degenerate inputs included") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val rows = Seq(
      // real-shaped md5 streams (32 hex chars)
      (1L, Seq("0123456789abcdef0123456789abcdef",
        "fedcba9876543210fedcba9876543210",
        "88888888888888888888888888888888")),
      // the vote boundary: '7' < '8' <= '9' < 'a'
      (2L, Seq("77777777777777777777777777777777",
        "99999999999999999999999999999999",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")),
      // tie votes (equal +1/-1 counts) must render '0' in both spellings
      (3L, Seq("00000000000000000000000000000000",
        "ffffffffffffffffffffffffffffffff")),
      // empty array: seed fingerprint (all votes 0 -> all '0')
      (4L, Seq.empty[String]),
      // shorter-than-32 hash: substr past the end is '' -> -1 vote
      (5L, Seq("abc", "8")),
      (6L, Seq("f0e1d2c3b4a5968778695a4b3c2d1e0f"))
    ).toDF("g", "hs")
    val got = rows.select(col("g"),
      call_function("simhash_fp32", col("hs")).as("fp"))
    val want = rows.select(col("g"),
      graft.queries.Dedup.simhashFp32Interp(col("hs")).as("fp"))
    val g = got.orderBy("g").collect().map(r => (r.getLong(0), r.getString(1)))
    val w = want.orderBy("g").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(g.sameElements(w), s"${g.toSeq} vs ${w.toSeq}")
    assert(g.forall(_._2.length == 32))
  }

  test("hamming_bits == interpreted substr-compare fold, including " +
      "length mismatches and positions past both ends") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val rows = Seq(
      (1L, "0101010101010101", "0101010101010101"), // equal
      (2L, "0101010101010101", "1010101010101010"), // all 16 differ
      (3L, "0000000000000000", "0000000000000001"), // last bit
      (4L, "01010101", "0101010101010101"),         // a shorter: 8 tail mismatches
      (5L, "", "11"),                               // empty vs short
      (6L, "", "")                                  // both empty: 0
    ).toDF("g", "a", "b")
    for (nBits <- Seq(8, 16, 64)) {
      val got = rows.select(col("g"),
        call_function("hamming_bits", col("a"), col("b"), lit(nBits)).as("h"))
      val want = rows.select(col("g"),
        graft.queries.Dedup.hammingBitsInterp(col("a"), col("b"), nBits).as("h"))
      val g = got.orderBy("g").collect().map(r => (r.getLong(0), r.getInt(1)))
      val w = want.orderBy("g").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(g.sameElements(w), s"nBits=$nBits: ${g.toSeq} vs ${w.toSeq}")
    }
  }

  test("kernel == interpreted over the real corpus fingerprint pass " +
      "(q31's shingle-md5 streams at sf0.001)") {
    GraftExtensions.install(spark)
    val hs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("transform(word_shingles(text, 3, true), sh -> md5(sh))").as("hs"),
        expr("transform(word_shingles(text, 3, true), " +
          "sh -> md5(concat('b:', sh)))").as("hs2"))
    val both = hs.select(col("doc_id"),
      concat(call_function("simhash_fp32", col("hs")),
        call_function("simhash_fp32", col("hs2"))).as("k"),
      concat(graft.queries.Dedup.simhashFp32Interp(col("hs")),
        graft.queries.Dedup.simhashFp32Interp(col("hs2"))).as("i"))
    assert(both.filter(col("k") =!= col("i")).isEmpty,
      "kernel fingerprint diverged from the interpreted spelling")
    // and the verify kernel agrees on every fingerprint pair of a
    // bounded sample cross
    val fps = both.select(col("doc_id"), col("k")).limit(30)
    val pairs = fps.as("a").crossJoin(fps.as("b"))
      .select(
        call_function("hamming_bits",
          col("a.k"), col("b.k"), lit(64)).as("hk"),
        graft.queries.Dedup.hammingBitsInterp(
          col("a.k"), col("b.k"), 64).as("hi"))
    assert(pairs.filter(col("hk") =!= col("hi")).isEmpty,
      "kernel hamming diverged from the interpreted spelling")
  }

  test("kernels run compiled in whole-stage codegen (no fallback)") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val df = Seq((Seq("0123456789abcdef0123456789abcdef"),
      "0101", "1010")).toDF("hs", "a", "b")
      .select(call_function("simhash_fp32", col("hs")).as("fp"),
        call_function("hamming_bits", col("a"), col("b"), lit(4)).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    val row = df.collect().head
    assert(row.getString(0).length == 32 && row.getInt(1) == 4)
  }
}
