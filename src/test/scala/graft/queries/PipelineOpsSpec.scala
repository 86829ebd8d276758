package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavioral pins for the corpus-assembly operators added in round 10:
  * q53 sequence packing, q55 Gopher quality filters, q56 mixture
  * sampling. The oracle proves each matches DuckDB bit-for-bit; these
  * pin the pipeline invariants a hash compare can't express.
  */
class PipelineOpsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("q53: packing conserves tokens and fills every non-final sequence") {
    val out = SparkEntry.queries("q53_pack_sequences")(spark, sfDir)
      .collect().toSeq
    // token conservation per source
    val packed = out.groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(3)).sum }
    val expected = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed == expected, s"token totals differ: $packed vs $expected")
    // all but the last sequence of each source hold exactly 256 tokens
    out.groupBy(_.getString(0)).foreach { case (s, rows) =>
      val bySeq = rows.sortBy(_.getLong(1))
      val seqs = bySeq.map(_.getLong(1))
      assert(seqs == (0L until seqs.length.toLong), s"$s: seq ids not contiguous: $seqs")
      assert(bySeq.init.forall(_.getLong(3) == 256L),
        s"$s: non-final sequence under-filled")
      assert(bySeq.last.getLong(3) <= 256L, s"$s: final sequence over-filled")
      assert(rows.forall(_.getLong(2) >= 1L), s"$s: sequence with zero documents")
    }
  }

  test("q55: keep agrees with the emitted metrics; stop-word plant splits the corpus") {
    val out = SparkEntry.queries("q55_gopher_quality")(spark, sfDir).collect()
    out.foreach { r =>
      val (n, mwl, sym, alpha, stop, keep) =
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5), r.getBoolean(6))
      val expect = n >= 50 && n <= 100000 && mwl >= 3.0 && mwl <= 10.0 &&
        sym <= 0.1 && alpha >= 0.8 && stop >= 2
      assert(keep == expect, s"doc ${r.getLong(0)}: keep=$keep but metrics say $expect")
    }
    // planted docs (doc_id % 3 == 0) carry all 8 stop words; others at most 1
    assert(out.filter(r => r.getLong(0) % 3 == 0).forall(_.getInt(5) == 8))
    assert(out.filter(r => r.getLong(0) % 3 != 0).forall(_.getInt(5) <= 1))
    // the filter must actually split the corpus, not rubber-stamp it
    val kept = out.count(_.getBoolean(6))
    assert(kept > 0 && kept < out.length,
      s"degenerate keep distribution: $kept of ${out.length}")
  }

  test("q59: split is exactly stratified — floor(0.8n)/floor(0.9n) cuts per source") {
    val out = SparkEntry.queries("q59_stratified_split")(spark, sfDir).collect()
    assert(out.length == docs.count())
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val n = rows.length
      val train = rows.count(_.getString(2) == "train")
      val valN = rows.count(_.getString(2) == "val")
      val test = rows.count(_.getString(2) == "test")
      assert(train == math.floor(n * 0.8).toLong, s"$src: train $train of $n")
      assert(train + valN == math.floor(n * 0.9).toLong, s"$src: val $valN of $n")
      assert(train + valN + test == n)
    }
    // deterministic: re-running reproduces the same assignment
    val again = SparkEntry.queries("q59_stratified_split")(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q56: temperature rebalancing samples ~20% and up-weights light streams") {
    val out = SparkEntry.queries("q56_mixture_sample")(spark, sfDir).collect()
    val nDocs = docs.count()
    assert(out.length > nDocs * 0.05 && out.length < nDocs * 0.6,
      s"sample of ${out.length} from $nDocs is outside any plausible 20% draw")
    // per-stream acceptance rate must be anti-monotone in stream size:
    // alpha = 0.5 < 1 means heavier streams get LOWER rates
    val tokG = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = out.map(r => r.getString(1) -> r.getDouble(3)).distinct
    assert(rates.map(_._1).distinct.length == rates.length,
      "a stream appeared with two different rates")
    for {
      (s1, r1) <- rates
      (s2, r2) <- rates
      if tokG(s1) < tokG(s2)
    } assert(r1 >= r2,
      s"lighter stream $s1 (${tokG(s1)} toks) got rate $r1 < $s2's $r2")
    assert(rates.forall(_._2 <= 1.0), "acceptance rate above 1")
  }
}
