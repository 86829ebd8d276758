package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stage-boundary contracts of the q124 end-to-end curation composite —
  * the invariants that only the COMPOSED pipeline can break (each stage
  * is oracle-checked alone; these pin the seams between them):
  * doc/token conservation at every boundary, dedup idempotence and
  * completeness over the survivors, decontamination completeness,
  * benchmark isolation, split leakage-freedom (q105's invariant), and
  * q53 packing token conservation on the final train split. */
class CurationPipelineSpec extends SparkSpec {

  private lazy val st = CurationPipeline.stages(spark, sfDir)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def toks(df: DataFrame): Long =
    df.agg(coalesce(sum("n_tok"), lit(0L))).head().getLong(0)

  test("every stage's survivors are a subset of the previous stage's") {
    val chain = Seq(st.arriving, st.admitted, st.scored, st.exactKept,
      st.fuzzyKept, st.clean, st.capped, st.split)
    chain.sliding(2).foreach { case Seq(prev, next) =>
      val p = ids(prev); val n = ids(next)
      assert(n.subsetOf(p), s"stage emitted docs not in its input: ${n -- p}")
    }
  }

  test("doc and token conservation at each boundary (in = kept + independently-counted dropped)") {
    // gate: arriving splits exactly into admitted + fp-hit
    val sealedFps = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 7)
      .select(Curation.bowFingerprint.as("fp"))
    val gateDropped = st.arriving
      .withColumn("fp", Curation.bowFingerprint)
      .join(sealedFps, Seq("fp"), "left_semi")
    assert(st.arriving.count() == st.admitted.count() + gateDropped.count())
    assert(toks(st.arriving) == toks(st.admitted) + toks(gateDropped))
    // decontam: fuzzy_kept splits exactly into clean + contaminated
    val contaminatedKept = st.fuzzyKept
      .join(st.contaminated, Seq("doc_id"), "left_semi")
    assert(st.fuzzyKept.count() == st.clean.count() + contaminatedKept.count())
    assert(toks(st.fuzzyKept) == toks(st.clean) + toks(contaminatedKept))
  }

  test("exact dedup is complete and idempotent over its survivors") {
    val dupGroups = st.exactKept.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    assert(dupGroups.isEmpty, "surviving docs still share content hashes")
    // applying the stage again changes nothing
    val w = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val again = st.exactKept.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(again.count() == st.exactKept.count())
  }

  test("fuzzy sweep is complete: no verified near-dup pair survives it") {
    val residual = Dedup
      .minhashPairsOn(spark, st.fuzzyKept.select("doc_id", "text"))
    assert(residual.isEmpty,
      s"near-dup pairs among fuzzy survivors: ${residual.collect().mkString(",")}")
  }

  test("decontamination is complete: clean docs share no 8-gram with the benchmark") {
    val bench = Dedup.gram8On(spark, graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 20 === 7)).select("gram").distinct()
    assert(Dedup.gram8On(spark, st.clean).join(bench, "gram").isEmpty)
  }

  test("benchmark and sealed docs never reach the split output") {
    assert(st.split.filter(col("doc_id") % 10 === 7).isEmpty)
  }

  test("split is leakage-free: one split per fuzzy cluster, deterministic key") {
    val perKey = st.split.groupBy("group_key")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1)
    assert(perKey.isEmpty, "a group_key straddles splits")
    // q105's invariant over the ORIGINAL clusters: every surviving member
    // of a canonical cluster landed in the same split
    val perCluster = st.split.join(st.labels, "doc_id")
      .groupBy("canonical")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1)
    assert(perCluster.isEmpty, "a near-dup cluster straddles splits")
  }

  test("repeat tiers only amplify: effective tokens >= raw tokens, bounded by 4x") {
    val r = st.split
      .agg(sum("n_tok").as("raw"),
        sum(col("n_tok") * col("repeats")).as("eff"))
      .head()
    val (raw, eff) = (r.getLong(0), r.getLong(1))
    assert(eff >= raw && eff <= 4 * raw, s"raw=$raw eff=$eff")
    assert(st.split.filter(!col("repeats").isin(1L, 2L, 4L)).isEmpty)
  }

  test("q53 packing over the train split conserves tokens exactly") {
    val seqLen = 256
    val train = st.split.filter(col("split") === "train")
      .select(col("doc_id"), col("source"), col("n_tok"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    val packed = train
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .withColumn("first_seq", floor(col("start_tok") / seqLen))
      .withColumn("last_seq", floor((col("cum") - 1) / seqLen))
      .select(col("source"), col("start_tok"), col("cum"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq"))
      .groupBy(col("source"), col("seq"))
      .agg(sum(least(col("cum"), (col("seq") + 1) * seqLen) -
        greatest(col("start_tok"), col("seq") * seqLen)).as("n_tok"))
    assert(toks(packed) == toks(train),
      "packing lost or duplicated tokens across sequence boundaries")
    // every sequence except each source's last is exactly full
    val wS = Window.partitionBy("source")
    val short = packed
      .withColumn("maxSeq", max(col("seq")).over(wS))
      .filter(col("seq") < col("maxSeq") && col("n_tok") =!= seqLen)
    assert(short.isEmpty, "a non-final sequence is not exactly full")
  }

  test("train-shard export carries exactly the train split, hive-partitioned, with repeats") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    // the Stages overload: export without re-deriving the pipeline the
    // suite already materialized as `st`
    CurationPipeline.exportTrainShards(st, out, 2048L)
    val back = spark.read.parquet(out)
    val train = st.split.filter(col("split") === "train")
    // exact doc set, one row each, repeats preserved
    val expected = train.select("doc_id", "repeats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = back.select("doc_id", "repeats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "shard store does not match the train split")
    // hive layout: partition columns recovered, every source directory
    // present, shard numbering starts at 0 per source
    assert(back.columns.contains("source") && back.columns.contains("shard"))
    val perSource = back.groupBy("source")
      .agg(min(col("shard")).as("minShard")).collect()
    // partition-column types are inferred on read (int here), so compare
    // through Number rather than pinning the width
    perSource.foreach(r => assert(r.getAs[Number]("minShard").longValue == 0L,
      s"source ${r.getString(0)} shards do not start at 0"))
  }

  test("accounting rows agree with the stage frames they summarize") {
    val acct = CurationPipeline.accounting(spark, sfDir)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(acct("arriving") == ((st.arriving.count(), toks(st.arriving))))
    assert(acct("clean") == ((st.clean.count(), toks(st.clean))))
    val trainN = st.split.filter(col("split") === "train")
    if (trainN.count() > 0)
      assert(acct("split_train") == ((trainN.count(), toks(trainN))))
  }
}
