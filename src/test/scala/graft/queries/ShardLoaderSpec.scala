package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The shard-export LOOP closed: export the q124 train split as q90's
  * hive layout, read it back through the loader (Curation.readShards),
  * and prove the loader-side epoch schedule is identical to the one
  * computed on the pre-export frame — plus the repeats-honoring
  * schedule the store's `repeats` column exists for. */
class ShardLoaderSpec extends SparkSpec {

  private lazy val st = CurationPipeline.stages(spark, sfDir)
  private lazy val train = st.split.filter(col("split") === "train")
    .select("doc_id", "source", "text", "repeats")
  private lazy val shardDir = {
    val d = java.nio.file.Files.createTempDirectory("trainshards").toString
    CurationPipeline.exportTrainShards(st, d)
    d
  }

  test("export -> read round-trips every train row and its repeats") {
    val back = Curation.readShards(spark, shardDir)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "text", "repeats").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
    val wrote = key(train)
    assert(wrote.nonEmpty)
    assert(key(back) == wrote)
    // the shard each row landed in is q90's assignment arithmetic,
    // recomputed on the exported frame
    val w = Window.partitionBy("source").orderBy("doc_id")
    val expect = train
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("shard", floor((col("cum") - col("n_tok")) / 2048L))
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = back.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("loader-side epoch shuffle == schedule computed before export") {
    def sched(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochShuffleOn(df, "epoch3", shards = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val after = sched(Curation.readShards(spark, shardDir))
    assert(after == sched(train))
    assert(after.nonEmpty)
  }

  test("q102 is the kernel applied to the documents table (unchanged)") {
    val direct = Sampling.epochShuffleOn(
        graft.Tables.documents(spark, sfDir), "epoch1", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val q102 = graft.SparkEntry.queries("q102_epoch_shuffle")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct == q102)
  }

  test("repeats-honoring schedule: sum(repeats) instances, 0-repeat docs " +
      "absent, bit-reproducible, instances spread by independent hashes") {
    val back = Curation.readShards(spark, shardDir)
    val sched = Sampling.epochScheduleOn(back, "epoch1", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val repeats = back.select("doc_id", "repeats").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sched.length.toLong == repeats.values.sum,
      "every positive repeat schedules exactly once")
    assert(sched.groupBy(_._1).forall { case (id, rows) =>
      rows.map(_._2).sorted.toSeq == (1L to repeats(id))
    }, "instances are exactly 1..repeats per doc")
    repeats.filter(_._2 == 0L).keys.foreach(id =>
      assert(!sched.exists(_._1 == id), s"0-repeat doc $id scheduled"))
    // reproducible: same epoch key -> same permutation
    val again = Sampling.epochScheduleOn(back, "epoch1", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sched.toSet == again.toSet)
    // positions within each shard are a contiguous 1..n ranking
    sched.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a multi-epoch-tier doc's instances actually spread: at least one
    // doc with repeats >= 2 lands its instances in >1 shard
    val multi = sched.groupBy(_._1).filter(_._2.length >= 2)
    assert(multi.nonEmpty && multi.exists(_._2.map(_._3).distinct.length > 1))
  }
}
