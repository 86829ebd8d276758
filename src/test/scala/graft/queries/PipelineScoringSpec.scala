package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Semantic checks for the round-12 additions: concurrent intervals (q84),
  * embedding decontamination (q85), hashed linear classifier (q86), vocab
  * coverage (q87). Oracle hash parity is the driver's gate; these pin the
  * algorithmic invariants the hash can't express.
  */
class PipelineScoringSpec extends SparkSpec {

  test("q84 boundary prefix-sum equals the naive interval-expansion join") {
    val fast = SparkEntry.queries("q84_concurrent_intervals")(spark, sfDir)
    val naive = Tables.lineitem(spark, sfDir)
      .select(to_date(col("l_shipdate")).as("ship_day"),
        ((col("l_suppkey") % 20) + 5).cast("int").as("transit_days"))
      .select(explode(expr(
        "sequence(ship_day, date_add(ship_day, transit_days), interval 1 day)"))
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_in_transit"))
      .select(col("day").cast("timestamp").as("day"), col("n_in_transit"))
      .orderBy("day")
    assert(fast.collect().map(_.toString).toSeq ==
      naive.collect().map(_.toString).toSeq)
  }

  test("q84 boundary algebra: generated interval sets match per-day counting") {
    // the fixture data never exercises single-day intervals, fully
    // disjoint ranges, or total-overlap pileups; generate them. Raw
    // ScalaCheck Gens with a fixed-seed sampler (DedupRobustnessSpec
    // convention — the scalatest bridge isn't on the offline classpath).
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(for {
      start <- Gen.choose(0, 60)     // day offset
      len <- Gen.choose(0, 15)       // inclusive transit length; 0 = one day
    } yield (start, len))
    (0 until 8).foreach { i =>
      val ivs = gen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong))
        .get
      val df = ivs.toDF("start", "len")
        .select(expr("date_add(DATE '2020-01-01', start)").as("ship_day"),
          col("len").as("transit_days"))
      // the PRODUCTION engine (not a copy of its spelling)
      val fast = Advanced.concurrentIntervals(df).orderBy("day")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
      // naive per-day expansion
      val naive = df.select(explode(expr(
        "sequence(ship_day, date_add(ship_day, transit_days), interval 1 day)"))
        .as("day"))
        .groupBy("day").agg(count(lit(1)).as("n")).orderBy("day")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
      assert(fast == naive, s"seed $i: boundary algebra diverged")
    }
  }

  test("q84 never reports a zero or negative concurrency") {
    val rows = SparkEntry.queries("q84_concurrent_intervals")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_in_transit") > 0))
  }

  test("q85 reports only corpus vectors, each genuinely within the threshold") {
    val hits = SparkEntry.queries("q85_embedding_decontam")(spark, sfDir).collect()
    assert(hits.forall(_.getAs[Long]("vec_id") >= 50), "benchmark ids leaked")
    assert(hits.forall { r =>
      val c = r.getAs[Double]("max_cosine")
      c >= 0.40 && c <= 1.0
    })
    assert(hits.forall(_.getAs[Long]("n_hits") >= 1))
    // cross-check one hit against a brute-force recompute
    if (hits.nonEmpty) {
      val v = Similarity.normedVectors(spark, sfDir)
      val cos = Similarity.dot(col("b.v"), col("c.v")) /
        (col("b.nrm") * col("c.nrm"))
      val id = hits.head.getAs[Long]("vec_id")
      val best = v.as("c").filter(col("c.vec_id") === id)
        .crossJoin(v.as("b").filter(col("b.vec_id") < 50))
        .agg(max(cos)).head.getDouble(0)
      assert(best == hits.head.getAs[Double]("max_cosine"))
    }
  }

  test("q86 margin equals a direct per-token recompute; pred follows margin") {
    val scored = SparkEntry.queries("q86_linear_classifier")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("margin"), r.getAs[Int]("pred"))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(tok: String): Long = {
      val h = md.digest(tok.getBytes("UTF-8")).take(1)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) - 128L
    }
    docs.take(50).foreach { r =>
      val want = r.getAs[String]("text").split(" ", -1).map(weight).sum
      val (margin, pred) = scored(r.getAs[Long]("doc_id"))
      assert(margin == want, s"doc ${r.getAs[Long]("doc_id")}")
      assert(pred == (if (margin > 0) 1 else 0))
    }
  }

  test("q87 coverage is a valid fraction and respects the top-200 vocab") {
    val rows = SparkEntry.queries("q87_vocab_coverage")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      val nv = r.getAs[Long]("n_in_vocab")
      val nt = r.getAs[Int]("n_tokens")
      assert(cov >= 0.0 && cov <= 1.0)
      assert(nv <= nt)
      assert(cov == nv.toDouble / nt)
    }
    // the vocab really is the global top-200: recompute and compare counts
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(200)
      .select("tok").collect().map(_.getString(0)).toSet
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_in_vocab")).toMap
    toks.collect().groupBy(_.getAs[Long]("doc_id")).take(20).foreach {
      case (id, ts) =>
        assert(got(id) == ts.count(t => vocab(t.getAs[String]("tok"))))
    }
  }
}
