package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-corpus tests for q131 (batch-perceptron quality-classifier
  * training): on a linearly separable corpus the fixed-round loop must
  * actually learn the separation, and the round-1 semantics (w₀ = 0 ⇒
  * every positive misclassified ⇒ the first update is the positive class
  * prior) must hold exactly. */
class ClassifierTrainSpec extends SparkSpec {

  /** The feature bucket q131 assigns a bigram: first two hex chars of
    * md5("w1 w2"). */
  private def bucketOf(bigram: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bigram.getBytes("UTF-8"))
      .take(1).map(b => f"$b%02x").mkString
    Integer.parseInt(hex, 16)
  }

  private def pairBuckets(words: Seq[String]): Set[Int] =
    (for (a <- words; b <- words) yield bucketOf(s"$a $b")).toSet

  /** src0 (positives) writes from a "good" vocabulary, src1 (negatives)
    * from a "bad" one chosen by seed search so the two vocabularies'
    * bigram BUCKET sets are disjoint — md5 collisions between the
    * classes would otherwise leak perceptron updates into the other
    * class's buckets and void the exact-margin assertions below (the
    * first fixture draft hit exactly that). */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("clftrain").toString
    import spark.implicits._
    val good = (0 until 4).map(i => s"fine$i")
    val goodBk = pairBuckets(good)
    val bad = (0 until 1000).iterator
      .map(seed => (0 until 4).map(i => s"junk${seed}x$i"))
      .find(ws => pairBuckets(ws).intersect(goodBk).isEmpty)
      .getOrElse(fail("no collision-free junk vocabulary within 1000 seeds"))
    val rng = new scala.util.Random(7)
    def doc(words: Seq[String]): String =
      Seq.fill(30)(words(rng.nextInt(words.length))).mkString(" ")
    val docs =
      (0 until 20).map(i => (i.toLong, doc(good), "src0")) ++
      (100 until 140).map(i => (i.toLong, doc(bad), "src1"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val out =
    graft.SparkEntry.queries("q131_classifier_train")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("a separable corpus is fully learned within the fixed rounds") {
    assert(out.length == 60)
    val wrong = out.count { case (_, label, _, pred) => label != pred }
    assert(wrong == 0,
      s"separable corpus not learned: $wrong/60 wrong — ${out.filter(t => t._2 != t._4).toSeq}")
  }

  test("positive margins are strictly positive, negative margins non-positive") {
    out.foreach { case (id, label, margin, _) =>
      if (label == 1L) assert(margin > 0, s"doc $id: positive with margin $margin")
      else assert(margin <= 0, s"doc $id: negative with margin $margin")
    }
  }

  test("round-1 update is the positive class prior (w0 = 0 scores everyone 0)") {
    // With w = 0 every margin is 0: positives (margin <= 0) are ALL
    // misclassified, negatives (margin > 0 is false) are all correct —
    // so after round 1 the weights are exactly the positive feature
    // sums, non-negative everywhere, and zero on every junk bucket (the
    // fixture certifies the two bucket sets disjoint). Negatives are
    // then never misclassified in ANY later round (their margins stay
    // 0), so no update ever touches a junk bucket and every negative
    // doc's FINAL margin is exactly 0 — the zero-margin tie rule is
    // what classifies it.
    out.filter(_._2 == -1L).foreach { case (id, _, margin, _) =>
      assert(margin == 0L, s"doc $id: junk-vocab margin must be exactly 0, got $margin")
    }
  }

  test("determinism: a second invocation returns identical rows") {
    val again = graft.SparkEntry.queries("q131_classifier_train")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
  }
}
