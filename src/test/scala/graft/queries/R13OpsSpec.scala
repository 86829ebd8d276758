package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic + plan checks for the round-13 operators. Hash-level
  * correctness runs against the DuckDB oracle; these pin the guarantees
  * the implementations claim (q97: sketch-routed output EQUALS the full
  * GROUP BY answer) against independent driver-side recomputations. */
class R13OpsSpec extends SparkSpec {

  test("q97 equals the exact full-group-by heavy-hitter answer") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val grams = texts.flatMap { t =>
      val toks = t.split(" ", -1)
      if (toks.length < 3) Seq.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toSeq
    }
    val n = grams.length.toLong
    val expect = grams.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 5000L > n }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q97_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(expect.nonEmpty, "fixture must produce at least one heavy hitter")
  }

  test("q97 output is invariant to partition layout (sketch only routes)") {
    // The Misra-Gries survivor SET depends on stream order; the final
    // output must not. Re-run under a different scan parallelism.
    val base = SparkEntry.queries("q97_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = SparkEntry.queries("q97_heavy_hitters")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(alt == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }

  test("q98 statuses partition the aligned snapshots correctly") {
    val rows = SparkEntry.queries("q98_snapshot_diff")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byStatus = rows.groupBy(_._2)
    // every status is exercised by the derivation
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"))
    // removed docs contribute no v2 tokens; added none to v1
    assert(byStatus("removed").forall(_._5 == 0))
    assert(byStatus("added").forall(_._4 == 0))
    // unchanged rows carry identical volumes on both sides
    assert(byStatus("unchanged").forall(r => r._4 == r._5 && r._6 == 0))
    // the revision appends exactly one token -> changed delta == n_docs
    assert(byStatus("changed").forall(r => r._6 == r._3))
    // doc accounting: total distinct docs seen = |v1 ∪ v2|
    val expectTotal = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
      .count(id => id % 17 != 3 || id % 13 != 5)
    assert(rows.map(_._3).sum == expectTotal)
  }

  test("q99 calibrated percentiles match a driver-side recompute") {
    val rows = SparkEntry.queries("q99_quality_calibration")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getInt(4)))
    val bySource = rows.groupBy(_._2)
    bySource.foreach { case (_, docs) =>
      val ordered = docs.sortBy(d => (d._3, d._1)) // (quality_score, doc_id)
      val n = ordered.length
      ordered.zipWithIndex.foreach { case (d, i) =>
        val expectPct = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(d._4 == expectPct, s"doc ${d._1} pct ${d._4} != $expectPct")
        assert(d._5 == (if (expectPct >= 0.25) 1 else 0))
      }
      // a uniform trim: roughly the bottom quarter of every source drops
      val dropped = ordered.count(_._5 == 0)
      assert(dropped >= n / 5 && dropped <= n / 3 + 1,
        s"dropped $dropped of $n not a ~quarter")
    }
    assert(bySource.size > 1, "fixture must exercise multiple sources")
  }

  test("q100 margins match a driver-side DSIR recompute") {
    import java.security.MessageDigest
    def bucket(bg: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(bg.getBytes("UTF-8"))
      ((d(0) & 0xff).toLong) // first two hex chars == first byte
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val db = docs.toSeq.flatMap { case (id, src, t) =>
      val toks = t.split(" ", -1)
      if (toks.length < 2) Seq.empty[(Long, String, Long)]
      else toks.zip(toks.tail).toSeq
        .map { case (a, b) => (id, src, bucket(s"$a $b")) }
    }.groupBy(x => x).view.mapValues(_.size.toLong).toSeq
      .map { case ((id, src, b), n) => (id, src, b, n) }
    val ct = db.filter(_._2 == "src0").groupBy(_._3).view
      .mapValues(_.map(_._4).sum).toMap.withDefaultValue(0L)
    val cr = db.filter(_._2 != "src0").groupBy(_._3).view
      .mapValues(_.map(_._4).sum).toMap.withDefaultValue(0L)
    val (tt, tr) = (ct.values.sum max 1L, cr.values.sum max 1L)
    def w(b: Long) = 1000000L * ct(b) / tt - 1000000L * cr(b) / tr
    val expect = db.filter(_._2 != "src0").groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (id, rows) =>
        val margin = rows.map(r => r._4 * w(r._3)).sum
        (id, rows.map(_._4).sum, margin, if (margin > 0) 1 else 0)
      }
    val got = SparkEntry.queries("q100_dsir_selection")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == expect)
    assert(expect.exists(_._3 != 0), "fixture must produce nonzero margins")
  }

  test("q102 is a complete permutation with dense per-shard positions") {
    val rows = SparkEntry.queries("q102_epoch_shuffle")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val allIds = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every document appears exactly once
    assert(rows.map(_._1).toSet == allIds)
    assert(rows.length == allIds.size)
    // positions are dense 1..n within each shard
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong),
        s"shard $shard positions not dense")
    }
    // the md5 key actually spreads: more than one shard in use, and no
    // shard hoards more than half the corpus
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.size > 4 && sizes.max < rows.length / 2)
    // the order is not the identity (it is a shuffle)
    val inOrder = rows.sortBy(r => (r._2, r._3)).map(_._1)
    assert(inOrder.toSeq != inOrder.sorted.toSeq)
  }

  test("q103: packing always beats padding, and both waste rates are sane") {
    val rows = SparkEntry.queries("q103_packing_efficiency")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(rows.map(_._1).toSeq == Seq(128L, 256L, 512L, 1024L))
    rows.foreach { case (l, _, total, padded, padWaste, seqs, packedWaste) =>
      assert(padded >= total)
      assert(seqs * l >= total)
      assert(packedWaste < padWaste,
        s"L=$l: packing ($packedWaste) must beat padding ($padWaste)")
      assert(padWaste >= 0 && padWaste < 1 && packedWaste >= 0 && packedWaste < 1)
    }
    // waste grows with L in both regimes on a short-doc corpus
    assert(rows.map(_._5).toSeq == rows.map(_._5).toSeq.sorted)
    assert(rows.map(_._7).toSeq == rows.map(_._7).toSeq.sorted)
  }

  test("q104: repeat tiers quarter each source and account tokens exactly") {
    val rows = SparkEntry.queries("q104_repeat_tiers")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    rows.foreach { case (_, repeats, _, tokens, eff) =>
      assert(Set(0L, 1L, 2L, 4L).contains(repeats))
      assert(eff == repeats * tokens)
    }
    rows.groupBy(_._1).foreach { case (src, tiers) =>
      assert(tiers.map(_._2).toSet == Set(0L, 1L, 2L, 4L),
        s"source $src missing a tier")
      val n = tiers.map(_._3).sum
      // quartile split: tier sizes within one doc of n/4
      tiers.foreach { t =>
        assert(math.abs(t._3 - n / 4.0) <= 1.0, s"$src tier ${t._2}: ${t._3} of $n")
      }
    }
  }

  test("q105: every near-dup cluster lands whole in exactly one split") {
    val rows = SparkEntry.queries("q105_leakage_safe_split")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val allIds = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == allIds, "every document assigned")
    // cluster atomicity: one split per group key
    rows.groupBy(_._2).foreach { case (g, members) =>
      assert(members.map(_._3).toSet.size == 1,
        s"group $g split across ${members.map(_._3).toSet}")
    }
    // the fixture actually has multi-member clusters (else this pins nothing)
    assert(rows.groupBy(_._2).values.exists(_.size > 1),
      "fixture must contain at least one near-dup cluster")
    // group-level split rates near 80/10/10
    val groups = rows.groupBy(_._2).map(_._2.head._3).toSeq
    val train = groups.count(_ == "train").toDouble / groups.size
    assert(train > 0.7 && train < 0.9, s"train rate $train")
    assert(groups.contains("val") && groups.contains("test"))
  }

  test("q107 profiles every column from one consistent row count") {
    val rows = SparkEntry.queries("q107_corpus_profile")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5), r.getDouble(6)))
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    rows.foreach { r =>
      assert(r._2 == n, s"${r._1} n_rows ${r._2} != $n")
      assert(r._3 == 0, s"${r._1} unexpected nulls")
      assert(r._4 >= 1 && r._4 <= n)
      assert(r._5 <= r._6, s"${r._1} min > max")
      assert(r._7 > 0)
    }
    // doc_id is the primary key: distinct == rows
    assert(rows.find(_._1 == "doc_id").get._4 == n)
  }

  test("q108 detects the planted length drift and balances totals") {
    val rows = SparkEntry.queries("q108_snapshot_drift")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    val (t1, t2) = (rows.map(_._2).sum, rows.map(_._3).sum)
    rows.foreach { r =>
      // the statistic's zero-set matches exact rate equality
      assert((r._6 == 0) == (r._2 * t2 == r._3 * t1))
      assert(math.abs(r._4 - r._2.toDouble / t1) < 1e-12)
    }
    assert(rows.exists(_._6 > 0), "planted drift must be visible")
  }

  test("q109 conserves tokens and drops exactly the non-representatives") {
    val rows = SparkEntry.queries("q109_dedup_savings")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.foreach { r =>
      assert(r._4 == r._5 + r._6, s"${r._1}: total != dropped + kept")
      assert(r._2 >= r._3)
    }
    // the corpus has near-dup clusters, so something must be dropped...
    assert(rows.map(_._3).sum > 0, "fixture must drop at least one dup")
    // ...and the drop count equals cluster members minus cluster count
    val labels = Dedup.resolveClusters(
      Dedup.minhashPairs(spark, sfDir).select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectDropped = labels.length - labels.map(_._2).distinct.length
    assert(rows.map(_._3).sum == expectDropped)
  }
}
