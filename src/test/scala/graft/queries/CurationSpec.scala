package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic checks for the curation composites (q80–q82) on sf0.001 —
  * hash-level correctness runs against the DuckDB oracle; these pin the
  * semantics against independent driver-side recomputations and the plan
  * properties the scale story depends on. */
class CurationSpec extends SparkSpec {

  test("q80 matches a brute-force segment dedup (keep-first, threshold 3)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def segments(t: String): Seq[String] =
      t.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
    val occ = for { (id, t) <- docs; (s, p) <- segments(t).zipWithIndex }
      yield (id, p, s)
    val cnt = occ.groupBy(_._3).view.mapValues(_.length).toMap
    val first = occ.groupBy(_._3).view
      .mapValues(os => os.map(o => (o._1, o._2)).min).toMap
    val expect = docs.map { case (id, t) =>
      val segs = segments(t).zipWithIndex
      val kept = segs.collect {
        case (s, p) if cnt(s) < 3 || first(s) == ((id, p)) => s
      }
      (id, segs.size.toLong, (segs.size - kept.size).toLong, kept.mkString(" "))
    }
    val got = SparkEntry.queries("q80_segment_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == expect.toSeq)
    assert(expect.exists(_._3 > 0), "fixture must exercise the drop path")
  }

  test("q80 plan has no Window operator (agg+join spelling, AQE-splittable)") {
    // the scale argument: AQE can skew-split a join but not a window — a
    // mega-repeated boilerplate segment must land on the partial-agg +
    // join path, never a single hot window partition
    val s = SparkEntry.queries("q80_segment_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!s.contains("Window"), s"unexpected Window operator in:\n$s")
  }

  test("q81 admitted set equals the exact anti-join (bloom only routes)") {
    val fp = md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), fp.as("fp"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 7).select("fp")
    val exact = docs.filter(col("doc_id") % 10 === 7)
      .join(corpus, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = SparkEntry.queries("q81_bloom_incremental_dedup")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == exact.toSeq)
    assert(got.toSeq == got.sorted.toSeq)
  }

  test("q81 probes the bloom as a compiled expression in the plan") {
    val s = SparkEntry.queries("q81_bloom_incremental_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(s.contains("might_contain"), s"bloom probe not in plan:\n$s")
    assert(s.contains("xxhash64"), s"hash probe not in plan:\n$s")
  }

  test("q82 picks the max-quality member of every cluster, ties to min doc_id") {
    val labels = Dedup.resolveClusters(
      Dedup.minhashPairs(spark, sfDir).select("doc_a", "doc_b"))
    val members = labels.join(
        Text.qualityScored(spark, sfDir).select("doc_id", "quality_score"),
        "doc_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
    val got = SparkEntry.queries("q82_cluster_representatives")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "fixture must contain at least one duplicate cluster")
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    got.foreach { case (cluster, nMembers, repDoc, repQuality) =>
      val ms = members(cluster)
      assert(ms.length.toLong == nMembers, s"cluster $cluster size")
      val best = ms.map(m => (-m._3, m._2)).min
      assert((repQuality, repDoc) == (-best._1, best._2),
        s"cluster $cluster picked ($repDoc, $repQuality), expected $best")
    }
    assert(got.map(_._1).length == got.map(_._1).distinct.length)
  }

  test("q83 matches brute-force sliding-window chunking (L=32, S=24)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = for {
      (id, t) <- docs.toSeq
      toks = t.split(" ", -1).toSeq
      nChunks = math.ceil(toks.size / 24.0).toInt
      i <- 0 until nChunks
    } yield (id, i.toLong,
      math.min(32, toks.size - i * 24).toLong,
      md5hex(toks.slice(i * 24, i * 24 + 32).mkString(" ")))
    val got = SparkEntry.queries("q83_overlap_chunks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == expect)
    // overlap invariant: consecutive full windows share S..L token starts,
    // i.e. every token index is covered by at least one chunk
    val covered = expect.groupBy(_._1).forall { case (id, cs) =>
      val n = docs.find(_._1 == id).get._2.split(" ", -1).length
      cs.map(c => (c._2 * 24, c._2 * 24 + c._3)).sortBy(_._1)
        .foldLeft(0L) { case (reach, (s, e)) =>
          assert(s <= reach, s"coverage gap in doc $id"); math.max(reach, e)
        } == n
    }
    assert(covered)
    assert(expect.exists(_._2 >= 2), "fixture must produce multi-chunk docs")
  }

  test("q82's top-1-per-cluster compiles to WindowGroupLimit") {
    val s = SparkEntry.queries("q82_cluster_representatives")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$s")
  }
}
