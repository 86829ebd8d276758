package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantic checks for the advanced relational batch. */
class AdvancedSpec extends SparkSpec {

  test("q73 salted aggregation equals the plain groupBy exactly") {
    import org.apache.spark.sql.functions._
    val salted = SparkEntry.queries("q73_salted_agg")(spark, sfDir)
    val plain = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_milli"))
      .orderBy("event_type")
    assert(salted.collect().map(_.toString).toSeq ==
      plain.collect().map(_.toString).toSeq)
  }

  test("q74 HLL sketch lands within 10% of the exact distinct count") {
    SparkEntry.queries("q74_distinct_sketch")(spark, sfDir).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"approx $approx vs exact $exact")
    }
  }

  test("q117 approx profile matches q107's exact profile within HLL error") {
    val exact = SparkEntry.queries("q107_corpus_profile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = SparkEntry.queries("q117_corpus_profile_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, a) =>
      val e = exact(c)
      // everything except the distinct estimate must be IDENTICAL — the
      // swap touches only the cardinality aggregate
      Seq("n_rows", "n_nulls", "min_str", "max_str", "avg_len").foreach { f =>
        assert(a.getAs[Any](f) == e.getAs[Any](f), s"$c.$f")
      }
      val ex = e.getAs[Long]("n_distinct").toDouble
      val ap = a.getAs[Long]("n_distinct").toDouble
      assert(math.abs(ap - ex) / ex <= 0.15,
        s"$c: approx $ap vs exact $ex (HLL rsd 5%, 3-sigma bound)")
    }
  }

  test("q72 median sits between min and max per group, n is consistent") {
    import org.apache.spark.sql.functions._
    val med = SparkEntry.queries("q72_median_price")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val ranges = graft.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    ranges.foreach { case (k, (lo, hi, n)) =>
      val (m, mn) = med(k)
      assert(m >= lo && m <= hi && mn == n)
    }
  }
}
