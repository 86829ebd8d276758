package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke + semantic checks for the relational query batch on sf0.001.
  * Hash-level correctness runs against the DuckDB oracle (tools/
  * check_oracle.py + the driver's gate); these tests pin cheap invariants
  * so regressions surface in `sbt test` without the oracle. */
class RelationalSpec extends SparkSpec {

  test("every registered query runs and declared oracles exist") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    SparkEntry.registry.foreach { q =>
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      df.write.format("noop").mode("overwrite").save()
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 aggregates are consistent") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumBase = r.getAs[Double]("sum_base_price")
      val sumDisc = r.getAs[Double]("sum_disc_price")
      val sumCharge = r.getAs[Double]("sum_charge")
      assert(sumDisc <= sumBase && sumDisc <= sumCharge,
        s"discounted <= base <= charged violated: $r")
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q05 keeps exactly one row per user") {
    val df = SparkEntry.queries("q05_last_event_per_user")(spark, sfDir)
    val n = df.count()
    assert(n == df.select("user_id").distinct().count())
  }

  test("q08 dedup keeps one id per distinct text") {
    val df = SparkEntry.queries("q08_exact_dedup")(spark, sfDir)
    import org.apache.spark.sql.functions.sum
    val total = df.agg(sum("n_copies")).head.getLong(0)
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(total == docs)
  }

  test("q09 returns at most 10 rows, sorted by price desc") {
    val rows = SparkEntry.queries("q09_top_orders")(spark, sfDir).collect()
    assert(rows.length <= 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }
}
