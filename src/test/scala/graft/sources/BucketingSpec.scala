package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: correctness + the shuffle-free plan shape. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join is shuffle-free and matches the plain join") {
    val orders = graft.Tables.orders(spark, sfDir)
    val lineitem = graft.Tables.lineitem(spark, sfDir)
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)

    val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b",
      "o_orderkey", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    val bucketed = joined.agg(
      count(lit(1)), sum(col("l_quantity").cast("decimal(12,2)"))).head()
    val plain = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(12,2)"))).head()
    assert(bucketed == plain)
  }
}
