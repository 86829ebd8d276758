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

  test("native as-of over bucketed tables is exchange-free and matches the unbucketed answer") {
    // the 100 TB layout story completed for the custom operator:
    // AsOfJoinExec asks for ClusteredDistribution on its keys, so scans of
    // tables bucketed by those keys satisfy it directly — EnsureRequirements
    // inserts NO exchange on either side (the per-side time sorts remain,
    // but they are partition-local). A recurring temporal enrichment over
    // bucketed fact tables pays zero shuffles per run.
    val ev = graft.Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val ord = graft.Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_orderkey")
    Bucketing.writeBucketed(ev, "events_asof_b", "user_id", 4)
    Bucketing.writeBucketed(ord, "orders_asof_b", "o_custkey", 4)

    val joined = graft.plans.AsOf.join(
      spark.table("events_asof_b"), spark.table("orders_asof_b"),
      Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
      tieBreak = Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of must not shuffle:\n$plan")

    val got = joined.select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = graft.plans.AsOf.join(ev, ord,
        Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
        tieBreak = Seq("o_orderkey"))
      .select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === want)
  }
}
