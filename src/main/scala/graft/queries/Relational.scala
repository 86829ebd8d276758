package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.2–2.4): projection/filter,
  * equi/broadcast/semi/anti joins, grouped + windowed aggregation, top-k,
  * dedup, JSON extraction, date bucketing.
  *
  * Oracle-parity rules used throughout (the driver hash-compares against
  * DuckDB):
  *  - never aggregate raw doubles (FP addition is order-dependent across
  *    engines); cast to decimal, aggregate exactly, cast the result back to
  *    double (bit-exact in both engines),
  *  - every query ends in a deterministic ORDER BY on a unique key,
  *  - aliases match the oracle SQL exactly.
  *
  * Scale notes are per-query; tested locally but written for a 1000-executor
  * cluster reading 100 TB (broadcast hints on dimension tables, shuffle only
  * on declared keys, filters pushed to the parquet scan).
  */
object Relational {

  /** Q1: TPC-H Q1-style pricing summary (reference A5 "distribution stats",
    * `Gyrfalcon/core/pipeline.py:855-926`). Filter pushed to parquet; one
    * shuffle on the 6-value group key; partial aggregation map-side. */
  private val q01 = GraftQuery(
    "q01_pricing_summary",
    (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(4,2)")
      val tax = col("l_tax").cast("decimal(4,2)")
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  /** Q2: filter + projection (reference P1/P3/P5 generation-span filter,
    * `convert_spans_to_chatcompletion.py:1517-1535`). Both the predicate and
    * the 4-column projection reach the parquet scan (PushedFilters /
    * ReadSchema) — at 100 TB this reads a fraction of the file. */
  private val q02 = GraftQuery(
    "q02_filter_project",
    (spark, dir) =>
      Tables.events(spark, dir)
        .filter(col("event_type") === "error" && col("value") > 5.0)
        .select("event_id", "user_id", "ts", "value")
        .orderBy("event_id"),
    Some("""
      SELECT event_id, user_id, ts, value
      FROM events
      WHERE event_type = 'error' AND value > 5.0
      ORDER BY event_id"""))

  /** Q3: 3-way join + grouped aggregation (reference J6 query⇄trace
    * enrichment generalized). Round 20 (guide §2.3 "aggregate before you
    * shuffle"): lineitem is pre-aggregated per orderkey BEFORE any join
    * — the fact rows partial-aggregate map-side, so the join exchanges
    * move per-ORDER rows (~¼ the rows, none of the price/discount
    * columns) instead of raw lineitems, and the per-segment rollup needs
    * no countDistinct (each surviving order is exactly one row, so the
    * distinct-aggregation's extra shuffle phase disappears). Identical
    * results: o_orderkey is unique in orders and c_custkey in customer,
    * so join rows per order = its lineitems before, = 1 now; decimal
    * addition is exact and associative, so the two-level revenue sum
    * casts to the same double. At scale orders⋈lineitem-agg co-partition
    * on orderkey and AQE handles skew. */
  private val q03 = GraftQuery(
    "q03_segment_revenue",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
      val rev = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(4,2)"))
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(sum(rev).as("o_rev"), count(lit(1)).as("o_items"))
      o.join(liAgg, o("o_orderkey") === liAgg("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"),
          sum(col("o_items")).as("n_lineitems"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
             count(DISTINCT o_orderkey) AS n_orders,
             count(*) AS n_lineitems
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    headline = true)

  /** Q4: broadcast dimension joins (reference J1/J2 hash-index lookups,
    * `convert_spans_to_chatcompletion.py:454-526`). nation/region are tiny
    * at any SF — explicit broadcast() keeps this shuffle-free on the fact
    * side at 100 TB. */
  private val q04 = GraftQuery(
    "q04_region_suppliers",
    (spark, dir) => {
      val s = Tables.supplier(spark, dir)
      val n = Tables.nation(spark, dir)
      val r = Tables.region(spark, dir)
      s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_suppliers"),
          sum(col("s_acctbal").cast("decimal(12,2)")).cast("double").as("total_acctbal"))
        .orderBy("r_name")
    },
    Some("""
      SELECT r_name, count(*) AS n_suppliers,
             CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name"""))

  /** Q5: last-event-per-group (reference A1 last-generation-per-parent,
    * `convert_spans_to_chatcompletion.py:1637-1687`). One shuffle on the
    * partition key; ties broken by event_id so the winner is deterministic
    * in both engines. At scale this is the canonical window-dedup — AQE
    * splits skewed users. */
  private val q05 = GraftQuery(
    "q05_last_event_per_user",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_id, event_type, value
      FROM (SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id"""),
    headline = true)

  /** Q6: anti join (reference J7 processed-trace skip,
    * `converter/cache_manager.py:64-76`). Broadcast the small side when the
    * processed-id set fits; shuffle-hash otherwise. */
  private val q06 = GraftQuery(
    "q06_customers_no_recent_orders",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      c.join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
      ORDER BY c_custkey"""))

  /** Q7: semi join + count per group (reference S4 framework filter read as
    * membership, `run_end_to_end.py:159-184`). */
  private val q07 = GraftQuery(
    "q07_brands_with_sales",
    (spark, dir) => {
      val p = Tables.part(spark, dir)
      val li = Tables.lineitem(spark, dir)
      p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts_sold"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, count(*) AS n_parts_sold
      FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      GROUP BY p_brand
      ORDER BY p_brand"""))

  /** Q8: exact deduplication by content hash (north-star dedup; reference
    * analogue is the md5 cache key F18, `cache_manager.py:78-87`).
    * groupBy(md5) shuffles once on the hash — uniform by construction, no
    * skew at any scale. */
  private val q08 = GraftQuery(
    "q08_exact_dedup",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
    Some("""
      SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents
      GROUP BY md5(text)
      ORDER BY keep_id"""))

  /** Q9: top-k (reference A10 truncations). orderBy+limit compiles to
    * TakeOrderedAndProject — per-partition heaps, no global sort, O(k)
    * driver memory at any scale. */
  private val q09 = GraftQuery(
    "q09_top_orders",
    (spark, dir) =>
      Tables.orders(spark, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .limit(10),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10"""))

  /** Q10: conditional aggregation (reference A8 success/failure counts,
    * `run_end_to_end.py:1047-1052`). Integer sums are exact; the rate is a
    * single double division, bit-exact in both engines. */
  private val q10 = GraftQuery(
    "q10_conditional_agg",
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(col("value") > 10.0, 1L).otherwise(0L)).as("n_high"))
        .withColumn("high_rate", col("n_high").cast("double") / col("n_total"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, count(*) AS n_total,
             CAST(sum(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             CAST(sum(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS high_rate
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Q11: JSON field extraction from an open-schema string column
    * (reference's usage/metadata blobs, SURVEY §1.2; `get_json_object` on
    * demand). */
  private val q11 = GraftQuery(
    "q11_json_extract",
    (spark, dir) =>
      Tables.events(spark, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("k")).as("sum_k"),
          count(col("k")).as("n_k"))
        .withColumn("avg_k", col("sum_k").cast("double") / col("n_k"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             count(CAST(props ->> '$.k' AS BIGINT)) AS n_k,
             CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS DOUBLE) / count(CAST(props ->> '$.k' AS BIGINT)) AS avg_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Q12: time bucketing (reference F8 created-timestamp derivation +
    * monthly reporting). date_trunc is codegen'd; one shuffle on ~84 month
    * keys — at 100 TB pre-aggregate map-side keeps the shuffle tiny. */
  private val q12 = GraftQuery(
    "q12_monthly_orders",
    (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_price"))
        .orderBy("order_month"),
    Some("""
      SELECT date_trunc('month', o_orderdate) AS order_month,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      FROM orders
      GROUP BY 1
      ORDER BY order_month"""),
    headline = true)

  val all: Seq[GraftQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12)
}
