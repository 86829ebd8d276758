package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed / ordered analytics: time bucketing, running totals, gap
  * sessionization, as-of join, rollup, per-group top-k, deciles.
  * Reference analogues: A1 (last-per-group window), A2 (time ordering),
  * F8 (timestamp bucketing); sessionization/as-of are the north-star
  * generalizations of the trace time-range logic (S3).
  *
  * Oracle-parity rules: running sums are over exact integers
  * (floor(value*1000) milli-units — window accumulation order of doubles is
  * engine-dependent, integer sums are not); durations are microsecond
  * bigints; every ORDER BY has a unique key with explicit null placement.
  */
object Windows {

  /** Q13: hourly tumbling-window aggregation over events (the batch twin of
    * the Structured Streaming job in graft.streaming — same result frame).
    * One shuffle on (hour, event_type); count-distinct adds a partial agg. */
  private val q13 = GraftQuery(
    "q13_hourly_events",
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(
          date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 1000).cast("long")).as("sum_milli"))
        .orderBy("hour", "event_type"),
    Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type,
             count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_milli
      FROM events
      GROUP BY 1, 2
      ORDER BY hour, event_type"""),
    headline = true)

  /** Q14: running total per user (cumulative window frame). Milli-unit
    * integers make the accumulation order-independent; the (ts, event_id)
    * sort key is unique so RANGE vs ROWS framing agrees across engines. */
  private val q14 = GraftQuery(
    "q14_running_total",
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .withColumn("milli", floor(col("value") * 1000).cast("long"))
        .select(
          col("event_id"), col("user_id"),
          row_number().over(w).as("seq"),
          sum(col("milli")).over(w).as("run_milli"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id,
             row_number() OVER w AS seq,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS run_milli
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""))

  /** Q15: gap-based sessionization (new session when > 30 min idle).
    * lag + running sum of boundaries — the canonical two-window pattern;
    * one shuffle on user_id serves both windows and the final groupBy
    * (same partitioning, Catalyst reuses the exchange). */
  private val q15 = GraftQuery(
    "q15_sessionize",
    (spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("boundary",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("boundary")).over(w))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .withColumn("dur_us",
          unix_micros(col("session_end")) - unix_micros(col("session_start")))
        .orderBy("user_id", "session_seq")
    },
    Some("""
      WITH b AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                    THEN 1 ELSE 0 END AS boundary
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s AS (
        SELECT user_id, ts,
               CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
        FROM b)
      SELECT user_id, session_seq, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM s
      GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""),
    headline = true)

  /** Q16: as-of join — for each event, the most recent order (by
    * o_orderdate, ties broken by max o_orderkey) of the same customer at or
    * before the event time. Implemented as the scalable union-window
    * pattern: one shuffle on the key, one sort, no per-row probes — this is
    * how an as-of join survives 100 TB (a correlated-subquery plan would
    * be O(events × orders/key)). */
  private val q16 = GraftQuery(
    "q16_asof_last_order",
    (spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id").as("key"), col("ts"),
          lit(1).as("flag"), col("event_id"), lit(null).cast("long").as("o_orderkey"))
      val ord = Tables.orders(spark, dir)
        .select(col("o_custkey").as("key"), col("o_orderdate").as("ts"),
          lit(0).as("flag"), lit(null).cast("long").as("event_id"), col("o_orderkey"))
      val w = Window.partitionBy("key").orderBy("ts", "flag", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.unionByName(ord)
        .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .filter(col("flag") === 1)
        .select(col("event_id"), col("key").as("user_id"), col("last_orderkey"))
        .orderBy("event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id,
             (SELECT o.o_orderkey FROM orders o
              WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey
      FROM events e
      ORDER BY e.event_id"""),
    headline = true)

  /** Q17: hierarchical rollup over (lang, source) — subtotal and
    * grand-total rows with NULL group keys, explicit NULLS FIRST ordering
    * so both engines agree on row order. */
  private val q17 = GraftQuery(
    "q17_rollup_docs",
    (spark, dir) =>
      Tables.documents(spark, dir)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first),
    Some("""
      SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY ROLLUP (lang, source)
      ORDER BY lang NULLS FIRST, source NULLS FIRST"""))

  /** Q18: top-3 orders per market segment (per-group top-k via
    * row_number — the partial-TopK pattern; at scale the window shuffle is
    * on c_mktsegment with AQE splitting the 5 heavy partitions). */
  private val q18 = GraftQuery(
    "q18_top3_per_segment",
    (spark, dir) => {
      val c = Tables.customer(spark, dir)
      val o = Tables.orders(spark, dir)
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_mktsegment"), col("rank"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_mktsegment", "rank")
    },
    Some("""
      SELECT c_mktsegment, rank, o_orderkey, o_totalprice
      FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM customer JOIN orders ON c_custkey = o_custkey)
      WHERE rank <= 3
      ORDER BY c_mktsegment, rank"""))

  /** Q19: decile statistics over order prices — EXACT ntile semantics
    * without the global single-partition sort window (which moves every row
    * through one task). Scale-safe exact plan:
    *   1. bucket rows by a pure value function (price banded at 10k) —
    *      deterministic across jobs, unlike RangePartitioner's sampled
    *      bounds, so the count pass and the rank pass agree;
    *   2. tiny per-band count aggregate → driver-side cumulative offsets
    *      (bounded: one row per price band at any SF), broadcast back;
    *   3. exact global rank = band offset + intra-band row_number
    *      (window partitioned on the band — parallel);
    *   4. ntile arithmetic from the total count (first n%10 deciles get
    *      one extra row — the SQL-standard tiling DuckDB implements).
    * Min/max of doubles are exact, no sums. */
  private val q19 = GraftQuery(
    "q19_price_deciles",
    (spark, dir) => {
      val ord = Tables.orders(spark, dir)
        .withColumn("band", floor(col("o_totalprice") / 10000.0).cast("long"))
      val cnts = ord.groupBy("band").agg(count(lit(1)).as("cnt"))
        .orderBy("band").collect()
      val n = cnts.map(_.getLong(1)).sum
      val offs = cnts.scanLeft(0L)((acc, r) => acc + r.getLong(1)).init
      val offsDf = broadcast(
        spark.createDataFrame(
          cnts.zip(offs).toSeq.map { case (r, o) => (r.getLong(0), o) })
          .toDF("band", "band_off"))
      val base = n / 10
      val rem = n % 10
      val cut = rem * (base + 1)
      val wb = Window.partitionBy("band")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ord.join(offsDf, "band")
        .withColumn("rank", col("band_off") + row_number().over(wb))
        .withColumn("decile",
          when(col("rank") <= cut,
            expr(s"CAST((rank - 1) div ${base + 1} AS INT) + 1"))
            .otherwise(
              expr(s"CAST(($rem + (rank - $cut - 1) div $base) AS INT) + 1")))
        .groupBy(col("decile"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("decile")
    },
    Some("""
      SELECT decile, count(*) AS n_orders,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM (SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
            FROM orders)
      GROUP BY decile
      ORDER BY decile"""),
    headline = true)

  /** Q113: the SAME as-of semantics as q16, through the native
    * whole-operator path — graft.plans.{AsOfJoinPlan, AsOfJoinStrategy,
    * AsOfJoinExec} registered via SparkSessionExtensions (SURVEY §4
    * ladder rung (c)). Identical oracle as q16, so the custom operator is
    * hash-checked against DuckDB AND (transitively) against the
    * union-window spelling. Plan shape: one hash exchange per side,
    * per-side sorts, a streaming two-pointer merge with O(1) state — vs
    * q16's merged-stream sort + last(ignoreNulls) window; see
    * AsOfJoin.scala's scaladoc for the 100 TB accounting. */
  private val q113 = GraftQuery(
    "q113_asof_native",
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
      val ord = Tables.orders(spark, dir)
        .select("o_custkey", "o_orderdate", "o_orderkey")
      graft.plans.AsOf.join(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
          tieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_orderkey"))
        .orderBy("event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id,
             (SELECT o.o_orderkey FROM orders o
              WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey
      FROM events e
      ORDER BY e.event_id"""),
    headline = true)

  /** Q118: FORWARD as-of through the native operator — "next order at or
    * after each event", the scheduling/attribution direction (first
    * shipment after an order, first alert after a deploy). Ties on time
    * resolve to the smallest o_orderkey (the ascending-sort head — the
    * forward mirror of backward's greatest-ties rule). Same O(1)-state
    * merge, same two exchanges; the only difference is which buffered row
    * wins. Oracle is the correlated spelling with the comparisons
    * flipped, so the forward path is hash-checked independently. */
  private val q118 = GraftQuery(
    "q118_asof_forward",
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
      val ord = Tables.orders(spark, dir)
        .select("o_custkey", "o_orderdate", "o_orderkey")
      graft.plans.AsOf.join(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
          tieBreak = Seq("o_orderkey"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("next_orderkey"))
        .orderBy("event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id,
             (SELECT o.o_orderkey FROM orders o
              WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
              ORDER BY o.o_orderdate ASC, o.o_orderkey ASC LIMIT 1) AS next_orderkey
      FROM events e
      ORDER BY e.event_id"""),
    headline = true)

  /** Q119: as-of with TOLERANCE (pandas merge_asof semantics) — the
    * enrichment becomes NULL when the matched version is older than the
    * window (here 7 days in timestamp-native microseconds): the "stale
    * dimension data is worse than no data" contract every temporal
    * enrichment pipeline eventually needs. Evaluated at emit time on the
    * O(1) carried row, so the merge costs nothing extra; the oracle adds
    * the same bound to the correlated predicate. */
  private val q119 = GraftQuery(
    "q119_asof_tolerance",
    (spark, dir) => {
      val ev = Tables.events(spark, dir).select("event_id", "user_id", "ts")
      val ord = Tables.orders(spark, dir)
        .select("o_custkey", "o_orderdate", "o_orderkey")
      graft.plans.AsOf.join(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
          tieBreak = Seq("o_orderkey"),
          tolerance = Some(7L * 24 * 3600 * 1000000L)) // 7 days in us
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("recent_orderkey"))
        .orderBy("event_id")
    },
    Some("""
      SELECT e.event_id, e.user_id,
             (SELECT o.o_orderkey FROM orders o
              WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
               AS recent_orderkey
      FROM events e
      ORDER BY e.event_id"""),
    headline = true)

  val all: Seq[GraftQuery] =
    Seq(q13, q14, q15, q16, q17, q18, q19, q113, q118, q119)
}
