package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("native as-of equals the union-window spelling on real data") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_orderkey")
    val native = AsOf.join(ev, ord,
        Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
        tieBreak = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("last_orderkey"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap

    val reference = graft.SparkEntry.queries("q16_asof_last_order")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap

    assert(native.size === reference.size)
    assert(native === reference)
  }

  test("unmatched left rows keep NULL right columns; null keys never match") {
    import spark.implicits._
    val l = Seq((1L, 10L, 5L), (2L, 10L, 1L), (3L, 99L, 5L))
      .toDF("id", "k", "t")
    val lNull = l.union(Seq((4L, 0L, 5L)).toDF("id", "k", "t")
      .select(col("id"), lit(null).cast("long").as("k"), col("t")))
    val r = Seq((10L, 2L, 100L), (10L, 4L, 200L), (10L, 4L, 300L))
      .toDF("rk", "rt", "payload")
    val out = AsOf.join(lNull, r, Seq("k"), Seq("rk"), "t", "rt",
        tieBreak = Seq("payload"))
      .select("id", "payload").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    // id=1: t=5 sees rt<=5 → last of (2,100),(4,200),(4,300) = 300 (tie max)
    // id=2: t=1 sees nothing → null; id=3: key 99 unmatched → null
    // id=4: null key → null
    assert(out === Map(1L -> 300L, 2L -> -1L, 3L -> -1L, 4L -> -1L))
  }

  test("randomized as-of equals the brute-force reference across layouts") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      // tiny key space → heavy key collisions, duplicate times, empty keys
      val nKeys = 1 + rng.nextInt(5)
      val lRows = (1 to 80).map(i =>
        (i.toLong, rng.nextInt(nKeys + 2).toLong, rng.nextInt(20).toLong))
      val rRows = (1 to 60).map(i =>
        (rng.nextInt(nKeys).toLong, rng.nextInt(20).toLong, i.toLong))
      val l = lRows.toDF("id", "k", "t")
        .repartition(1 + rng.nextInt(5)) // random layout; exec must re-cluster
      val r = rRows.toDF("rk", "rt", "tie")
        .repartition(1 + rng.nextInt(5))
      val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
          tieBreak = Seq("tie"))
        .select("id", "tie").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      val want = lRows.map { case (id, k, t) =>
        val m = rRows.filter(rr => rr._1 == k && rr._2 <= t)
        id -> (if (m.isEmpty) -1L else m.maxBy(rr => (rr._2, rr._3))._3)
      }.toMap
      assert(got === want, s"trial $trial (nKeys=$nKeys)")
    }
  }

  test("randomized FORWARD as-of equals the brute-force reference") {
    import spark.implicits._
    val rng = new scala.util.Random(118118L)
    for (trial <- 1 to 8) {
      val nKeys = 1 + rng.nextInt(5)
      val lRows = (1 to 80).map(i =>
        (i.toLong, rng.nextInt(nKeys + 2).toLong, rng.nextInt(20).toLong))
      val rRows = (1 to 60).map(i =>
        (rng.nextInt(nKeys).toLong, rng.nextInt(20).toLong, i.toLong))
      val l = lRows.toDF("id", "k", "t").repartition(1 + rng.nextInt(5))
      val r = rRows.toDF("rk", "rt", "tie").repartition(1 + rng.nextInt(5))
      val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
          tieBreak = Seq("tie"), direction = "forward")
        .select("id", "tie").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      // forward: smallest rt >= t, ties to the SMALLEST tie tuple
      val want = lRows.map { case (id, k, t) =>
        val m = rRows.filter(rr => rr._1 == k && rr._2 >= t)
        id -> (if (m.isEmpty) -1L else m.minBy(rr => (rr._2, rr._3))._3)
      }.toMap
      assert(got === want, s"trial $trial (nKeys=$nKeys)")
    }
  }

  test("randomized as-of with tolerance equals the brute-force reference, both directions") {
    import spark.implicits._
    val rng = new scala.util.Random(119119L)
    for (trial <- 1 to 8; fwd <- Seq(false, true)) {
      val nKeys = 1 + rng.nextInt(5)
      val tol = rng.nextInt(6).toLong // 0 = exact-time-only matches
      val lRows = (1 to 60).map(i =>
        (i.toLong, rng.nextInt(nKeys + 1).toLong, rng.nextInt(25).toLong))
      val rRows = (1 to 40).map(i =>
        (rng.nextInt(nKeys).toLong, rng.nextInt(25).toLong, i.toLong))
      val l = lRows.toDF("id", "k", "t").repartition(1 + rng.nextInt(4))
      val r = rRows.toDF("rk", "rt", "tie").repartition(1 + rng.nextInt(4))
      val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
          tieBreak = Seq("tie"),
          direction = if (fwd) "forward" else "backward",
          tolerance = Some(tol))
        .select("id", "tie").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      val want = lRows.map { case (id, k, t) =>
        val m =
          if (fwd) rRows.filter(rr => rr._1 == k && rr._2 >= t && rr._2 - t <= tol)
          else rRows.filter(rr => rr._1 == k && rr._2 <= t && t - rr._2 <= tol)
        id -> (if (m.isEmpty) -1L
               else if (fwd) m.minBy(rr => (rr._2, rr._3))._3
               else m.maxBy(rr => (rr._2, rr._3))._3)
      }.toMap
      assert(got === want, s"trial $trial fwd=$fwd tol=$tol (nKeys=$nKeys)")
    }
  }

  test("an unknown direction is rejected with the API's message") {
    import spark.implicits._
    val l = Seq((1L, 1L, 5L)).toDF("id", "k", "t")
    val r = Seq((1L, 4L, 10L)).toDF("rk", "rt", "tie")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", direction = "sideways")
    }
    assert(e.getMessage.contains("'backward' or 'forward'"), e.getMessage)
  }

  test("tolerance on a non-integral time type fails at plan time") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1.5)).toDF("id", "k", "t")
    val r = Seq((1L, 1.0, 10L)).toDF("rk", "rt", "tie")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt",
        tieBreak = Seq("tie"), tolerance = Some(5L)).queryExecution.executedPlan
    }
    assert(e.getMessage.contains("integral-backed time type"), e.getMessage)
  }

  test("plan: one hash exchange per side, no union, no window") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_orderkey")
    val df = AsOf.join(ev, ord, Seq("user_id"), Seq("o_custkey"),
      "ts", "o_orderdate", tieBreak = Seq("o_orderkey"))
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoinExec") || s.contains("AsOfJoin"), s)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$s")
    assert(!s.contains("Union") && !s.contains("Window"), s)

    // forward + tolerance ride the same exec: identical plan shape
    val fwd = AsOf.join(ev, ord, Seq("user_id"), Seq("o_custkey"),
      "ts", "o_orderdate", tieBreak = Seq("o_orderkey"),
      direction = "forward", tolerance = Some(1000000L))
    val sf = fwd.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(sf).length == 2, sf)
    assert(!sf.contains("Union") && !sf.contains("Window"), sf)
  }

  test("mismatched time or key types fail at plan time with the semantic error") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("o_date"),
        col("o_orderkey"))
    // DateType right time vs TimestampType left time: the exec would
    // compare them with an ordering built from the left type — reject at
    // plan construction, naming both types
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(ev, ord, Seq("user_id"), Seq("o_custkey"), "ts", "o_date",
        tieBreak = Seq("o_orderkey")).queryExecution.executedPlan
    }
    assert(e1.getMessage.contains("time columns must share a data type")
      && e1.getMessage.contains("date"), e1.getMessage)

    val ordK = Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("int").as("o_ck"), col("o_orderdate"),
        col("o_orderkey"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(ev, ordK, Seq("user_id"), Seq("o_ck"), "ts", "o_orderdate",
        tieBreak = Seq("o_orderkey")).queryExecution.executedPlan
    }
    assert(e2.getMessage.contains("key pair 0 must share a data type"),
      e2.getMessage)
  }
}
