package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-20 compiled ordered-fold kernels bit-equal to the
  * interpreted `aggregate(array_sort(collect_list(...)))` spelling they
  * replace — the hash-stability contract of every consumer (BM25 scoring
  * tail, q89's familiarity sum). */
class SortedFoldsSpec extends SparkSpec {

  test("sorted_sum_fold == aggregate(array_sort(...)) bit-for-bit, " +
      "including mixed magnitudes, signs and -0.0") {
    import spark.implicits._
    GraftExtensions.install(spark)
    // values chosen so summation ORDER changes the IEEE result: mixing
    // 1e16 with 1.0 loses the small addend unless added first
    val rows = Seq(
      (1L, 1.0e16), (1L, 1.0), (1L, 1.0), (1L, -1.0e16),
      (2L, -0.0), (2L, 0.0), (2L, -1.5), (2L, 2.5e-17),
      (3L, 0.125), (3L, -0.125), (3L, 3.0e7), (3L, 7.0e-9),
      (4L, 42.0)
    ).toDF("g", "x")
    val got = rows.groupBy("g")
      .agg(call_function("sorted_sum_fold", collect_list(col("x"))).as("s"))
    val want = rows.groupBy("g")
      .agg(aggregate(array_sort(collect_list(col("x"))), lit(0.0),
        (a, v) => a + v).as("s"))
    val g = got.orderBy("g").collect().map(r => (r.getLong(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    val w = want.orderBy("g").collect().map(r => (r.getLong(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    assert(g.sameElements(w), s"${g.toSeq} vs ${w.toSeq}")
  }

  test("term_contrib_fold == aggregate(array_sort(collect_list(struct)))" +
      " bit-for-bit, non-ASCII terms included") {
    import spark.implicits._
    GraftExtensions.install(spark)
    // binary-UTF8 order differs from UTF-16 String order for
    // supplementary chars — include one to pin the comparator choice
    val rows = Seq(
      (1L, "zebra", 1.0e16), (1L, "alpha", 1.0), (1L, "beta", 1.0),
      (1L, "😀", -1.0e16), (1L, "�", 0.25),
      (2L, "b", -0.0), (2L, "a", 1.0e-17), (2L, "c", 1.0)
    ).toDF("g", "term", "c")
    val got = rows.groupBy("g")
      .agg(call_function("term_contrib_fold",
        collect_list(struct(col("term"), col("c")))).as("s"))
    val want = rows.groupBy("g")
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (a, t) => a + t.getField("c")).as("s"))
    val g = got.orderBy("g").collect().map(r => (r.getLong(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    val w = want.orderBy("g").collect().map(r => (r.getLong(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    assert(g.sameElements(w), s"${g.toSeq} vs ${w.toSeq}")
  }

  test("rank_contrib_fold == term_contrib_fold == interpreted, bit-for-bit " +
      "— the rank map is order-preserving so the IEEE add order is identical") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val rows = Seq(
      (1L, "zebra", 1.0e16), (1L, "alpha", 1.0), (1L, "beta", 1.0),
      (1L, "😀", -1.0e16), (1L, "�", 0.25),
      (2L, "b", -0.0), (2L, "a", 1.0e-17), (2L, "c", 1.0),
      (3L, "only", 42.0)
    ).toDF("g", "term", "c")
    // the rank map exactly as scoreTail builds it: row_number over the
    // binary-UTF8-sorted distinct vocabulary
    val w = org.apache.spark.sql.expressions.Window.orderBy("term")
    val vocab = rows.select("term").distinct()
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(w))
    val ranked = rows.join(vocab, "term")
    val got = ranked.groupBy("g")
      .agg(call_function("rank_contrib_fold",
        collect_list(struct(col("r"), col("c")))).as("s"))
    val viaTerm = ranked.groupBy("g")
      .agg(call_function("term_contrib_fold",
        collect_list(struct(col("term"), col("c")))).as("s"))
    val interp = ranked.groupBy("g")
      .agg(aggregate(array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (a, t) => a + t.getField("c")).as("s"))
    def bits(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g").collect().map(r => (r.getLong(0),
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    val (g, t, i) = (bits(got), bits(viaTerm), bits(interp))
    assert(g.sameElements(t), s"rank vs term: ${g.toSeq} vs ${t.toSeq}")
    assert(t.sameElements(i), s"term vs interp: ${t.toSeq} vs ${i.toSeq}")
  }

  test("kernels run compiled in whole-stage codegen (no fallback)") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val df = Seq((1L, "a", 1.0)).toDF("g", "term", "c")
      .groupBy("g")
      .agg(call_function("term_contrib_fold",
        collect_list(struct(col("term"), col("c")))).as("s"),
        call_function("sorted_sum_fold", collect_list(col("c"))).as("z"))
    // both expressions implement doGenCode — the projection above the
    // aggregate must compile (a CodegenFallback would print as such)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    val row = df.collect().head
    assert(row.getDouble(1) == 1.0 && row.getDouble(2) == 1.0)
  }
}
