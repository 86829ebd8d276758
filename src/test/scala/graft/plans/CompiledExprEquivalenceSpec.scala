package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compiled expressions exist purely for speed — these tests pin that
  * each one is value-identical to the interpreted higher-order spelling it
  * replaced, over the real test tables (the same equivalence the DuckDB
  * oracle asserts cross-engine, checked here intra-engine). */
class CompiledExprEquivalenceSpec extends SparkSpec {

  test("word_shingles == array_distinct(transform(sequence(...)))") {
    GraftExtensions.install(spark)
    val toks = split(col("text"), " ")
    val hofAll = transform(
      sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    val diff = graft.Tables.documents(spark, sfDir)
      .filter(size(toks) >= 3)
      .select(
        expr("word_shingles(text, 3)").as("compiled"),
        array_distinct(hofAll).as("hof"),
        // non-distinct mode (q39 occurrence counting): every gram, in order
        expr("word_shingles(text, 3, false)").as("c_all"), hofAll.as("h_all"))
      .filter(col("compiled") =!= col("hof") || col("c_all") =!= col("h_all"))
    assert(diff.isEmpty, diff.take(1).mkString)
  }

  test("char_ngrams == transform(sequence(...)) with and without distinct") {
    GraftExtensions.install(spark)
    val hof = transform(sequence(lit(1), length(col("text")) - 2),
      i => col("text").substr(i, lit(3)))
    val diff = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 3)
      .select(
        expr("char_ngrams(text, 3, false)").as("c_all"), hof.as("h_all"),
        expr("char_ngrams(text, 3, true)").as("c_d"), array_distinct(hof).as("h_d"))
      .filter(col("c_all") =!= col("h_all") || col("c_d") =!= col("h_d"))
    assert(diff.isEmpty, diff.take(1).mkString)
    // short texts: empty array, not an error
    import spark.implicits._
    assert(Seq("ab").toDF("text")
      .select(expr("char_ngrams(text, 3, false)")).head().getSeq[String](0).isEmpty)
    // non-BMP text: code-point boundaries, never split surrogate pairs
    // (each emoji below is one code point = two UTF-16 units)
    val nonBmp = Seq("a😀b🤖c", "😀😁😂x")
      .toDF("text")
      .select(
        expr("char_ngrams(text, 3, false)").as("c_all"), hof.as("h_all"),
        expr("char_ngrams(text, 3, true)").as("c_d"), array_distinct(hof).as("h_d"))
      .filter(col("c_all") =!= col("h_all") || col("c_d") =!= col("h_d"))
    assert(nonBmp.isEmpty, nonBmp.take(1).mkString)
    assert(Seq("a😀b").toDF("text")
      .select(expr("char_ngrams(text, 3, false)")).head()
      .getSeq[String](0) == Seq("a😀b"))
  }

  test("rolling_hash == aggregate(transform(sequence(...))) char fold") {
    GraftExtensions.install(spark)
    val hof = aggregate(
      transform(sequence(lit(1), length(col("text"))),
        i => ascii(col("text").substr(i, lit(1))).cast("long")),
      lit(0L),
      (h, c) => (h * 31 + c) % 1000000007L)
    val diff = graft.Tables.documents(spark, sfDir)
      .select(expr("rolling_hash(text)").as("compiled"), hof.as("hof"))
      .filter(col("compiled") =!= col("hof"))
    assert(diff.isEmpty, diff.take(1).mkString)
    import spark.implicits._
    assert(Seq("").toDF("text")
      .select(expr("rolling_hash(text)")).head().getLong(0) == 0L)
  }

  test("minhash_sigs == per-seed list-min folds") {
    GraftExtensions.install(spark)
    val hofSigs = (0 until 12).map(s =>
      array_min(transform(col("sh"), x => md5(concat(lit(s"$s:"), x)))))
    val diff = graft.Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(expr("word_shingles(text, 3)").as("sh"))
      .select(expr("minhash_sigs(sh, 12)").as("compiled"), array(hofSigs: _*).as("hof"))
      .filter(col("compiled") =!= col("hof"))
    assert(diff.isEmpty, diff.take(1).mkString)
  }

  test("minhash_sigs of an empty array is the 'g' sentinel vector") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val row = Seq(Seq.empty[String]).toDF("sh")
      .select(expr("minhash_sigs(sh, 3)")).head()
    assert(row.getSeq[String](0) == Seq("g", "g", "g"))
  }

  test("dot_fold == aggregate(zip_with(...)) bit-for-bit") {
    GraftExtensions.install(spark)
    val v = transform(col("embedding"), x => x.cast("double"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), v.as("v"))
      .select(expr("dot_fold(v, v)").as("compiled"), hof.as("hof"))
      // bit-exact comparison: the fold orders must match, not just be close
      .filter(col("compiled") =!= col("hof"))
    assert(diff.isEmpty, diff.take(1).mkString)
  }

  test("window_hashes == transform(rolling_hash(substring(...))) per window") {
    GraftExtensions.install(spark)
    // the O(len) rolling recurrence must equal the O(len·W) per-window
    // restart, window by window, over the real corpus
    val diff = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 48)
      .select(
        expr("window_hashes(text, 48)").as("compiled"),
        expr("transform(sequence(1, length(text) - 47), i -> rolling_hash(substring(text, i, 48)))").as("hof"))
      .filter(col("compiled") =!= col("hof"))
    assert(diff.isEmpty, diff.take(1).mkString)
    // short text: empty array, not an error
    import spark.implicits._
    assert(Seq("short").toDF("text")
      .select(expr("window_hashes(text, 48)")).head().getSeq[Long](0).isEmpty)
  }

  test("winnow_positions == array_distinct(transform(slice/array_min)) per window") {
    GraftExtensions.install(spark)
    // the monotonic-deque selection must equal the per-window
    // leftmost-min spelling (including its first-match tie-break) over
    // the real corpus's window-hash arrays
    val diff = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 55)
      .select(expr("window_hashes(text, 48)").as("hs"))
      .select(
        expr("winnow_positions(hs, 8)").as("compiled"),
        expr("""array_distinct(transform(sequence(1, size(hs) - 7),
                 i -> CAST(i - 1 + array_position(slice(hs, i, 8),
                                                  array_min(slice(hs, i, 8))) AS INT)))""").as("hof"))
      .filter(col("compiled") =!= col("hof"))
    assert(diff.isEmpty, diff.take(1).mkString)
    // shorter than k: selects nothing, not an error
    import spark.implicits._
    assert(Seq("a" * 50).toDF("text")
      .select(expr("winnow_positions(window_hashes(text, 48), 8)"))
      .head().getSeq[Int](0).isEmpty)
    // ties: equal minima select the LEFTMOST occurrence per window
    assert(Seq(Tuple1(Seq(5L, 3L, 3L, 9L))).toDF("hs")
      .select(expr("winnow_positions(hs, 3)")).head().getSeq[Int](0) == Seq(2))
  }

  test("sorted_intersect_count == size(array_intersect) on sorted gram arrays") {
    GraftExtensions.install(spark)
    // the q32 verify kernel: over every adjacent-doc pair of the real
    // corpus, the merge count must equal the hash-set spelling exactly
    val g = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 4)
      .select(col("doc_id"),
        array_sort(expr("char_ngrams(text, 4, true)")).as("gr"))
    val pairs = g.as("a").join(g.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
    val diff = pairs
      .select(
        expr("sorted_intersect_count(a.gr, b.gr)").as("merged"),
        size(array_intersect(col("a.gr"), col("b.gr"))).as("hashed"))
      .filter(col("merged") =!= col("hashed"))
    assert(diff.isEmpty, diff.take(1).mkString)
    // edge shapes: empty vs non-empty, identical, disjoint
    import spark.implicits._
    val edges = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "c", "e"), Seq("b", "c", "d", "e", "f"))).toDF("x", "y")
    val got = edges.select(expr("sorted_intersect_count(x, y)")).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 3, 0, 2), got.mkString(","))
  }

  test("sorted_hash64: sorted, length-preserving, order-independent, equality-faithful") {
    GraftExtensions.install(spark)
    val g = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 4)
      .select(expr("char_ngrams(text, 4, true)").as("gr"))
      .select(col("gr"),
        expr("sorted_hash64(gr)").as("hg"),
        // order-independence: hashing the sorted strings yields the same
        // sorted longs as hashing the scan order
        expr("sorted_hash64(array_sort(gr))").as("hg_sorted"))
    val bad = g.filter(
      size(col("hg")) =!= size(col("gr")) ||
        col("hg") =!= array_sort(col("hg")) ||
        col("hg") =!= col("hg_sorted"))
    assert(bad.isEmpty, bad.take(1).mkString)
    // equality-faithful on the real corpus: the number of distinct hashes
    // equals the number of distinct grams (no collisions on the fixture;
    // collisions would only INFLATE intersections — prune-safe — but the
    // test corpus must be clean so oracle parity is exact)
    val grams = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 4)
      .select(explode(expr("char_ngrams(text, 4, true)")).as("gram"))
      .select(col("gram"), expr("sorted_hash64(array(gram))")(0).as("h"))
    val nGrams = grams.select("gram").distinct().count()
    val nHashes = grams.select("h").distinct().count()
    assert(nGrams == nHashes, s"$nGrams grams but $nHashes hashes")
  }

  test("sorted_long_jaccard_ge == declarative double-division threshold") {
    GraftExtensions.install(spark)
    // the q32 hash-prune kernel: over adjacent-doc pairs of the real
    // corpus, the early-exit merge verdict must equal the naive
    // inter/(na+nb-inter) >= t comparison at several thresholds,
    // including degenerate ones
    val g = graft.Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 4)
      .select(col("doc_id"),
        expr("sorted_hash64(char_ngrams(text, 4, true))").as("hg"))
    val pairs = g.as("a").join(g.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.hg").as("x"), col("b.hg").as("y"))
    for (t <- Seq(0.0, 0.3, 0.6, 1.0)) {
      val diff = pairs.select(
          expr(s"sorted_long_jaccard_ge(x, y, CAST($t AS DOUBLE))").as("kernel"),
          (size(array_intersect(col("x"), col("y"))).cast("double") /
            (size(col("x")) + size(col("y")) -
              size(array_intersect(col("x"), col("y")))) >= t).as("naive"))
        .filter(col("kernel") =!= col("naive"))
      assert(diff.isEmpty, s"t=$t: ${diff.take(1).mkString}")
    }
    // identical arrays pass any t <= 1; disjoint fail any t > 0
    import spark.implicits._
    val edges = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L)))
      .toDF("x", "y")
    val got = edges.select(
      expr("sorted_long_jaccard_ge(x, y, CAST(0.6 AS DOUBLE))")).collect()
      .map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, false, false), got.mkString(","))
  }

  test("sorted_long_jaccard_ge rejects a non-finite threshold as an argument error") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(1L, 2L))).toDF("x", "y")
    // NaN/Infinity thresholds must fail at argument resolution with the
    // engine's message, not surface later as uncompilable generated Java
    for (bad <- Seq("CAST('NaN' AS DOUBLE)", "CAST('Infinity' AS DOUBLE)")) {
      val e = intercept[Exception] {
        df.select(expr(s"sorted_long_jaccard_ge(x, y, $bad)")).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("must be finite")), e.getMessage)
    }
    // ...and a subnormal-but-finite threshold still compiles through
    // codegen (the bits-emission path) and evaluates
    val ok = df.select(expr("sorted_long_jaccard_ge(x, y, CAST(4.9e-324 AS DOUBLE))"))
      .collect().map(_.getBoolean(0))
    assert(ok.toSeq == Seq(true))
  }

  test("rand u32 is roughly uniform over [0, 2^32)") {
    import graft.queries.Sampling.Rand
    val buckets = graft.Tables.documents(spark, sfDir)
      .select((Rand.u32(md5(concat(lit("u:"), col("doc_id")))) / lit(429496730L))
        .cast("int").as("decile"))
      .groupBy("decile").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keySet.subsetOf((0 to 9).toSet))
    // 500 docs over 10 buckets: each within a generous 3-sigma-ish band
    buckets.values.foreach(n => assert(n > 20 && n < 90, buckets.toString))
  }
}
