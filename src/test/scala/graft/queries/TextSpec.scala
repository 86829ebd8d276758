package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for the text-analysis batch (hash-level correctness
  * runs against the DuckDB oracle). */
class TextSpec extends SparkSpec {

  test("q26 redaction leaves no PII behind and counts what it planted") {
    val out = SparkEntry.queries("q26_redact_pii")(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 7 == 6) {
        // untouched documents: nothing planted, nothing found
        assert(r.getAs[Int]("n_email") == 0)
        assert(r.getAs[Int]("n_phone") == 0)
        assert(r.getAs[Int]("n_ip") == 0)
      } else {
        assert(r.getAs[Int]("n_email") == 1)
        assert(r.getAs[Int]("n_phone") == 1)
        assert(r.getAs[Int]("n_ip") == 1)
      }
    }
    // the redacted bytes (only their md5 ships) must never contain a
    // survivor: rebuild one planted row end-to-end and check directly
    val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
    import spark.implicits._
    val sample = Seq((1L, "some text body"))
      .toDF("doc_id", "text")
      .withColumn("raw", concat(col("text"),
        lit(" contact user1@mail.example.com or +1-555-0001 at 10.1.0.7")))
      .withColumn("clean", regexp_replace(
        regexp_replace(
          regexp_replace(col("raw"), lit(emailRe), lit("<EMAIL>")),
          lit("\\+1-555-[0-9]{4}"), lit("<PHONE>")),
        lit("10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"), lit("<IP>")))
      .head().getAs[String]("clean")
    assert(sample == "some text body contact <EMAIL> or <PHONE> at <IP>")
  }

  test("q39 repetition filters: full coverage, consistent keep flag, sane fractions") {
    val rows = graft.SparkEntry.queries("q39_repetition_filters")(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "one verdict row per document")
    rows.foreach { r =>
      val (f2, f3, f5) = (r.getAs[Double]("frac_top2"),
        r.getAs[Double]("frac_top3"), r.getAs[Double]("frac_dup5"))
      // top-gram attribution counts every occurrence (overlap can push it
      // past 1, matching the published implementations); dup coverage
      // counts each char at most once, so it is a true fraction
      assert(f2 >= 0 && f3 >= 0 && f5 >= 0, r.toString)
      assert(f5 <= 1.0, s"dup coverage must count each char once: $r")
      assert(r.getAs[Boolean]("keep") == (f2 <= 0.2 && f3 <= 0.18 && f5 <= 0.15),
        s"keep flag inconsistent with thresholds: $r")
    }
    // the synthetic corpus draws from a small vocabulary: short docs
    // repeat 2-grams heavily, so the filter must actually separate
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      s"degenerate verdict: $kept of ${rows.length} kept")
  }
}
