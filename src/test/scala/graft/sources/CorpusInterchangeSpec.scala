package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** JSONL corpus interchange: lossless round-trip against the parquet
  * table, and the corrupt-line quarantine path (one bad line must not
  * kill the read OR silently vanish). */
class CorpusInterchangeSpec extends SparkSpec {

  private def docRows = graft.Tables.documents(spark, sfDir)
    .select("doc_id", "text", "lang", "source", "n_chars")
    .collect().map(_.toSeq).toSet

  test("write → read round-trips the documents table losslessly") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    CorpusInterchange.writeDocumentsJsonl(
      graft.Tables.documents(spark, sfDir), dir, shards = Some(2))
    val back = CorpusInterchange.readDocumentsJsonlClean(spark, dir)
    assert(back.collect().map(_.toSeq).toSet == docRows)
    assert(CorpusInterchange.corruptLines(spark, dir).count() == 0)
  }

  test("a malformed line quarantines; valid rows still load") {
    val dir = Files.createTempDirectory("jsonl_bad").toString
    Files.writeString(Paths.get(s"$dir/part-0.jsonl"),
      """{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}
        |{"doc_id": oops not json
        |{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}
        |""".stripMargin)
    val clean = CorpusInterchange.readDocumentsJsonlClean(spark, dir)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
    val bad = CorpusInterchange.corruptLines(spark, dir)
      .collect().map(_.getString(0))
    assert(bad.length == 1 && bad.head.contains("oops"))
    // strict mode surfaces the failure instead
    intercept[Exception] {
      CorpusInterchange.readDocumentsJsonl(spark, dir, strict = true)
        .collect()
    }
  }
}
