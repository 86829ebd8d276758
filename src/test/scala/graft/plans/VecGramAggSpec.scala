package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge behavior of the vec_gram aggregate: empty input, NULL rows,
  * mixed-dimension failure, and the packed-layout contract. */
class VecGramAggSpec extends SparkSpec {

  private def install(): Unit = GraftExtensions.install(spark)

  test("empty input yields the empty summary [0, 0]") {
    install()
    import spark.implicits._
    val out = Seq.empty[Seq[Long]].toDF("qv")
      .agg(expr("vec_gram(qv)")).collect().head.getSeq[Long](0)
    assert(out === Seq(0L, 0L))
  }

  test("NULL rows are skipped, not counted") {
    install()
    import spark.implicits._
    val out = Seq(Some(Seq(1L, 2L)), None, Some(Seq(3L, 4L)))
      .toDF("qv").agg(expr("vec_gram(qv)")).collect().head.getSeq[Long](0)
    // n=2, d=2, triangle = [1*1+3*3, 1*2+3*4, 2*2+4*4]
    assert(out === Seq(2L, 2L, 10L, 14L, 20L))
  }

  test("mixed dimensions fail loudly") {
    install()
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L))
        .toDF("qv").agg(expr("vec_gram(qv)")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("mixed vector dimensions")), ex.getMessage)
  }

  test("packed layout matches the scaladoc index formula") {
    install()
    import spark.implicits._
    val v = Seq(2L, 3L, 5L)
    val out = Seq(v).toDF("qv")
      .agg(expr("vec_gram(qv)")).collect().head.getSeq[Long](0)
    assert(out.take(2) === Seq(1L, 3L))
    val d = 3
    for (i <- 0 until d; j <- i until d) {
      val idx = i * d - i * (i - 1) / 2 + (j - i)
      assert(out(2 + idx) === v(i) * v(j), s"($i,$j)")
    }
  }
}
