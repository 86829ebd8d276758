package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Accuracy pin for the deterministic ln kernel: within 2 ulp of
  * `Math.log` across the BM25-idf domain and the documented [1, 2^41)
  * range. Cross-ENGINE parity (the kernel's reason to exist) is proven by
  * the q127/q128 oracle gate; this spec proves the deterministic series is
  * also a CORRECT log, not just a reproducible one. */
class DetMathSpec extends SparkSpec {

  private def ulpDiff(a: Double, b: Double): Long =
    math.abs(java.lang.Double.doubleToRawLongBits(a) -
      java.lang.Double.doubleToRawLongBits(b))

  private def check(xs: Seq[Double]): Unit = {
    import spark.implicits._
    val got = xs.toDF("x")
      .withColumn("lnx", DetMath.lnCol(col("x")))
      .collect()
      .map(r => r.getDouble(0) -> r.getDouble(1))
    got.foreach { case (x, lnx) =>
      val want = math.log(x)
      assert(ulpDiff(lnx, want) <= 2,
        s"ln($x): got $lnx want $want (${ulpDiff(lnx, want)} ulp)")
    }
  }

  test("exact anchor points") {
    import spark.implicits._
    val got = Seq(1.0, 2.0, 4.0, 1024.0).toDF("x")
      .withColumn("lnx", DetMath.lnCol(col("x"))).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(1.0) == 0.0, "ln(1) must be exactly 0 (z = 0 kills the series)")
    assert(ulpDiff(got(2.0), math.log(2.0)) <= 1)
    assert(ulpDiff(got(1024.0), 10 * DetMath.Ln2) <= 2)
  }

  test("idf domain: x = 1 + (N - df + 0.5)/(df + 0.5) for N = 500") {
    val n = 500L
    check((1L to n).map(df => 1.0 + (n - df + 0.5) / (df + 0.5)))
  }

  test("range sweep incl. power-of-two boundaries up to 2^40") {
    val rng = new scala.util.Random(42)
    val sweep = (0 until 2000).map(_ => 1.0 + rng.nextDouble() * ((1L << 40) - 1))
    val boundaries = (1 to 40).flatMap { e =>
      val p = math.pow(2.0, e)
      Seq(p, math.nextUp(p), math.nextDown(p))
    }
    check(sweep ++ boundaries :+ math.nextUp(1.0))
  }
}
