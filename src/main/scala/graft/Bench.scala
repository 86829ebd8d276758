package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is fully materialized through the `noop` sink (a bare
  * `count()` would let Catalyst prune the projection and undercount the
  * real work). One untimed warmup pass amortizes JIT + file-listing so the
  * timed numbers reflect steady-state executor throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = SparkEntry.registry.filter(_.headline)

    def runOnce(q: GraftQuery): Unit =
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    headline.foreach { q =>
      try runOnce(q)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup ${q.name} failed: ${e.getMessage}")
      }
    }
    // Median of >=3 timed passes per query, PASS-MAJOR: run the whole
    // suite `passes` times and take each query's median ACROSS suite runs.
    // Query-major (Seq.fill(passes)(timed(q))) samples one query's passes
    // back-to-back, so a box transient (GC storm, noisy neighbor) poisons
    // ALL samples of that query — round 8's q30 swung 0.56→3.68 s on
    // byte-identical code. Interleaving spreads a transient across
    // different queries' single samples, which the per-query median then
    // discards. The reported spread (max-min across runs) keeps the noise
    // floor visible. Cache reset between runs keeps one pass's leftovers
    // out of the next's time.
    def timed(q: GraftQuery): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try runOnce(q)
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    val passes = math.max(3, scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt).getOrElse(3))
    val samplesByQuery: Seq[Seq[Double]] = {
      val runs = Seq.fill(passes)(headline.map(timed))
      headline.indices.map(i => runs.map(_(i)).sorted)
    }
    val results = headline.zip(samplesByQuery).map { case (q, samples) =>
      val median =
        if (samples.length % 2 == 1) samples(samples.length / 2)
        else (samples(samples.length / 2 - 1) + samples(samples.length / 2)) / 2.0
      (q.name, median, samples.last - samples.head)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val spreads = results
      .map { case (k, _, s) => "\"" + k + f"\":$s%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spreads,"passes":$passes,"sf":"$sfDir"}"""
    // The driver parses the LAST stdout line as JSON: stop Spark first so no
    // shutdown logging trails it, and also persist to a file as a fallback
    // (round 1 lost the perf signal to a warning flood — parsed:null).
    spark.stop()
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_result.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    println(json)
  }
}
