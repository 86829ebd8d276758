package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only round-20 optimization probe: splits a registered query's
  * wall time into (a) DataFrame construction — any eager work the
  * builder itself runs (index memo ensure, localCheckpoint barriers,
  * driver collects inside the builder), (b) analysis+optimization+
  * physical planning of the final frame, (c) execution through the noop
  * sink. Args: <dir> <query>... — fresh JVM per invocation, the
  * SCALING.md method. Run: `sbt "Test/runMain graft.queries.R20PhaseProbe
  * /root/testdata/sf0.1 q134_postings_decontam"`. */
object R20PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // one full warmup (memo builds, JIT)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        def jobs(): Int =
          spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
        val j0 = jobs()
        val (tBuild, df) = t(fn(spark, dir))
        val jBuild = jobs() - j0
        val (tPlan, _) = t(df.queryExecution.executedPlan)
        val (tExec, _) =
          t(df.write.format("noop").mode("overwrite").save())
        println(f"[r20phase] $name pass$i build=$tBuild%.2f " +
          f"plan=$tPlan%.2f exec=$tExec%.2f total=${tBuild + tPlan + tExec}%.2f " +
          f"buildJobs=$jBuild jobs=${jobs() - j0}")
      }
    }
    spark.stop()
  }
}
