package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only q32 STAGE timing probe: times the checkpointed gram build,
  * the prefix materialization, the candidate join, and the two verify
  * stages separately (each stage's checkpoint barrier makes the split
  * meaningful). Test scope, not shipped. */
object Q32StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q32stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { pass =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(s"[q32stage] === pass $pass ===")
      val st = t("stages construction (gram build + prefix checkpoints)") {
        Dedup.q32Stages(spark, dir)
      }
      val nc = t("candidate join + distinct")(st.cand.count())
      val nh = t("hash verify (early-exit in join cond)")(st.hashVerify.count())
      val nr = t("exact re-verify")(st.result.count())
      println(s"[q32stage] cand=$nc hash=$nh result=$nr")
    }
    spark.stop()
  }
}
