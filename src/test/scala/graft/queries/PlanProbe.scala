package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev-only generic plan probe: print the join/exchange/window skeleton of
  * any registry query's executed plan (the grep-level audit `.explain` is
  * run through before a new operator's plan is accepted — see SCALING.md).
  * Args: <query> <dir>. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(q, dir) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.SparkEntry.queries(q)(spark, dir)
      .queryExecution.executedPlan.toString
    println(s"=== $q skeleton ===")
    plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Cartesian") || l.contains("Window") ||
        l.contains("Scan parquet"))
      .foreach(l => println(l.replaceAll("#\\d+L?", "").take(200)))
    spark.stop()
  }
}
