package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for inspecting how Spark reads the driver-provided
  * parquet (timestamp precision, schema inference). Not part of the engine. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    o.printSchema()
    o.show(2, truncate = false)
    spark.stop()
  }
}
