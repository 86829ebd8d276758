package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only probe: as-of join cost vs RIGHT-PAYLOAD WIDTH, native operator
  * vs union-window composition. The union-window spelling must drag every
  * right payload column through the merged-stream sort and a
  * last(ignoreNulls) window EACH; the native merge carries payloads only
  * through the right side's own exchange+sort. Args: <dir> <nPayload>. */
object AsOfWidthProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nPayloadS) = args
    val nPayload = nPayloadS.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val payloadCols = (1 to nPayload).map(i =>
      concat(col("o_orderkey").cast("string"), lit(s"#pay$i")).as(s"pay$i"))
    val ev = graft.Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val ord = graft.Tables.orders(spark, dir)
      .select(col("o_custkey") +: col("o_orderdate") +: col("o_orderkey") +:
        payloadCols: _*)

    def native(): DataFrame =
      AsOf.join(ev, ord, Seq("user_id"), Seq("o_custkey"), "ts", "o_orderdate",
        tieBreak = Seq("o_orderkey"))

    def unionWindow(): DataFrame = {
      val payNames = (1 to nPayload).map(i => s"pay$i")
      val e = ev.select(Seq(col("user_id").as("key"), col("ts"),
        lit(1).as("flag"), col("event_id"),
        lit(null).cast("long").as("o_orderkey")) ++
          payNames.map(p => lit(null).cast("string").as(p)): _*)
      val o = ord.select(Seq(col("o_custkey").as("key"),
        col("o_orderdate").as("ts"), lit(0).as("flag"),
        lit(null).cast("long").as("event_id"), col("o_orderkey")) ++
          payNames.map(col): _*)
      val w = Window.partitionBy("key").orderBy("ts", "flag", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val carried = ("o_orderkey" +: payNames).foldLeft(e.unionByName(o)) {
        (df, c) => df.withColumn(s"last_$c", last(col(c), ignoreNulls = true).over(w))
      }
      carried.filter(col("flag") === 1)
    }

    def pass(f: () => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for ((name, f) <- Seq("native" -> (native _), "unionwin" -> (unionWindow _))) {
      pass(f); pass(f)
      val s = (1 to 3).map(_ => pass(f))
      println(f"[asofwidth] $name dir=$dir pay=$nPayload min=${s.min}%.2f med=${s.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
