package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev-only: print the composed chain's executed plan (exchange count,
  * stateful operator order) for the SCALING partitioning claim. */
object ChainPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, String)]
    val q = CurationChain.curatedPacked(
        in.toDF().toDF("doc_id", "ts", "source", "text"))
      .writeStream.format("noop").outputMode("append").start()
    in.addData((1L to 100L).map(i =>
      (i, Timestamp.valueOf("2026-01-01 00:00:00"), s"s${i % 5}", s"w$i x y")))
    q.processAllAvailable()
    val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    println("=== CHAIN PLAN ===")
    println(plan)
    println("=== exchanges: " + "Exchange hashpartitioning".r.findAllIn(plan).length)
    q.stop(); spark.stop()
  }
}
