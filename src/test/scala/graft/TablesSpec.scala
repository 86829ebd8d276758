package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events `ts` normalizer must keep every historical testdata schema
  * readable: the driver has shipped events.parquet as TIMESTAMP(NANOS)
  * (surfacing as a nanos LongType under the legacy switch) and as
  * TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ). Round 12 lost all 13
  * events queries to the silent switch from the former to the latter —
  * this spec pins the dispatch on synthetic frames of each shape. */
class TablesSpec extends SparkSpec {

  private val us = 1723500000123456L // 2024-08-12T21:20:00.123456Z

  test("nanos-long ts truncates to microseconds by integer division") {
    import spark.implicits._
    val raw = Seq((1L, us * 1000L + 999L)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTs(raw)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got == us, s"expected truncation to $us, got $got")
  }

  test("TIMESTAMP_NTZ ts casts value-preserving under the UTC session zone") {
    val raw = spark.range(1).select(col("id").as("event_id"),
      timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"))
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeEventTs(raw)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == us)
  }

  test("plain TIMESTAMP ts passes through untouched") {
    val raw = spark.range(1).select(col("id").as("event_id"),
      timestamp_micros(lit(us)).as("ts"))
    val out = Tables.normalizeEventTs(raw)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == us)
  }

  test("the real events table loads with a usable TIMESTAMP ts") {
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ts").dataType == TimestampType)
    // unix_micros is what q15/q77 lean on — it must resolve
    assert(e.select(unix_micros(col("ts"))).head.getLong(0) > 0L)
  }
}
