package graft

/** The events loader's cross-round contract: `ts` always surfaces as
  * exact epoch NANOSECONDS (LongType) no matter which physical encoding
  * the test lake shipped — annotated timestamp[us] (the driver's current
  * generator) or plain-INT64 nanoseconds (earlier rounds). The round-7
  * regression this pins: a regenerated lake switched encodings and the
  * forced-Long read silently misread micros as nanos, collapsing every
  * time-derived value 1000x across 8 oracle queries.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val t0Us = 1704067200000000L // 2024-01-01T00:00:00Z in micros

  test("events loader surfaces epoch nanos for both physical encodings") {
    val base = java.nio.file.Files.createTempDirectory("tables-spec").toString

    // annotated timestamp (tz-naive micros -> Spark infers NTZ)
    val usDir = s"$base/us"
    spark.sql(
      """SELECT 1L AS event_id,
         TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts,
         2L AS user_id, 'click' AS event_type, 1.5 AS value,
         '{}' AS props""")
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")
    val us = Tables(spark, usDir, "events")
    assert(us.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(us.select("ts").as[Long].head() == t0Us * 1000L)

    // plain INT64 nanoseconds (no logical annotation)
    val nsDir = s"$base/ns"
    Seq((1L, t0Us * 1000L, 2L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nsDir/events.parquet")
    val ns = Tables(spark, nsDir, "events")
    assert(ns.select("ts").as[Long].head() == t0Us * 1000L)
  }
}
