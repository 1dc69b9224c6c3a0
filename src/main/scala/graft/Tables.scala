package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-lake table loader. One parquet file per table under the scale-factor
  * directory (see TESTDATA.md). Reads are lazy DataFrames — projection and
  * predicates push down to the parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is nanosecond-precision INT64 parquet, which Spark 4 refuses
    * to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). We read it with an
    * explicit LongType schema (the physical type), exposing exact epoch
    * nanoseconds; queries derive `ts_us = ts DIV 1000`, which equals
    * DuckDB's `epoch_us(ts)` exactly (DuckDB truncates ns->us on read).
    * Keeping integer microseconds as the common currency makes ordering,
    * join keys, and output values bit-identical across engines. */
  private val eventsSchema =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events")
      spark.read.schema(eventsSchema).parquet(s"$sfDir/$name.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")
}
