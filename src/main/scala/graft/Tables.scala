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

  /** events.ts contract: every query sees `ts` as exact epoch NANOSECONDS
    * (LongType) and derives `ts_us = ts DIV 1000`, which equals DuckDB's
    * `epoch_us(ts)` exactly. Keeping integer microseconds as the common
    * currency makes ordering, join keys, and output values bit-identical
    * across engines.
    *
    * The test lake has shipped two physical encodings of the column:
    *  - timestamp[us] (annotated INT64): Spark infers TimestampType; we
    *    rebuild the nanos long as `unix_micros(ts) * 1000`.
    *  - timestamp[ns] (plain INT64 ns): Spark 4 refuses to infer it
    *    ([PARQUET_TYPE_ILLEGAL]), so inference throws and we fall back to
    *    an explicit LongType schema over the physical type — already ns.
    * Both are footer-level decisions (no data scan) resolved per path. */
  private val eventsNsSchema =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"

  private def events(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val inferred = scala.util.Try(spark.read.parquet(path).schema)
    inferred.toOption.flatMap(s => s.fields.find(_.name == "ts")) match {
      // tz-naive parquet infers NTZ; the session tz is pinned UTC
      // project-wide (build.sbt -D + every builder), so the NTZ->TS cast
      // is the identity on the stored micros — same instant DuckDB's
      // epoch_us(ts) reads.
      case Some(f) if f.dataType == TimestampType
          || f.dataType == TimestampNTZType =>
        spark.read.parquet(path)
          .withColumn("ts",
            unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ =>
        spark.read.schema(eventsNsSchema).parquet(path)
    }
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, s"$sfDir/$name.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")
}
