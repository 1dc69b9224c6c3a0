package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.Pipeline
import graft.model.CheckRegistry

/** End-to-end TA-domain pipeline as a driver-visible query: DSv2 source
  * (one partition per account x check, stubbed fetch) -> ingest normalizer
  * -> partitioned lake -> catalog -> the flagship view -> an aggregate over
  * it. Deterministic output, but the inputs are TA documents rather than
  * the DuckDB-registered tables, so there is no SQL oracle — the driver
  * records the rows-only check. Full value-level assertions live in
  * TaPipelineSpec/SourcesSpec. */
object TaQueries {
  type Q = (SparkSession, String) => DataFrame

  def taPipeline(spark: SparkSession, dir: String): DataFrame = {
    val accounts = (1 to 8).map(i =>
      f"${100000000000L + i}%012d:Account $i:acct$i@example.com").mkString(",")
    val raw = spark.read.format("graft.sources.TaCheckResultSource")
      .option("accounts", accounts)
      .option("checks", CheckRegistry.supported.map(_.id).mkString(","))
      .option("date", "01-15-2024")
      .option("datetime", "2024-01-15 09:00:00")
      .load()
    val root = Files.createTempDirectory("graft-q35-lake").toString
    Pipeline.run(spark, raw, None, Pipeline.Config(root))
    spark.table("LowUtilizationAmazonEC2Instances_view")
      .groupBy(col("accountid"))
      .agg(count(lit(1)).as("n_flagged"),
        sum(col("estimated_monthly_savings")).as("total_savings"))
      .orderBy("accountid")
  }

  val queries: Map[String, Q] = Map("q35_ta_pipeline" -> (taPipeline _))
  val oracles: Map[String, String] = Map.empty
}
