package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the TA pipeline through the public API —
  * sample code at the library surface (run with `Test/runMain
  * graft.DrivePipeline`). Prints the flagship view rows. */
object DrivePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val meta = (Seq("us-east-1a", "i-0aaa", "web-1", "t3.large", "$55.30") ++
      (1 to 14).map(d => s"$d.0%") ++ Seq("2.8%", "0.55%", "14 days"))
      .map(m => s""""$m"""").mkString("[", ",", "]")
    val doc =
      s"""{"result":{"checkId":"Qch7DwouX1","status":"warning",
         "resourcesSummary":{"resourcesProcessed":120,"resourcesFlagged":14,
         "resourcesIgnored":1,"resourcesSuppressed":2},
         "categorySpecificSummary":{"costOptimizing":{
         "estimatedMonthlySavings":1234.56,"estimatedPercentMonthlySavings":0.17}},
         "flaggedResources":[{"status":"warning","region":"us-east-1",
         "resourceId":"r1","isSuppressed":false,"metadata":$meta}]}}"""
    val raw = Seq((doc, "01-15-2024", "2024-01-15 09:00:00",
      "Low Utilization Amazon EC2 Instances",
      "123456789012", "Acme Corp", "ops@acme.example"))
      .toDF("json", "Date", "DateTime", "CheckName",
        "AccountId", "AccountName", "AccountEmail")
    val tagObs = Seq(
      ("arn:aws:ec2:us-east-1:123456789012:instance/i-0aaa",
        "CostCenter", "cc-123", 1L))
      .toDF("ResourceArn", "Key", "Value", "obs_seq")
      .withColumn("RegionName", lit("us-east-1"))
      .withColumn("ResourceType", lit("ec2:instance"))
      .withColumn("Date", lit("01-15-2024"))
      .withColumn("DateTime", lit("2024-01-15 09:00:00"))
      .withColumn("AccountId", lit("123456789012"))
      .withColumn("AccountName", lit("Acme Corp"))
      .withColumn("AccountEmail", lit("ops@acme.example"))

    val root = java.nio.file.Files.createTempDirectory("drive-lake").toString
    val created = graft.jobs.Pipeline.run(spark, raw, Some(tagObs),
      graft.jobs.Pipeline.Config(root, tagKeys = Seq("CostCenter")))
    println("VIEWS_CREATED=" + created.mkString(","))
    spark.table("LowUtilizationAmazonEC2Instances_view")
      .select($"`instance id`", $"estimated_monthly_savings", $"date_time",
        $"costcenter").show(false)
    spark.table("summary_view")
      .select($"checkid", $"optimizationPercent", $"trueoptimizationPercent")
      .show(false)
    println("DRIVE_OK")
    spark.stop()
  }
}
