package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.model.CheckRegistry

/** CLI entry point: run the full TA pipeline (DSv2 source -> ingest ->
  * partitioned lake -> catalog -> views) and print a view summary.
  *
  *   runMain graft.jobs.RunPipeline /tmp/ta-lake [nAccounts]
  *
  * This is the deployable shape of the reference's four Step Functions
  * state machines: one Spark job, fan-out via source partitions.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val lakeRoot = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-lake").toString)
    val nAccounts = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ta-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ONE UTC clock read: two separate now() calls could straddle
    // midnight (date and datetime a day apart), and the session's
    // timestamp semantics are pinned to UTC
    val now = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
    val date = now.toLocalDate
    val dateStr = date.format(
      java.time.format.DateTimeFormatter.ofPattern("MM-dd-yyyy"))
    val dtStr = now.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val accounts = (1 to nAccounts).map(i =>
      f"${100000000000L + i}%012d:Account $i:acct$i@example.com").mkString(",")

    // P9/P10: the refresh → poll-until-fresh gate runs ahead of the
    // extraction scan, exactly where the state machine's Choice loop sits
    // (template:1247-1304) — per (account, check), refresh then poll until
    // the status leaves enqueued/processing
    val pairs = for {
      i <- 1 to nAccounts
      c <- graft.model.CheckRegistry.supported.map(_.id)
    } yield (f"${100000000000L + i}%012d", c)
    val outcomes = graft.sources.Refresh.awaitAll(
      new graft.sources.TaRefreshStub, pairs)
    println(s"refresh: ${outcomes.size} pairs, " +
      s"${outcomes.map(_.polls).sum} verify calls, " +
      s"${outcomes.count(_.exhausted)} exhausted")

    val raw = spark.read.format("graft.sources.TaCheckResultSource")
      .option("accounts", accounts)
      .option("checks", CheckRegistry.supported.map(_.id).mkString(","))
      .option("date", dateStr)
      .option("datetime", dtStr)
      .load()

    val created = Pipeline.run(spark, raw, None, Pipeline.Config(lakeRoot))
    println(s"lake=$lakeRoot")
    println(s"views=${created.mkString(",")}")
    created.foreach { v =>
      println(f"$v%-45s rows=${spark.table(v).count()}")
    }
    spark.stop()
  }
}
