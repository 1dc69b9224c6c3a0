package graft.queries

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

import graft.jobs.Pipeline
import graft.model.CheckRegistry

/** End-to-end TA-domain pipeline as driver-visible queries: DSv2 source
  * (one partition per account x check, stubbed fetch) -> ingest normalizer
  * -> partitioned lake -> catalog -> the 9 submitted Athena views.
  *
  * The lake is built ONCE per SparkSession (the stub corpus is
  * deterministic and independent of the scale-factor dir, and the lake
  * writes are append-mode, so re-running the pipeline per invocation would
  * both duplicate rows and pay ~10 write jobs each time); repeated
  * invocations just re-run the final view selects/aggregates.
  *
  * Oracle strategy: the pipeline materializes EVERY check table plus the
  * summary table (the lake's normalizer output) to fixed unpartitioned
  * parquet paths; each per-view query then submits the view's FULL rows
  * (timestamps surfaced as epoch micros, decimals as doubles — the
  * cross-engine determinism boundary), and the DuckDB oracle re-derives
  * the same view semantics (create-athena-views-lambda.py:84-160) from
  * the raw dump. A dialect slip in ANY view body — RDS's double-delete
  * money parse, RI expiration's ISO-'T' parse, summary_view's verbatim
  * '0'->'1' zero guard — therefore fails the driver's rows/schema/hash
  * gate instead of passing silently. */
object TaQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Root for the oracle's copies of the check/summary tables (overwritten
    * per session, identical content — the stub corpus is deterministic).
    * Configurable via GRAFT_Q35_DUMP (env) or graft.q35.dump (system
    * property); defaults under java.io.tmpdir so the queries never write
    * into the source checkout. The oracle SQL below interpolates the same
    * value, so Spark dump and DuckDB read always agree within a run. */
  val dumpRoot: String =
    sys.env.get("GRAFT_Q35_DUMP")
      .orElse(sys.props.get("graft.q35.dump"))
      // per-PROCESS unique default: a fixed path would let a concurrent
      // JVM's overwrite race this run's DuckDB oracle reads of the same
      // directory (the oracle SQL interpolates this value inside the same
      // JVM, so both sides still agree within a run)
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_ta_dump_qch7dwoux1_${ProcessHandle.current().pid()}")

  private val builtLake = new ConcurrentHashMap[SparkSession, String]()

  private def buildLake(spark: SparkSession): String = {
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
    // dump every check table + summary for the DuckDB oracle; disjoint
    // overwrite targets, so the writes are submitted concurrently (the
    // Pipeline.ingest pattern) instead of paying 9 sequential job launches
    val tables = CheckRegistry.supported.map(_.tableName) :+ "summary"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val dumps = tables.map { t =>
        scala.concurrent.Future {
          spark.table(t).drop("year", "month", "day")
            .write.mode("overwrite").parquet(s"$dumpRoot/$t")
        }
      }
      val settled = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          dumps.map(_.transform(scala.util.Success(_)))),
        scala.concurrent.duration.Duration.Inf)
      settled.foreach(_.get)
    } finally { pool.shutdownNow(); () }
    root
  }

  private def ensureLake(spark: SparkSession): Unit = {
    builtLake.computeIfAbsent(spark, buildLake(_)); ()
  }

  /** A view's full rows with engine-boundary casts: timestamps -> epoch
    * micros (exact integers), decimals -> double (exact for the parsed
    * 2/4-decimal values). Everything else passes through as the string
    * the lake holds. */
  private def viewRows(view: String): Q = (spark, _) => {
    ensureLake(spark)
    val v = spark.table(view)
    v.select(v.schema.fields.toIndexedSeq.map { f =>
      val c = col(s"`${f.name}`")
      f.dataType match {
        case TimestampType => unix_micros(c).as(f.name)
        case _: DecimalType => c.cast(DoubleType).as(f.name)
        case _ => c
      }
    }: _*)
  }

  private val builtStream = new ConcurrentHashMap[SparkSession, String]()

  /** Streamed twin of [[buildLake]]: the SAME stub corpus lands as
    * JSON-lines files in a watched directory and flows through
    * [[Pipeline.ingestStream]] (file source -> foreachBatch -> lake
    * appends) in TWO micro-batches (accounts 1-4, then 5-8, forced by
    * maxFilesPerTrigger=1) into a FRESH lake root. No catalog entries are
    * registered — the q35 session catalog keeps serving the batch lake —
    * so the oracle comparison below proves the continuous path's LAKE
    * BYTES reproduce the batch pipeline's, which is the at-least-once
    * sink's correctness claim when no batch is replayed. */
  private def buildStreamLake(spark: SparkSession): String = {
    val accounts = (1 to 8).map(i =>
      f"${100000000000L + i}%012d:Account $i:acct$i@example.com").mkString(",")
    val raw = spark.read.format("graft.sources.TaCheckResultSource")
      .option("accounts", accounts)
      .option("checks", CheckRegistry.supported.map(_.id).mkString(","))
      .option("date", "01-15-2024")
      .option("datetime", "2024-01-15 09:00:00")
      .load()
    val work = Files.createTempDirectory("graft-q98-stream").toString
    val landing = s"$work/landing"
    // two landing files -> two micro-batches; append-mode JSON writes
    // produce distinct part files under one watched dir
    raw.filter(col("AccountId") <= "100000000004")
      .coalesce(1).write.mode("append").json(landing)
    raw.filter(col("AccountId") > "100000000004")
      .coalesce(1).write.mode("append").json(landing)
    val root = s"$work/lake"
    Pipeline.ingestStream(spark, landing, Pipeline.Config(root),
      s"$work/ckpt", maxFilesPerTrigger = Some(1))
    root
  }

  /** q98: the continuous-ingest path must hash-equal the batch path. The
    * Spark side aggregates the STREAMED lake's flagship check table with
    * the view's money parse; the DuckDB oracle computes the identical
    * aggregate from the BATCH pipeline's dump of the same stub corpus
    * (q35's oracle SQL verbatim) — so any divergence between
    * foreachBatch appends and the one-shot batch write (lost rows,
    * duplicated appends, partition drift) hash-fails here. */
  def streamIngest(spark: SparkSession, dir: String): DataFrame = {
    ensureLake(spark) // the oracle reads the batch pipeline's dump
    val root = builtStream.computeIfAbsent(spark, buildStreamLake(_))
    spark.read.parquet(
        graft.lake.Lake.detailsPath(root, CheckRegistry.lowUtilEc2))
      .groupBy(col("accountid"))
      .agg(count(lit(1)).as("n_flagged"),
        sum(graft.functions.Functions.parseMoney(
          col("`estimated monthly savings`"))).cast(DoubleType)
          .as("total_savings"))
      .orderBy("accountid")
  }

  def taPipeline(spark: SparkSession, dir: String): DataFrame = {
    ensureLake(spark)
    spark.table("LowUtilizationAmazonEC2Instances_view")
      .groupBy(col("accountid"))
      .agg(count(lit(1)).as("n_flagged"),
        // exact decimal(18,2) sum from the view's money parse, surfaced as
        // double at the boundary (cross-engine determinism discipline)
        sum(col("estimated_monthly_savings")).cast(DoubleType)
          .as("total_savings"))
      .orderBy("accountid")
  }

  val queries: Map[String, Q] = Map(
    "q35_ta_pipeline" -> (taPipeline _),
    "q98_stream_ingest" -> (streamIngest _),
    "q51_view_ebs" -> viewRows("UnderutilizedAmazonEBSVolumes_view"),
    "q52_view_elb" -> viewRows("IdleLoadBalancers_view"),
    "q53_view_rds" -> viewRows("AmazonRDSIdleDBInstances_view"),
    "q54_view_redshift" -> viewRows("UnderutilizedAmazonRedshiftClusters_view"),
    "q55_view_route53" -> viewRows("Route53LatencyResourceRecordSets_view"),
    "q56_view_eip" -> viewRows("UnassociatedElasticIPAddresses_view"),
    "q57_view_ri_expiration" -> viewRows("EC2ReservedInstanceLeaseExpiration_view"),
    "q58_view_summary" -> viewRows("summary_view"),
    "q59_view_ec2_full" -> viewRows("LowUtilizationAmazonEC2Instances_view"))

  // ---- DuckDB re-derivations of create-athena-views-lambda.py:84-160 ----

  private def dump(table: String) =
    s"read_parquet('$dumpRoot/$table/*.parquet') t"

  /** `date_parse(substr(datetime,1,19),'%Y-%m-%d %T')` as epoch micros,
    * plus the lake's Hive partition columns (the registered tables carry
    * year/month/day exactly like the reference's Glue tables, so `t.*` in
    * every view includes them; the dump is unpartitioned, so the oracle
    * re-derives them from the MM-dd-yyyy ingest date). */
  private val dt =
    "epoch_us(strptime(substr(t.datetime, 1, 19), '%Y-%m-%d %H:%M:%S')) AS date_time, " +
      "CAST(split_part(t.date, '-', 3) AS INT) AS year, " +
      "CAST(split_part(t.date, '-', 1) AS INT) AS month, " +
      "CAST(split_part(t.date, '-', 2) AS INT) AS day"

  /** `CAST(rtrim(replace(substr(x,2),'$')) AS decimal(18,2))` -> double. */
  private def money(c: String, alias: String) =
    s"""CAST(CAST(rtrim(replace(substr(t."$c", 2), '$$', '')) AS DECIMAL(18,2)) AS DOUBLE) AS "$alias""""

  val oracles: Map[String, String] = Map(
    "q35_ta_pipeline" ->
      s"""SELECT accountid, count(*) AS n_flagged,
         CAST(sum(CAST(rtrim(replace(substr("estimated monthly savings", 2),
             '$$', '')) AS DECIMAL(18,2))) AS DOUBLE) AS total_savings
         FROM read_parquet('$dumpRoot/check_qch7dwoux1/*.parquet')
         GROUP BY accountid ORDER BY accountid""",
    // the STREAMED lake (Spark side) must reproduce the BATCH pipeline's
    // lake: the oracle is q35's aggregate over the batch dump, verbatim
    "q98_stream_ingest" ->
      s"""SELECT accountid, count(*) AS n_flagged,
         CAST(sum(CAST(rtrim(replace(substr("estimated monthly savings", 2),
             '$$', '')) AS DECIMAL(18,2))) AS DOUBLE) AS total_savings
         FROM read_parquet('$dumpRoot/check_qch7dwoux1/*.parquet')
         GROUP BY accountid ORDER BY accountid""",
    // :95-102
    "q51_view_ebs" ->
      s"""SELECT t.*, $dt,
         ${money("monthly storage cost", "Monthly_Storage_Cost")}
         FROM ${dump("check_davu99dc4c")}""",
    // :104-110
    "q52_view_elb" ->
      s"""SELECT t.*, $dt,
         ${money("estimated monthly savings", "estimated_monthly_savings")}
         FROM ${dump("check_hjlmh88um8")}""",
    // :112-119 — RDS: no substr, double delete of '$' and '"', decimal(10,2)
    "q53_view_rds" ->
      s"""SELECT t.*, $dt,
         CAST(CAST(rtrim(replace(replace(t."estimated monthly savings on demand",
             '$$', ''), '"', '')) AS DECIMAL(10,2)) AS DOUBLE)
           AS estimated_monthly_savings
         FROM ${dump("check_ti39halfu8")}""",
    // :121-126
    "q54_view_redshift" ->
      s"""SELECT t.*, $dt FROM ${dump("check_g31sq1e9u")}""",
    // :136-142
    "q55_view_route53" ->
      s"""SELECT t.*, $dt FROM ${dump("check_51fc20e7i2")}""",
    // :151-152
    "q56_view_eip" ->
      s"""SELECT t.*, $dt FROM ${dump("check_z4aubrnsmz")}""",
    // :128-134 — two money parses + the ISO-'T' expiration-date parse
    "q57_view_ri_expiration" ->
      s"""SELECT t.*, $dt,
         ${money("current monthly cost", "current_monthly_cost")},
         ${money("estimated monthly savings", "estimated_monthly_savings")},
         epoch_us(strptime(substr(replace(t."expiration date", 'T', ' '), 1, 19),
           '%Y-%m-%d %H:%M:%S')) AS expiration_date
         FROM ${dump("check_1e93e4c0b5")}""",
    // :144-149 — summary_view. Spark's decimal(10,2)/decimal(10,2) division
    // rounds HALF_UP at scale 13 (precision-loss rules), so the oracle
    // reproduces that rounding with exact integer arithmetic:
    //   n = round_half_up(F * 10^13 / P) = (2*F*10^13 + P) // (2*P)
    //   percent = (1 - n/10^13) * 100 = (10^15 - 100*n) / 10^13
    // then converts to double — both engines correctly round the exact
    // value, so the doubles match bitwise. P applies the view's verbatim
    // '0'->'1' string-replace zero guard.
    // n2's numerator (flagged - ignored - suppressed) CAN go negative
    // (ignored + suppressed > flagged); Spark's decimal HALF_UP rounds
    // away from zero while DuckDB's // floors toward -inf, so the
    // negative branch mirrors half-away-from-zero explicitly
    "q58_view_summary" ->
      s"""SELECT t.* EXCLUDE (p, f2, n1, n2), $dt,
         CAST(1000000000000000 - 100 * n1 AS DOUBLE) / 1e13
           AS "optimizationPercent",
         CAST(1000000000000000 - 100 * n2 AS DOUBLE) / 1e13
           AS "trueoptimizationPercent"
         FROM (SELECT t0.*,
           (2 * CAST(resourcesflagged AS BIGINT) * 10000000000000 + p)
             // (2 * p) AS n1,
           CASE WHEN f2 >= 0
             THEN (2 * f2 * 10000000000000 + p) // (2 * p)
             ELSE -((2 * (-f2) * 10000000000000 + p) // (2 * p))
           END AS n2
           FROM (SELECT *, CAST(replace(resourcesprocessed, '0', '1') AS BIGINT)
             AS p,
             CAST(resourcesflagged AS BIGINT)
               - CAST(resourcesignored AS BIGINT)
               - CAST(resourcessuppressed AS BIGINT) AS f2
             FROM read_parquet('$dumpRoot/summary/*.parquet')) t0) t""",
    // :84-93 — the flagship view's FULL rows (q35 gates its aggregate)
    "q59_view_ec2_full" ->
      s"""SELECT t.*, $dt,
         CAST(CAST(substr(t."14-day average cpu utilization", 1, 3)
           AS DECIMAL(10,4)) AS DOUBLE) AS average_cpu_utilization_14_days,
         CAST(CAST(substr(t."14-day average network i/o", 1, 4)
           AS DECIMAL(10,4)) AS DOUBLE)
           AS "average_network_i/o_utilization_14 days",
         ${money("estimated monthly savings", "estimated_monthly_savings")}
         FROM ${dump("check_qch7dwoux1")}""")
}
