package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** Accounts driver-table sources (S4/S5,
  * `source/get-accounts-info-lambda.py:104-170`).
  *
  * The CSV variant reproduces the reference's header-position detection: it
  * scans the header row for cells equal (case-insensitively, trimmed) to
  * accountid/accountname/accountemail and reads those positions — column
  * order in the file doesn't matter, extra columns are ignored
  * (get-accounts-info-lambda.py:137-153). */
object AccountsSource {

  /** From CSV with arbitrary column order/extras. Adds the run's Date
    * (MM-dd-yyyy) / DateTime stamps like :110-111, filters ACTIVE (P6) if a
    * status column exists. */
  def fromCsv(spark: SparkSession, path: String, date: String,
      dateTime: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    def find(name: String): Option[String] =
      raw.columns.find(_.trim.equalsIgnoreCase(name))
    val id = find("accountid").getOrElse(
      sys.error(s"no accountid column in $path: ${raw.columns.mkString(",")}"))
    val nameCol = find("accountname").getOrElse(id)
    val email = find("accountemail").getOrElse(id)
    // the reference strips every cell (get-accounts-info-lambda.py:145-148)
    // — whitespace-padded CSV cells must not leak into account ids the
    // whole lake keys on (equality joins, assume-role ARNs)
    val statusFiltered = find("status") match {
      case Some(s) => raw.filter(upper(trim(col(s"`$s`"))) === "ACTIVE")
      case None => raw
    }
    statusFiltered.select(
      trim(col(s"`$id`")).as("AccountId"),
      trim(col(s"`$nameCol`")).as("AccountName"),
      trim(col(s"`$email`")).as("AccountEmail"),
      lit(date).as("Date"), lit(dateTime).as("DateTime"))
  }

  /** PII-masked projection of an accounts frame (sanitize_json,
    * get-accounts-info-lambda.py:78-95). */
  def masked(accounts: DataFrame): DataFrame = accounts
    .withColumn("AccountId", maskAccountId(col("AccountId")))
    .withColumn("AccountName", maskNameEmail(col("AccountName")))
    .withColumn("AccountEmail", maskNameEmail(col("AccountEmail")))
}
