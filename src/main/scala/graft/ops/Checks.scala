package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints computed in ONE aggregation pass
  * (the Deequ idea, engine-native): a check suite compiles to a single
  * `agg(...)` over the table — completeness, uniqueness, bounds, and
  * membership all share the same scan, so at 100 TB the quality gate
  * costs exactly one pass however many constraints ride on it. The
  * output is a tall (check, metric, passed) report — the relation a WAP
  * audit or a monitoring sink consumes directly.
  *
  * Determinism: counts are exact; ratio metrics are single double
  * divisions of exact longs.
  */
object Checks {

  sealed trait Check {
    def name: String
    /** Aggregate expressions this check needs (names prefixed). */
    private[Checks] def aggs: Seq[Column]
    /** metric value and pass verdict from the aggregated row. */
    private[Checks] def result(prefix: String): (Column, Column)
  }

  /** Fraction of non-null values == 1.0 (or a floor). */
  final case class Complete(col_ : String, atLeast: Double = 1.0)
      extends Check {
    val name = s"complete($col_)"
    private[Checks] def aggs = Seq(
      count(col(col_)).as(s"${key}_n"), count(lit(1)).as(s"${key}_t"))
    private[Checks] def result(p: String) = {
      val m = col(s"$p${key}_n").cast("double") /
        col(s"$p${key}_t").cast("double")
      (m, m >= atLeast)
    }
    private def key = s"c_${col_}"
  }

  /** Distinct count equals row count (a key). */
  final case class Unique(col_ : String) extends Check {
    val name = s"unique($col_)"
    private[Checks] def aggs = Seq(
      countDistinct(col(col_)).as(s"${key}_d"),
      count(col(col_)).as(s"${key}_n"))
    private[Checks] def result(p: String) = {
      val m = col(s"$p${key}_d").cast("double") /
        col(s"$p${key}_n").cast("double")
      (m, col(s"$p${key}_d") === col(s"$p${key}_n"))
    }
    private def key = s"u_${col_}"
  }

  /** Every value inside [lo, hi]. */
  final case class InRange(col_ : String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range($col_)"
    private[Checks] def aggs = Seq(
      count(when(col(col_) < lo || col(col_) > hi, 1)).as(s"${key}_v"))
    private[Checks] def result(p: String) =
      (col(s"$p${key}_v").cast("double"), col(s"$p${key}_v") === 0L)
    private def key = s"r_${col_}"
  }

  /** Every value in the allowed set. */
  final case class InSet(col_ : String, allowed: Seq[String])
      extends Check {
    val name = s"in_set($col_)"
    private[Checks] def aggs = Seq(
      count(when(!col(col_).isin(allowed.map(lit): _*), 1))
        .as(s"${key}_v"))
    private[Checks] def result(p: String) =
      (col(s"$p${key}_v").cast("double"), col(s"$p${key}_v") === 0L)
    private def key = s"s_${col_}"
  }

  /** At least `atLeast` rows. */
  final case class MinRows(atLeast: Long) extends Check {
    val name = "min_rows"
    private[Checks] def aggs = Seq(count(lit(1)).as("mr_n"))
    private[Checks] def result(p: String) =
      (col(s"${p}mr_n").cast("double"), col(s"${p}mr_n") >= atLeast)
  }

  /** Run the suite: ONE aggregation over `df`, then one row per check:
    * (check, metric, passed). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggs = checks.flatMap(_.aggs)
    // distinct agg aliases may collide across checks on the same column
    // — Spark would throw on duplicate names, which is the right loud
    // failure for a miswritten suite
    val row = df.agg(aggs.head, aggs.tail: _*)
    val reports = checks.map { c =>
      val (m, p) = c.result("")
      struct(lit(c.name).as("check"), m.as("metric"), p.as("passed"))
    }
    row.select(explode(array(reports: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.passed"))
  }

  /** The suite as a WAP-style boolean gate: true iff every check passes
    * (drives [[graft.lake.ManifestCommit.stageAndPublish]] audits). */
  def gate(df: DataFrame, checks: Seq[Check]): Boolean =
    run(df, checks).filter(!col("passed")).isEmpty

  /** EXACT per-group lower median of an integer column: the value at
    * rank (n+1) div 2 of the group's ascending sort — deterministic
    * under ties (only the value at the rank is emitted, and any tie
    * ordering puts the same value there). One per-group window sort;
    * this is the exact profiling tool for grouped distributions whose
    * groups fit a partition — at unbounded group sizes the mergeable
    * histogram sketch (q142) is the scale path, this is the truth it
    * is graded against. */
  def exactGroupMedian(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
    v.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("g").as(groupCol), col("v").as("median_v"),
        col("n").as("n_rows"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007) — the privacy gate a tabular corpus passes BEFORE it may be
    * trained on or released: every quasi-identifier combination must
    * be shared by >= k rows (otherwise those rows are re-identifiable
    * by joining public data on the quasi-identifiers), and carry >= l
    * distinct sensitive values (otherwise membership in the group
    * leaks the sensitive value even at k-anonymity). Emits one row per
    * equivalence class: size, distinct sensitive count, and the two
    * violation flags — the suppression worklist IS the flagged rows.
    *
    * Shape at scale: ONE hash aggregation over the quasi-identifier
    * key (count + count distinct, map-side partials); no window, no
    * join, no sort. Complements the row-level PII masks (P12) — masks
    * remove direct identifiers, this audits the INDIRECT ones. */
  /** Robust per-group outlier detection — median absolute deviation
    * (the robust z-score): a row is an outlier when its distance from
    * the group's (lower) median exceeds `t` x the group's MAD.
    * Mean/stddev break down exactly when outliers are present (the
    * outliers drag the threshold); the median/MAD pair doesn't, and on
    * pre-quantized integer values the whole gate is exact integer
    * arithmetic — no engine-library stddev doubles. NULL values are
    * excluded up front (Spark and DuckDB disagree on NULL sort
    * placement; an explicit filter keeps the rank math identical).
    *
    * Shape at scale: two per-group window sorts (the [[exactGroupMedian]]
    * caveat — groups must fit a partition; the mergeable histogram
    * sketch q142 is the unbounded-group path) plus two keyed joins
    * against the 1-row-per-group medians. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      t: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy("g")
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    def lowerMedian(in: DataFrame, c: String) =
      in.withColumn("rn", row_number().over(wg.orderBy(c)))
        .withColumn("n", count(lit(1)).over(wg))
        .filter(col("rn") === expr("(n + 1) div 2"))
    val med = lowerMedian(v, "v").select(col("g"), col("v").as("med"))
    val dev = v.join(med, "g").withColumn("d", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.select(col("g"), col("d")), "d")
      .select(col("g"), col("d").as("mad"))
    dev.join(mad, "g")
      .select(col("g").as(groupCol), col("v").as(valueCol),
        col("med"), col("mad"), (col("d") > col("mad") * t).as("is_outlier"))
  }

  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int = 5, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifiers")
    require(k >= 1 && l >= 1, s"need k,l >= 1 (got k=$k, l=$l)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(col("n_members"),
        col("n_sensitive"),
        (col("n_members") < k).as("k_violation"),
        (col("n_sensitive") < l).as("l_violation")): _*)
  }

  /** Snapshot profile diff — the data-quality regression gate between
    * two table versions (time-travel's analytical consumer): per
    * integer column, row count, null count, min, max and distinct
    * count on BOTH sides plus the deltas, one tall row per column.
    * Run it across a delete/backfill boundary and the report says
    * exactly which columns moved and how far — the check a pipeline
    * promotes or rolls back on.
    *
    * Shape: ONE aggregation pass per side (all columns' aggregates
    * share the scan, the [[run]] policy), a driver-side pivot of the
    * two 1-row results into the tall report — no join of data-sized
    * relations anywhere. */
  def profileDiff(before: DataFrame, after: DataFrame,
      cols: Seq[String]): DataFrame = {
    def profile(df: DataFrame) = df.agg(count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        countDistinct(col(c)).as(s"nd_$c"))): _*).head()
    val (b, a) = (profile(before), profile(after))
    val rows = cols.map { c =>
      (c, b.getAs[Long]("n"), a.getAs[Long]("n"),
        b.getAs[Long](s"nulls_$c"), a.getAs[Long](s"nulls_$c"),
        b.getAs[Long](s"min_$c"), a.getAs[Long](s"min_$c"),
        b.getAs[Long](s"max_$c"), a.getAs[Long](s"max_$c"),
        b.getAs[Long](s"nd_$c"), a.getAs[Long](s"nd_$c"))
    }
    import before.sparkSession.implicits._
    rows.toDF("column", "n_before", "n_after", "nulls_before",
        "nulls_after", "min_before", "min_after", "max_before",
        "max_after", "distinct_before", "distinct_after")
      .withColumn("n_delta", col("n_after") - col("n_before"))
      .withColumn("distinct_delta",
        col("distinct_after") - col("distinct_before"))
  }
}
