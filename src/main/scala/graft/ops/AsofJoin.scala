package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join — for each left row, the latest right row at or before the
  * left row's timestamp, per key. The canonical training-data attribution
  * operator (join each outcome event to the most recent preceding signal)
  * and the operator SURVEY.md §"custom operators" names as the classic
  * Spark gap.
  *
  * Spark-first shape: ONE union + ONE window pass. Both sides are tagged
  * and unioned, sorted within each key partition by (time, side, tie) —
  * right rows sort ahead of left rows at equal timestamps, so a
  * same-instant signal counts as "at or before" — and a running
  * `last(right_payload, ignoreNulls)` attaches the newest right payload to
  * every left row. Cost at 100 TB: a single shuffle on the keys + a local
  * sort, identical to any per-key window — no per-left-row subquery, no
  * range join explosion, no broadcast requirement on either side. The
  * right payload travels as ONE struct so all attached columns always come
  * from the same right row. */
object AsofJoin {

  /** `left` gains `asof_<col>` for every non-key column of `right`
    * (null where no right row precedes). `tieCol` must be a numeric
    * total-order tiebreaker on the right side (e.g. an event id): among
    * right rows sharing a timestamp the LARGEST (time, tie) wins —
    * deterministic regardless of partitioning. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq.filterNot(keys.contains)
    val rCols = right.columns.toSeq.filterNot(keys.contains)
    val rStructType = StructType(
      rCols.map(c => StructField(c, right.schema(c).dataType)))

    // a NULL-time right row would sort NULLS FIRST and masquerade as
    // "earlier than everything", attaching to left rows with no true
    // predecessor; SQL's `r.ts <= l.ts` excludes them, so we do too
    val rSide = right.filter(col(timeCol).isNotNull).select(
      keys.map(col) ++ Seq(
        col(timeCol).as("__t"), lit(0).as("__side"),
        col(tieCol).cast("long").as("__tie"),
        struct(rCols.map(col): _*).as("__r")) ++
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(timeCol).as("__t"), lit(1).as("__side"),
        lit(Long.MaxValue).as("__tie"),
        lit(null).cast(rStructType).as("__r")) ++
      lCols.map(c => col(c).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rSide.unionByName(lSide)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
        lCols.map(c => col(s"__l_$c").as(c)) ++
        rCols.map(c => col(s"__asof.$c").as(s"$prefix$c")): _*)
  }
}
