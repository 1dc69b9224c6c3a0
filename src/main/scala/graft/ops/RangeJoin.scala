package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the other classic Spark gap from
  * SURVEY.md §"custom operators". A naive `p.join(i, p.t BETWEEN i.s AND
  * i.e)` plans as a broadcast-nested-loop or cartesian product; this
  * operator makes it an EQUI join:
  *
  * intervals are exploded onto fixed-width time bins (per-row cost bounded
  * by interval_length / binSize), a point maps to exactly ONE bin, and the
  * join runs on (keys, bin) with an exact containment filter after. A
  * (point, interval) pair can only meet in the point's bin, so no dedup
  * pass is needed. At 100 TB this is one shuffle on (keys, bin) — the bin
  * spreads hot keys over time as a built-in salt — versus the nested-loop
  * scan Spark would otherwise choose. Pick binSize near the typical
  * interval length: shorter bins multiply interval copies, longer bins
  * widen the post-filter.
  */
object RangeJoin {

  /** Rows of `points` joined to every row of `intervals` (same `keys`)
    * whose [startCol, endCol] contains tCol — inclusive on both ends.
    * Column names of the two inputs must not collide except for `keys`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tCol: String, startCol: String, endCol: String,
      binSize: Long): DataFrame = {
    require(binSize > 0)
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$startCol` div $binSize"),
        expr(s"`$endCol` div $binSize"))))
    points.withColumn("__bin", expr(s"`$tCol` div $binSize"))
      .join(binned, keys :+ "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }
}
