package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the 100 TB tool the testdata never
  * needs but a 1000-executor cluster does.
  *
  * AQE's skew-join handling (on by default) splits oversized SORT-MERGE
  * partitions at runtime; `saltedJoin` is the complementary static remedy
  * for the case AQE can't fix: a hot key on the build/broadcast-ineligible
  * side. The big side gets a uniform random-free salt derived from a
  * non-key column hash; the small side is replicated `factor` times, so the
  * hot key's rows spread over `factor` reducers instead of one.
  */
object Skew {

  /** Equi-join `big` with `small` on `keys`, spreading each big-side key
    * over `factor` partitions. Result equals `big.join(small, keys, how)`
    * for inner/left joins (each big row matches exactly one salted copy).
    *
    * The salt must vary WITHIN a hot key even when its rows are textually
    * identical — exactly the dedup-adjacent case (r1 verdict: a content
    * hash sends every duplicate row to one salt, re-creating the hot
    * partition). `monotonically_increasing_id` is unique per row by
    * construction, so duplicates spread uniformly; the salt never reaches
    * the output, so its run-to-run partition assignment (stable for a
    * given partitioning, not across repartitions) affects placement only.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 8, how: String = "inner"): DataFrame = {
    require(factor >= 1)
    // salting replicates the SMALL side `factor` times, so any join type
    // that can emit unmatched small-side rows (right/full/...) would emit
    // them factor times — refuse instead of silently multiplying rows
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
        .contains(how.toLowerCase.replace("_", "")),
      s"saltedJoin preserves semantics only for inner/left joins, got '$how'")
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)))
    val replicated = small
      .withColumn("__salt",
        explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** AQE-native skew handling — the path to REACH FOR FIRST on any
    * modern cluster: a plain equi-join pinned to a shuffled sort-merge
    * (merge hint on both sides) so AQE's OptimizeSkewedJoin can split
    * oversized partitions at runtime (`spark.sql.adaptive.enabled` +
    * `spark.sql.adaptive.skewJoin.enabled`, both default-on). The split
    * is transparent: full join-type generality, no replicated side, no
    * factor to tune, and the runtime sizes the split from actual map
    * output — strictly better information than any static salt.
    *
    * [[saltedJoin]] remains for the residual cases AQE cannot fix: a
    * downstream operator that requires the join's hash partitioning
    * (AQE skips splits that would break a required distribution unless
    * forceOptimizeSkewedJoin is set), or a hot key so extreme that even
    * one map block exceeds a reducer (AQE splits by map-output ranges).
    * PlanSpec pins the q39 skew scenario handled by THIS path with no
    * salting — skew=true on the join and a skew-split shuffle read. */
  def aqeSkewJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      how: String = "inner"): DataFrame =
    big.hint("merge").join(small.hint("merge"), keys, how)

  /** Per-key row counts above a threshold — the diagnostic used to decide
    * whether a join needs salting (or a broadcast) before shipping it. */
  def hotKeys(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc)
}
