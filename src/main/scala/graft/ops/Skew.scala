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
    * The salt is derived deterministically from the row's full content hash
    * so repeated runs produce identical partitioning (no rand()).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 8, how: String = "inner"): DataFrame = {
    require(factor >= 1)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(factor)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until factor).map(lit(_)): _*)))
    saltedBig.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** Per-key row counts above a threshold — the diagnostic used to decide
    * whether a join needs salting (or a broadcast) before shipping it. */
  def hotKeys(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc)
}
