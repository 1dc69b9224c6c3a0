package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable cardinality sketches (HyperLogLog family).
  *
  * The 100 TB story: a distinct-count over a 100 TB column ("how many
  * unique users / URLs / shingles per partition of the corpus?") is a
  * full shuffle of every distinct value when computed exactly; the HLL
  * register table is a FIXED-SIZE (m rows per group) mergeable summary
  * that partial-aggregates map-side, ships a few KB per group to the
  * reducers, and supports cross-day / cross-table union by element-wise
  * register max — the same reason Spark ships `approx_count_distinct`
  * (HLL++). This implementation trades HLL++'s bias tables for exact
  * cross-engine determinism so the DuckDB oracle can hash-check every
  * register and the estimate:
  *
  *  - value hash = the corpus-wide 60-bit md5 hash (TextKit.md5Long —
  *    identical bytes in any engine; no engine-private seed);
  *  - bucket = hash % m (low bits), w = hash DIV m (the remaining
  *    60-log2(m) bits), rho = leading-zero count of w within that field
  *    plus one, derived from the BINARY STRING length (`bin(w)`, minimal
  *    in both Spark and DuckDB) — pure integer/string ops, no float log;
  *  - the harmonic-mean denominator sums the exact integers
  *    2^(maxRho - rho) (maxRho = 61 - log2(m), so absent buckets weigh
  *    2^maxRho and every weight is a representable long; the full sum is
  *    bounded by m * 2^maxRho ≤ 2^61 for m ≥ 256 — overflow-safe);
  *  - the raw HLL estimate is ONE double division of two exactly-agreed
  *    numbers: (alpha_m * m^2 * 2^maxRho) / denom, with the numerator
  *    inlined as a shared decimal literal so both engines parse the same
  *    double. No ln / pow in the data path (the small-range linear-
  *    counting correction needs ln(m/zeros) whose last ulp is libm-
  *    dependent; the observables it needs — `zeros` — are emitted so a
  *    consumer can apply it).
  *
  * Register tables are plain DataFrames keyed (group, bucket) so
  * [[hllMerge]] (element-wise max) proves the q96/q130 story for
  * cardinality state: sketch halves independently, merge, and the result
  * is bit-identical to sketching the whole — the shape that lets 100 TB
  * be sketched day-by-day and unioned for free.
  */
object Sketches {

  /** Register width: with m = 2^p buckets, w has 60-p bits, rho ranges
    * 1..(61-p), and absent buckets carry rho = 0 (weight 2^(61-p)). */
  private def maxRho(p: Int): Int = 61 - p

  /** Standard HLL alpha_m for m >= 128. */
  def alpha(m: Int): Double = 0.7213 / (1 + 1.079 / m)

  /** The shared estimate numerator, as the exact decimal literal BOTH
    * engines parse: alpha_m * m^2 * 2^maxRho. */
  def numeratorLiteral(m: Int): String = {
    val p = Integer.numberOfTrailingZeros(m)
    (alpha(m) * m * m * math.pow(2.0, maxRho(p).toDouble)).toString
  }

  /** Per-(group, bucket) HLL registers of `value` (any column; hashed via
    * its string form). One hash + one shuffle on (group, bucket) with
    * map-side max combine — at most m rows per group survive the map
    * side, so reducer input is bounded by tasks * groups * m, not by the
    * corpus. m must be a power of two >= 256 (keeps every weight and the
    * denominator in exact long range). */
  def hllRegisters(df: DataFrame, group: Column, value: Column,
      m: Int = 256): DataFrame = {
    val p = Integer.numberOfTrailingZeros(m)
    require(m >= 256 && m == (1 << p), s"m must be a power of two >= 256, got $m")
    // `%` stays in long arithmetic; the payload shift MUST be integer
    // division (`div`), not Column./ which widens to double and would
    // round 60-bit hashes.
    // bitlength(w) = length(bin(w)) for w > 0; bin(0) = "0" in both
    // engines, handled by the w = 0 arm (all 60-p payload bits zero).
    df.select(group.as("grp"),
        TextKit.md5Long(value.cast(StringType)).as("h"))
      .select(col("grp"), (col("h") % m).as("bucket"),
        expr(s"h div $m").as("w"))
      .select(col("grp"), col("bucket"),
        when(col("w") === 0, lit(maxRho(p).toLong))
          .otherwise(lit(maxRho(p).toLong) - length(bin(col("w"))))
          .as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("rho"))
  }

  /** Merge two register tables (same m): element-wise max per (group,
    * bucket). Associative + commutative + idempotent — sketch shards /
    * days / tables independently and fold. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp", "bucket").agg(max("rho").as("rho"))

  /** Fold a register table to one row per group: present-bucket count,
    * saturated-at-1 register count (`zeros` = m - present is the linear-
    * counting observable), the exact integer harmonic denominator, and
    * the raw HLL estimate. Driver-free: one m-row-per-group aggregation. */
  def hllEstimate(regs: DataFrame, m: Int = 256): DataFrame = {
    val p = Integer.numberOfTrailingZeros(m)
    require(m >= 256 && m == (1 << p), s"m must be a power of two >= 256, got $m")
    val mr = maxRho(p)
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(1L, CAST($mr - rho AS INT))"))
          .cast(LongType).as("denom_present"))
      .select(col("grp"), col("n_present"),
        (lit(m.toLong) - col("n_present")).as("zeros"),
        (col("denom_present") +
          (lit(m.toLong) - col("n_present")) * lit(1L << mr)).as("denom"))
      .withColumn("raw_est",
        expr(s"${numeratorLiteral(m)} / CAST(denom AS DOUBLE)"))
  }

  /** DuckDB mirrors, kept adjacent (TextKit.ducksql convention). */
  object ducksql {
    /** Register CTE over `src`, hashing `valueExpr` grouped by
      * `groupExpr` — mirrors [[hllRegisters]]. */
    def registers(src: String, groupExpr: String, valueExpr: String,
        m: Int = 256): String = {
      val p = Integer.numberOfTrailingZeros(m)
      val mr = maxRho(p)
      val h = TextKit.ducksql.md5Long(s"CAST($valueExpr AS VARCHAR)")
      s"""SELECT grp, bucket, max(rho) AS rho FROM (
           SELECT $groupExpr AS grp, h % $m AS bucket,
             CASE WHEN h // $m = 0 THEN $mr
               ELSE $mr - length(bin(h // $m)) END AS rho
           FROM (SELECT *, $h AS h FROM $src)) GROUP BY grp, bucket"""
    }

    /** Estimate over a `regs(grp, bucket, rho)` CTE — mirrors
      * [[hllEstimate]]. */
    def estimate(regsCte: String, m: Int = 256): String = {
      val p = Integer.numberOfTrailingZeros(m)
      val mr = maxRho(p)
      s"""SELECT grp, n_present, $m - n_present AS zeros,
           denom_present + ($m - n_present) * ${1L << mr} AS denom,
           ${numeratorLiteral(m)} / CAST(denom_present
             + ($m - n_present) * ${1L << mr} AS DOUBLE) AS raw_est
         FROM (SELECT grp, count(*) AS n_present,
             CAST(sum(1::BIGINT << ($mr - rho)) AS BIGINT) AS denom_present
           FROM $regsCte GROUP BY grp)"""
    }
  }
}
