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

  /** HLL set algebra: the intersection cardinality of two sketched sets
    * by inclusion-exclusion — est(A) + est(B) - est(A ∪ B), where the
    * union registers are the element-wise max ([[hllMerge]], the one
    * EXACT HLL set operation). Register tables must share the group
    * domain; output per group carries the three raw estimates and the
    * derived intersection (the identical double expression both engines
    * evaluate — IEEE ops are correctly rounded, so the derivation
    * hash-matches exactly as raw_est already does). The classic
    * audience-overlap question ("viewers who also purchase") answered
    * from two m-register sketches, no re-scan of either set. */
  def hllIntersect(a: DataFrame, b: DataFrame, m: Int = 256): DataFrame = {
    val ea = hllEstimate(a, m).select(col("grp"), col("raw_est").as("est_a"))
    val eb = hllEstimate(b, m).select(col("grp"), col("raw_est").as("est_b"))
    val eu = hllEstimate(hllMerge(a, b), m)
      .select(col("grp"), col("raw_est").as("est_union"))
    ea.join(eb, Seq("grp")).join(eu, Seq("grp"))
      .withColumn("inter_est",
        col("est_a") + col("est_b") - col("est_union"))
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

  // -------------------------------------------------------------------
  // Mergeable equi-width histogram quantile sketch
  // -------------------------------------------------------------------
  //
  // The quantile twin of the HLL story: an exact percentile over 100 TB
  // ("p99 document length per language, across 30 daily snapshots") is a
  // global sort or a percentile_approx whose internal sketch is
  // engine-private (not oracle-checkable). The equi-width histogram is
  // the simplest MERGEABLE quantile summary: a fixed-size (<= maxBins
  // rows per group) count table that partial-aggregates map-side, merges
  // across shards/days by plain count addition, and answers any
  // percentile with bounded error (one bin width). Every number is an
  // integer, so the DuckDB oracle hash-checks registers, merges, and the
  // quantile fold bit-for-bit.

  /** Per-(group, bin) histogram registers of non-negative long `value`:
    * bin = min(value div binWidth, maxBins-1) (the top bin clamps the
    * tail so the sketch size is bounded no matter the outliers). One
    * shuffle on (group, bin) with map-side count combine — at most
    * maxBins rows per group survive the map side. */
  def histRegisters(df: DataFrame, group: Column, value: Column,
      binWidth: Long, maxBins: Int = 256): DataFrame = {
    require(binWidth > 0 && maxBins > 1, s"bad hist params $binWidth/$maxBins")
    // `div`, not Column./ (which widens to double): bins must be exact
    // integer division for the DuckDB `//` mirror to hash-match
    df.select(group.as("grp"), value.cast(LongType).as("v"))
      .select(col("grp"),
        least(expr(s"v div $binWidth"), lit(maxBins - 1L)).as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("cnt"))
  }

  /** Merge register tables (same binWidth/maxBins): count addition per
    * (group, bin). Associative + commutative — shard, sketch, fold. */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp", "bin").agg(sum("cnt").as("cnt"))

  /** Fold registers to one row per group with upper-edge percentile
    * estimates: pNN = binWidth * (1 + smallest bin whose cumulative
    * count covers NN% of the total), the deterministic "value is <= this
    * edge" reading. The cumulative window is PARTITIONED by group and
    * bounded by maxBins rows per group — never a global sort. */
  def histQuantiles(regs: DataFrame, binWidth: Long,
      percentiles: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("bin"))
    val cum = regs.select(col("grp"), col("bin"), col("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy(col("grp"))))
    val pcols = percentiles.map(p =>
      min(when(col("cum") * 100 >= col("total") * p,
        (col("bin") + 1) * binWidth)).as(s"p$p"))
    val aggs = max(col("total")).as("total") +: pcols
    cum.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
  }

  // -------------------------------------------------------------------
  // Mergeable Count-Min sketch
  // -------------------------------------------------------------------
  //
  // The frequency twin: "how often does key X appear across 100 TB?"
  // answered from a depth × width count table (a few KB) instead of a
  // full groupBy over every distinct key. Rows hash independently
  // (md5 with the row index as seed — the same engine-neutral hash as
  // the minhash family), counts partial-aggregate map-side, shards/days
  // merge by plain addition, and a point estimate is the MINIMUM of the
  // key's depth counters (overestimates only, by the classic CM bound
  // eps = e/width with prob 1 - e^-depth). All integers — the DuckDB
  // oracle hash-checks registers, merges, and estimates exactly.

  /** Depth × width Count-Min registers of `value`: one shuffle on
    * (row, bucket) with map-side sum combine; at most depth × width rows
    * survive regardless of corpus size. */
  def cmsRegisters(df: DataFrame, value: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 16, s"bad cms params $depth x $width")
    // ONE corpus scan: the depth fan-out is a row-local explode, and
    // md5Long(concat(row, v)) for row = j is byte-identical to the
    // seeded md5Long(v, seed = j) the probe side / oracle use
    df.select(value.cast(StringType).as("v"))
      .select(explode(array((0 until depth).map(j => lit(j)): _*)).as("row"),
        col("v"))
      .select(col("row"),
        (TextKit.md5Long(concat(col("row").cast(StringType), col("v")))
          % width).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge register tables (same depth/width): count addition. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-estimate the frequency of each `probe` value: min over the
    * depth rows of the probe's counter (0 when a row never saw the
    * bucket — only possible in a merge of disjoint sketches). The probe
    * relation is tiny (a key list); the register join is a broadcast. */
  def cmsEstimate(regs: DataFrame, probes: DataFrame,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val probed = (0 until depth).map(j =>
      probes.select(col("probe"), lit(j).as("row"),
        (TextKit.md5Long(col("probe").cast(StringType), seed = Some(j))
          % width).as("bucket")))
      .reduce(_ unionAll _)
    probed.join(regs, Seq("row", "bucket"), "left")
      .groupBy(col("probe"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** DuckDB mirrors for the Count-Min sketch. */
  object duckcms {
    /** Register CTE over `src` — mirrors [[cmsRegisters]]. */
    def registers(src: String, valueExpr: String,
        depth: Int = 4, width: Int = 1024): String =
      (0 until depth).map { j =>
        val h = TextKit.ducksql.md5Long(s"CAST($valueExpr AS VARCHAR)",
          seed = Some(j))
        s"SELECT $j AS row, $h % $width AS bucket FROM $src"
      }.mkString("SELECT row, bucket, count(*) AS cnt FROM (",
        " UNION ALL ", ") GROUP BY row, bucket")

    /** Estimate CTE: probes from `probesSrc` (column `probe`) against a
      * `regs(row, bucket, cnt)` CTE — mirrors [[cmsEstimate]]. */
    def estimate(regsCte: String, probesSrc: String,
        depth: Int = 4, width: Int = 1024): String = {
      val probed = (0 until depth).map { j =>
        val h = TextKit.ducksql.md5Long("CAST(probe AS VARCHAR)",
          seed = Some(j))
        s"SELECT probe, $j AS row, $h % $width AS bucket FROM $probesSrc"
      }.mkString(" UNION ALL ")
      s"""SELECT probe, min(coalesce(cnt, 0)) AS cms_est
         FROM ($probed) p LEFT JOIN $regsCte r
           ON p.row = r.row AND p.bucket = r.bucket
         GROUP BY probe"""
    }
  }

  /** DuckDB mirrors for the histogram sketch. */
  object duckhist {
    /** Register CTE over `src` — mirrors [[histRegisters]]. */
    def registers(src: String, groupExpr: String, valueExpr: String,
        binWidth: Long, maxBins: Int = 256): String =
      s"""SELECT $groupExpr AS grp,
           least(CAST($valueExpr AS BIGINT) // $binWidth, ${maxBins - 1}) AS bin,
           count(*) AS cnt
         FROM $src GROUP BY 1, 2"""

    /** Quantile fold over a `regs(grp, bin, cnt)` CTE — mirrors
      * [[histQuantiles]]. */
    def quantiles(regsCte: String, binWidth: Long,
        percentiles: Seq[Int] = Seq(25, 50, 75, 90, 99)): String = {
      val pcols = percentiles.map(p =>
        s"min(CASE WHEN cum * 100 >= total * $p THEN (bin + 1) * $binWidth END) AS p$p")
      s"""SELECT grp, CAST(max(total) AS BIGINT) AS total, ${pcols.mkString(", ")}
         FROM (SELECT grp, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY bin) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS total
           FROM $regsCte)
         GROUP BY grp"""
    }
  }
}
