package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** HLL sketch semantics the oracle can't see: estimate ACCURACY on a
  * corpus big enough to leave the linear-counting regime, merge
  * associativity over a 3-way split, and idempotence (sketching the
  * same values twice changes nothing). The DuckDB oracles (q134/q135)
  * pin cross-engine determinism; these pin the math.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private val m = 256

  // 20k distinct values per group, interleaved, each value seen 1-3x.
  private lazy val vals = spark.range(0, 45000)
    .select((col("id") % 2).cast("string").as("g"),
      (col("id") % 20000).as("v"))

  private lazy val straight =
    Sketches.hllRegisters(vals, col("g"), col("v"), m).cache()

  test("raw estimate within 3 standard errors at 10k distinct") {
    // each group holds 10000 distinct v (ids 0..19999 split by parity);
    // HLL standard error = 1.04/sqrt(m) ~ 6.5%
    val est = Sketches.hllEstimate(straight, m)
      .select("grp", "raw_est").as[(String, Double)].collect().toMap
    assert(est.size == 2)
    est.values.foreach { e =>
      assert(math.abs(e - 10000) / 10000 < 0.20, s"estimate $e too far from 10000")
    }
  }

  test("merge of a 3-way split is bit-identical to the straight sketch") {
    def part(r: Int) = Sketches.hllRegisters(
      vals.filter(col("v") % 3 === r), col("g"), col("v"), m)
    val merged = Sketches.hllMerge(Sketches.hllMerge(part(0), part(1)), part(2))
    assert(merged.exceptAll(straight).isEmpty && straight.exceptAll(merged).isEmpty)
  }

  test("idempotent under duplication") {
    val doubled = Sketches.hllRegisters(
      vals.unionAll(vals), col("g"), col("v"), m)
    assert(doubled.exceptAll(straight).isEmpty && straight.exceptAll(doubled).isEmpty)
  }

  test("m below 256 or non-power-of-two rejected") {
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(vals, col("g"), col("v"), m = 128)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllEstimate(straight, m = 300)
    }
  }

  // ---- histogram quantile sketch ----

  test("histQuantiles: hand-checkable percentile edges") {
    // group "x": values 0..99, binWidth 10 -> bins 0..9, 10 values each.
    // p50: smallest bin with cum*100 >= 50*100 -> bin 4 (cum 50) -> edge 50
    val d = spark.range(0, 100).select(lit("x").as("g"), col("id").as("v"))
    val out = Sketches.histQuantiles(
      Sketches.histRegisters(d, col("g"), col("v"), binWidth = 10L),
      binWidth = 10L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("total") == 100L)
    assert(r.getAs[Long]("p25") == 30L, "cum 30 at bin 2 covers 25%")
    assert(r.getAs[Long]("p50") == 50L)
    assert(r.getAs[Long]("p75") == 80L)
    assert(r.getAs[Long]("p90") == 90L)
    assert(r.getAs[Long]("p99") == 100L)
  }

  test("hist sketch: merge of a 3-way split equals the straight sketch") {
    val d = spark.range(0, 9000).select((col("id") % 3).cast("string").as("g"),
      (col("id") % 977).as("v"))
    val straightH = Sketches.histRegisters(d, col("g"), col("v"), 16L)
    def part(r: Int) = Sketches.histRegisters(
      d.filter(col("id") % 3 === r), col("g"), col("v"), 16L)
    val merged = Sketches.histMerge(Sketches.histMerge(part(0), part(1)), part(2))
    assert(merged.exceptAll(straightH).isEmpty &&
      straightH.exceptAll(merged).isEmpty)
  }

  // ---- Count-Min sketch ----

  test("cms: estimates upper-bound true counts, mostly exact at low load") {
    // key i repeated (i % 7) + 1 times: ~2000 rows into 4 x 1024 counters
    val rows = spark.range(0, 500)
      .select(explode(sequence(lit(1), col("id") % 7 + 1)).as("rep"),
        col("id"))
    val regs = Sketches.cmsRegisters(rows, col("id"))
    assert(regs.count() <= 4L * 1024L, "register table must stay bounded")
    val probes = spark.range(0, 500).select(col("id").as("probe"))
    val est = Sketches.cmsEstimate(regs, probes).collect()
      .map(r => r.getAs[Long]("probe") -> r.getAs[Long]("cms_est")).toMap
    assert(est.size == 500)
    val truth = (0L until 500L).map(i => i -> (i % 7 + 1)).toMap
    assert(est.forall { case (k, e) => e >= truth(k) },
      "Count-Min never underestimates")
    val exact = est.count { case (k, e) => e == truth(k) }
    assert(exact >= 450, s"at ~2 keys/counter most estimates are exact: $exact")
  }

  test("cms: merge of a parity split equals the straight sketch") {
    val rows = spark.range(0, 2000).select((col("id") % 300).as("v"),
      col("id"))
    val straightC = Sketches.cmsRegisters(rows, col("v"))
    def part(r: Int) = Sketches.cmsRegisters(
      rows.filter(col("id") % 2 === r), col("v"))
    val merged = Sketches.cmsMerge(part(0), part(1))
    assert(merged.exceptAll(straightC).isEmpty &&
      straightC.exceptAll(merged).isEmpty)
  }

  test("hist sketch: outliers clamp into the top bin, size stays bounded") {
    val d = spark.range(0, 1000)
      .select(lit("x").as("g"),
        when(col("id") === 0, lit(1000000000L)).otherwise(col("id")).as("v"))
    val regs = Sketches.histRegisters(d, col("g"), col("v"),
      binWidth = 16L, maxBins = 64)
    assert(regs.count() <= 64, "register table must stay within maxBins")
    assert(regs.filter(col("bin") === 63).count() == 1,
      "the outlier lands in the clamped top bin")
  }
}
