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
}
