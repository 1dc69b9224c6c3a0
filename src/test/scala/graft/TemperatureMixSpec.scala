package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Temperature-mix semantics the q136 oracle can't see: alpha = 0.5
  * actually TAMES the heavy source — a 100x token imbalance becomes a
  * ~10x share imbalance, so the light source survives whole while the
  * heavy one is rate-limited. */
class TemperatureMixSpec extends SparkSpec {

  import spark.implicits._

  // "big": 400 docs x 10 tokens = 4000; "small": 4 docs x 10 tokens = 40.
  private lazy val docs = (
    (0L until 400L).map(i => (i, "big", "a b c d e f g h i j")) ++
    (1000L until 1004L).map(i => (i, "small", "a b c d e f g h i j"))
  ).toDF("doc_id", "source", "text")

  private lazy val kept = TextAnalysis.temperatureMix(docs, totalBudget = 1000L)
    .groupBy("source").agg(count(lit(1)).as("n"), sum("tok").as("toks"))
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("light source survives whole under sqrt scaling") {
    // q_big = floor(sqrt(4000)) = 63, q_small = 6; target_small =
    // 1000*6/69 = 86 >= 40 -> every small doc admitted
    assert(kept("small")._1 == 4L)
  }

  test("heavy source rate-limited near its sqrt share") {
    // target_big = 1000*63/69 = 913 of 4000 -> admission rate 22.8%;
    // the hash gate is unbiased, so 400 draws land well inside [12%, 35%]
    val frac = kept("big")._1.toDouble / 400
    assert(frac > 0.12 && frac < 0.35, s"big admitted fraction $frac")
  }

  test("admitted token mass respects the overall budget scale") {
    val total = kept.values.map(_._2).sum
    assert(total <= 1400, s"admitted $total tokens vs ~1000 target")
  }
}
