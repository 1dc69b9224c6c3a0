package graft

import org.apache.spark.sql.functions._

import graft.ops.Embeddings

/** ABTT semantics the q137 oracle can't see: with a planted dominant
  * direction, power iteration must FIND it and the residuals must have
  * (almost) no energy left along it, while orthogonal structure
  * survives untouched. */
class EmbeddingsSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 4

  // x_i = a_i * e1 (dominant, a in [-8, 8]) + small signal in e2.
  private lazy val emb = (0 until 64).map { i =>
    val a = (i % 17).toFloat - 8f
    val b = (i % 5).toFloat * 0.1f
    (i.toLong, Seq(a, b, 0f, 0f))
  }.toDF("vec_id", "embedding")

  private lazy val out = Embeddings.abtt(emb, dim = dim)
    .collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap

  test("dominant-direction energy is annihilated") {
    // original e1 magnitudes reach 8e7 quantized; residual e1 components
    // must be at projection-rounding scale
    val maxResidE1 = out.values.map { case (_, resid) => math.abs(resid(0)) }.max
    assert(maxResidE1 < 200000L, s"residual e1 energy $maxResidE1")
  }

  test("orthogonal signal survives") {
    // e2 carried 0.0..0.4 (quantized 0..4e6) around its mean; residuals
    // must keep that spread (not be crushed to zero)
    val e2 = out.values.map { case (_, resid) => resid(1) }.toSeq
    assert(e2.max - e2.min > 3000000L, s"e2 spread ${e2.max - e2.min}")
  }

  test("top coordinate tracks the planted coefficient") {
    // a_i and top_coord must be monotonically related (up to sign):
    // correlate rank orders of a_i and top_coord
    val pairs = (0 until 64).map { i =>
      val a = (i % 17) - 8
      (a.toDouble, out(i.toLong)._1.toDouble)
    }
    val sameOrder = pairs.sortBy(_._1).map(_._2)
    val monotonicUp = sameOrder.sliding(2).forall(s => s(0) <= s(1))
    val monotonicDown = sameOrder.sliding(2).forall(s => s(0) >= s(1))
    assert(monotonicUp || monotonicDown, "top_coord not monotone in the planted coefficient")
  }
}
