package graft.ops

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise-min aggregator over pre-hashed minhash slot arrays —
  * the user-facing UDAF extension point (SURVEY.md §2.9:
  * `Aggregator[IN, BUF, OUT]`) applied to a real sketch.
  *
  * Input rows carry one Array[Long] of k seed-hashes per shingle (computed
  * once, columnar); the aggregator folds them with element-wise min. The
  * merge is associative and commutative, so Spark runs it as a partial
  * aggregation with map-side combine — at 100 TB the shuffle carries one
  * k-long array per (doc, partition), not per shingle. Equivalent to the
  * k-column `min(md5Long(...))` form in Dedup.minhashSignatures; this shape
  * is what a sketch library plugs into.
  */
class MinHashAgg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (row(i) < buf(i)) buf(i) = row(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object MinHashAgg {
  /** Typed column form: `ds.groupByKey(_.docId).agg(MinHashAgg.column(8))`. */
  def column(k: Int): TypedColumn[Array[Long], Array[Long]] =
    new MinHashAgg(k).toColumn
}
