package graft.ops

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded distinct-set aggregator: collects the `cap` SMALLEST distinct
  * long values of a group, sorted ascending.
  *
  * This is the single-pass, memory-safe form of the LSH hot-bucket guard:
  * callers aggregate ids per bucket with cap = maxBucket + 1 and then drop
  * groups whose result size exceeds maxBucket. A bucket with ≤ maxBucket
  * members keeps ALL its ids (so the kept buckets are exact); a hotter
  * bucket provably fills the buffer past maxBucket and is filtered out —
  * without ever materializing its full membership the way a plain
  * `collect_set` would (one 10^9-member bucket at 100 TB would be an 8 GB
  * array row). Replaces the previous two-pass shape (count-aggregate +
  * join back) with one aggregation.
  *
  * Determinism under distributed partial aggregation: "smallest cap
  * distinct values" is associative and commutative, so any merge order
  * yields the same result. The buffer stays a sorted primitive array;
  * once full, a non-qualifying row is an O(log cap) binary search with no
  * allocation, so hot buckets cost ~cap·ln(n) copies, not n.
  */
class BoundedMinSet(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length < cap) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < cap) { // v < current max: evict the max
        val out = new Array[Long](cap)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, cap - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, cap))
    var i = 0; var j = 0; var k = 0
    while (k < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder = bufferEncoder
}

object BoundedMinSet {
  /** Untyped-DataFrame form: `df.groupBy(...).agg(BoundedMinSet.column(65)(col("doc_id")))`. */
  def column(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BoundedMinSet(cap), Encoders.scalaLong)

  def apply(cap: Int, c: Column): Column = column(cap)(c)
}
