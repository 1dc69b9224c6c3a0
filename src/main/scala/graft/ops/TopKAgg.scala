package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Shared bounded top-k machinery over (id, score) rows — the scalable
  * tail for the ANN operators.
  *
  * The window form (`row_number() OVER (PARTITION BY query ORDER BY
  * score)`) funnels EVERY candidate score of one query into a single task
  * and sorts it there; with a billion-row corpus per query that task is the
  * job. This aggregator keeps at most k entries per buffer, the merge is
  * associative and commutative, and Spark runs it with map-side combine —
  * the shuffle carries one k-entry buffer per (query, partition), and no
  * task ever holds more than k rows per query. Subclasses define only the
  * ordering (`better`); the bounded-insert/merge logic lives here once, so
  * the descending-cosine and ascending-ADC tails cannot diverge. */
abstract class BoundedTopK[S](k: Int)(bufEnc: Encoder[Seq[(S, Long)]])
    extends Aggregator[(Long, S), Seq[(S, Long)], Seq[(S, Long)]] {

  /** True when `a` outranks `b` (buffers are kept best-first). */
  protected def better(a: (S, Long), b: (S, Long)): Boolean

  final override def zero: Seq[(S, Long)] = Vector.empty

  final override def reduce(buf: Seq[(S, Long)],
      row: (Long, S)): Seq[(S, Long)] =
    insert(buf, (row._2, row._1))

  private def insert(buf: Seq[(S, Long)], e: (S, Long)): Seq[(S, Long)] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(b => better(e, b)) match {
        case -1 => buf.size
        case n => n
      }
      (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
    }
  }

  final override def merge(a: Seq[(S, Long)],
      b: Seq[(S, Long)]): Seq[(S, Long)] =
    b.foldLeft(a)(insert)

  final override def finish(buf: Seq[(S, Long)]): Seq[(S, Long)] = buf

  final override def bufferEncoder: Encoder[Seq[(S, Long)]] = bufEnc
  final override def outputEncoder: Encoder[Seq[(S, Long)]] = bufEnc
}

/** Descending-score top-k over doubles. Ordering matches the window form
  * exactly: score descending, id ascending on ties. Double.compare (not
  * >) so degenerate scores order exactly like Spark's DESC sort: NaN
  * sorts as the largest value, -0.0 < 0.0. Null scores cannot reach the
  * aggregator (non-nullable input encoder); topKPerQuery filters them
  * out up front. */
class TopKAgg(k: Int) extends BoundedTopK[Double](k)(
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()) {
  protected def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }
}

/** Ascending-order sibling over exact integer scores — the PQ/ADC tail,
  * where "best" is the SMALLEST integer distance and doubles would lose
  * exactness past 2^53. Ordering: score asc, id asc on ties. */
class TopKAggLongAsc(k: Int) extends BoundedTopK[Long](k)(
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()) {
  protected def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
}

/** Descending sibling over exact integer scores — the lexical
  * (tf-idf/BM25) pool tail, where "best" is the LARGEST integer score
  * and doubles would lose exactness past 2^53. Ordering: score desc,
  * id asc on ties. */
class TopKAggLongDesc(k: Int) extends BoundedTopK[Long](k)(
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()) {
  protected def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
}

object TopKAgg {

  /** Top-k per `queryCol` from (idCol, scoreCol) rows. Output columns:
    * (queryCol, neighbor_id, cosine, rank) — identical rows and ranks to
    * the `row_number` window form over non-null, non-NaN scores. Null/NaN
    * scores (a zero-norm vector makes Spark's divide return null, and
    * 0/0 arithmetic can surface NaN) are dropped up front: null would
    * fail the non-nullable input encoder, and a NaN "similarity" ranking
    * above every real score is never the ANN answer a caller wants. */
  def topKPerQuery(scored: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    scored
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol)))
      .groupBy(col(queryCol))
      .agg(agg(col(idCol), col(scoreCol)).as("top"))
      .select(col(queryCol), posexplode(col("top")).as(Seq("p", "e")))
      .select(col(queryCol), col("e._2").as("neighbor_id"),
        col("e._1").as("cosine"), (col("p") + 1).cast("int").as("rank"))
  }

  /** Ascending top-k per `queryCol` over exact LONG scores (null scores
    * dropped — same rationale as [[topKPerQuery]]). Output columns:
    * (queryCol, neighbor_id, <scoreCol>, rank), identical to the
    * `row_number` window ordered (score ASC, id ASC). */
  def topKPerQueryAsc(scored: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggLongAsc(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(queryCol))
      .agg(agg(col(idCol), col(scoreCol)).as("top"))
      .select(col(queryCol), posexplode(col("top")).as(Seq("p", "e")))
      .select(col(queryCol), col("e._2").as("neighbor_id"),
        col("e._1").as(scoreCol), (col("p") + 1).cast("int").as("rank"))
  }

  /** Descending top-k per `queryCol` over exact LONG scores. Output
    * columns: (queryCol, neighbor_id, <scoreCol>, rank), identical to
    * the `row_number` window ordered (score DESC, id ASC). */
  def topKPerQueryDesc(scored: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggLongDesc(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    scored
      .filter(col(scoreCol).isNotNull)
      .groupBy(col(queryCol))
      .agg(agg(col(idCol), col(scoreCol)).as("top"))
      .select(col(queryCol), posexplode(col("top")).as(Seq("p", "e")))
      .select(col(queryCol), col("e._2").as("neighbor_id"),
        col("e._1").as(scoreCol), (col("p") + 1).cast("int").as("rank"))
  }
}
