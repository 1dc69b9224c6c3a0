package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k aggregator over (id, score) rows — the scalable tail for
  * the ANN operators.
  *
  * The window form (`row_number() OVER (PARTITION BY query ORDER BY score
  * DESC)`) funnels EVERY candidate score of one query into a single task
  * and sorts it there; with a billion-row corpus per query that task is the
  * job. This aggregator keeps at most k entries per buffer, the merge is
  * associative and commutative, and Spark runs it with map-side combine —
  * the shuffle carries one k-entry buffer per (query, partition), and no
  * task ever holds more than k rows per query. Ordering matches the window
  * form exactly: score descending, id ascending on ties.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // buffers are kept sorted (score desc, id asc) and capped at k.
  // Double.compare (not >) so degenerate scores order exactly like
  // Spark's DESC sort: NaN sorts as the largest value, -0.0 < 0.0.
  // Null scores cannot reach the aggregator (non-nullable input
  // encoder); topKPerQuery filters them out up front.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
      row: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, (row._2, row._1))

  private def insert(buf: Seq[(Double, Long)],
      e: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(b => better(e, b)) match {
        case -1 => buf.size
        case n => n
      }
      (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

/** Ascending-order sibling of [[TopKAgg]] over exact integer scores —
  * the PQ/ADC tail, where "best" is the SMALLEST integer distance and
  * doubles would lose exactness past 2^53. Ordering: score asc, id asc
  * on ties. Same bounded-buffer/map-side-combine scale contract. */
class TopKAggLongAsc(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)],
      row: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, (row._2, row._1))

  private def insert(buf: Seq[(Long, Long)],
      e: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(b => better(e, b)) match {
        case -1 => buf.size
        case n => n
      }
      (buf.take(i) :+ e) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
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
}
