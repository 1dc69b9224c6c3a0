package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** A Misra-Gries frequent-items summary: at most k (item -> lower-bound
  * count) counters plus the EXACT number of items folded in. Any item with
  * true count > n/(k+1) is guaranteed to be present (the classic
  * Misra-Gries bound, preserved under merging — Agarwal et al., "Mergeable
  * Summaries", ACM TODS 2013). */
case class MgSketch(counters: Map[String, Long], n: Long)

/** Mergeable Misra-Gries heavy-hitters sketch as a typed Aggregator
  * (SURVEY.md §2.9 surface). The streaming reduce is the textbook
  * algorithm: increment a live counter, else claim a free slot, else
  * decrement every counter by one and discard (each decrement event "pays
  * for" k+1 arrivals, hence the n/(k+1) error bound). The merge sums both
  * sides' counters, then subtracts the (k+1)-largest combined count from
  * all and keeps the positive remainder — the offset a decrement cascade
  * would have produced, so the merged bound is (n1+n2)/(k+1).
  *
  * 100 TB shape: the shuffle carries ONE <= k-entry map per partition
  * (map-side partial aggregation), never the token stream; the driver sees
  * a single merged sketch. [[graft.ops.TextAnalysis.heavyHitters]] follows
  * it with an exact recount of the <= k candidates, making the final
  * answer exact — the standard two-pass exact heavy-hitters scheme. */
class MisraGriesAgg(k: Int) extends Aggregator[String, MgSketch, MgSketch] {
  require(k >= 1, s"sketch size must be >= 1, got $k")

  override def zero: MgSketch = MgSketch(Map.empty, 0L)

  override def reduce(buf: MgSketch, item: String): MgSketch = {
    val m = buf.counters
    val next = m.get(item) match {
      case Some(c) => m.updated(item, c + 1L)
      case None if m.size < k => m.updated(item, 1L)
      case None =>
        // decrement-all step; zeros vacate their slots, new item discarded.
        // Costs O(k) but can fire at most n/(k+1) times over the stream
        // (each event destroys k+1 units of count mass, arrivals create
        // one each), so the amortized per-arrival cost stays O(1).
        m.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }
    MgSketch(next, buf.n + 1L)
  }

  override def merge(a: MgSketch, b: MgSketch): MgSketch = {
    val combined = b.counters.foldLeft(a.counters) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    val trimmed =
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from every counter: at most
        // k survive and each surviving lower bound stays a lower bound
        val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
        combined.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        }
      }
    MgSketch(trimmed, a.n + b.n)
  }

  override def finish(buf: MgSketch): MgSketch = buf

  override def bufferEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
  override def outputEncoder: Encoder[MgSketch] = Encoders.product[MgSketch]
}

object MisraGriesAgg {
  /** Typed column form: `items.select(MisraGriesAgg.column(k))`. */
  def column(k: Int): TypedColumn[String, MgSketch] =
    new MisraGriesAgg(k).toColumn
}
