package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each user, the
  * earliest time each funnel step completed GIVEN the previous step had
  * already completed strictly earlier — the product-analytics primitive
  * (Amplitude/Mixpanel funnels) and, for training-data pipelines, the
  * labeling pass behind conversion-conditioned sampling.
  *
  * Spark shape: filter to the funnel's event types FIRST (predicate
  * pushed to the scan — at 100 TB this is the difference between
  * shuffling the event firehose and shuffling three event types), then
  * ONE hash aggregation per user collecting the step timestamps:
  * step 1 folds to a plain conditional min; later steps keep the
  * per-user sorted timestamp list of just that step's events (bounded
  * by per-user activity of that type) and resolve the chained
  * "earliest after the previous step" with array higher-order
  * functions — no window, no self-join, no second shuffle.
  *
  * Determinism: pure integer microsecond arithmetic; list order is
  * irrelevant (only order-insensitive mins are taken).
  */
object Funnel {

  /** Per-user funnel completion over `steps` (event_type values, in
    * funnel order). Output: user_id, t1..tN (epoch-micros of the
    * earliest valid completion of each step, null if never), and
    * `stage` = number of consecutive steps completed. Strict ordering:
    * step i+1 counts only strictly after step i. */
  /** The per-user aggregation half: step 1 folds to a conditional min,
    * later steps keep that step's sorted timestamp list. Order-
    * insensitive and mergeable — legal as STREAMING aggregation state
    * too (the lists grow with per-user activity of that step only). */
  private[graft] def aggregated(typed: DataFrame,
      steps: Seq[String]): DataFrame = {
    val aggs =
      min(when(col("event_type") === steps.head, col("ts_us"))).as("t1") +:
        steps.tail.zipWithIndex.map { case (st, i) =>
          sort_array(collect_list(when(col("event_type") === st,
            col("ts_us")))).as(s"__l${i + 2}")
        }
    typed.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
  }

  /** The row-local finish half: resolve the chained "earliest strictly
    * after the previous step" mins and the stage counter. */
  private[graft] def finish(perUser: DataFrame,
      steps: Seq[String]): DataFrame = {
    // chain: t_{i+1} = min ts in step-(i+1)'s list strictly after t_i —
    // null t_i yields a null-predicate filter => empty list => null min
    val chained = (2 to steps.size).foldLeft(perUser) { (df, i) =>
      df.withColumn(s"t$i",
        array_min(filter(col(s"__l$i"), x => x > col(s"t${i - 1}"))))
        .drop(s"__l$i")
    }
    // ascending fold puts the DEEPEST completed step outermost:
    // when(tN, N).otherwise(… when(t1, 1).otherwise(0))
    val stage = (1 to steps.size).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t$i").isNotNull, lit(i)).otherwise(acc)
    }
    chained.withColumn("stage", stage)
      .select(col("user_id") +: col("stage") +:
        (1 to steps.size).map(i => col(s"t$i")): _*)
  }

  /** Input normalization shared by the batch and streaming forms. */
  private[graft] def typedEvents(events: DataFrame,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2 && steps.size <= 8,
      s"funnel wants 2..8 steps, got ${steps.size}")
    events.filter(col("event_type").isin(steps.map(lit): _*))
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
  }

  def funnel(events: DataFrame, steps: Seq[String]): DataFrame =
    finish(aggregated(typedEvents(events, steps), steps), steps)
}
