package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation as a first-class relational operator:
  * score an ANN (or any retrieval) result set against exact ground truth
  * — recall@k, MRR, and hit-rank — per query and in aggregate. The
  * operator form matters because at corpus scale the evaluation itself
  * is a join problem: truth and result sets are both top-k relations
  * (nQueries × k rows), so metrics are ONE equi-join on
  * (query_id, neighbor_id) plus one aggregation per query — never a
  * rescan of the corpus, never driver-side set math.
  *
  * Inputs are two relations with (query_id, neighbor_id, rank) — the
  * shape [[Similarity.bruteTopK]] / lshTopK / pq / ivf all emit — so any
  * index family plugs in unchanged.
  *
  * Determinism: recall is an exact integer ratio surfaced as one double
  * division; MRR is 1/rank in double — a single IEEE division both
  * engines perform identically.
  */
object Eval {

  /** Per-query metrics of `result` against `truth`, both (query_id,
    * neighbor_id, rank) top-k relations: n_truth, n_hit (truth rows the
    * result retrieved), recall = n_hit/n_truth, first_hit_rank (result
    * rank of the best-ranked retrieved truth row, null if none), and
    * mrr = 1/first_hit_rank (0 if no hit). Queries present in `truth`
    * but absent from `result` still score (recall 0). */
  def retrievalMetrics(truth: DataFrame, result: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val r = result.select(col("query_id"), col("neighbor_id"),
      col("rank").as("r_rank"))
    t.join(r, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_truth"),
        count(col("r_rank")).as("n_hit"),
        min(col("r_rank")).as("first_hit_rank"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_truth").cast("double"))
      .withColumn("mrr",
        coalesce(lit(1.0) / col("first_hit_rank").cast("double"), lit(0.0)))
      .select(col("query_id"), col("n_truth"), col("n_hit"),
        col("recall"), col("first_hit_rank"), col("mrr"))
  }

  /** Blocking/candidate-set quality: precision and recall of a retrieved
    * pair set against a truth pair set (both (doc_a, doc_b) relations) —
    * ONE full-outer join on the pair key and one global aggregate. The
    * metric that tunes a dedup blocker: recall is the pairs the bands
    * may never recover, precision is the verification work wasted. */
  def pairMetrics(truth: DataFrame, retrieved: DataFrame): DataFrame = {
    val t = truth.select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val r = retrieved.select(col("doc_a"), col("doc_b"), lit(1L).as("r"))
    t.join(r, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(col("t")).as("n_truth"), sum(col("r")).as("n_retrieved"),
        sum(col("t") * col("r")).as("n_hit"))
      .select(col("n_truth"), col("n_retrieved"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_retrieved").cast("double"))
          .as("precision"),
        (col("n_hit").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }
}
