package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextKit._

/** Learned document-quality classifier — the fastText-style gate
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"; the C4/CCNet pipelines use exactly this shape to
  * score crawl text against a clean reference corpus): hashed character
  * n-gram features, a linear model over feature buckets, trained from
  * labeled examples and applied as pure column arithmetic.
  *
  * Differences from the SGD original, chosen for the engine's
  * determinism contract:
  *
  *  - training is ONE aggregation pass: each hashed feature bucket's
  *    weight is its Laplace-smoothed posterior P(fluent | feature) in
  *    integer ppm — `(n_pos + 1) * 1e6 div (n_pos + n_neg + 2)` — the
  *    naive-Bayes-voting form of a linear scorer. No epochs, no
  *    learning rate, no float accumulation: exact integers end to end,
  *    so the DuckDB oracle reproduces the model bit-for-bit.
  *  - a document's score is the mean bucket weight of its features
  *    (integer division); >= 500000 ppm (the neutral prior) classifies
  *    fluent. Unseen buckets contribute the neutral prior, so scoring
  *    is total on any input.
  *
  * Features are within-word character bigrams over boundary-padded
  * words ("_word_"), hashed to [[NBuckets]] md5 buckets — the hashing
  * trick that bounds the model at a few thousand rows (broadcast-sized)
  * whatever the corpus vocabulary, fastText's subword representation.
  *
  * Labeled fixtures are built deterministically from the corpus itself:
  * positives are real documents, negatives their word-wise character
  * REVERSALS (both engines reverse identically) — the classic
  * planted-garbage protocol: reversed words have out-of-distribution
  * character bigrams while keeping length/charset identical, so the
  * classifier must learn the bigram distribution, not surface stats.
  *
  * 100 TB shape: one pass over the training slice (explode + hash +
  * one aggregation, map-side combinable into <= NBuckets cells), one
  * pass over the scoring corpus against the broadcast model. Training
  * on a hash-sample (the `trainPred` door) is the production form;
  * held-out documents prove the model generalizes (spec-pinned). */
object Classifier {

  /** Hashed-feature bucket count — model size ceiling. */
  val NBuckets = 4096

  /** Neutral prior in ppm (P = 0.5) — unseen features and empty docs. */
  val NeutralPpm = 500000L

  /** Word-wise character reversal — the deterministic garbage twin. */
  def wordReverse(text: Column): Column =
    concat_ws(" ", transform(split(text, " "), w => reverse(w)))

  /** Hashed char-bigram feature buckets of a text column: words are
    * boundary-padded then each adjacent char pair hashes to one of
    * [[NBuckets]] buckets. Empty words contribute nothing; the sequence
    * guard keeps Spark's descending sequence(1,0) out. */
  def featureBuckets(text: Column): Column = {
    val words = filter(split(text, " "), w => w =!= lit(""))
    flatten(transform(words, w => {
      val padded = concat(lit("_"), w, lit("_"))
      transform(sequence(lit(1), length(padded) - 1),
        i => pmod(md5Long(padded.substr(i, lit(2))), lit(NBuckets.toLong)))
    }))
  }

  /** Labeled (orig + reversed-twin) variants of a corpus slice. */
  private def variantsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("orig").as("variant"), col("text"))
      .unionByName(docs.select(col("doc_id"), lit("rev").as("variant"),
        wordReverse(col("text")).as("text")))

  /** The model's SUFFICIENT STATISTICS: per-bucket positive/total
    * feature counts. Counts are ADDITIVE, so models train
    * incrementally: statistics from disjoint corpus slices merge by
    * plain summation ([[mergeCounts]]) into exactly the stats a
    * monolithic pass would produce — the ingest-time shape (a nightly
    * batch trains on its own slice; the merged model is bit-identical
    * to a full retrain). One aggregation pass, <= [[NBuckets]] rows. */
  def trainCounts(docs: DataFrame): DataFrame =
    variantsOf(docs)
      .select(when(col("variant") === "orig", 1L).otherwise(0L).as("lbl"),
        explode(featureBuckets(col("text"))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("lbl")).as("n_pos"), count(lit(1)).as("n_all"))

  /** Merge count tables from disjoint training slices — associative and
    * commutative (integer sums), so merge(train(A), train(B)) ==
    * train(A UNION B) exactly (spec-pinned). */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket"))
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_all")).as("n_all"))

  /** Counts -> smoothed per-bucket weights in ppm. */
  def weightsOf(counts: DataFrame): DataFrame =
    counts.select(col("bucket"),
      expr("((n_pos + 1) * 1000000) div (n_all + 2)").as("w_ppm"))

  /** Score EVERY (doc, variant) against an already-trained weight
    * table — the apply-side half of [[qualityScore]], split out so a
    * persisted/merged model scores fresh corpora without retraining. */
  def scoreWith(docs: DataFrame, model: DataFrame): DataFrame = {
    val variants = variantsOf(docs)
    val scored = variants
      .select(col("doc_id"), col("variant"),
        explode(featureBuckets(col("text"))).as("bucket"))
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(col("doc_id"), col("variant"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_ppm"), lit(NeutralPpm))).as("w_sum"))
    // totality: a featureless (empty) document scores the neutral prior
    variants.select(col("doc_id"), col("variant"))
      .join(scored, Seq("doc_id", "variant"), "left")
      .select(col("doc_id"), col("variant"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(expr("w_sum div n_feats"), lit(NeutralPpm))
          .as("score_ppm"))
      .withColumn("is_fluent", col("score_ppm") >= NeutralPpm)
  }

  /** Train on the `trainPred` slice of the corpus (positives = real
    * text, negatives = word-reversed twins), then score EVERY document
    * and its twin. Output, one row per (doc_id, variant):
    * (doc_id, variant, n_feats, score_ppm, is_fluent) — all exact
    * integers/booleans. Documents outside `trainPred` are held out,
    * so their separation measures generalization, not memorization. */
  def qualityScore(docs: DataFrame, trainPred: Column): DataFrame =
    scoreWith(docs, weightsOf(trainCounts(docs.filter(trainPred))))
}
