package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) re-expressed with exact integer arithmetic: score
  * every raw document by how much its hashed n-gram distribution looks
  * like a TARGET subcorpus (the "quality" domain — e.g. the English
  * slice, a curated source), then keep the top scorers.
  *
  * Shape at 100 TB:
  *  - the feature space is HASHED to a fixed B buckets (md5 % B), so the
  *    two distribution estimates are B-row aggregates no matter the
  *    corpus size — map-side combinable counts, a broadcast-sized weight
  *    table, never a vocabulary-wide shuffle;
  *  - corpus totals are one 1-row aggregate (bounded driver state, the
  *    k-means-centroid precedent);
  *  - per-document scoring is a broadcast hash join (B rows) plus one
  *    count/sum aggregation on doc_id — one shuffle over the feature
  *    stream, no global sort;
  *  - admission is top-k on (score, doc_id): Spark plans orderBy+limit
  *    as TakeOrdered (per-partition heaps, k rows to the driver), and
  *    membership returns as a broadcast semi-join.
  *
  * Determinism (the DuckDB oracle hash-checks every score): the paper's
  * per-feature log-likelihood ratio is replaced by the MEAN IMPORTANCE
  * RATIO in parts-per-million — smoothed bucket probabilities quantized
  * to ppm integers, their ratio again ppm-quantized, summed and averaged
  * with integer division. Pure bigint arithmetic end to end (no float
  * log, whose last ulp is libm-dependent), and overflow-safe by
  * construction: probabilities <= 1e6, ratios <= 1e12, so a document
  * needs > 9e6 features to overflow a long sum. A document too short to
  * have a feature scores 0 — no evidence never outranks evidence, so
  * featureless rows can't crowd real documents out of the keep set.
  */
object Importance {

  /** ppm quantization scale. */
  val Scale = 1000000L

  /** Per-document importance scores of every document against the
    * `isTarget` subcorpus, over hashed word-bigram features.
    * Output: (doc_id, n_feats, score_ppm) — score_ppm is the mean
    * smoothed probability ratio p_target/p_raw in ppm. */
  def importanceScores(docs: DataFrame, isTarget: Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    val feats = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(TextKit.shinglesOf(col("text"), 2)).as("s"))
      .select(col("doc_id"), col("is_t"),
        (TextKit.md5Long(col("s")) % buckets).as("bucket"))
    // B-row distribution estimates (one pass, map-side combine).
    val counts = feats.groupBy("bucket")
      .agg(count(lit(1)).as("r_cnt"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("t_cnt"))
    // 1-row totals, literalized (bounded driver state).
    val Array(tTot, rTot) = feats
      .agg(coalesce(sum(when(col("is_t"), 1L).otherwise(0L)), lit(0L)),
        count(lit(1)))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    // Laplace-smoothed ppm probabilities and their ppm ratio — every
    // step integer; denominators strictly positive by the +1 smoothing.
    val weights = counts.select(col("bucket"),
      expr(s"(t_cnt + 1) * $Scale div (${tTot + buckets}L)").as("p_t"),
      expr(s"(r_cnt + 1) * $Scale div (${rTot + buckets}L)").as("p_r"))
      .select(col("bucket"),
        expr(s"p_t * $Scale div greatest(p_r, 1L)").as("w"))
    val scored = feats.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("w_sum"))
      .select(col("doc_id"), col("n_feats"),
        expr("w_sum div n_feats").as("score_ppm"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_ppm"), lit(0L)).as("score_ppm"))
  }

  /** Deterministic top-k admission on (score desc, doc_id asc): the
    * resampled keep-set, flagged on the full score table. */
  def resample(docs: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 1024): DataFrame = {
    val scores = importanceScores(docs, isTarget, buckets)
    val kept = scores.orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k).select(col("doc_id"), lit(true).as("kept"))
    scores.join(broadcast(kept), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feats"), col("score_ppm"),
        coalesce(col("kept"), lit(false)).as("kept"))
  }

  /** DuckDB mirror of [[resample]] over the `documents` table with
    * `targetPred` as the target predicate (SQL over the doc row). */
  def ducksql(targetPred: String, k: Int, buckets: Int = 1024): String = {
    val h = TextKit.ducksql.md5Long("s")
    s"""WITH feats AS (
         SELECT doc_id, is_t, $h % $buckets AS bucket
         FROM (SELECT doc_id, is_t,
             unnest(list_transform(generate_series(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1])) AS s
           FROM (SELECT *, $targetPred AS is_t,
             string_split(text,' ') AS toks FROM documents))),
       tot AS (SELECT sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_tot,
           count(*) AS r_tot FROM feats),
       w AS (SELECT bucket,
           ((t_cnt + 1) * $Scale // (t_tot + $buckets)) * $Scale //
             greatest((r_cnt + 1) * $Scale // (r_tot + $buckets), 1) AS w
         FROM (SELECT bucket, count(*) AS r_cnt,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_cnt
           FROM feats GROUP BY bucket), tot),
       sc AS (SELECT f.doc_id, count(*) AS n_feats,
           CAST(sum(w.w) // count(*) AS BIGINT) AS score_ppm
         FROM feats f JOIN w ON f.bucket = w.bucket GROUP BY f.doc_id),
       full_sc AS (SELECT d.doc_id,
           CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
           CAST(coalesce(sc.score_ppm, 0) AS BIGINT) AS score_ppm
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
       topk AS (SELECT doc_id FROM full_sc
         ORDER BY score_ppm DESC, doc_id LIMIT $k)
       SELECT f.doc_id, f.n_feats, f.score_ppm,
         f.doc_id IN (SELECT doc_id FROM topk) AS kept
       FROM full_sc f ORDER BY doc_id"""
  }

  /** Distribution drift between two document slices — the monitoring
    * pass a production corpus pipeline runs between snapshots / sources
    * ("did yesterday's crawl shift?"): per-bucket hashed-bigram
    * frequencies of slice A vs slice B in ppm, and each bucket's
    * absolute difference. Same B-bucket shape as [[importanceScores]] —
    * two B-row distribution estimates from ONE feature pass, never a
    * vocabulary-wide shuffle; totals ride along via a broadcast 1-row
    * cross join (no driver round-trip). Integer ppm end to end.
    * Output: (bucket, a_cnt, b_cnt, pa_ppm, pb_ppm, d_ppm). */
  def drift(docs: DataFrame, isA: Column, isB: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    val feats = docs
      .select(isA.as("a"), isB.as("b"),
        explode(TextKit.shinglesOf(col("text"), 2)).as("s"))
      .select(col("a"), col("b"),
        (TextKit.md5Long(col("s")) % buckets).as("bucket"))
    val counts = feats.groupBy("bucket")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("a_cnt"),
        sum(when(col("b"), 1L).otherwise(0L)).as("b_cnt"))
    val totals = counts.agg(sum(col("a_cnt")).as("a_tot"),
      sum(col("b_cnt")).as("b_tot"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("a_cnt"), col("b_cnt"),
        expr(s"a_cnt * $Scale div greatest(a_tot, 1L)").as("pa_ppm"),
        expr(s"b_cnt * $Scale div greatest(b_tot, 1L)").as("pb_ppm"))
      .withColumn("d_ppm", abs(col("pa_ppm") - col("pb_ppm")))
  }

  /** Fold [[drift]] to the one-row monitor verdict: bucket/total counts
    * and the total-variation distance in ppm (half the L1 distance of
    * the two ppm distributions — 0 = identical, 1e6 = disjoint). */
  def driftSummary(docs: DataFrame, isA: Column, isB: Column,
      buckets: Int = 256): DataFrame =
    drift(docs, isA, isB, buckets)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("a_cnt")).as("a_total"), sum(col("b_cnt")).as("b_total"),
        expr("sum(d_ppm) div 2").as("tvd_ppm"))

  /** DuckDB mirror of [[driftSummary]] over `documents`. */
  def driftSql(predA: String, predB: String, buckets: Int = 256): String = {
    val h = TextKit.ducksql.md5Long("s")
    s"""WITH feats AS (
         SELECT a, b, $h % $buckets AS bucket
         FROM (SELECT a, b,
             unnest(list_transform(generate_series(1, len(toks)-1),
               i -> toks[i] || ' ' || toks[i+1])) AS s
           FROM (SELECT $predA AS a, $predB AS b,
             string_split(text,' ') AS toks FROM documents))),
       counts AS (SELECT bucket,
           CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
           CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt
         FROM feats GROUP BY bucket),
       tot AS (SELECT CAST(sum(a_cnt) AS BIGINT) AS a_tot,
           CAST(sum(b_cnt) AS BIGINT) AS b_tot FROM counts),
       d AS (SELECT bucket, a_cnt, b_cnt,
           a_cnt * $Scale // greatest(a_tot, 1) AS pa_ppm,
           b_cnt * $Scale // greatest(b_tot, 1) AS pb_ppm
         FROM counts, tot)
       SELECT count(*) AS n_buckets,
         CAST(sum(a_cnt) AS BIGINT) AS a_total,
         CAST(sum(b_cnt) AS BIGINT) AS b_total,
         CAST(sum(abs(pa_ppm - pb_ppm)) // 2 AS BIGINT) AS tvd_ppm
       FROM d"""
  }
}
