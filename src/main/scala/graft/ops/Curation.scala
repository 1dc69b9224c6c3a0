package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextKit._

/** The end-to-end training-data curation pipeline, composed from the
  * operator kit — the documents-side counterpart of the TA flagship
  * (jobs/Pipeline): normalize -> quality gate -> exact dedup on the
  * normalized body -> deterministic stratified sample -> per-shard export
  * manifest. One linear pass over the corpus:
  *
  *  - normalization and the token-count gate are narrow projections
  *    (codegen'd string/array expressions, no shuffle);
  *  - dedup is ONE hash aggregation on the 128-bit normalized-body
  *    digest, keeping the min doc id per group (no join back: the
  *    canonical row rides through the aggregate as a max_by/min_by
  *    struct payload);
  *  - the sample is a narrow hash filter (reproducible on any
  *    partitioning);
  *  - the manifest is one final aggregation on the shard key.
  *
  * Two shuffles total (dedup, manifest) regardless of corpus size. */
object Curation {

  /** Run the pipeline; returns the per-shard manifest: shard, surviving
    * doc count, total normalized chars, order-independent id checksum. */
  def curate(docs: DataFrame, minTokens: Int = 30,
      pctByLang: Map[String, Int] = Map("en" -> 10, "fr" -> 30, "es" -> 30,
        "de" -> 50),
      defaultPct: Int = 20, nShards: Int = 16): DataFrame = {
    val normed = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.normExpr(col("text")).as("norm"))
      .filter(size(tokens(col("norm"))) >= minTokens)
    // exact dedup on the normalized body: min doc id is canonical; its
    // (doc_id, lang, n_chars) payload travels inside the aggregate via
    // min_by, so no second pass or self-join re-fetches the winner's row
    val canonical = normed
      .groupBy(md5(col("norm")).as("norm_hash"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), length(col("norm")).as("n_chars_norm")),
        col("doc_id")).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.lang").as("lang"),
        col("w.n_chars_norm").as("n_chars_norm"))
    val sampled = canonical
      .filter(TextAnalysis.sampleKeep(pctByLang, defaultPct))
    Export.shardSummary(sampled, "doc_id", nShards, charsCol = "n_chars_norm")
  }

  /** WEB-CRAWL curation: markup in, training shards out — the
    * crawl-side composition of the extraction/quality kit:
    *
    *  1. boilerplate removal ([[TextAnalysis.extractHtmlText]] — narrow
    *     codegen'd projections) and the chrome gate
    *     (`boilerplate_permille` <= `maxBoilerPermille`: pages that are
    *     mostly navigation/footer are dropped before anything else
    *     touches them);
    *  2. bigram-fluency gate ([[TextAnalysis.bigramScore]] fit on the
    *     gate SURVIVORS — corpus statistics come from cleaned text, the
    *     CCNet ordering, so chrome never pollutes the language model);
    *  3. exact dedup on the extracted body (one hash aggregation,
    *     min-id canonical rides inside via min_by);
    *  4. the per-shard export manifest ([[Export.shardSummary]]).
    *
    * Shuffle count: two model aggregations + the fluency join + dedup +
    * manifest — each keyed, none corpus-quadratic; extraction and both
    * gates are scan-speed projections. */
  /** Deterministic per-key cap: keep at most `cap` rows per `keyCol`,
    * chosen by md5 hash-rank of the id (ties by id) — the MassiveText
    * per-domain cap as a standalone operator, the same policy
    * [[Components.capPerCluster]] applies per duplicate cluster. Runs
    * through the bounded [[TopKAgg]] aggregator: per-group state is `cap`
    * (id, hash) pairs however hot the key, map-side combined, never a
    * window sort of the key's rows. Output: (keyCol, doc_id, rank). */
  def capPerKey(df: DataFrame, keyCol: String, cap: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, s"capPerKey: cap=$cap must be >= 1")
    TopKAgg.topKPerQueryAsc(
        df.select(col(keyCol), col(idCol),
          md5Long(col(idCol)
            .cast(org.apache.spark.sql.types.StringType)).as("hkey")),
        keyCol, idCol, "hkey", cap)
      .select(col(keyCol), col("neighbor_id").as(idCol), col("rank"))
  }

  /** The full PRETRAINING-RECIPE composition — the pipeline a data team
    * runs to turn a raw corpus into a training mix, chaining five
    * operators this kit already proves individually:
    *
    *  1. normalize ([[TextAnalysis.normExpr]] — narrow projection);
    *  2. quality gate: drop the least-fluent tercile
    *     ([[TextAnalysis.fluencyBuckets]] `bucket >= minBucket`, the
    *     CCNet head+middle keep);
    *  3. per-source cap: at most `perSourceCap` docs per source by
    *     md5 hash-rank (the MassiveText per-domain cap — bounded
    *     [[TopKAgg]] aggregator, never a window sort);
    *  4. exact dedup on the normalized body (one hash aggregation,
    *     min-id canonical carried inside via min_by);
    *  5. deterministic train/val/test assignment (the
    *     [[TextAnalysis.trainValTestSplit]] md5-bucket arithmetic),
    *     rolled up to the per-(split, source) doc/token manifest.
    *
    * Shuffle count: the fluency model aggregation + bounds, the cap
    * aggregation, the dedup aggregation, and the final manifest rollup
    * — each keyed, none corpus-quadratic; every gate is a scan-speed
    * projection or a broadcast-sized join. */
  def pretrainRecipe(docs: DataFrame, perSourceCap: Int = 100,
      minBucket: Int = 1, valPermille: Int = 50,
      testPermille: Int = 50): DataFrame = {
    require(perSourceCap >= 1, s"perSourceCap=$perSourceCap must be >= 1")
    val normed = tracked(docs.select(col("doc_id"), col("source"),
      TextAnalysis.normExpr(col("text")).as("text")))
    // the LM is fit on cleaned text (the crawl-curation precedent):
    // buckets come from the normalized corpus's own bigram model
    val keep = TextAnalysis.fluencyBuckets(normed)
      .filter(col("bucket") >= minBucket).select(col("doc_id"))
    val gated = normed.join(keep, Seq("doc_id"))
    val capped = capPerKey(gated, "source", perSourceCap)
      .select(col("doc_id"))
      .join(normed, Seq("doc_id"))
    val canonical = capped
      .groupBy(md5(col("text")).as("h"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("text")),
        col("doc_id")).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.source").as("source"),
        col("w.text").as("text"))
    val splitBucket =
      md5Long(col("doc_id")
        .cast(org.apache.spark.sql.types.StringType)) % 1000
    canonical
      .select(col("source"),
        when(splitBucket < valPermille, "val")
          .when(splitBucket < valPermille + testPermille, "test")
          .otherwise("train").as("split"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
  }

  def curateCrawl(pages: DataFrame, maxBoilerPermille: Long = 150,
      minFluencyPpm: Long = 34000, nShards: Int = 16): DataFrame = {
    // cached: the regex-heavy extraction would otherwise re-run for the
    // bigram model scan, the score totality join, and the kept join
    val extracted = tracked(TextAnalysis.extractHtmlText(pages)
      .filter(col("boilerplate_permille") <= maxBoilerPermille)
      .select(col("doc_id"), col("main_text").as("text")))
    val fluent = TextAnalysis.bigramScore(extracted)
      .filter(col("fluency_ppm") >= minFluencyPpm)
      .select(col("doc_id"))
    val kept = extracted.join(fluent, Seq("doc_id"))
    val canonical = kept
      .groupBy(md5(col("text")).as("body_hash"))
      .agg(min_by(struct(col("doc_id"), length(col("text")).as("n_chars")),
        col("doc_id")).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.n_chars").as("n_chars"))
    Export.shardSummary(canonical, "doc_id", nShards)
  }

  /** Leakage-safe train/val/test split — the assignment every eval
    * pipeline needs and most get wrong: splitting documents
    * independently puts near-duplicate pairs on BOTH sides of the
    * train/test boundary, and the test set silently measures
    * memorization. Here the split key is the document's near-dup
    * CLUSTER (the verified minhash-LSH pair graph's connected
    * component; singletons are their own group), hashed once per
    * group into 80/10/10 buckets — so a cluster lands in exactly one
    * split by construction, not by luck. Deterministic across runs,
    * engines, and partitionings (md5 group hash).
    *
    * Shape at scale: the LSH chain + CC the dedup family already pays
    * (reuse the persisted q195 canonical graph to skip recompute),
    * then ONE left join of doc ids against the 1-row-per-member
    * component relation and row-local hash arithmetic. */
  def leakageSafeSplit(docs: DataFrame, tau: Double = 0.6): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, tau)
      .select(col("doc_a"), col("doc_b"))
    val comp = Components.connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component_id"), col("doc_id")).as("group_key"))
      .withColumn("bucket",
        md5Long(concat(lit("split:"), col("group_key").cast("string"))) % 10)
      .select(col("doc_id"), col("group_key"),
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "val")
          .otherwise("test").as("split"))
  }

  /** Preference-pair mining (DPO / reward-model data prep): within each
    * (lang, source) candidate pool, the highest-scoring document is the
    * `chosen` response and every pool-mate trailing it by at least
    * `minMargin` becomes a `rejected` partner — the (chosen, rejected,
    * margin) rows a preference-tuning run consumes. The score is the
    * integer type-token ratio in ppm (lexical diversity — a fluency
    * proxy with clean cross-engine arithmetic); ties for champion break
    * to the smaller doc_id, so every pool has exactly ONE chosen. A
    * near-champion inside the margin band pairs with nothing — margin
    * filtering is what keeps label noise out of a DPO set.
    *
    * Shape at scale: the score is row-local scan arithmetic, each
    * pool's champion is ONE map-side-combinable max(struct)
    * aggregation, and pairing is the corpus streaming past a BROADCAST
    * of the |pools|-row champion relation — no window function, and no
    * all-pairs (documents pair with their pool champion only, never
    * with each other). */
  def preferencePairs(docs: DataFrame,
      minMargin: Long = 100000L): DataFrame = {
    val scored = spread(docs).select(col("doc_id"), col("lang"),
      col("source"),
      expr("size(array_distinct(split(text, ' '))) * 1000000L" +
        " div size(split(text, ' '))").as("score"))
    val champ = scored.groupBy(col("lang"), col("source"))
      .agg(max(struct(col("score"), (-col("doc_id")).as("nd"))).as("m"))
      .select(col("lang"), col("source"), (-col("m.nd")).as("chosen_id"),
        col("m.score").as("chosen_score"))
    scored.join(broadcast(champ), Seq("lang", "source"))
      .filter(col("chosen_score") - col("score") >= minMargin)
      .select(col("lang"), col("source"), col("chosen_id"),
        col("doc_id").as("rejected_id"), col("chosen_score"),
        col("score").as("rejected_score"),
        (col("chosen_score") - col("score")).as("margin"))
  }
}
