package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextKit._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set (the GPT-3 Appendix C /
  * PaLM-style collision test — Brown et al. 2020 use 13-grams at web
  * scale; the operator takes `n` as a parameter and the fixture uses 8).
  *
  * Shape at 100 TB: the benchmark set is small by construction (an eval
  * suite, not a corpus), so its distinct n-gram hash set is the ONLY
  * relation that aggregates globally — and it is tiny. The training
  * corpus is scanned once: per-doc totals are row-local arithmetic
  * (no shuffle), and the collision join streams the corpus's n-grams
  * past a BROADCAST of the benchmark set, so only the matching rows
  * (rare by definition) ever reach the per-doc hit aggregation. The
  * corpus never shuffles corpus-sized data. Both joins broadcast the
  * small side; zero corpus-wide wide dependencies.
  */
object Decontam {

  /** Per-training-doc contamination report against the in-corpus
    * benchmark slice `benchPred` (rows satisfying it form the eval set
    * and are excluded from the output).
    *
    * Output: (doc_id, source, n_grams, n_hit, hit_ppm, contaminated)
    * where `n_grams` counts the doc's DISTINCT word n-grams
    * (row-local), `n_hit` those that also occur anywhere in the
    * benchmark slice, `hit_ppm = n_hit * 1e6 div n_grams` (0 for docs
    * shorter than n tokens), and `contaminated = n_hit >= minHits` as
    * an INT flag. All integer arithmetic — bit-exact cross-engine. */
  def contamination(docs: DataFrame, benchPred: Column, n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val grams = shinglesOf(col("text"), n)
    // the eval suite's distinct n-gram hashes — the broadcast set
    val benchGrams = docs.filter(benchPred)
      .select(explode(grams).as("s"))
      .select(md5Long(col("s")).as("m"))
      .distinct()
    // corpus totals are row-local: no explode survives past the scan
    val corpus = docs.filter(!benchPred)
      .select(col("doc_id"), col("source"),
        size(array_distinct(grams)).cast("long").as("n_grams"),
        grams.as("gs"))
    // collisions: explode + hash, keep only benchmark matches via the
    // broadcast join, then count distinct hits per doc (tiny relation)
    val hits = corpus.select(col("doc_id"), explode(col("gs")).as("s"))
      .select(col("doc_id"), md5Long(col("s")).as("m"))
      .join(broadcast(benchGrams), Seq("m"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("m")).as("n_hit"))
    corpus.drop("gs")
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("hit_ppm",
        when(col("n_grams") === 0L, lit(0L))
          .otherwise(expr("n_hit * 1000000L div n_grams")))
      .withColumn("contaminated",
        (col("n_hit") >= minHits).cast("int"))
  }

  /** Corpus-level decontamination report card: per training source, how
    * many docs the collision test would drop. One tiny rollup over the
    * [[contamination]] relation (`source` rides along from the corpus
    * scan — no join back to the corpus). */
  def report(docs: DataFrame, benchPred: Column, n: Int = 8,
      minHits: Int = 1): DataFrame =
    contamination(docs, benchPred, n, minHits)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("contaminated").cast("long")).as("n_contaminated"),
        sum(col("n_hit")).as("total_hits"))
      .withColumn("contaminated_ppm",
        expr("n_contaminated * 1000000L div n_docs"))

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram collision test: a training item whose embedding sits at
    * cosine >= `tau` of an eval item leaks the benchmark even when a
    * paraphrase defeats every 8-gram. Per corpus vector: the maximum
    * cosine against the benchmark slice, the closest benchmark item
    * (ties break to the smaller id), and the `contaminated` flag.
    *
    * Shape at 100 TB: the benchmark is small by definition, so it is
    * the broadcast side and the corpus streams ONCE — the scored
    * relation fans out |corpus| x |bench| rows map-side (the same
    * shape as brute ANN over broadcast queries), and the per-vector
    * argmax is a map-side-combinable max(struct) whose shuffle carries
    * one row per corpus vector. Integer dots, exact-double cosine —
    * DuckDB-oracle exact. */
  def semanticContamination(emb: DataFrame, benchPred: Column,
      tau: Double = 0.30): DataFrame = {
    val e = spread(emb)
      .select(col("vec_id"), quantVec(col("embedding")).as("qv"))
      .withColumn("nsq", dotPre(col("qv"), col("qv")))
    val bench = e.filter(benchPred)
      .select(col("vec_id").as("bench_id"), col("qv").as("bqv"),
        col("nsq").as("bnsq"))
    e.filter(!benchPred)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"),
        struct(cosineQ(dotPre(col("qv"), col("bqv")), col("nsq"),
          col("bnsq")).as("cos"), (-col("bench_id")).as("nb")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(max(col("sc")).as("m"))
      .select(col("vec_id"), (-col("m.nb")).as("bench_id"),
        col("m.cos").as("max_cos"),
        (col("m.cos") >= tau).cast("int").as("contaminated"))
  }
}
