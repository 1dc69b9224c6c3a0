package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextKit._

/** Deduplication operators over a `documents(doc_id, text, ...)` table.
  *
  * Scale design (100 TB): every operator is a constant number of shuffles
  * keyed by doc/shingle/bucket — no driver-side state, no O(n^2) stage.
  * Candidate generation always goes through an inverted index (shingle or
  * LSH bucket) with a document-frequency cap so a stop-shingle can't create
  * a quadratic bucket; verification only runs on candidate pairs.
  */
object Dedup {

  /** Unpersist every relation cached by prior ops calls (delegates to the
    * shared TextKit tracker; kept here for API continuity). */
  def releaseCaches(): Unit = TextKit.releaseCaches()

  /** Exact dedup: one canonical row (min doc_id) per distinct text, with
    * the duplicate count. Hash-groupBy on the FULL 128-bit md5(text) digest
    * (hex) — birthday-collision probability stays negligible at 100 TB row
    * counts (a 60-bit key would start merging distinct texts around 2^30
    * docs), while the 32-char shuffle key is still narrow relative to
    * shuffling full document bodies. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** (doc_id, bigram-shingle) rows straight from the explode — the shared
    * relation behind the minhash/Jaccard family. Deliberately NOT
    * deduplicated: every consumer is duplicate-insensitive (min-hash
    * aggregation, collect_set set semantics, count-distinct df), so a
    * distinct() here would cost a full shuffle of the largest relation in
    * the pipeline for nothing. The relation is narrow (scan + explode) and
    * callers cache it across candidate generation and verification.
    *
    * A corpus that arrives in fewer partitions than the cluster has slots
    * (one small parquet file -> ONE task running all the shingle + hash
    * CPU) is spread out first; at real scale the scan already has more
    * partitions than slots and no extra shuffle is paid. */
  def shingleSet(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"), explode(shinglesOf(col("text"))).as("s"))

  /** MinHash signatures over word-bigram shingles: `numHashes` independent
    * hash slots h0..h{k-1}, each `min(md5(seed || shingle))`. One explode +
    * one hash aggregation. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 8): DataFrame =
    minhashSignaturesOf(shingleSet(docs), numHashes)

  private def minhashSignaturesOf(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes)
      .map(j => min(md5Long(col("s"), Some(j))).as(s"h$j"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** Hot-bucket guard: keep only rows of `df` whose `keys` group has
    * between 2 and `maxBucket` members. This is what makes bucketed pair
    * generation survive adversarial (dup-heavy) data at 100 TB: over-cap
    * groups are dropped BEFORE their ids are collected, so one hot bucket
    * can never materialize a giant array row or a |bucket|^2 combination
    * explode. The dropped pairs are near-always exact duplicates or
    * degenerate shingles — exact dedup upstream is the operator for those
    * (same precedence as ngramJaccardPairs' stop-shingle `maxDf` cap).
    * Callers pass a CACHED df, since it is read twice (counts + join). */
  private def capGroups(df: DataFrame, keys: Seq[String],
      maxBucket: Int): DataFrame = {
    val ok = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    df.join(ok, keys)
  }

  /** Ordered id pairs within each group of `df` sharing `keys` — the LSH
    * bucket-to-candidate-pairs step without a self-join: one aggregation
    * collects each bucket's ids, a combination explode emits (a, b) with
    * a < b. Avoids recomputing the upstream pipeline on both join sides.
    * Callers bound group size first (capGroups / maxDf). */
  private def pairsWithinGroups(df: DataFrame, keys: Seq[String],
      id: String): DataFrame = {
    val sorted = sort_array(collect_set(col(id)))
    val buckets = df.groupBy(keys.map(col): _*).agg(sorted.as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(
      sequence(lit(1), size(col("ids")) - 1),
      i => transform(slice(col("ids"), i + 1, size(col("ids"))),
        y => struct(element_at(col("ids"), i).as("a"), y.as("b")))))
    buckets.select(explode(combos).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** MinHash + LSH near-dup pairs: band the signature (rows-per-band=2),
    * bucket candidates within bands (band-buckets hotter than `maxBucket`
    * are dropped — see capGroups), then verify true bigram Jaccard >= tau.
    * Returns (doc_a, doc_b, jaccard). */
  def minhashLshPairs(docs: DataFrame, tau: Double = 0.6,
      numHashes: Int = 8, maxBucket: Int = 64): DataFrame = {
    val sh = tracked(shingleSet(docs))
    val sig = minhashSignaturesOf(sh, numHashes)
    val bands = numHashes / 2
    // persisted: the hot-bucket cap reads banded twice (bucket counts +
    // the join back), and recomputing it would redo the 8 md5 min-aggs
    val banded = tracked(sig.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          concat_ws("_", col(s"h${2 * b}"), col(s"h${2 * b + 1}"))
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key")))
    val members = capGroups(banded, Seq("band", "key"), maxBucket)
    val cand = pairsWithinGroups(members, Seq("band", "key"), "doc_id")
    // docs in any kept bucket — a superset of the pair docs, derived from
    // the CACHED banded relation so no pair-table materialization is needed
    val candDocs = members.select(col("doc_id")).distinct()
    verifyJaccard(sh, cand, tau, candDocs)
  }

  /** True bigram-shingle Jaccard for given candidate pairs over a (cached)
    * shingle set. `candDocs` (ids of docs that can appear in a pair, cheap
    * to derive from the caller's cached candidate-generation relations) is
    * semi-joined onto the shingle set first, so the expensive collect_set
    * aggregation touches only candidate docs — a tiny, cap-bounded
    * fraction of the corpus — instead of every document. Each doc's
    * shingles then aggregate to one array row, so verification is two
    * narrow joins on the pair table plus a per-pair array_intersect — no
    * exploded-row pair join. */
  private def verifyJaccard(sh: DataFrame, cand: DataFrame,
      tau: Double, candDocs: DataFrame): DataFrame = {
    // the candidate-doc id set is bounded by the hot-bucket/df caps
    // upstream, so it broadcasts; without the hint this plans as a
    // sort-merge join that sorts the whole shingle set
    val docSets = sh.join(broadcast(candDocs), "doc_id")
      .groupBy(col("doc_id"))
      .agg(collect_set(col("s")).as("ss"))
      .select(col("doc_id"), col("ss"), size(col("ss")).as("n"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("ss").as("sa"),
        col("n").as("na")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"), col("ss").as("sb"),
        col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (inter.cast(DoubleType) /
          (col("na") + col("nb") - inter).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** SimHash (16-bit here; width is a parameter): per bit, sum +-1 over the
    * document's distinct token hashes, sign -> bit. One explode + one agg;
    * the bit loop is column arithmetic, not extra passes. */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    // per-doc token dedup happens inside the row (array_distinct) — a
    // global distinct() would shuffle the exploded relation for the same
    // result, since tokens only repeat within a document
    val tok = docs
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("t"))
      .select(col("doc_id"), md5Long(col("t")).as("h"))
    val bitSums = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b"))
    tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** N-gram Jaccard near-dup pairs via a frequency-capped inverted index:
    * shingles occurring in more than `maxDf` docs are dropped from candidate
    * generation (stop-shingle guard — this is what keeps the pair join
    * linear-ish at scale), then true Jaccard (over all shingles) >= tau. */
  def ngramJaccardPairs(docs: DataFrame, tau: Double = 0.5,
      maxDf: Int = 20): DataFrame = {
    val sh = tracked(shingleSet(docs))
    // df = number of DOCS containing the shingle (sh is not deduplicated)
    val rare = sh.groupBy(col("s")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    // group size is already bounded by the maxDf join; persisted because
    // both the pair explode and the candidate-doc id set read it
    val candSh = tracked(sh.join(rare.select("s"), "s"))
    val cand = pairsWithinGroups(candSh, Seq("s"), "doc_id")
    verifyJaccard(sh, cand, tau, candSh.select(col("doc_id")).distinct())
  }

  /** Embedding cosine near-dup: exact integer-quantized cosine over
    * candidate pairs. Small inputs go brute force; the documented scale
    * path is Similarity.lshBuckets-style blocking first. */
  def embeddingNearDup(emb: DataFrame, tau: Double = 0.4): DataFrame = {
    // quantize once per row; the O(n^2) stage below is then a codegen'd
    // integer loop per pair (LongArrayDot), not per-element lambdas
    val e = spread(emb).select(col("vec_id"), quantVec(col("embedding")).as("qv"))
      .withColumn("nsq", dotPre(col("qv"), col("qv")))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineQ(dotPre(col("a.qv"), col("b.qv")),
          col("a.nsq"), col("b.nsq")).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** Scale-path embedding near-dup: candidates are restricted to pairs
    * sharing a sign-bit LSH bucket (Similarity.signBucket), so the pair
    * stage shuffles on bucket id and the per-bucket work is |bucket|^2
    * instead of a global cross join. Recall < 1 by construction: pairs
    * whose sign patterns differ in the leading dimensions are never
    * compared — the standard LSH trade, bounded by using few bits. */
  def embeddingNearDupBlocked(emb: DataFrame, tau: Double = 0.4,
      bits: Int = 4, maxBucket: Int = 4096): DataFrame = {
    val e = spread(emb).select(col("vec_id"), quantVec(col("embedding")).as("qv"),
        Similarity.signBucket(col("embedding"), bits).as("bucket"))
      .withColumn("nsq", dotPre(col("qv"), col("qv")))
    // cached: capGroups reads the bucket projection twice
    val bucketed = tracked(
      e.select(col("bucket"), col("vec_id").as("doc_id")))
    val cand = pairsWithinGroups(
      capGroups(bucketed, Seq("bucket"), maxBucket), Seq("bucket"), "doc_id")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    cand
      .join(e.select(col("vec_id"), col("qv"), col("nsq")).as("a"),
        col("vec_a") === col("a.vec_id"))
      .join(e.select(col("vec_id").as("vid_b"), col("qv").as("qv_b"),
        col("nsq").as("nsq_b")).as("b"), col("vec_b") === col("vid_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineQ(dotPre(col("a.qv"), col("qv_b")), col("a.nsq"), col("nsq_b"))
          .as("cosine"))
      .filter(col("cosine") >= tau)
  }
}
