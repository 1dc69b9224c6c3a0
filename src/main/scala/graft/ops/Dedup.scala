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

  /** Exact dedup: one canonical row (min doc_id) per distinct text, with
    * the duplicate count. Hash-groupBy on md5(text) — the 64-bit prefix is
    * collision-safe far beyond 100 TB row counts and keeps the shuffle key
    * narrow instead of shuffling full document bodies. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5Long(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash signatures over word-bigram shingles: `numHashes` independent
    * hash slots h0..h{k-1}, each `min(md5(seed || shingle))`. One explode +
    * one hash aggregation. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 8): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")))).as("s"))
      .distinct()
    val mins = (0 until numHashes)
      .map(j => min(md5Long(col("s"), Some(j))).as(s"h$j"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: band the signature (rows-per-band=2),
    * bucket-join within bands for candidates, then verify true bigram
    * Jaccard >= tau. Returns (doc_a, doc_b, jaccard). */
  def minhashLshPairs(docs: DataFrame, tau: Double = 0.6,
      numHashes: Int = 8): DataFrame = {
    val sig = minhashSignatures(docs, numHashes)
    val bands = numHashes / 2
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          concat_ws("_", col(s"h${2 * b}"), col(s"h${2 * b + 1}"))
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(docs, cand, tau)
  }

  /** True bigram-shingle Jaccard for given candidate pairs. */
  private def verifyJaccard(docs: DataFrame, cand: DataFrame,
      tau: Double): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")))).as("s"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.s") === col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (col("na.n") + col("nb.n") - col("inter")).cast(DoubleType))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** SimHash (16-bit here; width is a parameter): per bit, sum +-1 over the
    * document's distinct token hashes, sign -> bit. One explode + one agg;
    * the bit loop is column arithmetic, not extra passes. */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .distinct()
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
    val sh = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")))).as("s"))
      .distinct()
    val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
    val candSh = sh.join(rare, "s")
    val cand = candSh.as("l").join(candSh.as("r"),
        col("l.s") === col("r.s") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(docs, cand, tau)
  }

  /** Embedding cosine near-dup: exact integer-quantized cosine over
    * candidate pairs. Small inputs go brute force; the documented scale
    * path is Similarity.lshBuckets-style blocking first. */
  def embeddingNearDup(emb: DataFrame, tau: Double = 0.4): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      normSqQ(col("embedding")).as("nsq"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineQ(dotQ(col("a.embedding"), col("b.embedding")),
          col("a.nsq"), col("b.nsq")).as("cosine"))
      .filter(col("cosine") >= tau)
  }
}
