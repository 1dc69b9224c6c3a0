package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import TextKit._

/** Training-data export: deterministic hash sharding. A training run wants
  * the corpus split into a fixed number of shards whose membership is a
  * pure function of the row key — reproducible across runs, engines and
  * input partitionings (rand()-based assignment is none of those), and
  * uniformly sized without inspecting the data (md5 is uniform over keys
  * regardless of key skew or ranges).
  *
  * 100 TB shape: assignment is a narrow projection (no shuffle);
  * [[exportShards]] pays exactly ONE shuffle — repartition by the shard
  * column so each shard's rows land in one task — then writes one
  * key-sorted file per shard directory. Readers (data loaders) get
  * per-shard files they can stream independently; at petabyte scale raise
  * `nShards` until a shard fits a loader worker. */
object Export {

  /** Add a `shard` column: md5(id) mod nShards — NOT id mod nShards, so
    * structured key spaces (sequential ids, ids-with-stride) still spread
    * uniformly. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn("shard",
      pmod(md5Long(col(idCol).cast(StringType)), lit(nShards.toLong)))
  }

  /** Write one Hive shard directory (`shard=k/`) per shard, one file per
    * directory, rows sorted by `idCol` within the file (deterministic
    * bytes given deterministic input). */
  def exportShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    shardAssign(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", idCol)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Sequence packing for pretraining batches: documents are laid out in
    * a deterministic pseudo-random order (the md5 hash key — the
    * reproducible "shuffle" a training run wants) and greedily packed
    * into fixed token-budget bins: a document starting at running-token
    * offset o lands in pack o div budget. Emits (doc_id, shard, pack_id,
    * pack_pos, n_tokens).
    *
    * 100 TB shape: packing is per SHARD — the running sum is a window
    * partitioned by the shard column, so shards pack in parallel and no
    * global order/total sort exists anywhere; one shuffle on shard. A
    * document longer than the budget still gets a pack (its own start
    * offset's bin, overflowing it) — filter oversize docs upstream with
    * [[TextAnalysis.lengthPercentiles]]-derived bounds if undesired. */
  def packSequences(docs: DataFrame, budget: Long = 2048L,
      nShards: Int = 8): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("hkey"), col("doc_id"))
    val base = shardAssign(docs, "doc_id", nShards)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("hkey", md5Long(col("doc_id").cast(StringType)))
    base
      .withColumn("cum", sum(col("n_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div ${budget}L"))
      .withColumn("pack_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"), col("pack_id"))
          .orderBy(col("hkey"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("pack_pos"),
        col("n_tokens"))
  }

  /** Semantic sequence packing — in-context pretraining (Shi et al.
    * 2023): like [[packSequences]], but documents are laid out within
    * each shard ORDERED BY their semantic cluster first (then the
    * deterministic hash order), so related documents co-occur inside a
    * training pack and the model sees coherent long contexts instead
    * of random concatenation. `cells` is ANY (vec_id, cell) cluster
    * assignment — [[graft.ops.Similarity.cellAssignments]] is the
    * stock one; documents without an embedding pack first under cell
    * -1 (the layout stays total).
    *
    * 100 TB shape: [[packSequences]]'s cost plus ONE keyed equi-join
    * against the cluster relation (shuffle on doc id — the cluster
    * table is corpus-sized, never broadcast); the running sum stays a
    * per-shard window, no global sort. */
  def semanticPack(docs: DataFrame, cells: DataFrame,
      budget: Long = 2048L, nShards: Int = 8): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("cell"), col("hkey"), col("doc_id"))
    val base = shardAssign(docs, "doc_id", nShards)
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("hkey", md5Long(col("doc_id").cast(StringType)))
      .join(cells.select(col("vec_id"), col("cell")),
        col("doc_id") === col("vec_id"), "left")
      .withColumn("cell", coalesce(col("cell"), lit(-1L)))
    base
      .withColumn("cum", sum(col("n_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div ${budget}L"))
      .withColumn("pack_pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"), col("pack_id"))
          .orderBy(col("cell"), col("hkey"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("cell"), col("pack_id"),
        col("pack_pos"), col("n_tokens"))
  }

  /** Context-window chunking: split each document into fixed-size token
    * windows with `overlap` tokens of left context carried into each next
    * chunk (the RAG/pretraining prep step). Chunk i covers tokens
    * [i*stride, i*stride + chunkTokens) with stride = chunkTokens -
    * overlap; chunk count = ceil(max(n - overlap, 1) / stride) (>= 1 —
    * empty-ish docs still emit their one chunk), so the trailing chunk
    * truncates but is never a pure suffix of the previous chunk (a count
    * of ceil(n/stride) would emit a fully-contained duplicate chunk
    * whenever 1 <= n mod stride <= overlap). Emits
    * (doc_id, chunk_idx, chunk_n_tokens, chunk_hash) — the hash is the
    * downstream chunk-level dedup/audit key; re-shipping chunk BODIES is
    * the consumer's call (same slice expression).
    *
    * 100 TB shape: pure narrow column arithmetic (split + sequence
    * explode + slice), NO shuffle at all — chunking parallelizes with the
    * scan, and the output row count is corpus tokens / stride. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        expr(s"greatest(1, (n - $overlap + ${stride - 1}) div $stride)") - 1)))
      .withColumn("chunk",
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("chunk_n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  /** Per-shard manifest: row count, total characters, and an
    * order-independent id checksum (sum of 60-bit id hashes mod 2^31-1 —
    * bounded far under BIGINT overflow at any realistic shard size). The
    * audit artifact an export job emits next to the shards. */
  def shardSummary(df: DataFrame, idCol: String, nShards: Int,
      charsCol: String = "n_chars"): DataFrame =
    shardAssign(df, idCol, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("sum_chars"),
        sum(md5Long(col(idCol).cast(StringType)) % lit(Dedup.P))
          .as("id_checksum"))
}
