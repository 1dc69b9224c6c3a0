package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextKit.tracked

/** Unigram-lexicon subword segmentation — the SentencePiece-shaped
  * tokenizer family (Kudo 2018, "Subword Regularization"): a substring
  * LEXICON harvested from the corpus word table, then per-word Viterbi
  * segmentation as dynamic programming over the position DAG, then
  * corpus-level token metering through the word table.
  *
  * Pinned deviation from the paper: classic unigram-LM Viterbi maximizes
  * sum(log p(piece)); logs are transcendental and two engines' libm may
  * disagree in the last ulp, which a hash-exact DuckDB oracle cannot
  * tolerate. The objective here is the INTEGER lexicographic surrogate
  * "fewest pieces, then largest total piece frequency": the DP structure
  * (shortest path over word positions) is identical, every quantity is a
  * long, and both engines compute bit-identical answers. For a
  * frequency-ranked lexicon the two objectives agree whenever piece
  * counts differ — the log term only arbitrates among equal-length
  * segmentations. Encoded as one cost long per piece: Big - clamp(freq),
  * so minimizing total cost minimizes the piece count first (Big
  * dominates) and maximizes the frequency sum second.
  *
  * 100 TB shape (the [[Bpe]] policy): the corpus is aggregated ONCE to
  * the word-frequency table; lexicon harvest explodes substrings of the
  * DISTINCT words only (vocabulary-bounded, maxPieceLen^2 pieces per
  * word); the DP itself is ROW-LOCAL (one native
  * [[graft.functions.SubwordDp]] kernel over the word's matched pieces
  * after a single lexicon equi-join) — work is
  * vocab x maxWordLen x maxPieceLen, never corpus-scale, with no
  * per-position rounds. Per-doc metering joins the segmented word table
  * back to the corpus — the one corpus-scale pass, a dictionary join
  * exactly like BPE encode.
  */
object Unigram {

  /** DP horizon: words longer than this fail loudly (the corpus word
    * table is inspected cheaply first — silent truncation would
    * mis-meter). */
  val MaxWordLen = 12

  /** Longest lexicon piece. */
  val MaxPieceLen = 4

  /** Piece-count stride of the folded cost. Frequencies are clamped to
    * Big/16 so a word's <= MaxWordLen piece frequencies can never sum
    * past one stride (the clamp is part of the defined objective and is
    * mirrored in the oracle). */
  val Big = 1L << 44
  val FreqClamp = Big / 16

  /** The corpus word-frequency table: (word, wf). */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))

  /** Candidate lexicon: every substring of length <= maxPieceLen of
    * every corpus word, weighted by word occurrences (a piece occurring
    * twice in one word counts twice, as in substring-count
    * initialization). Pieces below `minCount` drop UNLESS single-char —
    * single characters always stay so every word stays segmentable.
    * Output: (piece, freq). */
  def lexicon(docs: DataFrame, minCount: Long = 2L): DataFrame = {
    val w = wordFreq(docs)
    val subs = w.select(col("wf"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), s =>
          transform(sequence(lit(1),
              least(lit(MaxPieceLen), length(col("word")) - s + 1)), l =>
            col("word").substr(s, l))))).as("piece"))
    subs.groupBy(col("piece")).agg(sum(col("wf")).as("freq"))
      .filter(col("freq") >= minCount || length(col("piece")) === 1)
  }

  /** Both segmentation objectives for every distinct corpus word in ONE
    * pass: (word, wf, m) where m = struct(v_np, v_fs, g_np, g_fs) from
    * the native [[graft.functions.SubwordDp]] kernel. The word's
    * candidate substrings (<= wordLen x MaxPieceLen, all positions)
    * enumerate once, ONE equi-join against the lexicon keeps the
    * matches, and the per-word DP runs row-locally over the collected
    * matched pieces — replacing MaxWordLen join+aggregate ROUNDS per
    * segmenter (and their per-round truncation jobs) with one join +
    * one aggregation, shared by BOTH objectives (q245 runs both).
    * Bit-identical results (UnigramSpec + the DuckDB oracles): the
    * kernel mirrors the folded-cost Viterbi and the argmax-by-length
    * greedy exactly, including duplicate-piece and tie behavior.
    *
    * The lexicon join broadcasts only under [[BroadcastPieceLimit]]
    * rows (vocabulary-bounded by construction for corpus-harvested
    * lexicons; a caller-supplied oversized one degrades to a shuffled
    * join instead of OOMing the driver — the hint is a promise). */
  private def segmented(docs: DataFrame, lex: DataFrame): DataFrame = {
    val words = tracked(wordFreq(docs))
    // horizon guard: the folded-cost stride is only collision-free while
    // a word's clamped piece frequencies can't sum past Big (needs
    // wordLen < 16; MaxWordLen = 12). Scans word lengths once.
    val maxLen = Option(words.agg(max(length(col("word")))).head.get(0))
      .fold(0)(_.asInstanceOf[Number].intValue)
    require(maxLen <= MaxWordLen,
      s"segmentWords: corpus max word length $maxLen exceeds " +
        s"MaxWordLen=$MaxWordLen — raise the horizon; silent truncation " +
        "would mis-meter")
    val pieces = tracked(lex.select(col("piece"), col("freq")))
    val gate = (df: DataFrame) =>
      if (pieces.count() <= BroadcastPieceLimit) broadcast(df) else df
    val cands = words.select(col("word"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), s =>
          transform(sequence(lit(1),
              least(lit(MaxPieceLen), length(col("word")) - s + 1)), l =>
            struct((s - 1).cast("int").as("pos"), l.cast("int").as("len"),
              col("word").substr(s, l).as("piece")))))).as("c"))
      .select(col("word"), col("c.pos").as("pos"), col("c.len").as("len"),
        col("c.piece").as("piece"))
    val matched = cands.join(gate(pieces), Seq("piece"))
      .groupBy(col("word"))
      .agg(collect_list(struct(col("pos"), col("len"), col("freq")))
        .as("pieces"))
    val noPieces = array().cast(
      "array<struct<pos:int,len:int,freq:bigint>>")
    words.join(matched, Seq("word"), "left")
      .select(col("word"), col("wf"),
        graft.functions.SubwordDp(length(col("word")),
          coalesce(col("pieces"), noPieces), Big, FreqClamp, MaxPieceLen)
          .as("m"))
  }

  /** Rows of [[segmented]] with NULL objective fields failed loudly —
    * impossible while single chars ride the lexicon, so a NULL means a
    * caller-supplied lexicon bug (the guard lives INSIDE the used
    * columns so pruning can never elide it). */
  private def failLoud(gate: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(gate.isNull, raise_error(
      concat(lit("unsegmentable word: "), col("word")))).otherwise(v)

  /** Largest lexicon (rows) the segmenter join will broadcast. */
  val BroadcastPieceLimit = 5000000L

  /** Viterbi-segment every distinct corpus word against `lex`
    * ((piece, freq), e.g. [[lexicon]]'s output): returns
    * (word, wf, n_pieces, piece_freq_sum) under the integer objective.
    * Unreachable words (a char missing from the lexicon) fail loudly
    * rather than dropping from the metering. */
  def segmentWords(docs: DataFrame, lex: DataFrame): DataFrame =
    segmented(docs, lex).select(col("word"), col("wf"),
      failLoud(col("m.v_np"), col("m.v_np")).as("n_pieces"),
      failLoud(col("m.v_np"), col("m.v_fs")).as("piece_freq_sum"))

  /** Corpus token metering under the unigram segmenter: per document,
    * word count and total subword pieces — the one corpus-scale pass, a
    * dictionary join against the segmented word table. */
  def meter(docs: DataFrame, lex: DataFrame): DataFrame = {
    val seg = segmentWords(docs, lex)
      .select(col("word"), col("n_pieces"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_pieces")).as("uni_tokens"))
  }

  /** WordPiece-style GREEDY longest-match-first segmentation (Wu et al.
    * 2016, the BERT tokenizer's algorithm) over the SAME corpus lexicon
    * the Viterbi segmenter uses — the third subword family, and sharing
    * the lexicon is deliberate: it makes the greedy-vs-optimal fertility
    * comparison apples-to-apples (pinned deviation: no `##`-prefixed
    * continuation vocabulary — the lexicon is position-free, which
    * changes nothing about the algorithm under test). At each word
    * position the LONGEST lexicon piece matching there is taken and the
    * cursor advances; single characters always ride the lexicon, so no
    * word is unmatchable and no [UNK] is needed. Greedy can be strictly
    * worse than Viterbi (spec pins a 3-vs-2-piece counterexample) but
    * never better — [[segmentWords]] minimizes the piece count.
    *
    * Scale shape: identical to the Viterbi DP — `MaxWordLen` rounds of
    * (frontier explode x MaxPieceLen candidate substrings) equi-joined
    * to the lexicon with an argmax-by-length tail, one row of state per
    * distinct word, lineage-truncated per round. Work is
    * vocab x MaxWordLen x MaxPieceLen, never corpus-scale. */
  def segmentWordsGreedy(docs: DataFrame, lex: DataFrame): DataFrame =
    segmented(docs, lex).select(col("word"), col("wf"),
      failLoud(col("m.g_np"), col("m.g_np")).as("n_pieces"),
      failLoud(col("m.g_np"), col("m.g_fs")).as("piece_freq_sum"))

  /** Per-document metering under the greedy segmenter, alongside the
    * Viterbi count — the fertility comparison row (wp_tokens >=
    * uni_tokens always; equality when greedy happens to be optimal). */
  def meterGreedy(docs: DataFrame, lex: DataFrame): DataFrame = {
    // ONE segmented pass serves both objectives: the SubwordDp kernel
    // computes the Viterbi and greedy counts together, so the lexicon
    // harvest, the word table, the candidate join, and the per-word
    // aggregation all run once — where the round form ran two full
    // segmenters over a shared lexicon
    val seg = segmented(docs, lex)
      .select(col("word"),
        failLoud(col("m.g_np"), col("m.g_np")).as("np_g"),
        failLoud(col("m.v_np"), col("m.v_np")).as("np_v"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np_g")).as("wp_tokens"),
        sum(col("n") * col("np_v")).as("uni_tokens"))
      .withColumn("overhead_ppm",
        expr("(wp_tokens - uni_tokens) * 1000000L div uni_tokens"))
  }
}
