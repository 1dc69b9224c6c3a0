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
  * word); the DP runs maxWordLen rounds of a keyed join between the
  * position frontier (one row per surviving word) and the lexicon —
  * work is vocab x maxWordLen x maxPieceLen, never corpus-scale. Round
  * frontiers are lineage-truncated ([[Components.truncated]]) so the
  * DP's 4-way frontier references never compound Catalyst re-analysis.
  * Per-doc metering joins the segmented word table back to the corpus —
  * the one corpus-scale pass, a dictionary join exactly like BPE encode.
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

  /** Viterbi-segment every distinct corpus word against `lex`
    * ((piece, freq), e.g. [[lexicon]]'s output): returns
    * (word, wf, n_pieces, piece_freq_sum) under the integer objective.
    * One DP round per position: the frontier at position j extends by
    * every lexicon piece word[j..k), and position k keeps the min folded
    * cost. Unreachable words (a char missing from the lexicon) fail
    * loudly rather than dropping from the metering. */
  def segmentWords(docs: DataFrame, lex: DataFrame): DataFrame = {
    val words = tracked(wordFreq(docs))
    // the horizon guard already scans word lengths — take the max while
    // there, and run the DP only to the corpus's ACTUAL longest word
    // (rounds past it are provably empty: dp(k) only feeds finals at
    // length == k). sum/max over zero rows is NULL -> empty corpus = 0.
    val maxLen = Option(words.agg(max(length(col("word")))).head.get(0))
      .fold(0)(_.asInstanceOf[Number].intValue)
    require(maxLen <= MaxWordLen,
      s"segmentWords: corpus max word length $maxLen exceeds " +
        s"MaxWordLen=$MaxWordLen — raise the horizon; silent truncation " +
        "would mis-meter")
    val cost = (lit(Big) - least(col("freq"), lit(FreqClamp))).as("pcost")
    // broadcast: the lexicon is vocabulary-bounded (MBs); without the
    // hint each DP round shuffles BOTH the frontier and the lexicon for
    // the piece equi-join — with it only the min-cost aggregation
    // shuffles, halving the per-round exchanges
    val pieces = tracked(lex.select(col("piece"), cost))
    // dp(k) = one row per word reachable at position k with the min cost
    val dpByPos = new Array[DataFrame](maxLen + 1)
    dpByPos(0) = Components.truncated(
      words.select(col("word"), lit(0L).as("cost")))
    for (k <- 1 to maxLen) {
      val branches = (math.max(0, k - MaxPieceLen) until k).map { j =>
        dpByPos(j).filter(length(col("word")) >= k)
          .select(col("word"),
            col("word").substr(lit(j + 1), lit(k - j)).as("piece"),
            col("cost"))
      }
      val cand = branches.reduce(_.unionByName(_))
        .join(broadcast(pieces), Seq("piece"))
        .select(col("word"), (col("cost") + col("pcost")).as("c"))
      dpByPos(k) = Components.truncated(
        cand.groupBy(col("word")).agg(min(col("c")).as("cost")))
    }
    val finals =
      if (maxLen == 0) dpByPos(0).filter(lit(false)) // empty corpus
      else (1 to maxLen).map(k =>
        dpByPos(k).filter(length(col("word")) === k)).reduce(_.unionByName(_))
    val out = words.join(finals, Seq("word"), "left")
    // a NULL cost is an unsegmentable word — impossible while single
    // chars ride the lexicon, so it must be a caller-supplied lexicon
    // bug: fail loudly (the guard lives INSIDE the used column so
    // pruning can never elide it)
    val n = expr(s"(cost + ${Big - 1}) div $Big")
    out.select(col("word"), col("wf"),
        when(col("cost").isNull, raise_error(
            concat(lit("unsegmentable word: "), col("word"))))
          .otherwise(n).as("n_pieces"),
        when(col("cost").isNull, raise_error(
            concat(lit("unsegmentable word: "), col("word"))))
          .otherwise(n * lit(Big) - col("cost")).as("piece_freq_sum"))
  }

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
  def segmentWordsGreedy(docs: DataFrame, lex: DataFrame): DataFrame = {
    val words = tracked(wordFreq(docs))
    // same bounded horizon as segmentWords: rounds past the corpus's
    // longest word leave the state bit-identical (active is empty)
    val maxLen = Option(words.agg(max(length(col("word")))).head.get(0))
      .fold(0)(_.asInstanceOf[Number].intValue)
    require(maxLen <= MaxWordLen,
      s"segmentWordsGreedy: corpus max word length $maxLen exceeds " +
        s"MaxWordLen=$MaxWordLen")
    val pieces = tracked(lex.select(col("piece"), col("freq")))
    var state = Components.truncated(words.select(col("word"), col("wf"),
      lit(0).as("pos"), lit(0L).as("np"), lit(0L).as("fs")))
    for (_ <- 1 to maxLen) {
      val active = state.filter(col("pos") < length(col("word")))
      val done = state.filter(col("pos") >= length(col("word")))
      val step = active
        .select(col("word"), col("wf"), col("pos"), col("np"), col("fs"),
          explode(sequence(lit(1),
            least(lit(MaxPieceLen), length(col("word")) - col("pos"))))
            .as("l"))
        .select(col("word"), col("wf"), col("pos"), col("np"), col("fs"),
          col("l"), col("word").substr(col("pos") + 1, col("l")).as("piece"))
        .join(broadcast(pieces), Seq("piece"))
        // longest match wins; equal lengths are the SAME piece string,
        // so the struct argmax is deterministic
        .groupBy(col("word"), col("wf"), col("pos"), col("np"), col("fs"))
        .agg(max(struct(col("l"), col("freq"))).as("m"))
        .select(col("word"), col("wf"),
          (col("pos") + col("m.l")).as("pos"), (col("np") + 1).as("np"),
          (col("fs") + col("m.freq")).as("fs"))
      state = Components.truncated(step.unionByName(done))
    }
    val unfinished = state.filter(col("pos") < length(col("word"))).count()
    require(unfinished == 0, // impossible while single chars ride the lex
      s"segmentWordsGreedy: $unfinished words unmatchable — lexicon bug")
    state.select(col("word"), col("wf"), col("np").as("n_pieces"),
      col("fs").as("piece_freq_sum"))
  }

  /** Per-document metering under the greedy segmenter, alongside the
    * Viterbi count — the fertility comparison row (wp_tokens >=
    * uni_tokens always; equality when greedy happens to be optimal). */
  def meterGreedy(docs: DataFrame, lex: DataFrame): DataFrame = {
    // both segmenters read the lexicon (and its possibly expensive
    // harvest chain) — materialize it once, not once per segmenter
    val lexL = TextKit.trackedLeaf(lex)
    val segG = segmentWordsGreedy(docs, lexL)
      .select(col("word"), col("n_pieces").as("np_g"))
    val segV = segmentWords(docs, lexL)
      .select(col("word"), col("n_pieces").as("np_v"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
      .join(segG, Seq("word")).join(segV, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("np_g")).as("wp_tokens"),
        sum(col("n") * col("np_v")).as("uni_tokens"))
      .withColumn("overhead_ppm",
        expr("(wp_tokens - uni_tokens) * 1000000L div uni_tokens"))
  }
}
