package graft

import org.apache.spark.sql.functions._

import graft.ops.Unigram

/** Unigram segmentation semantics the corpus oracle can't isolate:
  * hand-computed lexicon frequencies, the fewest-pieces-first objective,
  * the frequency-sum tie-break, and the loud failure modes. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("lexicon: substring counts weighted by word occurrences, minCount keep") {
    val lex = Unigram.lexicon(docsOf("abcdefgh abcd", "abcdefgh efgh"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abcd": substring of abcdefgh (wf 2) + the word itself (wf 1)
    assert(lex("abcd") == 3L && lex("efgh") == 3L)
    // interior substring rides only the long word
    assert(lex("bcde") == 2L)
    // pieces never exceed MaxPieceLen; single chars always kept
    assert(lex.keys.forall(_.length <= Unigram.MaxPieceLen))
    assert(lex.contains("a") && lex.contains("h"))
    val once = Unigram.lexicon(docsOf("ab xyz"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!once.contains("xyz") && !once.contains("ab"),
      "freq-1 multi-char pieces must drop")
    assert(once("x") == 1L, "freq-1 single chars must stay")
  }

  test("segment: fewest pieces wins; frequency sum breaks ties") {
    val d = docsOf("abcdefgh abcd", "abcdefgh efgh")
    val seg = Unigram.segmentWords(d, Unigram.lexicon(d))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the 8-char word splits into the two frequency-3 halves (the ONLY
    // 2-piece split), never a char spray
    assert(seg("abcdefgh") == (2L, 2L, 6L), s"seg=$seg")
    assert(seg("abcd") == (1L, 1L, 3L))
    // tie-break: "cdcd" has two 2-piece splits — cd+cd (4+4) must beat
    // cdc+d (2+5)
    val d2 = docsOf("cdcd cd dc cdc")
    val seg2 = Unigram.segmentWords(d2, Unigram.lexicon(d2))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(seg2("cdcd") == (2L, 8L), s"seg2=$seg2")
  }

  test("meter: per-doc totals are word-count-weighted piece counts") {
    val d = docsOf("abcdefgh abcd", "abcdefgh efgh")
    val m = Unigram.meter(d, Unigram.lexicon(d))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc0: abcdefgh(2 pieces) + abcd(1) = 2 words, 3 pieces
    assert(m(0L) == (2L, 3L) && m(1L) == (2L, 3L), s"m=$m")
  }

  test("wordpiece greedy: longest match wins, strictly worse than " +
      "viterbi on the classic trap, never better anywhere") {
    // hand lexicon: greedy eats "abcd" and strands "ef" as singles
    // (3 pieces); viterbi finds abc|def (2). Singles keep totality.
    val lex = (Seq(("abcd", 5L), ("abc", 4L), ("def", 4L)) ++
      "abcdef".map(c => (c.toString, 1L))).toDF("piece", "freq")
    val d = docsOf("abcdef")
    val g = Unigram.segmentWordsGreedy(d, lex).collect().head
    assert(g.getAs[Long]("n_pieces") == 3L) // abcd | e | f
    assert(g.getAs[Long]("piece_freq_sum") == 7L)
    val v = Unigram.segmentWords(d, lex).collect().head
    assert(v.getAs[Long]("n_pieces") == 2L) // abc | def
    // property: over the corpus-harvested lexicon, greedy never beats
    // the DP on ANY word (it minimizes piece count by construction)
    val corpus = docsOf("abcdefgh abcd wordpiece pieces",
      "abcdefgh efgh word pie piece")
    val cl = Unigram.lexicon(corpus)
    val gm = Unigram.segmentWordsGreedy(corpus, cl).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_pieces")).toMap
    Unigram.segmentWords(corpus, cl).collect().foreach { r =>
      assert(gm(r.getString(0)) >= r.getAs[Long]("n_pieces"),
        s"greedy beat viterbi on ${r.getString(0)}")
    }
    graft.ops.TextKit.releaseCaches()
  }

  test("loud failures: over-horizon words and unsegmentable lexicons") {
    val long = docsOf("a" * (Unigram.MaxWordLen + 1))
    val e1 = intercept[IllegalArgumentException](
      Unigram.segmentWords(long, Unigram.lexicon(long)).collect())
    assert(e1.getMessage.contains("MaxWordLen"))
    // a lexicon missing a needed char must raise, not drop the word
    val d = docsOf("ab ab")
    val crippled = Seq(("a", 2L)).toDF("piece", "freq")
    val e2 = intercept[Exception](
      Unigram.segmentWords(d, crippled).collect())
    assert(e2.getMessage != null)
  }
}
