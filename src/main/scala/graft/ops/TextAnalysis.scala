package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextKit._

/** Text-analysis operators for training-data curation over
  * `documents(doc_id, text, lang, source, n_chars)`. All pure column
  * arithmetic — no UDFs, everything stays in whole-stage codegen and
  * parallelizes trivially. */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and deterministic; real deployments
    * plug in bigger lists via the same shape. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "fr" -> Seq("le", "la", "et", "de", "un", "des"),
    "es" -> Seq("el", "los", "de", "y", "en", "una"),
    "de" -> Seq("der", "die", "und", "das", "ein", "mit"))

  private def scoreFor(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Language-ID: per-language stopword hit counts + argmax prediction
    * (ties and all-zero -> "und", deterministic by score desc then language
    * code). Output keeps the per-language scores for inspection. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val langs = stopwords.keys.toSeq.sorted
    val scored = docs.select(
      col("doc_id") +: langs.map(l =>
        scoreFor(toks, stopwords(l)).as(s"score_$l")): _*)
    // argmax via a sorted struct array: (-score, lang) ascending head
    val best = array(langs.map(l =>
      struct((-col(s"score_$l")).as("neg"), lit(l).as("lang"))): _*)
    scored.select(col("doc_id") +: langs.map(l => col(s"score_$l")) :+
      when(array_max(array(langs.map(l => col(s"score_$l")): _*)) === 0,
        lit("und"))
        .otherwise(array_sort(best).getItem(0).getField("lang"))
        .as("predicted_lang"): _*)
  }

  /** Quality scoring: token count, mean token length, stopword ratio,
    * short-doc flag, and a composite 0..1 score. Ratios are double
    * divisions of exact integers — deterministic. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val allStop = stopwords.values.flatten.toSeq.distinct
    docs.select(col("doc_id"),
        size(toks).as("n_tokens"),
        col("n_chars"),
        scoreFor(toks, allStop).as("n_stopwords"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"),
        ((col("n_chars") - (col("n_tokens") - 1)).cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("mean_token_len"),
        (col("n_stopwords").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("stopword_ratio"),
        (col("n_tokens") < 30).as("too_short"))
      .select(col("*"),
        (when(col("too_short"), 0.0).otherwise(1.0) *
          (lit(1.0) - col("stopword_ratio"))).as("quality_score"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other non-space chars) + distinct
    * token count. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      size(array_distinct(tokens(col("text")))).as("distinct_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))
        .as("bpe_ish_tokens"))

  /** Vocabulary building: corpus-wide token statistics — term frequency
    * (total occurrences) and document frequency — for the `topK` most
    * frequent tokens (ties broken by token, deterministic). The explode +
    * two-level aggregation is the canonical shape: the (doc, token)
    * pre-aggregation gives map-side combining on the zipfian head ("the"
    * never funnels raw rows to one reducer), and the final top-k is a
    * TakeOrdered over the (small) distinct-token relation, not a global
    * sort of the corpus. */
  def vocabulary(docs: DataFrame, topK: Int = 500): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("token"))
      .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(topK)

  /** The deterministic per-language keep predicate behind
    * [[stratifiedSample]]: md5(doc_id) mod 100 under the language's
    * percentage. Exposed so pipeline compositions reuse the exact
    * semantics. */
  def sampleKeep(pctByLang: Map[String, Int], defaultPct: Int): Column = {
    val pct = pctByLang.toSeq.sortBy(_._1)
      .foldRight(lit(defaultPct): Column) { case ((l, p), acc) =>
        when(col("lang") === l, lit(p)).otherwise(acc)
      }
    md5Long(col("doc_id").cast(StringType)) % 100 < pct
  }

  /** Deterministic per-language stratified sample: keep a document iff
    * md5(doc_id) mod 100 falls under its language's percentage. Hash-based
    * (not rand()) so the sample is reproducible across runs, engines and
    * partitionings — the property a training-data pipeline needs for
    * resumable/auditable subsampling. The rate table rides along as a
    * broadcast-sized literal map; a narrow filter, no shuffle at all. */
  def stratifiedSample(docs: DataFrame,
      pctByLang: Map[String, Int] = Map("en" -> 10, "fr" -> 30, "es" -> 30,
        "de" -> 50), defaultPct: Int = 20): DataFrame =
    docs.filter(sampleKeep(pctByLang, defaultPct))
      .select(col("doc_id"), col("lang"), col("source"))

  /** Deterministic DISJOINT train/validation/test assignment — the
    * split every training run needs, as a pure hash partition of the id
    * space: bucket = md5(doc_id) mod 1000; buckets below `valPermille`
    * are validation, the next `testPermille` are test, the rest train.
    * Hash-based (not rand()) so the split is reproducible across runs,
    * engines and partitionings, STABLE under corpus growth (a document's
    * assignment never changes as others arrive — the property that keeps
    * eval sets honest across snapshots), and disjoint by construction.
    * Stratification per source/language falls out of hashing ids (each
    * stratum is hash-split at the same rates in expectation). A narrow
    * projection: no shuffle, no state. */
  def trainValTestSplit(docs: DataFrame, valPermille: Int = 50,
      testPermille: Int = 50): DataFrame = {
    require(valPermille >= 0 && testPermille >= 0 &&
      valPermille + testPermille <= 1000,
      s"permille splits must be non-negative and sum <= 1000, got " +
        s"$valPermille + $testPermille")
    val bucket = md5Long(col("doc_id").cast(StringType)) % 1000
    docs.select(col("doc_id"), col("source"), bucket.as("split_bucket"),
      when(bucket < valPermille, "val")
        .when(bucket < valPermille + testPermille, "test")
        .otherwise("train").as("split"))
  }

  /** CCNet-style quality buckets: stratify the corpus into `nBuckets`
    * nearest-rank quantile buckets of bigram-LM fluency (0 = least
    * fluent tail .. nBuckets-1 = most fluent head) — the head/middle/
    * tail split CCNet uses to stratify web data by LM quality before
    * per-bucket sampling ([[tokenRateMix]] / [[stratifiedSample]]
    * compose downstream on the `bucket` column).
    *
    * Shape at scale: the score comes from [[bigramScore]] (one model
    * aggregation); the boundaries are exact `percentile_disc`
    * aggregates over the score distribution — a single distributed
    * aggregate whose merge state is the per-partition score histogram —
    * and assignment is a crossJoin of the one-row bounds frame with a
    * when-chain. No global sort, no window, no driver-side count. Ties
    * at a boundary fall into the LOWER bucket (the boundary value
    * closes its bucket), so the split is deterministic cross-engine. */
  def fluencyBuckets(docs: DataFrame, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets must be >= 2")
    val scored = bigramScore(docs)
      .select(col("doc_id"), col("fluency_ppm"))
    val boundCols = (1 until nBuckets).map { i =>
      expr(s"percentile_disc(${i.toDouble / nBuckets}d) " +
        "WITHIN GROUP (ORDER BY fluency_ppm)")
        .cast("long").as(s"b$i")
    }
    val bounds = scored.agg(boundCols.head, boundCols.tail: _*)
    val bucket = (1 until nBuckets).reverse
      .foldLeft(lit(nBuckets - 1): Column) { (acc, i) =>
        when(col("fluency_ppm") <= col(s"b$i"), lit(i - 1)).otherwise(acc)
      }
    scored.crossJoin(bounds)
      .select(col("doc_id"), col("fluency_ppm"), bucket.as("bucket"))
  }

  /** The normalization expression itself (lowercase, strip to
    * [a-z0-9 ], collapse runs, trim) — exposed so pipeline compositions
    * share the exact semantics with [[normalize]]. */
  def normExpr(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Text normalization for dedup/training: lowercase, strip everything
    * outside [a-z0-9 ], collapse whitespace runs, trim — emitted as the
    * normalized length + md5 (the downstream exact-dedup key) rather than
    * re-shipping the body. Pure codegen'd string expressions. */
  def normalize(docs: DataFrame): DataFrame = {
    val norm = normExpr(col("text"))
    docs.select(col("doc_id"),
      length(norm).as("n_chars_norm"), md5(norm).as("norm_hash"))
  }

  /** Per-document keyword extraction: the `k` most discriminative tokens
    * per document, ranked by (tf desc, df asc, token) — the TF-IDF-shaped
    * ordering with INTEGER keys only. (A float idf = ln(N/df) would carry
    * the same ordering but `ln` is not bit-identical across engines'
    * libm implementations, so the score itself stays out of the hashed
    * output.) Shape at scale: one exploded (doc, token) pre-aggregation
    * (map-side combine on the zipfian head), the token-level df relation
    * derived FROM the cached tf relation (no second corpus scan), joined
    * back on token, then a per-document window — the window partitions
    * by doc_id, so its sort is per-document (bounded by a doc's distinct
    * tokens), never a global sort. */
  def keywords(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = tracked(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token"))
    tf.join(df, "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"))
  }

  /** PII scrubbing over free text: email addresses and long digit runs
    * masked with fixed placeholders. Emits the redaction counts and the
    * scrubbed text's length + md5 (the downstream dedup/audit key)
    * instead of re-shipping the body. The patterns stay inside the
    * RE2/Java-regex common subset (character classes, bounded repeats)
    * so every engine applies the identical masking; pure codegen'd
    * string expressions, embarrassingly parallel. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longDigitsPattern = "[0-9]{6,}"

  def scrubPii(docs: DataFrame): DataFrame = {
    val emailScrubbed = regexp_replace(col("text"), emailPattern, "<EMAIL>")
    val scrubbed = regexp_replace(emailScrubbed, longDigitsPattern, "<NUM>")
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(emailPattern)).as("n_emails"),
      // counted AFTER the email pass so each count is the number of
      // replacements that stage actually performed: a digit run inside
      // an email address is redacted by <EMAIL>, not double-reported
      regexp_count(emailScrubbed, lit(longDigitsPattern))
        .as("n_long_numbers"),
      length(scrubbed).as("n_chars_scrubbed"),
      md5(scrubbed).as("scrubbed_hash"))
  }

  /** Per-language exact length percentiles by NEAREST RANK: the value at
    * row ceil(p*n/100) of each language's (n_chars, doc_id) order — the
    * length thresholds a curation pipeline derives before filtering.
    * Interpolating percentile definitions differ between engines (and
    * between Spark's percentile/percentile_approx themselves), so the
    * rank is selected with pure integer arithmetic: target =
    * (p*n + 99) div 100. One shuffle on lang; the window sort is
    * per-language. Ties at the target rank are value-identical by
    * construction, so the doc_id tiebreak affects only which row —
    * never which value — is emitted. */
  def lengthPercentiles(docs: DataFrame,
      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val ranked = docs.select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(
        byLang.orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
    ranked
      .withColumn("p", explode(array(ps.map(lit(_)): _*)))
      .filter(col("rn") === expr("(p * n + 99) div 100"))
      .select(col("lang"), col("p"), col("n_chars").as("len_at_p"))
  }

  /** One-row CORPUS REPORT CARD — the datasheet numbers a data team
    * reviews before training on a snapshot: document/token totals,
    * language/source coverage, the exact-duplicate rate, and
    * nearest-rank token-length percentiles. All exact integers.
    *
    * Shape at scale: one pass builds the (doc, lang, source, n_tok,
    * body-hash) base; totals and the dup rate are plain map-side-combined
    * aggregates; the percentiles are exact nearest-rank via
    * `percentile_disc` (smallest n_tok whose cumulative distribution
    * reaches p — identical to min{v : cum >= ceil(p*n)}), a single
    * distributed aggregate whose merge state is the per-partition
    * length histogram (bounded by max document length, not corpus
    * size). No global sort, no unpartitioned window, no driver-side
    * count. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val base = tracked(docs.select(col("doc_id"), col("lang"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      md5(col("text")).as("h")))
    val totals = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val dups = base.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_groups"),
        sum(col("c") - 1).as("dup_docs"))
    def pAt(p: Int) =
      expr(s"percentile_disc(0.$p) WITHIN GROUP (ORDER BY n_tok)")
        .cast("long").as(s"p${p}_tokens")
    totals.crossJoin(dups).crossJoin(base.agg(pAt(50), pAt(90)))
  }

  /** Exact corpus heavy hitters (frequent bigram shingles) via the
    * standard two-pass scheme: pass 1 folds the shingle stream into a
    * mergeable Misra-Gries sketch ([[MisraGriesAgg]] — one <= k-entry map
    * per partition crosses the shuffle, never the stream), whose <= k
    * candidate keys PROVABLY include every item with count > n/(k+1);
    * pass 2 recounts ONLY the candidates exactly (broadcast semi-join,
    * map-side-combined count) and keeps those with cnt * phi >= n.
    * Requiring k + 1 > phi makes the threshold n/phi strictly above the
    * sketch's miss bound, so the final answer is EXACT — the property the
    * DuckDB oracle checks. Use over a plain groupBy-count when the
    * distinct-item space is too large to shuffle (token/n-gram vocabulary
    * at web scale) but the report wants only the >= n/phi head. */
  def heavyHitters(docs: DataFrame, phi: Long = 1000L,
      k: Int = 2000): DataFrame = {
    require(k + 1 > phi,
      s"sketch size k=$k must exceed phi=$phi - 1 for exactness")
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = tracked(Dedup.shingleSet(docs)) // (doc_id, s), occurrences
    val sketch = sh.select(col("s")).as[String]
      .select(MisraGriesAgg.column(k).name("sk"))
      .head()
    val candidates = sketch.counters.keys.toSeq.sorted
    val exact = sh.join(
        broadcast(candidates.toDF("s")), Seq("s"), "left_semi")
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"))
    exact.filter(col("cnt") * lit(phi) >= lit(sketch.n))
      .select(col("s").as("shingle"), col("cnt"))
  }

  /** Within-document repetition metrics (the Gopher-style quality
    * signals): most-repeated-token share and duplicate-bigram share.
    * Two-level aggregation — the (doc, token) pre-count gives map-side
    * combining, the per-doc rollup is a narrow shuffle on doc_id; ratios
    * are double divisions of exact integers. Documents with fewer than
    * two tokens have no bigrams: their dup_bigram_ratio is 0. */
  def repetition(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val tok = tf.groupBy(col("doc_id")).agg(
      sum(col("tf")).as("n_tokens"),
      max(col("tf")).as("max_token_tf"),
      count(lit(1)).as("n_distinct_tokens"))
    val bg = Dedup.shingleSet(docs).groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      countDistinct(col("s")).as("n_distinct_bigrams"))
    tok.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("max_token_tf"),
        col("n_distinct_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"))
      .select(col("*"),
        (col("max_token_tf").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("top_token_ratio"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise((col("n_bigrams") - col("n_distinct_bigrams"))
            .cast(DoubleType) / col("n_bigrams").cast(DoubleType))
          .as("dup_bigram_ratio"))
  }

  /** Corpus-frequency quality score — the integer-exact stand-in for the
    * CCNet-style LM-perplexity filter: per document, the total corpus
    * term-frequency mass of its tokens and the mean corpus tf per token.
    * Rare-token-heavy documents (gibberish, mangled encodings) score low;
    * boilerplate scores high; both tails are filter candidates. A real
    * log-prob would be ln-based and ln is not bit-identical across libm
    * implementations, so the HASHED columns stay integer (+ one double
    * division of exact integers).
    *
    * Shape at scale: the corpus tf relation derives FROM the cached
    * (doc, token) pre-aggregation (no second scan); the join back is on
    * token — the zipfian head is one corpus row joining df(token)
    * doc-rows, so at web scale broadcast the head (it is tiny) or salt it
    * ([[Skew.saltedJoin]]); the per-doc rollup is a narrow shuffle. */
  def unigramScore(docs: DataFrame): DataFrame = {
    val tf = tracked(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf_doc")))
    val corpus = tf.groupBy(col("token")).agg(sum(col("tf_doc")).as("tf"))
    tf.join(corpus, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf_doc")).as("n_tokens"),
        sum(col("tf_doc") * col("tf")).as("freq_mass"))
      .select(col("doc_id"), col("n_tokens"), col("freq_mass"),
        (col("freq_mass").cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("mean_token_tf"))
  }

  /** Synthesize REAL HTML pages from the documents fixture: the text is
    * split across two <p> blocks and wrapped with genuine boilerplate —
    * title, a nav with links, a script, a style, a footer. The markup
    * is valid HTML any parser would read; [[extractHtmlText]] must
    * genuinely strip it back out (the PGM/WAV synthesize-then-decode
    * pattern applied to markup). */
  def htmlFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(
      lit("<html><head><title>doc "), col("doc_id"), lit("</title>"),
      lit("<style>p{margin:0}</style><script>var x=1;</script></head>"),
      lit("<body><nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>"),
      lit("<p class=\"main\">"),
      expr("substring(text, 1, length(text) div 2)"),
      lit("</p><p>"),
      expr("substring(text, length(text) div 2 + 1)"),
      lit("</p><footer>copyright 2024</footer></body></html>")).as("html"))

  /** HTML main-content extraction — the boilerplate-removal stage every
    * web-crawl training pipeline runs (readability/trafilatura's job),
    * as pure column expressions: script/style blocks are deleted FIRST
    * (their payloads are code, not text — an all-tag strip alone would
    * leak them into the output), the main text is the concatenation of
    * <p> block contents, and `boilerplate_permille` measures how much
    * of the page's visible text was chrome (nav/title/footer) — the
    * quality signal crawl filters threshold on. Zero UDFs, zero
    * shuffles: one codegen'd projection per page, so the op runs at
    * scan speed on any corpus size. */
  def extractHtmlText(pages: DataFrame): DataFrame =
    pages
      .withColumn("clean", expr(
        """regexp_replace(regexp_replace(html,
           '(?s)<script[^>]*>.*?</script>', ''),
           '(?s)<style[^>]*>.*?</style>', '')"""))
      .withColumn("main_text", expr(
        "array_join(regexp_extract_all(clean, '(?s)<p[^>]*>(.*?)</p>', 1), '')"))
      .withColumn("title",
        expr("regexp_extract(clean, '<title>(.*?)</title>', 1)"))
      .withColumn("n_links",
        expr("CAST(size(regexp_extract_all(clean, '<a ', 0)) AS BIGINT)"))
      .withColumn("stripped_len", expr(
        "CAST(length(regexp_replace(clean, '<[^>]*>', '')) AS BIGINT)"))
      .select(col("doc_id"), col("main_text"), col("title"), col("n_links"),
        col("stripped_len"),
        expr("1000 - (CAST(length(main_text) AS BIGINT) * 1000 div stripped_len)")
          .as("boilerplate_permille"))

  /** Row-local bigram strings of a text column: "w1 w2" per adjacent
    * token pair (tokens contain no spaces, so the join key is
    * unambiguous). Empty for docs with fewer than 2 tokens. Native
    * single-pass WordShingles — the transform(sequence(...)) chain this
    * replaces re-evaluated the token split PER ELEMENT inside the
    * interpreted lambda (O(tokens^2) per document; measured 2.8 s of
    * q121's 5.9 s just building bigrams at sf0.1). */
  private def bigramsOf(text: Column): Column = shinglesOf(text, 2)

  /** Bigram language-model fluency score — the KenLM-style quality
    * filter a training pipeline runs, integerized so the DuckDB oracle
    * reproduces it bit-for-bit: per document, the mean conditional
    * probability (in parts-per-million) of its bigrams under the
    * corpus's own bigram model,
    *
    *   fluency_ppm = (sum over doc bigrams of
    *                    bf_doc * ((C(w1 w2) * 1e6) div C(w1 ·)))
    *                 div n_bigrams
    *
    * with C(w1 w2) the corpus bigram count and C(w1 ·) the count of w1
    * as a bigram prefix. Docs whose word sequences follow corpus-common
    * transitions score high; shuffled or glitchy text scores low —
    * exactly the repetition/fluency axis the unigram score
    * ([[unigramScore]]) cannot see. Docs with < 2 tokens emit
    * n_bigrams = 0, fluency 0 (totality). C(w1 w2) * 1e6 stays inside
    * int64 for any corpus below ~9e12 bigram occurrences of one pair.
    *
    * Shape at scale: bigram construction is ROW-LOCAL (a transform over
    * the token array — zero shuffle before aggregation); the model is
    * one hash aggregation over the (doc, bigram) pre-aggregation (the
    * cached relation also feeds the score join, so the corpus is
    * tokenized once); scoring shuffles doc-bigrams on the bigram key.
    * The zipfian head is the usual skew: its rows pre-combine map-side
    * in every aggregate, and the score join's hot prefixes broadcast
    * (the model's head is tiny) or salt ([[Skew.saltedJoin]]) at web
    * scale. */
  def bigramScore(docs: DataFrame): DataFrame = {
    val bgc = tracked(
      docs.select(col("doc_id"), explode(bigramsOf(col("text"))).as("bg"))
        .groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("bf_doc")))
    val corpus = bgc.groupBy(col("bg")).agg(sum(col("bf_doc")).as("cbg"))
    val pre = corpus
      .groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("cbg")).as("cpre"))
    val scored = bgc.join(corpus, Seq("bg"))
      .join(pre, split(col("bg"), " ").getItem(0) === col("w1"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf_doc") * expr("(cbg * 1000000) div cpre")).as("mass"),
        sum(col("bf_doc")).as("nbg"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("nbg"), lit(0L)).as("n_bigrams"),
        coalesce(expr("mass div nbg"), lit(0L)).as("fluency_ppm"))
  }

  /** Gopher quality rules (Rae et al. 2021, §A1.1.2) — the named
    * rule-based document filter production pipelines run before any
    * learned gate: word-count bounds, mean-word-length band, symbol-to-
    * word ratio, bullet / ellipsis line ratios, alphabetic-word fraction,
    * and a minimum stopword-hit count. Every metric is integer-exact
    * (scaled div, no float ratios) so the DuckDB oracle reproduces each
    * per-rule flag and the composite verdict bit-for-bit.
    *
    * Shape at scale: one row-local projection pass — token array, line
    * split, and regexp counts are all per-document column arithmetic
    * inside whole-stage codegen; zero shuffles, filters push to the
    * scan. The thresholds are the published defaults except `minWords`,
    * parameterized because corpus token conventions differ. */
  def gopherRules(docs: DataFrame, minWords: Int = 20,
      maxWords: Int = 100000): DataFrame = {
    val toks = tokens(col("text"))
    val lines = split(col("text"), "\n")
    val allStop = stopwords("en")
    docs.select(col("doc_id"),
        size(toks).as("n_words"),
        // sum of token lengths = chars minus the separating spaces,
        // per line of the whitespace-token convention (quality())
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("wchars"),
        size(filter(toks, t => t.rlike("[a-zA-Z]"))).as("alpha_words"),
        scoreFor(toks, allStop).as("stop_hits"),
        (regexp_count(col("text"), lit("#")) +
          regexp_count(col("text"), lit("\\.\\.\\."))).as("n_symbols"),
        size(lines).as("n_lines"),
        size(filter(lines, l => l.rlike("^\\s*[-*•]"))).as("bullet_lines"),
        size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).as("ellipsis_lines"))
      .select(col("*"),
        expr("(wchars * 10) div n_words").as("mean_wlen_x10"))
      .select(col("doc_id"), col("n_words"), col("mean_wlen_x10"),
        col("alpha_words"), col("stop_hits"), col("n_symbols"),
        col("n_lines"), col("bullet_lines"), col("ellipsis_lines"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_words"),
        (col("mean_wlen_x10") >= 30 && col("mean_wlen_x10") <= 100)
          .as("r_wlen"),
        (col("n_symbols") * 10 <= col("n_words")).as("r_symbol"),
        (col("bullet_lines") * 100 <= col("n_lines") * 90).as("r_bullet"),
        (col("ellipsis_lines") * 100 <= col("n_lines") * 30).as("r_ellipsis"),
        (col("alpha_words") * 100 >= col("n_words") * 80).as("r_alpha"),
        (col("stop_hits") >= 2).as("r_stop"))
      .withColumn("pass",
        col("r_words") && col("r_wlen") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop"))
  }

  /** Interpolated Kneser-Ney bigram score — the smoothing the plain
    * conditional-probability model ([[bigramScore]]) lacks: unseen and
    * rare continuations get mass from the CONTINUATION distribution
    * (how many distinct contexts a word follows) instead of scoring
    * zero, the property that makes KN the standard n-gram LM smoother.
    * Absolute discount D = 3/4, integerized (quarter-count units + ppm
    * scaling, truncating division mirrored exactly by the oracle):
    *
    *   p_kn_ppm(w1 w2) = (max(4*C(w1 w2) - 3, 0) * 1e6) div (4*C(w1 .))
    *     + (lambda_ppm(w1) * cont_ppm(w2)) div 1e6
    *   lambda_ppm(w1)   = (3 * N1+(w1 .) * 1e6) div (4*C(w1 .))
    *   cont_ppm(w2)     = (N1+(. w2) * 1e6) div N1+(. .)
    *
    * with C(..) corpus bigram counts, N1+(w1 .) the distinct
    * continuations of w1, N1+(. w2) the distinct left-contexts of w2,
    * N1+(. .) the total distinct bigram types. Per document: the
    * bigram-frequency-weighted mean p_kn in ppm (docs with < 2 tokens
    * emit n_bigrams = 0, score 0).
    *
    * Shape at scale: identical to [[bigramScore]] — row-local bigram
    * construction, the model is three aggregations over the cached
    * (doc, bigram) relation (prefix counts, suffix type counts, one
    * global type count), scoring is one join keyed on the bigram. The
    * zipfian head pre-combines map-side everywhere; the only new term
    * vs the unsmoothed model is the tiny global type-count scalar,
    * computed as a 1-row aggregate and cross-joined (broadcast). */
  def knBigramScore(docs: DataFrame): DataFrame = {
    val bgc = tracked(
      docs.select(col("doc_id"), explode(bigramsOf(col("text"))).as("bg"))
        .groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("bf_doc")))
    val corpus = tracked(bgc.groupBy(col("bg"))
      .agg(sum(col("bf_doc")).as("cbg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1)))
    val pre = corpus.groupBy(col("w1"))
      .agg(sum(col("cbg")).as("cpre"), count(lit(1)).as("n1pre"))
    val suf = corpus.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1suf"))
    val types = corpus.agg(count(lit(1)).as("ntypes"))
    val scoredBg = corpus
      .join(pre, Seq("w1")).join(suf, Seq("w2")).crossJoin(broadcast(types))
      .select(col("bg"), (
        expr("(greatest(4 * cbg - 3, 0) * 1000000) div (4 * cpre)") +
        expr("(((3 * n1pre * 1000000) div (4 * cpre)) * ((n1suf * 1000000) div ntypes)) div 1000000"))
        .as("pkn_ppm"))
    val perDoc = bgc.join(scoredBg, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf_doc") * col("pkn_ppm")).as("mass"),
        sum(col("bf_doc")).as("nbg"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("nbg"), lit(0L)).as("n_bigrams"),
        coalesce(expr("mass div nbg"), lit(0L)).as("kn_ppm"))
  }

  /** Keyword search: rank documents against a bag of query terms by an
    * integer-exact tf-idf score — sum over matching terms of
    * tf_doc * (N div df), with N = corpus size and df the term's document
    * frequency. (The classic float idf = ln(N/df) carries the same
    * ordering intent but ln is not cross-engine bit-stable; the integer
    * weight keeps the HASHED score deterministic.) Ties break by doc_id.
    *
    * Shape at scale: the exploded (doc, token) stream is filtered to the
    * query terms BEFORE any aggregation — only matching postings ever
    * shuffle; df/N are two tiny aggregates over that filtered relation
    * (plus one corpus count); the top-k is a TakeOrdered over per-doc
    * scores, never a global sort. */
  /** Postings for the query terms only: (doc_id, token, `countAlias`)
    * with the term filter applied BEFORE any shuffle — the shared
    * candidate-generation stage of both rankers ([[search]], [[bm25Search]]),
    * kept in one place so the two search paths can never diverge on
    * tokenizer or filter semantics. */
  private def matchingPostings(docs: DataFrame, terms: Seq[String],
      countAlias: String): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms.map(lit(_)): _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as(countAlias))

  def search(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val n = docs.count()
    val tf = tracked(matchingPostings(docs, terms, "tf_doc"))
    val idf = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .select(col("token"), (lit(n) / col("df")).cast("long").as("idf_int"))
    tf.join(broadcast(idf), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf_doc") * col("idf_int")).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 ranking (Robertson & Spärck Jones; the Okapi form with
    * k1 = 1.2, b = 0.75), integerized so the hashed score is
    * cross-engine deterministic:
    *
    *   score(d) = sum over matching terms of
    *     idf_int * ((tf * 44e11) div (2e7*tf + 6e6 + 18*rl))
    *
    * which is the classic tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) with
    * every constant cleared to integers at 2e7 scale, `rl` =
    * round(1e6 * dl/avgdl) the ONE rounded division (IEEE-deterministic
    * on exact integer inputs), and idf_int = N div df (the q77 integer
    * idf — ln is not bit-stable cross-engine). The integer `div` happens
    * BEFORE the idf multiply, so intermediates stay inside int64 up to
    * tf ~ 2e6 and any corpus size, and the per-doc sum is an
    * order-independent integer sum — safe under partial aggregation.
    *
    * Shape at scale (near [[search]]'s): postings are filtered to the
    * query terms BEFORE any shuffle; document lengths are tokenized
    * ONCE into a persisted (doc_id, dl) frame that serves both the
    * 2-value avgdl aggregate and the length join; the matched-postings
    * side of that join is small (it grows with the query terms'
    * document frequency, not the corpus), so the planner broadcasts it
    * and the corpus-side lengths stream unshuffled — a stopword-df
    * term degrades it to a shuffled join (correct, slower), the same
    * posture as the dedup verify joins. Final top-k is a TakeOrdered. */
  def bm25Search(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val dl = tracked(docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("dl")))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).head()
    val n = stats.getLong(0)
    if (n == 0L)
      // empty corpus: sum() above is NULL and avgdl undefined — the
      // answer is simply "no hits", with the normal output schema
      return docs.limit(0).select(col("doc_id"),
        lit(0L).as("score"), lit(0L).as("n_terms_hit"))
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val rl = dl.select(col("doc_id"),
      round(lit(1e6) * col("dl").cast("double") / lit(avgdl))
        .cast("long").as("rl"))
    val tf = tracked(matchingPostings(docs, terms, "tf"))
    val idf = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .select(col("token"), expr(s"$n div df").as("idf_int"))
    rl.join(tf.join(broadcast(idf), Seq("token")), Seq("doc_id"))
      .select(col("doc_id"),
        (col("idf_int") *
          expr("(tf * 4400000000000) div (20000000*tf + 6000000 + 18*rl)"))
          .as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Budget column for the mixing ops: per-source token budget with a
    * default. */
  private def budgetCol(budgets: Map[String, Long], default: Long): Column =
    budgets.foldLeft(lit(default)) { case (acc, (src, b)) =>
      when(col("source") === src, lit(b)).otherwise(acc)
    }

  /** Training-mix construction, exact greedy form: admit documents per
    * `source` (domain) in deterministic md5-hash order until that
    * domain's token budget is reached (the admitted set may overshoot by
    * at most the last document — the standard greedy cut). Output: the
    * admitted rows with their token count and running total.
    *
    * Shape at scale: the cumulative sum is a window per source — fine
    * when domains are many (they parallelize) but a single giant domain
    * serializes its own sort; that regime is what [[tokenRateMix]] is
    * for (rate-based, no window, one extra aggregate scan). */
  def tokenBudgetMix(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue,
      tokCol: Column = size(tokens(col("text"))).cast("long")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col("doc_id"), col("source"),
      tokCol.as("tok"),
      md5Long(col("doc_id").cast(StringType)).as("h"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("tok")).over(w))
      .filter(col("cum") - col("tok") < budgetCol(budgets, defaultBudget))
      .select(col("doc_id"), col("source"), col("tok"), col("cum"))
  }

  /** Training-mix construction, rate form — the 100 TB path: one
    * aggregate scan computes each domain's total token count, the admit
    * rate is the exact integer fraction-of-10000
    * `min(10000, (10000 * budget) div total)`, and a document is admitted
    * when its md5 hash bucket falls under the rate. No window, no
    * per-domain sort; admission is a stateless per-row predicate, so the
    * op is one narrow scan after a broadcast of per-domain rates. Hits
    * the budget in expectation (hash-uniform), not exactly — the
    * documented trade against [[tokenBudgetMix]]'s greedy cut.
    *
    * Rate granularity is 1/10000; the guarded `b >= total` branch keeps
    * the 10000*b product inside int64 for domains up to ~9e14 tokens
    * (beyond ANSI-mode overflow would fail loudly, not corrupt). */
  def tokenRateMix(docs: DataFrame, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue,
      tokCol: Column = size(tokens(col("text"))).cast("long")): DataFrame = {
    val t = docs.select(col("doc_id"), col("source"),
      tokCol.as("tok"),
      md5Long(col("doc_id").cast(StringType)).as("h"))
    val rated = t.groupBy(col("source"))
      .agg(sum(col("tok")).as("total"))
      .withColumn("b", budgetCol(budgets, defaultBudget))
      .select(col("source"),
        when(col("b") >= col("total"), lit(10000L))
          .otherwise(expr("(10000 * b) div total")).as("rate"))
    t.join(broadcast(rated), Seq("source"))
      .filter(pmod(col("h"), lit(10000L)) < col("rate"))
      .select(col("doc_id"), col("source"), col("tok"))
  }

  /** Temperature-scaled source mixing (alpha = 0.5): the multilingual /
    * multi-source rebalancing rule (mBERT / XLM-R sampling, alpha-scaled
    * unigram_lm in SentencePiece practice) — sources draw training
    * tokens proportionally to total^alpha, so heavy sources are tamed
    * and tail sources up-weighted, with the whole mix capped at
    * `totalBudget` tokens. alpha is fixed at 0.5 because sqrt is the
    * one power IEEE 754 evaluates exactly-rounded in every engine — the
    * share math stays deterministic with no libm pow in the data path:
    * q_s = floor(sqrt(total_s)) quantizes each source's temperature
    * mass to an integer, target_s = totalBudget * q_s / sum(q_s) is
    * computed by the exact split (B div S)*q + ((B mod S)*q) div S
    * (identical to floor(B*q/S), but every intermediate stays in long
    * range while sum(q)*max(q) < 9e18 — beyond astronomic corpora), and
    * admission reuses the stateless per-myriad hash gate of
    * [[tokenRateMix]].
    *
    * One aggregation over the corpus (per-source totals, a few rows),
    * driver-free share arithmetic on that tiny frame, a broadcast join
    * back, and a stateless row-local filter — the same 100 TB shape as
    * tokenRateMix, one extra sqrt on a handful of rows. */
  def temperatureMix(docs: DataFrame, totalBudget: Long,
      tokCol: Column = size(tokens(col("text"))).cast("long")): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    val t = docs.select(col("doc_id"), col("source"), tokCol.as("tok"),
      md5Long(col("doc_id").cast(StringType)).as("h"))
    val totals = t.groupBy(col("source")).agg(sum(col("tok")).as("total"))
      .withColumn("q",
        floor(sqrt(col("total").cast(DoubleType))).cast("long"))
    val rated = totals
      .crossJoin(broadcast(totals.agg(sum(col("q")).as("sumq"))))
      .select(col("source"), col("total"),
        expr(s"($totalBudget" + "L div sumq) * q + " +
          s"(($totalBudget" + "L % sumq) * q) div sumq").as("target"))
      .select(col("source"),
        when(col("target") >= col("total"), lit(10000L))
          .otherwise(expr("(10000 * target) div total")).as("rate"))
    t.join(broadcast(rated), Seq("source"))
      .filter(pmod(col("h"), lit(10000L)) < col("rate"))
      .select(col("doc_id"), col("source"), col("tok"))
  }

  /** Positional power table for the rolling fingerprint: 31^(p mod 8). */
  private val pow31: Seq[Long] =
    (0 until 8).scanLeft(1L)((acc, _) => acc * 31L).take(8)

  /** Document fingerprint: positional polynomial rolling hash
    * sum(((md5hash(tok) % 1000003) * 31^(pos mod 8)) mod p) mod p with
    * p = 2^31-1. Each term is reduced mod p BEFORE the sum (sum-of-mods mod
    * p == mod-of-sum), so partial sums stay below 2^31 * nTokens — no int64
    * overflow at any document length, and identical to DuckDB's HUGEINT sum.
    * Pure integer arithmetic — engine-independent, order-independent sum. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val powArr = array(pow31.map(lit(_)): _*)
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "t")))
      .select(col("doc_id"),
        (((md5Long(col("t")) % 1000003L) *
          element_at(powArr, (col("p") % 8) + 1)) % 2147483647L).as("term"))
      .groupBy(col("doc_id"))
      .agg((sum(col("term")) % 2147483647L).as("fingerprint"))
  }

  /** Winnowing fingerprints (the MOSS local-fingerprint scheme,
    * Schleimer/Wilkerson/Aiken 2003): hash every token position, slide a
    * window of `w` consecutive hashes over each document, and keep the
    * minimum hash of every window — rightmost position on ties. Any two
    * documents sharing a run of >= w tokens are then GUARANTEED to share
    * a selected fingerprint, with ~2/(w+1) of positions kept — the
    * partial-overlap detector that whole-document fingerprints (q31) and
    * shingle MinHash miss at small overlap fractions.
    *
    * Spark shape: one token explode, one per-document window pass (state
    * is the document's own positions — never global), one distinct
    * bounded by selected fingerprints. The (hash, rightmost-tie) argmin
    * is ENCODED, not computed twice: key = h*2^20 + (2^20-1-pos), so a
    * single integer `min` over the window frame is the whole selection —
    * identical in the DuckDB oracle. Positions are guarded to < 2^20
    * (fail-loudly, not corrupt) and hashes reduced to 30 bits, keeping
    * keys < 2^50. */
  def winnowing(docs: DataFrame, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2 && w <= 1024, s"window out of range: $w")
    val M = 1048576L // 2^20 position space
    val posed = spread(docs)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p0", "t")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"),
        (md5Long(col("t")) % 1073741824L).as("h"))
    val keyed = posed.withColumn("key",
      when(col("pos") < M, col("h") * M + (lit(M - 1) - col("pos")))
        .otherwise(raise_error(concat(lit("winnowing: document "),
          col("doc_id"), lit(" exceeds 2^20 tokens")))))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val all = Window.partitionBy(col("doc_id"))
    keyed
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("selkey", min(col("key")).over(win))
      .filter(col("pos") <= col("n") - (w - 1)) // full windows only
      .select(col("doc_id"),
        expr("selkey div 1048576").as("sel_hash"),
        (lit(M - 1) - (col("selkey") % M)).as("sel_pos"))
      .distinct()
  }

  /** Partial-overlap containment between a fresh batch and an ingested
    * corpus via shared winnowing fingerprints — the plagiarism /
    * contamination detector at the sub-document granularity MinHash
    * misses: any >= w-token run shared with ANY corpus document
    * guarantees a shared fingerprint ([[winnowing]]'s guarantee), so a
    * batch doc quoting one corpus paragraph surfaces even when its
    * overall Jaccard is ~0.
    *
    * Shape at scale: both sides reduce to (doc, hash) fingerprint sets
    * (~2/(w+1) of token positions); the join is an inverted-index
    * equi-join on the hash, df-capped first — fingerprints appearing in
    * more than `dfCap` corpus documents are boilerplate (the q67
    * line-dedup banding argument) and are dropped before they can
    * quadratically fan out. Corpus fingerprints are computed once and
    * are reusable across batches (the q48 incremental pattern). */
  def winnowContainment(corpus: DataFrame, batch: DataFrame, w: Int = 4,
      dfCap: Int = 64): DataFrame = {
    def fps(d: DataFrame, as: String) =
      winnowing(d, w).select(col("doc_id").as(as), col("sel_hash")).distinct()
    val fc = tracked(fps(corpus, "doc_a"))
    val ok = fc.groupBy("sel_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("sel_hash")
    fc.join(ok, "sel_hash")
      .join(fps(batch, "doc_b"), "sel_hash")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Balanced per-group sampling — EXACTLY `n` documents per group (or
    * all of a smaller group), chosen by deterministic md5 rank: the
    * balanced-eval-set builder ([[stratifiedSample]] keeps a RATE per
    * group; this keeps a COUNT — the two sampling contracts a pipeline
    * needs). Reproducible across runs, engines, and partitionings.
    *
    * Shape at scale: the per-group selection is a BOUNDED-HEAP
    * aggregate (TopKAggLongAsc — n rows of state per group, map-side
    * partials), NOT a row_number window: no per-group sort, no shuffle
    * of anything but the winners. Emits (group, doc_id, rank). */
  def balancedSample(docs: DataFrame, groupCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"balancedSample: n must be >= 1 (got $n)")
    val scored = docs.select(col(groupCol).as("grp"), col("doc_id"),
      TextKit.md5Long(concat_ws(":", col(groupCol),
        col("doc_id").cast("string"))).as("hkey"))
    TopKAgg.topKPerQueryAsc(scored, "grp", "doc_id", "hkey", n)
      .select(col("grp").as(groupCol), col("neighbor_id").as("doc_id"),
        col("rank"))
  }

  /** Character-collision diversity (Simpson index) — the
    * repetitiveness gate that needs NO logarithm: Σ pᵢ² over the
    * document's character distribution is the probability two random
    * positions hold the same character, so boilerplate (high collision
    * mass) scores high and diverse prose low — the same screening
    * signal as character entropy, but a RATIONAL function of the
    * counts, so it stays exact integer ppm cross-engine (an entropy
    * gate would compare engine-library `log` doubles — the
    * BASELINE.md double rule says never do that).
    *
    * Shape at scale: one position explode (narrow), then two keyed
    * aggregations with map-side combine — shuffle volume collapses to
    * ≤ distinct-chars rows per document (≈100), not text volume.
    * Empty documents have no positions and are absent (callers gate
    * length upstream). */
  def charDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("distinct_chars"),
        sum(col("cnt")).as("len"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("doc_id"), col("distinct_chars"),
        expr("s2 * 1000000L div (len * len)").as("simpson_ppm"))
}
