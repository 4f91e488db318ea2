package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.12 (EXT) — text-analysis operators for a large-scale
  * training-data pipeline: tokenization, token statistics, language ID,
  * quality scoring, fingerprinting.
  *
  * All operators are per-row `Column` expressions (higher-order functions,
  * no UDFs, no shuffle) unless they aggregate across documents — the per-row
  * parts scale embarrassingly with the scan.
  */
object TextOps {

  /** Whitespace tokenization (matches the oracle's `string_split(text,' ')`). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * punctuation marks each count as a token — a cheap stand-in for subword
    * token counting when no tokenizer model is shipped. */
  def bpeishTokens(text: Column): Column =
    filter(split(text,
      "(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])|(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      t => trim(t) =!= "")

  /** 60-bit token hash derived from md5 so an external oracle can reproduce
    * it exactly (Spark's murmur `hash()` is engine-private). */
  def tokenHash(token: Column): Column =
    conv(substring(md5(token), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (with duplicates) over a token array; empty for
    * docs shorter than n tokens. Native codegen expression — byte-
    * identical to the HOF formulation it replaced (WordShingles doc). */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(toks),
        n, distinct = false))

  /** Distinct word n-gram shingles (first-occurrence order): the unit of
    * near-dup detection. */
  def distinctShingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(toks),
        n, distinct = true))

  /** Signed hashing-trick bag-of-n-grams vector — fixed-dim text
    * embedding with no vocabulary and no fit pass, the bridge from raw
    * text into the dense-vector stack (CenterVector → LSH → near-dup /
    * ANN / PCA); see [[graft.functions.HashedNgramVector]]. */
  def hashedNgramVector(toks: Column, dim: Int, n: Int = 2): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.HashedNgramVector(
        org.apache.spark.sql.GraftColumnBridge.expression(toks), dim, n))

  /** Language-ID heuristic: stopword-profile hit counts with a deterministic
    * argmax (en > de > fr > es on ties; 'und' when nothing matched). A real
    * deployment would use character n-gram profiles; the operator shape
    * (per-row score vector → argmax) is identical. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }

  def langId(toks: Column): Column = {
    val s = langScores(toks).toMap
    when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es") && s("en") > 0, "en")
      .when(s("de") >= s("fr") && s("de") >= s("es") && s("de") > 0, "de")
      .when(s("fr") >= s("es") && s("fr") > 0, "fr")
      .when(s("es") > 0, "es")
      .otherwise("und")
  }

  /** Quality-score components: length, punctuation ratio, stopword ratio,
    * mean token length — the standard cheap filters in front of a training
    * corpus. Deterministic arithmetic (int counts, one double division). */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  def qualityColumns(text: Column, toks: Column): Seq[(String, Column)] = {
    val nTok = size(toks)
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    val stop = size(filter(toks, t => t.isin(stopwords: _*)))
    Seq(
      "n_tokens" -> nTok,
      "punct_ratio" -> punct.cast("double") / greatest(length(text), lit(1)),
      "stopword_ratio" -> stop.cast("double") / greatest(nTok, lit(1)),
      "mean_token_len" ->
        (length(text) - nTok + 1).cast("double") / greatest(nTok, lit(1)))
  }

  /** PII scrubbing — the canonical pre-training cleaning pass: URLs, email
    * addresses and phone-shaped numbers replaced with typed placeholder
    * tokens. Patterns are RE2-safe (no backrefs/lookaround) so external
    * engines reproduce the scrub exactly; order is URL → email → phone
    * (URLs can contain '@'). Per-row codegen'd regexp_replace — no UDF. */
  val UrlPat = "https?://[^ ]+"
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePat = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPat, "<URL>"),
        EmailPat, "<EMAIL>"),
      PhonePat, "<PHONE>")

  /** Repetition statistics (the Gopher-style repetition quality rule): per
    * document, the share of n-gram mass taken by the single most frequent
    * n-gram. Implemented as explode → two hash aggregates (codegen, map-side
    * partials) rather than per-row O(grams²) lambdas — the shape that holds
    * at corpus scale. Docs shorter than n tokens produce no row (no gram
    * mass to judge). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    docs.select(col(idCol), explode(shingles(tokens(col(textCol)), n)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("n_grams"),
        max(col("c")).as("top_gram_count"))
      .withColumn("repetition_ratio",
        col("top_gram_count").cast("double") / col("n_grams"))

  /** Benchmark decontamination — the pre-training hygiene pass that drops
    * training documents overlapping an evaluation set (the GPT-3-style
    * n-gram filter; n and the gram definition are configurable). Returns
    * (idCol, n_hits): each contaminated training doc with the number of its
    * distinct n-grams that appear anywhere in the benchmark corpus.
    *
    * Scale shape: the benchmark side is ALWAYS the small side (eval sets
    * are KBs-MBs against a 100 TB corpus) — its distinct shingle set is
    * broadcast, the corpus streams once through explode → broadcast hash
    * join → per-doc count. No corpus shuffle besides the final per-doc
    * aggregate (map-side partials on doc id). */
  def contaminationHits(docs: DataFrame, idCol: String, textCol: String,
                        benchmark: DataFrame, benchTextCol: String,
                        n: Int = 3): DataFrame = {
    val docSh = docs.select(col(idCol),
      explode(distinctShingles(tokens(col(textCol)), n)).as("shingle"))
    val benchSh = benchmark
      .select(explode(distinctShingles(tokens(col(benchTextCol)), n)).as("shingle"))
      .distinct()
    docSh.join(org.apache.spark.sql.functions.broadcast(benchSh), Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Drop contaminated docs (any n-gram shared with the benchmark). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 3): DataFrame =
    docs.join(
      contaminationHits(docs, idCol, textCol, benchmark, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** TF-IDF top-k terms per document — the keyword/feature-extraction pass
    * of a text pipeline (domain tagging, topic clustering inputs, index
    * terms). Score = tf · ln(N/df), rounded to 6 dp so the ranking is
    * engine-reproducible (ln may differ by 1 ulp between libms; the
    * ordering uses the ROUNDED value with the term string as total
    * tie-break).
    *
    * Scale shape: explode (codegen) → (doc,term) hash-aggregate with
    * map-side partials → per-term document frequency as a second hash
    * aggregate over the SAME (doc,term) rows (no distinct-explode re-pass)
    * → broadcast of the single-row corpus count → top-k via a window
    * partitioned BY DOCUMENT (never global). The df table is term-keyed —
    * the natural-language term distribution is Zipfian, but the df join is
    * an equi-join on term whose skew AQE splits; nothing here is
    * quadratic. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    val tok = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }

  /** Token-window chunking — split each document into overlapping windows of
    * at most `chunkSize` tokens with `overlap` tokens shared between
    * consecutive chunks: the context-window preparation pass for pretraining
    * and embedding pipelines (long documents must be cut to model context
    * length; overlap preserves cross-boundary context).
    *
    * Pure per-row explode (sequence → slice → join): no shuffle, no state,
    * embarrassingly parallel — each doc yields ceil((n-overlap)/stride)
    * rows. Chunk ids are 0-based and stable; the final partial chunk is
    * kept (a trailing window shorter than chunkSize). Empty docs yield no
    * rows. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    docs
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // starts: 0, stride, 2·stride …, while start + overlap < n — a later
      // start would begin inside the previous window's tail and contribute
      // no new token (a pure-suffix duplicate chunk); tiny docs (n <=
      // overlap) keep the single start 0
      .withColumn("__start",
        explode(sequence(lit(0),
          greatest(col("__n") - overlap - 1, lit(0)), lit(stride))))
      .withColumn("chunk_id", (col("__start") / stride).cast("int"))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkSize)), " "))
      .withColumn("n_chunk_tokens",
        least(col("__n") - col("__start"), lit(chunkSize)))
      .select(col(idCol), col("chunk_id"), col("chunk_text"),
        col("n_chunk_tokens").cast("long").as("n_chunk_tokens"))
  }

  /** Per-document mean unigram surprisal — the language-model quality score
    * of the CCNet/CC-filtering recipe with the corpus's own unigram
    * distribution standing in for the KenLM model (no model ships in a pure
    * engine): score(doc) = mean over tokens of −ln(count(tok)/total).
    * Gibberish and boilerplate-heavy docs score high/low respectively
    * relative to the corpus median, which is how the published pipelines
    * threshold them.
    *
    * Determinism: each token's surprisal is rounded to 6 dp and summed as
    * an EXACT decimal (double summation is reduction-order-dependent and
    * engine-divergent), divided once at the end. Scale shape: one explode
    * pass, a vocab-sized unigram table (vocab ≪ corpus — AQE broadcasts
    * it), a single-row total broadcast, one per-doc hash aggregate. */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n_total"))
    tok.join(counts, Seq("term"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(total))
      .withColumn("s",
        round(-log(col("c").cast("double") / col("n_total")), 6).cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg((sum(col("s")).cast("double") / count(lit(1))).as("mean_surprisal"),
        count(lit(1)).as("n_tokens"))
  }

  /** Unigram-LM Viterbi segmentation — SentencePiece's DECODE step over a
    * corpus-derived piece vocabulary, the subword-tokenizer family's
    * missing half next to BPE merge LEARNING (q391): vocabulary = the
    * `vocabSize` highest-frequency character substrings (length ≤
    * `maxPiece`) of the corpus's words, piece cost = 6-dp-rounded unigram
    * surprisal renormalized over the vocabulary, and each word takes the
    * segmentation MINIMIZING total surprisal (ties → fewer pieces → lower
    * split position; out-of-vocabulary single pieces cost `unkCost`).
    *
    * Because words are LENGTH-BOUNDED (`maxLen`), the whole DP runs
    * per-row in ONE higher-order expression: each word carries its
    * (position, length)→cost edge map and `aggregate(sequence(1, len))`
    * folds the Viterbi table left to right — no iteration, no per-round
    * shuffles, embarrassingly parallel over the distinct-word table. (An
    * equi-join round per position — the q191/q263 graph shape — would
    * pay ~2·maxLen shuffle stages for a DAG whose depth is a CONSTANT;
    * measured 9.5 s → sub-second at sf0.1.) All costs are EXACT
    * decimals, so the argmin and its tie rules (fewer pieces, lower
    * split position) order identically in any engine.
    *
    * Output: per word length, word counts and the weighted mean
    * pieces-per-word and surprisal (the tokenizer-fertility curve a
    * vocab-size decision needs). Scale shape: the edge map is
    * (distinct words × len × maxPiece)-sized — vocabulary-bounded, not
    * corpus-bounded; the corpus is read once for word counts. */
  def viterbiSegment(docs: DataFrame, textCol: String,
                     vocabSize: Int = 512, maxLen: Int = 12,
                     maxPiece: Int = 4,
                     unkCost: String = "20.000000"): DataFrame = {
    val D = "decimal(18,6)"
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxLen)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val occ = words
      .select(col("w"),
        explode(sequence(lit(0), length(col("w")) - 1)).as("j"),
        col("wc"))
      .select(col("w"), col("j"),
        explode(sequence(lit(1),
          least(lit(maxPiece), length(col("w")) - col("j")))).as("d"),
        col("wc"))
      .withColumn("piece", expr("substring(w, j + 1, d)"))
    val vocab = occ.groupBy(col("piece")).agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize)
    val vtot = vocab.agg(sum(col("cnt")).as("tot"))
    val vlp = vocab.crossJoin(broadcast(vtot))
      .select(col("piece"),
        round(-log(col("cnt").cast("double") / col("tot").cast("double")), 6)
          .cast(D).as("lp"))
    // one row per word: edge-cost map keyed j·maxPiece + d. OOV pieces
    // get an edge ONLY at d=1 (SentencePiece's per-CHARACTER unknown —
    // an unk cost on arbitrary substrings would let any garbage word
    // collapse to one cheap piece); single chars always have an edge, so
    // every position stays reachable and DP lookups can miss only on
    // multi-char keys, where the missing edge reads as null = no path
    val em = occ
      .join(broadcast(vlp), Seq("piece"), "left")
      .filter(col("lp").isNotNull || col("d") === 1)
      .groupBy(col("w"))
      .agg(map_from_entries(collect_list(struct(
        (col("j") * maxPiece + col("d")).as("k"),
        coalesce(col("lp"), lit(unkCost).cast(D)).as("v")))).as("em"))
    def entry(lp: Column, np: Column) = struct(
      lp.cast(D).as("lp"), np.cast("int").as("np"))
    val dp = aggregate(
      sequence(lit(1), length(col("w"))),
      array(entry(lit("0.000000"), lit(0))),
      (acc, i) => {
        // candidate via piece length d (predecessor j = i−d); fold from
        // d = maxPiece down so ties keep the SMALLEST split position j,
        // with strictly-better (cost, then pieces) challengers winning —
        // exactly ORDER BY cost, pieces, j
        def cand(d: Int): Column = {
          val e = element_at(col("em"), (i - lit(d)) * maxPiece + lit(d))
          when(i >= d && e.isNotNull, entry(
            element_at(acc, i - lit(d) + 1).getField("lp") + e,
            element_at(acc, i - lit(d) + 1).getField("np") + 1))
            .otherwise(lit(null))
        }
        val best = (maxPiece - 1 to 1 by -1).foldLeft(cand(maxPiece)) {
          (b, d) =>
            val ch = cand(d)
            when(b.isNull, ch).otherwise(when(ch.isNull, b).otherwise(
              when(ch.getField("lp") < b.getField("lp") ||
                (ch.getField("lp") === b.getField("lp") &&
                  ch.getField("np") < b.getField("np")), ch).otherwise(b)))
        }
        concat(acc, array(best))
      })
    val fin = em
      .withColumn("__f", element_at(dp, length(col("w")) + 1))
      .select(col("w"), length(col("w")).as("len"),
        col("__f").getField("lp").as("lp"), col("__f").getField("np").as("np"))
    val floor6 = (c: Column) =>
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    fin.join(words, Seq("w"))
      .groupBy(col("len"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("wc")).as("total_wc"),
        sum(col("wc") * col("np")).as("__sp"),
        sum(col("wc").cast("decimal(20,0)") * col("lp")).as("__sl"))
      .select(col("len"), col("n_words"), col("total_wc"),
        floor6(col("__sp").cast("double") / col("total_wc").cast("double"))
          .as("mean_pieces"),
        floor6(col("__sl").cast("double") / col("total_wc").cast("double"))
          .as("mean_surprisal"))
  }

  /** DoReMi-style domain reweighting, one multiplicative-weights update:
    * per-domain loss = mean unigram surprisal over the domain's TOKENS
    * (the [[unigramSurprisal]] proxy at the source grain), then
    * w(source) ∝ exp(η · (loss − mean-of-losses)), normalized — up-weight
    * the domains the reference model finds hard, the published DoReMi
    * inner step with the corpus unigram LM standing in for the proxy
    * model.
    *
    * Determinism: every boundary value lives in 1e6-SCALED INTEGERS —
    * per-source loss and the exp() weights are fixed by the mirrored
    * half-away floor `floor(x·1e6 + 0.5)` (exact longs; q370 discipline),
    * sums of those longs are order-free, and the final normalization is
    * one more half-away floor of an identical double quotient. Scale
    * shape: one explode pass, vocab-sized count table, token-grain hash
    * agg to the source grain, then ALL remaining algebra runs on the
    * domain-count-sized table (a broadcast scalar for the mean and the
    * normalizer). */
  def domainReweight(docs: DataFrame, srcCol: String, textCol: String,
                     eta: Double): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n_total"))
    val s = tok.join(counts, Seq("term"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(total))
      .withColumn("s",
        round(-log(col("c").cast("double") / col("n_total")), 6)
          .cast("decimal(18,6)"))
    val loss = s.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).as("__ss"))
      .withColumn("lk", floor(col("__ss").cast("double") /
        col("n_tokens").cast("double") * lit(1e6) + lit(0.5d)).cast("long"))
    val m = loss.agg(sum(col("lk")).as("__lsum"),
      count(lit(1)).as("__ns"))
    val w = loss.crossJoin(org.apache.spark.sql.functions.broadcast(m))
      .withColumn("wk", floor(
        exp(lit(eta) * (col("lk").cast("double") -
          col("__lsum").cast("double") / col("__ns").cast("double")) /
          lit(1e6)) * lit(1e6) + lit(0.5d)).cast("long"))
    val z = w.agg(sum(col("wk")).as("__z"))
    w.crossJoin(org.apache.spark.sql.functions.broadcast(z))
      .select(col("source"), col("n_tokens"),
        (col("lk").cast("double") / lit(1e6)).as("mean_surprisal"),
        (floor(col("wk").cast("double") / col("__z").cast("double") *
          lit(1e6) + lit(0.5d)) / lit(1e6)).as("weight"))
  }

  /** Bigram-LM quality score — the conditional-probability upgrade of
    * [[unigramSurprisal]] (CCNet-style model-based filtering without a
    * shipped LM): fit an add-k-smoothed bigram model on the corpus itself,
    * then score each document by its mean bigram surprisal
    * −ln p(t₂|t₁) = −ln((c₁₂ + k) / (c₁ + k·V)). Low-probability token
    * TRANSITIONS (not just rare tokens) mark garbled or boilerplate text.
    *
    * Scale shape: the bigram stream is a pure per-row explode (no
    * self-join — position index via `sequence` + `element_at`); the model
    * is two vocab²-bounded hash aggregates equi-joined back (map-side
    * partials, AQE-splittable, nothing broadcast but the one-row vocabulary
    * count); scoring is the q88 determinism contract — per-bigram 6-dp
    * round, exact-decimal sum, count division last. Documents with fewer
    * than two tokens have no bigrams and are absent from the output. */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      addK: Double = 0.5): DataFrame = {
    val toked = docs.select(col(idCol),
        org.apache.spark.sql.functions.filter(tokens(col(textCol)), t => t =!= "").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 2)
    val bg = toked
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1), col("__n") - 1)).as("__i"))
      .select(col(idCol),
        element_at(col("__toks"), col("__i")).as("t1"),
        element_at(col("__toks"), col("__i") + 1).as("t2"))
    val c12 = bg.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("t1")).agg(count(lit(1)).as("c1"))
    val v = bg.agg(countDistinct(col("t2")).as("v"))
    bg.join(c12, Seq("t1", "t2")).join(c1, Seq("t1"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(v))
      .withColumn("s",
        round(-log(
          (col("c12").cast("double") + lit(addK)) /
            (col("c1").cast("double") + lit(addK) * col("v").cast("double"))), 6)
          .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg((sum(col("s")).cast("double") / count(lit(1))).as("mean_surprisal"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Interpolated Kneser-Ney bigram surprisal — the state-of-the-art
    * count-based LM score next to [[bigramSurprisal]]'s add-k (Kneser &
    * Ney 1995; Chen & Goodman 1998 empirically crown this smoother).
    * Absolute discount D = 3∕4 off every seen bigram, mass redistributed
    * by CONTINUATION probability — how many distinct contexts a word
    * follows, not how often it occurs (the "San Francisco" insight:
    * "Francisco" is frequent but glued to one context):
    *
    *   P(t₂|t₁) = max(c₁₂ − D, 0)∕c₁ + (D·N₁₊(t₁·)∕c₁) · N₁₊(·t₂)∕N₁₊(··)
    *
    * With D = 3∕4 the whole probability is ONE integer rational:
    *   P = [max(4c₁₂−3, 0)·N₊₊ + 3·N₁₊(t₁·)·N₁₊(·t₂)] ∕ [4c₁·N₊₊]
    * (num ≥ 3 whenever the bigram exists, so −ln never sees 0; both
    * engines divide the same exact integers — the q119 ln contract).
    *
    * Scale shape: identical to [[bigramSurprisal]] — a per-row position
    * explode, THREE vocab-bounded hash aggregates (pair counts, follower
    * types, predecessor types) equi-joined back, one broadcast total row;
    * per-bigram 6-dp round, exact-decimal sum, count division last. */
  def kneserNeySurprisal(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toked = docs.select(col(idCol),
        org.apache.spark.sql.functions.filter(tokens(col(textCol)), t => t =!= "").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 2)
    val bg = toked
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1), col("__n") - 1)).as("__i"))
      .select(col(idCol),
        element_at(col("__toks"), col("__i")).as("t1"),
        element_at(col("__toks"), col("__i") + 1).as("t2"))
    val c12 = bg.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("t1")).agg(count(lit(1)).as("c1"))
    val n1f = c12.groupBy(col("t1")).agg(count(lit(1)).as("n1f"))
    val ncont = c12.groupBy(col("t2")).agg(count(lit(1)).as("nc"))
    val ntot = c12.agg(count(lit(1)).as("ntot"))
    bg.join(c12, Seq("t1", "t2")).join(c1, Seq("t1"))
      .join(n1f, Seq("t1")).join(ncont, Seq("t2"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(ntot))
      .withColumn("s",
        round(-log(
          (greatest(col("c12") * 4 - 3, lit(0L)) * col("ntot") +
            lit(3L) * col("n1f") * col("nc")).cast("double") /
            (col("c1") * 4 * col("ntot")).cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg((sum(col("s")).cast("double") / count(lit(1)))
          .as("mean_kn_surprisal"),
        count(lit(1)).as("n_bigrams"))
  }

  /** PMI collocation extraction — the corpus-analysis companion of
    * [[bigramSurprisal]]: pointwise mutual information
    * ln(c₁₂·N / (c₁·c₂)) over adjacent token pairs ranks the pairs that
    * co-occur far above chance (multi-word expressions, boilerplate
    * phrases — the vocabulary-curation signal). `minCount` suppresses the
    * low-count PMI explosion (a hapax pair maxes the score by definition);
    * top-k by (rounded PMI, pair) is a global TakeOrdered — k is small by
    * contract, a report not a partition of the corpus.
    *
    * Scale shape: same as the bigram model — per-row position explode, two
    * vocab-bounded hash aggregates, one broadcast total row; the PMI
    * arithmetic is the repo's 6-dp cross-engine contract. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    val toked = docs.select(
        org.apache.spark.sql.functions.filter(tokens(col(textCol)), t => t =!= "").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 2)
    val bg = toked
      .select(col("__toks"), explode(sequence(lit(1), col("__n") - 1)).as("__i"))
      .select(element_at(col("__toks"), col("__i")).as("t1"),
        element_at(col("__toks"), col("__i") + 1).as("t2"))
    val c12 = bg.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("t1")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("t2")).agg(count(lit(1)).as("c2"))
    val n = bg.agg(count(lit(1)).as("n_bigrams"))
    c12.filter(col("c12") >= minCount)
      .join(c1, Seq("t1")).join(c2, Seq("t2"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(n))
      .withColumn("pmi",
        round(log((col("c12").cast("double") * col("n_bigrams").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))), 6))
      .orderBy(col("pmi").desc, col("t1").asc, col("t2").asc)
      .limit(k)
      .select(col("t1"), col("t2"), col("c12"), col("pmi"))
  }

  /** Per-source KL divergence from the corpus unigram distribution — the
    * domain-shift / contamination monitor of a mixture pipeline: a source
    * whose token distribution drifts far from the corpus (KL ≫ peers) is
    * either a different register (code vs prose), a different language, or
    * polluted. KL(pₛ‖q) = Σ_t pₛ(t)·ln(pₛ(t)/q(t)) with pₛ the source's and
    * q the corpus's unigram distribution; every observed source term also
    * exists in the corpus so q(t) > 0 always (no smoothing needed).
    *
    * Determinism: per-term contributions are rounded to 6 dp and summed as
    * exact decimals (contributions are signed — only the sum is guaranteed
    * ≥ 0), with the ln argument computed as one mirrored double expression
    * (c_st·n)/(n_s·c_t). Scale shape: one tokenize-explode pass collapses to
    * the (source, term) table; source and term marginals derive from THAT
    * (vocab-bounded) table, not from a second corpus pass; the grand total
    * is a one-row broadcast. */
  def sourceKlDivergence(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val cst = tok.groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val ct = cst.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val n = ct.agg(sum(col("c_t")).as("n_tot"))
    cst.join(ns, Seq("source")).join(ct, Seq("term"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(n))
      .withColumn("__contrib",
        round((col("c_st").cast("double") / col("n_s").cast("double")) *
          log((col("c_st").cast("double") * col("n_tot").cast("double")) /
            (col("n_s").cast("double") * col("c_t").cast("double"))), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        sum(col("__contrib")).cast("double").as("kl"))
  }

  /** DSIR-style importance selection (Data Selection via Importance
    * Resampling, Xie et al. 2023, arXiv:2302.03169): score every pool
    * document by how target-like its hashed-bigram distribution is and
    * keep the top `k`. The importance weight is the log-likelihood ratio
    * of two bag-of-hashed-ngrams language models,
    *
    *   weight(d) = Σ_b n_d(b) · ln(p_target(b) / p_pool(b))
    *
    * over `dim` feature-hash buckets with add-1 smoothing (p(b) =
    * (c(b)+1)/(total+dim); buckets unseen on one side still smooth).
    * The published recipe resamples with Gumbel noise; this engine's
    * deterministic contract takes the top-k by weight with the id as the
    * tie-break (the zero-temperature limit), so the selection is
    * reproducible, append-stable and auditable. Pool docs with fewer than
    * 2 tokens have no bigrams and thus no weight — they are never
    * selected (mirrored by the oracle).
    *
    * Cross-engine float contract (the q127 discipline): each
    * (doc, bucket) contribution is rounded to 6 dp and summed as
    * decimal(18,6), so the per-document weight — and therefore the
    * ranking — is EXACT in both engines; the ln argument is one mirrored
    * double expression tree.
    *
    * Scale shape: ONE tokenize-explode pass collapses to the
    * (doc, side, bucket) count table; both LMs derive from THAT table as
    * a `dim`-row aggregate (map-side partials), the log-ratio table is a
    * `dim`-row broadcast joined back onto the pool side, the per-doc
    * weight is one hash aggregate, and the selection is a TakeOrdered(k)
    * — never a global window, nothing corpus-sized on the driver. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, dim: Int = 64, k: Int = 100): DataFrame = {
    val weights = dsirWeights(docs, idCol, textCol, isTarget, dim)
    // TakeOrdered(k), THEN rank the k survivors (a k-row single partition
    // by contract — the global window never sees the corpus)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col(idCol))
    weights.orderBy(col("weight").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** The DSIR weight table for EVERY pool document — (idCol, weight), no
    * ranking, no window: the composable half of [[dsirSelect]], and the
    * input to the published recipe's actual sampling step (see the q516
    * gate: sampling-without-replacement ∝ exp(weight) via the audited
    * deterministic Efraimidis–Spirakis sampler = Gumbel-top-k). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= 65536, "bucket count must be in [2, 65536]")
    // pinned: the tokenize-explode-hash pass feeds three consumers (the
    // LM aggregate, its totals, and the weight join) — unpinned, each
    // branch re-runs the whole corpus scan (measured 4.8 s → 2 s at
    // sf0.1). The pinned table is ≤ docs × dim rows, far smaller than
    // the gram explosion it collapses.
    val docBucket = docs
      .select(col(idCol), isTarget.as("__t"),
        explode(shingles(tokens(col(textCol)), 2)).as("__g"))
      .select(col(idCol), col("__t"),
        pmod(tokenHash(col("__g")), lit(dim.toLong)).as("bucket"))
      .groupBy(col(idCol), col("__t"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    // full dim-bucket frame so buckets unseen on either side still smooth
    val frame = docs.sparkSession.range(dim).select(col("id").as("bucket"))
    val lm = frame.join(
        docBucket.groupBy(col("bucket")).agg(
          sum(when(col("__t"), col("n")).otherwise(0L)).as("tc"),
          sum(when(!col("__t"), col("n")).otherwise(0L)).as("pc")),
        Seq("bucket"), "left")
      .na.fill(0L, Seq("tc", "pc"))
    val totals = lm.agg(sum(col("tc")).as("tt"), sum(col("pc")).as("pt"))
    // the ratio side gets its own bucket name: it joins back onto rows
    // derived from the SAME checkpoint, and a same-named join against a
    // checkpoint's preserved attribute ids is the q311 conflict trap
    val ratio = lm.crossJoin(broadcast(totals))
      .select(col("bucket").as("__rbucket"),
        log(((col("tc") + 1).cast("double") * (col("pt") + dim).cast("double")) /
          ((col("pc") + 1).cast("double") * (col("tt") + dim).cast("double")))
          .as("__lr"))
    docBucket.filter(!col("__t"))
      .join(broadcast(ratio), col("bucket") === col("__rbucket"))
      .withColumn("__contrib",
        round(col("n").cast("double") * col("__lr"), 6).cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(sum(col("__contrib")).cast("double").as("weight"))
  }

  /** Duplicated-span statistics — exact substring dedup at token-window
    * granularity (the scalable form of the "dedup training data at the
    * substring level" recipe: long verbatim repeats across documents are
    * boilerplate/licenses/templates that doc-level dedup misses). Each
    * document is cut into NON-overlapping `window`-token spans
    * ([[chunkTokens]] with overlap 0); a span is duplicated when its exact
    * text occurs more than once in the whole corpus (across or within
    * documents). Returns per-doc (n_spans, n_dup_spans, dup_ratio) — the
    * thresholding signal.
    *
    * Scale shape: one explode pass → span-frequency hash aggregate (map-side
    * partials; the frequency table is at most corpus-token-sized and is
    * equi-joined back on the span text, a shuffle join AQE can skew-split —
    * nothing is broadcast, nothing is quadratic) → per-doc hash aggregate. */
  def duplicateSpanStats(docs: DataFrame, idCol: String, textCol: String,
                         window: Int = 10): DataFrame = {
    val chunks = chunkTokens(docs, idCol, textCol, chunkSize = window, overlap = 0)
    val freq = chunks.groupBy(col("chunk_text")).agg(count(lit(1)).as("__occ"))
    chunks.join(freq, Seq("chunk_text"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__occ") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_ratio",
        col("n_dup_spans").cast("double") / col("n_spans"))
  }

  /** Substring-level dedup REMOVAL: drop every duplicated `window`-token
    * span except its canonical first occurrence (smallest (doc id, span
    * position) — deterministic, partition-independent), then rebuild each
    * document's text from its surviving spans in position order. Documents
    * whose every span was dropped disappear (fully-boilerplate docs).
    * Returns (idCol, dedup_text, n_spans, n_kept).
    *
    * Scale shape: the canonical-occurrence choice is a row_number window
    * partitioned BY SPAN TEXT (hash-partitioned, never global); the rebuild
    * is a per-doc aggregate whose collect_list is bounded by document size.
    * The sort inside the aggregate (array_sort over (span position, text)
    * structs) makes the rebuild independent of collect_list's arrival
    * order. */
  def dropDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                         window: Int = 10): DataFrame = {
    val chunks = chunkTokens(docs, idCol, textCol, chunkSize = window, overlap = 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_text")).orderBy(col(idCol), col("chunk_id"))
    chunks.withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__rn") === 1, struct(col("chunk_id"), col("chunk_text"))))),
            s => s.getField("chunk_text")),
          " ").as("dedup_text"))
      .filter(col("n_kept") > 0)
  }

  /** Corpus-relative length-outlier filter (the Gopher/C4 document-length
    * rule): keep documents whose token count lies inside the corpus's
    * [pLo, pHi] exact-percentile band — truncated docs and boilerplate
    * mega-docs both fall outside it.
    *
    * The thresholds are ONE row of two doubles, broadcast; the corpus
    * streams once for the percentile aggregate and once for the filter. At
    * 100 TB swap `percentile` for `approx_percentile` (sketch-mergeable,
    * single pass, bounded memory) — SamplingSpec asserts the sketch tracks
    * the exact value on this corpus. */
  def lengthOutlierFilter(docs: DataFrame, idCol: String, textCol: String,
                          pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val withN = docs.withColumn("n_tokens",
      size(filter(tokens(col(textCol)), t => t =!= "")).cast("long"))
    val bounds = withN.agg(
      expr(s"percentile(n_tokens, $pLo)").as("__lo"),
      expr(s"percentile(n_tokens, $pHi)").as("__hi"))
    withN.crossJoin(org.apache.spark.sql.functions.broadcast(bounds))
      .filter(col("n_tokens") >= col("__lo") && col("n_tokens") <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Source-level filtering (domain filtering, the C4/RefinedWeb shape):
    * keep documents whose SOURCE's mean score clears `minMean` — low-quality
    * domains are dropped wholesale, which catches boilerplate farms that
    * per-document rules miss. Mean = exact decimal sum ÷ count (the
    * engine-reproducible form; native double avg accumulates in reduction
    * order). Two hash aggregates + a semi-join on the source key; the
    * per-source table is dimension-sized (|sources| ≪ |docs|), so AQE
    * broadcasts the semi-join build side. */
  def filterBySourceQuality(docs: DataFrame, srcCol: String, scoreCol: String,
                            minMean: Double): DataFrame = {
    val good = docs.groupBy(col(srcCol))
      .agg((sum(col(scoreCol).cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("__mean"))
      .filter(col("__mean") >= minMean)
      .select(srcCol)
    docs.join(good, Seq(srcCol), "left_semi")
  }

  /** Sharded inverted index — term → posting list, the retrieval-side
    * primitive (BM25/keyword search over the corpus, candidate generation
    * for retrieval-augmented pipelines). Postings are SHARDED by document-id
    * range (`shard = doc_id div shardSize`) so no single (term, shard) group
    * ever aggregates more than `shardSize` documents: at corpus scale a
    * stop-word's posting list is billions of ids, and an unsharded
    * collect_list would concentrate it on one task (the classic hot-key
    * failure). Sharding bounds every group AND parallelizes hot terms;
    * readers merge shards in shard order (postings within a shard are
    * sorted, shards partition the id space in order, so concatenation is
    * the globally-sorted list).
    *
    * Returns (term, shard, df = docs in this shard containing term,
    * postings = sorted doc ids). One explode pass → per-(doc, term) distinct
    * via the grouping itself → (term, shard) hash aggregate with map-side
    * partials; the sorted aggregate makes output order-independent. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    shardSize: Long = 1000000L): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    docs.select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .withColumn("shard", expr(s"$idCol div ${shardSize}L"))
      .groupBy(col("term"), col("shard"))
      .agg(count(lit(1)).as("df"),
        array_sort(collect_list(col(idCol))).as("postings"))
  }

  /** BM25 ranked retrieval — the query-side companion to [[invertedIndex]]
    * (keyword search / retrieval-augmented candidate generation over the
    * corpus). Scores each (query, document) pair with the Lucene BM25
    * variant — idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1), always
    * non-negative — and returns the top `k` documents per query.
    *
    * Plan shape for a corpus-scale run: tf, doc lengths and document
    * frequencies all DERIVE from one (doc, term) rollup logically; Catalyst
    * executes each aggregate as its own scan+tokenize pass (subtrees on
    * different join sides don't unify), which is the right trade here —
    * re-running a cheap per-row projection beats materializing a
    * corpus-sized tf table (the same lineage discipline as the dedup
    * family: pin only tiny sets). In production the (term, df) and
    * (doc, dl) tables are write-once artifacts maintained next to the
    * inverted index, collapsing this to a single probe pass. The query set
    * is dimension-sized by nature, so (query_id, term, df) is a broadcast
    * build side and the corpus tf table streams through one broadcast hash
    * join — the equi-join on term IS the inverted-index probe, cutting the
    * corpus to the postings of query terms before any shuffle; the per-doc
    * dl join has no hint, so AQE broadcasts it only while it is actually
    * small and shuffles otherwise. The final per-query top-k window is
    * partitioned by query — never global (Spark plans it as a two-phase
    * WindowGroupLimit: partial top-k before the exchange, so only k rows
    * per query per partition shuffle). A stop-word query term makes its
    * posting list
    * corpus-sized; `maxDf` drops such terms from the QUERY side (one tiny
    * filter — they contribute near-zero idf anyway), bounding the candidate
    * set the way the dedup family's stop-shingle guard does.
    *
    * Determinism contract (same as q81/q88): the per-term score is rounded
    * to 6 dp and cast to an exact decimal BEFORE the per-(query, doc)
    * summation — double addition is reduction-order-dependent, so summing
    * raw doubles would diverge between partitionings and engines. Ranking
    * orders by the exact-sum-derived score with doc id as tie-break. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus stats: one row each; exact integer sums ÷ count keep avgdl
    // engine-reproducible (native double avg accumulates in reduction order)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val avg = dl.agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qt = queries.select(col(qidCol),
        explode(array_distinct(tokens(col(qtextCol)))).as("term"))
      .filter(col("term") =!= "")
    val qdf0 = qt.join(dfreq, Seq("term")) // (qid, term, df) — query-sized
    val qdf = if (maxDf > 0) qdf0.filter(col("df") <= maxDf) else qdf0
    val cand = tf.join(broadcast(qdf), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(avg))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val scored = cand.withColumn("__s",
      round(idf * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
        .cast("decimal(38,6)"))
    val perDoc = scored.groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__s")).cast("double").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol).asc)
    perDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai & Lafferty's
    * rank-equivalent form) — the probabilistic complement to [[bm25TopK]]:
    *
    *   score(q,d) = Σ_{t ∈ q∩d} ln(1 + tf_{t,d}·|C| / (μ·cf_t))
    *              + |q|·ln(μ / (dl_d + μ))
    *
    * Same scale shape as BM25: the (query, term, cf) build side is
    * dimension-sized and broadcast, the corpus tf table streams through one
    * broadcast hash join (the inverted-index probe), the per-query top-k is
    * a partitioned WindowGroupLimit. Only documents containing ≥1 query
    * term are candidates (the second term alone cannot rank a doc in).
    *
    * Determinism contract: per-term scores round to 6 dp and sum as exact
    * decimals; the per-doc length penalty rounds its ln to 6 dp before the
    * |q| multiply; integer products (tf·|C|, μ·cf) stay exact inside the
    * ln argument so both engines feed libm identical doubles. */
  def lmDirichletTopK(docs: DataFrame, idCol: String, textCol: String,
                      queries: DataFrame, qidCol: String, qtextCol: String,
                      k: Int = 10, mu: Long = 2000L): DataFrame = {
    require(k > 0 && mu > 0, "need k > 0 and mu > 0")
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val cf = tok.groupBy(col("term")).agg(count(lit(1)).as("cf"))
    val ctot = tok.agg(count(lit(1)).as("ctot"))
    val qt = queries.select(col(qidCol),
        explode(array_distinct(tokens(col(qtextCol)))).as("term"))
      .filter(col("term") =!= "")
    val qm = qt.join(cf, Seq("term")) // (qid, term, cf) — query-sized
    val qn = qm.groupBy(col(qidCol)).agg(count(lit(1)).as("nq"))
    val perTerm = tf.join(broadcast(qm), Seq("term"))
      .crossJoin(broadcast(ctot))
      .withColumn("__s",
        round(log(lit(1.0d) + (col("tf") * col("ctot")).cast("double") /
          (lit(mu) * col("cf")).cast("double")), 6).cast("decimal(18,6)"))
    val perDoc = perTerm.groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__s")).as("__ssum"))
    val scored = perDoc
      .join(broadcast(qn), Seq(qidCol))
      .join(dl, Seq(idCol))
      .withColumn("score",
        round(col("__ssum").cast("double") + col("nq").cast("double") *
          (round(log(lit(mu.toDouble) /
            (col("dl") + lit(mu)).cast("double")), 6) + lit(0.0d)), 6)
          + lit(0.0d))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score"), col("rank"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (lexical BM25 + vector ANN feeding one ranked list, the RAG-serving
    * shape): each input ranking contributes 1/(kk + rank) per (query, doc),
    * summed across rankings; documents surfacing in several lists rise.
    * Rank-only fusion needs no score calibration between retrievers —
    * that is the point of RRF (Cormack et al.).
    *
    * Inputs: DataFrames of (qidCol, idCol, rank). Determinism contract:
    * each reciprocal term is rounded to 6 dp and summed as exact decimal
    * (the repo's float-sum rule — with ≥3 rankings a double sum would be
    * reduction-order-dependent), fused rank ties broken by id.
    *
    * Scale shape: a union of top-k lists is (queries × k × lists) rows —
    * result-sized, not corpus-sized; one hash aggregate on (query, doc)
    * and one query-partitioned WindowGroupLimit top-k. */
  def rrfFuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
              k: Int = 10, kk: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1 && kk >= 0, "need k >= 1 and kk >= 0")
    val u = rankings.map(_.select(
        col(qidCol), col(idCol), col("rank").cast("long").as("rank")))
      .reduce(_ unionAll _)
    val scored = u
      .withColumn("__t",
        round(lit(1.0d) / (lit(kk.toDouble) + col("rank").cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__t")).as("__rrf"), count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("__rrf").desc, col(idCol).asc)
    scored.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col(qidCol), col(idCol), col("__rrf").cast("double").as("rrf"),
        col("n_lists"), col("fused_rank"))
  }

  /** Soundex-style phonetic blocking key (gate q345's kernel): first
    * letter + three digits from consonant classes, with h/w removal,
    * per-class run collapse and vowel drop. The chain is EXPLICIT
    * regexps only — RE2-safe (no backreferences), so a mirrored DuckDB
    * oracle computes the identical codes. Invariant (spec-pinned):
    * doubling any letter of a word never changes its code — runs
    * collapse before the digits are read. */
  def phoneticKey(word: Column): Column = {
    val rest = Seq(
      ("[hw]", ""), ("[bfpv]", "1"), ("[cgjkqsxz]", "2"), ("[dt]", "3"),
      ("l", "4"), ("[mn]", "5"), ("r", "6"), ("[aeiouy]", "0"),
      ("0{2,}", "0"), ("1{2,}", "1"), ("2{2,}", "2"), ("3{2,}", "3"),
      ("4{2,}", "4"), ("5{2,}", "5"), ("6{2,}", "6"), ("0", ""))
      .foldLeft(word.substr(lit(2), length(word))) { case (c, (p, r)) =>
        regexp_replace(c, p, r)
      }
    concat(upper(substring(word, 1, 1)), rpad(substring(rest, 1, 3), 3, "0"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text —
    * the exact-dedup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Order-insensitive fingerprint: md5 over the sorted distinct token set —
    * catches shuffled/reordered near-duplicates exactly. */
  def bagFingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
    * mergeable summary (Agarwal et al., "Mergeable Summaries") behind
    * [[heavyHitters]]. At most `k` counters; any item with true count
    * > N/(k+1) is GUARANTEED to survive both the per-partition stream
    * updates and arbitrary-order partial merges, which is what makes the
    * two-pass exact-top-n below correct under Spark's nondeterministic
    * combine order. The buffer is bounded by k regardless of input size —
    * a map-side-combinable single row, never a per-term shuffle. */
  class MisraGriesAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "k must be positive")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      b.get(t) match {
        case Some(c)            => b.updated(t, c + 1)
        case None if b.size < k => b.updated(t, 1L)
        // full and absent: decrement every counter (drop zeros) — the MG step
        case None => b.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None }
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-largest counter from all, drop non-positives —
        // the mergeable-summaries merge, error stays <= N/(k+1)
        val cut = sum.values.toArray.sortBy(-_).apply(k)
        sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** EXACT top-n frequent items by the textbook two-pass heavy-hitters
    * shape: (1) one Misra–Gries sketch pass — map-side partials merge into
    * a single ≤k-entry row, NO per-item shuffle; (2) exact recount of the
    * candidate items only (broadcast semi-join, so the groupBy shuffles at
    * most k distinct keys) and top-n of the recount with a deterministic
    * (count desc, key asc) tie-break.
    *
    * Correctness contract: when the true n-th count exceeds N/(k+1), the MG
    * guarantee puts every true top-n item in the candidate set no matter
    * how Spark ordered the partial merges, and the exact recount then makes
    * the output identical to a full groupBy top-n — the property the q116
    * oracle checks. Size k accordingly (k ≫ N/count_n).
    *
    * 100 TB shape: the full-histogram alternative shuffles every distinct
    * term (vocabulary-sized); this shuffles one bounded sketch row plus k
    * recount groups. */
  def heavyHitters(df: DataFrame, key: Column, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= n, "need k >= n >= 1")
    val keyed = df.select(key.cast("string").as("key"))
    val sketch = udaf(new MisraGriesAgg(k))
    val cand = keyed.agg(sketch(col("key")).as("__sk"))
      .select(explode(map_keys(col("__sk"))).as("key"))
    keyed.join(broadcast(cand), Seq("key"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(n)
  }

  /** Multinomial naive-Bayes fit + score in one pass family — fit
    * P(class) and Laplace-smoothed P(token|class) from a labeled corpus,
    * then score EVERY document: score(d, c) = ln P(c) + Σ_{w∈d} ln
    * P(w|c), predicted class = argmax with a (score desc, class asc)
    * total order. The self-scoring form is the training-diagnostic
    * (confusion/leakage probe); scoring a second corpus is the same join
    * against the fitted tables.
    *
    * Determinism: every ln term is rounded to 6 dp and summed as EXACT
    * decimal (the KL/entropy discipline); the smoothed probabilities are
    * ratios of exact integer counts in ONE mirrored double tree.
    *
    * Scale shape: the model is two count tables — (class) and
    * (token, class), vocabulary-bounded; scoring joins each token
    * INSTANCE against the (token, class) table fanned by |classes| (a
    * dimension factor), then one hash agg per (doc, class) and a
    * doc-partitioned top-1 window. */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
                      classCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("__id"), col(classCol).as("__true"),
        explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    val classTok = toks.groupBy(col("__w"), col("__true").as("__c"))
      .agg(count(lit(1)).as("__cnt"))
    val classTot = classTok.groupBy(col("__c"))
      .agg(sum(col("__cnt")).as("__tot"))
    val vocabN = classTok.select(col("__w")).distinct()
      .agg(count(lit(1)).as("__v"))
    val docsN = docs.agg(count(lit(1)).as("__nd"))
    val classDocs = docs.groupBy(col(classCol).as("__c"))
      .agg(count(lit(1)).as("__ndc"))
    // token instances × classes, smoothed (missing pair -> count 0)
    val scored = toks
      .crossJoin(broadcast(classTot))
      .join(classTok, Seq("__w", "__c"), "left")
      .crossJoin(broadcast(vocabN))
      .withColumn("__term", round(log(
        (coalesce(col("__cnt"), lit(0L)) + 1).cast("double") /
          (col("__tot") + col("__v")).cast("double")), 6)
        .cast("decimal(18,6)"))
      .groupBy(col("__id"), col("__c"))
      .agg(sum(col("__term")).as("__lik"))
    val prior = classDocs.crossJoin(broadcast(docsN))
      .select(col("__c"),
        round(log(col("__ndc").cast("double") / col("__nd").cast("double")), 6)
          .cast("decimal(18,6)").as("__prior"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__score").desc, col("__c").asc)
    scored.join(broadcast(prior), Seq("__c"))
      .withColumn("__score", (col("__lik") + col("__prior")).cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__c").as("pred_class"),
        round(col("__score"), 6).as("score"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own top-V
    * vocabulary — the tokenizer-coverage diagnostic run before committing
    * a vocab (what share of each document would map to <unk>).
    *
    * The vocabulary is the V globally most frequent tokens with the
    * (count desc, token asc) total order making the boundary
    * deterministic; V is a design-time DIMENSION, so the vocab is
    * broadcast-by-nature (the allowed class). One explode + one agg +
    * one broadcast left join — no windows.
    *
    * OOV rate = ONE division of exact integer counts. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocab must have at least one entry")
    val toks = docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
    val vocab = toks.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__t").asc).limit(vocabSize)
      .select(col("__t"), lit(1).as("__iv"))
    toks.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("__id").as(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** Greedy coverage-maximizing document selection — `rounds` rounds of
    * "pick the document adding the most not-yet-covered shingles": the
    * classic (1−1/e)-approximate set-cover heuristic, used to pick a small
    * high-diversity subset for curriculum seeds, eval slices, or
    * annotation budgets (the coverage-driven sibling of q92's token-budget
    * sampler). Greedy is inherently sequential in ROUNDS, but each round
    * is fully distributed: one anti-join against the covered set + one
    * count aggregate + a 1-row argmax fetch (bounded driver traffic — the
    * kmeans-step precedent); the covered set is localCheckpoint-cut per
    * round so round r never replays rounds 1..r−1. Ties rank (gain desc,
    * id asc) — deterministic, oracle-mirrored. */
  def greedyCover(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one round")
    // each round costs one distributed anti-join + aggregate and grows the
    // driver-side chosen-id predicate by one — the documented "bounded
    // driver traffic" claim only holds for a design-time-constant round
    // count, so enforce it instead of assuming it
    require(rounds <= 256,
      s"greedyCover: $rounds rounds exceed the 256-round driver bound " +
        "(each round is a full corpus pass; pick a budget, not a corpus size)")
    import org.apache.spark.storage.StorageLevel
    val spark = docs.sparkSession
    val ds = docs.select(col(idCol).cast("long").as("__id"),
        explode(distinctShingles(tokens(col(textCol)), shingleN)).as("__s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ds.count(): Unit
    // the covered set keeps its OWN column name (__cs): localCheckpoint
    // preserves attribute ids, so an anti-join of ds against a
    // checkpointed ds-derived frame on a same-named column can trip
    // Catalyst's conflicting-reference check — distinct names sidestep it
    var covered = ds.select(col("__s").as("__cs")).limit(0)
    var chosenIds = List.empty[Long]
    val picks = scala.collection.mutable.ListBuffer.empty[(Int, Long, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val remaining =
        if (chosenIds.isEmpty) ds
        else ds.filter(!col("__id").isin(chosenIds: _*))
      val gains = remaining
        .join(covered, col("__s") === col("__cs"), "left_anti")
        .groupBy(col("__id")).agg(count(lit(1)).as("__gain"))
      val top = gains.orderBy(col("__gain").desc, col("__id").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val id = top.head.getLong(0)
        val gain = top.head.getLong(1)
        chosenIds ::= id
        covered = covered
          .union(ds.filter(col("__id") === id).select(col("__s").as("__cs")))
          .distinct()
          .localCheckpoint(eager = true)
        picks += ((r, id, gain, covered.count()))
        r += 1
      }
    }
    import spark.implicits._
    picks.toSeq.toDF("round", "doc_id", "gain", "covered_total")
  }

  /** Zipf slope per corpus slice — OLS of ln(frequency) on ln(rank) over
    * the top `topRanks` token ranks: natural language sits near −1, and a
    * slice that drifts far from its siblings signals boilerplate, spam, or
    * a broken extractor (the corpus-health read that q32's language profile
    * and q127's KL divergence don't give). Ranks are deterministic
    * (frequency desc, token asc). The regression follows the q141/q162
    * hybrid discipline: ln terms are rounded to 6 dp THEN summed as exact
    * decimals (a raw double Σ would be accumulation-order-dependent), and
    * the closed-form slope/intercept are single double expressions at the
    * end. Scale shape: one token hash agg, a per-slice top-k window over
    * the (slice, token) frequency table (WindowGroupLimit prunes to
    * `topRanks` before the full sort), one moment aggregate over ≤
    * slices×topRanks rows. */
  def zipfSlope(docs: DataFrame, sliceCol: String, textCol: String,
                topRanks: Int = 200): DataFrame = {
    require(topRanks >= 2, "need at least two ranks to fit a line")
    val freq = docs
      .select(col(sliceCol), explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(sliceCol), col("__t")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sliceCol)).orderBy(col("__f").desc, col("__t").asc)
    val ranked = freq.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topRanks)
      .withColumn("__x", round(log(col("__r").cast("double")), 6).cast("decimal(18,6)"))
      .withColumn("__y", round(log(col("__f").cast("double")), 6).cast("decimal(18,6)"))
    val m = ranked.groupBy(col(sliceCol)).agg(
      count(lit(1)).as("n_ranks"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
    m.withColumn("__det",
        col("n_ranks").cast("double") * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      .filter(col("__det") > 0)
      .withColumn("__slope",
        (col("n_ranks").cast("double") * col("__sxy").cast("double") -
          col("__sx").cast("double") * col("__sy").cast("double")) / col("__det"))
      .select(col(sliceCol), col("n_ranks"),
        (round(col("__slope"), 6) + lit(0.0d)).as("zipf_slope"),
        (round((col("__sy").cast("double") - col("__slope") *
          col("__sx").cast("double")) / col("n_ranks").cast("double"), 6)
          + lit(0.0d)).as("intercept"))
  }

  /** Greedy byte-pair-encoding merge learning over a word-frequency table
    * (the tokenizer-training primitive: Sennrich-style BPE on the TYPE
    * table, pair counts weighted by corpus frequency).
    *
    * Input: `(word string, freq long)`. Output: the learned merge table
    * `(step int, merge_left, merge_right, n_pairs long)` — one row per
    * merge, in learning order.
    *
    * Per step: (1) count adjacent symbol pairs weighted by word frequency
    * (ALL adjacent occurrences count, the standard convention); (2) pick
    * the argmax pair with (count desc, left asc, right asc) tie-break;
    * (3) apply the merge EXACTLY as greedy left-to-right non-overlapping
    * pairing. Step (3) is where naive string `replace` diverges from BPE
    * (a run like `a a a a` must become `aa aa`, but replace's consumed
    * boundary yields `aa a aa a`-style artifacts) — instead the merge is
    * applied RELATIONALLY on the `(word, pos, sym)` long table: candidate
    * positions (sym, next) == best form islands of consecutive positions
    * (only possible when left == right), and within an island exactly the
    * even offsets merge — the window-algebra statement of left-to-right
    * greedy pairing. All windows are key-partitioned by word.
    *
    * Scale: the state is the TYPE table (Heaps-bounded — millions of rows
    * at 100 TB, never corpus-sized), exploded to one row per character;
    * each step is one hash aggregate over a vocab-char-sized table plus
    * key-partitioned windows. The per-step argmax is a 1-row broadcast.
    * Lineage is cut per step (the q53 `localCheckpoint` discipline) so the
    * plan stays flat across steps. Ref behavior: the reference has no
    * tokenizer trainer; this is the §2.12 training-data-pipeline extension.
    */
  def bpeLearn(wordFreq: DataFrame, steps: Int): DataFrame =
    bpeStates(wordFreq, steps)._1.reduce(_ unionByName _)

  /** Corpus-compression curve of the q391 BPE learner: after k = 0..steps
    * merges, the total subword count of the corpus
    * (Σ_word freq × symbols-in-word) — the "how many merges buy how much"
    * tokenizer-budget diagnostic. Same bounded state chain as `bpeLearn`;
    * each curve point is one sum over a vocab-char-sized checkpointed
    * table. */
  def bpeCompressionCurve(wordFreq: DataFrame, steps: Int): DataFrame =
    bpeStates(wordFreq, steps)._2.zipWithIndex.map { case (t, k) =>
      t.agg(sum(col("freq")).as("corpus_subwords"))
        .select(lit(k).as("step"), col("corpus_subwords"))
    }.reduce(_ unionByName _)

  /** Shared BPE iteration core: returns (per-step merge rows, symbol-table
    * states t0..tN). Each state is one row per (word, pos, sym), lineage
    * cut per step. */
  private def bpeStates(wordFreq: DataFrame,
                        steps: Int): (Seq[DataFrame], Seq[DataFrame]) = {
    require(steps >= 1, "need at least one merge step")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("word")).orderBy(col("pos"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    var t = wordFreq
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("freq"), col("pos"),
        expr("substring(word, pos, 1)").as("sym"))
      .localCheckpoint(eager = false)
    val states = scala.collection.mutable.ArrayBuffer(t)
    val merges = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    (1 to steps).foreach { k =>
      val withNext = t.withColumn("nxt", lead(col("sym"), 1).over(w))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("merge_left"), col("nxt").as("merge_right"))
        .agg(sum(col("freq")).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("merge_left"), col("merge_right"))
        .limit(1)
        .localCheckpoint(eager = false)
      merges += best.select(lit(k).as("step"), col("merge_left"),
        col("merge_right"), col("n_pairs"))
      // mark greedy merge starts: islands of consecutive candidates, even
      // offsets merge; the row after a merge start is consumed.
      val marked = withNext
        .crossJoin(broadcast(best.select(col("merge_left").as("__a"),
          col("merge_right").as("__b"))))
        .withColumn("c",
          when(col("sym") === col("__a") && col("nxt") === col("__b"), 1)
            .otherwise(0))
        .withColumn("isl", col("pos") - sum(col("c")).over(wCum))
        .withColumn("start",
          min(when(col("c") === 1, col("pos")))
            .over(Window.partitionBy(col("word"), col("isl"))))
        .withColumn("mstart",
          col("c") === 1 && ((col("pos") - col("start")) % 2 === 0))
        .withColumn("consumed",
          coalesce(lag(col("mstart"), 1).over(w), lit(false)))
      t = marked.filter(!col("consumed"))
        .withColumn("__sym",
          when(col("mstart"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")))
        .withColumn("__pos", row_number().over(w))
        .select(col("word"), col("freq"), col("__pos").as("pos"),
          col("__sym").as("sym"))
        .localCheckpoint(eager = false)
      states += t
    }
    (merges.toSeq, states.toSeq)
  }
}
