package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization stats, quality scoring, heuristic language ID, document
  * fingerprinting. Everything is column expressions over built-in
  * functions — fully distributed, no UDFs, no collect.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-document quality metrics: token count, char stats, stopword ratio,
    * and a quality flag. One narrow projection — runs at scan speed.
    */
  def qualityMetrics(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars_nospace",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("avg_token_len", col("n_chars_nospace") / col("n_tokens"))
      .withColumn("stopword_count",
        expr(s"size(filter(toks, x -> x IN ($stopList)))").cast("long"))
      .withColumn("stopword_ratio", col("stopword_count") / col("n_tokens"))
      .withColumn("is_quality",
        col("n_tokens") >= 20 && col("stopword_ratio") < 0.3)
      .select("doc_id", "n_tokens", "n_chars_nospace", "avg_token_len",
        "stopword_count", "stopword_ratio", "is_quality")
  }

  /** Marker-hit score for one language over a token-array column. */
  def langScore(toks: Column, words: Seq[String]): Column = {
    val set = typedLit(words)
    size(filter(toks, x => array_contains(set, x))).cast("long")
  }

  /** Predicted language: argmax of marker scores with a deterministic
    * tie-break — the first language in `markers` order whose score equals
    * the max wins ("und" only if markers is empty).
    */
  def predictedLang(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), elseCol) =>
      when(s === maxScore, lit(l)).otherwise(elseCol)
    }
  }

  /** One-pass predicted language: a single `aggregate` fold over the token
    * array counts hits for EVERY language's marker set simultaneously, and
    * the finish lambda picks the argmax (first language in `markers` order
    * wins ties — same tie-break as predictedLang).
    *
    * Why this exists: `predictedLang(markers.map(langScore(...)))` is
    * correct but each langScore reference re-derives its input — when
    * Catalyst collapses the projection into a Filter, the nested CASE WHEN
    * evaluates `greatest(5 scores)` per branch, ~30 `split(text)` +
    * array-filter evaluations per row, all interpreted (higher-order
    * functions don't codegen). This form walks the token array ONCE: the
    * accumulator and element are lambda-bound variables, referenced
    * cheaply, and the marker sets ride along as one 2-D array literal.
    * Same values, ~10x less work per row in a filter context.
    */
  def predictedLangOnePass(toks: Column,
      markers: Seq[(String, Seq[String])]): Column = {
    if (markers.isEmpty) lit("und")
    else {
      val langs = typedLit(markers.map(_._1))
      val sets = typedLit(markers.map(_._2))
      aggregate(
        toks,
        typedLit(Seq.fill(markers.size)(0L)),
        (acc, x) => zip_with(acc, sets, (cnt, set) =>
          cnt + when(array_contains(set, x), 1L).otherwise(0L)),
        acc => element_at(langs, array_position(acc, array_max(acc)).cast("int")))
    }
  }

  /** Heuristic language ID: score each language by marker-token hits, pick
    * the argmax with a fixed preference order on ties. `markers` maps
    * language code -> marker words; scoring order is the given seq order.
    */
  def languageId(docs: DataFrame, markers: Seq[(String, Seq[String])]): DataFrame = {
    val withScores = markers.foldLeft(docs.withColumn("toks", tokens(col("text")))) {
      case (df, (langCode, words)) =>
        df.withColumn(s"score_$langCode", langScore(col("toks"), words))
    }
    val scoreCols = markers.map { case (l, _) => l -> col(s"score_$l") }
    withScores
      .withColumn("predicted_lang", predictedLang(scoreCols))
      .withColumn("is_match", col("predicted_lang") === col("lang"))
      .select(Seq(col("doc_id")) ++
        markers.map { case (l, _) => col(s"score_$l") } ++
        Seq(col("predicted_lang"), col("lang"), col("is_match")): _*)
  }

  /** Language-ID CONFUSION matrix — the classifier-calibration member for
    * [[languageId]] (the audit family's pattern: never ship a classifier
    * without its measured error structure): per (true label, predicted)
    * cell the doc count and its share of the true label's row in basis
    * points, plus the diagonal flag — which languages the marker heuristic
    * confuses with which, not just how often it is right. One slim
    * aggregate over the per-doc verdicts; output bounded at |langs|².
    */
  def langIdConfusion(docs: DataFrame,
      markers: Seq[(String, Seq[String])]): DataFrame = {
    val cells = languageId(docs, markers)
      .groupBy(col("lang").as("true_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy(col("true_lang"))
      .agg(sum(col("n_docs")).as("n_true"))
    cells.join(broadcast(totals), "true_lang")
      .select(col("true_lang"), col("predicted_lang"), col("n_docs"),
        floor(col("n_docs") * 10000.0 / col("n_true") + 0.5).cast("long")
          .as("row_bp"),
        (col("true_lang") === col("predicted_lang")).as("correct"))
      .orderBy(col("true_lang"), col("predicted_lang"))
  }

  /** Token n-gram shingles as space-joined strings, hashed with md5 —
    * md5 is available verbatim in the oracle engine, keeping the
    * fingerprint portable.
    */
  def md5Shingles(toks: Column, n: Int): Column = {
    require(n == 3, "portable oracle written for n=3")
    transform(sequence(lit(1), size(toks) - 2), i =>
      md5(concat(element_at(toks, i), lit(" "),
        element_at(toks, i + 1), lit(" "),
        element_at(toks, i + 2))))
  }

  /** Document fingerprint: minimum md5 over token 3-gram shingles
    * (winnowing-style representative hash) + shingle count.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .withColumn("shingles", md5Shingles(col("toks"), 3))
      .select(
        col("doc_id"),
        array_min(col("shingles")).as("fingerprint"),
        size(col("shingles")).cast("long").as("n_shingles"))

  /** Polynomial rolling hash of the whole document (base-257 fold mod
    * 1e9+7): the Rabin-Karp primitive used for content-defined chunk
    * boundaries and cheap change detection. Native codegen'd loop
    * (graftnative.RollingHash) — bit-identical to the left fold the oracle
    * computes, without the per-character interpreted lambda the HOF
    * formulation paid.
    */
  def rollingHash(text: Column): Column =
    org.apache.spark.sql.graftnative.RollingHash.rollingHash(text)

  /** Corpus vocabulary: token -> total occurrences + document frequency,
    * top `k` by count. The explode -> groupBy pair is the canonical heavy
    * text shuffle; Spark plans it with map-side partial aggregation, so
    * the exchange carries one partial count per (partition, token), not
    * one row per token occurrence.
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame = {
    val agg = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(sum(col("tf")).as("term_count"), count(lit(1)).as("doc_freq"))
    // global top-k via orderBy+limit -> TakeOrderedAndProject (per-partition
    // partial top-k, no all-to-one sort shuffle of the whole vocabulary);
    // the rank window then runs over k rows only. The constant partition
    // key routes those k rows to one partition WITHOUT tripping WindowExec's
    // unpartitioned-window warning — the volume is already bounded by the
    // limit, not by the window.
    val w = Window.partitionBy(lit(0))
      .orderBy(col("term_count").desc, col("token").asc)
    agg
      .orderBy(col("term_count").desc, col("token").asc).limit(k)
      .withColumn("rk", row_number().over(w).cast("long"))
  }

  /** Per-document top TF-IDF terms: tf * ln(N / df), top `perDoc` terms
    * per document. Two aggregations (term frequency, document frequency)
    * + one broadcast join of the tiny df table + one per-doc window. The
    * corpus size N rides along as a broadcast 1-row aggregate — no
    * driver-side count() action in the plan.
    */
  def tfIdfTopTerms(docs: DataFrame, perDoc: Int): DataFrame = {
    // materialized once: tf feeds BOTH the document-frequency aggregate
    // and the final join, which would otherwise each re-run the corpus
    // explode + (doc, token) aggregation. The checkpointed frame is the
    // AGGREGATED (doc_id, token, tf) table — bounded by distinct doc-term
    // pairs, already shuffled; the raw token explosion never materializes.
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    tf
      .join(broadcast(df), "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= perDoc)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rk"),
        round(col("tfidf"), 4).as("tfidf_r"))
  }

  /** Fixed-size token windows with stride — context-window chunking for
    * sequence training. One explode over per-row window indices; window
    * text is reduced to (hash, token count) so whole chunks never travel
    * unless the caller asks for them.
    */
  def tokenWindows(docs: DataFrame, windowTokens: Int, stride: Int): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") >= windowTokens)
      .withColumn("win_idx", explode(sequence(lit(0),
        floor((col("n_tokens") - windowTokens) / stride).cast("int"), lit(1))))
      .withColumn("win_toks",
        slice(col("toks"), col("win_idx") * stride + 1, lit(windowTokens)))
      .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
        md5(array_join(col("win_toks"), " ")).as("win_hash"),
        lit(windowTokens).cast("long").as("win_tokens"))

  /** Repetition quality metrics (Gopher-style, Rae et al. 2021 §A1.1):
    * per-document token n-gram repetition — the fraction of n-gram
    * occurrences belonging to the single most frequent n-gram and the
    * fraction belonging to any n-gram that occurs more than once. Highly
    * repetitive documents (boilerplate, keyword stuffing, degenerate
    * generations) are flagged. Plan: one explode over gram positions,
    * then (doc, gram) partial-agg -> per-doc agg — two shuffles both
    * keyed on doc_id+gram / doc_id, linear in corpus token count. Uses
    * `explode_outer` so InferFiltersFromGenerate cannot clone the gram
    * pipeline into the scan filter (the q_decontam lesson).
    */
  def repetitionMetrics(docs: DataFrame, n: Int, dupFracCut: Double): DataFrame = {
    require(n >= 2, "n-gram repetition needs n >= 2")
    // one-pass native run-length stats over sorted window hashes: a pure
    // projection, where the explode -> groupBy(doc_id, gram) formulation
    // shuffled every gram of the corpus twice to count within-doc
    // duplicates. Same values (equal grams hash equal; 64-bit collisions
    // ~m²/2⁶⁵ per doc, the SortedIntersectCount identity).
    val r4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= n)
      .withColumn("st",
        org.apache.spark.sql.graftnative.GramRunStats.gramRunStats(col("toks"), n))
      .select(col("doc_id"),
        col("st.n_grams").as("n_grams"),
        col("st.top_gram_cnt").as("top_gram_cnt"),
        col("st.dup_gram_cnt").as("dup_gram_cnt"),
        r4(col("st.top_gram_cnt").cast("double") / col("st.n_grams")).as("top_frac"),
        r4(col("st.dup_gram_cnt").cast("double") / col("st.n_grams")).as("dup_frac"),
        (col("st.dup_gram_cnt").cast("double") / col("st.n_grams") > dupFracCut)
          .as("is_repetitive"))
  }

  /** Tokenizer-id mapping: build a frequency-ranked vocabulary of the top
    * `vocabSize` tokens (count desc, token asc — fully deterministic),
    * broadcast it, and map every document to its id sequence. Out-of-vocab
    * tokens map to id 0. The id sequence travels as one md5, not as the
    * sequence itself — per-doc output is O(1) regardless of doc length.
    * Vocab selection is TakeOrdered (per-partition partial top-k, no
    * full-vocab sort shuffle); the corpus-side map is a broadcast join.
    */
  def tokenIds(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
    // constant partition key: rank runs over the vocabSize rows the limit
    // kept, and the explicit (constant) partitioning avoids the
    // unpartitioned-WindowExec warning on a volume that is bounded anyway
    val w = Window.partitionBy(lit(0)).orderBy(col("cnt").desc, col("token").asc)
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)
      .select(col("token"), row_number().over(w).cast("long").as("token_id"))
    val r4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token_id")))),
          s => coalesce(s.getField("token_id"), lit(0L)).cast("string")), " "))
          .as("ids_hash"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        r4(col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"),
        col("ids_hash"))
  }

  /** Tokenizer vocabulary-coverage report — the vocab-SIZING metric next
    * to tokenIds' per-doc mapping: for the frequency-ranked top-V word
    * vocabulary (same deterministic construction as [[tokenIds]]), each
    * source's token mass, out-of-vocabulary mass, coverage in basis
    * points, and distinct OOV type count. This is the table a team reads
    * when choosing V: coverage_bp vs V is the elbow curve, and a source
    * whose n_oov_types explodes flags domain text the tokenizer
    * under-serves.
    *
    * Scale: one gram scan; the vocab aggregate plans as partial top-k
    * (TakeOrdered, no full-vocab sort) and broadcasts V rows back onto
    * the stream. The n_oov_types distinct costs one slim
    * (source, token)-keyed exchange with partial aggregation — raw text
    * never travels — followed by the k-row per-source merge.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int): DataFrame = {
    val toks = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("source"), explode(col("toks")).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(vocabSize)
      .select(col("token"), lit(true).as("in_vocab"))
    val nOov = sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        nOov.as("n_oov_tokens"),
        countDistinct(when(col("in_vocab").isNull, col("token")))
          .as("n_oov_types"),
        floor((count(lit(1)) - nOov).cast("double") / count(lit(1))
          * 10000.0 + 0.5).cast("long").as("coverage_bp"))
  }

  /** Corpus-LM fluency score (CCNet-style quality signal): train a token
    * bigram model ON the corpus itself (P(w2|w1) = c(w1 w2)/c(w1 ·)) and
    * score each document by its mean bigram log-probability — documents
    * whose transitions are unusual for the corpus (noise, wrong language,
    * shuffled text) score low. Per-bigram log-probs are quantized to
    * micro-units and summed as exact integers (order-independent across
    * partition layouts); only the 4-dp mean is emitted because last-ulp
    * libm `ln` differences across engines make raw sums non-portable
    * (same rule as Ivf.cellStats). Plan: gram explode -> bigram count agg
    * -> slim (bigram, logp) join back -> per-doc agg; the corpus text
    * never travels, only (doc_id, bigram) pairs.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val bi = docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode_outer(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat(element_at(col("toks"), i), lit(" "),
            element_at(col("toks"), i + 1)))).as("bigram"))
    // NOT checkpointed: c2's two consumers (the unigram rollup and the
    // model join) share one identical aggregate subplan that Spark's
    // ReuseExchange already computes once; a measured checkpoint attempt
    // cost more than it saved (0.82 s -> 1.02 s) because the final
    // per-doc join re-derives `bi` either way.
    val c2 = bi.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val c1 = c2
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val model = c2.withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(c1, "w1")
      .select(col("bigram"),
        floor(log(col("c2").cast("double") / col("c1")) * 1000000.0 + 0.5)
          .cast("long").as("logp_u"))
    val r4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    bi.join(model, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp_u")).as("sum_u"))
      .select(col("doc_id"), col("n_bigrams"),
        r4(col("sum_u").cast("double") / col("n_bigrams") / 1000000.0)
          .as("mean_logp_r"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", 2020): split
    * each language's documents into head / middle / tail thirds by LM
    * fluency — here lmScore's mean bigram log-prob (higher = more fluent
    * = lower perplexity) — the standard quality stratification a web
    * corpus gets before mixing (head oversampled, tail down-weighted or
    * dropped). Docs lmScore cannot score (< 2 tokens) are absent, as in
    * CCNet itself (unscorable fragments never reach the mix).
    *
    * Cut points are EXACT rank statistics, not interpolated quantiles:
    * t1 = the score at ascending rank ceil(n/3) within the language, t2 =
    * at rank ceil(2n/3); bucket = tail if score < t1, middle if < t2,
    * else head. Value cuts keep ties deterministic, and rank selection
    * over the 4-dp scores replays exactly in any engine — interpolated
    * percentile lerp arithmetic does not (last-ulp divergence, the
    * q_ivf_stats lesson).
    *
    * Scale shape: the corpus never globally sorts — scores aggregate per
    * (lang, score) first, and because scores are 4-dp quantized that
    * histogram is BOUNDED regardless of corpus size (#langs x distinct
    * 4-dp values), so the cumulative-rank window runs on a small frame
    * and the per-lang cut rows broadcast back onto the scored projection.
    */
  def pplBuckets(docs: DataFrame): DataFrame = {
    val scored = lmScore(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val hist = scored.groupBy(col("lang"), col("mean_logp_r"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("lang"))
        .orderBy(col("mean_logp_r").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
    // ceil(n/3) and ceil(2n/3) as floor((n+2)/3), floor((2n+2)/3) — pure
    // double floors, exact for any corpus below 2^52 docs, same formula
    // in the oracle
    val cuts = cum.join(tot, "lang")
      .groupBy(col("lang"))
      .agg(
        min(when(col("cum") >= floor((col("n") + 2) / 3.0),
          col("mean_logp_r"))).as("cut_lo"),
        min(when(col("cum") >= floor((col("n") * 2 + 2) / 3.0),
          col("mean_logp_r"))).as("cut_hi"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("mean_logp_r"), col("cut_lo"), col("cut_hi"),
        when(col("mean_logp_r") < col("cut_lo"), "tail")
          .when(col("mean_logp_r") < col("cut_hi"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** Model-based quality scoring — the classifier-filter stage of a
    * modern pretraining pipeline (the fastText/DCLM shape: score every
    * document by a linear model trained on curated-vs-raw seed sets,
    * keep what scores above threshold). The model here is multinomial
    * Naive Bayes over unigrams: per-token weight = smoothed
    * log-likelihood ratio ln((c1+1)/(N1+V)) - ln((c0+1)/(N0+V)) for the
    * frequency-ranked top-V seed vocabulary (deterministic tie-break:
    * count desc, token asc); out-of-vocabulary tokens score the
    * all-unseen ratio ln(N0+V) - ln(N1+V). A document's score is its
    * MEAN per-token weight (length-normalized, so long docs don't
    * dominate the threshold), and `keep` is the exact integer-domain
    * sign of the summed weights.
    *
    * Numeric portability: weights are quantized to integer micro-units
    * the moment they leave `ln` (same rule as lmScore / Ivf.cellStats)
    * and summed as exact longs — order-independent across partition
    * layouts — with only the 4-dp mean emitted.
    *
    * Scale shape: the training aggregations explode SEED docs only (the
    * curated fraction, tiny next to the corpus); the model is V rows +
    * a 1-row OOV frame, both broadcast; scoring is one corpus gram scan
    * re-aggregated per doc — raw text never travels, and no stage pulls
    * anything to the driver.
    *
    * `posSeed` / `negSeed` are row predicates over `docs` (e.g.
    * `col("source") === "curated"`); rows satisfying neither train
    * nothing but are still scored. One-class seed sets are fine
    * (Laplace smoothing keeps every weight defined). EMPTY seed sets
    * yield the no-evidence model: every doc scores 0 and KEEPS — a
    * filter with no training signal must not silently drop the corpus.
    */
  def nbQuality(docs: DataFrame, posSeed: Column, negSeed: Column,
      vocabSize: Int): DataFrame = {
    val r4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    nbScored(docs, posSeed, negSeed, vocabSize)
      .select(col("doc_id"), col("n_tokens"),
        r4(col("sum_u").cast("double") / col("n_tokens") / 1000000.0)
          .as("nb_score_r"),
        (col("sum_u") > 0 || col("v") === 0).as("keep"))
  }

  /** The exact-integer scored frame behind [[nbQuality]] — one row per
    * document with its token count and the exact long micro-unit weight
    * sum (`sum_u`), plus the vocabulary size `v` that the keep rule
    * needs. [[nbQuality]] derives the published 4-dp mean from this;
    * the classifier-trust audits (q_nb_auc / q_nb_pr) consume the SAME
    * frame so the score they audit cannot drift from the score the
    * filter publishes. Semantics, numeric discipline, and scale shape
    * are documented on [[nbQuality]].
    */
  private[graft] def nbScored(docs: DataFrame, posSeed: Column,
      negSeed: Column, vocabSize: Int): DataFrame = {
    val toks = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), posSeed.as("pos"), negSeed.as("neg"),
        explode(col("toks")).as("token"))
    val seedToks = toks.where(col("pos") || col("neg"))
    val counts = seedToks.groupBy(col("token"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("neg"), 1L).otherwise(0L)).as("c0"))
    // top-V by total seed mass -> TakeOrdered (partial top-k, no
    // full-vocab sort); materialized once: it feeds the weight table AND
    // the |V| scalar below
    val vocab = counts
      .orderBy((col("c1") + col("c0")).desc, col("token").asc)
      .limit(vocabSize)
      .localCheckpoint()
    // totals coalesce to 0 on EMPTY seed sets (agg over zero rows yields
    // null sums), and the OOV weight short-circuits to 0 when the vocab
    // is empty (ln(0+0) would otherwise NaN the whole score column)
    val tot = seedToks.agg(
      coalesce(sum(when(col("pos"), 1L).otherwise(0L)), lit(0L)).as("n1"),
      coalesce(sum(when(col("neg"), 1L).otherwise(0L)), lit(0L)).as("n0"))
    val vsz = vocab.agg(count(lit(1)).as("v"))
    val wu = (cc: Column, nn: Column) =>
      log((cc + 1).cast("double") / (nn + col("v")).cast("double"))
    val model = vocab.crossJoin(tot).crossJoin(vsz)
      .select(col("token"),
        floor((wu(col("c1"), col("n1")) - wu(col("c0"), col("n0")))
          * 1000000.0 + 0.5).cast("long").as("w_u"))
    val oov = tot.crossJoin(vsz)
      .select(when(col("v") === 0, lit(0L))
        .otherwise(floor((log((col("n0") + col("v")).cast("double"))
          - log((col("n1") + col("v")).cast("double"))) * 1000000.0 + 0.5)
          .cast("long")).as("w_oov"),
        col("v"))
    toks
      .join(broadcast(model), Seq("token"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col("doc_id"), col("v"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("w_u"), col("w_oov"))).as("sum_u"))
      .select(col("doc_id"), col("v"), col("n_tokens"), col("sum_u"))
  }

  /** Inverted index over the corpus — one row per distinct term with its
    * document frequency, collection frequency, and a BOUNDED posting
    * list (the `maxPostings` smallest doc ids, ascending; `df` keeps the
    * true count when the list clips). The search-index build every
    * corpus-exploration tool wants, and the substrate for "which docs
    * contain term X" diagnostics without a corpus scan per question.
    *
    * Scale shape: one gram explode -> (term, doc) aggregation, then the
    * posting selection runs the same skew-safe two-phase smallest-N as
    * Sampling.domainCap — phase 1 ranks within (term, input-partition)
    * so a stopword's postings spread over all reducers and at most
    * maxPostings x num_partitions rows per term survive to the global
    * rank; no reducer ever materializes a hot term's full posting list.
    * df/cf stay exact scalar aggregates on the pre-capped table.
    */
  def invertedIndex(docs: DataFrame, maxPostings: Int): DataFrame = {
    // aggregated (term, doc_id, tf) staged once: it feeds the df/cf
    // aggregate AND the posting-list selection
    val td = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val stats = td.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val local = Window.partitionBy(col("term"), col("part"))
      .orderBy(col("doc_id").asc)
    val global = Window.partitionBy(col("term")).orderBy(col("doc_id").asc)
    val postings = td
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(local))
      .where(col("lr") <= maxPostings)
      .withColumn("rk", row_number().over(global))
      .where(col("rk") <= maxPostings)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    stats.join(postings, "term")
  }

  /** Feature-hashing document embeddings (the "hashing trick",
    * Weinberger et al. 2009): each token adds ±1 (sign hash) to one of
    * `dim` buckets (bucket hash), and the per-doc count vector is
    * L2-normalized — a deterministic, training-free text embedding that
    * makes the whole ANN / semantic-dedup family (cosine top-k, IVF,
    * SemDeDup, semantic ingest) applicable to a text-only corpus with no
    * model dependency. Both hashes are the portable base-257 rolling
    * fold, so every component replays exactly in a second engine;
    * components are integer counts until one final double
    * normalize-and-quantize (6-dp micro-round, same rule as lmScore).
    *
    * Scale shape: ZERO shuffle — the whole embedding is a per-row
    * projection (the native [[org.apache.spark.sql.graftnative.HashingTrickCounts]]
    * hashes each token once into a primitive bucket array; the HOF
    * formulation cost dim x tokens interpreted lambdas per doc, ~10 s
    * vs ~0.3 s at sf0.1); the output is the only thing that travels.
    * Zero-norm docs (empty, or signs cancelling) emit the zero vector
    * rather than NaNs.
    */
  def textEmbed(docs: DataFrame, dim: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.HashingTrickCounts.hashingCounts
    val nrm = sqrt(aggregate(col("cnt"), lit(0.0),
      (acc, v) => acc + (v * v).cast("double")))
    val r6 = (c: Column) => floor(c * 1000000.0 + 0.5) / 1000000.0
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("cnt", hashingCounts(col("toks"), dim))
      .withColumn("nrm", nrm)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        transform(col("cnt"), v =>
          when(col("nrm") === 0.0, lit(0.0))
            .otherwise(r6(v.cast("double") / col("nrm")))).as("embedding"))
  }

  /** Topic labeling by c-TF-IDF (the BERTopic labeling step, re-expressed
    * over this engine's deterministic clustering): documents cluster by
    * their sign-LSH bucket over the hashing-trick embeddings (no training,
    * engine-replayable — the q_text_semdedup blocking reused as topic
    * assignment), and each cluster is labeled by its `topK` highest
    * class-TF-IDF terms, score = tf_cluster · ln(1 + n_clusters/df) with
    * df = the number of CLUSTERS containing the term — terms shared by
    * every cluster (boilerplate) sink, cluster-specific vocabulary rises.
    * The score is quantized to integer micro-nats (one ln per (cluster,
    * term), written operation-identically on both engines), so ranking
    * ties are impossible to get wrong cross-engine.
    *
    * Scale shape: one embedding pass (bucket = nPlanes native dots), one
    * token explode joined to the slim (doc, bucket) assignment, map-side
    * combined (bucket, term) counts, a 1-row cluster-count broadcast, and
    * the skew-safe two-phase rank for top-K per cluster. Output bounded
    * at 2^nPlanes x topK rows.
    */
  def topicLabels(docs: DataFrame, nPlanes: Int, topK: Int,
      stopwords: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftnative.DoubleVecDot.ddot
    import org.apache.spark.sql.expressions.Window
    val planes = graft.operators.Similarity.hyperplanes(nPlanes, 64)
    val bucketC = planes.zipWithIndex.map { case (p, i) =>
      when(ddot(col("embedding"), typedLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val assign = textEmbed(docs, 64)
      .select(col("doc_id"), bucketC.as("bucket")).localCheckpoint()
    val nb = assign.agg(countDistinct(col("bucket")).as("nb"))
    val nDocs = assign.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .where(col("term") =!= "" && !col("term").isin(stopwords: _*))
      .join(assign, "doc_id")
      .groupBy(col("bucket"), col("term")).agg(count(lit(1)).as("tf"))
    val dfB = tf.groupBy(col("term")).agg(count(lit(1)).as("df_buckets"))
    val scored = tf.join(dfB, "term").crossJoin(broadcast(nb))
      .select(col("bucket"), col("term"), col("tf"), col("df_buckets"),
        floor(col("tf").cast("double") *
          log(lit(1.0) + col("nb").cast("double") /
            col("df_buckets").cast("double")) * 1000000.0 + 0.5)
          .cast("long").as("score_micro"))
    val pri = Seq(col("score_micro").desc, col("term").asc)
    val local = Window.partitionBy(col("bucket"), col("part")).orderBy(pri: _*)
    val global = Window.partitionBy(col("bucket")).orderBy(pri: _*)
    scored
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(local)).where(col("lr") <= topK)
      .withColumn("rk", row_number().over(global).cast("long"))
      .where(col("rk") <= topK)
      .join(nDocs, "bucket")
      .select(col("bucket"), col("n_docs"), col("rk"), col("term"),
        col("tf"), col("df_buckets"), col("score_micro"))
      .orderBy(col("bucket"), col("rk"))
  }

  /** The text-only-corpus semantic dedup chain in ONE plan:
    * [[textEmbed]] hashing-trick embeddings -> sign-LSH bucket blocking
    * (deterministic hyperplanes, no training) -> the SemDeDup drop rule
    * (within a bucket, any doc with cosine >= minCosine to a lower-id
    * doc drops; the lowest id survives). Every dot is an explicit left
    * fold (Vectors.dot), so embeddings, buckets, and sims replay
    * bit-for-bit in a second engine.
    *
    * Replica cliques are the worst case (O(cluster^2) candidate pairs
    * within a bucket, 64 double products each — Stress: 14 s at 30x,
    * 71 s at 100x replication); [[textSemDedupStaged]] is the
    * production ordering that removes them.
    */
  def textSemDedup(docs: DataFrame, dim: Int, nPlanes: Int,
      minCosine: Double): DataFrame = {
    // the native double dot keeps the oracle's exact left-fold bit
    // semantics but runs codegen'd — the interpreted HOF formulation
    // cost ~16 s at sf0.1's ~640k candidate pairs, this runs in ~2 s
    import org.apache.spark.sql.graftnative.DoubleVecDot.ddot
    val planes = graft.operators.Similarity.hyperplanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(ddot(col("embedding"), typedLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    // materialize the EMBEDDING first: the downstream projection
    // references `embedding` ~11 times (itself, the norm's two dot
    // args, eight bucket dots) and Catalyst's CollapseProject would
    // inline — i.e. recompute — the whole O(dim x tokens) embedding
    // expression per reference (measured: 10 s -> 2.5 s at sf0.1).
    // The checkpoint also serves the self-join's double consumption.
    val emb = textEmbed(docs, dim)
      .select(col("doc_id"), col("embedding")).localCheckpoint()
    val e = emb.select(col("doc_id"), col("embedding"),
      sqrt(ddot(col("embedding"), col("embedding"))).as("nrm"),
      bucket.as("bucket"))
    e.as("x").join(e.as("y"),
        col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .withColumn("sim",
        ddot(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm")))
      .where(col("sim") >= minCosine)
      .groupBy(col("y.doc_id").as("doc_id"), col("y.bucket").as("bucket"))
      .agg(min(col("x.doc_id")).as("dup_of"),
        count(lit(1)).as("n_dups"),
        (floor(max(col("sim")) * 10000.0 + 0.5) / 10000.0).as("best_sim_r"))
  }

  /** Staged text semantic dedup — the production ordering (the
    * Similarity.semDedupStaged shape, driven from raw text): collapse
    * verbatim duplicates to their lowest-id representative first (one
    * md5-keyed window — replica cliques never reach the candidate
    * join), then run [[textSemDedup]]'s bucket-blocked drop rule on
    * representatives only. Returns the combined drop list with a
    * `reason` column: 'exact' rows collapsed in stage 1, 'semantic'
    * rows dropped in stage 2.
    */
  def textSemDedupStaged(docs: DataFrame, dim: Int, nPlanes: Int,
      minCosine: Double): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    val exactDrops = docs
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id"), col("rep_id").as("dup_of"),
        lit("exact").as("reason"))
    val reps = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
      .select(col("doc_id"), col("text"))
    val semanticDrops = textSemDedup(reps, dim, nPlanes, minCosine)
      .select(col("doc_id"), col("dup_of"), lit("semantic").as("reason"))
    exactDrops.unionByName(semanticDrops)
  }

  /** Semantic cross-corpus leak check — the PARAPHRASE-level eval-set
    * decontamination the gram/shingle gates cannot see: a reordered or
    * lightly rephrased eval doc shares ZERO 3-token shingles with its
    * corpus origin (minhash cross-dedup and exact-gram decontam both
    * miss it entirely) but its bag-of-words hashing embedding is
    * IDENTICAL, cosine 1.0. The corpus collapses to min-id verbatim
    * representatives first (the staged rule — replica mass never
    * reaches the pair stage); both sides embed ([[textEmbed]]), block
    * on sign-LSH buckets, and every CROSS-side pair with cosine >=
    * minCosine is a suspected leak (rep_id, eval_id, sim_r). Run next
    * to q_decontam/q_cross_dedup: the three gates catch verbatim-gram,
    * near-shingle, and bag-paraphrase leakage respectively.
    */
  def textCrossLeak(corpus: DataFrame, evalSet: DataFrame, dim: Int,
      nPlanes: Int, minCosine: Double): DataFrame = {
    import org.apache.spark.sql.graftnative.DoubleVecDot.ddot
    val planes = graft.operators.Similarity.hyperplanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(ddot(col("embedding"), typedLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val reps = corpus.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
      .select(col("doc_id"), col("text"))
    // embedding checkpointed per side before deriving norm/bucket (the
    // CollapseProject inlining rule — see textSemDedup)
    def embedded(docs: DataFrame): DataFrame = {
      val emb = textEmbed(docs, dim)
        .select(col("doc_id"), col("embedding")).localCheckpoint()
      emb.select(col("doc_id"), col("embedding"),
        sqrt(ddot(col("embedding"), col("embedding"))).as("nrm"),
        bucket.as("bucket"))
    }
    embedded(reps).as("x")
      .join(embedded(evalSet).as("y"), col("x.bucket") === col("y.bucket"))
      .withColumn("sim", ddot(col("x.embedding"), col("y.embedding"))
        / (col("x.nrm") * col("y.nrm")))
      .where(col("sim") >= minCosine)
      .select(col("x.doc_id").as("rep_id"), col("y.doc_id").as("eval_id"),
        (floor(col("sim") * 10000.0 + 0.5) / 10000.0).as("sim_r"))
  }

  /** Bitext mining — pseudo-parallel pair extraction between two
    * language slices (the LASER/CCMatrix pipeline step that builds MT
    * and cross-lingual training pairs from comparable corpora, Artetxe
    * & Schwenk 2019, deterministically simplified): both slices embed
    * ([[textEmbed]]), block on sign-LSH buckets (coarse — fewer planes
    * than dedup: mining wants RECALL across the slice boundary where
    * dedup wants tight cliques), and a pair is mined iff each side is
    * the other's TOP-1 by cosine within the bucket (mutual best —
    * the forward∩backward rule that suppresses hub matches), published
    * with the difference margin best − second on the source side
    * (NULL when the source had no second candidate; consumers
    * threshold on sim_r/margin_r downstream — publishing unfiltered
    * keeps the row non-empty at every SF and leaves policy to the
    * caller, the q_hll_overlap contract style).
    *
    * Determinism: every dot is the explicit left fold (native ddot =
    * the oracle's list_reduce bit-for-bit), ranks break sim ties by
    * doc_id ASC, and zero-norm docs are excluded before ranking.
    *
    * Scale shape: candidates are bucket-blocked (work ∝ per-bucket
    * |src|·|tgt|, never the slice cross), the two rank windows
    * partition by doc id with per-partition size bounded by bucket
    * occupancy, and output is bounded by min(|src|, |tgt|).
    */
  def bitextMine(docs: DataFrame, langCol: String, srcLang: String,
      tgtLang: String, dim: Int, nPlanes: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.DoubleVecDot.ddot
    val planes = graft.operators.Similarity.hyperplanes(nPlanes, dim)
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(ddot(col("embedding"), typedLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    def embedded(side: DataFrame): DataFrame = {
      val emb = textEmbed(side, dim)
        .select(col("doc_id"), col("embedding")).localCheckpoint()
      emb.select(col("doc_id"), col("embedding"),
        sqrt(ddot(col("embedding"), col("embedding"))).as("nrm"),
        bucket.as("bucket"))
        .where(col("nrm") > 0.0)
    }
    val cand = embedded(docs.where(col(langCol) === srcLang)).as("x")
      .join(embedded(docs.where(col(langCol) === tgtLang)).as("y"),
        col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("src_id"), col("y.doc_id").as("tgt_id"),
        (ddot(col("x.embedding"), col("y.embedding"))
          / (col("x.nrm") * col("y.nrm"))).as("sim"))
      .localCheckpoint() // three rank consumers of one candidate pass
    val bySrc = Window.partitionBy(col("src_id"))
      .orderBy(col("sim").desc, col("tgt_id").asc)
    val byTgt = Window.partitionBy(col("tgt_id"))
      .orderBy(col("sim").desc, col("src_id").asc)
    val fwd = cand.withColumn("rs", row_number().over(bySrc))
    val top1 = fwd.where(col("rs") === 1)
      .select(col("src_id"), col("tgt_id"), col("sim"))
    val second = fwd.where(col("rs") === 2)
      .select(col("src_id"), col("sim").as("sim2"))
    val back = cand.withColumn("rt", row_number().over(byTgt))
      .where(col("rt") === 1).select(col("src_id"), col("tgt_id"))
    top1.join(back, Seq("src_id", "tgt_id"))
      .join(second, Seq("src_id"), "left")
      .select(col("src_id"), col("tgt_id"),
        (floor(col("sim") * 10000.0 + 0.5) / 10000.0).as("sim_r"),
        when(col("sim2").isNotNull,
          floor((col("sim") - col("sim2")) * 10000.0 + 0.5) / 10000.0)
          .as("margin_r"))
      .orderBy(col("src_id"))
  }

  /** Pattern redaction — the corpus-cleaning pass that scrubs contact-like
    * strings before training. `patterns` maps placeholder -> regex; each
    * match is replaced by the placeholder and counted. Pure column
    * expressions (regexp_replace / regexp_count), scan speed; the regexes
    * here stick to the portable subset (char classes, +, {m,n}) that
    * evaluates identically across engines.
    */
  def redact(docs: DataFrame, patterns: Seq[(String, String)]): DataFrame = {
    val redacted = patterns.foldLeft(col("text")) { case (c, (ph, re)) =>
      regexp_replace(c, re, ph)
    }
    val counts = patterns.map { case (ph, re) =>
      regexp_count(col("text"), lit(re)).cast("long").as(s"n_$ph")
    }
    docs.select(
      Seq(col("doc_id"), redacted.as("clean_text"),
        length(redacted).cast("long").as("clean_chars")) ++ counts: _*)
  }

  /** Text normalization — the pre-tokenization cleanup every corpus pass
    * starts with: strip ASCII control characters to spaces, collapse
    * space runs, trim, lowercase. Pure column expressions at scan speed;
    * the per-doc before/after char counts and `changed` flag are the
    * audit a pipeline keeps of how much the cleanup touched. Regexes stay
    * in the portable subset (hex char class, ' +') so every engine
    * normalizes identically.
    */
  def normalizeText(docs: DataFrame): DataFrame = {
    val stripped = regexp_replace(col("text"), "[\\x00-\\x1f]", " ")
    val norm = lower(trim(regexp_replace(stripped, " +", " ")))
    docs.select(col("doc_id"), norm.as("clean_text"),
      length(col("text")).cast("long").as("n_chars_raw"),
      length(norm).cast("long").as("n_chars_clean"),
      (col("text") =!= norm).as("changed"))
  }

  /** Multimodal plumbing: treat the payload as opaque bytes with typed
    * metadata — byte length, fixed-size chunk count, content hash. The same
    * schema/partitioning carries image/audio blobs at scale; here the text
    * column stands in as the binary payload.
    */
  def binaryMeta(docs: DataFrame, chunkBytes: Int): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      expr(s"CAST((octet_length(CAST(text AS BINARY)) + ${chunkBytes - 1}) DIV $chunkBytes AS BIGINT)")
        .as("n_chunks"),
      md5(col("text")).as("content_hash"))

  // -------------------------------------------------------- BM25 retrieval

  /** BM25 top-k retrieval (Robertson/Spärck Jones; the Lucene idf form):
    * score the corpus against a fixed set of keyword queries and return
    * the k best documents per query. This is the lexical-search dual of
    * the ANN family — how a pipeline pulls "documents about X" out of a
    * web-scale corpus without embeddings (and the retrieval side of a
    * RAG data build).
    *
    * score(D,Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    * idf(t) = ln((N−df+0.5)/(df+0.5) + 1).
    *
    * Numeric portability: each term's contribution is quantized to
    * integer micro-units the moment it leaves the float domain (the
    * lmScore rule), so the per-(query,doc) total is an exact long —
    * order-independent across partitions and bit-equal in any engine;
    * ranking and the hash-checked score derive from that long.
    *
    * Scale shape: the only corpus-sized work is one scan-speed
    * explode+filter — the IN filter on the |Q| query terms runs before
    * anything shuffles, so the exchange carries occurrences of query
    * terms only, never the vocabulary. N/avgdl is a second slim
    * projection folded to ONE row (no text). df, corpus stats, and the
    * query-term map are all broadcast; the final per-query top-k is the
    * skew-safe two-phase rank (a hot query cannot pin a reducer).
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, String)], k: Int,
      k1: Double, b: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qtermPairs = queries.flatMap { case (qid, qt) =>
      qt.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t)) }
    val allTerms: Seq[Any] = qtermPairs.map(_._2).distinct
    val qterms = qtermPairs.toDF("query_id", "term")

    // corpus stats over ALL docs: one slim no-text projection -> 1 row
    val stats = docs
      .select(size(tokens(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    // (doc, term, tf, dl) restricted to the query terms BEFORE any
    // exchange: only hits travel
    val td = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = td.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val tfn = col("tf").cast("double") * (k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = td
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("idf", idf)
      .withColumn("tfn", tfn)
      .withColumn("contrib_u",
        floor(col("idf") * col("tfn") * 1000000.0 + 0.5).cast("long"))

    val perQuery = scored
      .join(broadcast(qterms), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_u")).as("score_u"),
        count(lit(1)).as("n_terms"))
    val pri = Seq(col("score_u").desc, col("doc_id").asc)
    val local = Window.partitionBy(col("query_id"), col("part")).orderBy(pri: _*)
    val global = Window.partitionBy(col("query_id")).orderBy(pri: _*)
    perQuery
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(local))
      .where(col("lr") <= k)
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        (col("score_u").cast("double") / 1000000.0).as("bm25"))
  }

  /** Reciprocal-rank-fusion weights in integer micro-units:
    * w_r = round(10⁶ / (rrfK + r)) — driver-computed so both engines
    * inline identical integers (the ndcgWeightsMicro discipline). */
  def rrfWeightsMicro(k: Int, rrfK: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 / (rrfK + r).toDouble))

  /** HYBRID retrieval — the RAG-era search shape: a keyword ranking
    * ([[bm25TopK]]) and a semantic ranking (cosine over the
    * [[textEmbed]] hashing-trick embeddings, query strings embedded by
    * the SAME function as documents) fused by reciprocal-rank fusion,
    * rrf(d) = Σ_rankings 10⁶/(60 + rank_d) in exact integers — the
    * standard fusion (Cormack et al. 2009) that needs no score
    * calibration between BM25's unbounded scores and cosine's [−1, 1].
    * Lexical-only hits, semantic-only hits, and both-channel hits all
    * surface; a doc ranked by neither contributes nothing.
    *
    * Scale shape: the BM25 side touches only query-term postings; the
    * semantic side here is the exact cosine against the tiny broadcast
    * query panel (one fdot per doc per query at scan speed) — at corpus
    * scale the registered ANN searchers take that side, and the fusion
    * join itself only ever sees ≤ 2k rows per query. Top-k via the
    * skew-safe two-phase rank.
    */
  def hybridSearch(docs: DataFrame, queries: Seq[(Long, String)], k: Int,
      k1: Double, b: Double, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.graftnative.DoubleVecDot.ddot
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val wArr = typedLit(rrfWeightsMicro(k, rrfK).toArray)
    val kw = bm25TopK(docs, queries, k, k1, b)
      .select(col("query_id"), col("doc_id"), col("rank").as("kw_rank"))
    val qEmb = textEmbed(
        queries.toDF("doc_id", "text"), 64)
      .select(col("doc_id").as("query_id"), col("embedding").as("q_emb"),
        sqrt(ddot(col("embedding"), col("embedding"))).as("q_nrm"))
      .where(col("q_nrm") > 0.0)
    // materialize the embeddings once (the textSemDedup lesson): the sim
    // below references `embedding` per query row and CollapseProject
    // would otherwise recompute the O(dim x tokens) expression each time
    val dEmb = textEmbed(docs, 64)
      .select(col("doc_id"), col("embedding")).localCheckpoint()
      .select(col("doc_id"), col("embedding"),
        sqrt(ddot(col("embedding"), col("embedding"))).as("d_nrm"))
      .where(col("d_nrm") > 0.0)
    val pri = Seq(col("sim").desc, col("doc_id").asc)
    val localS = Window.partitionBy(col("query_id"), col("part")).orderBy(pri: _*)
    val globalS = Window.partitionBy(col("query_id")).orderBy(pri: _*)
    val sem = dEmb.crossJoin(broadcast(qEmb))
      .withColumn("sim", ddot(col("embedding"), col("q_emb")) /
        (col("d_nrm") * col("q_nrm")))
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(localS)).where(col("lr") <= k)
      .withColumn("sem_rank", row_number().over(globalS).cast("long"))
      .where(col("sem_rank") <= k)
      .select(col("query_id"), col("doc_id"), col("sem_rank"))
    // element_at with a NULL ordinal must not contribute: gate on the
    // rank's presence explicitly rather than trusting NULL propagation
    def w(rank: Column): Column =
      when(rank.isNotNull, element_at(wArr, rank.cast("int")))
        .otherwise(lit(0L))
    val fused = kw.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("kw_rank"), col("sem_rank"),
        (w(col("kw_rank")) + w(col("sem_rank"))).as("rrf_u"))
    val priF = Seq(col("rrf_u").desc, col("doc_id").asc)
    val localF = Window.partitionBy(col("query_id"), col("part")).orderBy(priF: _*)
    val globalF = Window.partitionBy(col("query_id")).orderBy(priF: _*)
    fused
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(localF)).where(col("lr") <= k)
      .withColumn("rank", row_number().over(globalF).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("kw_rank"),
        col("sem_rank"), col("rrf_u"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ----------------------------------------------------- PMI collocations

  /** Pointwise-mutual-information collocation mining (Church & Hanks
    * 1990): the adjacent token pairs that co-occur far more than chance —
    * multi-word expressions, templated boilerplate markers, tokenizer
    * merge candidates. pmi(x,y) = ln(p(xy) / (p(x)·p(y))) with p(xy)
    * over the B adjacent-bigram slots and p(·) over the T token slots.
    *
    * Scale shape: two corpus-sized aggregates, both map-side combined —
    * bigram counts (group space = observed bigram types) and unigram
    * counts (group space = vocabulary) — plus ONE-row totals; the
    * min-count prune lands on the bigram aggregate before the two
    * vocabulary-sized joins, so only surviving pairs join. The final
    * top-k is a TakeOrdered (per-partition partial top-k, no global
    * sort). All counts are exact longs; pmi is one ln per surviving
    * pair with a total (pmi, x, y) tie-break.
    */
  def pmiPairs(docs: DataFrame, minCount: Long, topK: Int): DataFrame = {
    val toks = docs.select(tokens(col("text")).as("toks"))
    val bigrams = toks
      .select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (w, i) -> struct(w AS x, toks[i + 1] AS y))"))
        .as("bg"))
      .groupBy(col("bg.x").as("x"), col("bg.y").as("y"))
      .agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    val unigrams = toks
      .select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = toks.agg(
      sum(size(col("toks")).cast("long")).as("t_tokens"),
      sum(greatest(size(col("toks")) - 1, lit(0)).cast("long")).as("b_slots"))
    val pmi = log(
      (col("c_xy").cast("double") * col("t_tokens") * col("t_tokens")) /
        (col("b_slots").cast("double") * col("c_x") * col("c_y")))
    bigrams
      .join(unigrams.select(col("term").as("x"), col("c").as("c_x")), "x")
      .join(unigrams.select(col("term").as("y"), col("c").as("c_y")), "y")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", pmi)
      .orderBy(col("pmi").desc, col("x").asc, col("y").asc)
      .limit(topK)
      .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
        (floor(col("pmi") * 10000.0 + 0.5) / 10000.0).as("pmi_r"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022):
    * deterministic FIM pairs for code/infilling pretraining. Two cut
    * points derive from independent salted folds of the doc id (ordered,
    * possibly-empty middle); 90% of eligible docs (>= 3 tokens) transform,
    * split 50/50 between PSM (`<PRE> p <SUF> s <MID> m`) and SPM
    * (`<SUF> s <PRE> p <MID> m`) by another fold bit; the rest pass
    * through untouched. Emitted as md5 fingerprints + the cut points, so
    * the decision trail is auditable row-by-row.
    *
    * Shape: a PURE PROJECTION like spanCorrupt — array slices and four
    * folds per doc, no shuffle, no RNG state; the same doc transforms
    * identically on any cluster, retry, or engine.
    */
  def fimTransform(docs: DataFrame): DataFrame = {
    def fold(salt: String): Column =
      rollingHash(concat(lit(salt), col("doc_id").cast("string")))
    val n = size(col("toks"))
    // greatest(..., 1): single-token docs never apply, but the modulus is
    // still evaluated — keep it defined (ANSI divide-by-zero)
    val af = (pmod(fold("fim:a:"), greatest(n - 1, lit(1)).cast("long")) + 1).cast("int")
    val bf = (pmod(fold("fim:b:"), greatest(n - 1, lit(1)).cast("long")) + 1).cast("int")
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("applied",
        n >= 3 && pmod(fold("fim:r:"), lit(10L)) < 9)
      .withColumn("a", when(col("applied"), least(af, bf)).otherwise(0))
      .withColumn("b", when(col("applied"), greatest(af, bf)).otherwise(0))
      .withColumn("mode",
        when(!col("applied"), "none")
          .when(pmod(fold("fim:m:"), lit(2L)) === 0, "psm")
          .otherwise("spm"))
      .withColumn("pre", array_join(slice(col("toks"), lit(1), col("a")), " "))
      .withColumn("mid", array_join(
        slice(col("toks"), col("a") + 1, col("b") - col("a")), " "))
      .withColumn("suf", array_join(
        slice(col("toks"), col("b") + 1, n - col("b")), " "))
      .withColumn("out",
        when(col("mode") === "psm", concat_ws(" ",
          lit("<PRE>"), col("pre"), lit("<SUF>"), col("suf"),
          lit("<MID>"), col("mid")))
          .when(col("mode") === "spm", concat_ws(" ",
            lit("<SUF>"), col("suf"), lit("<PRE>"), col("pre"),
            lit("<MID>"), col("mid")))
          .otherwise(col("text")))
      .select(col("doc_id"), n.cast("long").as("n_tokens"),
        col("applied"), col("mode"), col("a"), col("b"),
        md5(col("out").cast("binary")).as("out_fp"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): deterministic
    * denoising pairs for seq2seq pretraining. Every token position decides
    * span-START by the salted portable fold (`fold(doc_id:pos) % 20 == 0`,
    * ~5% starts x fixed span length 3 ~ 15% corruption); overlapping spans
    * merge into runs; the input keeps uncorrupted tokens with one numbered
    * `<extra_id_k>` sentinel per run, the target lists each sentinel
    * followed by the tokens it hides. Emitted as md5 fingerprints + counts
    * (the pair text itself would be the write path's payload).
    *
    * Shape: a PURE PROJECTION — positions, coverage, and both output
    * strings are array ops and one fold per document, so the corpus never
    * explodes to token rows and never shuffles; at 100 TB this runs at
    * scan speed alongside the other per-doc gates. No RNG state: the same
    * doc always corrupts identically on any cluster, retry, or engine.
    */
  def spanCorrupt(docs: DataFrame): DataFrame = {
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("starts",
        transform(sequence(lit(0), size(col("toks")) - 1),
          p => pmod(org.apache.spark.sql.graftnative.RollingHash.rollingHash(
            concat(lit("corrupt:"),
            col("doc_id").cast("string"), lit(":"), p.cast("string"))),
            lit(20)) === 0))
      .withColumn("covered", expr(
        """transform(sequence(0, size(toks) - 1), p ->
          |  starts[p] OR (p >= 1 AND starts[p - 1])
          |           OR (p >= 2 AND starts[p - 2]))""".stripMargin))
      .withColumn("st", expr(
        """aggregate(sequence(0, size(toks) - 1),
          |  named_struct('inp', '', 'tgt', '', 'k', 0),
          |  (st, p) -> named_struct(
          |    'inp',
          |      CASE
          |        WHEN NOT covered[p] THEN concat(st.inp,
          |          CASE WHEN st.inp = '' THEN '' ELSE ' ' END, toks[p])
          |        WHEN p = 0 OR NOT covered[p - 1] THEN concat(st.inp,
          |          CASE WHEN st.inp = '' THEN '' ELSE ' ' END,
          |          '<extra_id_', cast(st.k AS STRING), '>')
          |        ELSE st.inp END,
          |    'tgt',
          |      CASE
          |        WHEN covered[p] AND (p = 0 OR NOT covered[p - 1])
          |          THEN concat(st.tgt,
          |            CASE WHEN st.tgt = '' THEN '' ELSE ' ' END,
          |            '<extra_id_', cast(st.k AS STRING), '>', ' ', toks[p])
          |        WHEN covered[p] THEN concat(st.tgt, ' ', toks[p])
          |        ELSE st.tgt END,
          |    'k', st.k + CASE WHEN covered[p] AND (p = 0 OR NOT covered[p - 1])
          |                     THEN 1 ELSE 0 END))""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(filter(covered, c -> c))").cast("long").as("n_masked"),
        col("st.k").cast("long").as("n_spans"),
        md5(col("st.inp").cast("binary")).as("input_fp"),
        md5(col("st.tgt").cast("binary")).as("target_fp"))
  }

  /** Per-source gram-novelty profile: a doc's distinct token-3-gram is
    * "novel" when it appears in no other document (corpus df = 1) — the
    * gram-granular counterpart of the near-dup profile: how much NEW
    * content each source contributes vs re-spellings of shared
    * boilerplate. Per source: docs with grams, total distinct grams,
    * novel grams, and the novelty rate in exact basis points
    * (cross-multiplied floor — no float accumulation).
    *
    * Scale shape: the same inverted-index shuffle the containment
    * operator pays — slim (gram-hash, doc) pairs, df map-side combined;
    * the text column never shuffles. Output is one row per source.
    */
  def noveltyProfile(docs: DataFrame): DataFrame = {
    // shingle sets feed two consumers (df counts + the novel join) —
    // materialize once so text is scanned and hashed exactly once
    val withSh = docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"),
        Dedup.shingleHashes(col("toks")).as("sh"))
      .localCheckpoint()
    val ex = withSh.select(col("doc_id"), col("source"),
      explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val perDoc = ex.join(dfreq, "s")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") === 1, 1)).as("n_novel"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("n_grams"),
        sum(col("n_novel")).as("n_novel"))
      .select(col("source"), col("n_docs"), col("n_grams"), col("n_novel"),
        floor(col("n_novel") * 10000.0 / col("n_grams") + 0.5).cast("long")
          .as("novelty_bp"))
  }

  /** Per-source KL divergence of the unigram token distribution from the
    * whole-corpus distribution — the domain-shift number a mixture plan
    * reads next to DSIR's importance weights: sources whose language is
    * far from the corpus mean get a large KL (and deserve their own
    * mixing temperature). Reported in integer micro-nats: each term's
    * contribution (c_s/N_s)·ln((c_s·N)/(N_s·c)) is quantized to 1e-6
    * BEFORE the sum, so the total is an order-independent integer sum —
    * the same portability idiom as the bigram-LM scores. (Terms the
    * source lacks contribute zero — this is the support-restricted KL,
    * well-defined because every source term exists in the corpus.)
    *
    * Scale shape: one token-keyed count aggregate (map-side combined),
    * a slim token-level join of per-source vs corpus counts, a 20-row
    * broadcast of per-source totals, and a 1-row broadcast cross of the
    * corpus total. Text never shuffles; output is one row per source.
    */
  /** Per-source Shannon entropy of the unigram distribution, in integer
    * micro-nats — the third axis of the source-profiling triad (novelty =
    * how much is NEW, divergence = how DIFFERENT from the corpus, entropy
    * = how VARIED internally): templated spam farms collapse toward a few
    * nats, random noise saturates toward ln(vocab), and the healthy
    * middle is where training data lives. H = −Σ p ln p with each term
    * quantized to integer micro-nats BEFORE the sum (the corpusDivergence
    * discipline — partition-order independent, engine-exact); the
    * normalized column divides by ln(n_terms) for a 0..10000 bp scale
    * comparable across sources of different vocabulary sizes
    * (single-term sources have no spread to measure → NULL).
    *
    * Scale shape: one token scan into the slim (source, token, count)
    * aggregate, then per-source arithmetic. One row per source.
    */
  def entropyProfile(docs: DataFrame): DataFrame = {
    val st = docs.select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    val ns = st.groupBy(col("source"))
      .agg(sum(col("c")).as("n_s"), count(lit(1)).as("n_terms"))
    st.join(broadcast(ns), "source")
      .select(col("source"), col("n_s"), col("n_terms"),
        floor((col("c").cast("double") / col("n_s")) *
          log(col("n_s").cast("double") / col("c")) * 1000000.0 + 0.5)
          .cast("long").as("h_c"))
      .groupBy(col("source"), col("n_s"), col("n_terms"))
      .agg(sum(col("h_c")).as("entropy_u"))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_terms"),
        col("entropy_u"),
        when(col("n_terms") > 1,
          floor(col("entropy_u").cast("double") /
            (log(col("n_terms").cast("double")) * 1000000.0) * 10000.0 + 0.5)
            .cast("long")).as("norm_bp"))
      .orderBy(col("source"))
  }

  /** Per-source vocabulary-richness profile — the FIFTH source-profiling
    * axis (24k2 novelty = how much is NEW, 24k3 divergence = how
    * DIFFERENT, 24k4 entropy = how CONCENTRATED; this = how much is
    * still UNSEEN): classic species-richness estimation applied to the
    * unigram vocabulary, the question a corpus curator asks before
    * deciding whether more crawling of a source buys new content or
    * re-reads of the same.
    *
    *   - `coverage_bp`  — Good's sample-coverage estimate C = 1 − f1/N
    *     (Good 1953): the probability mass of ALREADY-SEEN vocabulary;
    *     low coverage = the next crawl still yields new words; emitted
    *     as (N − f1)·10⁴ DIV N, exact integer.
    *   - `chao1_est`    — bias-corrected Chao1 richness floor (Chao
    *     1984): V + f1(f1−1) DIV (2(f2+1)) — a lower bound on the TRUE
    *     vocabulary size including the unseen tail; integer-exact (the
    *     classic f1²/2f2 form divides by zero on doubleton-free
    *     sources; the corrected form is defined everywhere).
    *   - `singleton_bp` — hapax share of the observed vocabulary,
    *     f1·10⁴ DIV V: near-zero = closed/templated vocabulary,
    *     high = open-ended (or noisy) text.
    *
    * All arithmetic is non-negative integer DIV — engine-identical with
    * no rounding discipline needed.
    *
    * Scale shape: one token explode into a (source, token) count — the
    * same single shuffle every profiling axis pays (text itself never
    * travels past the map side) — then a bounded per-source rollup;
    * output is one row per source.
    */
  def vocabRichness(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    tf.groupBy(col("source")).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("f1"),
        col("f2"),
        expr("(n_tokens - f1) * 10000 DIV n_tokens").as("coverage_bp"),
        expr("vocab + (f1 * (f1 - 1)) DIV (2 * (f2 + 1))").as("chao1_est"),
        expr("f1 * 10000 DIV vocab").as("singleton_bp"))
      .orderBy(col("source"))
  }

  /** PII-pattern screen per source — the compliance gate a training-
    * data pipeline runs before anything ships ("which feeds carry
    * email addresses / phone numbers / long numeric identifiers, and
    * at what rate?" — the answer decides whether a source needs a
    * scrubbing pass, and the RATE trend catches a feed that starts
    * leaking): three conservative detectors as plain regexes —
    * email-shaped (`local@domain.tld`), phone-shaped (3-3/4-4 digit
    * groups with -/. separators), and 9+-digit identifier runs — each
    * evaluated as a contains-match per doc (Spark `rlike` ≡ DuckDB
    * `regexp_matches`; the patterns avoid every dialect-divergent
    * feature — no lookaround, no word-boundary escapes, no case
    * flags). Per source: doc counts per detector, any-detector count
    * (a doc can trip several — `any` is the dedup'd union, not the
    * sum), and rates in bp. Detectors are screens, not extractors —
    * documented: a hit rate is a TRIAGE signal to route the source to
    * a real scrubber, never a claim of exhaustiveness.
    *
    * Output: one row per source — n_docs, email_docs, phone_docs,
    * longid_docs, any_docs, email_bp, phone_bp, longid_bp, any_bp.
    * Scale shape: ONE narrow projection over the scan (regex per row,
    * codegen'd), one bounded per-source aggregate.
    */
  def piiScan(docs: DataFrame): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}"
    val longid = "[0-9]{9,}"
    val e = col("text").rlike(email)
    val p = col("text").rlike(phone)
    val l = col("text").rlike(longid)
    docs
      .where(col("source").isNotNull && col("text").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(e, 1L).otherwise(0L)).as("email_docs"),
        sum(when(p, 1L).otherwise(0L)).as("phone_docs"),
        sum(when(l, 1L).otherwise(0L)).as("longid_docs"),
        sum(when(e || p || l, 1L).otherwise(0L)).as("any_docs"))
      .select(col("source"), col("n_docs"), col("email_docs"),
        col("phone_docs"), col("longid_docs"), col("any_docs"),
        expr("(email_docs * 10000) DIV n_docs").as("email_bp"),
        expr("(phone_docs * 10000) DIV n_docs").as("phone_bp"),
        expr("(longid_docs * 10000) DIV n_docs").as("longid_bp"),
        expr("(any_docs * 10000) DIV n_docs").as("any_bp"))
      .orderBy(col("source"))
  }

  /** Vocabulary-growth (Heaps) curve over ingestion order — how fast
    * does the corpus still discover NEW token types as docs arrive?
    * ([[vocabRichness]] reports the static per-source richness; THIS
    * is the growth trajectory an ingest pipeline watches to decide
    * "keep crawling this source or is it saturated?" — a flattening
    * curve means new data is mostly old words): the doc_id axis is cut
    * into `buckets` equal id-range batches VALUE-WISE — b = doc_id·k
    * DIV (max_id+1), no global sort, no one-task ntile (the q_rfm
    * rule) — then per batch: docs, token mass, and NEW types (tokens
    * whose min-batch is b — first-seen semantics from ONE token-keyed
    * aggregate), with cumulative sums and the type–token ratio over
    * the bounded k-row frame. All integer; ttr_bp = vocab·10⁴ DIV
    * tokens.
    *
    * Output: one row per batch — batch, n_docs, n_tokens, new_types,
    * docs_cum, tokens_cum, vocab_cum, ttr_bp. Scale shape: the
    * token-keyed first-seen aggregate is the one data-sized shuffle
    * (the vocabRichness cost); the curve windows run on the bounded
    * k-row frame (the scoreHistCum bounded-global-window idiom).
    */
  def heapsCurve(docs: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"bad buckets: $buckets")
    val maxId = docs.agg(max(col("doc_id")).as("max_id"))
    val based = docs
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .crossJoin(broadcast(maxId))
      .select(expr(s"(doc_id * $buckets) DIV (max_id + 1)").as("b"),
        col("text"))
      .localCheckpoint() // consumed by the doc count and the token path
    val toks = based.select(col("b"), explode(tokens(col("text")))
      .as("token"))
      .localCheckpoint() // consumed by the mass count and first-seen
    val perB = based.groupBy(col("b")).agg(count(lit(1)).as("n_docs"))
    val tokB = toks.groupBy(col("b")).agg(count(lit(1)).as("n_tokens"))
    val firstB = toks.groupBy(col("token")).agg(min(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("new_types"))
    val wc = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perB.join(tokB, "b").join(firstB, Seq("b"), "left")
      .select(col("b").as("batch"), col("n_docs"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("docs_cum", sum(col("n_docs")).over(wc))
      .withColumn("tokens_cum", sum(col("n_tokens")).over(wc))
      .withColumn("vocab_cum", sum(col("new_types")).over(wc))
      .withColumn("ttr_bp",
        when(col("tokens_cum") > 0,
          expr("(vocab_cum * 10000) DIV tokens_cum")))
      .orderBy(col("batch"))
  }

  /** Per-window language segmentation — code-switching detection over
    * [[languageId]]'s marker heuristic (transform.py:1's per-doc text
    * column, extended to the intra-document structure an LLM-corpus
    * cleaner needs: a doc whose halves disagree on language is a
    * different cleaning problem than a monolingual one). The token
    * stream is cut into fixed `window`-token segments, each segment is
    * classified independently with the SAME marker scoring and argmax
    * tie-break as the doc-level classifier, and the per-doc report
    * carries the segment sequence plus its switch structure:
    *
    *   - `seg_langs`   — comma-joined per-segment predictions, in order
    *     (a STRING, not an array — the driver comparator sorts columns
    *     with pandas, which throws on array cells)
    *   - `n_switches`  — adjacent segment pairs that disagree
    *   - `n_langs`     — distinct predicted languages across segments
    *   - `major_lang`  — argmax of segment votes, ties to the first
    *     language in `markers` order (the doc-level tie-break, applied
    *     to votes)
    *   - `is_code_switched` — n_langs > 1
    *
    * Scale shape: ONE narrow projection over the scan — segmentation,
    * per-segment scoring, switch counting, and the vote argmax are all
    * higher-order array functions over lambda-bound variables, so the
    * whole operator runs at scan speed with zero exchanges and no
    * per-row state beyond the token array. Docs with empty text (no
    * tokens) are excluded, mirroring the oracle's WHERE.
    */
  def langSegments(docs: DataFrame, markers: Seq[(String, Seq[String])],
      window: Int): DataFrame = {
    require(markers.nonEmpty && window > 0)
    val langs = typedLit(markers.map(_._1))
    val sets = typedLit(markers.map(_._2))
    val zeros = typedLit(Seq.fill(markers.size)(0L))
    // one segment's argmax: the predictedLangOnePass fold, applied to a
    // lambda-bound slice instead of the whole token array
    def segLang(seg: Column): Column = aggregate(
      seg, zeros,
      (acc, x) => zip_with(acc, sets, (cnt, set) =>
        cnt + when(array_contains(set, x), 1L).otherwise(0L)),
      acc => element_at(langs, array_position(acc, array_max(acc)).cast("int")))
    docs
      // split("", " ") is [""], not [] — gate on the raw text so an
      // empty doc is excluded rather than scored as one empty segment
      .where(length(col("text")) >= 1)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_segments",
        expr(s"(n_tokens + ${window - 1}) DIV $window"))
      .withColumn("segl", transform(
        sequence(lit(0), (col("n_segments") - 1).cast("int")),
        i => segLang(slice(col("toks"), i * window + 1, lit(window)))))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"), col("n_segments"),
        array_join(col("segl"), ",").as("seg_langs"),
        // sequence() DESCENDS when start > stop, so nseg = 1 must not
        // reach it — guard rather than rely on an empty range
        when(col("n_segments") > 1,
          size(filter(
            transform(sequence(lit(1), (col("n_segments") - 1).cast("int")),
              i => element_at(col("segl"), i) =!=
                element_at(col("segl"), i + 1)),
            x => x))).otherwise(0).cast("long").as("n_switches"),
        size(array_distinct(col("segl"))).cast("long").as("n_langs"),
        aggregate(col("segl"), zeros,
          (acc, l) => zip_with(acc, langs, (cnt, lg) =>
            cnt + when(l === lg, 1L).otherwise(0L)),
          acc => element_at(langs,
            array_position(acc, array_max(acc)).cast("int")))
          .as("major_lang"),
        (size(array_distinct(col("segl"))) > 1).as("is_code_switched"))
  }

  def corpusDivergence(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(tokens(col("text"))).as("token"))
    // the slim (source, token, count) table feeds FOUR consumers (the
    // contribution join, corpus counts, per-source totals, the grand
    // total) — materialize it once so the corpus is scanned and the
    // token explode paid exactly once, not per consumer
    val st = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_s"))
      .localCheckpoint()
    val ct = st.groupBy(col("token")).agg(sum(col("c_s")).as("c"))
    val ns = st.groupBy(col("source"))
      .agg(sum(col("c_s")).as("n_s"), count(lit(1)).as("n_terms"))
    val nt = st.agg(sum(col("c_s")).as("n_total"))
    st
      .join(ct, "token")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nt))
      .select(col("source"), col("n_s"), col("n_terms"),
        floor((col("c_s").cast("double") / col("n_s")) *
          log((col("c_s").cast("double") * col("n_total")) /
            (col("n_s").cast("double") * col("c"))) * 1000000.0 + 0.5)
          .cast("long").as("kl_c"))
      .groupBy(col("source"), col("n_s"), col("n_terms"))
      .agg(sum(col("kl_c")).as("kl_u"))
      .select(col("source"), col("n_s").as("n_tokens"),
        col("n_terms"), col("kl_u"))
  }
}
