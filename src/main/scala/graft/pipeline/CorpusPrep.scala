package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** End-to-end training-corpus preparation — the composed pipeline a
  * 100 TB pretraining-data job runs, as ONE declarative plan:
  *
  *   quality gate -> language gate -> exact dedup (keep lowest id per
  *   content hash) -> token accounting -> deterministic train/val/test
  *   split.
  *
  * Everything is column expressions over one scan plus a single shuffle
  * (the dedup window on the content hash); the split is keyed on a
  * portable content-independent hash of the document id, so a document
  * keeps its split across reruns and corpus growth, and the whole
  * pipeline — being deterministic and engine-agnostic — verifies
  * hash-exact against the DuckDB oracle, stage for stage.
  */
object CorpusPrep {

  /** Split bucket in [0, 100): base-257 rolling fold of the id's decimal
    * string, mod 100 — the portable analog of Sampling.hashFraction
    * (xxhash64 stays the throughput path; this one is replayable in any
    * engine).
    *
    * `salt` selects an independent bucket stream: folds of "salt:id" and
    * "othersalt:id" are uncorrelated, so a sample drawn with one salt is
    * NOT nested inside a split drawn with another. Never reuse one salt
    * for two purposes — `bucket(id) < 25` is by construction a subset of
    * `bucket(id) < 90` from the same stream.
    */
  def portableBucket(id: org.apache.spark.sql.Column,
      salt: String = ""): org.apache.spark.sql.Column = {
    val key =
      if (salt.isEmpty) id.cast("string")
      else concat(lit(s"$salt:"), id.cast("string"))
    pmod(org.apache.spark.sql.graftnative.RollingHash.rollingHash(key), lit(100L))
  }

  /** `bpeTokens` overrides the default regex token-count proxy with a real
    * subword count (see Bpe.tokenCount) — the accounting a production
    * budget is denominated in. None keeps the cheap proxy.
    */
  def prepare(docs: DataFrame, stopwords: Seq[String],
      markers: Seq[(String, Seq[String])], minTokens: Int,
      maxStopwordRatio: Double, trainPct: Int, valPct: Int,
      bpeTokens: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      // quality gate
      .where(col("n_tokens") >= minTokens)
      .withColumn("stopword_ratio",
        TextAnalysis.langScore(col("toks"), stopwords).cast("double") / col("n_tokens"))
      .where(col("stopword_ratio") < maxStopwordRatio)
      // language gate: heuristic ID must agree with the claimed language.
      // One-pass argmax: the unrolled predictedLang(langScore...) form
      // collapses into the Filter as ~30 split(text) re-evaluations per
      // row (this was the r4 bench's slowest query); the single aggregate
      // fold walks the token array once. Same values, same oracle.
      .withColumn("predicted_lang",
        TextAnalysis.predictedLangOnePass(col("toks"), markers))
      .where(col("predicted_lang") === col("lang"))
      // token accounting BEFORE the dedup shuffle, so text and the token
      // array can be projected away and the exchange carries a few ints
      // per row instead of whole documents
      .withColumn("bpe_tokens", bpeTokens.getOrElse(
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")))
      .withColumn("text_hash", md5(col("text")))
      .select("doc_id", "lang", "source", "n_tokens", "bpe_tokens", "text_hash")
      // exact dedup: keep the lowest doc_id per content hash (the ONE
      // shuffle in the pipeline, over slim rows)
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("keep_id"))
      // deterministic split
      .withColumn("bucket", portableBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("bpe_tokens"), col("split"))
  }

  /** The modern pretraining-data pipeline, composed as one declarative
    * plan: length gate -> repetition gate (Gopher dup-3-gram fraction,
    * the native one-pass GramRunStats projection) -> benchmark-
    * decontamination gate (8-gram overlap vs the benchmark gram set
    * collected once and shipped as a literal) -> exact dedup (lowest id
    * per content hash) -> token-budget resample per source.
    *
    * Every gate is a COLUMN on one corpus scan — no per-gate scan, no
    * gram shuffle, no join-back; the only exchange over the corpus is
    * the slim dedup window on the content hash. Budget keep-rates come
    * from the RAW per-source token mass (a slim second scan — at 100 TB
    * you want rate stability across gate tweaks). Returns the
    * per-source survivor summary.
    */
  def prepareModern(docs: DataFrame, benchmark: DataFrame, minTokens: Int,
      maxDupFrac: Double, maxHitRatio: Double,
      budgets: Seq[(String, Long)], defaultBudget: Long): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    val (nG, nH) = graft.operators.Contamination.hitStats(col("text"), benchmark, n = 8)
    val survivors = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") >= minTokens)
      // repetition gate inline: same unrounded dup-fraction comparison as
      // repetitionMetrics; docs with < 3 tokens count as non-repetitive
      .withColumn("st",
        org.apache.spark.sql.graftnative.GramRunStats.gramRunStats(col("toks"), 3))
      .where(!coalesce(
        col("st.dup_gram_cnt").cast("double") / col("st.n_grams") > maxDupFrac,
        lit(false)))
      // contamination gate inline: same 4-dp stable-rounded hit ratio as
      // decontaminate; docs with < 8 space-split tokens count as clean
      .where(coalesce(floor(nH * 10000.0 / nG + 0.5) / 10000.0, lit(0.0))
        <= maxHitRatio)
      .withColumn("text_hash", md5(col("text")))
      .select("doc_id", "lang", "source", "n_tokens", "text_hash")
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("keep_id"))
    val budget = budgets.foldRight(lit(defaultBudget)) { case ((g, b), e) =>
      when(col("source") === g, lit(b)).otherwise(e)
    }
    val rates = docs
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("total_tokens"))
      .withColumn("budget", budget)
      .withColumn("keep_bp",
        floor(least(lit(1.0), col("budget").cast("double") / col("total_tokens"))
          * 10000.0 + 0.5).cast("long"))
      .select(col("source"), col("keep_bp"))
    val bucket = pmod(
      org.apache.spark.sql.graftnative.RollingHash.rollingHash(
        concat(lit("budget:"), col("doc_id").cast("string"))),
      lit(10000L))
    survivors
      .join(broadcast(rates), "source")
      .where(bucket < col("keep_bp"))
      .groupBy(col("source"), col("keep_bp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens_kept"))
  }
}
