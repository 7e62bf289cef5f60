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

  def prepare(docs: DataFrame, stopwords: Seq[String],
      markers: Seq[(String, Seq[String])], minTokens: Int,
      maxStopwordRatio: Double, trainPct: Int, valPct: Int): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      // quality gate
      .where(col("n_tokens") >= minTokens)
      .withColumn("stopword_ratio",
        TextAnalysis.langScore(col("toks"), stopwords).cast("double") / col("n_tokens"))
      .where(col("stopword_ratio") < maxStopwordRatio)
      // language gate: heuristic ID must agree with the claimed language
      .withColumn("predicted_lang", TextAnalysis.predictedLang(
        markers.map { case (l, ws) => l -> TextAnalysis.langScore(col("toks"), ws) }))
      .where(col("predicted_lang") === col("lang"))
      // token accounting BEFORE the dedup shuffle, so text and the token
      // array can be projected away and the exchange carries a few ints
      // per row instead of whole documents
      .withColumn("bpe_tokens",
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long"))
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
    * plan: length gate -> repetition gate (Gopher dup-3-gram fraction)
    * -> benchmark-decontamination gate (8-gram overlap vs a broadcast
    * benchmark set) -> exact dedup (lowest id per content hash) ->
    * token-budget resample per source. The gram stages run over the
    * corpus once each and join back to the slim (doc_id, source, lang,
    * n_tokens) spine on doc_id; budget keep-rates are computed from the
    * RAW per-source token mass (a slim second scan — at 100 TB you want
    * rate stability across gate tweaks, and it avoids recomputing the
    * gram subtrees for the totals). Returns the per-source survivor
    * summary.
    */
  def prepareModern(docs: DataFrame, benchmark: DataFrame, minTokens: Int,
      maxDupFrac: Double, maxHitRatio: Double,
      budgets: Seq[(String, Long)], defaultBudget: Long): DataFrame = {
    val w = Window.partitionBy(col("text_hash"))
    val spine = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .where(col("n_tokens") >= minTokens)
      .withColumn("text_hash", md5(col("text")))
      .select("doc_id", "lang", "source", "n_tokens", "text_hash")
    val rep = TextAnalysis.repetitionMetrics(docs, n = 3, dupFracCut = maxDupFrac)
      .select(col("doc_id"), col("is_repetitive"))
    val cont = graft.operators.Contamination.decontaminate(docs, benchmark, n = 8)
      .select(col("doc_id"), col("hit_ratio"))
    val survivors = spine
      .join(rep, Seq("doc_id"), "left")
      .where(!coalesce(col("is_repetitive"), lit(false)))
      .join(cont, Seq("doc_id"), "left")
      .where(coalesce(col("hit_ratio"), lit(0.0)) <= maxHitRatio)
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
