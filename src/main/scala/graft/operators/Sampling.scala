package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines. Everything is keyed on a content/id hash — no RNG state, so
  * results are identical across runs, executors, and retries (rerunning a
  * failed partition yields the same sample), and a document always lands
  * in the same split even as the corpus grows.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Per-group quality-quantile gate: keep rows whose score is at or above
    * their group's exact q-quantile. Two-phase plan built for scale: the
    * per-group quantiles are a tiny aggregate (one row per group) that is
    * BROADCAST back onto the scan — the big side never shuffles. Exact
    * `percentile` matches DuckDB's quantile_cont interpolation bit-for-bit
    * (both do linear interpolation at (n-1)*q over doubles).
    */
  def quantileGate(df: DataFrame, groupCol: String, scoreCol: String,
      q: Double): DataFrame = {
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($scoreCol, $q)").as("cut"))
    df.join(broadcast(cuts), groupCol)
      .where(col(scoreCol) >= col("cut"))
  }

  /** Uniform hash bucket in [0, 1) for a key column. */
  def hashFraction(key: Column): Column =
    pmod(xxhash64(key), lit(Buckets)).cast("double") / Buckets

  /** Keep ~fraction of rows, selected by key hash. */
  def hashSample(df: DataFrame, key: String, fraction: Double): DataFrame =
    df.where(hashFraction(col(key)) < fraction)

  /** Deterministic train/validation/test split: returns one DataFrame per
    * weight, partitioning the hash space proportionally. Weights need not
    * sum to 1 (they are normalized).
    */
  def split(df: DataFrame, key: String, weights: Seq[Double]): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "positive weights")
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _ / total)
    val frac = hashFraction(col(key))
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.where(frac >= lo && frac < (if (hi >= 1.0) 1.01 else hi))
    }.toSeq
  }

  /** Stratified sample: per-stratum fractions, still hash-deterministic.
    * Strata absent from `fractions` are dropped (sampleBy semantics).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, key: String,
      fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(-1.0)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, lit(f)).otherwise(acc)
    }
    df.where(hashFraction(col(key)) < frac)
  }

  /** Token-budget downsampling: resample each group (source/domain) to a
    * target TOKEN budget, not a row count — the knob a training-data mix
    * actually turns (DoReMi-style static domain weights). Per-group token
    * totals are a tiny aggregate; the keep-rate (budget/total, capped at
    * 1) is broadcast back onto the scan and membership is decided by the
    * portable base-257 id fold in basis points — deterministic, engine-
    * replayable, stable under retries and corpus growth. The corpus never
    * shuffles: one pass for totals, one filtered pass for the sample.
    */
  def tokenBudgetKeep(df: DataFrame, groupCol: String, tokenCol: String,
      idCol: String, budgets: Seq[(String, Long)], defaultBudget: Long): DataFrame = {
    val budget = budgets.foldRight(lit(defaultBudget)) { case ((g, b), elseCol) =>
      when(col(groupCol) === g, lit(b)).otherwise(elseCol)
    }
    val rates = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("total_tokens"))
      .withColumn("budget", budget)
      .withColumn("keep_bp",
        floor(least(lit(1.0), col("budget").cast("double") / col("total_tokens"))
          * 10000.0 + 0.5).cast("long"))
    val bucket = pmod(
      org.apache.spark.sql.graftnative.RollingHash.rollingHash(
        concat(lit("budget:"), col(idCol).cast("string"))),
      lit(10000L))
    df.join(broadcast(rates), groupCol).where(bucket < col("keep_bp"))
  }

  /** Training-mix plan: apportion a global token budget across groups by
    * integer weights and report, per group, its target token mass and the
    * oversampling factor ("epochs", in basis points) needed to hit it —
    * the static domain-reweighting table (DoReMi-style) a training run
    * consumes. All arithmetic on the k-row totals frame is integer or
    * single-division double, so the plan is engine-portable. Two tiny
    * aggregates + one broadcast; the corpus is scanned once.
    */
  /** Discrete EPOCH / repetition plan under a token budget — the
    * data-constrained-scaling schedule ([[mixPlan]] answers "what
    * fraction of each source", THIS answers "how many times may each
    * source REPEAT when the budget exceeds the unique corpus" — the
    * Muennighoff et al. 2023 regime every under-data over-compute
    * training run lives in): whole epochs are granted greedily in
    * (epoch ASC, priority DESC, group ASC) order — every source earns
    * epoch 1 before any source earns epoch 2 (repetition has
    * diminishing returns, so breadth beats depth), higher-priority
    * sources win ties within an epoch round — while the running token
    * total stays within `budget`, with a hard per-source `maxEpochs`
    * repetition cap. The greedy fold is ONE cumulative-sum window over
    * the bounded |groups|·maxEpochs grant frame (explicit single
    * partition — the bounded-input idiom), so the whole plan replays
    * as plain SQL: no recursion, no driver loop.
    *
    * The budget is expressed RELATIVE to the unique corpus —
    * `budgetBp` basis points of the total token count (33700 = "we
    * have compute for 3.37 epochs of the whole corpus"), derived
    * in-plan from a 1-row broadcast so the plan is scale-invariant
    * and needs no driver-side collect.
    *
    * Output: one row per group with epochs > 0 — priority,
    * total_tokens (one epoch's cost), epochs, tokens_used
    * (= epochs·total_tokens; Σ tokens_used ≤ budget by construction:
    * the kept grants are the maximal PREFIX of the canonical order
    * whose monotone running total fits). Groups with zero granted
    * epochs are absent. Scale shape: the corpus scan collapses to the
    * |groups| totals frame first; everything after is bounded-frame
    * arithmetic.
    */
  def epochPlan(df: DataFrame, groupCol: String, tokenCol: String,
      priority: Column, budgetBp: Long, maxEpochs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetBp >= 0L, s"budgetBp must be >= 0, got $budgetBp")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("total_tokens"),
        max(priority).cast("long").as("priority"))
      .where(col("total_tokens") > 0)
      .localCheckpoint() // |groups| frame, two consumers
    val budget = totals
      .agg(expr(s"(sum(total_tokens) * $budgetBp) DIV 10000")
        .as("budget"))
    val grants = totals
      .select(col(groupCol), col("priority"), col("total_tokens"),
        explode(expr(s"sequence(1, $maxEpochs)")).as("epoch"))
    val order = Window.partitionBy(lit(1))
      .orderBy(col("epoch").asc, col("priority").desc,
        col(groupCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grants
      .withColumn("cum_tokens", sum(col("total_tokens")).over(order))
      .crossJoin(broadcast(budget))
      .where(col("cum_tokens") <= col("budget"))
      .groupBy(col(groupCol), col("priority"), col("total_tokens"))
      .agg(max(col("epoch")).cast("long").as("epochs"),
        sum(col("total_tokens")).as("tokens_used"))
      .orderBy(col(groupCol))
  }

  def mixPlan(df: DataFrame, groupCol: String, tokenCol: String,
      weights: Seq[(String, Int)], defaultWeight: Int,
      totalBudget: Long): DataFrame = {
    val weight = weights.foldRight(lit(defaultWeight)) { case ((g, wt), e) =>
      when(col(groupCol) === g, lit(wt)).otherwise(e)
    }
    // the totals frame is |groups| rows but TWO consumers (the plan and
    // the weight-sum) — materialize it so the corpus scan happens once,
    // as the doc promises (the plan audit showed two parquet scans)
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("total_tokens"))
      .withColumn("weight", weight.cast("long"))
      .localCheckpoint()
    val wsum = totals.agg(sum(col("weight")).as("weight_sum"))
    totals.crossJoin(broadcast(wsum))
      .withColumn("target_tokens",
        floor((lit(totalBudget) * col("weight")).divide(col("weight_sum")))
          .cast("long"))
      .withColumn("epochs_bp",
        floor(col("target_tokens").cast("double") / col("total_tokens")
          * 10000.0 + 0.5).cast("long"))
      .select(col(groupCol), col("weight"), col("total_tokens"),
        col("target_tokens"), col("epochs_bp"))
  }

  /** Temperature-scaled mix plan — the data-derived dual of [[mixPlan]]'s
    * user-supplied weights: each group's sampling weight is its token
    * mass raised to temperature α (the multilingual-LM rebalancing rule,
    * Conneau et al. XLM-R: low-resource groups get boosted, high-resource
    * capped). α is FIXED at 1/2 because sqrt is the one power IEEE 754
    * requires correctly rounded — `pow(x, 0.3)` differs by ULPs across
    * libm implementations and would break hash-exact replay, so the
    * weight is `floor(sqrt(tokens)·10⁶ + 0.5)` (identical longs on any
    * engine) and every share/target after that is integer arithmetic:
    * `target = (budget · w) DIV Σw` in decimal(38,0)/HUGEINT.
    * Output per group: token mass, micro-unit weight, target tokens,
    * oversampling factor in bp — bounded rows, corpus scanned once.
    */
  def temperatureMixPlan(df: DataFrame, groupCol: String, tokenCol: String,
      totalBudget: Long): DataFrame = {
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).as("total_tokens"))
      .withColumn("w_micro",
        floor(sqrt(col("total_tokens").cast("double")) * 1000000.0 + 0.5)
          .cast("long"))
      .localCheckpoint() // two consumers; one corpus scan (mixPlan's rule)
    val wsum = totals.agg(sum(col("w_micro")).as("w_sum"))
    totals.crossJoin(broadcast(wsum))
      .withColumn("target_tokens",
        expr(s"CAST((CAST($totalBudget AS DECIMAL(38,0)) * w_micro) DIV " +
          "CAST(w_sum AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("epochs_bp",
        floor(col("target_tokens").cast("double") /
          col("total_tokens").cast("double") * 10000.0 + 0.5).cast("long"))
      .select(col(groupCol), col("total_tokens"), col("w_micro"),
        col("target_tokens"), col("epochs_bp"))
      .orderBy(col(groupCol))
  }

  /** Per-domain document cap: keep at most `cap` docs per source, by the
    * deterministic priority (n_chars DESC, doc_id ASC) — the "max N pages
    * per domain" rule every web-corpus pipeline applies so one crawler-happy
    * domain cannot dominate the training mix.
    *
    * Skew-safe two-phase top-N: phase 1 ranks within (source,
    * input-partition), so a mega-domain's rows spread over all reducers and
    * at most cap x num_partitions rows per domain survive; phase 2 ranks
    * that bounded set globally per source. The result equals a single
    * global row_number (the priority order is total, and any doc in a
    * domain's global top-cap is in the top-cap of every subset containing
    * it), but no reducer ever sees a whole hot domain.
    */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = Seq(col("n_chars").desc, col("doc_id").asc)
    val local = Window.partitionBy(col("source"), col("part")).orderBy(pri: _*)
    val global = Window.partitionBy(col("source")).orderBy(pri: _*)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(local))
      .where(col("lr") <= cap)
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= cap)
      .select(col("doc_id"), col("source"), col("n_chars"), col("rank"))
  }

  /** Deterministic shard plan — the write side of training-shard
    * production. Every doc lands in shard pmod(fold("shard:" + doc_id),
    * nShards) and is ordered within its shard by a second salted fold:
    * a deterministic "global shuffle" with no RNG state, so a retried or
    * resumed writer reproduces byte-identical shards. The manifest row per
    * shard carries the doc/token/char mass (shard-balance audit) and an
    * order-sensitive fingerprint (md5 over the ordered doc_id sequence)
    * that a resumed run checks before appending.
    *
    * 100 TB posture: one groupBy on the shard key (the same exchange the
    * physical write's repartition(shard) pays anyway); the fingerprint
    * concatenates ids, not text, so the aggregate state per shard is
    * O(docs-per-shard * ~10 bytes). The actual write is
    * `repartition(nShards, shard).sortWithinPartitions(ord)` — this plan
    * is its audit twin.
    */
  def shardPlan(docs: DataFrame, nShards: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val shard = pmod(
      rollingHash(concat(lit("shard:"), col("doc_id").cast("string"))),
      lit(nShards.toLong))
    val ord = rollingHash(concat(lit("order:"), col("doc_id").cast("string")))
    docs
      .select(col("doc_id"), shard.as("shard"), ord.as("ord"),
        size(org.apache.spark.sql.functions.split(col("text"), " "))
          .cast("long").as("n_tokens"),
        col("n_chars"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("ord"), col("doc_id")))),
          s => s.getField("doc_id").cast("string")), " ")).as("order_fp"))
  }

  /** Deterministic per-group k-sample: exactly min(k, |group|) docs per
    * group, chosen by the salted portable fold (hash order ~ uniform
    * random, but reproducible across runs, engines, and corpus
    * repartitioning) — how an eval slice or human-review batch is pulled
    * from each domain without RNG state.
    *
    * Skew-safe like domainCap: phase 1 ranks within (group,
    * input-partition) so a dominant group spreads over all reducers;
    * phase 2 ranks the <= k * num_partitions survivors globally. The
    * (fold, doc_id) priority is total, so the result equals a single
    * global rank.
    */
  def groupSample(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val ord = rollingHash(concat(lit("gsample:"), col("doc_id").cast("string")))
    val pri = Seq(col("ord").asc, col("doc_id").asc)
    val local = Window.partitionBy(col(groupCol), col("part")).orderBy(pri: _*)
    val global = Window.partitionBy(col(groupCol)).orderBy(pri: _*)
    docs.select(col("doc_id"), col(groupCol))
      .withColumn("ord", ord)
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(local))
      .where(col("lr") <= k)
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col(groupCol), col("rank"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): select the k raw documents whose hashed-n-gram distribution
    * looks most like a small curated TARGET set, by importance weight
    * p_target(x)/p_raw(x) under bag-of-hashed-grams models, resampled
    * without replacement via the Gumbel top-k trick. This is the
    * data-selection stage that turns a web-scale crawl into a
    * domain-matched pretraining corpus.
    *
    * Features: unigrams + bigrams hashed by the salted base-257 portable
    * fold into `buckets` cells (the paper's hashed n-gram features).
    * Both models are Laplace-smoothed bucket multinomials; per-feature
    * log-ratio weights are quantized to integer micro-units the moment
    * they leave ln (the lmScore/nbQuality rule), so per-doc totals are
    * exact longs. The Gumbel noise g_i = -ln(-ln(u_i)) uses u_i from the
    * salted fold of the doc id — deterministic, engine-replayable, and
    * independent of the weight fold — and is micro-quantized the same
    * way; selection keeps the k largest (logw_u + g_u), ties toward the
    * lower doc_id.
    *
    * Scale shape: training is ONE bounded conditional-count aggregate (at
    * most `buckets` rows regardless of corpus size, map-side combined)
    * collected to a `buckets`-entry literal weight array — the same
    * bounded-driver-state pattern as the BPE merge table; scoring is then
    * a PURE PROJECTION at scan speed (native DsirScore: one primitive
    * loop per doc over memoized token folds — no gram explode, no join,
    * no per-doc shuffle; text never leaves the scan); selection is a
    * TakeOrdered global top-k (per-partition partial top-k, no full sort)
    * over the slim (doc_id, key) projection, with the k winners broadcast
    * back as the `selected` flag. Corpus touched twice (model pass +
    * scoring pass), shuffled only for the `buckets`-row model aggregate.
    */
  def dsirSelect(docs: DataFrame, target: Column, buckets: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.DsirHash.{dsirBuckets, dsirScore}
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val toks = TextAnalysis.tokens(col("text"))
    // n_feats (unigrams + bigrams) derives from the token count alone
    val nFeats = (size(toks) + greatest(size(toks) - 1, lit(0))).cast("long")
    // model pass: one conditional-count aggregate over the native gram
    // bucket ids, <= `buckets` rows — bounded driver state however large
    // the corpus
    val counts = docs
      .select(target.as("is_target"),
        explode(dsirBuckets(toks, buckets.toLong)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"), count(when(col("is_target"), 1)).as("ct"))
      .collect()
    val nRaw = counts.map(_.getLong(1)).sum
    val nTgt = counts.map(_.getLong(2)).sum
    // per-bucket integer micro-unit weight; same double ops as the SQL
    // formulation (java.lang.Math.log on both paths), so the quantized
    // values are bit-identical to the oracle's ln replay. Buckets the raw
    // corpus never populates score nothing by construction.
    val wArr = new Array[Long](buckets)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      val cr = r.getLong(1); val ct = r.getLong(2)
      wArr(b) = math.floor(
        (math.log((ct + 1).toDouble / (nTgt + buckets).toDouble) -
          math.log((cr + 1).toDouble / (nRaw + buckets).toDouble))
          * 1000000.0 + 0.5).toLong
    }
    val gumbel = floor(-log(-log(
        (pmod(rollingHash(concat(lit("dsir:g:"), col("doc_id").cast("string"))),
          lit(1000000L)).cast("double") + 0.5) / 1000000.0))
      * 1000000.0 + 0.5).cast("long")
    val scored = docs
      .select(col("doc_id"), nFeats.as("n_feats"),
        dsirScore(toks, wArr).as("logw_u"))
      .withColumn("g_u", gumbel)
      .withColumn("key_u", col("logw_u") + col("g_u"))
    val winners = scored
      .orderBy(col("key_u").desc, col("doc_id").asc).limit(k)
      .select(col("doc_id"), lit(true).as("sel_m"))
    scored.join(broadcast(winners), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feats"), col("logw_u"), col("g_u"),
        col("key_u"), coalesce(col("sel_m"), lit(false)).as("selected"))
  }

  /** Engine-portable stratified sample: per-stratum keep-percentages over
    * the base-257 id-fold bucket (the same portable hash the corpus-prep
    * split uses), so the sampled set is reproducible in any engine —
    * resampling a corpus to a target language/source mix with an
    * auditable membership rule. `pcts` are integer percents; strata not
    * listed keep `defaultPct`.
    */
  def portableStratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      pcts: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    val pct = pcts.foldRight(lit(defaultPct)) { case ((stratum, p), elseCol) =>
      when(col(stratumCol) === stratum, lit(p)).otherwise(elseCol)
    }
    // salted fold: an unsalted bucket would be the same stream the
    // corpus-prep train/val/test split uses, making every sample at
    // pct <= trainPct a strict subset of the training split
    df.where(graft.pipeline.CorpusPrep.portableBucket(col(idCol), "strat") < pct)
  }
}
