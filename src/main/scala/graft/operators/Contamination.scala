package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.RollingHash

/** Training-data contamination analysis: token n-gram overlap against a
  * held-out benchmark set, and cross-document duplicated-span detection
  * (the substring-dedup signal of Lee et al., "Deduplicating Training Data
  * Makes Language Models Better").
  *
  * Both operators key every n-token window by the portable polynomial fold
  * (base-257 mod 1e9+7, native `RollingHash`) so the whole pipeline is
  * replayable in ANSI SQL for the DuckDB oracle, and so raw text never
  * travels through a shuffle — windows are reduced to (doc_id, pos, int64)
  * before any exchange.
  *
  * 100 TB posture:
  *  - decontaminate: the benchmark gram set is small by nature (benchmarks
  *    are fixed corpora), so it is BROADCAST and the corpus side never
  *    shuffles its grams — the only exchange is the final per-doc count.
  *  - dupSpans: two keyed shuffles (gram-frequency groupBy, per-doc
  *    dup-position aggregate) over slim (doc_id, pos, hash) rows; both
  *    partial-aggregate, and the per-doc pass sees dup positions only.
  */
object Contamination {

  /** Positions 1..len-n+1 of `toks`, each mapped to the portable hash of
    * the space-rejoined n-token window — the native one-pass GramHashes
    * expression (bit-identical to the interpreted
    * `transform(sequence(...), i -> RollingHash(array_join(slice(...))))`
    * formulation, which paid a slice + join allocation and a lambda
    * dispatch PER WINDOW). Callers must pre-filter size(toks) >= n (the
    * expression yields null below n tokens).
    */
  private def gramHashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.graftnative.GramHashes.gramHashes(toks, n)

  /** Benchmark decontamination report: for every corpus document sharing at
    * least one distinct n-gram with the benchmark set, the count of
    * overlapping grams and the contamination ratio.
    *
    * Output: (doc_id, n_grams, n_hit, hit_ratio) — hit_ratio stable-rounded
    * to 4 decimals with the floor(x*1e4+0.5) identity (pure IEEE, identical
    * in every engine; `round()` tie behavior is not portable).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    // explode_outer, NOT explode: inner explode triggers
    // InferFiltersFromGenerate, whose `size(arr) > 0 AND isnotnull(arr)`
    // constraint gets substituted through the projection into the scan
    // filter as the FULL gram-hash expression — hashing every document 3x
    // (measured 4x wall-time at 30x replication). Outer explode is exempt
    // from that rule and identical here: the size(toks) >= n filter
    // guarantees non-empty arrays.
    def distinctGrams(df: DataFrame): DataFrame =
      df.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= n)
        .select(col("doc_id"), array_distinct(gramHashes(col("toks"), n)).as("hashes"))

    val benchGrams = distinctGrams(benchmark)
      .select(explode_outer(col("hashes")).as("h")).distinct()

    distinctGrams(corpus)
      .select(col("doc_id"), size(col("hashes")).cast("long").as("n_grams"),
        explode_outer(col("hashes")).as("h"))
      .join(broadcast(benchGrams), "h")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(lit(1)).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        (floor(col("n_hit") * 10000.0 / col("n_grams") + 0.5) / 10000.0)
          .as("hit_ratio"))
  }

  /** Streaming-shaped decontamination: the benchmark's distinct gram
    * hashes are collected ONCE at plan-build time (benchmark suites are
    * tiny next to the corpus — this is the broadcast a production run
    * ships to every executor) and the per-document overlap becomes a pure
    * projection: array_intersect against the literal set, no join, no
    * aggregation, no state. Because it is stateless it runs unchanged
    * over a batch frame or a readStream source — the streaming dual of
    * `decontaminate`, gating documents at ingest time. Emits every doc
    * (n_hit = 0 for clean ones), unlike the batch report which only
    * lists contaminated docs.
    */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val (nGrams, nHit) = hitStats(col("text"), benchmark, n)
    docs
      .select(col("doc_id"), nGrams.as("n_grams"), nHit.as("n_hit"))
      .where(col("n_grams").isNotNull)
      .withColumn("hit_ratio",
        floor(col("n_hit") * 10000.0 / col("n_grams") + 0.5) / 10000.0)
  }

  /** Per-ROW contamination columns (distinct-gram count, benchmark-hit
    * count) against a benchmark gram set collected once at plan-build
    * time — the projection-only primitive behind decontaminateStream,
    * exposed so composed pipelines (CorpusPrep.prepareModern) can fuse
    * the contamination gate into an existing corpus scan instead of
    * paying a second scan + gram shuffle + join. Both columns are null
    * when the doc has fewer than n space-split tokens (callers decide:
    * filter, or coalesce to "clean").
    */
  def hitStats(textCol: org.apache.spark.sql.Column, benchmark: DataFrame,
      n: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    // NOT array_intersect(hashes, lit(bench)): ArrayIntersect rebuilds a
    // hash set of the k-element literal on EVERY row. GramSetStats hashes
    // the row's windows once and binary-searches one sorted copy of the
    // benchmark set shared across the whole scan.
    val st = org.apache.spark.sql.graftnative.GramSetStats
      .gramSetStats(split(textCol, " "), n, benchGramHashes(benchmark, n))
    (st.getField("n_grams"), st.getField("n_hit"))
  }

  /** The benchmark's distinct gram hashes, collected once at plan-build
    * time — the broadcast payload of the scan-shaped decontamination
    * variants.
    */
  private def benchGramHashes(benchmark: DataFrame, n: Int): Array[Long] =
    benchmark
      .select(split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(explode_outer(array_distinct(gramHashes(col("toks"), n))).as("h"))
      .distinct().collect().map(_.getLong(0))

  /** Bloom-filter decontamination: the benchmark gram set is folded into an
    * m-bit Bloom filter (k probes per gram, GramBloomStats' double-hash
    * arithmetic) and every document is gated by a pure projection that
    * probes the filter per distinct window hash.
    *
    * This is the 100 TB shape of `decontaminateStream`: the exact sorted
    * set grows with the benchmark union (8 bytes per distinct gram — a
    * multi-benchmark suite of 10^8 grams is an 800 MB broadcast), while
    * the Bloom filter is m/8 bytes FOREVER (m=2^20 -> 128 KiB) at a
    * false-positive rate of ~(1-e^(-kn/m))^k and zero false negatives —
    * flagged docs go to the exact recheck, clean docs (the overwhelming
    * majority) are certified clean by the filter alone. Emits every doc
    * with >= n tokens: (doc_id, n_grams, n_hit, hit_ratio), where n_hit
    * counts POSSIBLE hits (distinct grams whose k bits are all set).
    */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame, n: Int,
      mBits: Int, kProbes: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.GramBloomStats
    val words = new Array[Long](mBits / 64)
    benchGramHashes(benchmark, n).foreach { h =>
      GramBloomStats.bitPositions(h, mBits, kProbes).foreach { b =>
        words(b >>> 6) |= 1L << (b & 63)
      }
    }
    val st = GramBloomStats.gramBloomStats(
      split(col("text"), " "), n, mBits, kProbes, words)
    docs
      .select(col("doc_id"), st.getField("n_grams").as("n_grams"),
        st.getField("n_hit").as("n_hit"))
      .where(col("n_grams").isNotNull)
      .withColumn("hit_ratio",
        floor(col("n_hit") * 10000.0 / col("n_grams") + 0.5) / 10000.0)
  }

  /** Bloom FPR CALIBRATION: the measured false-positive rate of the
    * [[decontaminateBloom]] gate against exact gram membership on the
    * SAME corpus and benchmark — the trust contract for sizing (m, k)
    * before a 100 TB run routes its recheck traffic through the filter
    * (the gram-gate member of the calibration family: 16g/17c/21k/21l).
    * One bounded row: probe/hit/false-positive totals (all exact
    * integer sums), the measured FPR in bp over the truly-clean probes,
    * and the count of docs false-flagged into the exact recheck
    * (bloom-possible hits but zero true hits — the wasted recheck
    * volume the FPR actually costs). Bloom has zero false negatives by
    * construction, so n_bloom >= n_exact per doc and the subtraction
    * never goes negative.
    *
    * Scale shape: both gates are pure projections over one corpus scan
    * each + a broadcast; the join is doc_id-keyed on the gate outputs
    * (2 slim columns), the aggregate is ONE row.
    */
  def bloomCalibration(docs: DataFrame, benchmark: DataFrame, n: Int,
      mBits: Int, kProbes: Int): DataFrame = {
    val bloom = decontaminateBloom(docs, benchmark, n, mBits, kProbes)
      .select(col("doc_id"), col("n_grams"), col("n_hit").as("n_bloom"))
    val exact = decontaminate(docs, benchmark, n)
      .select(col("doc_id"), col("n_hit").as("n_exact"))
    bloom.join(exact, Seq("doc_id"), "left")
      .select(col("n_grams"), col("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("n_probes"),
        sum(col("n_exact")).as("n_true_hits"),
        sum(col("n_bloom")).as("n_bloom_hits"),
        (sum(col("n_bloom")) - sum(col("n_exact"))).as("n_false_pos"),
        floor((sum(col("n_bloom")) - sum(col("n_exact"))) * 10000.0 /
          (sum(col("n_grams")) - sum(col("n_exact"))) + 0.5).cast("long")
          .as("fpr_bp"),
        count(when(col("n_bloom") > 0 && col("n_exact") === 0, 1))
          .as("n_docs_false_flagged"))
  }

  /** Duplicated-span REMOVAL with keep-first semantics (the actionable
    * half of Lee et al.'s substring dedup): an n-token window whose hash
    * occurs in >= 2 distinct documents survives only in the lowest
    * doc_id containing it; every token covered by a scrubbed window is
    * dropped and the document re-joined. Emits every document:
    * (doc_id, clean_text, n_kept, n_removed).
    *
    * 100 TB posture: gram work is the native scan-speed projection; the
    * frequency pass and the per-doc start-list aggregate shuffle slim
    * (doc_id, pos, int64) rows; raw text travels exactly once, into the
    * final doc_id-keyed join with its own start list; reconstruction is
    * the one-sweep native ScrubTokens — no exploded-token shuffle.
    */
  def scrubDupSpans(docs: DataFrame, n: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode_outer(gramHashes(col("toks"), n)).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))

    // per-doc distinct map-side (array_distinct before explode), so count
    // = distinct-doc count and min = lowest doc containing the hash
    val dupHashes = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode_outer(array_distinct(gramHashes(col("toks"), n))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
      .where(col("n_docs") >= 2)
      .select(col("h"), col("keep_doc"))

    val dupStarts = grams.join(dupHashes, Seq("h"))
      .where(col("doc_id") =!= col("keep_doc"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("int"))).as("dup_starts"))

    val scrubbed = org.apache.spark.sql.graftnative.ScrubTokens.scrubTokens(
      split(col("text"), " "),
      coalesce(col("dup_starts"), typedLit(Array.empty[Int])), n)
    docs.select(col("doc_id"), col("text"))
      .join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), scrubbed.as("s"))
      .select(col("doc_id"), col("s.clean_text").as("clean_text"),
        col("s.n_kept").as("n_kept"), col("s.n_removed").as("n_removed"))
  }

  /** Cross-document duplicated-span report: an n-token window is "dup" when
    * its hash occurs in >= 2 distinct documents; a span is a maximal run of
    * consecutive dup positions. Output per document with at least one dup
    * window: (doc_id, n_windows, n_dup_windows, n_spans, dup_ratio).
    *
    * Span counting aggregates ONLY the dup positions: the dup-hash join is
    * inner, so clean windows (the overwhelming majority of a real corpus)
    * never reach the per-doc aggregate, and the maximal-run count is a
    * per-doc fold over that small sorted list. The earlier formulation
    * lag-windowed EVERY position (a full-corpus sort exchange) to learn
    * what the sorted dup list already says. `n_windows` rides along on the
    * gram rows as size(toks)-n+1 — recomputed from the doc, not counted.
    */
  def dupSpans(docs: DataFrame, n: Int): DataFrame = {
    // posexplode_outer for the same InferFiltersFromGenerate reason as in
    // decontaminate: the inner form re-evaluates the gram pipeline inside
    // an inferred scan filter.
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), (size(col("toks")) - n + 1).cast("long").as("n_windows"),
        posexplode_outer(gramHashes(col("toks"), n)).as(Seq("pos0", "h")))
      .select(col("doc_id"), col("n_windows"), (col("pos0") + 1).as("pos"), col("h"))

    // dup detection needs "h in >= 2 distinct docs": dedup the hashes
    // PER DOC map-side (array_distinct before the explode) so a plain
    // count equals the distinct-doc count — one exchange instead of the
    // two a countDistinct plans, and the explode emits each (doc, h)
    // once instead of once per position.
    val dupHashes = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(explode_outer(array_distinct(gramHashes(col("toks"), n))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= 2)
      .select(col("h"))

    val perDoc = grams.join(dupHashes, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(first(col("n_windows")).as("n_windows"),
        sort_array(collect_list(col("pos").cast("int"))).as("dup_pos"))

    // runs in the sorted dup list: 1 + count of gaps (next != prev+1);
    // the HOF runs over dup positions only, not the whole document
    val arr = col("dup_pos")
    val nSpans = (size(filter(
      zip_with(slice(arr, lit(2), size(arr) - 1), slice(arr, lit(1), size(arr) - 1),
        (cur, prev) => cur =!= prev + 1),
      x => x)) + 1).cast("long")

    perDoc.select(col("doc_id"), col("n_windows"),
      size(arr).cast("long").as("n_dup_windows"), nSpans.as("n_spans"),
      (floor(size(arr) * 10000.0 / col("n_windows") + 0.5) / 10000.0)
        .as("dup_ratio"))
  }

  /** MAXIMAL duplicated spans with exact extents — the suffix-array
    * output of Lee et al.'s exact substring dedup in its union form: one
    * row per maximal cross-document duplicated substring occurrence,
    * with its start position and its token length (ARBITRARY length >= n,
    * not the fixed window size; a 37-token shared prefix reports as one
    * 37-token span). A maximal duplicated substring of length m covers
    * exactly the m-n+1 consecutive duplicated n-gram windows, so maximal
    * runs in the per-doc sorted dup-position list ARE the maximal spans —
    * no suffix sorting, no pairwise extension: the same two linear
    * shuffles as dupSpans (gram hash count + slim join back), then a
    * per-doc HOF fold over dup positions only. Output is one row per
    * span — linear in duplicated content, where the true per-pair
    * suffix-array report goes quadratic on replica clusters.
    */
  def maxDupSpans(docs: DataFrame, n: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode_outer(gramHashes(col("toks"), n)).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
    val dupHashes = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(explode_outer(array_distinct(gramHashes(col("toks"), n))).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= 2)
      .select(col("h"))
    val perDoc = grams.join(dupHashes, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("int"))).as("dup_pos"))
    // run boundaries in the sorted dup list: index i starts a run when
    // arr(i) != arr(i-1)+1, ends one when arr(i+1) != arr(i)+1; the k-th
    // start pairs with the k-th end (runs are disjoint and ordered)
    val arr = col("dup_pos")
    val idx = sequence(lit(1), size(arr))
    val starts = filter(idx, i =>
      (i === 1) || (element_at(arr, i) =!= element_at(arr, i - 1) + 1))
    val ends = filter(idx, i =>
      (i === size(arr)) || (element_at(arr, i + 1) =!= element_at(arr, i) + 1))
    perDoc
      .select(col("doc_id"),
        explode(zip_with(starts, ends, (si, ei) => struct(
          element_at(arr, si).cast("long").as("span_start"),
          (ei - si + 1).cast("long").as("span_windows"),
          (ei - si + n).cast("long").as("span_tokens")))).as("sp"))
      .select(col("doc_id"), col("sp.span_start"), col("sp.span_windows"),
        col("sp.span_tokens"))
  }

  /** PER-PAIR maximal duplicated-span extents — the diagnostic sibling of
    * [[maxDupSpans]]: WHICH two documents share WHICH maximal span. One
    * row per (doc pair, maximal shared substring occurrence):
    * (doc_a, doc_b, start_a, start_b, span_windows, span_tokens).
    *
    * Construction: two occurrences of the same n-gram hash in different
    * docs at positions (pa, pb) extend to a shared run exactly while both
    * advance in lockstep, i.e. along a constant DIAGONAL pa - pb — so
    * maximal shared extents are maximal consecutive-pos_a runs within a
    * (doc_a, doc_b, diagonal) group, the same sorted-run fold as
    * [[maxDupSpans]], no suffix sorting and no pairwise re-scan of text.
    *
    * Output discipline: pair listings are output-bound ONLY under a
    * hotness cap — a gram occurring in a k-replica cluster yields
    * C(k, 2) pair rows, so a gram is eligible only while its TOTAL
    * occurrence count is <= maxOcc (and >= 2 distinct docs). Hot grams
    * (boilerplate, replica cliques) are excluded by construction — their
    * mass is exactly what [[maxDupSpans]]' union form and exact dedup
    * already report; this query is the targeted who-shares-what listing
    * for the sparse tail. Shuffles stay linear: one gram-frequency
    * aggregate, one bucketed self-join on eligible hashes (bucket size
    * <= maxOcc), one pair-diagonal aggregate.
    */
  def pairDupSpans(docs: DataFrame, n: Int, maxOcc: Int): DataFrame = {
    // slim (doc_id, pos, h) occurrence table, staged once: consumed by
    // the eligibility aggregate and BOTH sides of the pair self-join
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode_outer(gramHashes(col("toks"), n)).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
      .localCheckpoint()
    val eligible = grams
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= 2 && col("n_occ") <= maxOcc)
      .select(col("h"))
    val occ = grams.join(eligible, Seq("h"))
    val pairs = occ.as("x").join(occ.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.pos").as("pos_a"), col("y.pos").as("pos_b"))
    val perDiag = pairs
      .groupBy(col("doc_a"), col("doc_b"), (col("pos_a") - col("pos_b")).as("diag"))
      .agg(sort_array(collect_list(col("pos_a").cast("int"))).as("ps"))
    val arr = col("ps")
    val idx = sequence(lit(1), size(arr))
    val starts = filter(idx, i =>
      (i === 1) || (element_at(arr, i) =!= element_at(arr, i - 1) + 1))
    val ends = filter(idx, i =>
      (i === size(arr)) || (element_at(arr, i + 1) =!= element_at(arr, i) + 1))
    perDiag
      .select(col("doc_a"), col("doc_b"), col("diag"),
        explode(zip_with(starts, ends, (si, ei) => struct(
          element_at(arr, si).cast("long").as("start_a"),
          (ei - si + 1).cast("long").as("span_windows"),
          (ei - si + n).cast("long").as("span_tokens")))).as("sp"))
      .select(col("doc_a"), col("doc_b"), col("sp.start_a"),
        (col("sp.start_a") - col("diag")).cast("long").as("start_b"),
        col("sp.span_windows"), col("sp.span_tokens"))
  }
}
