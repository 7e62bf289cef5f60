package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.tokens

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale posture: candidate generation is always bucketed (LSH bands /
  * simhash chunks / metadata buckets) so pair enumeration happens only
  * inside buckets — never an O(n²) corpus cross join. Text is projected to
  * (id, signature) before any shuffle; raw documents never travel.
  */
object Dedup {

  /** Plant deterministic near-duplicates: every `every`-th doc is re-added
    * under `idOffset` + its id, with `truncateChars` chars cut from the tail
    * (0 = exact copy). Gives dedup queries known-positive pairs on the
    * synthetic corpus.
    */
  def withPlantedDups(docs: DataFrame, every: Int, idOffset: Long, truncateChars: Int): DataFrame = {
    val base = docs.select("doc_id", "text", "lang", "source")
    val copies = base
      .where(col("doc_id") % every === 0)
      .select(
        (col("doc_id") + idOffset).as("doc_id"),
        (if (truncateChars == 0) col("text")
         else expr(s"substring(text, 1, greatest(length(text) - $truncateChars, 1))")).as("text"),
        col("lang"), col("source"))
    base.unionByName(copies)
  }

  /** Exact dedup: hash-groupBy on content. One shuffle on the md5 key. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** Plant deterministic boilerplate lines around each doc's text: a header
    * shared by every 7th-class doc (high-frequency — removable) and a footer
    * shared only within a 97-class (low-frequency at test scale — kept).
    * Gives lineDedup known positives and negatives on the synthetic corpus,
    * whose texts contain no newlines of their own.
    */
  def withBoilerplate(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat_ws("\n",
        concat(lit("promo banner "), col("doc_id") % 7),
        col("text"),
        concat(lit("footer contact "), col("doc_id") % 97)).as("text"),
      col("lang"), col("source"))

  /** Corpus-level boilerplate line removal (the C4/RefinedWeb rule): a line
    * occurring in more than `maxDocs` DISTINCT documents is boilerplate
    * (nav menus, cookie banners, signatures) and is dropped from every
    * document; surviving lines are reassembled in original order.
    *
    * Scale posture: two shuffles — (1) exploded lines aggregate to
    * per-line distinct-doc counts with map-side partials, (2) re-assembly
    * groupBy doc_id. The boilerplate set is JOINED back, never collected:
    * its cardinality is bounded by total_lines / maxDocs, and AQE
    * broadcasts it while small. A doc's lines are the only raw text that
    * travels, and only to its own reducer.
    */
  def lineDedup(docs: DataFrame, maxDocs: Int): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") > maxDocs)
      .select(col("line"), lit(true).as("is_boiler"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_boiler").isNull, struct(col("idx"), col("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"),
        count(when(col("is_boiler").isNotNull, lit(1))).as("n_dropped"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------- MinHash

  private[operators] val MinhashPrime = 2147483647L // 2^31 - 1; keeps a*x + b within long

  /** Deterministic (a, b) permutation coefficients — fixed seed, no runtime
    * randomness so signatures are reproducible across runs and executors.
    */
  private def coefs(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1), rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Sorted distinct token-3-gram shingle hashes (native expression). */
  def shingleHashes(toks: Column): Column =
    org.apache.spark.sql.graftnative.ShingleHashes.shingleHashes(toks, 3)

  /** MinHash signatures: k permutations h(x) = (a*(x mod p) + b) mod p,
    * each taking the min over the document's shingle set, computed by the
    * native codegen'd MinhashSig expression (a k-by-n primitive loop nest
    * instead of k interpreted array passes).
    */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame = {
    val cs = coefs(k)
    docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        org.apache.spark.sql.graftnative.MinhashSig.minhashSig(
          shingleHashes(col("toks")),
          cs.map(_._1), cs.map(_._2), MinhashPrime).as("sig"))
  }

  /** LSH banding: candidate pairs share at least one (band, band-hash)
    * bucket. bands*rowsPerBand must equal the signature length. The
    * self-join shuffles on the band hash, so work is proportional to bucket
    * sizes, not corpus².
    */
  def minhashCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"), explode(array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64((0 until rowsPerBand).map(r => element_at(col("sig"), j * rowsPerBand + r + 1)): _*)
          .as("bh"))
    }: _*)).as("b")).select(col("doc_id"), col("b.band"), col("b.bh"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: signatures -> LSH candidates ->
    * estimated similarity (fraction of equal signature components) ->
    * threshold filter.
    */
  def minhashNearDups(docs: DataFrame, k: Int, bands: Int, minSim: Double): DataFrame =
    bandedNearDups(minhashSignatures(docs, k), k, bands, minSim)

  /** Shared LSH tail for any (doc_id, sig) signature table: materialize
    * signatures once (the banding self-join references them twice and the
    * est_sim stage twice more — without a stage boundary Spark recomputes
    * the whole signature pipeline per reference; the table is (id, k
    * longs), tiny next to the corpus, and at cluster scale a
    * persisted/bucketed table — see stagedNearDups for the explicit
    * parquet form), band, self-join, estimate similarity, filter.
    */
  private def bandedNearDups(signatures: DataFrame, k: Int, bands: Int,
      minSim: Double): DataFrame = {
    val sigs = signatures.localCheckpoint()
    val cands = minhashCandidates(sigs, bands, k / bands)
    cands
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_sim",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / k)
      .where(col("est_sim") >= minSim)
      .select("doc_a", "doc_b", "est_sim")
  }

  /** Deterministic LCG-derived (a, b) permutation coefficients for the
    * PORTABLE minhash variant — public so the verification oracle can
    * inline the identical literals into its SQL.
    */
  def portableCoefs(k: Int): Seq[(Long, Long)] = {
    var state = 7L
    def next(bound: Long): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      java.lang.Math.floorMod(state >>> 33, bound)
    }
    Seq.fill(k)((1L + next(MinhashPrime - 1), next(MinhashPrime)))
  }

  /** Portable MinHash near-dup: the same signatures -> LSH bands ->
    * est_sim pipeline as minhashNearDups, but SIGNATURES are an
    * engine-agnostic construction — shingle ids are the base-257
    * rolling-hash fold of the shingle STRING (the q_rolling_hash
    * primitive, native on the Spark side). Band bucketing may use any
    * internal hash (the oracle buckets by raw signature slices instead):
    * bucket keys only select candidates, and the portable est_sim filter
    * decides the output, so pairs AND est_sim hash-check in a second
    * engine. The xxhash-based minhashNearDups stays the throughput path.
    */
  def minhashPortableNearDups(docs: DataFrame, k: Int, bands: Int, minSim: Double): DataFrame =
    bandedNearDups(portableSignatures(docs, k), k, bands, minSim)

  /** MinHash estimator CALIBRATION: every portable banded candidate pair
    * measured against its EXACT shingle-set Jaccard, reported per est_sim
    * decile — the approx-audit contract (43b/43c) applied to the LSH
    * estimator itself. A 100 TB dedup run trusts est_sim to gate drops;
    * this query certifies, on the same corpus, how far the k-permutation
    * estimate actually strays (mean exact Jaccard and mean |error| per
    * decile, both 4-dp from micro-unit integer sums). Shingle-id sets
    * join to the bounded candidate pair list only — the exact Jaccard is
    * one native sorted-merge intersect per candidate, never all-pairs.
    */
  def minhashCalibration(docs: DataFrame, k: Int, bands: Int,
      minSim: Double): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    import org.apache.spark.sql.graftnative.SortedIntersectCount.sortedIntersectCount
    val pairs = minhashPortableNearDups(docs, k, bands, minSim)
    val shingleStrs = transform(sequence(lit(1), size(col("toks")) - 2), i =>
      concat(element_at(col("toks"), i), lit(" "),
        element_at(col("toks"), i + 1), lit(" "),
        element_at(col("toks"), i + 2)))
    val sets = docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(shingleStrs, s => rollingHash(s))))
          .as("ids"))
      .localCheckpoint()
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("ids").as("ids_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ids").as("ids_b")), "doc_b")
      .select(col("est_sim"),
        sortedIntersectCount(col("ids_a"), col("ids_b")).as("inter"),
        (size(col("ids_a")) + size(col("ids_b"))).as("sz"))
      .select(
        floor(col("est_sim") * 1000000.0 + 0.5).cast("long").as("est_u"),
        floor(col("inter") * 1000000.0 /
          (col("sz") - col("inter")) + 0.5).cast("long").as("jac_u"))
      .groupBy(least(expr("est_u DIV 100000"), lit(9L)).cast("int").as("decile"))
      .agg(count(lit(1)).as("n_pairs"),
        (floor(sum(col("jac_u")) / count(lit(1)) / 100.0 + 0.5) / 10000.0)
          .as("mean_jaccard_r"),
        (floor(sum(col("est_u")) / count(lit(1)) / 100.0 + 0.5) / 10000.0)
          .as("mean_est_r"),
        (floor(sum(abs(col("est_u") - col("jac_u"))) / count(lit(1)) / 100.0 + 0.5)
          / 10000.0).as("mean_abs_err_r"))
  }

  /** SimHash calibration twin of [[minhashCalibration]]: every portable
    * chunk-banded candidate's hamming distance vs its EXACT shingle-set
    * Jaccard, one row per hamming value (0..maxHamming). SimHash hamming
    * estimates token-vector COSINE, not Jaccard — this report shows what
    * set overlap a given hamming tier actually buys on the real corpus,
    * which is the number a drop-threshold choice needs. Pairs where a
    * side is under 3 tokens carry no shingle set and drop from the
    * report on both engines (inner-join semantics, documented).
    */
  def simhashCalibration(docs: DataFrame, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    import org.apache.spark.sql.graftnative.SortedIntersectCount.sortedIntersectCount
    val pairs = simhashPortableNearDups(docs, maxHamming)
    val shingleStrs = transform(sequence(lit(1), size(col("toks")) - 2), i =>
      concat(element_at(col("toks"), i), lit(" "),
        element_at(col("toks"), i + 1), lit(" "),
        element_at(col("toks"), i + 2)))
    val sets = docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(shingleStrs, s => rollingHash(s))))
          .as("ids"))
      .localCheckpoint()
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("ids").as("ids_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ids").as("ids_b")), "doc_b")
      .select(col("hamming"),
        sortedIntersectCount(col("ids_a"), col("ids_b")).as("inter"),
        (size(col("ids_a")) + size(col("ids_b"))).as("sz"))
      .select(col("hamming"),
        floor(col("inter") * 1000000.0 /
          (col("sz") - col("inter")) + 0.5).cast("long").as("jac_u"))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"),
        (floor(sum(col("jac_u")) / count(lit(1)) / 100.0 + 0.5) / 10000.0)
          .as("mean_jaccard_r"),
        (floor(min(col("jac_u")) / 100.0 + 0.5) / 10000.0).as("min_jaccard_r"),
        (floor(max(col("jac_u")) / 100.0 + 0.5) / 10000.0).as("max_jaccard_r"))
  }

  /** Engine-portable signatures: shingle ids are the base-257 rolling
    * fold of the shingle STRING (native on the Spark side), and the
    * k-by-n permutation loop reuses the native MinhashSig codegen — the
    * formula (a*(x mod p)+b) mod p is identical to the SQL an oracle
    * runs.
    */
  def portableSignatures(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val cs = portableCoefs(k)
    val shingleStrs = transform(sequence(lit(1), size(col("toks")) - 2), i =>
      concat(element_at(col("toks"), i), lit(" "),
        element_at(col("toks"), i + 1), lit(" "),
        element_at(col("toks"), i + 2)))
    docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .withColumn("ids", array_distinct(transform(shingleStrs, s => rollingHash(s))))
      .select(col("doc_id"),
        org.apache.spark.sql.graftnative.MinhashSig.minhashSig(
          col("ids"), cs.map(_._1), cs.map(_._2), MinhashPrime).as("sig"))
  }

  /** Edit-distance-VERIFIED near-dup pairs — an exact verification tier
    * on top of MinHash candidate generation: portable banded candidates
    * (est_sim >= minSim) are confirmed with a true Levenshtein distance
    * over the document texts, emitting the distance and the normalized
    * similarity 1 - lev/max(len). MinHash estimates Jaccard over shingle
    * SETS (order-blind: a doc with reordered sentences can clear
    * est_sim), while edit distance is order-exact — so this is the tier
    * that separates true near-verbatim copies from same-vocabulary
    * rewrites before a keep/drop decision acts on them.
    *
    * Scale shape: Levenshtein is O(len_a * len_b) per pair and could
    * never run all-pairs — the only affordable ordering is cheap
    * probabilistic candidates first, quadratic verify on the bounded
    * candidate set. Texts join to the pair list (each side of the
    * corpus travels once, same discipline as [[ngramJaccardPairs]]),
    * and a length-gap prefilter (lev >= |len_a - len_b| always, with one
    * char of slack so the 4-dp output rounding can never disagree with
    * it) rejects hopeless pairs before the DP runs. Distances are
    * integer and the similarity a 4-dp-rounded ratio, so the whole
    * output hash-checks against a second engine. NOTE: the DuckDB
    * oracle's levenshtein is BYTE-based vs Spark's character-based —
    * identical on ASCII corpora (this testdata is verified all-ASCII); a
    * multi-byte corpus would need the oracle's distance left unchecked.
    */
  def editDistNearDups(docs: DataFrame, k: Int, bands: Int,
      minSim: Double, minEditSim: Double): DataFrame = {
    val r4 = (c: Column) => floor(c * 10000.0 + 0.5) / 10000.0
    val t = docs.select(col("doc_id"), col("text"))
    minhashPortableNearDups(docs, k, bands, minSim)
      .join(t.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("max_len",
        greatest(length(col("text_a")), length(col("text_b"))).cast("double"))
      // conservative: a pair this filter drops has unrounded sim below
      // minEditSim by more than the 0.5e-4 the output rounding can add
      // (for any maxlen <= 20k chars), so the rounded filter below could
      // never have kept it
      .where(abs(length(col("text_a")) - length(col("text_b")))
        <= (lit(1.0) - lit(minEditSim)) * col("max_len") + lit(1.0))
      // equality short-circuit: exact copies (the bulk of candidate
      // pairs in a replica-heavy corpus) settle with an O(len) compare
      // instead of the O(len^2) DP
      .withColumn("lev", when(col("text_a") === col("text_b"), lit(0L))
        .otherwise(levenshtein(col("text_a"), col("text_b")).cast("long")))
      .withColumn("edit_sim_r",
        r4(lit(1.0) - col("lev").cast("double") / col("max_len")))
      .where(col("edit_sim_r") >= minEditSim)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("edit_sim_r"))
  }

  /** Staged edit-distance near-dup — the mandatory production ordering:
    * exact-collapse the corpus to min-id representatives first (one slim
    * md5 shuffle, materialized), then Levenshtein-verify representative
    * candidates only. Replica cliques are [[editDistNearDups]]'s worst
    * case SQUARED — C(replicas, 2) candidate pairs each paying an
    * O(len^2) DP — and collapsing first removes them by construction
    * (Stress at 30x replication: ~118 s raw vs flat staged). Same
    * staging/pruning contract as [[stagedNearDups]].
    */
  def stagedEditDistNearDups(docs: DataFrame, stagePath: String,
      k: Int, bands: Int, minSim: Double, minEditSim: Double): DataFrame =
    editDistNearDups(collapseExact(docs, stagePath, Seq("text")),
      k, bands, minSim, minEditSim)

  /** Cross-corpus near-dup: every (corpus doc, eval doc) pair whose
    * estimated Jaccard clears `minSim` — the DOCUMENT-level leak check
    * between a training corpus and a held-out set (the minhash analog of
    * the n-gram decontam gates, catching whole-document paraphrase-level
    * overlap that per-gram hits understate). Both sides band on the same
    * signature slices; candidates require one side from each corpus, so
    * within-corpus duplicates never reach the verify stage. Same
    * portable construction as minhashPortableNearDups -> fully
    * oracle-replayable.
    */
  def crossCorpusNearDups(corpus: DataFrame, evalSet: DataFrame,
      k: Int, bands: Int, minSim: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigC = portableSignatures(corpus, k).localCheckpoint()
    val sigE = portableSignatures(evalSet, k).localCheckpoint()
    def banded(sigs: DataFrame, idAs: String): DataFrame =
      sigs.select(col("doc_id").as(idAs),
        explode(array((0 until bands).map { j =>
          struct(lit(j).as("band"),
            xxhash64((0 until r).map(x => element_at(col("sig"), j * r + x + 1)): _*)
              .as("bh"))
        }: _*)).as("b"))
        .select(col(idAs), col("b.band"), col("b.bh"))
    val cands = banded(sigC, "corpus_id")
      .join(banded(sigE, "eval_id"), Seq("band", "bh"))
      .select(col("corpus_id"), col("eval_id")).distinct()
    cands
      .join(sigC.select(col("doc_id").as("corpus_id"), col("sig").as("sig_a")), "corpus_id")
      .join(sigE.select(col("doc_id").as("eval_id"), col("sig").as("sig_b")), "eval_id")
      .withColumn("est_sim",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / k)
      .where(col("est_sim") >= minSim)
      .select("corpus_id", "eval_id", "est_sim")
  }

  /** Staged cross-corpus near-dup — the 100 TB form of the train/eval
    * leak check: exact-collapse the CORPUS side to per-content
    * representatives first (one slim (md5, min-id, text) shuffle),
    * MATERIALIZE them (stage boundary: the banded join consumes the
    * collapsed frame twice), then run [[crossCorpusNearDups]] against
    * representatives only. The raw form is pair-output-bound when the
    * corpus carries true replica clusters — every corpus replica of a
    * leaked doc emits its own (corpus_id, eval_id) row, O(replicas) per
    * eval doc (Stress r5: 2.3 -> 3.4 s with 11x the output rows at
    * 30x -> 100x replication). Collapsing first reports each leaked TEXT
    * once, against its min-id representative, so the output stays flat
    * under replication. Only the corpus side stages: eval sets are small
    * and curated, and collapsing them would hide which eval ids leak.
    */
  def stagedCrossCorpusNearDups(corpus: DataFrame, evalSet: DataFrame,
      stagePath: String, k: Int, bands: Int, minSim: Double): DataFrame =
    crossCorpusNearDups(collapseExact(corpus, stagePath, Seq("text")),
      evalSet, k, bands, minSim)

  /** Monotone counter for per-invocation stage sub-directories. */
  private val stageInvocation = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Ownership marker written inside every collapse-stage sub-directory.
    * Underscore-prefixed, so parquet readers ignore it (like _SUCCESS);
    * only marker-bearing siblings are ever eligible for pruning — a user
    * directory that happens to sit under the stage root and match the
    * `name_N` pattern is never touched.
    */
  private val CollapseMarker = "_graft_collapse_stage"

  /** Keep only the LATEST stage sub-directory per application under
    * `root`, deleting superseded marker-bearing siblings. Repeated staged
    * invocations over a fixed root (Stress loops, bench min-of-3) would
    * otherwise accumulate one representative table per invocation,
    * unbounded disk growth in long-lived sessions. Another application's
    * latest stage is never deleted (it may still back a live frame in a
    * concurrent session sharing the root); within THIS application the
    * contract is that a staged frame stays readable until the next
    * staged call — all in-repo callers consume the frame inside their
    * own query, before any later query stages again.
    */
  private def pruneSupersededStages(f: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val Named = "^(.+)_([0-9]+)$".r
    val staged = f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName match {
          case Named(app, n) if f.exists(new Path(st.getPath, CollapseMarker)) =>
            Some((app, n.toLong, st.getPath))
          case _ => None
        }
      }
    staged.groupBy(_._1).foreach { case (_, entries) =>
      val latest = entries.map(_._2).max
      entries.filter(_._2 < latest).foreach(e => f.delete(e._3, true))
    }
  }

  /** The exact-collapse stage both staged dedups share: one md5 shuffle
    * to a min-id representative per content group (metadata columns
    * pinned to the kept doc_id via min_by — deterministic across runs
    * and layouts, unlike first()), MATERIALIZED to parquet as the stage
    * boundary the downstream self-/cross-join requires. One definition
    * so the representative rule can never diverge between pipelines.
    *
    * `stagePath` is treated as a ROOT: each invocation writes under a
    * unique `applicationId_N` sub-directory, so a second call with the
    * same path never overwrites files underneath a DataFrame returned by
    * a previous call while that frame is still being consumed, and
    * concurrent sessions sharing a path cannot race each other's stages.
    * Superseded sibling stages are PRUNED after each write (keep only
    * the latest per application — see [[pruneSupersededStages]]), so the
    * root stays at one slim representative table per application instead
    * of growing per invocation. The returned frame is therefore valid
    * until the NEXT staged call in the same application — every in-repo
    * caller consumes it inside its own query, which finishes first.
    */
  private def collapseExact(docs: DataFrame, stagePath: String,
      keepCols: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    val spark = docs.sparkSession
    val path = s"$stagePath/${spark.sparkContext.applicationId}_" +
      s"${stageInvocation.getAndIncrement()}"
    docs
      .withColumn("text_hash", md5(col("text")))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"),
        keepCols.map(c => min_by(col(c), col("doc_id")).as(c)): _*)
      .drop("text_hash")
      .write.mode("overwrite").parquet(path)
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.create(new Path(p, CollapseMarker)).close()
    pruneSupersededStages(f, p.getParent)
    spark.read.parquet(path)
  }

  /** Staged near-dedup — the mandatory ordering at 100 TB: collapse exact
    * duplicates first (one cheap hash shuffle), MATERIALIZE the
    * representatives (a stage boundary: the LSH self-join downstream would
    * otherwise recompute the aggregation once per join branch), then
    * MinHash-near-dedup only the representatives. Exact-duplicate clusters
    * are the LSH worst case — every replica lands in every band bucket of
    * its cluster and the pair stage degenerates to C(replicas, 2) per
    * document; collapsing them first makes the pair stage see each
    * distinct text once. The Stress harness measures this directly (10x
    * replicated corpus: staged beats raw minhash by the replica factor).
    */
  def stagedNearDups(docs: DataFrame, stagePath: String,
      k: Int, bands: Int, minSim: Double): DataFrame =
    minhashNearDups(
      collapseExact(docs, stagePath, Seq("text", "lang", "source")),
      k, bands, minSim)

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens: bit i is set when more than half
    * the token hashes have bit i set. Expression-only (no UDF).
    */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .withColumn("hs", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      .select(col("doc_id"),
        org.apache.spark.sql.graftnative.Simhash64.simhash64(col("hs")).as("simhash"))

  /** Chunk-banded near-dup pairs over a (doc_id, simhash) frame: band the
    * 64 bits into 4 16-bit chunks; a pair must agree on at least one chunk
    * (pigeonhole guarantees recall for hamming <= 3 at 4 chunks), then
    * verify hamming via bit_count(xor).
    */
  private def simhashPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = sh.select(col("doc_id"), col("simhash"), explode(array((0 until 4).map { j =>
      struct(lit(j).as("chunk"),
        (shiftright(col("simhash"), j * 16).bitwiseAND(lit(65535L))).as("cv"))
    }: _*)).as("c")).select(col("doc_id"), col("simhash"), col("c.chunk"), col("c.cv"))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** SimHash near-dups over xxhash64 token hashes (throughput path). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int): DataFrame =
    simhashPairs(simhash(docs), maxHamming)

  /** Portable SimHash near-dups: token hashes are two rolling folds with
    * different bases composed into a 60-bit value
    * (`fold257 * 2^30 + fold131`), so the signature, the chunk banding,
    * AND the hamming verification replay exactly in a second engine —
    * the cross-engine witness for the SimHash pipeline, like
    * minhashPortableNearDups for MinHash.
    */
  def simhashPortableNearDups(docs: DataFrame, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHashBase
    val sh = docs
      .withColumn("hs", transform(tokens(col("text")),
        t => rollingHashBase(t, 257L) * lit(1L << 30) + rollingHashBase(t, 131L)))
      .select(col("doc_id"),
        org.apache.spark.sql.graftnative.Simhash64.simhash64(col("hs")).as("simhash"))
    simhashPairs(sh, maxHamming)
  }

  // ------------------------------------------- dup clusters (connected comp.)

  /** Connected components over the near-dup pair graph: every document in
    * a component gets `cluster_id` = the component's minimum doc id (its
    * canonical representative). Pair emission (minhash/simhash/jaccard)
    * only certifies EDGES; choosing one keeper per transitive group needs
    * components — a is a near-dup of b, b of c, so a and c must share a
    * cluster even though no a-c pair was emitted.
    *
    * Algorithm: hash-min label propagation to a fixpoint — each round
    * every node takes the min label among itself and its neighbors; rounds
    * are whole-graph joins (BSP), converging in O(component diameter)
    * rounds. Near-dup components are shallow (dup clusters, short
    * truncation chains), so diameter is small; for adversarial long-chain
    * graphs swap in the large-star/small-star variant (O(log n) rounds) —
    * the join shape is the same. Each round materializes to cut the
    * lineage (iterative joins otherwise re-execute the whole history).
    *
    * DURABILITY: the default stage boundary is `localCheckpoint()` —
    * executor-local, non-replicated blocks. On a real cluster, losing an
    * executor mid-fixpoint therefore KILLS the job (the blocks cannot be
    * recomputed once lineage is cut) instead of recomputing — fine for
    * the common minutes-long loop, wrong for a 100 TB pair graph on
    * preemptible nodes. Pass `reliableStagePath` to stage every round as
    * parquet instead (durable, replicated storage): each round then
    * survives any executor loss at the cost of a filesystem round-trip
    * per BSP round. Results are identical either way (DedupSpec proves
    * it); choose by failure-domain, not semantics.
    *
    * The stage path must be a DEDICATED directory: it is cleared on
    * entry (stale rounds from a longer prior run would otherwise sit
    * next to the new fixpoint and read as results). Superseded label
    * rounds are deleted as soon as the next round commits, so disk
    * holds at most two label copies plus the edge/adjacency inputs;
    * `edges`/`sym` and the FINAL labels round are retained — the
    * returned DataFrame reads the final round lazily, and the inputs
    * make a died-mid-loop run inspectable.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 50,
      reliableStagePath: Option[String] = None): DataFrame = {
    val stager = new RoundStager(pairs.sparkSession, reliableStagePath)
    def deleteStage(name: String): Unit = stager.delete(name)
    def stage(df: DataFrame, name: String): DataFrame = stager(df, name)
    // materialize the edge list BEFORE symmetrizing: the union references
    // it twice, which would otherwise run the (expensive) upstream
    // pair-generation query twice
    val raw = stage(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")), "edges")
    // Size the loop's layout to the GRAPH, not the session default: the
    // near-dup pair graph is orders of magnitude smaller than the corpus
    // (hundreds of edges at sf0.1; still only ~1e9 at 100 TB), and every
    // BSP round pays per-task scheduling overhead on each partition
    // regardless of rows. ~100k edges per partition keeps small graphs
    // single-task per round while scaling the partition count linearly
    // with a 100 TB-sized pair graph (capped at the session setting). The
    // count is free — raw is already materialized.
    val nEdges = raw.count()
    val sessionP = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val p = math.max(1L, math.min(sessionP.toLong, nEdges / 100000L + 1L)).toInt
    val edges =
      if (p < raw.rdd.getNumPartitions) stage(raw.coalesce(p), "edges_sized")
      else raw
    // nodes stays LAZY over the checkpointed edges: its distinct is
    // recomputed once inside each consumer's materialization (sym, the
    // label init) instead of adding another blocking job to the fixpoint
    // loop's critical path.
    val nodes = edges.select(col("src"))
      .unionByName(edges.select(col("dst").as("src"))).distinct()
    // self-edge folded into the adjacency, so one join + one groupBy IS
    // the full hash-min step: label'(x) = min over {x} ∪ neighbors(x)
    val sym = stage(edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(nodes.withColumn("dst", col("src"))), "sym")
    var labels = stage(
      nodes.select(col("src").as("doc_id"), col("src").as("label")), "labels_0")
    // labels only DECREASE under hash-min and at least one strictly
    // decreases every non-converged round, so the label sum is a
    // convergence certificate — a one-column aggregate of the freshly
    // materialized round instead of an old-vs-new join
    // sum over ZERO rows is NULL (empty pair graph — a clean corpus emits
    // no near-dup pairs); certify that as converged-at-zero, not an NPE
    def sumLabels(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var labelSum = sumLabels(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val updated = stage(sym
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("label")).as("label")), s"labels_${iter + 1}")
      val newSum = sumLabels(updated)
      converged = newSum.compareTo(labelSum) == 0
      labelSum = newSum
      labels = updated
      // the superseded round is never read again; keep durable storage
      // at <= 2 label copies no matter how many rounds the graph needs
      deleteStage(s"labels_$iter")
      iter += 1
    }
    // silently returning a non-fixpoint would hand back components that
    // are still split — multiple "canonical" docs per true cluster
    if (!converged)
      throw new IllegalStateException(
        s"dupClusters did not converge in $maxIters rounds — component " +
          s"diameter exceeds maxIters; raise it or use a star-contraction variant")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Per-round stage boundary for the iterative BSP loops: durable
    * parquet rounds under `reliableRoot` when given (executor-loss
    * survival on preemptible clusters), `localCheckpoint()` otherwise.
    *
    * The durable root is cleared on entry (stale rounds from a longer
    * prior run would otherwise read as results) — but ONLY when it is
    * empty, does not exist, or carries the marker file a prior run left
    * behind. A non-empty directory without the marker was not written
    * by this stager, so deleting it would destroy caller data behind a
    * mis-pointed path (a shared /tmp dir, a data dir); refuse instead.
    *
    * `rootIsArtifact = true` flips the marker rule for stagers whose
    * root IS the durable output (ingestChain: the staged pieces are the
    * persisted index): a non-empty root is then REFUSED even when it
    * carries the marker, because "marker present" there means "a prior
    * run's artifact lives here" — re-pointing tomorrow's run at it must
    * not silently delete today's index. Scratch stagers (BSP rounds)
    * keep the clearing behavior: their stale rounds are garbage, not
    * artifacts.
    */
  private[operators] final class RoundStager(session: org.apache.spark.sql.SparkSession,
      reliableRoot: Option[String], rootIsArtifact: Boolean = false) {
    import org.apache.hadoop.fs.Path
    private val Marker = "_graft_stage_root"
    private def fs(p: Path) =
      p.getFileSystem(session.sparkContext.hadoopConfiguration)
    reliableRoot.foreach { root =>
      val p = new Path(root)
      val f = fs(p)
      if (f.exists(p)) {
        if (f.listStatus(p).nonEmpty && !f.exists(new Path(p, Marker)))
          throw new IllegalArgumentException(
            s"refusing to clear stage root $root: directory is non-empty and " +
              s"lacks the $Marker marker of a prior run — point " +
              s"reliableStagePath at a dedicated (empty or stager-owned) directory")
        if (rootIsArtifact &&
            f.listStatus(p).exists(_.getPath.getName != Marker))
          throw new IllegalArgumentException(
            s"refusing to reuse stage root $root: it holds a prior run's " +
              s"staged artifact (the root IS the durable index). Stage under " +
              s"a FRESH root and read the prior pieces back as index0, or use " +
              s"the bucketed index layout (writeBucketedIndex/" +
              s"appendBucketedIndex) for a long-lived in-place index")
        f.delete(p, true)
      }
      f.mkdirs(p)
      f.create(new Path(p, Marker)).close()
    }
    def apply(df: DataFrame, name: String): DataFrame = reliableRoot match {
      case Some(root) =>
        val path = s"$root/$name"
        df.write.mode("overwrite").parquet(path)
        session.read.parquet(path)
      case None => df.localCheckpoint()
    }
    def delete(name: String): Unit = reliableRoot.foreach { root =>
      val p = new Path(s"$root/$name")
      fs(p).delete(p, true)
    }
  }

  /** Star-contraction connected components — the adversarial-diameter
    * form of [[dupClusters]], after Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (ACM SoCC 2014): alternate
    *
    *   large-star: every node u links each strictly-LARGER neighbor to
    *     the minimum of its neighborhood (incl. itself);
    *   small-star: every node u links each neighbor ≤ u, and itself, to
    *     the minimum of its closed neighborhood
    *
    * until the edge set is stable, at which point every component is a
    * star rooted at its minimum node and the edges READ OFF the labels.
    * Both steps are one shuffle (groupBy min + join back), the same
    * join shape as hash-min, but components CONTRACT geometrically:
    * convergence is O(log n) rounds instead of O(component diameter),
    * which is what survives adversarial long chains (progressive
    * truncation/edit chains make diameter O(n) — hash-min on a
    * 1000-link chain needs ~1000 rounds, this needs ~7; DedupSpec
    * measures exactly that). Output is identical to [[dupClusters]]
    * (`doc_id`, `cluster_id` = component minimum), proven in spec on
    * shared graphs.
    *
    * Convergence detection: a (count, sum lo, sum hi) triple of the
    * freshly materialized round is compared to the previous round's —
    * three scalars off an already-staged slim frame. Only when the
    * triple matches is equality CONFIRMED with an exact anti-join (a
    * triple collision must not silently end the loop early), so the
    * exact check runs once, at the true fixpoint.
    *
    * Same durability contract as [[dupClusters]]: default
    * `localCheckpoint()` rounds, or durable parquet rounds under
    * `reliableStagePath` (a dedicated directory — guarded by a marker
    * file against mis-pointed deletion).
    */
  def dupClustersStar(pairs: DataFrame, maxIters: Int = 30,
      reliableStagePath: Option[String] = None): DataFrame = {
    val stager = new RoundStager(pairs.sparkSession, reliableStagePath)
    // canonical undirected form (lo < hi), self-loops dropped; the
    // upstream pair query materializes ONCE here, like dupClusters' raw
    var edges = stager(pairs.select(
        least(col("doc_a"), col("doc_b")).as("lo"),
        greatest(col("doc_a"), col("doc_b")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct(), "star_0")

    // large-star over the symmetrized view: m(u) = min(Γ(u) ∪ {u}),
    // emit (m(u), v) for every neighbor v > u. m ≤ u < v keeps the
    // output canonical without re-sorting endpoints.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("src"), col("hi").as("dst"))
        .unionByName(e.select(col("hi").as("src"), col("lo").as("dst")))
      val mins = sym.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("m"))
      sym.join(mins, "src")
        .where(col("dst") > col("src"))
        .select(col("m").as("lo"), col("dst").as("hi"))
        .distinct()
    }
    // small-star over edges directed at their larger endpoint: key u =
    // hi, Γ(u) = its lo neighbors (all < u), m = min(Γ(u)); emit (m, v)
    // for every v ∈ Γ(u) ∪ {u}, v ≠ m.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val withM = e.join(mins, "hi")
      withM.select(col("m").as("lo"), col("lo").as("hi"))
        .where(col("lo") =!= col("hi"))
        .unionByName(mins.select(col("m").as("lo"), col("hi")))
        .distinct()
    }
    def triple(e: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(col("lo").cast("decimal(38,0)")), sum(col("hi").cast("decimal(38,0)"))).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO),
        Option(r.getDecimal(2)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var sig = triple(edges)
    var converged = sig._1 == 0L // empty pair graph: already a fixpoint
    var iter = 0
    while (!converged && iter < maxIters) {
      // both ops consume their input twice (groupBy + join back), so
      // each is staged — two slim materializations per O(log n) round
      val ls = stager(largeStar(edges), s"star_ls_${iter + 1}")
      val next = stager(smallStar(ls), s"star_${iter + 1}")
      stager.delete(s"star_ls_${iter + 1}")
      val newSig = triple(next)
      if (newSig == sig)
        // triple match is necessary, not sufficient — confirm exactly
        // (a collision must not end the loop before the true fixpoint)
        converged = next.exceptAll(edges).isEmpty
      sig = newSig
      // the superseded round is never read again (the except above, the
      // only consumer of the old round, has run); durable storage holds
      // at most two edge rounds no matter how many rounds the graph needs
      stager.delete(s"star_$iter")
      edges = next
      iter += 1
    }
    if (!converged && sig._1 != 0L)
      throw new IllegalStateException(
        s"dupClustersStar did not converge in $maxIters rounds")
    // fixpoint edges are (component-min, node): labels read off directly,
    // plus (m, m) for each root
    edges.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
      .unionByName(edges.select(col("lo").as("doc_id"), col("lo").as("cluster_id")).distinct())
  }

  // ----------------------------------------------------- cluster keep-best

  /** Production keep-policy over duplicate clusters: for each cluster,
    * keep the doc with the most whitespace tokens (the longest surviving
    * variant — truncated / boilerplate-stripped copies lose), ties broken
    * toward the smaller `doc_id`. The CCNet/RefinedWeb-style consumer of
    * [[dupClusters]] / [[dupClustersStar]]: their min-id `cluster_id` is
    * an arbitrary canonical label, not a quality judgment — this operator
    * turns the labeling into the actual keep/drop decision.
    *
    * Scale shape: the token count is projected at scan (text itself never
    * joins or shuffles), the join key is `doc_id` (clusters hold only
    * docs that appear in the pair graph, a small fraction of the corpus),
    * and the output is one row per CLUSTER — O(#clusters) regardless of
    * cluster sizes, never O(pairs). `max_by` over the unique
    * (n_tokens, -doc_id) struct keeps the argmax deterministic and
    * map-side-partial (no window, no per-cluster sort).
    */
  def keepBest(clusters: DataFrame, docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    clusters.join(toks, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(
        expr("max_by(doc_id, struct(n_tokens, -doc_id))").as("keep_doc_id"),
        max(col("n_tokens")).as("keep_tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_dropped", col("n_docs") - 1)
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Exact token-3-gram Jaccard over bucketed candidate pairs. Buckets =
    * (source, lang) plus a length band — the standard cheap blocking keys —
    * so the pair join never goes quadratic in the corpus.
    */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double, maxLenDiff: Int): DataFrame = {
    // maxLenDiff = 0 ("exact same length") must not divide the band key by
    // zero — floor(len/0) is NULL in non-ANSI mode and the equi-join would
    // silently drop every pair. Band width 1 keeps equal-length docs in one
    // band; the abs(len diff) predicate below still enforces the caller's 0.
    val bandWidth = math.max(maxLenDiff, 1)
    // 64-bit shingle hashes (not md5 strings), sorted + distinct ONCE per
    // document, so each candidate pair costs one allocation-free native
    // merge (SortedIntersectCount) instead of two hash-set builds. |set|
    // arithmetic is hash-representation independent (collisions ~n²/2^64).
    import org.apache.spark.sql.graftnative.SortedIntersectCount.sortedIntersectCount
    // Materialized once: both self-join sides consume the shingled
    // projection, and without the stage boundary each side re-scans the
    // corpus and recomputes split+hash+sort per doc (the same
    // double-compute stagedNearDups cuts). The checkpointed frame is the
    // slim (id, keys, len, hashes) projection — text never materializes.
    val withShingles = docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("len"),
        shingleHashes(col("toks")).as("sh"))
      .localCheckpoint()
    // The length band is part of the JOIN KEY, not just a post-join filter:
    // two docs within maxLenDiff chars are at most one band apart, so
    // exploding x's band±1 against y's own band finds every qualifying
    // pair exactly once (y.band equals exactly one element of x's list)
    // while shrinking each equi-join bucket from a whole (source, lang)
    // group to a length slice of it — the difference between n² and
    // n²/bands per group when a group is millions of docs at 100 TB. The
    // abs(len diff) predicate still runs, so the output is unchanged.
    val x = withShingles
      .withColumn("band", explode(array(
        floor(col("len") / bandWidth) - 1,
        floor(col("len") / bandWidth),
        floor(col("len") / bandWidth) + 1)))
    val y = withShingles.withColumn("band", floor(col("len") / bandWidth))
    x.as("x").join(y.as("y"),
        col("x.source") === col("y.source") && col("x.lang") === col("y.lang") &&
          col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id") &&
          abs(col("x.len") - col("y.len")) <= maxLenDiff)
      .withColumn("inter", sortedIntersectCount(col("x.sh"), col("y.sh")))
      .withColumn("uni",
        size(col("x.sh")).cast("long") + size(col("y.sh")).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter") / col("uni"))
      .where(col("jaccard") >= minJaccard)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("inter"), col("uni"), col("jaccard"))
  }

  // ---------------------------------------------------- containment pairs

  /** Doc-in-doc CONTAINMENT dedup — the asymmetric tier symmetric Jaccard
    * cannot see: a 10-token excerpt embedded in a 300-token page has
    * Jaccard ~0.03 but containment C(A,B) = |A∩B| / |A| = 1.0. This is
    * how a pipeline finds quoted/concatenated/excerpted duplication
    * (one doc wholly inside another), the overlap-join semantics of the
    * AllPairs/PPJoin family.
    *
    * Blocking is the rare-shingle inverted index (the q_pair_dup_spans
    * rule): candidate pairs share at least one shingle whose corpus
    * document-frequency is <= `maxShingleDf`. A length band cannot block
    * containment (the pair's lengths are wildly different by
    * construction), but a contained doc necessarily shares ALL its
    * shingles with its container, so unless every one of its shingles is
    * corpus-hot boilerplate, a rare one links the pair. Verification is
    * then the exact native sorted-merge intersect per candidate, and
    * both directed containments plus Jaccard are emitted.
    *
    * Scale shape: the shingled projection is checkpointed once (explode,
    * both pair-side fetches); the df aggregate is linear with map-side
    * combine; the inverted-index self-join emits at most C(maxShingleDf,
    * 2) pairs per rare shingle. Under replica flooding the rule is
    * self-limiting exactly like q_pair_dup_spans: replicating the corpus
    * k-fold multiplies every df by k, pushing formerly-rare shingles OVER
    * the cap — replica cliques are excluded by construction rather than
    * enumerated. Output carries counts and ratios only, so the internal
    * 64-bit shingle hash never leaks into the result (oracle-exact under
    * any injective hash).
    */
  def containmentPairs(docs: DataFrame, minCont: Double,
      maxShingleDf: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.SortedIntersectCount.sortedIntersectCount
    val withSh = docs
      .withColumn("toks", tokens(col("text")))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), shingleHashes(col("toks")).as("sh"))
      .localCheckpoint()
    val ex = withSh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val rare = ex.join(dfreq.where(col("df") <= maxShingleDf), "s")
      .select(col("doc_id"), col("s"))
    val pairs = rare.as("a")
      .join(rare.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_rare"))
    pairs
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("size_a", size(col("sh_a")).cast("long"))
      .withColumn("size_b", size(col("sh_b")).cast("long"))
      .withColumn("cont_a", col("inter") / col("size_a"))
      .withColumn("cont_b", col("inter") / col("size_b"))
      .withColumn("jaccard",
        col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .where(greatest(col("cont_a"), col("cont_b")) >= minCont)
      .select(col("doc_a"), col("doc_b"), col("n_shared_rare"), col("inter"),
        col("size_a"), col("size_b"), col("cont_a"), col("cont_b"),
        col("jaccard"))
  }

  /** Near-dup cluster-size histogram: how duplication mass distributes
    * over cluster sizes (pairs, small cliques, giant components) — the
    * standard dedup-analysis figure, and the early-warning signal for
    * boilerplate floods (a heavy tail of large clusters) vs organic
    * duplication (mostly size 2). Two bounded aggregates over the CC
    * labels; output is O(max cluster size) rows.
    */
  def clusterSizeHistogram(pairs: DataFrame): DataFrame =
    dupClusters(pairs)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        (col("cluster_size") * count(lit(1))).as("n_docs"))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"))

  /** Leakage-safe train/val/test split: WHOLE near-dup clusters are the
    * split unit, never documents — a doc-level random split puts a
    * near-duplicate of a training doc into eval and the eval number is
    * fiction (the contamination mode q_decontam/q_cross_dedup DETECT;
    * this operator PREVENTS it at corpus-construction time). Every
    * cluster (connected component of the verified pair graph; docs in
    * no pair are their own singleton cluster) hashes to a split by the
    * portable fold of its cluster id, so membership is deterministic,
    * engine-replayable, and stable under corpus growth that doesn't
    * touch the cluster.
    *
    * Output: one row per split — cluster count, doc count, doc share in
    * bp — plus the leakage PROOF column max_splits_per_cluster (count
    * of distinct splits seen inside any one cluster, over the whole
    * corpus): 1 by construction, and the oracle re-derives it rather
    * than trusting it, so the hash gate re-proves no-leakage every run.
    *
    * Scale shape: CC runs on the PAIR GRAPH (orders of magnitude
    * smaller than the corpus); the corpus-sized work is one left join
    * on doc_id + a pure hash projection; aggregates are bounded at
    * 3 + #clusters rows. The narrow (doc_id, cluster_id, split) frame
    * localCheckpoints once and feeds the proof, total, and per-split
    * aggregates without re-deriving the closure.
    */
  /** Per-source near-dup profile: which domain floods duplicates — doc
    * count, docs in >= 1 verified near-dup cluster, the rate in bp, and
    * distinct clusters touched, per source. The dedup-observability
    * column q_data_card's per-source report doesn't carry (it counts
    * short/repetitive/contaminated; this adds near-dup mass), and the
    * number a mixing plan reads before deciding whether a source's raw
    * volume is real or replica inflation. CC on the pair graph only;
    * corpus-side work is one doc_id left join + a bounded rollup.
    */
  def dedupProfile(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val clusters = dupClusters(pairs)
    corpus.select(col("doc_id"), col("source"))
      .join(clusters, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("cluster_id")).as("n_near_dup"),
        floor(count(col("cluster_id")) * 10000.0 / count(lit(1)) + 0.5)
          .cast("long").as("near_dup_bp"),
        countDistinct(col("cluster_id")).as("n_clusters"))
  }

  def clusterSplit(corpus: DataFrame, pairs: DataFrame,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 < valPct, trainPct + valPct < 100")
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val clusters = dupClusters(pairs)
    val assigned = corpus.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("h", pmod(rollingHash(
        concat(lit("split:"), col("cluster_id").cast("string"))), lit(100L)))
      .withColumn("split",
        when(col("h") < trainPct, "train")
          .when(col("h") < trainPct + valPct, "val")
          .otherwise("test"))
      .localCheckpoint()
    val proof = assigned.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k")).as("max_splits_per_cluster"))
    val tot = assigned.agg(count(lit(1)).as("n_total"))
    assigned.groupBy(col("split"))
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(proof))
      .crossJoin(broadcast(tot))
      .select(col("split"), col("n_clusters"), col("n_docs"),
        floor(col("n_docs") * 10000.0 / col("n_total") + 0.5).cast("long")
          .as("docs_bp"),
        col("max_splits_per_cluster"))
  }
}
