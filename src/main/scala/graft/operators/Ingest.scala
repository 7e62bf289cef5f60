package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus ingest: dedup each NEW batch of documents against a
  * persisted signature index instead of re-deduping the whole corpus —
  * the daily-crawl shape of dedup at 100 TB, where recomputing corpus
  * signatures per ingest is the thing that cannot happen.
  *
  * The index holds one slim row per accepted doc: (doc_id, md5 text
  * hash, minhash signature). An arriving batch is decided doc-by-doc:
  *
  *   1. `exact_index` — content hash already in the index
  *   2. `near_index`  — banded minhash candidate with est_sim >= minSim
  *   3. `exact_batch` — same content as an EARLIER doc of this batch
  *   4. `near_batch`  — near-dup of an earlier doc of this batch
  *   5. `keep`        — accepted; its index row appends before the next
  *                      batch arrives
  *
  * `matched_id` is the smallest qualifying doc id at the verdict's own
  * tier. Within-batch rules are GREEDY and non-cascading (a doc is
  * dropped against any earlier batch doc, whatever that doc's own fate)
  * — exact ties are transitive so the cascade cannot matter there, and
  * for near-dups this is the standard streaming-dedup policy: decisions
  * are made once, in arrival order, and never revisited.
  *
  * Scale shape: corpus TEXT is read exactly once ever (at index build);
  * each ingest touches only signature/hash columns of the index — the
  * per-batch joins shuffle (text_hash) and (band, band-hash) keys, a few
  * dozen bytes per index row — and appends O(keepers) new rows, never
  * rewriting the index. The portable signature construction matches
  * [[Dedup.portableSignatures]], so every decision replays in the
  * DuckDB oracle.
  */
object Ingest {

  /** Append `text_hash` and `sig` columns, KEEPING every existing column
    * (the streaming gate needs its event-time column to survive). `sig`
    * is null for docs under 3 tokens (nothing to shingle) — they still
    * dedup through the exact-hash tier. One scan: the signature is
    * computed under a `when` guard instead of a filter, so short docs
    * keep their row without a second pass over the corpus.
    */
  def withSignature(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    import org.apache.spark.sql.graftnative.MinhashSig.minhashSig
    val cs = Dedup.portableCoefs(k)
    val toks = TextAnalysis.tokens(col("text"))
    val shingleStrs = transform(sequence(lit(1), size(toks) - 2), i =>
      concat(element_at(toks, i), lit(" "),
        element_at(toks, i + 1), lit(" "),
        element_at(toks, i + 2)))
    docs
      .withColumn("text_hash", md5(col("text")))
      .withColumn("sig",
        when(size(toks) >= 3,
          minhashSig(array_distinct(transform(shingleStrs, s => rollingHash(s))),
            cs.map(_._1), cs.map(_._2), Dedup.MinhashPrime))
          .otherwise(lit(null).cast("array<bigint>")))
  }

  /** One index row per doc: (doc_id, text_hash, sig). */
  def signatureIndex(docs: DataFrame, k: Int): DataFrame =
    withSignature(docs, k).select(col("doc_id"), col("text_hash"), col("sig"))

  /** LSH band rows for signature-carrying docs, the signature riding
    * along: (idAs, sigAs, band, bh). Carrying `sig` on the band row costs
    * k longs per row but removes the join back to fetch it at est_sim
    * time — the candidate check happens inside the band join's own stage,
    * no candidate materialization, no second pass over the index.
    */
  private[graft] def bandedWithSig(sigs: DataFrame, idAs: String,
      sigAs: String, bands: Int, r: Int): DataFrame =
    sigs.where(col("sig").isNotNull)
      .select(col("doc_id").as(idAs), col("sig").as(sigAs),
        explode(array((0 until bands).map { j =>
          struct(lit(j).as("band"),
            xxhash64((0 until r).map(x => element_at(col("sig"), j * r + x + 1)): _*)
              .as("bh"))
        }: _*)).as("b"))
      .select(col(idAs), col(sigAs), col("b.band"), col("b.bh"))

  private[graft] def estSim(a: Column, b: Column, k: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k

  /** Decide one batch against the current index. `index` and `batchSigs`
    * are [[signatureIndex]]-shaped; both are consumed by several joins,
    * so callers materialize them (the chain does). Output: one row per
    * batch doc — (doc_id, verdict, matched_id).
    */
  def ingestDecisions(index: DataFrame, batchSigs: DataFrame,
      k: Int, bands: Int, minSim: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    decide(index.select(col("text_hash"), col("doc_id")),
      bandedWithSig(index, "idx_id", "sig_a", bands, k / bands),
      batchSigs, k, bands, minSim)
  }

  /** Tier evaluation shared by the in-memory index ([[ingestDecisions]])
    * and the bucketed-table layout ([[ingestDecisionsBucketed]]).
    * `indexHash` is (text_hash, doc_id); `indexBands` is
    * (idx_id, sig_a, band, bh).
    */
  private def decide(indexHash: DataFrame, indexBands: DataFrame,
      batchSigs: DataFrame, k: Int, bands: Int, minSim: Double): DataFrame = {
    val r = k / bands
    // every tier emits raw (doc_id, tier, m) match rows; ONE aggregation
    // then realizes the whole priority rule — lowest tier wins, smallest
    // id within it — instead of a per-tier aggregation plus a 4-way
    // left-join ladder (3 fewer shuffles per batch at scale). The tier
    // pick and the per-tier min are all plain min(long) / conditional
    // min(long), so the combine stays a HashAggregate with map-side
    // partials (a lexicographic min over a (tier, m) struct computes the
    // same thing but forces SortAggregate — structs have no mutable
    // aggregation buffer). A band collision pair is est_sim-checked once
    // per shared band (<= bands times) rather than distinct-ed first:
    // the check is a codegen'd 64-element compare in the join's own
    // stage, cheaper than the exchange a distinct would cost.
    def rows(df: DataFrame, tier: Int, m: Column): DataFrame =
      df.select(col("doc_id"), lit(tier).as("tier"), m.as("m"))
    val batchBands = bandedWithSig(batchSigs, "b_id", "sig_b", bands, r)
    val exactIdx = rows(batchSigs
      .join(indexHash.select(col("text_hash"), col("doc_id").as("mm")), "text_hash"),
      1, col("mm"))
    val nearIdx = rows(indexBands
      .join(batchBands, Seq("band", "bh"))
      .where(estSim(col("sig_a"), col("sig_b"), k) >= minSim)
      .withColumnRenamed("b_id", "doc_id"),
      2, col("idx_id"))
    val exactBatch = rows(batchSigs.as("x")
      .join(batchSigs.as("y"),
        col("x.text_hash") === col("y.text_hash") && col("y.doc_id") < col("x.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("mm")),
      3, col("mm"))
    val nearBatch = rows(bandedWithSig(batchSigs, "a_id", "sig_a", bands, r)
      .join(batchBands, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .where(estSim(col("sig_a"), col("sig_b"), k) >= minSim)
      .withColumnRenamed("b_id", "doc_id"),
      4, col("a_id"))
    val best = exactIdx.unionByName(nearIdx)
      .unionByName(exactBatch).unionByName(nearBatch)
      .groupBy(col("doc_id")).agg(
        min(col("tier")).as("best_tier"),
        min(when(col("tier") === 1, col("m"))).as("m1"),
        min(when(col("tier") === 2, col("m"))).as("m2"),
        min(when(col("tier") === 3, col("m"))).as("m3"),
        min(when(col("tier") === 4, col("m"))).as("m4"))
    batchSigs.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("best_tier") === 1, lit("exact_index"))
          .when(col("best_tier") === 2, lit("near_index"))
          .when(col("best_tier") === 3, lit("exact_batch"))
          .when(col("best_tier") === 4, lit("near_batch"))
          .otherwise(lit("keep")).as("verdict"),
        when(col("best_tier") === 1, col("m1"))
          .when(col("best_tier") === 2, col("m2"))
          .when(col("best_tier") === 3, col("m3"))
          .when(col("best_tier") === 4, col("m4")).as("matched_id"))
  }

  /** The production chain: seed index -> decide batch 1 -> append its
    * keepers -> decide batch 2 (which now sees batch-1 keepers) -> ...
    * Returns every batch's decisions labeled with `batch_no`.
    *
    * The index is kept as a LIST of materialized pieces (seed + one
    * per batch's keepers) unioned lazily, mirroring a parquet index
    * table gaining one file-append per ingest: each piece is written
    * once and the seed is never rewritten — O(keepers) work per batch,
    * never O(index).
    *
    * Same durability contract as `Dedup.dupClusters`: pieces default to
    * `localCheckpoint()`; under `reliableStagePath` (a dedicated
    * directory — marker-guarded against mis-pointed deletion) every
    * piece and decision frame lands as parquet instead, so the chain
    * survives executor loss AND the stage root holds the complete
    * durable index (`index_0` + `keepers_N`) plus the per-batch
    * decision log when it finishes. Nothing is deleted: the pieces ARE
    * the artifact.
    *
    * The root is per-RUN, not per-index, and the chain enforces it: a
    * root already holding staged pieces is REFUSED on entry (unlike
    * scratch stagers, which clear marker-bearing roots — here the
    * pieces ARE the artifact, so re-pointing tomorrow's ingest at
    * today's root must not silently delete today's index). Tomorrow's
    * ingest reads today's pieces back as its `index0` (or unions them)
    * and stages under a FRESH root. For a long-lived many-ingest index,
    * prefer the bucketed-table layout ([[writeBucketedIndex]] /
    * [[appendBucketedIndex]] / [[ingestDecisionsBucketed]]), which
    * appends in place and never clears anything.
    */
  def ingestChain(index0: DataFrame, batches: Seq[DataFrame],
      k: Int = 64, bands: Int = 16, minSim: Double = 0.5,
      reliableStagePath: Option[String] = None): DataFrame = {
    val stager = new Dedup.RoundStager(index0.sparkSession, reliableStagePath,
      rootIsArtifact = true)
    // The seed index and every batch's signature pass are mutually
    // independent (decisions chain batch-over-batch, signatures do not) —
    // stage them concurrently (Par, guide §2.6) instead of paying the
    // minhash passes serially inside the decide loop. Same stage names,
    // same frames; the decide chain below is unchanged.
    val staged = Par.seq(
      (() => stager(index0, "index_0")) +:
        batches.zipWithIndex.map { case (batch, i) =>
          () => stager(signatureIndex(batch, k), s"sigs_${i + 1}")
        })
    val pieces = scala.collection.mutable.ArrayBuffer(staged.head)
    val decided = batches.indices.map { i =>
      val sigs = staged(i + 1)
      val idx = pieces.reduce(_ unionByName _)
      // the FINAL batch's decisions have one consumer (the result union)
      // in default mode — staging them is a pure blocking job; durable
      // mode still lands them (the dec_N log IS part of the artifact)
      val dRaw = ingestDecisions(idx, sigs, k, bands, minSim)
      val d =
        if (reliableStagePath.isDefined || i < batches.length - 1)
          stager(dRaw, s"dec_${i + 1}")
        else dRaw
      val keepers = sigs
        .join(d.where(col("verdict") === "keep").select(col("doc_id")), "doc_id")
      // durable mode stages keepers unconditionally — they ARE the index
      // artifact. Default mode keeps them LAZY (a join of two already-
      // checkpointed frames, recomputed cheaply by the next batch's
      // consumers) and skips the final batch's keepers outright: nothing
      // ever reads them, so materializing them is a pure blocking job.
      if (reliableStagePath.isDefined)
        pieces += stager(keepers, s"keepers_${i + 1}")
      else if (i < batches.length - 1)
        pieces += keepers
      d.withColumn("batch_no", lit((i + 1).toLong))
    }
    decided.reduce(_ unionByName _)
      .select(col("batch_no"), col("doc_id"), col("verdict"), col("matched_id"))
  }

  // ------------------------------------------------- bucketed index layout

  /** Persist the signature index in the BUCKETED layout a recurring ingest
    * wants: `<name>_hash` (text_hash, doc_id) bucketed + bucket-sorted by
    * text_hash, and `<name>_bands` (idx_id, sig_a, band, bh) bucketed by
    * (band, bh) — each table pre-partitioned on exactly its tier's join
    * key. A daily ingest against these shuffles ONLY the arriving batch:
    * the index side of both index-tier joins scans in place with no
    * exchange, no matter how many billions of rows the index holds
    * (BucketedIngestSpec asserts the plans). The bucketing shuffle is
    * paid once, at write; [[appendBucketedIndex]] inserts keepers into
    * the same buckets.
    */
  def writeBucketedIndex(index: DataFrame, name: String, root: String,
      buckets: Int, k: Int, bands: Int): Unit = {
    require(k % bands == 0, "bands must divide k")
    index.select(col("text_hash"), col("doc_id"))
      .write.mode("overwrite").option("path", s"$root/${name}_hash")
      .bucketBy(buckets, "text_hash").sortBy("text_hash")
      .saveAsTable(s"${name}_hash")
    bandedWithSig(index, "idx_id", "sig_a", bands, k / bands)
      .write.mode("overwrite").option("path", s"$root/${name}_bands")
      .bucketBy(buckets, "band", "bh")
      .saveAsTable(s"${name}_bands")
  }

  /** Append accepted docs' rows to both bucketed index tables —
    * O(keepers) work into the existing bucket layout, never a rewrite.
    */
  def appendBucketedIndex(keepers: DataFrame, name: String,
      k: Int, bands: Int): Unit = {
    keepers.select(col("text_hash"), col("doc_id"))
      .write.mode("append").insertInto(s"${name}_hash")
    bandedWithSig(keepers, "idx_id", "sig_a", bands, k / bands)
      .write.mode("append").insertInto(s"${name}_bands")
  }

  /** [[ingestDecisions]] against the bucketed-table index layout. */
  def ingestDecisionsBucketed(spark: org.apache.spark.sql.SparkSession,
      name: String, batchSigs: DataFrame,
      k: Int, bands: Int, minSim: Double): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    decide(spark.table(s"${name}_hash"), spark.table(s"${name}_bands"),
      batchSigs, k, bands, minSim)
  }
}
