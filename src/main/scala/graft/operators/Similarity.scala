package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftnative.FloatVecDot.fdot
import graft.functions.Vectors

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set and
  * stream the candidate corpus once; one shuffle for the per-query top-k
  * window. Scale path: LSH sign-bucketing restricts candidates to one
  * hyperplane bucket, turning the scan into a bucket-join.
  */
object Similarity {

  /** Project to (id, embedding, norm) once so the pair stage only pays one
    * codegen'd dot product per pair instead of three.
    */
  private def withNorm(df: DataFrame, idAs: String, embAs: String): DataFrame =
    df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
      sqrt(fdot(col("embedding"), col("embedding"))).as(s"${embAs}_norm"))

  /** Brute-force top-k: every query vector against every candidate.
    * Queries are broadcast (they are few); candidates stream. Ranking is
    * deterministic: similarity desc, then neighbor id asc.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = withNorm(queries, "query_id", "q_emb")
    val c = withNorm(candidates, "neighbor_id", "c_emb")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** Hard-negative mining for contrastive embedding training: for each
    * query vector, the top-k most-similar candidates with a DIFFERENT
    * label — maximally confusable non-matches, the negatives that carry
    * the gradient signal. Same plan shape as bruteForceTopK (broadcast
    * queries, streaming candidates, one per-query top-k window); the
    * label inequality is a scan-side filter, so mining costs exactly
    * what the ANN scan costs. At 100 TB swap the candidate stream for
    * the IVF/PQ candidate generation the other q_ann_* variants use —
    * the per-query ranking stage is unchanged.
    */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), col("label").as("q_label"),
      sqrt(fdot(col("embedding"), col("embedding"))).as("q_norm"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), col("label").as("c_label"),
      sqrt(fdot(col("embedding"), col("embedding"))).as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id") &&
        col("q_label") =!= col("c_label"))
      .withColumn("sim", fdot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** Embedding near-dup pairs, blocked by coarse-quantizer cell: each
    * vector is assigned to its `nprobe` nearest IVF cells (multi-probe for
    * recall across cell boundaries) and pairs are enumerated only within a
    * shared cell. Unlike blocking on a data column (label, source, ...),
    * cell cardinality is controlled by `k` — no data-dependent hot bucket
    * can go quadratic, and at 100 TB the cell id is a precomputed
    * scan-speed column and the self-join shuffles on it.
    */
  def nearDupPairs(embeddings: DataFrame, minCosine: Double,
      centroids: Seq[Seq[Float]], nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"),
      sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"),
      explode(nearestCells(col("embedding"), centroids, nprobe)).as("cell_id"))
    e.as("x").join(e.as("y"),
        col("x.cell_id") === col("y.cell_id") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("sim",
        fdot(col("x.emb"), col("y.emb")) / (col("x.nrm") * col("y.nrm")))
      .where(col("sim") >= minCosine)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round(col("sim"), 4).as("sim_r"))
      // a pair sharing more than one probed cell surfaces once
      .dropDuplicates("vec_a", "vec_b")
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): assign every
    * embedding to its nearest coarse-quantizer cell (native no-shuffle
    * NearestCells projection), then WITHIN each cell drop any vector that
    * has cosine >= `minCosine` with a lower-id vector — one deterministic
    * representative (the lowest id) survives per near-duplicate group.
    * Returns the DROP list: each dropped vector with its cell, its lowest
    * duplicate partner, how many kept-or-dropped partners flagged it, and
    * its best similarity. Unlike pair emission, output is at most one row
    * per dropped vector, so replica clusters cost O(cluster) rows here vs
    * O(cluster^2) pairs in nearDupPairs — this is the operator a corpus
    * run calls; the pair listing is the diagnostic.
    */
  def semDedup(embeddings: DataFrame, centroids: Seq[Seq[Float]],
      minCosine: Double): DataFrame = {
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    val e = embeddings.select(col("vec_id"), col("embedding").as("emb"),
      sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"),
      element_at(nearestCells(col("embedding"), centroids, 1), 1).as("cell_id"))
    e.as("x").join(e.as("y"),
        col("x.cell_id") === col("y.cell_id") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("sim",
        fdot(col("x.emb"), col("y.emb")) / (col("x.nrm") * col("y.nrm")))
      .where(col("sim") >= minCosine)
      .groupBy(col("y.vec_id").as("vec_id"), col("y.cell_id").as("cell_id"))
      .agg(min(col("x.vec_id")).as("dup_of"),
        count(lit(1)).as("n_dups"),
        round(max(col("sim")), 4).as("best_sim_r"))
  }

  /** Staged semantic dedup — the §4.1-mandated ordering as one operator:
    * (1) collapse BITWISE-identical embeddings to their lowest-id
    * representative (groupBy on the embedding value itself — one slim
    * shuffle; replica clusters never reach the candidate join), then
    * (2) run the cell-blocked semantic drop rule on representatives
    * only. Returns the combined drop list with a `reason` column:
    * 'exact' rows collapsed in stage 1, 'semantic' rows dropped in
    * stage 2. At 100x replication this runs ~5x faster than the raw
    * drop-list and ~20x faster than pair emission (§4.1).
    */
  def semDedupStaged(embeddings: DataFrame, centroids: Seq[Seq[Float]],
      minCosine: Double): DataFrame = {
    // min-over-window, not collect_list: a hot content replicated
    // millions of times must not accumulate into one in-memory array
    val w = Window.partitionBy(col("embedding"))
    val exactDrops = embeddings
      .withColumn("rep_id", min(col("vec_id")).over(w))
      .where(col("vec_id") =!= col("rep_id"))
      .select(col("vec_id"), col("rep_id").as("dup_of"), lit("exact").as("reason"))
    val reps = embeddings.groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val semanticDrops = semDedup(reps, centroids, minCosine)
      .select(col("vec_id"), col("dup_of"), lit("semantic").as("reason"))
    exactDrops.unionByName(semanticDrops)
  }

  /** Cell-assigned rows for the incremental semantic ingest:
    * (vec_id, embedding, nrm, cell_id) — each vector stored under its
    * single nearest quantizer cell, the layout a real IVF index keeps on
    * disk. The assignment is the native no-shuffle NearestCells
    * projection; centroids ride as expression literals.
    */
  def vectorIndex(embeddings: DataFrame, centroids: Seq[Seq[Float]]): DataFrame = {
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    embeddings.select(col("vec_id"), col("embedding"),
      sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"),
      element_at(nearestCells(col("embedding"), centroids, 1), 1).as("cell_id"))
  }

  /** Decide one arriving vector batch against a persisted
    * [[vectorIndex]]-shaped index — the EMBEDDING twin of
    * `Ingest.ingestDecisions` (incremental SemDeDup): the quantizer is
    * NOT retrained and index vectors are touched only in probed cells.
    * One row per batch vector, (vec_id, verdict, matched_id):
    *
    *   1. `exact_index` — bitwise-identical embedding in the index
    *   2. `near_index`  — cosine >= minCosine with an index vector in
    *                      one of the batch vector's `nprobe` cells
    *   3. `exact_batch` — identical to an earlier vector of this batch
    *   4. `near_batch`  — near-dup of an earlier batch vector (both in
    *                      their PRIMARY cell, the semDedup blocking rule)
    *   5. `keep`        — accepted; its index row appends next
    *
    * `matched_id` is the smallest qualifying id at the verdict's own
    * tier; the whole priority rule is ONE hash-aggregable combine (same
    * construction as Ingest.decide — conditional min(long)s, no per-tier
    * join ladder). Scale shape: each batch pays the broadcast-literal
    * cell assignment plus joins keyed on (embedding) and (cell_id) —
    * the index side ships only occupied-cell rows — and the index gains
    * O(keepers) rows per batch, never a rewrite or a re-pairing of
    * existing vectors.
    */
  def semIngestDecisions(index: DataFrame, batch: DataFrame,
      centroids: Seq[Seq[Float]], minCosine: Double, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.NearestCells.nearestCells
    def rows(df: DataFrame, tier: Int, m: Column): DataFrame =
      df.select(col("vec_id"), lit(tier).as("tier"), m.as("m"))
    // consumed by all four tiers: materialize the assigned batch once
    val b = batch.select(col("vec_id"), col("embedding"),
      sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"),
      nearestCells(col("embedding"), centroids, nprobe).as("cells"))
      .localCheckpoint()
    val cos = (ea: Column, eb: Column, na: Column, nb: Column) =>
      fdot(ea, eb) / (na * nb)
    val exactIdx = rows(b.join(
      index.select(col("embedding"), col("vec_id").as("mm")), "embedding"),
      1, col("mm"))
    val bProbed = b.select(col("vec_id").as("b_id"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"), explode(col("cells")).as("cell_id"))
    val nearIdx = rows(bProbed.join(
        index.select(col("vec_id").as("idx_id"), col("embedding").as("emb_a"),
          col("nrm").as("nrm_a"), col("cell_id")), "cell_id")
      .where(cos(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")) >= minCosine)
      .withColumnRenamed("b_id", "vec_id"), 2, col("idx_id"))
    val exactBatch = rows(b.as("x").join(b.as("y"),
        col("x.embedding") === col("y.embedding")
          && col("y.vec_id") < col("x.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("mm")),
      3, col("mm"))
    val bPrim = b.select(col("vec_id"), col("embedding"), col("nrm"),
      element_at(col("cells"), 1).as("cell_id"))
    val nearBatch = rows(bPrim.as("x").join(bPrim.as("y"),
        col("x.cell_id") === col("y.cell_id")
          && col("x.vec_id") < col("y.vec_id"))
      .where(cos(col("x.embedding"), col("y.embedding"),
        col("x.nrm"), col("y.nrm")) >= minCosine)
      .select(col("y.vec_id").as("vec_id"), col("x.vec_id").as("mm")),
      4, col("mm"))
    val best = exactIdx.unionByName(nearIdx)
      .unionByName(exactBatch).unionByName(nearBatch)
      .groupBy(col("vec_id")).agg(
        min(col("tier")).as("best_tier"),
        min(when(col("tier") === 1, col("m"))).as("m1"),
        min(when(col("tier") === 2, col("m"))).as("m2"),
        min(when(col("tier") === 3, col("m"))).as("m3"),
        min(when(col("tier") === 4, col("m"))).as("m4"))
    b.select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"),
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

  /** The incremental semantic-ingest chain: seed index -> decide batch 1
    * -> append its keepers' cell-assigned rows -> decide batch 2 -> ...
    * Mirrors `Ingest.ingestChain` for the embedding side: the index is a
    * list of materialized pieces unioned lazily (one file-append per
    * ingest in a real deployment), each batch costs O(batch x cell
    * occupancy), and index embeddings are never re-paired against each
    * other. Returns every batch's decisions labeled with `batch_no`.
    */
  def semIngestChain(index0: DataFrame, batches: Seq[DataFrame],
      centroids: Seq[Seq[Float]], minCosine: Double, nprobe: Int,
      reliableStagePath: Option[String] = None): DataFrame = {
    // same durability contract as Ingest.ingestChain: default rounds are
    // localCheckpoint; under reliableStagePath every index piece and
    // decision log lands as marker-guarded parquet (the root IS the
    // durable vector index, so a non-empty root is refused on entry)
    val stager = new Dedup.RoundStager(index0.sparkSession, reliableStagePath,
      rootIsArtifact = true)
    val pieces = scala.collection.mutable.ArrayBuffer(
      stager(vectorIndex(index0, centroids), "index_0"))
    val decided = batches.zipWithIndex.map { case (batch, i) =>
      val idx = pieces.reduce(_ unionByName _)
      // the final batch's decisions AND keepers are single-consumer /
      // never read in default mode: skip their blocking materializations
      // (same rule as Ingest.ingestChain); durable mode lands both — the
      // decision log and keeper pieces ARE part of the artifact
      val dRaw = semIngestDecisions(idx, batch, centroids, minCosine, nprobe)
      val d =
        if (reliableStagePath.isDefined || i < batches.length - 1)
          stager(dRaw, s"dec_${i + 1}")
        else dRaw
      val keepers = vectorIndex(batch, centroids)
        .join(d.where(col("verdict") === "keep").select(col("vec_id")), "vec_id")
      if (reliableStagePath.isDefined)
        pieces += stager(keepers, s"keepers_${i + 1}")
      else if (i < batches.length - 1)
        pieces += keepers
      d.withColumn("batch_no", lit((i + 1).toLong))
    }
    decided.reduce(_ unionByName _)
      .select(col("batch_no"), col("vec_id"), col("verdict"), col("matched_id"))
  }

  /** Int8-quantized ANN: candidates travel as `array<tinyint>` codes + one
    * scale + one norm per vector (4x smaller than fp32 — at 100 TB that is
    * the scan, the shuffle, AND the broadcast), the top `k * prefilter`
    * per query are ranked by the EXACT integer dot of the quantized codes,
    * and only those survivors re-join the fp32 table for exact cosine
    * re-ranking. Result is identical to bruteForceTopK whenever the
    * prefilter margin holds (quantization error ~1/127 per side vs the
    * sim gap between rank k and rank k*prefilter) — which the oracle
    * check enforces rather than assumes.
    */
  def int8TopK(queries: DataFrame, candidates: DataFrame, k: Int,
      prefilter: Int): DataFrame = {
    import org.apache.spark.sql.graftnative.ByteVecDot.bdot
    import graft.functions.Vectors
    def quantized(df: DataFrame, idAs: String, pfx: String): DataFrame =
      df
        .withColumn("scale", Vectors.int8Scale(col("embedding")))
        .select(col("vec_id").as(idAs),
          Vectors.quantize(col("embedding"), col("scale")).as(s"${pfx}_q"),
          col("scale").as(s"${pfx}_scale"),
          sqrt(fdot(col("embedding"), col("embedding"))).as(s"${pfx}_norm"))
    val q8 = quantized(queries, "query_id", "q")
    val c8 = quantized(candidates, "neighbor_id", "c")
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("sim8").desc, col("neighbor_id").asc)
    val survivors = c8.crossJoin(broadcast(q8))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim8",
        bdot(col("q_q"), col("c_q")) * col("q_scale") * col("c_scale") /
          (col("q_norm") * col("c_norm")))
      .withColumn("rank8", row_number().over(wApprox))
      .where(col("rank8") <= k * prefilter)
      .select(col("query_id"), col("neighbor_id"))
    // only the survivors' fp32 embeddings are touched again
    val qf = withNorm(queries, "query_id", "q_emb")
    val cf = withNorm(candidates, "neighbor_id", "c_emb")
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    survivors
      .join(cf, "neighbor_id")
      .join(broadcast(qf), "query_id")
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** JL-prefiltered ANN: candidates are pruned by squared L2 distance in
    * the 8-dim sign-projected space (Vectors.jlProject — scan-speed
    * native columns), and only the k*prefilter survivors touch fp32
    * again for the exact cosine rerank. Same two-phase plan as int8TopK
    * but the approximate pass reads 8 doubles instead of 64 floats —
    * the JL distance guarantee bounds the recall loss, and both phases
    * replay exactly in the SQL oracle (deterministic sign matrix,
    * ascending-j distance sum).
    */
  def jlTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      prefilter: Int, dim: Int, kProj: Int): DataFrame = {
    import graft.functions.Vectors
    def projected(df: DataFrame, idAs: String, pfx: String): DataFrame =
      df.select(col("vec_id").as(idAs) +:
        Vectors.jlProject(col("embedding"), dim, kProj)
          .zipWithIndex.map { case (c, j) => c.as(s"${pfx}_r_$j") }: _*)
    val qp = projected(queries, "query_id", "q")
    val cp = projected(candidates, "neighbor_id", "c")
    // flat codegen'd ascending-j sum, no array/HOF round trip
    val approxDist = (0 until kProj).map { j =>
      val d = col(s"q_r_$j") - col(s"c_r_$j"); d * d
    }.reduce(_ + _)
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("ad").asc, col("neighbor_id").asc)
    val survivors = cp.crossJoin(broadcast(qp))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("ad", approxDist)
      .withColumn("rank8", row_number().over(wApprox))
      .where(col("rank8") <= k * prefilter)
      .select(col("query_id"), col("neighbor_id"))
    val qf = withNorm(queries, "query_id", "q_emb")
    val cf = withNorm(candidates, "neighbor_id", "c_emb")
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    survivors
      .join(cf, "neighbor_id")
      .join(broadcast(qf), "query_id")
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** Per-group centroid (mean) embeddings — classifier prototypes /
    * cluster summaries. posexplode -> (group, dim) exact-decimal mean ->
    * regroup: ONE shuffle whose rows are (group, dim, partial) — dim
    * floats per input row never travel twice — and the decimal sums make
    * the centroids bit-reproducible across layouts (same recipe as IVF
    * training).
    */
  def groupCentroids(embeddings: DataFrame, groupCol: String): DataFrame =
    embeddings
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg((sum(col("v").cast("decimal(20,10)")).cast("double") /
        count(lit(1))).cast("float").as("m"),
        count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(
        array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"),
        min(col("n")).as("n_vectors"))
      .select(col(groupCol), expr("transform(pm, x -> x.m)").as("centroid"),
        col("n_vectors"))

  /** Embedding-column quality report: per-group counts of NULL vectors,
    * wrong-dimensionality vectors, vectors containing NaN/Inf, and
    * zero-norm vectors — the validation gate an embedding pipeline runs
    * before any similarity math consumes the column. One aggregate scan.
    */
  def embeddingQuality(embeddings: DataFrame, groupCol: String, dim: Int): DataFrame =
    embeddings
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(col("embedding").isNull, 1)).as("n_null"),
        count(when(col("embedding").isNotNull && size(col("embedding")) =!= dim, 1))
          .as("n_wrong_dim"),
        count(when(exists(col("embedding"), v => isnan(v) || v === Float.PositiveInfinity ||
          v === Float.NegativeInfinity), 1)).as("n_nonfinite"),
        count(when(fdot(col("embedding"), col("embedding")) === 0.0, 1)).as("n_zero_norm"))

  /** Deterministic pseudo-random hyperplanes: component (i, j) derives from
    * a fixed LCG walk — reproducible across runs/executors, no RNG state.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var state = 42L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 32 bits -> [-1, 1)
      (state >>> 32).toDouble / Int.MaxValue.toDouble - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-LSH bucket id: bit p is set when dot(embedding, plane_p) > 0.
    * Native codegen expression; the plane matrix rides as a reference
    * object rather than (planes x dim) column literals.
    */
  def lshBucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftnative.FloatVecLshBucket.lshBucket(emb, planes)

  /** LSH-bucketed ANN: queries join candidates only within their sign
    * bucket. Trades recall for a corpus-scan-free candidate set — at 100 TB
    * the bucket column is precomputed and the join is bucket-partitioned.
    */
  /** Multi-probe sign-LSH top-k: each query probes its own bucket AND
    * every bucket at Hamming distance 1 (one flipped hyperplane sign) —
    * the standard recall fix for near-boundary vectors, at the cost of
    * (nPlanes+1) probe rows per QUERY only; the candidate side is
    * untouched, so the big side still joins on its single precomputed
    * bucket. A pair can match on at most one probe (the candidate holds
    * exactly one bucket and the probe set is distinct), so no dedup
    * stage is needed before ranking.
    */
  def lshMultiProbeTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val masks = lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))
    val q = withNorm(queries, "query_id", "q_emb")
      .withColumn("bucket0", lshBucket(col("q_emb"), planes))
      .select(col("query_id"), col("q_emb"), col("q_emb_norm"),
        explode(array(masks.map(m => col("bucket0").bitwiseXOR(m)): _*)).as("bucket"))
    val c = withNorm(candidates, "neighbor_id", "c_emb")
      .withColumn("bucket", lshBucket(col("c_emb"), planes))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val q = withNorm(queries, "query_id", "q_emb")
      .withColumn("bucket", lshBucket(col("q_emb"), planes))
    val c = withNorm(candidates, "neighbor_id", "c_emb")
      .withColumn("bucket", lshBucket(col("c_emb"), planes))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        fdot(col("q_emb"), col("c_emb")) / (col("q_emb_norm") * col("c_emb_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("bucket"), col("rank"),
        round(col("sim"), 4).as("sim_r"))
  }

  /** Per-tier theoretical sign-LSH collision rate in basis points:
    * (1 - acos(mid)/pi)^nPlanes at the tier midpoint, computed ONCE on
    * the driver so both engines inline the identical literals (libm
    * acos/pow can differ in the last ulp across engines; a plan literal
    * cannot). Tier t covers cosine [t/10, (t+1)/10). */
  def lshTheoreticalBp(nPlanes: Int): Seq[(Int, Long)] =
    (-10 to 9).map { t =>
      val mid = math.max(-1.0, math.min(1.0, (t + 0.5) / 10.0))
      val p = math.pow(1.0 - math.acos(mid) / math.Pi, nPlanes)
      t -> math.floor(p * 10000.0 + 0.5).toLong
    }

  /** Sign-LSH CALIBRATION twin of [[lshTopK]] (the minhash/simhash
    * calibration pattern applied to the cosine estimator): the measured
    * bucket-collision rate per exact-cosine tier over the live query
    * panel x the full corpus — the trust contract a 100 TB ANN run needs
    * before it lets the bucket join gate recall. Per tier
    * (floor(sim_r*10), clamped to [-10, 9]): pair count, same-bucket
    * collisions, collision rate in bp, mean bucket hamming distance, and
    * the theoretical (1-acos(c)/pi)^nPlanes rate at the tier midpoint as
    * a plan literal ([[lshTheoreticalBp]]) so measured-vs-theory reads
    * off one row.
    *
    * Deliberately O(|Q| x N): calibration runs on a bounded sampled
    * query panel (broadcast nested-loop, no shuffle) because the exact
    * cosine of MISSED pairs is precisely what the bucket join cannot
    * provide; the aggregate is bounded at 20 tiers.
    */
  def lshCalibration(queries: DataFrame, candidates: DataFrame,
      nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val q = withNorm(queries, "query_id", "q_emb")
      .withColumn("q_bucket", lshBucket(col("q_emb"), planes))
    val c = withNorm(candidates, "neighbor_id", "c_emb")
      .withColumn("c_bucket", lshBucket(col("c_emb"), planes))
    val theo = lshTheoreticalBp(nPlanes)
    val theoCol = theo.tail.foldLeft(
      when(col("tier") === theo.head._1, lit(theo.head._2))) {
      case (acc, (t, v)) => acc.when(col("tier") === t, lit(v))
    }
    c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id") &&
        col("q_emb_norm") > 0.0 && col("c_emb_norm") > 0.0)
      .withColumn("sim_r", round(
        fdot(col("q_emb"), col("c_emb")) /
          (col("q_emb_norm") * col("c_emb_norm")), 4))
      .withColumn("hamming",
        bit_count(col("q_bucket").bitwiseXOR(col("c_bucket"))).cast("long"))
      .withColumn("tier", least(floor(col("sim_r") * 10.0), lit(9L)).cast("int"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("hamming") === 0, 1)).as("n_collide"),
        floor(count(when(col("hamming") === 0, 1)) * 10000.0 / count(lit(1)) + 0.5)
          .cast("long").as("collide_bp"),
        (floor(sum(col("hamming")) * 10000.0 / count(lit(1)) + 0.5) / 10000.0)
          .as("mean_hamming_r"))
      .withColumn("theo_bp", theoCol)
  }

  /** Per-rank nDCG discount weights in integer micro-units:
    * W_r = round(10⁶ / log2(r+1)) — computed ONCE on the driver so both
    * engines inline the identical integers and the whole nDCG pipeline
    * stays in exact BIGINT arithmetic. */
  def ndcgWeightsMicro(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Ranking-quality (nDCG) audit of ANY approximate ANN ranking against
    * the brute-force ideal — the calibration-family member for ORDER,
    * where [[graft.operators.Ivf.recallAudit]] audits set membership:
    * recall treats a hit at rank 1 and rank k the same, nDCG discounts by
    * position (the metric retrieval evaluations actually quote). Binary
    * relevance (approx neighbor ∈ ideal top-k), integer micro-unit
    * discounts ([[ndcgWeightsMicro]]), and the final
    * ndcg = DCG·10⁶ DIV IDCG is exact integer division — the entire
    * audit is float-free past the (already rank-certified) similarity
    * ordering. A query whose probes return nothing scores 0, kept by
    * the ideal-side panel. `approxRanking` is any (query_id,
    * neighbor_id, rank ≤ k) frame — IVF, LSH, PQ: the audit composes
    * with every registered searcher.
    *
    * Scale shape: both rankings are the registered operators' own plans;
    * the audit adds one slim (query, neighbor) join and two bounded
    * per-query aggregates.
    */
  def ndcgAudit(queries: DataFrame, candidates: DataFrame, k: Int,
      approxRanking: DataFrame): DataFrame = {
    val wArr = typedLit(ndcgWeightsMicro(k).toArray)
    val ideal = bruteForceTopK(queries, candidates, k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .localCheckpoint()
    val approx = approxRanking
      .select(col("query_id"), col("neighbor_id"), col("rank").as("arank"))
    val dcg = approx
      .join(ideal.select(col("query_id"), col("neighbor_id"),
        lit(1L).as("rel")), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_approx"),
        sum(coalesce(col("rel"), lit(0L))).as("n_hits"),
        sum(when(col("rel").isNotNull,
          element_at(wArr, col("arank").cast("int"))).otherwise(0L))
          .as("dcg_micro"))
    ideal.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_ideal"),
        sum(element_at(wArr, col("rank").cast("int"))).as("idcg_micro"))
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_ideal"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        col("idcg_micro"),
        expr("coalesce(dcg_micro, CAST(0 AS BIGINT)) * 1000000 DIV idcg_micro")
          .as("ndcg_micro"))
      .orderBy(col("query_id"))
  }

  /** MRR + recall@k audit — the third member of the ranking-quality
    * family: [[graft.operators.Ivf.recallAudit]] measures set coverage,
    * [[ndcgAudit]] position-discounted order, and this the metric
    * retrieval papers quote alongside them — the reciprocal rank of the
    * FIRST relevant result (relevant = member of the brute-force ideal
    * top-k). `rr_micro = 10⁶ DIV first_hit_rank` is exact integer
    * division; recall@k in bp rides along. A query whose probes return
    * no relevant result scores 0 with a NULL first_hit_rank, kept by
    * the ideal-side panel. Same composability contract as ndcgAudit:
    * `approxRanking` is any (query_id, neighbor_id, rank) frame — and
    * it is capped to rank ≤ k here, so a caller passing a DEEPER
    * ranking cannot silently inflate recall@k (MRR is unaffected: the
    * first hit inside the top-k has the same minimal rank in any
    * superset of the top-k).
    */
  def mrrAudit(queries: DataFrame, candidates: DataFrame, k: Int,
      approxRanking: DataFrame): DataFrame = {
    val ideal = bruteForceTopK(queries, candidates, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    val hits = approxRanking
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("arank"))
      .join(ideal, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(min(col("arank")).as("first_hit_rank"),
        count(lit(1)).as("n_hits"))
    ideal.groupBy(col("query_id")).agg(count(lit(1)).as("n_ideal"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_ideal"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_hit_rank"),
        coalesce(expr("1000000 DIV first_hit_rank"), lit(0L)).as("rr_micro"),
        expr("coalesce(n_hits, CAST(0 AS BIGINT)) * 10000 DIV n_ideal")
          .as("recall_bp"))
      .orderBy(col("query_id"))
  }

  /** Top principal component by POWER ITERATION — the training-side
    * linear algebra the embedding family was missing (the ANN/semdedup
    * operators consume vectors; this one characterizes them: the
    * dominant direction and how much of the corpus variance it carries
    * — the first number a PCA/whitening/low-rank-compression decision
    * reads). v ← AᵀA v, normalized, `iters` times from the fixed
    * uniform start vector.
    *
    * Every step is ORDER-PROOF by per-component integer quantization —
    * no cross-row or cross-component double sum anywhere:
    *   - per-row dot: each x_j·v_j quantizes to nano-units
    *     (floor(·1e9+0.5), one IEEE multiply — engine-identical), and
    *     the row's dot is an exact integer sum;
    *   - the update u_j = Σ_rows floor(x_j·dot·1e6+0.5) sums exact
    *     longs (map-side combinable, partition-order free);
    *   - normalization reads ‖u‖ from the exact decimal Σu² cast to
    *     double ONCE, and the next iterate re-quantizes to 6 dp.
    * The quantization IS the operator's definition: both engines replay
    * bit-for-bit, and the ~1e-6 per-step rounding is far below the
    * estimator's own convergence error at 6 iterations.
    *
    * Output: one row per component j — loading_r6, the final update
    * vector u_micro, with the Rayleigh eigenvalue estimate
    * (eig_micro = vᵀAᵀAv in micro-units, exact integer arithmetic off
    * p = 1e6·v), its share of total variance (vs the exact quantized
    * trace ΣᵢΣⱼ xᵢⱼ²), and n_vectors riding.
    *
    * Scale shape: per iteration ONE corpus scan (dim-bounded lambda
    * work per row) collapsing to a dim-row aggregate; driver state is
    * the dim-length vector (the k-means-seed bounded-state precedent).
    * Power iteration's classic failure (λ₁ ≈ λ₂ slow convergence) is
    * an accuracy note, not a correctness one — the output is the
    * DEFINED 6-iteration iterate, deterministic everywhere.
    */
  def pcaPower(embs: DataFrame, dim: Int = 64, iters: Int = 6): DataFrame = {
    require(dim >= 1 && iters >= 1)
    val spark = embs.sparkSession
    import spark.implicits._
    val base = embs
      .where(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("xd"))
      .localCheckpoint() // one materialization feeds iters+1 scans
    val (traceMicro, nVec) = quantizedTrace(base, dim)
    val (p, u) = powerIterate(base, dim, iters)
    val eig = ((0 until dim).map(j => BigInt(p(j)) * BigInt(u(j))).sum
      / BigInt(1000000))
    val share =
      if (traceMicro > 0) (eig * 10000 / BigInt(traceMicro)).toLong else 0L
    (0 until dim).map(j => (j.toLong, p(j).toDouble / 1000000.0, u(j)))
      .toDF("j", "loading_r6", "u_micro")
      .withColumn("eig_micro", lit(eig.toLong))
      .withColumn("var_share_bp", lit(share))
      .withColumn("n_vectors", lit(nVec))
      .orderBy(col("j"))
  }

  /** The exact quantized trace ΣᵢΣⱼ floor(xᵢⱼ²·1e6+0.5) and row count of
    * a (vec_id, xd) frame — the variance denominator [[pcaPower]] and
    * [[pcaTopR]] share (always measured on the ORIGINAL corpus: each
    * component's share is of TOTAL variance, not of the deflated rest).
    */
  private def quantizedTrace(base: DataFrame, dim: Int): (Long, Long) = {
    val tr = base.select(expr(
      s"""aggregate(transform(sequence(0, ${dim - 1}),
         |  i -> CAST(floor(element_at(xd, i + 1) * element_at(xd, i + 1)
         |    * 1000000.0 + 0.5) AS BIGINT)),
         |  CAST(0 AS BIGINT), (acc, t) -> acc + t)""".stripMargin).as("ssq"))
      .agg(coalesce(sum(col("ssq")), lit(0L)).as("trace_micro"),
        count(lit(1)).as("n_vectors"))
      .collect().head
    (tr.getLong(0), tr.getLong(1))
  }

  /** One quantized power iteration run over a (vec_id, xd) frame — the
    * shared engine of [[pcaPower]] and every [[pcaTopR]] component:
    * `iters` rounds of v ← AᵀAv from the fixed 0.125 start, every step
    * integer-quantized exactly as pcaPower's docstring defines. Returns
    * (p, u): the 1e6-quantized final iterate and its final exact
    * integer update vector.
    */
  private def powerIterate(base: DataFrame, dim: Int,
      iters: Int): (Array[Long], Array[Long]) = {
    var v: Array[Double] = Array.fill(dim)(0.125)
    var u: Array[Long] = Array.fill(dim)(0L)
    var p: Array[Long] = v.map(x => math.round(x * 1e6))
    for (_ <- 1 to iters) {
      val uRows = base.withColumn("vl", typedLit(v.toSeq))
        .withColumn("dn", expr(
          s"""aggregate(transform(sequence(0, ${dim - 1}),
             |  i -> CAST(floor(element_at(xd, i + 1) * element_at(vl, i + 1)
             |    * 1000000000.0 + 0.5) AS BIGINT)),
             |  CAST(0 AS BIGINT), (acc, t) -> acc + t)""".stripMargin))
        .select(col("dn"), posexplode(col("xd")).as(Seq("j", "x")))
        .select(col("j"), expr(
          """CAST(floor(x * (CAST(dn AS DOUBLE) / 1000000000.0)
            |  * 1000000.0 + 0.5) AS BIGINT)""".stripMargin).as("cm"))
        .groupBy(col("j")).agg(sum(col("cm")).as("u"))
        .collect()
      u = Array.fill(dim)(0L)
      uRows.foreach(r => u(r.getInt(0)) = r.getLong(1))
      val norm2 = u.map(x => BigInt(x) * BigInt(x)).sum
      val nm = math.sqrt(norm2.toDouble)
      if (nm > 0.0) {
        p = u.map(x => math.floor(x / nm * 1e6 + 0.5).toLong)
        v = p.map(_.toDouble / 1000000.0)
      }
    }
    (p, u)
  }

  /** Top-r principal components by DEFLATION over [[pcaPower]]'s
    * quantized power iteration — the whitening / low-rank-compression
    * decision needs 2-4 directions, not one: after each component, every
    * row sheds its projection onto the 1e6-QUANTIZED loading vector
    *
    *   x′ⱼ = xⱼ − (dotₙ/1e9)·vⱼ     dotₙ = Σᵢ floor(xᵢ·vᵢ·1e9 + 0.5)
    *
    * — the projection coefficient is the same exact-integer nano-dot the
    * iteration itself uses, and the per-coordinate update is one IEEE
    * multiply + one subtract on engine-identical inputs, so the deflated
    * corpus (and therefore every later component) replays bit-for-bit on
    * any engine; the next component runs the IDENTICAL iteration on x′.
    *
    * Output: one row per (component, j) — loading_r6, u_micro, the
    * per-component Rayleigh eig_micro and its share of TOTAL (original)
    * variance, plus the ORTHOGONALITY CERTIFICATE: ortho_max_e12 = the
    * max |Σⱼ pₐ(j)·p_b(j)| over component pairs, an exact BigInt dot of
    * the quantized loadings in 1e-12 units (a genuinely orthogonal pair
    * quantized at 6 dp lands ≲ dim·1e6/2 — publishing the number makes
    * near-parallel "components" from a failed deflation loud).
    *
    * Scale shape: r independent pcaPower runs, each ONE corpus scan per
    * iteration; deflation is one more scan per component; driver state
    * is r dim-length vectors. The deflated frames localCheckpoint so
    * component c+1's scans do not recompute c's projection lambda.
    */
  def pcaTopR(embs: DataFrame, dim: Int = 64, iters: Int = 6,
      r: Int = 2): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val (comps, traceMicro, nVec) = pcaComponents(embs, dim, iters, r)
    val orthoMax = (for {
      a <- comps.indices; b <- (a + 1) until comps.length
    } yield (0 until dim).map(j =>
      BigInt(comps(a)._2(j)) * BigInt(comps(b)._2(j))).sum.abs)
      .foldLeft(BigInt(0))(_ max _)
    comps.flatMap { case (c, p, u) =>
      val eig = pcaEig(p, u)
      val share =
        if (traceMicro > 0) (eig * 10000 / BigInt(traceMicro)).toLong else 0L
      (0 until dim).map(j => (c.toLong, j.toLong,
        p(j).toDouble / 1000000.0, u(j), eig.toLong, share))
    }.toDF("component", "j", "loading_r6", "u_micro", "eig_micro",
      "var_share_bp")
      .withColumn("ortho_max_e12", lit(orthoMax.toLong))
      .withColumn("n_vectors", lit(nVec))
      .orderBy(col("component"), col("j"))
  }

  /** The Rayleigh eigenvalue in micro-units off a (p, u) pair — one
    * definition shared by [[pcaTopR]] and [[pcaWhiten]]. */
  private def pcaEig(p: Array[Long], u: Array[Long]): BigInt =
    (p.indices.map(j => BigInt(p(j)) * BigInt(u(j))).sum / BigInt(1000000))

  /** The component-derivation engine behind [[pcaTopR]] and
    * [[pcaWhiten]]: r (p, u) pairs by quantized power iteration +
    * deflation, plus the original-corpus trace and row count. One
    * definition so the transform can never derive different directions
    * than the published decomposition. */
  private def pcaComponents(embs: DataFrame, dim: Int, iters: Int,
      r: Int): (Seq[(Int, Array[Long], Array[Long])], Long, Long) = {
    require(dim >= 1 && iters >= 1 && r >= 1)
    var base = embs
      .where(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("xd"))
      .localCheckpoint()
    val (traceMicro, nVec) = quantizedTrace(base, dim)
    val comps = (1 to r).map { c =>
      val (p, u) = powerIterate(base, dim, iters)
      if (c < r) {
        val vq = p.map(_.toDouble / 1000000.0).toSeq
        base = base.withColumn("vl", typedLit(vq))
          .withColumn("dn", expr(
            s"""aggregate(transform(sequence(0, ${dim - 1}),
               |  i -> CAST(floor(element_at(xd, i + 1) * element_at(vl, i + 1)
               |    * 1000000000.0 + 0.5) AS BIGINT)),
               |  CAST(0 AS BIGINT), (acc, t) -> acc + t)""".stripMargin))
          .select(col("vec_id"), expr(
            s"""transform(sequence(0, ${dim - 1}),
               |  i -> element_at(xd, i + 1)
               |    - (CAST(dn AS DOUBLE) / 1000000000.0)
               |      * element_at(vl, i + 1))""".stripMargin).as("xd"))
          .localCheckpoint()
      }
      (c, p, u)
    }
    (comps, traceMicro, nVec)
  }

  /** PCA WHITENING transform — the decision [[pcaTopR]] informs,
    * executed: every vector's coordinates in the top-r principal
    * directions, scaled to unit variance,
    *
    *   w_c = (x·v_c) · sqrt(n / λ_c)       λ_c = eig_c/1e6
    *
    * with x·v_c the same exact nano-unit integer dot the iteration
    * uses (against the ORIGINAL vector — the quantized components are
    * orthogonal to ~1e-6, certified by pcaTopR's ortho column, so
    * projecting the original equals projecting the residual to the
    * publication grid), and the scale ONE double chain (divide, sqrt,
    * multiply — IEEE-exact-rounded on exact integer inputs, so both
    * engines produce the identical 6-dp w). NULL w for a component
    * with non-positive eigenvalue (nothing to whiten along).
    *
    * Output: one row per vector — vec_id, c{1..r}_nano (the raw
    * projection dots), w{1..r}_micro (whitened coords). Downstream: a
    * trainer dedups/filters/bins on whitened coords with every
    * direction equally weighted.
    *
    * Scale shape: the derivation is [[pcaComponents]]'s r·iters+r
    * bounded scans; the transform itself is ONE corpus scan with r
    * plan-literal vectors — no shuffle, no state.
    */
  def pcaWhiten(embs: DataFrame, dim: Int = 64, iters: Int = 6,
      r: Int = 2): DataFrame = {
    val (comps, _, nVec) = pcaComponents(embs, dim, iters, r)
    val base = embs
      .where(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("xd"))
    val withDots = comps.foldLeft(base) { case (df, (c, p, _)) =>
      val vq = p.map(_.toDouble / 1000000.0).toSeq
      df.withColumn(s"vl$c", typedLit(vq))
        .withColumn(s"c${c}_nano", expr(
          s"""aggregate(transform(sequence(0, ${dim - 1}),
             |  i -> CAST(floor(element_at(xd, i + 1) * element_at(vl$c, i + 1)
             |    * 1000000000.0 + 0.5) AS BIGINT)),
             |  CAST(0 AS BIGINT), (acc, t) -> acc + t)""".stripMargin))
    }
    val out = comps.foldLeft(withDots) { case (df, (c, p, u)) =>
      val eig = pcaEig(p, u).toLong
      df.withColumn(s"w${c}_micro",
        if (eig > 0L)
          expr(s"""CAST(floor(CAST(c${c}_nano AS DOUBLE) / 1000000000.0
                  |  * sqrt(CAST($nVec AS DOUBLE) * 1000000.0
                  |    / CAST($eig AS DOUBLE))
                  |  * 1000000.0 + 0.5) AS BIGINT)""".stripMargin)
        else lit(null).cast("long"))
    }
    out.select(col("vec_id") +:
      comps.map { case (c, _, _) => col(s"c${c}_nano") } ++:
      comps.map { case (c, _, _) => col(s"w${c}_micro") }: _*)
      .orderBy(col("vec_id"))
  }
}
