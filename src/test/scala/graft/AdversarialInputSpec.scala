package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Adversarial-input hardening, round 2 (the r6 empty-input sweep caught
  * a real NPE; this extends the sweep to degenerate-but-legal corpora):
  * a single-document corpus, an all-identical corpus (vocabulary smaller
  * than vocabSize, BPE pair pool exhausted mid-training), a benchmark
  * larger than the corpus it decontaminates, and ANN requests for more
  * neighbors than exist. Every case must return the mathematically right
  * (often empty or truncated) answer — never throw, never pad.
  */
class AdversarialInputSpec extends SparkSpec {
  import spark.implicits._

  private def oneDoc = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0")
  ).toDF("doc_id", "text", "lang", "source")

  test("r8 operators: single-doc and empty corpora return right-sized answers") {
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    // embeddings / index / postings over one doc or none
    assert(TextAnalysis.textEmbed(oneDoc, dim = 8).count() == 1)
    assert(TextAnalysis.textEmbed(empty, dim = 8).count() == 0)
    assert(TextAnalysis.invertedIndex(empty, maxPostings = 4).count() == 0)
    assert(TextAnalysis.textSemDedup(oneDoc.select(col("doc_id"), col("text")),
      dim = 8, nPlanes = 4, minCosine = 0.9).count() == 0)
    assert(TextAnalysis.textSemDedup(empty.select(col("doc_id"), col("text")),
      dim = 8, nPlanes = 4, minCosine = 0.9).count() == 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-adv-r8").toString
    assert(Dedup.editDistNearDups(oneDoc, k = 64, bands = 16,
      minSim = 0.5, minEditSim = 0.8).count() == 0)
    assert(Dedup.editDistNearDups(empty, k = 64, bands = 16,
      minSim = 0.5, minEditSim = 0.8).count() == 0)
    assert(Dedup.stagedEditDistNearDups(oneDoc, s"$tmp/reps", k = 64,
      bands = 16, minSim = 0.5, minEditSim = 0.8).count() == 0)
  }

  test("r8 nbQuality: one-class and empty seed sets degrade gracefully") {
    val docs = Seq(
      (1L, "good words here"), (2L, "more good words"),
      (3L, "other text body"), (4L, "junk junk junk")
    ).toDF("doc_id", "text")
    // one-class seeds (no negative evidence): weights still well-defined
    // (Laplace smoothing over the pos-only vocabulary), nothing throws,
    // every doc scored
    val oneClass = TextAnalysis.nbQuality(docs,
      posSeed = col("doc_id") <= 2, negSeed = lit(false), vocabSize = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(oneClass.size == 4)
    assert(oneClass.values.forall(!_.isNullAt(2)))  // nb_score_r non-null
    // empty seeds: no model at all — every doc scores 0 and keeps
    // (no evidence must not silently drop the corpus)
    val noSeeds = TextAnalysis.nbQuality(docs,
      posSeed = lit(false), negSeed = lit(false), vocabSize = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("nb_score_r"), r.getAs[Boolean]("keep"))).toMap
    assert(noSeeds.size == 4)
    assert(noSeeds.values.forall { case (s, k) => s == 0.0 && k })
  }

  test("r8 semIngest: empty index (first-ever ingest) and empty batch") {
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val seed = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    val centroids = Ivf.train(seed, k = 2, iters = 1)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // first-ever ingest: everything in batch 1 keeps (or dedups within batch)
    val out = Similarity.semIngestChain(emptyVecs,
      Seq(Seq((10L, a), (11L, a)).toDF("vec_id", "embedding")), centroids,
      minCosine = 0.95, nprobe = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(out == Map(10L -> "keep", 11L -> "exact_batch"))
    // empty batch mid-chain: zero decision rows for it, chain continues
    val out2 = Similarity.semIngestChain(seed,
      Seq(emptyVecs, Seq((20L, a)).toDF("vec_id", "embedding")), centroids,
      minCosine = 0.95, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out2 == Map((2L, 20L) -> "exact_index"))
  }

  test("single-document corpus: dedup finds nothing, analytics still report") {
    // pair-emitting dedups: no second doc, so zero pairs everywhere
    assert(Dedup.minhashNearDups(oneDoc, k = 64, bands = 16, minSim = 0.5).count() == 0)
    assert(Dedup.simhashNearDups(oneDoc, maxHamming = 3).count() == 0)
    assert(Dedup.ngramJaccardPairs(oneDoc, minJaccard = 0.5, maxLenDiff = 40).count() == 0)
    assert(Contamination.pairDupSpans(oneDoc, n = 3, maxOcc = 8).count() == 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-adv-1doc").toString
    assert(Dedup.stagedNearDups(oneDoc, s"$tmp/reps",
      k = 64, bands = 16, minSim = 0.5).count() == 0)
    // per-doc analytics still emit the one row
    assert(Dedup.exactDedup(oneDoc).count() == 1)
    assert(TextAnalysis.vocabCoverage(oneDoc, vocabSize = 5).count() == 1)
    assert(Dedup.lineDedup(oneDoc, maxDocs = 10).count() == 1)
  }

  test("all-identical corpus: vocab collapses, exact dedup keeps min id") {
    val clones = (1L to 12L).map(i =>
      (i, "aa bb aa bb cc", "en", "s0")).toDF("doc_id", "text", "lang", "source")
    // one content group, min-id keeper, all 12 counted
    val groups = Dedup.exactDedup(clones).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_doc_id") == 1L)
    assert(groups.head.getAs[Long]("dup_count") == 12L)
    // vocabulary (3 types) far below vocabSize: top-K must return what
    // exists, not pad to K
    val vocab = TextAnalysis.vocabTopK(clones, k = 100).collect()
    assert(vocab.length == 3)
  }

  test("BPE pair pool exhaustion pads NoMerge and still segments correctly") {
    // single 2-char word: exactly ONE pair exists ("a","a"); asking for 5
    // merges exhausts the pool after the first — the rest must be the
    // NoMerge sentinel, and applying the padded chain must be identical
    // to applying only the real prefix (NoMerge is an identity rule)
    val tiny = Seq((1L, "aa aa aa", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val merges = Bpe.trainMerges(tiny, vocabSize = 10, numMerges = 5)
    assert(merges.length == 5)
    assert(merges.count(_ == Bpe.NoMerge) == 4)
    val padded = Bpe.tokenCounts(tiny, merges).head()
    val exact = Bpe.tokenCounts(tiny, merges.filterNot(_ == Bpe.NoMerge)).head()
    assert(padded.getAs[Long]("n_bpe_tokens") == 3L) // each "aa" merges to 1 symbol
    assert(padded.getAs[String]("bpe_hash") == exact.getAs[String]("bpe_hash"))
    // empty corpus: every merge is NoMerge, application is the identity
    val emptyDocs = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    val none = Bpe.trainMerges(emptyDocs, vocabSize = 10, numMerges = 3)
    assert(none.forall(_ == Bpe.NoMerge))
    // all-identity chain: every character stays its own symbol (47 letters)
    assert(Bpe.tokenCounts(oneDoc, none).head().getAs[Long]("n_bpe_tokens") == 47L)
  }

  test("benchmark larger than the corpus: decontam reports plain overlap") {
    val corpus = Seq((1L, "a b c d e f g h i j"), (2L, "zz yy xx ww vv uu tt ss rr qq"))
      .toDF("doc_id", "text")
    // 50-doc benchmark, one of which contains corpus doc 1's text
    val bench = ((1L to 49L).map(i => (100L + i, s"filler$i " * 9 + s"end$i")) :+
      (150L, "a b c d e f g h i j")).toDF("doc_id", "text")
    // join form reports contaminated docs only; the bloom scan gate
    // reports every doc — both must count doc 1's 3 windows, zero for doc 2
    for (out <- Seq(
        Contamination.decontaminate(corpus, bench, n = 8),
        Contamination.decontaminateBloom(corpus, bench, n = 8,
          mBits = 65536, kProbes = 4))) {
      val hits = out.collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
      assert(hits(1L) == 3L) // 10 tokens -> 3 8-gram windows, all hit
      assert(hits.getOrElse(2L, 0L) == 0L)
    }
  }

  test("ANN with k larger than the candidate set returns all candidates, ranked") {
    val vecs = (0L until 3L).map(i =>
      (i, Array.tabulate(64)(d => (if (d == i) 1f else 0f) + 0.01f * d), i.toInt))
      .toDF("vec_id", "embedding", "label")
    // brute force: each query can see only the 2 other vectors
    val brute = Similarity.bruteForceTopK(vecs, vecs, k = 10)
    assert(brute.count() == 6)
    // quantizer trained with k centroids > corpus: seeds truncate to the
    // corpus size and search still ranks every candidate
    val centroids = Ivf.train(vecs, k = 16, iters = 2)
    assert(centroids.length == 3)
    val ivf = Ivf.search(vecs, vecs, centroids, nprobe = 16, topK = 10)
    assert(ivf.count() == 6)
    val int8 = Similarity.int8TopK(vecs, vecs, k = 10, prefilter = 100)
    assert(int8.count() == 6)
  }

  test("ingest degenerate shapes: empty batch, empty index, all-short batch") {
    val docs = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta iota kappa " * 5)
    ).toDF("doc_id", "text")
    val index = Ingest.signatureIndex(docs, 64).localCheckpoint()
    val empty = docs.where(lit(false))
    // empty batch: zero decisions, no exception anywhere in the tiers
    assert(Ingest.ingestDecisions(index,
      Ingest.signatureIndex(empty, 64).localCheckpoint(),
      k = 64, bands = 16, minSim = 0.5).count() == 0)
    // empty index: everything keeps (a first-ever ingest)
    val d = Ingest.ingestDecisions(Ingest.signatureIndex(empty, 64).localCheckpoint(),
      Ingest.signatureIndex(docs, 64).localCheckpoint(),
      k = 64, bands = 16, minSim = 0.5).collect()
    assert(d.length == 1 && d.head.getString(1) == "keep")
    // all-short batch: every sig is null, only the hash tier fires —
    // identical short docs still dedup within the batch, fresh ones keep
    val shorts = Seq((70L, "tiny"), (71L, "tiny"), (72L, "small one"))
      .toDF("doc_id", "text")
    val ds = Ingest.ingestDecisions(index,
        Ingest.signatureIndex(shorts, 64).localCheckpoint(),
        k = 64, bands = 16, minSim = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ds(70L) == "keep")
    assert(ds(71L) == "exact_batch")
    assert(ds(72L) == "keep")
    // chained with an empty first batch: the seed index must flow
    // through untouched and batch 2 still dedups against it
    val out = Ingest.ingestChain(index, Seq(empty, docs
        .select((col("doc_id") + 100L).as("doc_id"), col("text"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out.size == 1)
    assert(out((2L, 101L)) == "exact_index")
  }

  test("r8-continuation degenerate shapes: all-tombstone CDC, negative winsorize, 1-token span corruption") {
    import graft.operators.{Analytics, TextAnalysis}
    // CDC log that deletes every key -> empty current state, n_ops intact pre-filter
    val allDel = Seq((1L, 10L, 100L, 1.0, "D"), (2L, 20L, 100L, 2.0, "D"))
      .toDF("k", "id", "seq", "payload", "op")
    assert(Analytics.cdcApply(allDel, "k", "seq", "id", "op", "D").count() == 0)
    // winsorize over negative and mixed-sign values: integer cents rank
    // math must hold below zero (the naive unsigned fold would not)
    val neg = Seq.tabulate(20)(i => ("t", -10.0 + i)).toDF("g", "v")
    val r = Analytics.winsorize(neg, "g", "v", 50, 950).collect().head
    assert(r.getDouble(2) === -10.0 && r.getDouble(3) === 8.0)
    assert(r.getLong(5) === 1L) // 9.0 clips down to 8.0
    // span corruption of 1-token docs: no bigrams, span either covers the
    // whole doc or nothing; counts must reconcile and never throw
    val tiny = (1L to 30L).map(i => (i, "solo")).toDF("doc_id", "text")
    val sc = TextAnalysis.spanCorrupt(tiny).collect()
    assert(sc.length == 30)
    sc.foreach { row =>
      assert(row.getLong(1) == 1L)
      assert(Set(0L, 1L).contains(row.getLong(2)))
      assert(row.getLong(3) == row.getLong(2)) // 1 masked token = 1 span
    }
    // rank suite over a single row: every rank function degenerates to 1/0
    val one = Seq(("g", 1L, 5.0)).toDF("g", "id", "v")
    val rk = Analytics.rankSuite(one, "g", "id", "v", tiles = 4).collect().head
    assert(rk.getInt(3) == 1 && rk.getInt(4) == 1)
    assert(rk.getDouble(5) == 0.0 && rk.getDouble(6) == 1.0)
    // gap-fill where every day is observed: zero gaps, filled == observed
    val full = (1 to 3).map(d => (1L,
      java.sql.Timestamp.valueOf(f"2024-01-0$d%d 01:00:00"), "purchase", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val gf = Analytics.gapFillDaily(full, "user_id", "ts", "value",
      "event_type", "purchase").collect()
    assert(gf.length == 3 && gf.forall(!_.getBoolean(4)))
  }

  test("r9 operators: corpora smaller than k / empty panels degrade right") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // k-center asked for more centers than points: truncated, not thrown
    val kc = Coreset.kCenter(vecs, k = 5).orderBy("step").collect()
    assert(kc.length == 2)
    assert(kc.map(_.getAs[Long]("n_assigned")).sum == 2L)
    assert(Coreset.kCenter(empty, k = 3).count() == 0)
    // calibration with an empty query panel: empty tier table
    assert(Similarity.lshCalibration(
      empty, vecs, nPlanes = 4, dim = 2).count() == 0)
    // recall audit with an empty panel: one row per nprobe, 0 queries
    val cents = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    val ra = Ivf.recallAudit(empty, vecs, cents, nprobes = Seq(1, 2), topK = 5)
      .orderBy("nprobe").collect()
    assert(ra.length == 2 && ra.forall(_.getAs[Long]("n_queries") == 0L))
    // cluster split over an empty pair graph: every doc its own cluster
    val docs = Seq(10L, 20L, 30L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val cs = Dedup.clusterSplit(docs, noPairs, trainPct = 80, valPct = 10)
      .collect()
    assert(cs.map(_.getAs[Long]("n_docs")).sum == 3L)
    assert(cs.map(_.getAs[Long]("n_clusters")).sum == 3L)
    assert(cs.forall(_.getAs[Long]("max_splits_per_cluster") == 1L))
    // dedup profile with no pairs: every source reports zero dup mass
    val srcDocs = Seq((10L, "a"), (20L, "b")).toDF("doc_id", "source")
    val dp = Dedup.dedupProfile(srcDocs, noPairs).collect()
    assert(dp.length == 2)
    assert(dp.forall(r => r.getAs[Long]("n_near_dup") == 0L &&
      r.getAs[Long]("near_dup_bp") == 0L && r.getAs[Long]("n_clusters") == 0L))
    // bloom calibration over an empty corpus: one row, zero probes,
    // null FPR (no clean probes to rate) — never a throw
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val benchOne = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val bc = Contamination.bloomCalibration(emptyDocs, benchOne, n = 3,
      mBits = 64, kProbes = 2).collect()(0)
    assert(bc.getAs[Long]("n_docs") == 0L)
    assert(bc.getAs[Long]("n_probes") == 0L)
    assert(bc.isNullAt(bc.fieldIndex("fpr_bp")))
  }

  test("r9-continuation degenerate shapes: one-value sketches, all-hot join, flat CUSUM") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // HLL with exactly ONE distinct value: exact 1, small-range branch,
    // estimate near 1 (512*ln(512/511) ~ 1.0)
    val one = Seq(("g", 7)).toDF("g", "v")
    val h = Approx.hllAudit(one, "g", "v").collect().head
    assert(h.getAs[Long]("n_exact") == 1L)
    assert(h.getAs[Boolean]("small_range"))
    assert(math.abs(h.getAs[Double]("hll_est") - 1.0) < 0.1)
    // KMV with two single-value groups sharing the value: jaccard exactly 1
    val kv = Seq(("a", 7), ("b", 7)).toDF("g", "v")
    val k = Approx.kmvOverlap(kv, "g", "v").collect().head
    assert(k.getAs[Double]("jacc_exact") == 1.0)
    assert(k.getAs[Double]("jacc_kmv") == 1.0)
    assert(k.getAs[Double]("union_est") == 1.0)
    // skew-split join where EVERY row is hot: cold branch empty, still equal
    val allHot = (1 to 3000).map(_ => (2L, 1.00)).toDF("user_id", "value")
    val sj = Etl.skewSplitJoin(allHot, "user_id", "value", hotThreshold = 10L)
      .collect()
    assert(sj.length == 1 && sj.head.getAs[Boolean]("matches_plain"))
    assert(sj.head.getAs[Long]("n_rows") == 3000L)
    // perfectly flat daily series: CUSUM deviations are all zero — the
    // argmax still picks a deterministic day (the earliest) and the two
    // segment means are equal
    val flat = (1 to 6).flatMap(d =>
      Seq.fill(4)(("A", ts(f"2024-01-0$d%d 09:00:00")))).toDF("event_type", "ts")
    val cp = Analytics.changePoints(flat, "event_type", "ts").collect().head
    assert(cp.getAs[Long]("peak_dev_n") == 0L)
    assert(cp.getDate(2).toString == "2024-01-01")
    assert(cp.getAs[Double]("mean_before") == 4.0)
    assert(cp.getAs[Double]("mean_after") == 4.0)
    // decay score with value 0 rows only: score 0, rows still counted
    val zeros = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 0.00),
      (1L, ts("2024-01-02 00:00:00"), 2L, 0.00))
      .toDF("user_id", "ts", "event_id", "value")
    val dz = Analytics.decayScores(zeros, "user_id", "ts", "event_id",
      "value").collect().head
    assert(dz.getLong(1) == 2L && dz.getLong(2) == 0L)
  }

  test("r10 graph family degenerate shapes: empty/single-order projections") {
    import graft.operators.Graph
    // single-supplier orders project to ZERO edges: every consumer must
    // return an empty frame, not throw
    val solo = Seq((1L, 10L), (2L, 11L)).toDF("l_orderkey", "l_suppkey")
    val e = Graph.coSupplyEdges(solo)
    assert(e.count() == 0)
    assert(Graph.labelPropagation(e, rounds = 2).count() == 0)
    assert(Graph.triangleStats(e).count() == 0)
    assert(Graph.kCorePeel(e, k = 2, rounds = 4).count() == 0)
    assert(Graph.knnSparsify(e, 3).count() == 0)
    // a single two-supplier order: one edge, no triangles, both nodes
    // peel at k=2 (degree 1), LPA converges to the smaller label
    val pair = Seq((1L, 10L), (1L, 11L)).toDF("l_orderkey", "l_suppkey")
    val e2 = Graph.coSupplyEdges(pair)
    val lpa = Graph.labelPropagation(e2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: 10 adopts 11's label and 11 adopts 10's (synchronous
    // swap); round 2 swaps back — fixed ROUNDS pins the parity, both
    // engines replay the identical oscillation
    assert(lpa.keySet == Set(10L, 11L))
    val tri = Graph.triangleStats(e2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((10L, 1L, 0L), (11L, 1L, 0L)))
    val core = Graph.kCorePeel(e2, k = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(core == Set((10L, false), (11L, false)))
  }
}
