package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa")

  private val otherWords = Seq("rho", "sigma", "tau", "phi", "chi", "psi",
    "omega", "mu", "nu", "xi")

  /** Deterministic pseudo-doc of n tokens over the given vocab. */
  private def doc(vocab: Seq[String], seed: Int, n: Int): String =
    (0 until n).map(i => vocab((seed * 31 + i * 7) % vocab.size)).mkString(" ")

  private def docs = Seq(
    (1L, doc(words, 1, 50), "en", "s0"),
    (2L, doc(otherWords, 1, 50), "en", "s0"),      // disjoint vocab: no overlap
    (3L, doc(words, 1, 50), "en", "s0"),           // exact copy of 1
    (4L, doc(words, 1, 50) + " tail extra", "en", "s0") // near copy of 1
  ).toDF("doc_id", "text", "lang", "source")

  test("exactDedup groups identical content") {
    val out = Dedup.exactDedup(docs).collect()
    assert(out.map(_.getAs[Long]("dup_count")).sum == 4)
    val dupGroup = out.find(_.getAs[Long]("dup_count") == 2).get
    assert(dupGroup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("minhash est_sim is 1.0 for identical docs and high for near-copies") {
    val out = Dedup.minhashNearDups(docs, k = 64, bands = 16, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 3L)) == 1.0)
    assert(out.getOrElse((1L, 4L), 0.0) > 0.7)
    assert(!out.contains((1L, 2L))) // different content, no candidate
  }

  test("simhash hamming is 0 for identical docs") {
    val out = Dedup.simhashNearDups(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 3L)) == 0L)
  }

  test("portable simhash finds identical docs at hamming 0") {
    val out = Dedup.simhashPortableNearDups(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 3L)) == 0L)
  }

  test("ngramJaccardPairs verifies exact overlap within buckets") {
    val out = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5, maxLenDiff = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(out((1L, 3L)) == 1.0)
    assert(out((1L, 4L)) > 0.8 && out((1L, 4L)) < 1.0)
  }

  test("editDistNearDups verifies minhash candidates with exact Levenshtein") {
    val out = Dedup.editDistNearDups(docs, k = 64, bands = 16,
      minSim = 0.5, minEditSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("lev"), r.getAs[Double]("edit_sim_r"))).toMap
    assert(out((1L, 3L)) == (0L, 1.0))                   // exact copy
    val (lev14, sim14) = out((1L, 4L))
    assert(lev14 == 11L, s"append of ' tail extra' is 11 edits, got $lev14")
    assert(sim14 > 0.9 && sim14 < 1.0)
    assert(out((3L, 4L))._1 == 11L)                      // 3 == 1 verbatim
    assert(!out.contains((1L, 2L)))                      // disjoint vocab
  }

  test("stagedEditDistNearDups collapses replicas before the DP verify") {
    // docs 1 and 3 plus five planted replicas all share one text: the
    // collapse leaves representative 1, so the only verified pair is
    // (1, 4) — no C(7,2) clique ever reaches the Levenshtein stage
    val replicas = (10L to 14L).map(i => (i, doc(words, 1, 50), "en", "s0"))
    val corpus = docs.unionByName(replicas.toDF("doc_id", "text", "lang", "source"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-editstaged")
      .toString + "/reps"
    val out = Dedup.stagedEditDistNearDups(corpus, tmp, k = 64, bands = 16,
      minSim = 0.5, minEditSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("lev")).toMap
    assert(out.keySet == Set((1L, 4L)), s"got ${out.keySet}")
    assert(out((1L, 4L)) == 11L)
  }

  test("stagedNearDups collapses exact replicas before the LSH pair stage") {
    // 5 exact replicas of doc 1 + one near-dup: raw minhash would emit
    // C(6,2)-ish pairs; staged emits exactly the representative near-dup
    val replicas = (10L to 14L).map(i => (i, doc(words, 1, 50), "en", "s0"))
    val corpus = docs.unionByName(replicas.toDF("doc_id", "text", "lang", "source"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-staged").toString + "/reps"
    val out = Dedup.stagedNearDups(corpus, tmp, k = 64, bands = 16, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 4L)), s"got ${out.toSeq}")
  }

  test("staged roots prune superseded stages, keep latest per application") {
    // repeated staged invocations over a FIXED root (Stress loops, bench
    // min-of-3) must not accumulate one representative table per call:
    // after each write, superseded marker-bearing siblings are deleted —
    // but never another application's LATEST stage (it may back a live
    // frame in a concurrent session) and never an unowned directory
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString + "/reps"
    def plant(name: String, marker: Boolean): Unit = {
      val d = new java.io.File(tmp, name); d.mkdirs()
      if (marker) new java.io.File(d, "_graft_collapse_stage").createNewFile()
    }
    plant("otherapp_1", marker = true)   // foreign superseded -> pruned
    plant("otherapp_3", marker = true)   // foreign latest -> kept
    plant("user_data_7", marker = false) // unowned (no marker) -> untouched
    Dedup.stagedNearDups(docs, tmp, k = 64, bands = 16, minSim = 0.5).count()
    Dedup.stagedNearDups(docs, tmp, k = 64, bands = 16, minSim = 0.5).count()
    val names = new java.io.File(tmp).list().toSet
    val own = names.filter(_.startsWith(spark.sparkContext.applicationId + "_"))
    assert(own.size == 1, s"expected one own stage, got $own")
    assert(names.contains("otherapp_3") && !names.contains("otherapp_1"))
    assert(names.contains("user_data_7"))
  }

  test("dupClusters unions transitive pairs into min-id components") {
    // chain 1-2-3 (no direct 1-3 edge) + isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("dupClusters reliable parquet staging matches the localCheckpoint path") {
    // same fixpoint either way; the reliable path stages every BSP round
    // as parquet (survives executor loss) instead of executor-local blocks
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L), (9L, 11L))
      .toDF("doc_a", "doc_b")
    val fast = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft-cc-reliable").toString
    val reliable = Dedup.dupClusters(pairs, maxIters = 50,
      reliableStagePath = Some(stageDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == fast)
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L, 11L -> 7L))
    // the durable stages actually hit the filesystem, and superseded
    // label rounds were pruned: exactly the final round remains
    assert(new java.io.File(stageDir, "sym").exists())
    val labelDirs = new java.io.File(stageDir).list().toSeq
      .filter(_.startsWith("labels_"))
    assert(labelDirs.length == 1, s"expected one labels round, got $labelDirs")
  }

  test("staged cross-corpus equals the raw form when the corpus has no replicas") {
    // with all corpus texts distinct, every doc is its own representative,
    // so staging must be a pure no-op on the pair set — the staged form
    // only ever CHANGES output by collapsing true replicas
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "unrelated totally different words nothing shared here at all x")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (101L, "completely novel evaluation content with fresh tokens only y z")
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("corpus_id"), r.getAs[Long]("eval_id"),
        r.getAs[Double]("est_sim"))
    val raw = Dedup.crossCorpusNearDups(corpus, evalSet,
      k = 64, bands = 16, minSim = 0.5).collect().map(key).toSet
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-xstage-eq").toString + "/reps"
    val staged = Dedup.stagedCrossCorpusNearDups(corpus, evalSet, tmp,
      k = 64, bands = 16, minSim = 0.5).collect().map(key).toSet
    assert(staged == raw)
    assert(staged == Set((1L, 100L, staged.head._3)))
  }

  test("lineDedup drops corpus-frequent lines, keeps rare ones, preserves order") {
    // 20 docs share a banner + footer; each has a unique middle line.
    // One doc also repeats the banner internally (both copies must go).
    val rows = (1L to 20L).map { i =>
      val mid = s"unique content $i"
      val text =
        if (i == 7L) s"BANNER\n$mid\nBANNER\nrare footer"
        else s"BANNER\n$mid\nrare footer"
      (i, text)
    }
    val df = rows.toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, maxDocs = 10)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 20)
    // "rare footer" occurs in 20 docs > 10 too — also boilerplate here
    assert(out(3L) == (("unique content 3", 2L, 3L)))
    assert(out(7L) == (("unique content 7", 3L, 4L)))
  }

  test("lineDedup below threshold keeps everything verbatim") {
    val df = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, maxDocs = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a\nb", 2L -> "a\nc"))
  }

  test("signatures are reproducible across evaluations") {
    val a = Dedup.minhashSignatures(docs, 16).orderBy("doc_id")
      .select(to_json(struct(col("sig")))).as[String].collect().toSeq
    val b = Dedup.minhashSignatures(docs, 16).orderBy("doc_id")
      .select(to_json(struct(col("sig")))).as[String].collect().toSeq
    assert(a == b)
  }

  test("crossCorpusNearDups pairs eval leaks with their corpus origins only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "unrelated totally different words nothing shared here at all x")
    ).toDF("doc_id", "text")
    // eval doc 100 is a near-copy of corpus doc 1; 101 is novel
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (101L, "completely novel evaluation content with fresh tokens only y z")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusNearDups(corpus, evalSet, k = 64, bands = 16, minSim = 0.5)
      .collect().map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("eval_id")))
    assert(pairs.toSeq == Seq((1L, 100L)))
  }

  test("dupClustersStar matches dupClusters on shared graphs") {
    // chain + two-hop component + singleton pair, with reversed and
    // duplicate edges thrown in (canonicalization must absorb them)
    val small = Seq((1L, 2L), (3L, 2L), (3L, 4L), (7L, 9L), (9L, 7L),
      (11L, 9L), (20L, 21L)).toDF("doc_a", "doc_b")
    // pseudo-random graph: 200 nodes, arbitrary component shapes
    val rand = (0L until 200L).map(i => (i, (i * 17 + 3) % 200))
      .toDF("doc_a", "doc_b")
    for (pairs <- Seq(small, rand)) {
      val hashMin = Dedup.dupClusters(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.dupClustersStar(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == hashMin)
    }
  }

  test("dupClustersStar converges on a 1000-link chain in O(log n) rounds") {
    // the adversarial-diameter case: hash-min needs ~1000 BSP rounds
    // (labels walk one hop per round); star-contraction must close it in
    // O(log n). A path is large-star's exact-halving case (small-star is
    // an identity on chains), so ~log2(1000) = 10 contraction rounds plus
    // one fixpoint-confirmation round — maxIters = 12 makes the bound an
    // assertion, because a non-fixpoint after 12 rounds throws instead of
    // returning
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClustersStar(chain, maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 1001)
    assert(out.forall(_._2 == 0L))
  }

  test("dupClustersStar reliable staging matches and guards foreign directories") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L)).toDF("doc_a", "doc_b")
    val fast = Dedup.dupClustersStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft-star-reliable").toString
    val reliable = Dedup.dupClustersStar(pairs,
        reliableStagePath = Some(stageDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == fast)
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
    // re-running over the stager-owned directory is allowed (marker present)
    val rerun = Dedup.dupClustersStar(pairs,
        reliableStagePath = Some(stageDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rerun == fast)
    // a non-empty directory the stager did NOT write must be refused, not
    // cleared — a mis-pointed path would otherwise silently destroy data
    val foreign = java.nio.file.Files.createTempDirectory("graft-foreign")
    java.nio.file.Files.write(foreign.resolve("precious.txt"),
      "caller data".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Dedup.dupClusters(pairs, reliableStagePath = Some(foreign.toString))
    }
    assert(java.nio.file.Files.exists(foreign.resolve("precious.txt")))
  }

  test("keepBest keeps the longest doc per cluster, ties toward min id") {
    // cluster {1,3,4}: 4 is doc 1 plus two extra tokens -> 4 wins on
    // length even though 1 is the cluster's canonical min-id label
    val corpus = docs
    val clusters = Dedup.dupClusters(
      Dedup.ngramJaccardPairs(corpus, minJaccard = 0.5, maxLenDiff = 40)
        .select(col("doc_a"), col("doc_b")))
    val out = Dedup.keepBest(clusters, corpus).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("cluster_id") == 1L)
    assert(r.getAs[Long]("keep_doc_id") == 4L)
    assert(r.getAs[Long]("keep_tokens") == 52L)
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_dropped") == 2L)

    // equal-length tie: doc 3 is an exact copy of doc 1 -> the smaller
    // doc_id wins deterministically
    val tied = corpus.where(col("doc_id").isin(1L, 2L, 3L))
    val tiedOut = Dedup.keepBest(
      Dedup.dupClusters(
        Dedup.ngramJaccardPairs(tied, minJaccard = 0.5, maxLenDiff = 40)
          .select(col("doc_a"), col("doc_b"))),
      tied).collect()
    assert(tiedOut.length == 1)
    assert(tiedOut.head.getAs[Long]("keep_doc_id") == 1L)
    assert(tiedOut.head.getAs[Long]("n_docs") == 2L)
  }

  test("dedupProfile counts per-source near-dup mass and clusters") {
    import spark.implicits._
    val corpus = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("doc_id", "source")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupProfile(corpus, pairs)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_near_dup"),
          r.getAs[Long]("near_dup_bp"), r.getAs[Long]("n_clusters")))).toMap
    assert(out("a") == ((3L, 2L, 6667L, 1L)))
    assert(out("b") == ((2L, 0L, 0L, 0L)))
  }

  test("clusterSizeHistogram buckets components by size") {
    import spark.implicits._
    // {1,2} via one pair; {3,4,5} via a chain; 6 in no pair (excluded)
    val pairs = Seq((1L, 2L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterSizeHistogram(pairs)
      .collect().map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    assert(out == Map(2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
  }

  test("clusterSplit keeps whole clusters in one split, proof re-derived") {
    import spark.implicits._
    // clusters: {1,2,7} (chained pairs), {3,4}; singletons 5, 6
    val corpus = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 7L), (3L, 4L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterSplit(corpus, pairs, trainPct = 80, valPct = 10)
      .collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 7L)
    // 2 multi-doc clusters + 2 singletons = 4 split units
    assert(out.map(_.getAs[Long]("n_clusters")).sum == 4L)
    // the no-leakage proof: no cluster spans two splits
    assert(out.forall(_.getAs[Long]("max_splits_per_cluster") == 1L))
    // a cluster travels WHOLE: some split holds >= 3 docs in fewer
    // clusters than docs (the {1,2,7} chain stayed together)
    assert(out.exists(r => r.getAs[Long]("n_docs") >=
      r.getAs[Long]("n_clusters") + 2))
    // bp shares sum to ~10000 (rounding)
    val bp = out.map(_.getAs[Long]("docs_bp")).sum
    assert(bp >= 9998L && bp <= 10002L)
  }

  test("containmentPairs finds excerpts symmetric Jaccard misses") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 17).map(i => s"w$i").mkString(" ") // 8 tokens inside big
    val other = (100 to 139).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, big), (2L, other), (3L, excerpt)
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, minCont = 0.8, maxShingleDf = 8)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 3L)
    // all 6 of the excerpt's shingles are inside big: cont_b = 1.0
    assert(r.getAs[Double]("cont_b") == 1.0)
    assert(r.getAs[Double]("jaccard") < 0.5) // the symmetric tier's blind spot
    assert(r.getAs[Long]("inter") == 6L)

    // the hotness cap self-limits under replica flooding: at df cap 2,
    // a shingle present in 3 docs links nothing
    val flooded = docs.union(Seq((4L, big), (5L, big)).toDF("doc_id", "text"))
    val capped = Dedup.containmentPairs(flooded, minCont = 0.8, maxShingleDf = 2)
    // big's shingles now have df 3 (> 2): only excerpt-vs-one-big pairs
    // could survive via excerpt-only shingles, but those all live in the
    // three big replicas too -> no rare shingle -> empty
    assert(capped.count() == 0L)
  }
}
