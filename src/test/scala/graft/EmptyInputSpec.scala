package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Empty-corpus hardening: a daily pipeline run over an empty partition
  * (new tenant, upstream outage) must produce empty results, not throw —
  * the class of bug the r1 review found in Multimodal.chunked (Spark's
  * sequence(0, -1) emits phantom rows instead of none).
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String, String, String, Long)]
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def emptyVecs = Seq.empty[(Long, Array[Float], Int)]
    .toDF("vec_id", "embedding", "label")

  test("text and dedup operators yield empty results on an empty corpus") {
    assert(Dedup.exactDedup(emptyDocs).count() == 0)
    assert(Contamination.dupSpans(emptyDocs, n = 8).count() == 0)
    assert(Contamination.scrubDupSpans(emptyDocs, n = 8).count() == 0)
    assert(TextAnalysis.normalizeText(emptyDocs).count() == 0)
    assert(TextAnalysis.vocabTopK(emptyDocs, k = 10).count() == 0)
    assert(Approx.cmsTopK(emptyDocs, d = 3, w = 64, k = 5).count() == 0)
    assert(Sampling.shardPlan(emptyDocs, nShards = 4).count() == 0)
    assert(Sampling.groupSample(emptyDocs, "source", k = 3).count() == 0)
    assert(Sampling.domainCap(emptyDocs, cap = 5).count() == 0)
  }

  test("contamination gates tolerate an empty benchmark (nothing can hit)") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = Contamination.decontaminateStream(docs, emptyDocs, n = 8).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_hit") == 0L)
    val bloom = Contamination.decontaminateBloom(docs, emptyDocs, n = 8,
      mBits = 4096, kProbes = 3).collect()
    assert(bloom.length == 1 && bloom.head.getAs[Long]("n_hit") == 0L)
  }

  test("similarity operators yield empty results with no vectors") {
    assert(Similarity.bruteForceTopK(emptyVecs, emptyVecs, k = 3).count() == 0)
    assert(Similarity.hardNegatives(emptyVecs, emptyVecs, k = 3).count() == 0)
    assert(Similarity.jlTopK(emptyVecs, emptyVecs, k = 3, prefilter = 2,
      dim = 64, kProj = 4).count() == 0)
  }

  test("event analytics yield empty results with no events") {
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Observability.cohortRetention(emptyEvents).count() == 0)
    assert(Observability.funnel(emptyEvents, Seq("view", "click")).count() == 0)
    assert(Observability.gapSessions(emptyEvents, "user_id", "30 minutes").count() == 0)
    assert(Observability.runMetadata(emptyEvents, "user_id").count() == 0)
  }

  test("r6 additions tolerate empty inputs") {
    // staged cross-corpus: empty corpus -> zero reps -> zero pairs (the
    // parquet stage must still write a readable empty frame)
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft-empty-xstage").toString
    assert(Dedup.stagedCrossCorpusNearDups(emptyDocs,
      Seq((1L, "a b c d")).toDF("doc_id", "text"),
      stageDir, k = 64, bands = 16, minSim = 0.5).count() == 0)
    // identical schemas -> every column unchanged, none added/removed
    val same = Seq((1L, "x")).toDF("id", "name")
    val drift = Etl.schemaDriftReport(same, same).collect()
    assert(drift.length == 2 && drift.forall(_.getString(3) == "unchanged"))
    // dupClusters on an empty pair graph: no nodes, no rounds, no output
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dupClusters(emptyPairs).count() == 0)
  }

  test("r8-continuation analytics tolerate empty inputs") {
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // KNOWN ENGINE DIVERGENCE, pinned: standard SQL (DuckDB, Postgres)
    // emits the () grouping-set row with count 0 over an empty relation;
    // Spark's rollup emits nothing. Matching the standard would cost a
    // second corpus scan (separate global-agg arm), so the one-Expand
    // plan keeps Spark's semantics — callers on possibly-empty
    // partitions must treat zero rows as the empty grand total.
    assert(Analytics.rollupStats(emptyDocs, "source", "lang",
      "n_docs", "n_chars", "sum_chars").count() == 0)
    val fk = Analytics.fkAudit(
      Seq.empty[Long].toDF("fk"), "fk",
      Seq.empty[Long].toDF("pk"), "pk", "e->e").collect()
    assert(fk.length == 1 && fk.head.getLong(1) == 0L && fk.head.getLong(3) == 0L)
    assert(Analytics.keySkewReport(emptyEvents, "user_id").count() == 0)
    assert(Analytics.runningTotals(emptyEvents, "user_id", "ts",
      "event_id", "value").count() == 0)
    // empty events: null global bounds -> empty spine, not a throw
    assert(Analytics.gapFillDaily(emptyEvents, "user_id", "ts", "value",
      "event_type", "purchase").count() == 0)
    assert(Analytics.unpivotMetrics(emptyEvents, "user_id", "event_type",
      Seq("click", "view"), "value").count() == 0)
    assert(Analytics.valueHistogram(emptyEvents, "event_type", "value",
      bins = 8).count() == 0)
    assert(Analytics.winsorize(emptyEvents, "event_type", "value",
      50, 950).count() == 0)
    assert(Analytics.cdcApply(
      Seq.empty[(Long, Long, Long, Double, String)]
        .toDF("k", "id", "seq", "payload", "op"),
      "k", "seq", "id", "op", "D").count() == 0)
    assert(Analytics.rankSuite(emptyEvents, "event_type", "user_id",
      "value", tiles = 4).count() == 0)
    assert(Analytics.abMetrics(emptyEvents, "user_id", "value",
      "event_type", "purchase", arms = 2).count() == 0)
    assert(TextAnalysis.spanCorrupt(emptyDocs).count() == 0)
    assert(Analytics.topRevenue(
      Seq.empty[(Long, String)].toDF("c_custkey", "c_mktsegment"),
      Seq.empty[(Long, Long, java.sql.Timestamp, String)]
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
      Seq.empty[(Long, java.sql.Timestamp, Double, Double)]
        .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"),
      "BUILDING", "1998-06-01", k = 5).count() == 0)
  }

  test("gapFillDaily with observations but zero matching event type still spans no users") {
    // type filter matches nothing -> daily empty -> distinct keys empty ->
    // spine empty even though global bounds exist
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "view", 1.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Analytics.gapFillDaily(ev, "user_id", "ts", "value",
      "event_type", "purchase").count() == 0)
  }

  test("r9-continuation analytics tolerate empty and degenerate inputs") {
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Observability.sessionPaths(emptyEvents, 1800000000L,
      maxLen = 5, topN = 20).count() == 0)
    assert(Observability.lastTouchAttribution(emptyEvents, "purchase",
      Seq("click", "view"), 86400000000L).count() == 0)
    assert(Analytics.audienceOverlap(emptyEvents, "user_id",
      "event_type").count() == 0)
    assert(Analytics.dailyTrend(emptyEvents, "event_type", "ts").count() == 0)
    assert(TextAnalysis.noveltyProfile(emptyDocs).count() == 0)
    assert(TextAnalysis.corpusDivergence(emptyDocs).count() == 0)
    // touches only, no purchases -> attribution has nothing to credit
    val touches = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "click", 1.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Observability.lastTouchAttribution(touches, "purchase",
      Seq("click", "view"), 86400000000L).count() == 0)
    // single-token docs: no 3-grams -> novelty empty, but divergence
    // still has unigrams (KL of the only source vs itself = 0)
    val tiny = Seq((1L, "a", "x", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextAnalysis.noveltyProfile(tiny).count() == 0)
    val div = TextAnalysis.corpusDivergence(tiny).collect()
    assert(div.length == 1 && div.head.getAs[Long]("kl_u") == 0L)
  }

  test("sketch/graph/maintenance family tolerates empty and degenerate inputs") {
    import graft.operators.{Approx, Graph}
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Approx.hllAudit(emptyEvents, "event_type", "user_id").count() == 0)
    assert(Approx.hllRollupAudit(emptyEvents, "event_type", "ts",
      "user_id").count() == 0)
    assert(Approx.kmvOverlap(emptyEvents, "event_type", "user_id").count() == 0)
    assert(Approx.sampleQuantileAudit(emptyEvents, "event_type", "value",
      "event_id").count() == 0)
    assert(Analytics.decayScores(emptyEvents, "user_id", "ts", "event_id",
      "value").count() == 0)
    assert(Analytics.zoneMap(emptyEvents, "event_id", "ts", "user_id",
      250L, 0L, 1L, 100L).count() == 0)
    assert(Analytics.cupedMetrics(emptyEvents, "user_id", "ts", "value",
      "2024-01-16", arms = 2).count() == 0)
    assert(graft.validation.Profile.profile(emptyEvents).collect()
      .forall(r => r.getLong(1) == 0L && r.getLong(4) == 0L))
    val emptyOrders = Seq.empty[(Long, Long)].toDF("o_orderkey", "o_custkey")
    val emptyLines = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
    assert(Graph.pageRank(emptyOrders, emptyLines).count() == 0)
    val emptyPriced = Seq.empty[(Long, String)]
      .toDF("o_orderkey", "o_orderpriority")
    val emptyPricedLines = Seq.empty[(Long, Double)]
      .toDF("l_orderkey", "l_extendedprice")
    assert(Etl.incrJoinRevenue(emptyPriced, emptyPricedLines).count() == 0)
    assert(Etl.forgetRetract(emptyEvents, "event_type", "value",
      org.apache.spark.sql.functions.lit(true)).count() == 0)
    // single-group KMV: no pairs to overlap
    val one = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "click", 1.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Approx.kmvOverlap(one, "event_type", "user_id").count() == 0)
    assert(TextAnalysis.topicLabels(emptyDocs.select($"doc_id", $"text"),
      nPlanes = 4, topK = 5, stopwords = Seq.empty).count() == 0)
  }

  test("the r14-continuation operators survive empty inputs") {
    val emptyScored = Seq.empty[(Long, Boolean)].toDF("score", "label")
    // one-row aggregates return their row with NULL statistics
    val auc = Analytics.rocAuc(emptyScored).collect().head
    assert(auc.getAs[Long]("n_pos") == 0L &&
      auc.isNullAt(auc.fieldIndex("auc_micro")))
    assert(Analytics.prCurve(emptyScored, nCuts = 10).count() == 0)
    val mw = Analytics.mannWhitney(emptyScored).collect().head
    assert(mw.isNullAt(mw.fieldIndex("z_r")))
    assert(Analytics.spearman(
      Seq.empty[(Long, Long)].toDF("x", "y")).collect().head
      .isNullAt(1))
    val emptyArmed = Seq.empty[(Long, Long)].toDF("arm", "score")
    assert(Analytics.kruskalWallis(emptyArmed, critH = 5.99).count() == 0)
    val emptyPE = Seq.empty[(String, Long, Long)].toDF("g", "entity", "cents")
    assert(Analytics.concentrationProfile(emptyPE).count() == 0)
    assert(Analytics.basketRules(
      Seq.empty[(Long, String)].toDF("basket", "item"),
      minSupportBp = 20).count() == 0)
    assert(TextAnalysis.vocabRichness(emptyDocs).count() == 0)
    val emptyEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(Graph.degreeHistogram(emptyEdges).count() == 0)
    assert(Graph.harmonicCentrality(emptyEdges,
      Seq.empty[Long].toDF("seed"), maxHops = 2).count() == 0)
    assert(Graph.widestPaths(emptyEdges,
      Seq.empty[Long].toDF("seed"), rounds = 2, topK = 3).count() == 0)
    val da = Graph.degreeAssortativity(emptyEdges).collect().head
    assert(da.getAs[Long]("n_nodes") == 0L &&
      da.isNullAt(da.fieldIndex("r_4dp")))
    // HyperANF over no edges: an empty curve beats a crash (coverage is
    // undefined with nothing to cover)
    val anf = Graph.hyperAnf(emptyEdges, maxT = 2).collect()
    assert(anf.forall(_.getAs[Long]("n_nodes") == 0L))
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val emptyEv = Seq.empty[(java.sql.Timestamp, Double, Long, String)]
      .toDF("ts", "value", "user_id", "event_type")
    assert(Analytics.ewmaDaily(emptyEv, "event_type", "ts", "value")
      .count() == 0)
    assert(Etl.partitionCompleteness(emptyEv, "event_type", "ts")
      .count() == 0)
    val w = Analytics.wilsonRates(emptyEv, "user_id",
      col("event_type") === "purchase")
    assert(w.count() == 0)
    val wt = Analytics.welchTTest(emptyEv, "user_id", "value",
      critT = 1.96).collect().head
    assert(wt.getAs[Long]("n0") == 0L && wt.isNullAt(wt.fieldIndex("t_r")))
    val chi = Analytics.independenceTest(
      Seq.empty[(String, String)].toDF("r0", "c0"), "r0", "c0",
      critMicro = 3841459L)
    assert(chi.count() == 0)
    assert(Analytics.psiDrift(emptyEv, "value", "ts",
      refEndExcl = "2024-01-16", nBuckets = 10).count() == 10)
    assert(Similarity.pcaPower(emptyVecs, dim = 4, iters = 2)
      .count() == 4) // the start vector survives; zero updates
  }

  test("r15 additions tolerate empty inputs") {
    val emptyEv = Seq.empty[(java.sql.Timestamp, Double, Long, String)]
      .toDF("ts", "value", "user_id", "event_type")
    // no partitions -> nothing missing -> an empty plan, not a crash
    assert(Etl.backfillPlan(emptyEv, "event_type", "ts", batchDays = 3)
      .count() == 0)
    // top-r on an empty corpus: r x dim start-vector rows, zero-eig
    // components with NULL-free integer columns
    val topr = Similarity.pcaTopR(emptyVecs, dim = 4, iters = 2, r = 2)
      .collect()
    assert(topr.length == 8)
    assert(topr.forall(_.getAs[Long]("eig_micro") == 0L))
    // whitening an empty corpus: no rows out (eig = 0 -> NULL scale
    // never divides by zero because there are no rows to scale)
    assert(Similarity.pcaWhiten(emptyVecs, dim = 4, iters = 2, r = 2)
      .count() == 0)
  }
}
