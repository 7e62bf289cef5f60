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
}
