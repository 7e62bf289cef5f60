package graft

import org.apache.spark.sql.functions._

import graft.operators.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "alpha beta gamma delta eps zeta eta theta iota kappa " * 5),
    (2L, "rho sigma tau phi chi psi omega mu nu xi " * 5)
  ).toDF("doc_id", "text")

  test("decisions hit every tier with the right matched ids") {
    val index = Ingest.signatureIndex(base, 64).localCheckpoint()
    val batch = Seq(
      (10L, base.where(col("doc_id") === 1).head().getString(1)), // exact vs index
      (11L, ("alpha beta gamma delta eps zeta eta theta iota kappa " * 5)
        .dropRight(30)),                                          // near vs index
      (12L, "completely different words entirely fresh content here " * 5),
      (13L, "completely different words entirely fresh content here " * 5),
      (14L, ("completely different words entirely fresh content here " * 5)
        .dropRight(30))                                           // near vs 12
    ).toDF("doc_id", "text")
    val d = Ingest.ingestDecisions(index,
        Ingest.signatureIndex(batch, 64).localCheckpoint(),
        k = 64, bands = 16, minSim = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(d(10L) == ("exact_index", Some(1L)))
    assert(d(11L) == ("near_index", Some(1L)))
    assert(d(12L) == ("keep", None))
    assert(d(13L) == ("exact_batch", Some(12L)))
    assert(d(14L) == ("near_batch", Some(12L)))
  }

  test("chain appends keepers: batch 2 dedups against batch 1 survivors") {
    val fresh = "wholly novel material for the second wave of docs " * 5
    val b1 = Seq((20L, fresh)).toDF("doc_id", "text")
    val b2 = Seq(
      (30L, fresh),                     // exact copy of the batch-1 keeper
      (31L, fresh.dropRight(30)),       // near copy of it
      (32L, "yet another brand new document body right here now " * 5)
    ).toDF("doc_id", "text")
    val out = Ingest.ingestChain(Ingest.signatureIndex(base, 64), Seq(b1, b2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out((1L, 20L)) == ("keep", None))
    assert(out((2L, 30L)) == ("exact_index", Some(20L)))
    assert(out((2L, 31L)) == ("near_index", Some(20L)))
    assert(out((2L, 32L)) == ("keep", None))
  }

  test("dropped batch-1 docs do NOT join the index") {
    // 40 duplicates an index doc -> dropped; 50 then duplicates 40 in
    // batch 2: it must match the ORIGINAL index entry, not id 40
    val b1 = Seq((40L, base.where(col("doc_id") === 2).head().getString(1)))
      .toDF("doc_id", "text")
    val b2 = Seq((50L, base.where(col("doc_id") === 2).head().getString(1)))
      .toDF("doc_id", "text")
    val out = Ingest.ingestChain(Ingest.signatureIndex(base, 64), Seq(b1, b2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out((1L, 40L)) == ("exact_index", Some(2L)))
    assert(out((2L, 50L)) == ("exact_index", Some(2L)))
  }

  test("reliable staging matches the default chain and leaves the index on disk") {
    val fresh = "durable chain material for the staged variant here now " * 5
    val b1 = Seq((80L, fresh)).toDF("doc_id", "text")
    val b2 = Seq((81L, fresh)).toDF("doc_id", "text")
    def run(stage: Option[String]) =
      Ingest.ingestChain(Ingest.signatureIndex(base, 64), Seq(b1, b2),
          reliableStagePath = stage)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-stage").toString + "/run"
    val durable = run(Some(stageDir))
    assert(durable == run(None))
    // the stage root IS the artifact: seed, per-batch keepers, decisions
    val files = new java.io.File(stageDir).listFiles().map(_.getName).toSet
    assert(Set("index_0", "keepers_1", "keepers_2", "dec_1", "dec_2")
      .subsetOf(files))
    // batch-1 keeper 80 is on disk; the batch-2 duplicate is not
    val k1 = spark.read.parquet(s"$stageDir/keepers_1")
    assert(k1.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(80L))
    assert(spark.read.parquet(s"$stageDir/keepers_2").count() == 0)
  }

  test("ingestChain refuses to reuse a root holding a prior run's index artifact") {
    // the stage root IS the durable index: unlike scratch stagers (which
    // clear marker-bearing roots), re-pointing a second run at it must
    // refuse, not silently delete yesterday's pieces
    val fresh = "a refusal test corpus body with enough words to shingle " * 5
    val b1 = Seq((90L, fresh)).toDF("doc_id", "text")
    val stageDir = java.nio.file.Files
      .createTempDirectory("graft-ingest-refuse").toString + "/run"
    Ingest.ingestChain(Ingest.signatureIndex(base, 64), Seq(b1),
      reliableStagePath = Some(stageDir)).collect()
    val before = new java.io.File(stageDir).list().toSet
    val e = intercept[IllegalArgumentException] {
      Ingest.ingestChain(Ingest.signatureIndex(base, 64), Seq(b1),
        reliableStagePath = Some(stageDir))
    }
    assert(e.getMessage.contains("refusing to reuse stage root"))
    // the prior run's artifact is intact and still readable
    assert(new java.io.File(stageDir).list().toSet == before)
    assert(spark.read.parquet(s"$stageDir/index_0").count() == 2)
    assert(spark.read.parquet(s"$stageDir/keepers_1")
      .select("doc_id").head().getLong(0) == 90L)
  }

  test("short docs carry null signatures but still dedup exactly") {
    val idx = Ingest.signatureIndex(
      base.unionByName(Seq((3L, "tiny doc")).toDF("doc_id", "text")), 64)
      .localCheckpoint()
    assert(idx.where(col("doc_id") === 3 && col("sig").isNull).count() == 1)
    val batch = Seq((60L, "tiny doc"), (61L, "other small")).toDF("doc_id", "text")
    val d = Ingest.ingestDecisions(idx,
        Ingest.signatureIndex(batch, 64).localCheckpoint(),
        k = 64, bands = 16, minSim = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(60L) == "exact_index")
    assert(d(61L) == "keep")
  }
}
