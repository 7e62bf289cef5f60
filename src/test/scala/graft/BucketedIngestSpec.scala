package graft

import org.apache.spark.sql.functions._

import graft.operators.Ingest

/** Evidence for the ingest-at-scale claim: with the index persisted in the
  * bucketed layout (hash table bucketed by text_hash, band table by
  * (band, bh)), both index-tier joins scan the index in place — the only
  * shuffles in an ingest belong to the ARRIVING BATCH, so a billion-row
  * index costs the same per ingest as a thousand-row one.
  */
class BucketedIngestSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed index: identical decisions, index side scans without shuffling") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val root = java.nio.file.Files.createTempDirectory("graft-bidx").toString
    try {
      // force real joins so the exchange structure is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = "alpha beta gamma delta eps zeta eta theta iota kappa " * 5
      val corpus = Seq(
        (1L, a),
        (2L, "rho sigma tau phi chi psi omega mu nu xi " * 5)
      ).toDF("doc_id", "text")
      val index = Ingest.signatureIndex(corpus, 64).localCheckpoint()
      Ingest.writeBucketedIndex(index, "bidx", root, buckets = 4, k = 64, bands = 16)

      val batch = Seq(
        (10L, a),                 // exact vs index
        (11L, a.dropRight(30)),   // near vs index
        (12L, "wholly fresh content that matches nothing at all here " * 5)
      ).toDF("doc_id", "text")
      val batchSigs = Ingest.signatureIndex(batch, 64).localCheckpoint()

      val bucketed = Ingest.ingestDecisionsBucketed(spark, "bidx", batchSigs,
        k = 64, bands = 16, minSim = 0.5)
      val inMemory = Ingest.ingestDecisions(index, batchSigs,
        k = 64, bands = 16, minSim = 0.5)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
      val got = rows(bucketed)
      assert(got == rows(inMemory))
      assert(got == Set(
        (10L, "exact_index", Some(1L)),
        (11L, "near_index", Some(1L)),
        (12L, "keep", None)))

      // both index scans read their buckets in place...
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true") ||
        plan.contains("SelectedBucketsCount"), s"no bucketed scan in:\n$plan")
      // ...so the bucketed plan needs strictly fewer shuffles than the
      // in-memory index path (which must exchange the index for both
      // index-tier joins)
      def exchanges(p: String) = "Exchange hashpartitioning".r.findAllIn(p).length
      val memPlan = inMemory.queryExecution.executedPlan.toString
      assert(exchanges(plan) < exchanges(memPlan),
        s"bucketed=${exchanges(plan)} mem=${exchanges(memPlan)}")

      // keeper append lands in the same buckets and is visible to the
      // next ingest: doc 12's row dedups a later exact copy of it
      Ingest.appendBucketedIndex(
        batchSigs.where(col("doc_id") === 12L), "bidx", k = 64, bands = 16)
      val batch2 = Seq((20L,
        "wholly fresh content that matches nothing at all here " * 5))
        .toDF("doc_id", "text")
      val d2 = rows(Ingest.ingestDecisionsBucketed(spark, "bidx",
        Ingest.signatureIndex(batch2, 64).localCheckpoint(),
        k = 64, bands = 16, minSim = 0.5))
      assert(d2 == Set((20L, "exact_index", Some(12L))))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bidx_hash")
      spark.sql("DROP TABLE IF EXISTS bidx_bands")
    }
  }
}
