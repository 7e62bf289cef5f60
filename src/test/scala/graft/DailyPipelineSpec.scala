package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Etl
import graft.pipeline.Pipeline
import graft.validation.Validator

/** End-to-end replay of the reference's daily run on graft:
  * extract (daily filter) -> transform (WIP aggregation) -> staged daily
  * write -> upsert into the serving table -> validation report. One spec,
  * the whole `extract_lot_history -> transform_aps_wip -> load_aps_wip`
  * asset chain (reference: the etl/assets modules), minus the orchestrator.
  */
class DailyPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("daily extract -> transform -> load -> validate chain") {
    val root = Files.createTempDirectory("graft-daily").toString
    val sfDir = "/root/testdata/sf0.001"

    // extract: one "day" of the fact table (status-bearing orders stand in
    // for lot_history), staged like the reference's extract asset
    val extracted = Tables.orders(spark, sfDir)
      .where(year(col("o_orderdate")) === 1997)
    Pipeline.writeDaily(extracted, root, "extract", "lot_history", "1997-12-31")

    // transform: WIP aggregation over the staged extract
    val staged = Pipeline.readDaily(spark, root, "extract", "lot_history", "1997-12-31")
    val wip = Etl.wipAggregate(staged,
      statusCol = "o_orderstatus", activeStatuses = Seq("O", "F"),
      groupCols = Seq("o_orderpriority"),
      qtyCol = "o_totalprice", lotIdCol = "o_custkey",
      snapshotDate = "1997-12-31")
    Pipeline.writeDaily(wip, root, "transform", "aps_wip", "1997-12-31")

    // load: upsert into the serving table, twice (idempotent merge)
    val serving = s"$root/serving/aps_wip"
    val out = Pipeline.readDaily(spark, root, "transform", "aps_wip", "1997-12-31")
    Pipeline.upsertTable(spark, serving, out, Seq("o_orderpriority", "snapshot_date"))
    Pipeline.upsertTable(spark, serving, out, Seq("o_orderpriority", "snapshot_date"))
    val loaded = spark.read.parquet(serving)
    assert(loaded.count() == wip.count()) // re-run did not duplicate

    // validate: the reference's post-transform checks, one pass
    val report = Validator(loaded)
      .checkNotNull("o_orderpriority")
      .checkNotNull("wip_qty")
      .checkRange("wip_qty", minVal = Some(0.0))
      .checkUnique("o_orderpriority")
      .report().head()
    assert(report.getAs[Long]("not_null_o_orderpriority") == 0)
    assert(report.getAs[Long]("range_wip_qty") == 0)
    assert(report.getAs[Long]("unique_o_orderpriority") == 0)

    // partition inventory matches what was written
    assert(Pipeline.listDaily(root, "extract", "lot_history") == Seq("19971231"))
  }

  test("training-data chain: corpus prep -> train split -> sequence packing") {
    import graft.operators.Packing
    val sfDir = "/root/testdata/sf0.001"
    val prepped = graft.pipeline.CorpusPrep.prepare(
      Tables.documents(spark, sfDir),
      stopwords = Seq("the", "a", "data", "value"),
      markers = Seq("en" -> Seq("the", "a"), "fr" -> Seq("table", "row"),
        "es" -> Seq("data", "value"), "de" -> Seq("join", "group"),
        "zh" -> Seq("spark", "stream")),
      minTokens = 20, maxStopwordRatio = 0.3, trainPct = 90, valPct = 5)
    val train = prepped.where($"split" === "train")
      .select($"doc_id", $"n_tokens").as[Packing.DocTokens]
    val nTrain = train.count()
    assert(nTrain > 0)
    val bins = Packing.packGreedy(train, maxTokens = 512).collect()
    // every training document lands in exactly one bin, none oversized
    assert(bins.map(_.n_docs.toLong).sum == nTrain)
    bins.foreach(b => assert(b.total_tokens <= 512 || b.n_docs == 1))
    // the split is content-stable: re-running prep yields the same split
    val again = graft.pipeline.CorpusPrep.prepare(
      Tables.documents(spark, sfDir),
      stopwords = Seq("the", "a", "data", "value"),
      markers = Seq("en" -> Seq("the", "a"), "fr" -> Seq("table", "row"),
        "es" -> Seq("data", "value"), "de" -> Seq("join", "group"),
        "zh" -> Seq("spark", "stream")),
      minTokens = 20, maxStopwordRatio = 0.3, trainPct = 90, valPct = 5)
      .where($"split" === "train").count()
    assert(again == nTrain)
  }

  test("prepareModern gates repetitive, contaminated, and duplicate docs") {
    import org.apache.spark.sql.functions._
    val clean = (1 to 23).map(i => s"w$i").mkString(" ")
    val benchText = (1 to 25).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, clean, "en", "s0"),                               // clean
      (2L, clean, "en", "s0"),                               // exact dup of 1
      (3L, ("rep loop " * 20).trim, "en", "s0"),             // repetitive
      (4L, "short doc", "en", "s0"),                         // length-gated
      (20L, benchText, "en", "s1")                           // bench source (doc_id % 20 == 0)
    ).toDF("doc_id", "text", "lang", "source")
    val bench = docs.where($"doc_id" % 20 === 0)
      .select($"doc_id", array_join(slice(split($"text", " "), 1, 40), " ").as("text"))
    val out = graft.pipeline.CorpusPrep.prepareModern(docs, bench,
      minTokens = 20, maxDupFrac = 0.1, maxHitRatio = 0.2,
      budgets = Seq(), defaultBudget = 1000000L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    // doc 1 survives; 2 (dup), 3 (repetitive), 4 (short) are gated;
    // doc 20 is the benchmark itself -> fully contaminated -> gated
    assert(out == Map("s0" -> 1L))
  }
}
