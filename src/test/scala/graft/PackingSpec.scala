package graft

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy packs every document once, respects the cap, unique bins") {
    val docs = (1L to 20L).map(i => Packing.DocTokens(i, 100 + (i % 5) * 50))
      .toDS().repartition(2)
    val bins = Packing.packGreedy(docs, maxTokens = 512).collect()
    assert(bins.flatMap(_.doc_ids).sorted.toSeq == (1L to 20L))
    bins.foreach(b => assert(b.total_tokens <= 512 || b.n_docs == 1))
    assert(bins.map(_.bin_id).distinct.length == bins.length)
  }

  test("a document longer than the cap gets a bin of its own") {
    val docs = Seq(Packing.DocTokens(1, 1000), Packing.DocTokens(2, 10),
      Packing.DocTokens(3, 20)).toDS().coalesce(1)
    val bins = Packing.packGreedy(docs, maxTokens = 512).collect()
    val big = bins.find(_.doc_ids.contains(1L)).get
    assert(big.n_docs == 1 && big.total_tokens == 1000)
    assert(bins.find(_.doc_ids.contains(2L)).get.doc_ids.contains(3L))
  }

  test("packer meets the q_bpe_shards manifest's min_bins floor per shard") {
    // the registered chain publishes min_bins = ceil(bpe_tokens / cap) as
    // the capacity lower bound; the greedy packer must achieve >= that
    // (trivially true) and, when no doc exceeds the cap, stay within 2x
    // of it (greedy bin packing never opens a bin while a half-empty one
    // could take the doc -> every bin except the last is > cap/2 full)
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cap = 512L
    val scored = docs.select(col("doc_id"),
      pmod(org.apache.spark.sql.graftnative.RollingHash.rollingHash(
        concat(lit("shard:"), col("doc_id").cast("string"))), lit(8L))
        .as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    (0L until 8L).foreach { sh =>
      val inShard = scored.where(col("shard") === sh)
        .select(col("doc_id"), col("n_tokens")).as[Packing.DocTokens]
      val toks = inShard.agg(coalesce(sum(col("n_tokens")), lit(0L)))
        .head().getLong(0)
      val minBins = (toks + cap - 1) / cap
      val oversized = inShard.filter(_.n_tokens > cap).count()
      // one partition: the 2x bound's "+1 trailing bin" slack is per
      // partition, so pin the partitioning the bound is stated for
      val bins = Packing.packGreedy(
        inShard.coalesce(1).sortWithinPartitions(col("n_tokens").desc),
        cap).count()
      assert(bins >= minBins)
      assert(bins <= 2 * minBins + oversized + 1)
    }
  }

  test("packing is deterministic for a fixed partitioning") {
    val docs = (1L to 50L).map(i => Packing.DocTokens(i, 37 * (i % 7) + 10))
      .toDS().coalesce(1)
    val a = Packing.packGreedy(docs, 256).collect().map(b => b.bin_id -> b.doc_ids).toMap
    val b = Packing.packGreedy(docs, 256).collect().map(b => b.bin_id -> b.doc_ids).toMap
    assert(a == b)
  }

  test("compactionPlan: conserves rows/files, oversize file isolated, deterministic") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // day 1 type A: 120 rows (oversize vs target 100); small files on
    // days 2-4 across two types
    val rows =
      (1 to 120).map(_ => ("A", ts("2024-01-01 10:00:00"))) ++
      (1 to 40).map(_ => ("A", ts("2024-01-02 10:00:00"))) ++
      (1 to 35).map(_ => ("B", ts("2024-01-02 10:00:00"))) ++
      (1 to 30).map(_ => ("B", ts("2024-01-03 10:00:00")))
    val ev = rows.toDF("event_type", "ts")
    val out = Packing.compactionPlan(ev, "event_type", "ts", targetRows = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // conservation
    assert(out.values.map(_._1).sum == 4L)
    assert(out.values.map(_._2).sum == 225L)
    // sorted fill: the 120-row file starts at cum 0 -> bin 0 alone
    // (next file starts at cum 120 -> bin 1)
    assert(out(0L) === ((1L, 120L, 12000L)))
    assert(out(1L) === ((3L, 105L, 10500L)))
    val again = Packing.compactionPlan(ev, "event_type", "ts", 100L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val first = Packing.compactionPlan(ev, "event_type", "ts", 100L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(again == first)
  }

  test("packPlanBucketed: hard cap by construction, oversize singletons, " +
      "conservation, determinism") {
    import spark.implicits._
    // lengths 10 (cls 4, cap 16), 60 (cls 6, cap 4), 200 (cls 8, cap 1),
    // 300 (> 256 -> cls -1 singleton). Text with n spaces-1 words.
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    val docs = ((1L to 40L).map(d => doc(d, 10)) ++
      (101L to 110L).map(d => doc(d, 60)) ++
      Seq(doc(201L, 200), doc(202L, 300))).toDF("doc_id", "text")
    val out = Packing.packPlanBucketed(docs, maxTokens = 256L, shards = 2)
      .collect()
    // conservation: every doc is in exactly one bin
    assert(out.map(_.getAs[Long]("n_docs")).sum == 52L)
    // the hard cap holds for every in-range class BY CONSTRUCTION
    val inRange = out.filter(_.getAs[Long]("cls") != -1L)
    assert(inRange.forall(_.getAs[Boolean]("within_cap")))
    // oversize doc 202 is a singleton in class -1, flagged not capped
    val over = out.filter(_.getAs[Long]("cls") == -1L)
    assert(over.length == 1 && over.head.getAs[Long]("n_docs") == 1L &&
      !over.head.getAs[Boolean]("within_cap"))
    // class capacities: 10-token docs (cls 4) pack up to 16 per bin
    val cls4 = out.filter(_.getAs[Long]("cls") == 4L)
    assert(cls4.forall(_.getAs[Long]("n_docs") <= 16L))
    assert(cls4.map(_.getAs[Long]("n_docs")).sum == 40L)
    // 60-token docs (cls 6) pack up to 4 per bin
    val cls6 = out.filter(_.getAs[Long]("cls") == 6L)
    assert(cls6.forall(_.getAs[Long]("n_docs") <= 4L) &&
      cls6.map(_.getAs[Long]("n_docs")).sum == 10L)
    // deterministic plan incl. member fingerprints
    val again = Packing.packPlanBucketed(docs, 256L, shards = 2).collect()
    assert(again.map(_.toString).sorted.sameElements(
      out.map(_.toString).sorted))
  }
}
