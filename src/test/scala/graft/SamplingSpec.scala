package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("hashSample is deterministic and close to the target fraction") {
    val a = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("split partitions rows disjointly and exhaustively") {
    val parts = Sampling.split(ids, "id", Seq(0.8, 0.1, 0.1))
      .map(_.as[Long].collect().toSet)
    assert(parts.map(_.size).sum == 2000)
    assert(parts.combinations(2).forall { case Seq(x, y) => (x & y).isEmpty })
    assert(math.abs(parts.head.size / 2000.0 - 0.8) < 0.05)
  }

  test("smaller samples nest inside larger ones (same hash space)") {
    val small = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    val large = Sampling.hashSample(ids, "id", 0.5).as[Long].collect().toSet
    assert(small.subsetOf(large))
  }

  test("stratifiedSample applies per-stratum fractions and drops others") {
    val df = (1L to 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val out = Sampling.stratifiedSample(df, "stratum", "id",
      Map("s0" -> 0.5, "s1" -> 0.1))
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("s2"))
    assert(math.abs(counts("s0") / 1000.0 - 0.5) < 0.1)
    assert(math.abs(counts("s1") / 1000.0 - 0.1) < 0.08)
  }

  test("tokenBudgetKeep caps each group near its token budget, deterministically") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "big" else "small", 10L))
      .toDF("doc_id", "source", "n_tokens")
    // big: 5000 tokens total, budget 1000 -> keep ~20%; small: unlimited
    val out = Sampling.tokenBudgetKeep(df, "source", "n_tokens", "doc_id",
      Seq("big" -> 1000L), defaultBudget = 1000000L)
    val again = Sampling.tokenBudgetKeep(df, "source", "n_tokens", "doc_id",
      Seq("big" -> 1000L), defaultBudget = 1000000L)
    assert(out.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 500L) // budget >= total keeps everything
    val keptBigTokens = kept("big") * 10L
    assert(keptBigTokens > 500 && keptBigTokens < 1600,
      s"kept $keptBigTokens tokens for a 1000-token budget")
  }

  test("domainCap keeps exactly cap docs per domain, by priority, at any partitioning") {
    val df = (1L to 900L)
      .map(i => (i, s"d${i % 3}", (i * 7) % 101)) // 300 docs x 3 domains
      .toDF("doc_id", "source", "n_chars")
    val expected = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).values
      .flatMap(rows => rows.sortBy { case (id, _, n) => (-n, id) }.take(25))
      .map(_._1).toSet
    for (parts <- Seq(1, 5, 32)) {
      val out = Sampling.domainCap(df.repartition(parts), cap = 25)
      val got = out.select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"parts=$parts")
      val ranks = out.groupBy("source")
        .agg(org.apache.spark.sql.functions.max("rank")).collect()
      assert(ranks.forall(_.getLong(1) == 25L))
    }
  }

  test("domainCap survives a single dominant domain without a global sort") {
    val skew = (1L to 5000L).map(i => (i, "mega", i % 997))
      .toDF("doc_id", "source", "n_chars")
    val out = Sampling.domainCap(skew.repartition(16), cap = 10)
    assert(out.count() == 10)
    // top-10 by (n_chars desc, doc_id asc): n_chars=996 at doc_ids 996k+...
    val ids = out.select("doc_id").as[Long].collect().toSet
    val want = (1L to 5000L).map(i => (i, i % 997))
      .sortBy { case (id, n) => (-n, id) }.take(10).map(_._1).toSet
    assert(ids == want)
  }

  test("mixPlan apportions the budget by weight and reports epochs") {
    val df = Seq(("a", 100L), ("a", 100L), ("b", 50L))
      .toDF("source", "n_tokens")
    // totals: a=200, b=50; weights a=3, b=1 -> targets 750, 250
    val out = Sampling.mixPlan(df, "source", "n_tokens",
      Seq("a" -> 3), defaultWeight = 1, totalBudget = 1000L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("epochs_bp"))).toMap
    assert(out("a") == (200L, 750L, 37500L)) // 3.75 epochs
    assert(out("b") == (50L, 250L, 50000L))  // 5 epochs
  }

  test("temperatureMixPlan: sqrt weights flatten the mix toward parity") {
    // masses 100 vs 400: raw shares 20/80, sqrt weights 10:20 -> 33/67.
    // w_micro: sqrt(100)=10 exactly, sqrt(400)=20 exactly
    val df = Seq(("a", 100L), ("b", 400L)).toDF("source", "n_tokens")
    val out = Sampling.temperatureMixPlan(df, "source", "n_tokens",
      totalBudget = 3000L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("w_micro"),
          r.getAs[Long]("target_tokens"), r.getAs[Long]("epochs_bp"))).toMap
    assert(out("a") == (100L, 10000000L, 1000L, 100000L)) // 10 epochs
    assert(out("b") == (400L, 20000000L, 2000L, 50000L))  // 5 epochs
    // high-resource b gets 2/3 of the budget, not its raw 4/5 share —
    // the alpha=1/2 flattening
  }

  test("shardPlan conserves corpus mass and is partitioning-invariant") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok${i} tok${i + 1} tok${i + 2}", 3L))
      .toDF("doc_id", "text", "n_chars")
    val plan = Sampling.shardPlan(docs, nShards = 8).collect()
    assert(plan.map(_.getAs[Long]("shard")).toSet.subsetOf((0L until 8L).toSet))
    assert(plan.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(plan.map(_.getAs[Long]("n_tokens")).sum == 600L)
    // identical manifest (incl. the order fingerprint) from a different
    // physical partitioning — nothing about the plan depends on layout
    val again = Sampling.shardPlan(docs.repartition(7), nShards = 8)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[String]("order_fp")).toMap
    plan.foreach(r =>
      assert(again(r.getAs[Long]("shard")) == r.getAs[String]("order_fp")))
  }

  test("shardPlan fingerprint matches the physical sharded write order") {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val docs = (0L until 60L).map(i => (i, s"w$i", 1L))
      .toDF("doc_id", "text", "n_chars")
    val fp = Sampling.shardPlan(docs, nShards = 4)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[String]("order_fp")).toMap
    // the write path shardPlan audits: repartition on the same shard key,
    // sort within partitions by the same salted order fold
    val shard = pmod(rollingHash(concat(lit("shard:"), $"doc_id".cast("string"))), lit(4L))
    val ord = rollingHash(concat(lit("order:"), $"doc_id".cast("string")))
    val written = docs
      .withColumn("shard", shard).withColumn("ord", ord)
      .repartition(4, col("shard")).sortWithinPartitions(col("ord"), col("doc_id"))
    val byShard = written.select("shard", "doc_id").collect()
      .groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (s, rows) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val seq = rows.map(_.getAs[Long]("doc_id")).mkString(" ")
      val hex = md.digest(seq.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp(s) == hex)
    }
  }

  test("groupSample takes exactly k per group, invariant to partitioning") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val a = Sampling.groupSample(docs, "source", k = 7).collect()
    assert(a.groupBy(_.getAs[String]("source")).forall(_._2.length == 7))
    val b = Sampling.groupSample(docs.repartition(11), "source", k = 7)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).toSet
    assert(b == a.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"))).toSet)
    // a small group yields its whole membership
    val tiny = Sampling.groupSample(docs.where($"doc_id" < 4), "source", k = 7)
    assert(tiny.count() == 4)
  }

  test("dsirSelect shifts the selected mix toward the target distribution") {
    import org.apache.spark.sql.functions.col
    // two vocabularies: target-flavored docs ('alpha beta ...') and
    // off-distribution docs ('zz yy ...'); the target predicate marks a
    // SMALL slice of the alpha family. DSIR must prefer unlabeled alpha
    // docs over zz docs at equal k.
    val alpha = (0L until 40L).map(i =>
      (i, s"alpha beta gamma delta w$i", i < 5))
    val noise = (100L until 140L).map(i =>
      (i, s"zz yy xx ww v$i", false))
    val docs = (alpha ++ noise).toDF("doc_id", "text", "is_tgt")
    val out = Sampling.dsirSelect(docs, target = col("is_tgt"),
      buckets = 128, k = 20).collect()
    assert(out.length == 80)
    assert(out.count(_.getAs[Boolean]("selected")) == 20)
    val selIds = out.filter(_.getAs[Boolean]("selected"))
      .map(_.getAs[Long]("doc_id")).toSet
    // selection is dominated by the alpha family (ids < 100)
    val nAlpha = selIds.count(_ < 100L)
    assert(nAlpha >= 16, s"expected alpha-dominated selection, got $selIds")
    // weights separate the families: every alpha logw above every noise
    val byFam = out.groupBy(_.getAs[Long]("doc_id") < 100L)
      .map { case (f, rs) => f -> rs.map(_.getAs[Long]("logw_u")) }
    assert(byFam(true).min > byFam(false).max)
    // deterministic under repartitioning
    val again = Sampling.dsirSelect(docs.repartition(7), target = col("is_tgt"),
      buckets = 128, k = 20).collect()
      .filter(_.getAs[Boolean]("selected")).map(_.getAs[Long]("doc_id")).toSet
    assert(again == selIds)
  }

  test("quantileGate keeps rows at or above their group's quantile") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 20L)).toDF("g", "score")
    val out = Sampling.quantileGate(df, "g", "score", 0.5)
      .select("g", "score").as[(String, Long)].collect().toSet
    // group a: p50 = 2.5 -> keeps 3,4; group b: p50 = 15 -> keeps 20
    assert(out == Set(("a", 3L), ("a", 4L), ("b", 20L)))
  }

  test("epochPlan: breadth-first grants, priority tie-break mid-round, " +
      "the repetition cap, and budget conservation") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    // three sources, 100 tokens each; corpus = 300, budget 250% = 750
    // tokens = 7.5 epochs' worth across 3 sources; cap at 3 epochs
    val docs = Seq(("a", 100L), ("b", 100L), ("c", 100L))
      .toDF("source", "n_tokens")
    val pri = expr(
      "CASE source WHEN 'b' THEN 3 WHEN 'c' THEN 2 ELSE 1 END")
    val out = Sampling.epochPlan(docs, "source", "n_tokens", pri,
      budgetBp = 25000L, maxEpochs = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("epochs"), r.getAs[Long]("tokens_used"))).toMap
    // rounds 1 and 2 grant everyone (600); round 3 has 150 left ->
    // only b (pri 3) fits; the cap would stop a 4th round anyway
    assert(out == Map("a" -> (2L, 200L), "b" -> (3L, 300L),
      "c" -> (2L, 200L)), s"got $out")
    // conservation: total granted <= budget
    assert(out.values.map(_._2).sum <= 750L)
    // the cap binds when the budget is generous: 10x budget, cap 2
    val capped = Sampling.epochPlan(docs, "source", "n_tokens", pri,
      budgetBp = 100000L, maxEpochs = 2)
      .collect().map(_.getAs[Long]("epochs")).toSeq
    assert(capped == Seq(2L, 2L, 2L))
    // zero-token groups never enter the plan
    val withEmpty = docs.unionByName(
      Seq(("z", 0L)).toDF("source", "n_tokens"))
    assert(!Sampling.epochPlan(withEmpty, "source", "n_tokens", pri,
      budgetBp = 25000L, maxEpochs = 3)
      .collect().map(_.getString(0)).contains("z"))
  }
}
