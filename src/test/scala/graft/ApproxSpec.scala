package graft

import graft.operators.Approx

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 20000)
    .map(i => (s"g${i % 2}", (i * 37) % 5000)).toDF("g", "v")

  test("approx distinct counts land within declared error of exact") {
    val approx = Approx.distinctCounts(data, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy("g").agg(org.apache.spark.sql.functions.countDistinct($"v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(approx(g) - n).toDouble / n < 0.15, s"$g: ${approx(g)} vs $n")
    }
  }

  test("cmsTopK estimates are one-sided and exact without collisions") {
    // 3 tokens with distinct counts; w=2048 makes a 3-token collision in
    // all 3 rows essentially impossible, so estimates must be exact
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = Approx.cmsTopK(docs, d = 3, w = 2048, k = 10)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("true_count"), r.getAs[Long]("cms_est"))).toMap
    assert(out == Map("a" -> (3L, 3L), "b" -> (2L, 2L), "c" -> (1L, 1L)))
  }

  test("cmsTopK overestimates but never underestimates under forced collisions") {
    // w=2: heavy collisions guaranteed; the sketch may only ADD mass
    val docs = (0 until 50).map(i => (i.toLong, s"t${i % 7} filler"))
      .toDF("doc_id", "text")
    Approx.cmsTopK(docs, d = 2, w = 2, k = 20).collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_count"))
    }
  }

  test("hllAudit: exact column is truly exact and the estimate is within HLL error") {
    // 2 groups x ~3000 / ~5000 distinct values
    val df = (1 to 40000).map(i => (s"g${i % 2}", (i * 13) % (3000 + (i % 2) * 2000)))
      .toDF("g", "v")
    val out = Approx.hllAudit(df, "g", "v").collect()
      .map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_exact"), r.getAs[Double]("hll_est"))).toMap
    val exact = df.distinct().groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(out(g)._1 == n, s"$g exact column")
      // m=512 -> rse ~ 1.04/sqrt(512) ~ 4.6%; allow 4 sigma
      assert(math.abs(out(g)._2 - n) / n < 0.20, s"$g est ${out(g)._2} vs $n")
    }
  }

  test("hllAudit small-range correction engages on tiny cardinalities") {
    val df = (1 to 500).map(i => ("g", i % 40)).toDF("g", "v")
    val r = Approx.hllAudit(df, "g", "v").collect().head
    assert(r.getAs[Long]("n_exact") == 40L)
    assert(r.getAs[Boolean]("small_range"))
    assert(math.abs(r.getAs[Double]("hll_est") - 40.0) < 10.0)
  }

  test("hll register files merge by per-register max (shardability law)") {
    val all = (1 to 6000).map(i => ("g", (i * 7) % 4000)).toDF("g", "v")
    val shardA = all.where($"v" % 2 === 0)
    val shardB = all.where($"v" % 2 === 1)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Approx.hllRegisters(df, "g", "v")
        .select("idx", "mx").collect()
        .map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mx")).toMap
    val direct = regs(all)
    val merged = (regs(shardA).toSeq ++ regs(shardB).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == direct)
  }

  test("joinSizeAudit: exact quadratic sum, key-correlated sample tracks it") {
    // 100 keys with n=4 rows each, plus one hot key with 100 rows:
    // exact pairs = 100*16 + 10000 = 11600
    val df = ((1 to 100).flatMap(k => Seq.fill(4)(("g", k))) ++
      Seq.fill(100)(("g", 999))).toDF("g", "k")
    val r = Approx.joinSizeAudit(df, "g", "k").collect().head
    assert(r.getAs[Long]("n_keys") == 101L)
    assert(r.getAs[Long]("exact_pairs") == 11600L)
    // est is 8x a sampled quadratic sum: always a multiple of 8 x 16 or
    // includes the hot key's 10000; just demand the audit math holds
    val est = r.getAs[Long]("est_pairs")
    assert(est % 8L == 0L)
    val errBp = r.getAs[Long]("err_bp")
    assert(errBp == math.round(math.abs(est - 11600L).toDouble / 11600L * 10000.0))
  }

  test("histQuantileRollup: merged histograms hit hand-checked rank values") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 10 rows of known cents spread over 2 days: sorted cents are
    // 100,100,200,200,200,300,300,400,500,900 -> p50 = 5th = 200,
    // p95 = ceil(9.5)=10th = 900
    val vals = Seq(1.00, 2.00, 3.00, 1.00, 2.00).map(("g", ts("2024-01-01 00:00:00"), _)) ++
      Seq(2.00, 3.00, 4.00, 5.00, 9.00).map(("g", ts("2024-01-02 00:00:00"), _))
    val df = vals.toDF("g", "ts", "v")
    val r = Approx.histQuantileRollup(df, "g", "ts", "v").collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("p50_hist") == 200L)
    assert(r.getAs[Long]("p95_hist") == 900L)
    assert(r.getAs[Boolean]("rollup_matches"))
  }

  test("hllRollupAudit: day-merged estimate equals the direct sketch") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 3 days, users overlapping across days (the case where summing daily
    // distincts would over-count but register max-merge must not)
    val ev = (1 to 900).map { i =>
      ("g", ts(f"2024-01-${i % 3 + 1}%02d 10:00:00"), i % 400)
    }.toDF("g", "ts", "u")
    val r = Approx.hllRollupAudit(ev, "g", "ts", "u").collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_exact") == 400L)
    assert(r.getAs[Boolean]("rollup_matches"))
    assert(r.getAs[Double]("hll_est") == r.getAs[Double]("hll_est_rollup"))
    assert(math.abs(r.getAs[Double]("hll_est") - 400.0) / 400.0 < 0.20)
  }

  test("hllTimeline: final-day estimate equals the full-set sketch, exact " +
      "running count is right, forward fill spans untouched days") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // day 1: users 0..299; day 2: 100..399 (100 new); day 3: ONE
    // repeat user (nothing new — the day whose registers arrive almost
    // entirely by forward fill, the case a prefix-rescan-free plan must
    // still get right)
    val ev = ((0 until 300).map(u => ("g", ts("2024-01-01 10:00:00"), u)) ++
      (100 until 400).map(u => ("g", ts("2024-01-02 10:00:00"), u)) ++
      Seq(("g", ts("2024-01-03 10:00:00"), 0)))
      .toDF("g", "ts", "u")
    val rows = Approx.hllTimeline(ev, "g", "ts", "u").collect()
    assert(rows.length == 3)
    val byDay = rows.map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(byDay("2024-01-01").getAs[Long]("n_new") == 300L)
    assert(byDay("2024-01-02").getAs[Long]("n_new") == 100L)
    assert(byDay("2024-01-03").getAs[Long]("n_new") == 0L)
    assert(byDay("2024-01-03").getAs[Long]("n_exact_cum") == 400L)
    // cumulative estimate is monotone non-decreasing (register max only
    // grows) and the final day equals the whole-set audit estimate
    val ests = Seq("2024-01-01", "2024-01-02", "2024-01-03")
      .map(d => byDay(d).getAs[Double]("hll_est_cum"))
    assert(ests == ests.sorted)
    val full = Approx.hllAudit(ev, "g", "u").collect().head
      .getAs[Double]("hll_est")
    assert(ests.last == full,
      s"timeline final ${ests.last} != full-set audit $full")
    // day 3 added nothing distinct: its estimate equals day 2's
    assert(ests(2) == ests(1))
    assert(math.abs(ests.last - 400.0) / 400.0 < 0.20)
  }

  test("kmvOverlap: exact columns match set truth; complete-sketch pairs are exact") {
    // a: 0..39, b: 20..59 -> inter 20, union 60; both < k=64 so the
    // sketches are complete sets and the estimates must equal the truth
    val df = ((0 until 40).map(v => ("a", v)) ++ (20 until 60).map(v => ("b", v)))
      .toDF("g", "v")
    val r = Approx.kmvOverlap(df, "g", "v").collect().head
    assert(r.getAs[Long]("n_a") == 40L && r.getAs[Long]("n_b") == 40L)
    assert(r.getAs[Long]("inter_exact") == 20L)
    assert(r.getAs[Long]("union_exact") == 60L)
    assert(r.getAs[Double]("union_est") == 60.0)
    assert(r.getAs[Long]("union_err_bp") == 0L)
  }

  test("kmvOverlap estimates track truth on oversized sets") {
    // a: 3000 values, b: 3000 values, 50% overlap
    val df = ((0 until 3000).map(v => ("a", v)) ++
      (1500 until 4500).map(v => ("b", v))).toDF("g", "v")
    val r = Approx.kmvOverlap(df, "g", "v").collect().head
    assert(r.getAs[Long]("union_exact") == 4500L)
    val jacc = r.getAs[Double]("jacc_kmv")
    // true jaccard = 1500/4500 = 0.3333; k=64 -> sd ~ sqrt(J(1-J)/k) ~ 0.059
    assert(math.abs(jacc - 0.3333) < 0.25, s"jacc_kmv $jacc")
    val uEst = r.getAs[Double]("union_est")
    assert(math.abs(uEst - 4500.0) / 4500.0 < 0.5, s"union_est $uEst")
  }

  test("kmvDifference: complete-sketch pairs are exact; the one-sided " +
      "shares decompose the merged sketch; oversized estimates track") {
    val small = ((0 until 40).map(v => ("a", v)) ++
      (20 until 60).map(v => ("b", v))).toDF("g", "v")
    val r = Approx.kmvDifference(small, "g", "v").collect().head
    assert(r.getAs[Long]("diff_a_exact") == 20L &&
      r.getAs[Long]("diff_b_exact") == 20L)
    assert(r.getAs[Double]("diff_a_est") == 20.0 &&
      r.getAs[Double]("diff_b_est") == 20.0)
    assert(r.getAs[Long]("diff_a_err_bp") == 0L &&
      r.getAs[Long]("diff_b_err_bp") == 0L)
    // the merged sketch partitions exactly: a_only + b_only + matches = kk
    assert(r.getAs[Long]("a_only") + r.getAs[Long]("b_only") +
      r.getAs[Long]("matches") == r.getAs[Long]("kk"))
    // oversized sets: a 0..2999, b 1500..4499 -> |A\B| = |B\A| = 1500
    val big = ((0 until 3000).map(v => ("a", v)) ++
      (1500 until 4500).map(v => ("b", v))).toDF("g", "v")
    val rb = Approx.kmvDifference(big, "g", "v").collect().head
    assert(rb.getAs[Long]("diff_a_exact") == 1500L)
    assert(rb.getAs[Long]("a_only") + rb.getAs[Long]("b_only") +
      rb.getAs[Long]("matches") == rb.getAs[Long]("kk"))
    // k=64 sampling: the share estimate lands within ~3 sd of truth
    val est = rb.getAs[Double]("diff_a_est")
    assert(math.abs(est - 1500.0) / 4500.0 < 0.25, s"diff_a_est $est")
  }

  test("bloomJoinAudit: no false negatives, plausible FP rate, exact counts") {
    val build = (1 to 100).map(k => k * 7).toDF("k") // keys 7,14,...,700
    val probe = (1 to 5000).map(k => k.toLong).toDF("p")
    val r = Approx.bloomJoinAudit(probe, "p", build, "k").collect().head
    assert(r.getAs[Long]("n_build") == 100L)
    assert(r.getAs[Long]("n_probe") == 5000L)
    assert(r.getAs[Long]("n_match") == 100L) // multiples of 7 <= 700
    assert(r.getAs[Boolean]("no_false_negatives"))
    // m=4096, k=3, n=100 -> FPR ~ (1-e^-0.073)^3 ~ 3.5e-4; allow slack
    assert(r.getAs[Long]("fp_bp") < 100L, s"fp_bp ${r.getAs[Long]("fp_bp")}")
    assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_match"))
  }

  test("bloomJoinAudit: empty build side passes nothing, matches nothing") {
    val build = Seq.empty[Int].toDF("k")
    val probe = (1 to 50).map(_.toLong).toDF("p")
    val r = Approx.bloomJoinAudit(probe, "p", build, "k").collect().head
    assert(r.getAs[Long]("n_pass") == 0L && r.getAs[Long]("n_match") == 0L)
    assert(r.getAs[Boolean]("no_false_negatives"))
  }

  test("sampleQuantileAudit: rate near 1/2^bits and quantiles track exact") {
    val df = (1 to 20000).map(i => ("g", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val r = Approx.sampleQuantileAudit(df, "g", "v", "id", shiftBits = 3)
      .collect().head
    assert(r.getAs[Long]("n_total") == 20000L)
    val rateBp = r.getAs[Long]("sample_bp")
    assert(math.abs(rateBp - 1250L) < 300L, s"sample_bp $rateBp") // 1/8
    // uniform 1..20000: sampled quantiles within a few percent
    assert(math.abs(r.getAs[Double]("samp_p50") - 10000.0) < 1500.0)
    assert(math.abs(r.getAs[Double]("samp_p95") - 19000.0) < 600.0)
  }

  test("sampleQuantileAudit is deterministic across partitionings") {
    val df = (1 to 5000).map(i => ("g", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val a = Approx.sampleQuantileAudit(df.repartition(3), "g", "v", "id")
      .collect().head
    val b = Approx.sampleQuantileAudit(df.repartition(11), "g", "v", "id")
      .collect().head
    assert(a == b)
  }

  test("approx percentiles track exact quantiles") {
    val out = Approx.percentiles(data, Seq("g"), "v", Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    // values are (i*37)%5000: near-uniform on [0, 5000)
    out.foreach { case (_, Seq(p50, p95)) =>
      assert(math.abs(p50 - 2500) < 150.0)
      assert(math.abs(p95 - 4750) < 150.0)
    }
  }

  // the streaming heavyHitters spec's fixture, as a batch frame:
  // user 1 x20, user 2 x10, user 3 x6, 12 singletons — N = 48
  private def hhFixture = {
    val evs =
      (1 to 12).map(i => ("click", 1L, 60L + i, i.toLong)) ++
      (13 to 18).map(i => ("click", 2L, 120L + i, i.toLong)) ++
      (19 to 24).map(i => ("click", (100 + i).toLong, 180L + i, i.toLong)) ++
      (25 to 32).map(i => ("click", 1L, 660L + i, i.toLong)) ++
      (33 to 36).map(i => ("click", 2L, 720L + i, i.toLong)) ++
      (37 to 42).map(i => ("click", 3L, 780L + i, i.toLong)) ++
      (43 to 48).map(i => ("click", (200 + i).toLong, 840L + i, i.toLong))
    evs.toDF("g", "i", "o1", "o2")
  }

  test("spaceSavingSummary: m-bounded counters, Metwally bounds vs exact, " +
      "eviction inherits the min est, deterministic across partitionings") {
    val m = 4
    val out = Approx.spaceSavingSummary(hhFixture, m).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.size <= m)
    val trueCount = Map(1L -> 20L, 2L -> 10L, 3L -> 6L).withDefaultValue(1L)
    out.foreach { case (item, (est, err)) =>
      assert(est >= trueCount(item), s"underestimate for $item")
      assert(est - err <= trueCount(item), s"est-err overshoot for $item")
    }
    // freq > N/m = 12: user 1 MUST be tracked, and it never lost its
    // counter, so its est is exact with zero inherited error
    assert(out.contains(1L))
    assert(out(1L) == ((20L, 0L)))
    // the singleton tail churned through evictions: at least one tracked
    // counter carries inherited (nonzero) error
    assert(out.values.exists(_._2 > 0L), s"no eviction happened: $out")
    // partitioning-invariant: the repartition(g) + in-partition sort pins
    // the fold order whatever the input layout
    val again = Approx.spaceSavingSummary(hhFixture.repartition(7), m)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("spaceSavingSummary: a NULL group key is summarized like any " +
      "other group, not silently dropped") {
    val withNull = hhFixture.unionByName(
      Seq((null.asInstanceOf[String], 9L, 1L, 1L),
        (null.asInstanceOf[String], 9L, 2L, 2L),
        (null.asInstanceOf[String], 8L, 3L, 3L)).toDF("g", "i", "o1", "o2"))
    val out = Approx.spaceSavingSummary(withNull, 4).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    val nullRows = out.filter(_._1.isEmpty)
    assert(nullRows.map(t => t._2 -> t._3).toMap == Map(9L -> 2L, 8L -> 1L))
    assert(nullRows.forall(_._4 == 3L)) // the null group's stream length
    // and the real group's summary is unchanged by the null neighbor
    assert(out.count(_._1.contains("click")) <= 4)
  }

  test("spaceSavingSummarySharded: shards own their items wholly, bounds " +
      "hold per shard, and the sharded audit equals the unsharded one") {
    val m = 4
    val sharded = Approx.spaceSavingSummarySharded(hhFixture, m, shards = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // every item lives in exactly one shard
    val perItem = sharded.groupBy(_._3).view.mapValues(_.map(_._2).toSet)
    assert(perItem.values.forall(_.size == 1))
    // per-shard m bound and stream-length consistency
    sharded.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.length <= m)
      assert(rows.map(_._6).toSet.size == 1) // one n_events per shard
    }
    // shard stream lengths sum to the group's
    assert(sharded.map(t => (t._1, t._2, t._6)).distinct.map(_._3).sum == 48L)
    val trueCount = Map(1L -> 20L, 2L -> 10L, 3L -> 6L).withDefaultValue(1L)
    sharded.foreach { case (_, _, item, est, err, _) =>
      assert(est >= trueCount(item) && est - err <= trueCount(item))
    }
    // the published audit is plan-independent: sharded == unsharded
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6))).toSeq
    assert(rows(Approx.spaceSavingAuditSharded(hhFixture, m, shards = 3)) ==
      rows(Approx.spaceSavingAudit(hhFixture, m)))
  }

  // ---- bottom-k quantile sketch ------------------------------------

  private def qskFixture = {
    // 3 "days" x 400 rows, long-tailed integer values, unique ids
    val ts = Seq("2024-03-01 10:00:00", "2024-03-02 10:00:00",
      "2024-03-03 10:00:00")
    (0 until 1200).map { i =>
      val v = ((i * 37) % 100) + (if (i % 50 == 0) 5000.0 else 0.0)
      ("m", java.sql.Timestamp.valueOf(ts(i % 3)), i.toLong, v / 100.0)
    }.toDF("g", "ts", "id", "value")
  }

  test("quantile sketch: min-k merge of daily states equals the direct " +
      "range sketch EXACTLY (mergeability), invariant to partitioning") {
    val daily = Approx.quantileSketchDaily(qskFixture, "g", "ts", "id",
      "value", k = 64).collect()
    // state is bounded and ranked 1..k per (g, day)
    val byDay = daily.groupBy(r => r.getAs[java.sql.Date]("day"))
    assert(byDay.size == 3 && byDay.values.forall(_.length == 64))
    byDay.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 64L))
      assert(rows.forall(_.getAs[Long]("n_day") == 400L))
    }
    // the three daily states re-ranked to bottom-64 == bottom-64 of the
    // raw union: the exact merge law (min-k is the register max here)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("hk"), r.getAs[Long]("id"), r.getAs[Long]("v"))
    val mergedFromStates = daily.map(key).sortBy(_._1).take(64).toSet
    val directAll = Approx.quantileSketchDaily(
      qskFixture.withColumn("ts", org.apache.spark.sql.functions
        .lit(java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))),
      "g", "ts", "id", "value", k = 64).collect().map(key).toSet
    assert(mergedFromStates == directAll)
    // partitioning-invariance: the two-phase rank pins the same state
    val again = Approx.quantileSketchDaily(qskFixture.repartition(7),
      "g", "ts", "id", "value", k = 64).collect().map(key).toSet
    assert(again == daily.map(key).toSet)
  }

  test("quantileRollup: rollup_matches certifies state equality, the " +
      "complete-sample corner is exact, estimates track the rank truth") {
    val out = Approx.quantileRollup(qskFixture, "g", "ts", "id", "value",
      "2024-03-01", "2024-03-03", k = 64).collect()
      .map(r => r.getAs[Long]("q") -> r).toMap
    assert(out.keySet == Set(50L, 95L))
    out.values.foreach { r =>
      assert(r.getAs[Boolean]("rollup_matches"))
      assert(r.getAs[Long]("n_range") == 1200L)
      assert(r.getAs[Long]("m_sample") == 64L)
      // a 64-sample p50 of this distribution stays in the flat body
      assert(r.getAs[Long]("err_bp") >= 0L)
    }
    // complete-sample corner: k >= n makes the sketch the whole range,
    // so the estimate IS the exact rank statistic for every q
    val small = Approx.quantileRollup(qskFixture, "g", "ts", "id",
      "value", "2024-03-01", "2024-03-03", k = 2048).collect()
    small.foreach { r =>
      assert(r.getAs[Long]("m_sample") == r.getAs[Long]("n_range"))
      assert(r.getAs[Long]("est_cents") == r.getAs[Long]("exact_cents"))
      assert(r.getAs[Long]("err_bp") == 0L)
      assert(r.getAs[Boolean]("rollup_matches"))
    }
  }

  test("cmsRollup: merged daily matrices are IDENTICAL to the direct " +
      "sketch, estimates are one-sided and exact without collisions") {
    import java.sql.Date
    // three days, one item spanning all days plus per-day singletons; a
    // tiny w forces real collisions so one_sided is exercised under them
    val rows =
      (1 to 30).map(_ => ("hot", Date.valueOf("2024-03-01"))) ++
      (1 to 20).map(_ => ("hot", Date.valueOf("2024-03-02"))) ++
      (1 to 10).map(_ => ("hot", Date.valueOf("2024-03-03"))) ++
      (1 to 7).map(i => (s"u$i", Date.valueOf(s"2024-03-0${i % 3 + 1}")))
    val toks = rows.toDF("token", "day")
    val out = Approx.cmsRollup(toks, d = 3, w = 8, k = 10).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // the merge law is an identity, whatever the collision pattern
      assert(r.getAs[Boolean]("cells_match"))
      assert(r.getAs[Boolean]("one_sided"))
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_count"))
    }
    // the cross-day item's TRUE count spans all three days — the merge
    // summed its daily cells, it did not pick one day
    val hot = out.find(_.getAs[String]("item") == "hot").get
    assert(hot.getAs[Long]("true_count") == 60L)
    assert(hot.getAs[Long]("cms_est") >= 60L)
    // with a wide sketch (no collisions possible at this cardinality)
    // every estimate is exact
    val exact = Approx.cmsRollup(toks, d = 3, w = 4096, k = 10).collect()
    exact.foreach { r =>
      assert(r.getAs[Long]("cms_est") == r.getAs[Long]("true_count"))
      assert(r.getAs[Boolean]("cells_match"))
    }
  }

  test("quantile sketch quantile validation fails fast: non-centile, " +
      "out-of-range, and colliding labels all throw") {
    def rollup(qs: Seq[Double]) = Approx.quantileRollup(qskFixture, "g",
      "ts", "id", "value", "2024-03-01", "2024-03-03", k = 4, qs = qs)
    intercept[IllegalArgumentException](rollup(Seq(0.0)))
    intercept[IllegalArgumentException](rollup(Seq(1.5)))
    intercept[IllegalArgumentException](rollup(Seq(0.955)))       // not a centile
    intercept[IllegalArgumentException](rollup(Seq(0.5, 0.5)))    // label collision
    intercept[IllegalArgumentException](
      Approx.quantileTimeline(qskFixture, "g", "ts", "id", "value",
        k = 4, qs = Seq(-0.5)))
  }

  test("quantile sketch NULL contract: NULL-group and NULL-value rows " +
      "are excluded up front, and the fixture ids are globally unique") {
    // the documented contract: a NULL value has no rank position and a
    // NULL group would vanish in the rollup equi-joins — both are
    // filtered at the base, so n_day counts non-NULL-valued rows only
    val withNulls = qskFixture.unionByName(Seq(
      (null.asInstanceOf[String], java.sql.Timestamp.valueOf(
        "2024-03-01 10:00:00"), 9001L, 1.23),
      ("m", java.sql.Timestamp.valueOf("2024-03-02 10:00:00"), 9002L,
        0.0)).toDF("g", "ts", "id", "value")
      .withColumn("value", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("id") === 9002L,
          org.apache.spark.sql.functions.lit(null)).otherwise(
          org.apache.spark.sql.functions.col("value"))))
    val daily = Approx.quantileSketchDaily(withNulls, "g", "ts", "id",
      "value", k = 2048).collect()
    assert(daily.forall(_.getAs[String]("g") == "m"))
    assert(!daily.exists(r => r.getAs[Long]("id") == 9001L ||
      r.getAs[Long]("id") == 9002L))
    assert(daily.forall(_.getAs[Long]("n_day") == 400L))
    // the merge-law precondition (UNIQUE idCol) holds on this fixture —
    // the same property the registered events fixture carries
    val ids = qskFixture.select("id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("quantileTimeline: final-day estimate equals the full-range " +
      "rollup, running counts and samples are monotone") {
    val out = Approx.quantileTimeline(qskFixture, "g", "ts", "id",
      "value", k = 64).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("q"), r.getAs[Long]("n_todate"),
        r.getAs[Long]("m_sample"), r.getAs[Long]("est_cents"))).toSeq
    assert(out.map(_._1).distinct.size == 3) // one row set per day
    // monotone: n_todate strictly grows, m_sample never shrinks
    val perDay = out.groupBy(_._1).view
      .mapValues(rs => (rs.head._3, rs.head._4)).toMap.toSeq.sortBy(_._1)
    assert(perDay.map(_._2._1) == Seq(400L, 800L, 1200L))
    assert(perDay.map(_._2._2).sliding(2).forall(p => p.head <= p.last))
    // the last day's estimates ARE the full-range rollup's (same state)
    val rollup = Approx.quantileRollup(qskFixture, "g", "ts", "id",
      "value", "2024-03-01", "2024-03-03", k = 64).collect()
      .map(r => r.getAs[Long]("q") -> r.getAs[Long]("est_cents")).toMap
    val lastDay = out.filter(_._1 == "2024-03-03")
      .map(t => t._2 -> t._5).toMap
    assert(lastDay == rollup, s"timeline $lastDay vs rollup $rollup")
  }

  test("spaceSavingRollupAudit: merged day summaries keep the theorem " +
      "verdicts under genuine eviction, and merging is deterministic") {
    // two days with m=3 counters: day 1 churns the tail (evictions →
    // inherited error), day 2 re-balances; item 1 is hot on both days
    // (true 12 of N=30 → exact·m = 36 > 2N = 60? no — use N per day)
    def day(d: String, items: Seq[Long], off: Int) =
      items.zipWithIndex.map { case (it, i) =>
        ("click", d, it, (off + i).toLong, (off + i).toLong) }
    val d1 = day("d1", Seq(1L, 1L, 1L, 1L, 2L, 2L, 101L, 102L, 103L, 1L), 0)
    val d2 = day("d2", Seq(1L, 1L, 1L, 2L, 2L, 104L, 105L, 1L, 1L, 1L), 100)
    val items = (d1 ++ d2).toDF("g", "day", "i", "o1", "o2")
    val m = 3
    // item 1: true 11 of N=20 → 11·3 = 33 > 2·20 = 40? No — 33 < 40.
    // Use the audit frame directly and check the verdicts for the rows
    // it publishes, plus determinism across partitionings.
    val out = Approx.spaceSavingRollupAudit(items, m).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6))).toSeq
    // guaranteed set at 2e: exact·3 > 2·20 → exact > 13.3 — empty here;
    // widen by checking the internal bounds on a hotter fixture instead
    val hot = (day("d3", Seq.fill(14)(7L) ++ Seq(201L, 202L, 203L), 0) ++
      day("d4", Seq.fill(14)(7L) ++ Seq(204L, 205L, 206L), 100))
      .toDF("g", "day", "i", "o1", "o2")
    val hotOut = Approx.spaceSavingRollupAudit(hot, m).collect()
      .map(r => (r.getLong(1), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    // item 7: true 28 of N=34, 28·3 = 84 > 68 — guaranteed, all four
    // verdicts must hold despite per-day tail eviction
    assert(hotOut == Seq((7L, true, true, true, true)), s"got $hotOut")
    // determinism: the published audit is partitioning-invariant
    val again = Approx.spaceSavingRollupAudit(items.repartition(7), m)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6))).toSeq
    assert(again == out)
  }

  test("spaceSavingTimelineAudit: every prefix's guaranteed set carries " +
      "all four verdicts, the final day equals the full-range rollup, " +
      "and the set drifts as N grows") {
    def day(d: String, items: Seq[Long], off: Int) =
      items.zipWithIndex.map { case (it, i) =>
        ("click", d, it, (off + i).toLong, (off + i).toLong) }
    // day 3: item 7 dominates (14 of 17 → guaranteed); day 4 adds tail
    // mass only, so 7 stays guaranteed but its margin shrinks — and a
    // day-4-only hot item 9 becomes guaranteed only at the final prefix
    val hot = (day("d3", Seq.fill(14)(7L) ++ Seq(201L, 202L, 203L), 0) ++
      day("d4", Seq.fill(10)(9L) ++ Seq(7L, 7L, 204L, 205L), 100))
      .toDF("g", "day", "i", "o1", "o2")
    val m = 3
    val out = Approx.spaceSavingTimelineAudit(hot, m).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
          r.getBoolean(7))).toMap
    // prefix d3 (N=17): 7 has 14·3 = 42 > 34 — guaranteed; prefix d4
    // (N=31): 7 has 16·3 = 48 > 62? no — it DROPS out; 9 has 10·3 = 30
    // > 62? no. Guaranteed sets: d3 → {7}, d4 → {} … recompute: 2e
    // threshold is exact·m > 2N. d3: 42 > 34 ✓. d4: 7 → 48 ≤ 62, 9 →
    // 30 ≤ 62 — the drift IS the story: the set shrinks as mass spreads
    assert(out.keySet == Set(("d3", 7L)), s"got ${out.keySet}")
    assert(out(("d3", 7L)) == ((14L, true, true, true, true)))
    // a heavier final day: make 9 hot enough to be guaranteed at d4
    val hot2 = (day("d3", Seq.fill(14)(7L) ++ Seq(201L, 202L, 203L), 0) ++
      day("d4", Seq.fill(40)(9L) ++ Seq(7L, 7L), 100))
      .toDF("g", "day", "i", "o1", "o2")
    val out2 = Approx.spaceSavingTimelineAudit(hot2, m).collect()
      .map(r => (r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
          r.getBoolean(7))).toMap
    // prefix d3 unchanged; prefix d4 (N=59): 9 → 40·3 = 120 > 118 ✓
    // guaranteed AND tracked through the merge; 7 → 48 ≤ 118 dropped
    assert(out2.keySet == Set(("d3", 7L), ("d4", 9L)), s"got ${out2.keySet}")
    assert(out2(("d4", 9L)) == ((40L, true, true, true, true)))
    // the final prefix IS the full-range rollup (same merge, same 2e
    // threshold, same verdicts)
    val rollup = Approx.spaceSavingRollupAudit(hot2, m).collect()
      .map(r => r.getLong(1) ->
        (r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6))).toMap
    val lastDay = out2.collect { case (("d4", it), v) => it -> v }.toMap
    assert(lastDay == rollup, s"timeline $lastDay vs rollup $rollup")
  }

  test("kmvTimeline: exact min-k prefix merge, Beyer estimator, " +
      "complete-sample corner, and consistency with kmvOverlap") {
    // two "audiences" arriving over three days with cross-day repeats
    val days = Seq("2024-03-01", "2024-03-02", "2024-03-03")
    val rows = (0 until 300).map { i =>
      val d = java.sql.Timestamp.valueOf(s"${days(i % 3)} 10:00:00")
      // values repeat across days: user space of 120 per group
      ("a", d, (i % 120).toLong)
    } ++ (0 until 200).map { i =>
      val d = java.sql.Timestamp.valueOf(s"${days(i % 3)} 10:00:00")
      ("b", d, (60 + (i % 120)).toLong) // overlaps a on 60..119
    }
    val df = rows.toDF("g", "ts", "uid")
    val out = Approx.kmvTimeline(df, "g", "ts", "uid", k = 16).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    // one row per (group, day); exact distinct-to-date is monotone and
    // ends at the true audience sizes
    assert(out.keySet.map(_._1) == Set("a", "b"))
    val aDays = days.map(d => out(("a", d)))
    assert(aDays.map(_._2).sliding(2).forall(p => p.head <= p.last))
    assert(aDays.last._2 == 120L && out(("b", days.last))._2 == 120L)
    // m_state bounded by k
    assert(out.values.forall(_._1 <= 16L))
    // complete-sample corner: k >= audience → est == exact, err 0
    val full = Approx.kmvTimeline(df, "g", "ts", "uid", k = 2048).collect()
    full.foreach { r =>
      assert(r.getDouble(4) == r.getLong(3).toDouble)
      assert(r.getLong(5) == 0L)
    }
    // consistency with the set-operation family: the timeline of the
    // UNION stream (one group) ends at kmvOverlap's union_est for the
    // (a, b) pair — both are the Beyer estimate off the same bottom-k
    // of the same 'kmv:' hashes (the exact merge law, cross-operator)
    val unionEst = Approx.kmvOverlap(
      df.selectExpr("g AS event_type", "uid AS user_id"),
      "event_type", "user_id", k = 16).collect()
      .map(_.getAs[Double]("union_est")).head
    val oneGroup = Approx.kmvTimeline(
      df.selectExpr("'all' AS g", "ts", "uid"), "g", "ts", "uid",
      k = 16).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getDouble(4))
      .toMap
    assert(oneGroup(days.last) == unionEst,
      s"timeline ${oneGroup(days.last)} vs overlap $unionEst")
  }

  test("spaceSavingAudit: the guaranteed set is tracked with all four " +
      "verdicts true; groups fold independently") {
    // two groups: the hh fixture under 'click', plus a 'view' group
    // whose single hot item dominates
    val g2 = (1 to 9).map(i => ("view", 7L, i.toLong, (100 + i).toLong)) ++
      (10 to 12).map(i => ("view", (300 + i).toLong, i.toLong, (100 + i).toLong))
    val items = hhFixture.unionByName(g2.toDF("g", "i", "o1", "o2"))
    val out = Approx.spaceSavingAudit(items, m = 4).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6))).toMap
    // click: freq > 48/4 = 12 -> only user 1 (20); view: 7 (9 > 12/4)
    assert(out.keySet == Set(("click", 1L), ("view", 7L)))
    assert(out(("click", 1L)) == ((20L, true, true, true, true)))
    assert(out(("view", 7L)) == ((9L, true, true, true, true)))
  }
}
