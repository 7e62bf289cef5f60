package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("rollupStats emits detail, subtotal, and grand-total tiers with grouping flags") {
    val df = Seq(
      ("web", "en", 10L), ("web", "en", 20L), ("web", "fr", 5L),
      ("books", "en", 7L)).toDF("source", "lang", "n_chars")
    val out = Analytics.rollupStats(df, "source", "lang", "n_docs", "n_chars", "sum_chars")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5))).toSet
    assert(out === Set(
      (Some("web"), Some("en"), 0, 0, 2L, 30.0),
      (Some("web"), Some("fr"), 0, 0, 1L, 5.0),
      (Some("books"), Some("en"), 0, 0, 1L, 7.0),
      (Some("web"), None, 0, 1, 3L, 35.0),
      (Some("books"), None, 0, 1, 1L, 7.0),
      (None, None, 1, 1, 4L, 42.0)))
  }

  test("rollupStats grouping flag separates a NULL detail key from a subtotal row") {
    val df = Seq((Some("web"), Some("en"), 1L), (Some("web"), None, 2L))
      .toDF("source", "lang", "n_chars")
    val out = Analytics.rollupStats(df, "source", "lang", "n_docs", "n_chars", "sum_chars")
      .where(col("source") === "web" && col("lang").isNull)
      .collect().map(r => (r.getInt(3), r.getLong(4))).toSet
    // g_lang=0: the genuine NULL-lang detail row; g_lang=1: the subtotal
    assert(out === Set((0, 1L), (1, 2L)))
  }

  test("rollupStats plans one shuffle off a single Expand, not three scans") {
    val df = Seq(("a", "x", 1L)).toDF("source", "lang", "n_chars")
    val plan = Analytics.rollupStats(df, "source", "lang", "n", "n_chars", "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("fkAudit counts orphans and null FKs separately") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Analytics.fkAudit(child, "fk", parent, "pk", "c->p").collect().head
    assert(r.getString(0) === "c->p")
    assert(r.getLong(1) === 4L) // n_child
    assert(r.getLong(2) === 1L) // n_null_fk
    assert(r.getLong(3) === 1L) // n_orphan_rows (the 9)
    assert(r.getLong(4) === 1L) // n_orphan_keys
  }

  test("fkAudit on a clean relation reports zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Analytics.fkAudit(child, "fk", parent, "pk", "ok").collect().head
    assert((r.getLong(3), r.getLong(4)) === ((0L, 0L)))
  }

  test("runningTotals: explicit ROWS frames give exact cumulative and 3-row sliding values") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 00:01:00"), 2.0),
      (1L, 3L, ts("2024-01-01 00:02:00"), 4.0),
      (1L, 4L, ts("2024-01-01 00:03:00"), 8.0),
      (2L, 5L, ts("2024-01-01 00:00:00"), 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.runningTotals(df, "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "event_id")
      .collect().map(r => (r.getLong(1), r.getDouble(4), r.getDouble(5)))
    assert(out(0) === ((1L, 1.0, 1.0)))
    assert(out(1) === ((2L, 3.0, 1.5)))
    assert(out(2) === ((3L, 7.0, 7.0 / 3)))  // frame = rows 1..3
    assert(out(3) === ((4L, 15.0, 14.0 / 3))) // frame slides off row 1
    assert(out(4) === ((5L, 10.0, 10.0)))     // partition isolation
  }

  test("gapFillDaily fills interior gaps with LOCF, leaves leading gaps null, flags gaps") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      // u1 purchases on day 1 and 3 of a 4-day corpus; u2 only day 2;
      // a non-purchase event stretches the global bounds to day 4
      (1L, ts("2024-03-01 10:00:00"), "purchase", 5.0),
      (1L, ts("2024-03-03 10:00:00"), "purchase", 7.0),
      (2L, ts("2024-03-02 10:00:00"), "purchase", 9.0),
      (2L, ts("2024-03-04 10:00:00"), "view", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Analytics.gapFillDaily(df, "user_id", "ts", "value", "event_type", "purchase")
      .collect().map(r => ((r.getLong(0), r.getDate(1).toString),
        (Option(r.get(2)), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap
    assert(out.size === 8) // 2 users x 4 days
    assert(out((1L, "2024-03-01")) === ((Some(5.0), Some(5.0), false)))
    assert(out((1L, "2024-03-02")) === ((None, Some(5.0), true)))  // LOCF
    assert(out((1L, "2024-03-03")) === ((Some(7.0), Some(7.0), false)))
    assert(out((1L, "2024-03-04")) === ((None, Some(7.0), true)))
    assert(out((2L, "2024-03-01")) === ((None, None, true)))       // leading gap
    assert(out((2L, "2024-03-02")) === ((Some(9.0), Some(9.0), false)))
  }

  test("keySkewReport buckets per-key cardinalities by decimal magnitude") {
    val rows = (1 to 5).map(i => Seq.fill(i)(s"k$i")).flatten ++ Seq.fill(120)("hot")
    val out = Analytics.keySkewReport(rows.toDF("k"), "k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(out === Set((1, 5L, 1L, 5L, 15L), (3, 1L, 120L, 120L, 120L)))
  }

  test("unpivotMetrics melts wide conditional aggregates and drops absent cells") {
    val df = Seq(
      (1L, "click", 2.0), (1L, "click", 3.0), (1L, "view", 1.0),
      (2L, "view", 4.0)) // user 2 never clicks -> no click row after melt
      .toDF("user_id", "event_type", "value")
    val out = Analytics.unpivotMetrics(df, "user_id", "event_type",
      Seq("click", "view"), "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set((1L, "click", 5.0), (1L, "view", 1.0), (2L, "view", 4.0)))
  }

  test("valueHistogram: integer bin math puts the max in the last bin, all-equal in bin 0") {
    val df = Seq(("a", 0.00), ("a", 0.50), ("a", 1.00), ("b", 7.77), ("b", 7.77))
      .toDF("t", "v")
    val out = Analytics.valueHistogram(df, "t", "v", bins = 4)
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: cents 0,50,100 over [0,100] -> widths (101)/4: bins 0,1,3
    assert(out(("a", 0)) === ((1L, 0L, 0L)))
    assert(out(("a", 1)) === ((1L, 50L, 50L)))
    assert(out(("a", 3)) === ((1L, 100L, 100L)))
    // b: degenerate range -> everything in bin 0
    assert(out(("b", 0)) === ((2L, 777L, 777L)))
    assert(out.size === 4)
  }

  test("winsorize clips at exact rank statistics and sums clamped values") {
    // 20 rows 1.00..20.00: rank ceil(.05*20)=1 -> cut_lo=1.00,
    // rank ceil(.95*20)=19 -> cut_hi=19.00; one row (20.00) clips high
    val df = (1 to 20).map(i => ("a", i.toDouble)).toDF("t", "v")
    val r = Analytics.winsorize(df, "t", "v", 50, 950).collect().head
    assert(r.getLong(1) === 20L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 19.0)
    assert(r.getLong(4) === 0L)  // nothing below the p05 value
    assert(r.getLong(5) === 1L)  // the 20.00 row
    assert(r.getDouble(6) === (1 to 19).sum + 19.0)
  }

  test("winsorize on an all-equal group degenerates to no clipping") {
    val df = Seq.fill(7)(("x", 3.33)).toDF("t", "v")
    val r = Analytics.winsorize(df, "t", "v", 50, 950).collect().head
    assert((r.getDouble(2), r.getDouble(3)) === ((3.33, 3.33)))
    assert((r.getLong(4), r.getLong(5)) === ((0L, 0L)))
    assert(r.getDouble(6) === 23.31) // exact 2331 cents / 100, not 7*3.33 float drift
  }

  test("cdcApply: newest tombstone deletes the key, stale tombstone does not") {
    val log = Seq(
      // key 1: U then D newest -> gone
      (1L, 10L, 100L, 1.0, "U"), (1L, 11L, 200L, 2.0, "D"),
      // key 2: D then U newest -> survives with the U payload
      (2L, 20L, 100L, 3.0, "D"), (2L, 21L, 200L, 4.0, "U"),
      // key 3: same seq, tie broken by higher id
      (3L, 30L, 100L, 5.0, "U"), (3L, 31L, 100L, 6.0, "U"))
      .toDF("k", "id", "seq", "payload", "op")
    val out = Analytics.cdcApply(log, "k", "seq", "id", "op", "D")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    assert(!out.contains(1L))
    assert(out(2L) === ((21L, 4.0, 2L)))
    assert(out(3L) === ((31L, 6.0, 2L)))
  }

  test("rankSuite: tie-aware rank family plus deterministic ntile") {
    val df = Seq(
      ("a", 1L, 3.0), ("a", 2L, 2.0), ("a", 3L, 2.0), ("a", 4L, 1.0))
      .toDF("g", "id", "v")
    val out = Analytics.rankSuite(df, "g", "id", "v", tiles = 2)
      .collect().map(r => r.getLong(1) ->
        (r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6), r.getInt(7))).toMap
    assert(out(1L) === ((1, 1, 0.0, 0.25, 1)))
    assert(out(2L) === ((2, 2, 1.0 / 3, 0.75, 1)))     // tied pair
    assert(out(3L) === ((2, 2, 1.0 / 3, 0.75, 2)))     // same rank, later tile
    assert(out(4L) === ((4, 3, 1.0, 1.0, 2)))          // rank skips, dense doesn't
  }

  test("ohlcBars: open/close picked by the unique (ts, id) ordering, one aggregate") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      // same-timestamp open: id 2 loses to id 1
      ("a", 1L, ts("2024-01-01 10:00:00"), 5.0),
      ("a", 2L, ts("2024-01-01 10:00:00"), 9.0),
      ("a", 3L, ts("2024-01-01 10:30:00"), 1.0),
      ("a", 4L, ts("2024-01-01 10:59:00"), 7.0),
      ("a", 5L, ts("2024-01-01 11:00:00"), 2.0)) // next bar
      .toDF("t", "event_id", "ts", "value")
    val q = Analytics.ohlcBars(df, "t", "ts", "event_id", "value", "hour")
    val out = q.collect().map(r => r.getLong(1) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7))).toMap
    val h10 = java.time.LocalDateTime.parse("2024-01-01T10:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(out(h10) === ((5.0, 9.0, 1.0, 7.0, 4L, 22.0)))
    assert(out(h10 + 3600L * 1000000L) === ((2.0, 2.0, 2.0, 2.0, 1L, 2.0)))
    // one hash aggregate, no window sort in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"OHLC must not plan a window:\n$plan")
  }

  test("funnelWindowed: out-of-window conversions don't count, earliest in-window wins") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      // u1: full chain inside the windows
      (1L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 05:00:00"), "click", 0.0),
      (1L, ts("2024-01-01 06:00:00"), "click", 0.0),  // later click ignored
      (1L, ts("2024-01-01 20:00:00"), "purchase", 0.0),
      // u2: click arrives 30h after the view -> funnel stops at step 1
      (2L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (2L, ts("2024-01-02 06:00:00"), "click", 0.0),
      // u3: click BEFORE the first view -> not a conversion
      (3L, ts("2024-01-01 05:00:00"), "click", 0.0),
      (3L, ts("2024-01-01 06:00:00"), "view", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = graft.operators.Observability.funnelWindowed(ev,
      Seq("view", "click", "purchase"), windowUs = 24L * 3600 * 1000000)
      .collect().map(r => r.getInt(0) -> (r.getLong(2), Option(r.get(3)))).toMap
    assert(out(1) === ((3L, None)))
    assert(out(2) === ((1L, Some(5.0 * 3600 * 1000000)))) // u1's first click, 5h
    assert(out(3) === ((1L, Some(15.0 * 3600 * 1000000)))) // 20h - 5h
  }

  test("rfmSegments: rank-cut buckets share ties, 5 means best") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 5 users, distinct frequencies 1..5, same day, distinct spend
    val ev = (1L to 5L).flatMap(u => (1 to u.toInt).map(i =>
      (u, ts(f"2024-01-0${u}%d 10:00:00"), "purchase", u.toDouble)))
      .toDF("user_id", "ts", "event_type", "value")
    val out = graft.operators.Analytics.rfmSegments(ev,
      "user_id", "event_type", "purchase", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))).toMap
    // user 5 purchased most recently (ref day), most often, most value
    assert(out(5L) === ((5, 5, 5, "555")))
    assert(out(1L) === ((1, 1, 1, "111")))
    assert(out(3L)._2 === 3)
  }

  test("seasonality dow matches DuckDB dow (Sunday=0), bounded output") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 2024-01-07 was a Sunday
    val ev = Seq((1L, ts("2024-01-07 13:00:00"), "view", 1.0),
      (2L, ts("2024-01-08 02:00:00"), "view", 2.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = graft.operators.Analytics.seasonality(ev, "ts", "user_id", "value")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map((0, 13) -> 1L, (1, 2) -> 1L))
  }

  test("periodMovers: shares and change in exact bp, groups absent in one period survive") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      ("a", ts("2024-01-08 00:00:00"), 10.0),
      ("a", ts("2024-01-15 00:00:00"), 15.0),
      ("b", ts("2024-01-09 00:00:00"), 30.0),
      // b absent in period 2; c appears only in period 2
      ("c", ts("2024-01-16 00:00:00"), 5.0),
      ("a", ts("2024-01-25 00:00:00"), 999.0)) // outside both periods
      .toDF("g", "ts", "v")
    val out = graft.operators.Analytics.periodMovers(ev, "g", "ts", "v",
      "2024-01-08", "2024-01-15", "2024-01-22")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4), Option(r.get(5)))).toMap
    assert(out("a") === ((10.0, 15.0, 2500L, 7500L, Some(5000L)))) // +50%
    assert(out("b") === ((30.0, 0.0, 7500L, 0L, Some(-10000L))))   // vanished
    assert(out("c") === ((0.0, 5.0, 0L, 2500L, None)))             // new entrant
  }

  test("topRevenue takes top-k deterministically and broadcasts the dim side") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val cust = Seq((1L, "BUILDING"), (2L, "AUTO")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, ts("1998-01-01 00:00:00"), "1-URGENT"),
      (11L, 1L, ts("1998-02-01 00:00:00"), "2-HIGH"),
      (12L, 2L, ts("1998-03-01 00:00:00"), "3-MEDIUM"), // wrong segment
      (13L, 1L, ts("1998-07-01 00:00:00"), "1-URGENT")) // after cutoff
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (10L, ts("1998-07-01 00:00:00"), 100.0, 0.0),
      (11L, ts("1998-07-01 00:00:00"), 100.0, 0.0), // revenue tie with 10
      (12L, ts("1998-07-01 00:00:00"), 500.0, 0.0),
      (13L, ts("1998-07-01 00:00:00"), 500.0, 0.0),
      (10L, ts("1998-01-02 00:00:00"), 999.0, 0.0)) // shipped before cutoff
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    val q = Analytics.topRevenue(cust, orders, li, "BUILDING", "1998-06-01", k = 1)
    // tie at revenue 100.0 between orders 10 and 11 -> lowest orderkey wins
    val top = q.collect()
    assert(top.length === 1)
    assert(top.head.getLong(0) === 10L)
    assert(top.head.getDouble(1) === 100.0)
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("audienceOverlap: pair counts, audiences, and Jaccard bp") {
    import spark.implicits._
    // users 1,2 did A+B; user 3 only A; user 4 only C; repeats collapse
    val ev = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (4L, "C"))
      .toDF("user_id", "event_type")
    val out = Analytics.audienceOverlap(ev, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // A∩B = {1,2}, |A|=3, |B|=2, J = 2/3 -> 6667 bp
    assert(out(("A", "B")) === ((2L, 3L, 2L, 6667L)))
    assert(out.size === 1) // C shares no user with A or B -> no row
  }

  test("dailyTrend: exact integer OLS slope, NULL for single-day groups") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // A: counts 1,2,3 on consecutive days -> slope exactly +1/day
    val ev = (Seq(ts("2024-01-01 10:00:00")) ++
      Seq.fill(2)(ts("2024-01-02 10:00:00")) ++
      Seq.fill(3)(ts("2024-01-03 10:00:00"))).map(("A", _)) ++
      Seq(("B", ts("2024-01-02 00:00:00"))) // one day only
    val df = ev.toDF("event_type", "ts")
    val out = Analytics.dailyTrend(df, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(out("A") === ((3L, 6L, 6L, Some(1000000L))))
    assert(out("B") === ((1L, 0L, 0L, None)))
  }

  test("srmCheck: balanced split passes, a starved arm flags") {
    import spark.implicits._
    // find user ids landing in each arm under the registry fold so the
    // test plants exact imbalance regardless of the fold's mapping
    val probe = (1L to 4000L).map(u => u -> {
      var acc = 0L
      s"ab:$u".foreach(c => acc = (acc * 257 + c.toLong) % 1000000007L)
      (acc % 2).toInt
    })
    val arm0 = probe.filter(_._2 == 0).map(_._1)
    val arm1 = probe.filter(_._2 == 1).map(_._1)
    // balanced: 400 from each arm -> chi2 = 0
    val ok = (arm0.take(400) ++ arm1.take(400)).map(u => Tuple1(u))
      .toDF("user_id")
    val r1 = Analytics.srmCheck(ok, "user_id").collect().head
    assert(r1.getAs[Long]("chi2_micro") == 0L)
    assert(!r1.getAs[Boolean]("srm_flag"))
    // starved arm: 500 vs 380 -> chi2 = 120^2/880 = 16.36 >> 3.84
    val bad = (arm0.take(500) ++ arm1.take(380)).map(u => Tuple1(u))
      .toDF("user_id")
    val r2 = Analytics.srmCheck(bad, "user_id").collect().head
    assert(r2.getAs[Long]("chi2_micro") == 120L * 120L * 1000000L / 880L)
    assert(r2.getAs[Boolean]("srm_flag"))
  }

  test("srmCheckNArm: planted 4-arm imbalance matches the BigInt chi2, empty arm contributes") {
    import spark.implicits._
    val probe = (1L to 8000L).map(u => u -> {
      var acc = 0L
      s"ab:$u".foreach(c => acc = (acc * 257 + c.toLong) % 1000000007L)
      (acc % 4).toInt
    })
    def arm(i: Int) = probe.filter(_._2 == i).map(_._1)
    // planted counts 300/260/200/0 (arm 3 starved to EMPTY): the spine
    // must still emit its row and its (0*4 - n)^2 term
    val users = (arm(0).take(300) ++ arm(1).take(260) ++ arm(2).take(200))
      .map(u => Tuple1(u)).toDF("user_id")
    val rows = Analytics.srmCheckNArm(users, "user_id", arms = 4,
      critMicro = 7814728L).collect()
    assert(rows.length == 4)
    val counts = rows.map(r => r.getAs[Long]("variant") -> r.getAs[Long]("n_arm")).toMap
    assert(counts == Map(0L -> 300L, 1L -> 260L, 2L -> 200L, 3L -> 0L))
    val n = 760L
    val ss = counts.values.map(c => BigInt(c * 4 - n) * BigInt(c * 4 - n)).sum
    val expected = (ss * 1000000 / (BigInt(4) * n)).toLong
    assert(rows.forall(_.getAs[Long]("chi2_micro") == expected))
    assert(expected > 7814728L)
    assert(rows.forall(_.getAs[Boolean]("srm_flag")))
    // balanced 200/200/200/200 -> chi2 = 0, no flag
    val ok = (0 to 3).flatMap(i => arm(i).take(200)).map(u => Tuple1(u))
      .toDF("user_id")
    val r2 = Analytics.srmCheckNArm(ok, "user_id", 4, 7814728L).collect()
    assert(r2.forall(_.getAs[Long]("chi2_micro") == 0L))
    assert(r2.forall(!_.getAs[Boolean]("srm_flag")))
  }

  test("srmCheckNArm at arms=2 computes exactly srmCheck's statistic") {
    import spark.implicits._
    // algebra: sum over 2 arms of (n_i*2 - n)^2 = 2*(n0-n1)^2, so
    // (ss*10^6) DIV (2n) == ((n0-n1)^2*10^6) DIV n exactly — the engine,
    // not the algebra on paper, certifies it here
    val users = (1L to 3000L).map(Tuple1(_)).toDF("user_id")
    val two = Analytics.srmCheckNArm(users, "user_id", 2, 3841459L)
      .collect().head.getAs[Long]("chi2_micro")
    val ref = Analytics.srmCheck(users, "user_id")
      .collect().head.getAs[Long]("chi2_micro")
    assert(two == ref)
  }

  test("changePoints finds a planted level shift at the exact day") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // type A: 2/day for days 01..05, then 10/day for 06..10 — the CUSUM
    // peak must land on Jan 5 (the last day of the low regime)
    val ev = (1 to 5).flatMap(d => Seq.fill(2)(("A", ts(f"2024-01-0$d%d 10:00:00")))) ++
      (6 to 10).flatMap(d => Seq.fill(10)(("A", ts(f"2024-01-${d}%02d 10:00:00")))) ++
      Seq(("B", ts("2024-01-01 00:00:00"))) // single day: no split
    val out = Analytics.changePoints(ev.toDF("event_type", "ts"),
        "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getDate(2)).map(_.toString),
          Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(out("A")._1 == 10L)
    assert(out("A")._2.contains("2024-01-05"))
    assert(out("A")._4.contains(2.0) && out("A")._5.contains(10.0))
    assert(out("B") === ((1L, None, None, None, None)))
  }

  test("cupedMetrics: perfectly-correlated covariate flattens arm means") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // y = 2x per user: theta must be exactly 2 (theta_u = 2_000_000) and
    // every user's adjusted outcome collapses to 2 * xbar — both arms'
    // adjusted means become EQUAL even though raw means differ
    val pre = "2024-01-05 00:00:00"; val post = "2024-01-20 00:00:00"
    val ev = (1 to 40).flatMap { u =>
      Seq((u.toLong, ts(pre), u * 1.00), (u.toLong, ts(post), u * 2.00))
    }.toDF("user_id", "ts", "value")
    val out = Analytics.cupedMetrics(ev, "user_id", "ts", "value",
        cutDay = "2024-01-16", arms = 2)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getAs[Long]("theta_u"))).toMap
    assert(out.size == 2)
    assert(out.values.forall(_._4 == 2000000L), s"theta $out")
    val adj = out.values.map(_._3).toSeq
    assert(math.abs(adj(0) - adj(1)) < 1e-6,
      s"adjusted means must coincide: $adj")
    // and the raw post-period means genuinely differed before adjustment
    val raw = out.values.map(_._2).toSeq
    assert(math.abs(raw(0) - raw(1)) > 1.0)
  }

  test("cupedMetrics: zero-variance covariate falls back to the raw mean") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = (1 to 10).flatMap { u =>
      Seq((u.toLong, ts("2024-01-05 00:00:00"), 1.00), // constant X
        (u.toLong, ts("2024-01-20 00:00:00"), u * 1.00))
    }.toDF("user_id", "ts", "value")
    val out = Analytics.cupedMetrics(ev, "user_id", "ts", "value",
      cutDay = "2024-01-16", arms = 2).collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("theta_u")))
      assert(r.getDouble(r.fieldIndex("adj_mean_cents")) ==
        r.getDouble(r.fieldIndex("y_mean_cents")))
    }
  }

  test("decayScores: power-of-two weights over the last n, exact cents") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // user 1: three events, latest value 2.00, then 1.00, then 0.50
    //   n=4 -> weights 8, 4, 2 -> 200*8 + 100*4 + 50*2 = 2100
    // user 2: five events of 1.00 with n=4 -> only newest 4 count:
    //   100*(8+4+2+1) = 1500
    val ev = Seq(
      (1L, ts("2024-01-03 00:00:00"), 3L, 2.00),
      (1L, ts("2024-01-02 00:00:00"), 2L, 1.00),
      (1L, ts("2024-01-01 00:00:00"), 1L, 0.50)) ++
      (1 to 5).map(i => (2L, ts(s"2024-01-0$i 00:00:00"), 10L + i, 1.00))
    val df = ev.toDF("user_id", "ts", "event_id", "value")
    val out = Analytics.decayScores(df, "user_id", "ts", "event_id", "value",
        n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((3L, 2100L)))
    assert(out(2L) === ((4L, 1500L)))
  }

  test("decayScores breaks same-timestamp ties by id, newest id first") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq((1L, t, 1L, 1.00), (1L, t, 2L, 3.00))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Analytics.decayScores(df, "user_id", "ts", "event_id", "value",
      n = 2).collect().head
    // id 2 is newer: 300*2 + 100*1 = 700
    assert(out.getLong(2) == 700L)
  }

  test("zoneMap: interval verdicts match per-tile bounds") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // tile 0 (ids 0,1): day 1; tile 1 (ids 2,3): day 5 (inside probe)
    val df = Seq(
      (0L, ts("2024-01-01 12:00:00"), 5L),
      (1L, ts("2024-01-01 13:00:00"), 150L),
      (2L, ts("2024-01-05 00:00:00"), 120L),
      (3L, ts("2024-01-05 12:00:00"), 130L))
      .toDF("event_id", "ts", "user_id")
    val lo = 1704412800000000L // 2024-01-05 UTC
    val hi = 1704499200000000L // 2024-01-06 UTC
    val out = Analytics.zoneMap(df, "event_id", "ts", "user_id",
        tileSize = 2L, tsLoUs = lo, tsHiUs = hi, userLt = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(6), r.getBoolean(7))).toMap
    assert(out(0L) === ((2L, true, false)))  // day 1: ts-prunable; user 5 < 100
    assert(out(1L) === ((2L, false, true)))  // inside probe; users all >= 100
  }

  test("robustStats: a planted spike cannot move the median/MAD gate; " +
      "MAD = 0 flags any deviation") {
    import org.apache.spark.sql.functions.col
    // group a: 1,2,3 x3 each + one 1e6 spike -> median 2.00, MAD 1.00,
    // exactly the spike beyond 3 MADs (a mean/std gate would have been
    // dragged past every honest row by the spike)
    val a = (Seq.fill(3)(1.00) ++ Seq.fill(3)(2.00) ++ Seq.fill(3)(3.00) ++
      Seq(1000000.00)).map(("a", _))
    // group b: 5.00 x4 + 7.00 -> MAD 0, the single deviating row flagged
    val b = (Seq.fill(4)(5.00) ++ Seq(7.00)).map(("b", _))
    val df = (a ++ b).toDF("event_type", "value")
    val out = Analytics.robustStats(df, "event_type", "value", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("median"),
          r.getAs[Double]("mad"), r.getAs[Long]("n_outliers"),
          r.getAs[Long]("outlier_bp"))).toMap
    assert(out("a") == ((10L, 2.00, 1.00, 1L, 1000L)))
    assert(out("b") == ((5L, 5.00, 0.00, 1L, 2000L)))
  }

  test("bootstrapCi: constant values collapse to se = 0 exactly; spread " +
      "values give a CI that brackets the point estimate") {
    // constant group: every replicate mean is the constant in exact
    // integer micro-cents, so the variance numerator is exactly zero —
    // the exact-arithmetic discipline, not an epsilon
    val const = (1 to 200).map(i => ("c", i.toLong, 5.00))
    val spread = (1 to 200).map(i => ("s", 1000L + i, (i % 10) + 1.0))
    val df = (const ++ spread).toDF("event_type", "event_id", "value")
    val out = Analytics.bootstrapCi(df, "event_type", "event_id", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    val c = out("c")
    assert(c.getAs[Long]("n_events") == 200L)
    assert(c.getAs[Long]("b_used") == 32L)
    assert(c.getAs[Long]("point_micro") == 500000000L) // 5.00 in micro-cents
    assert(c.getAs[Double]("se_micro") == 0.0)
    assert(c.getAs[Double]("lo_micro") == 5.0e8 &&
      c.getAs[Double]("hi_micro") == 5.0e8)
    val sp = out("s")
    assert(sp.getAs[Double]("se_micro") > 0.0)
    assert(sp.getAs[Double]("lo_micro") < sp.getAs[Long]("point_micro").toDouble)
    assert(sp.getAs[Double]("hi_micro") > sp.getAs[Long]("point_micro").toDouble)
    // the true mean of 1..10 is 5.5; a 2-se bootstrap CI on n=200
    // comfortably contains it
    assert(sp.getAs[Double]("lo_micro") < 5.5e8 &&
      sp.getAs[Double]("hi_micro") > 5.5e8)
  }

  test("welchTTest: shifted means flag significant, identical arms do " +
      "not, degenerate inputs yield NULL") {
    // hash-split arms; plant a shift by making the metric depend on the
    // arm through the SAME hash the operator uses
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val base = (1 to 400).map(i => (i.toLong, 0.0)).toDF("user_id", "v0")
    val armCol = pmod(rollingHash(concat(lit("ab:"),
      col("user_id").cast("string"))), lit(2))
    // shifted: arm 1 pays +5.00 on top of a small deterministic wiggle
    val shifted = base.select(col("user_id"),
      (lit(10.0) + (col("user_id") % 7).cast("double") / 10.0 +
        armCol.cast("double") * 5.0).as("value"))
    val s = Analytics.welchTTest(shifted, "user_id", "value", critT = 1.96)
      .collect().head
    assert(math.abs(s.getAs[Double]("mean0_r") -
      s.getAs[Double]("mean1_r")) > 4.5)
    assert(math.abs(s.getAs[Double]("t_r")) > 10.0)
    assert(s.getAs[Boolean]("significant"))
    assert(s.getAs[Double]("dof_r") > 10.0)
    // identical arms: same wiggle, no shift
    val same = base.select(col("user_id"),
      (lit(10.0) + (col("user_id") % 7).cast("double") / 10.0).as("value"))
    val n = Analytics.welchTTest(same, "user_id", "value", critT = 1.96)
      .collect().head
    assert(!n.getAs[Boolean]("significant"))
    assert(math.abs(n.getAs[Double]("t_r")) < 1.96)
    // constant metric: zero variance on both sides -> NULL t
    val const = base.select(col("user_id"), lit(3.0).as("value"))
    val c = Analytics.welchTTest(const, "user_id", "value", critT = 1.96)
      .collect().head
    assert(c.isNullAt(c.fieldIndex("t_r")))
  }

  test("kruskalWallis: hand-computed H on separated arms, identical " +
      "arms stay insignificant, one-bin data yields NULL") {
    // three fully separated arms, no ties: rank sums 55/155/255 ->
    // H = 12/(30*31) * (55^2+155^2+255^2)/10 - 3*31 = 25.8065 exactly
    val sep = ((1 to 10).map(v => (0L, v.toLong)) ++
      (101 to 110).map(v => (1L, v.toLong)) ++
      (201 to 210).map(v => (2L, v.toLong))).toDF("arm", "score")
    val s = Analytics.kruskalWallis(sep, critH = 5.9915).collect()
    assert(s.length == 3)
    assert(s.forall(_.getAs[Double]("h_r") == 25.8065))
    assert(s.forall(_.getAs[Boolean]("significant")))
    assert(s.forall(_.getAs[Long]("df") == 2L))
    // identical arms: every arm sees the same distribution
    val same = (0 until 3).flatMap(a =>
      (1 to 20).map(v => (a.toLong, v.toLong))).toDF("arm", "score")
    val eq = Analytics.kruskalWallis(same, critH = 5.9915).collect()
    assert(eq.forall(r => !r.getAs[Boolean]("significant")))
    assert(math.abs(eq.head.getAs[Double]("h_r")) < 1.0)
    // one histogram bin: zero variance -> NULL H
    val flat = Seq((0L, 5L), (1L, 5L), (2L, 5L)).toDF("arm", "score")
    val f = Analytics.kruskalWallis(flat, critH = 5.9915).collect().head
    assert(f.isNullAt(f.fieldIndex("h_r")))
  }

  test("psiDrift: identical windows score exactly 0, a full shift " +
      "breaches the retrain threshold with empty buckets priced in") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ref = (1 to 100).map(i => (ts("2024-01-05 00:00:00"), i.toDouble))
    // identical current window: p = q in every bucket -> every term is
    // exactly 0 (no smoothing asymmetry when counts match)
    val same = ref ++ (1 to 100).map(i =>
      (ts("2024-01-20 00:00:00"), i.toDouble))
    val s = Analytics.psiDrift(same.toDF("ts", "value"), "value", "ts",
      refEndExcl = "2024-01-16", nBuckets = 10).collect()
    assert(s.length == 10)
    assert(s.forall(_.getAs[Long]("term_micro") == 0L))
    assert(s.forall(_.getAs[Long]("psi_micro") == 0L))
    // full shift: every current value beyond the reference's last cut —
    // nine emptied buckets each contribute a positive smoothed term
    val shifted = ref ++ (1 to 100).map(_ =>
      (ts("2024-01-20 00:00:00"), 1000.0))
    val d = Analytics.psiDrift(shifted.toDF("ts", "value"), "value", "ts",
      refEndExcl = "2024-01-16", nBuckets = 10).collect()
    assert(d.forall(_.getAs[Long]("psi_micro") > 250000L),
      "a wholesale shift must breach the 0.25 retrain threshold")
    assert(d.filter(_.getAs[Long]("bucket") < 9L)
      .forall(_.getAs[Long]("term_micro") > 0L),
      "emptied buckets must carry positive terms")
  }

  test("wilsonRates: bounds bracket the rate, all-converters hits " +
      "exactly 1.0, no-converters hits exactly 0.0") {
    val mixed = (1 to 400).map(i =>
      (i.toLong, if (i % 5 == 0) "purchase" else "view"))
      .toDF("user_id", "event_type")
    val out = Analytics.wilsonRates(mixed, "user_id",
      col("event_type") === "purchase").collect()
    assert(out.length == 2)
    out.foreach { r =>
      val rate = r.getAs[Long]("rate_bp").toDouble / 10000.0
      assert(r.getAs[Double]("lo_r") < rate && rate < r.getAs[Double]("hi_r"))
      assert(r.getAs[Double]("lo_r") >= 0.0 && r.getAs[Double]("hi_r") <= 1.0)
    }
    // k = n: the Wilson upper bound is exactly 1 (Wald would exceed it)
    val all = (1 to 50).map(i => (i.toLong, "purchase"))
      .toDF("user_id", "event_type")
    Analytics.wilsonRates(all, "user_id", col("event_type") === "purchase")
      .collect().foreach { r =>
        assert(r.getAs[Double]("hi_r") == 1.0)
        assert(r.getAs[Double]("lo_r") < 1.0)
      }
    // k = 0: the lower bound is exactly 0
    val none = (1 to 50).map(i => (i.toLong, "view"))
      .toDF("user_id", "event_type")
    Analytics.wilsonRates(none, "user_id", col("event_type") === "purchase")
      .collect().foreach { r =>
        assert(r.getAs[Double]("lo_r") == 0.0)
        assert(r.getAs[Double]("hi_r") > 0.0)
      }
  }

  test("spearman: monotone = 1, anti-monotone = -1, hand-computed tie " +
      "correction, constant variable yields NULL") {
    val mono = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 16L), (5L, 25L))
      .toDF("x", "y")
    assert(Analytics.spearman(mono).collect().head
      .getAs[Double]("rho_r") == 1.0)
    val anti = (1 to 5).map(i => (i.toLong, -i.toLong)).toDF("x", "y")
    assert(Analytics.spearman(anti).collect().head
      .getAs[Double]("rho_r") == -1.0)
    // ties on x: 2x-ranks x = (3,3,6), y = (2,4,6) ->
    // rho = 18/sqrt(18*24) = 0.8660 (the tie-corrected value)
    val tied = Seq((1L, 3L), (1L, 4L), (2L, 5L)).toDF("x", "y")
    assert(Analytics.spearman(tied).collect().head
      .getAs[Double]("rho_r") == 0.8660)
    val const = Seq((7L, 1L), (7L, 2L)).toDF("x", "y")
    val c = Analytics.spearman(const).collect().head
    assert(c.isNullAt(c.fieldIndex("rho_r")))
  }

  test("mannWhitney: separated arms flag significant with the exact U, " +
      "a null split does not, one-bin data yields NULL z") {
    // fully separated: every positive (100..149) above every negative
    // (1..50) -> U = n+*n-, no ties so tie_t = 0
    val sep = ((1 to 50).map(v => (v.toLong, false)) ++
      (100 to 149).map(v => (v.toLong, true))).toDF("score", "label")
    val s = Analytics.mannWhitney(sep).collect().head
    assert(s.getAs[Long]("u2") == 2L * 50L * 50L)
    assert(s.getAs[Long]("tie_t") == 0L)
    assert(s.getAs[Double]("z_r") > 8.0)
    assert(s.getAs[Boolean]("significant"))
    // null: identical interleaved distributions by parity
    val nul = (1 to 100).map(v => (v.toLong, v % 2 == 0))
      .toDF("score", "label")
    val n = Analytics.mannWhitney(nul).collect().head
    assert(math.abs(n.getAs[Double]("z_r")) < 1.0)
    assert(!n.getAs[Boolean]("significant"))
    // one histogram bin: zero variance, NULL z rather than a div by zero
    val flat = Seq((5L, true), (5L, false), (5L, true)).toDF("score", "label")
    val f = Analytics.mannWhitney(flat).collect().head
    assert(f.isNullAt(f.fieldIndex("z_r")))
  }

  test("independenceTest: uniform table scores 0, perfect association " +
      "scores n (zero cells participate), verdict uses the critical value") {
    val uniform = (Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
      Seq.fill(10)(("B", "X")) ++ Seq.fill(10)(("B", "Y")))
      .toDF("r0", "c0")
    val u = Analytics.independenceTest(uniform, "r0", "c0",
      critMicro = 3841459L).collect().head
    assert(u.getAs[Long]("n") == 40L && u.getAs[Long]("dof") == 1L)
    assert(u.getAs[Long]("chi2_micro") == 0L)
    assert(u.getAs[Boolean]("independent"))
    // diagonal-only: chi2 = n exactly (phi^2 = 1) — and that value is
    // only reachable when the two ZERO cells contribute their R*C/n
    // expected mass (10 of the 20 comes from them)
    val assoc = (Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y")))
      .toDF("r0", "c0")
    val a = Analytics.independenceTest(assoc, "r0", "c0",
      critMicro = 3841459L).collect().head
    assert(a.getAs[Long]("chi2_micro") == 20000000L)
    assert(!a.getAs[Boolean]("independent"))
  }

  test("ewmaDaily: integer halving recurrence, truncation on negative " +
      "masses, deviation judged against yesterday's baseline") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      ("a", ts("2001-01-01 05:00:00"), 4.00),
      ("a", ts("2001-01-02 05:00:00"), 2.00),
      ("a", ts("2001-01-03 05:00:00"), 2.00),
      ("a", ts("2001-01-04 05:00:00"), -6.01),
      ("b", ts("2001-01-01 09:00:00"), 1.00))
      .toDF("event_type", "ts", "value")
    val out = Analytics.ewmaDaily(df, "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.toString.toLong))).toMap
    // s1=400; s2=(400+200)/2=300; s3=(300+200)/2=250;
    // s4=(250-601) DIV 2 = -175 (TRUNCATION toward zero, not floor -176)
    assert(out(("a", "2001-01-01")) === ((400L, 400L, None)))
    assert(out(("a", "2001-01-02")) === ((200L, 300L, Some(-5000L))))
    assert(out(("a", "2001-01-03")) === ((200L, 250L, Some(-3333L))))
    assert(out(("a", "2001-01-04")) === ((-601L, -175L, Some(-34040L))))
    // single-day key: baseline is itself, no deviation to judge
    assert(out(("b", "2001-01-01")) === ((100L, 100L, None)))
  }

  test("basketRules: hand-computed support/confidence/lift, threshold " +
      "prunes, both directions emitted") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (4L, "y"),
      (4L, "z"), (4L, "z")) // duplicate (4, z) must collapse
      .toDF("basket", "item")
    val out = Analytics.basketRules(baskets, minSupportBp = 3000)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // only the {x,y} pair clears 30% support (2 of 4 baskets = 5000 bp);
    // (y,z) sits at 2500 bp and is pruned
    assert(out.keySet === Set(("x", "y"), ("y", "x")))
    // conf(x->y) = 2/3, lift = 2*4/(3*3)
    assert(out(("x", "y")) === ((2L, 5000L, 6666L, 888888L)))
    assert(out(("y", "x")) === ((2L, 5000L, 6666L, 888888L)))
  }

  test("concentrationProfile: equal mass = Gini 0, one whale = hand " +
      "value, zero-mass group yields NULLs") {
    val df = Seq(
      ("eq", 1L, 10L), ("eq", 2L, 10L), ("eq", 3L, 10L), ("eq", 4L, 10L),
      ("wh", 1L, 0L), ("wh", 2L, 0L), ("wh", 3L, 0L), ("wh", 4L, 10L),
      ("z", 1L, 0L), ("z", 2L, 0L))
      .toDF("g", "entity", "cents")
    val out = Analytics.concentrationProfile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.toString.toLong),
        Option(r.get(4)).map(_.toString.toLong))).toMap
    // equal: G = 0; top decile = ceil(4/10) = 1 entity = 25% of mass
    assert(out("eq") === ((4L, 40L, Some(0L), Some(2500L))))
    // whale: G = (2*40 - 5*10)/(4*10) = 0.75; the whale holds all mass
    assert(out("wh") === ((4L, 10L, Some(750000L), Some(10000L))))
    // zero mass: no distribution to measure
    assert(out("z") === ((2L, 0L, None, None)))
  }

  test("rocAuc: perfect ranking = 1e6, inverted = 0, ties at the " +
      "hand-computed rank-sum value") {
    // perfect: every positive above every negative
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("score", "label")
    val p = Analytics.rocAuc(perfect).collect().head
    assert(p.getAs[Long]("auc_micro") == 1000000L)
    assert(p.getAs[Long]("gini_micro") == 1000000L)
    // inverted: every negative above every positive
    val inverted = Seq((1L, true), (2L, true), (9L, false), (10L, false))
      .toDF("score", "label")
    assert(Analytics.rocAuc(inverted).collect().head
      .getAs[Long]("auc_micro") == 0L)
    // ties: pos {3, 2}, neg {3, 1} — pairs: (3,3)=0.5, (3,1)=1,
    // (2,3)=0, (2,1)=1 -> U = 2.5 of 4 -> auc = 0.625
    val tied = Seq((3L, true), (2L, true), (3L, false), (1L, false))
      .toDF("score", "label")
    val t = Analytics.rocAuc(tied).collect().head
    assert(t.getAs[Long]("u2") == 5L)
    assert(t.getAs[Long]("auc_micro") == 625000L)
    assert(t.getAs[Long]("gini_micro") == 250000L)
    // one-class input: no ranking to measure -> NULL auc, counts kept
    val oneClass = Seq((3L, true), (1L, true)).toDF("score", "label")
    val o = Analytics.rocAuc(oneClass).collect().head
    assert(o.getAs[Long]("n_pos") == 2L && o.getAs[Long]("n_neg") == 0L)
    assert(o.isNullAt(o.fieldIndex("auc_micro")))
  }

  test("prCurve: thresholds are exact decile rank statistics and the " +
      "confusion counts partition the eval set at every cut") {
    // 10 items, scores 1..10, positives = scores 6..10 (perfect split)
    val df = (1 to 10).map(i => (i.toLong, i > 5)).toDF("score", "label")
    val out = Analytics.prCurve(df, nCuts = 10).collect()
    assert(out.length == 9)
    out.foreach { r =>
      // tp+fp+fn+tn = N at every threshold
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn") == 10L)
      // recall denominator is the fixed positive mass
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == 5L)
    }
    val byK = out.map(r => r.getAs[Long]("k") -> r).toMap
    // k=5: thr = score at rank ceil(5*10/10)=5 -> keep = score>=5:
    // tp=5 fp=1 fn=0 tn=4 -> precision 5/6, recall 1
    assert(byK(5L).getAs[Long]("thr_score") == 5L)
    assert(byK(5L).getAs[Long]("precision_bp") == 8333L)
    assert(byK(5L).getAs[Long]("recall_bp") == 10000L)
    // k=6: thr=6 -> keep = positives exactly: P=R=F1=1
    assert(byK(6L).getAs[Long]("precision_bp") == 10000L)
    assert(byK(6L).getAs[Long]("recall_bp") == 10000L)
    assert(byK(6L).getAs[Long]("f1_bp") == 10000L)
    // k=1: thr=1 -> keep everything: recall 1, precision = base rate
    assert(byK(1L).getAs[Long]("precision_bp") == 5000L)
    assert(byK(1L).getAs[Long]("recall_bp") == 10000L)
  }

  test("kaplanMeier: the product-limit recurrence, at-risk bookkeeping, " +
      "conservation, and censoring honesty") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 40 users enter on day 1 (a signup); half purchase on a staggered
    // later day, half never do (censored at the horizon, day 9)
    val rows = (1 to 40).flatMap { u =>
      val first = (u.toLong, ts(1), "signup")
      if (u % 2 == 0) Seq(first, (u.toLong, ts(1 + (u % 8)), "purchase"))
      else Seq(first, (u.toLong, ts(9), "view"))
    }
    val out = Analytics.kaplanMeier(
      rows.toDF("user_id", "ts", "event_type"), "user_id", "ts", "purchase")
      .collect()
    val arms = out.map(_.getAs[Long]("arm")).distinct
    for (a <- arms) {
      val rowsA = out.filter(_.getAs[Long]("arm") == a)
        .sortBy(_.getAs[Long]("t_days"))
      val total = rowsA.map(r => r.getAs[Long]("d_events") +
        r.getAs[Long]("c_censored")).sum
      // at-risk bookkeeping: first row starts at the arm total, each
      // next row drops exactly the previous row's deaths + censorings
      assert(rowsA.head.getAs[Long]("n_risk") == total)
      rowsA.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[Long]("n_risk") == p.getAs[Long]("n_risk")
            - p.getAs[Long]("d_events") - p.getAs[Long]("c_censored"))
        case _ => ()
      }
      // the recurrence itself: s_t = s_prev * (n - d) DIV n
      var s = 1000000L
      rowsA.foreach { r =>
        val n = r.getAs[Long]("n_risk"); val d = r.getAs[Long]("d_events")
        s = if (n > 0) s * (n - d) / n else s
        assert(r.getAs[Long]("s_micro") == s,
          s"recurrence mismatch at arm $a t ${r.getAs[Long]("t_days")}")
      }
      // survival is monotone non-increasing and stays positive while
      // censored users remain (never-converters keep s off zero)
      val ss = rowsA.map(_.getAs[Long]("s_micro"))
      assert(ss.zip(ss.tail).forall { case (x, y) => y <= x })
      assert(ss.last > 0L)
    }
    // conservation across arms: every user appears exactly once
    assert(out.map(r => r.getAs[Long]("d_events") +
      r.getAs[Long]("c_censored")).sum == 40L)
  }

  test("logRankTest: identical-rate arms score near zero, no-conversion " +
      "corpus yields NULL z, totals conserve") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // every user enters day 1 and converts at day 1 + (u % 5): the two
    // hash arms draw from the SAME duration distribution family, so
    // the test must not fire
    val same = (1 to 60).flatMap { u =>
      Seq((u.toLong, ts(1), "signup"),
        (u.toLong, ts(2 + (u % 5)), "purchase"))
    }
    val r = Analytics.logRankTest(same.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase", critZ = 1.96).collect().head
    assert(r.getAs[Long]("o0") + r.getAs[Long]("o1") == 60L)
    assert(r.getAs[Long]("n0_total") + r.getAs[Long]("n1_total") == 60L)
    assert(r.getAs[Long]("o0") <= r.getAs[Long]("n0_total"))
    assert(!r.getAs[Boolean]("significant"),
      s"identical arms flagged significant: z=${r.getAs[Double]("z_r")}")
    // E0 tracks O0 when rates match (within the small-sample noise the
    // z already accounts for)
    assert(r.getAs[Long]("v_micro") > 0L)
    // no conversions at all: no death days, v = 0, z NULL not NaN
    val none = (1 to 20).map(u => (u.toLong, ts(1), "view"))
    val r2 = Analytics.logRankTest(none.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase").collect().head
    assert(r2.getAs[Long]("v_micro") == 0L &&
      r2.isNullAt(r2.fieldIndex("z_r")) &&
      r2.isNullAt(r2.fieldIndex("significant")))
  }

  test("coxScore: planted hazard effects recover the score's sign in " +
      "both directions, identical arms reject hr=2 downward, " +
      "no-conversion corpus yields NULL z") {
    import java.sql.Timestamp
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // recover the operator's own arm split so the plant rides the SAME
    // hash (the welchTTest discipline): arm = rollingHash('km:'+u) % 2
    val armOf = (1 to 200).map(_.toLong).toDF("u")
      .select(col("u"), pmod(rollingHash(concat(lit("km:"),
        col("u").cast("string"))), lit(2)).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fixture(fastArm: Long): Seq[(Long, Timestamp, String)] =
      (1 to 200).map(_.toLong).flatMap { u =>
        val first = (u, ts(1), "signup")
        // fast arm converts on day 2 (duration 1); the other arm is
        // censored at the horizon — hazard ratio far beyond 2 either way
        if (armOf(u) == fastArm) Seq(first, (u, ts(2), "purchase"))
        else Seq(first, (u, ts(9), "view"))
      }
    // arm 1 converts, arm 0 never: true hr(arm1/arm0) >> 2, U > 0
    val up = Analytics.coxScore(
      fixture(1L).toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase", hr = 2.0).collect().head
    assert(up.getAs[Long]("hr_pct") == 200L)
    assert(up.getAs[Long]("u_micro") > 0L && up.getAs[Double]("z_r") > 0.0,
      s"planted arm-1 hazard not recovered: u=${up.getAs[Long]("u_micro")}")
    assert(up.getAs[Boolean]("significant"))
    // arm 0 converts, arm 1 never: the score flips sign
    val dn = Analytics.coxScore(
      fixture(0L).toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase", hr = 2.0).collect().head
    assert(dn.getAs[Long]("u_micro") < 0L && dn.getAs[Double]("z_r") < 0.0,
      s"planted arm-0 hazard not recovered: u=${dn.getAs[Long]("u_micro")}")
    assert(dn.getAs[Boolean]("significant"))
    // identical arms (true hr = 1): testing H0 hr=2 must reject
    // DOWNWARD — the expectation term overweights arm 1, so U < 0
    val same = (1 to 200).map(_.toLong).flatMap { u =>
      Seq((u, ts(1), "signup"), (u, ts(2 + (u % 5).toInt), "purchase"))
    }
    val eq = Analytics.coxScore(same.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase", hr = 2.0).collect().head
    assert(eq.getAs[Long]("u_micro") < 0L && eq.getAs[Double]("z_r") < 0.0,
      "identical arms should score below the hr=2 null")
    // conservation: every conversion observed exactly once
    assert(eq.getAs[Long]("o0") + eq.getAs[Long]("o1") == 200L)
    // no conversions: no death days survive the term filter, I = 0,
    // z NULL not NaN
    val none2 = (1 to 20).map(u => (u.toLong, ts(1), "view"))
    val r3 = Analytics.coxScore(none2.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase").collect().head
    assert(r3.getAs[Long]("i_micro") == 0L &&
      r3.isNullAt(r3.fieldIndex("z_r")) &&
      r3.isNullAt(r3.fieldIndex("significant")))
  }

  test("coxScoreProfile: the U sign change brackets the MLE - identical " +
      "arms bracket at or below hr=1, a strong planted effect pushes the " +
      "bracket up the ladder, U decreasing in hr") {
    import java.sql.Timestamp
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // identical arms (true hr = 1): U(1/2) > 0 > U(2) typically, so
    // the bracket lands on a rung at or below hr = 1
    val same = (1 to 200).map(_.toLong).flatMap { u =>
      Seq((u, ts(1), "signup"), (u, ts(2 + (u % 5).toInt), "purchase"))
    }
    val eq = Analytics.coxScoreProfile(
      same.toDF("user_id", "ts", "event_type"), "user_id", "ts",
      "purchase").collect().sortBy(_.getAs[Long]("hr_pct"))
    assert(eq.map(_.getAs[Long]("hr_pct")).toSeq ==
      Seq(50L, 100L, 200L, 400L))
    // U strictly decreasing down the ladder
    val us = eq.map(_.getAs[Long]("u_micro"))
    assert(us.zip(us.tail).forall { case (a, b) => b < a }, us.mkString(","))
    // exactly one bracket among the first three rungs (U crosses zero
    // once), and for identical arms it is NOT the top transition
    val brackets = eq.take(3).map(_.getAs[Boolean]("brackets_mle"))
    assert(brackets.count(identity) <= 1)
    assert(!brackets(2), s"identical arms bracketed at (2,4]: $us")
    // last rung's bracket is NULL (no next)
    assert(eq.last.isNullAt(eq.last.fieldIndex("brackets_mle")))
    // planted strong arm-1 effect: arm 1 converts day 2, arm 0 never
    val armOf = (1 to 200).map(_.toLong).toDF("u")
      .select(col("u"), pmod(rollingHash(concat(lit("km:"),
        col("u").cast("string"))), lit(2)).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strong = (1 to 200).map(_.toLong).flatMap { u =>
      val first = (u, ts(1), "signup")
      if (armOf(u) == 1L) Seq(first, (u, ts(2), "purchase"))
      else Seq(first, (u, ts(9), "view"))
    }
    val st = Analytics.coxScoreProfile(
      strong.toDF("user_id", "ts", "event_type"), "user_id", "ts",
      "purchase").collect().sortBy(_.getAs[Long]("hr_pct"))
    // the effect is far beyond 4x: U stays positive on every rung,
    // so NO rung brackets - the MLE is above the ladder
    assert(st.forall(_.getAs[Long]("u_micro") > 0L))
    assert(st.take(3).forall(!_.getAs[Boolean]("brackets_mle")))
  }

  test("coxBaseline: pure-integer Breslow increments, monotone " +
      "cumulative per stratum, and conservation of deaths") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val rows = (1 to 60).flatMap { u =>
      val first = (u.toLong, ts(1), "signup")
      if (u % 3 != 0) Seq(first, (u.toLong, ts(2 + (u % 5)), "purchase"))
      else Seq(first, (u.toLong, ts(9), "view"))
    }
    val out = Analytics.coxBaseline(
      rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "purchase", hr = 2L).collect()
    assert(out.nonEmpty)
    // every published row is a death day with the exact-integer
    // increment d*1e6 DIV (n0 + 2*n1)
    out.foreach { r =>
      val d = r.getAs[Long]("d_events")
      val n0 = r.getAs[Long]("n0"); val n1 = r.getAs[Long]("n1")
      assert(d > 0L)
      assert(r.getAs[Long]("h0_micro") == d * 1000000L / (n0 + 2 * n1))
    }
    // cumulative hazard monotone non-decreasing within each stratum
    out.groupBy(_.getAs[String]("stratum")).foreach { case (_, rs) =>
      val cums = rs.sortBy(_.getAs[Long]("t_days"))
        .map(_.getAs[Long]("h0_cum_micro"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    }
    // conservation: every conversion appears as exactly one death
    assert(out.map(_.getAs[Long]("d_events")).sum == 40L)
  }

  test("benfordAudit: fixed 9-row frame, conservation, literal scale, " +
      "and a geometric series hugging the law while uniform data breaks it") {
    // powers of 1.5 are a textbook Benford-conforming magnitude series
    val geo = (0 until 200).map(k => Tuple1(math.pow(1.5, k % 40) * 7.3))
      .toDF("v")
    val g = Analytics.benfordAudit(geo, "v").collect()
    assert(g.length == 9)
    assert(g.map(_.getAs[Long]("n")).sum == 200L)
    // the nine expectation literals sum to exactly 1e6
    assert(g.map(_.getAs[Long]("benford_micro")).sum == 1000000L)
    // max absolute deviation stays modest for the conforming series
    val gdev = g.map(r => math.abs(r.getAs[Long]("dev_micro"))).max
    assert(gdev < 100000L, s"geometric series deviated $gdev")
    // uniform 100..999 has flat first digits (~1/9 each): digit 1 is
    // hugely UNDER-represented vs Benford's 30.1%
    val uni = (100 to 999).map(v => Tuple1(v.toDouble)).toDF("v")
    val u = Analytics.benfordAudit(uni, "v").collect()
      .map(r => r.getAs[Long]("digit") -> r.getAs[Long]("dev_micro")).toMap
    assert(u(1L) < -150000L, s"uniform digit-1 deviation ${u(1L)}")
    // a digit with zero rows still publishes (value 5 only -> eight
    // zero-count rows in the fixed frame)
    val five = Seq(Tuple1(5.0)).toDF("v")
    val f = Analytics.benfordAudit(five, "v").collect()
    assert(f.length == 9 && f.count(_.getAs[Long]("n") == 0L) == 8)
  }

  test("dowAnomalyBands: a planted dow-local spike flags while the " +
      "same level on a high dow does not, one-day panels never flag") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 8 weeks: Sundays run at 60, other days at 10 — except ONE
    // Wednesday (Jan 17) spikes to 60: normal FOR A SUNDAY, anomalous
    // for its own dow panel. 8 points per panel matter: with n points
    // the outlier's own inflation of sigma caps any deviation at
    // (n-1)/sqrt(n) sigma, so a 2-sigma gate needs n >= 6 to be able
    // to fire at all (the self-masking bound).
    val day0 = java.time.LocalDate.of(2024, 1, 1)
    val rows = (0 until 56).flatMap { k =>
      val date = day0.plusDays(k)
      val sunday = date.getDayOfWeek.getValue % 7 == 0
      val n = if (sunday) 60 else if (date.toString == "2024-01-17") 60
        else 10
      (1 to n).map(i => (k.toLong * 1000 + i,
        Timestamp.valueOf(date.atTime(10, 0)), "click"))
    }
    val out = Analytics.dowAnomalyBands(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getAs[String]("day") ->
        r.getAs[Boolean]("flagged")).toMap
    assert(out.size == 56)
    // the Wednesday spike flags; the equally-sized Sundays do not
    assert(out("2024-01-17"), "dow-local spike missed")
    Seq("2024-01-07", "2024-01-14", "2024-01-21", "2024-01-28")
      .foreach(d => assert(!out(d), s"normal Sunday $d flagged"))
    // other Wednesdays sit inside their inflated band (the spike
    // widens its own panel's variance - the classic masking trade-off,
    // honest for a 2-sigma gate)
    assert(!out("2024-01-03"))
    // a 3-day corpus: every dow panel has one day, nothing can flag
    val tiny = (1 to 3).flatMap(d =>
      (1 to d * 5).map(i => (d.toLong * 100 + i, ts(d), "click")))
    val t = Analytics.dowAnomalyBands(
      tiny.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect()
    assert(t.forall(r => !r.getAs[Boolean]("flagged") &&
      r.getAs[Long]("n_dow") == 1L))
  }

  test("ksTest: catches a pure variance difference Mann-Whitney cannot " +
      "see, identical arms stay quiet, empty arm yields NULL") {
    // same center, different spread: one arm is a point mass at 100,
    // the other alternates 50/150 — P(X>Y) = P(X<Y), so the location
    // test is blind while the CDFs gap by 0.5 below the center
    val spread = (1 to 400).map { i =>
      if (i % 2 == 0) (true, 100L)
      else (false, if (i % 4 == 1) 50L else 150L)
    }
    val ks = Analytics.ksTest(spread.toDF("label", "score")).collect().head
    assert(ks.getAs[Long]("n_pos") == 200L &&
      ks.getAs[Long]("n_neg") == 200L)
    assert(ks.getAs[Long]("d_micro") == 500000L,
      s"D=${ks.getAs[Long]("d_micro")}")
    assert(ks.getAs[Boolean]("significant"))
    val mw = Analytics.mannWhitney(spread.toDF("label", "score"))
      .collect().head
    assert(!mw.getAs[Boolean]("significant"),
      s"MW should be blind to pure spread: z=${mw.getAs[Double]("z_r")}")
    // identical arms: D stays under the critical value
    val same = (1 to 400).map(i => (i % 2 == 0, (i % 7).toLong))
    val eq = Analytics.ksTest(same.toDF("label", "score")).collect().head
    assert(!eq.getAs[Boolean]("significant"),
      s"identical arms flagged: D=${eq.getAs[Long]("d_micro")}")
    // one empty arm: NULL statistic and verdict, not a crash
    val solo = (1 to 50).map(i => (true, i.toLong))
    val r = Analytics.ksTest(solo.toDF("label", "score")).collect().head
    assert(r.isNullAt(r.fieldIndex("d_micro")) &&
      r.isNullAt(r.fieldIndex("significant")))
  }

  test("adTest: exact hand-checked terms, variance difference flags, " +
      "identical arms read zero, empty arm yields NULL") {
    // pos = {1, 4}, neg = {2, 3}: bins at 1 and 3 each contribute
    // floor(1*4*1e6 / (B*(N-B)*2*2)) = 333333; bins at 2 (d=0) and 4
    // (B=N) contribute nothing
    val tiny = Seq((true, 1L), (true, 4L), (false, 2L), (false, 3L))
    val t = Analytics.adTest(tiny.toDF("label", "score")).collect().head
    assert(t.getAs[Long]("a2_micro") == 666666L,
      s"a2=${t.getAs[Long]("a2_micro")}")
    assert(!t.getAs[Boolean]("significant"))
    // the ksTest spread fixture: point mass at 100 vs alternating
    // 50/150 — the location test is blind, the CDF-integral is not
    val spread = (1 to 400).map { i =>
      if (i % 2 == 0) (true, 100L)
      else (false, if (i % 4 == 1) 50L else 150L)
    }
    val ad = Analytics.adTest(spread.toDF("label", "score")).collect().head
    assert(ad.getAs[Long]("n_pos") == 200L &&
      ad.getAs[Long]("n_neg") == 200L)
    assert(ad.getAs[Boolean]("significant"),
      s"spread should flag: a2=${ad.getAs[Long]("a2_micro")}")
    // identical arm multisets: every bin has M = B/2, so d = 0 and
    // the statistic is exactly 0
    val same = (0 until 200).flatMap(k =>
      Seq((true, (k % 7).toLong), (false, (k % 7).toLong)))
    val eq = Analytics.adTest(same.toDF("label", "score")).collect().head
    assert(eq.getAs[Long]("a2_micro") == 0L)
    assert(!eq.getAs[Boolean]("significant"))
    // one empty arm: NULL statistic and verdict, not a crash
    val solo = (1 to 50).map(i => (true, i.toLong))
    val r = Analytics.adTest(solo.toDF("label", "score")).collect().head
    assert(r.isNullAt(r.fieldIndex("a2_micro")) &&
      r.isNullAt(r.fieldIndex("significant")))
  }

  test("forecastBacktest: a planted weekly series crowns the seasonal " +
      "baseline, a drifting series crowns naive, hand-checked MAEs") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 'weekly': 21 days of 10 + 6 extra on days 7/14/21 (period 7) —
    // y(t-7) is exact after day 7 while y(t-1) misses the spikes;
    // 'drift': y grows by 1 daily — naive is off by 1, seasonal by 7
    val rows =
      (1 to 21).flatMap { d =>
        val n = if (d % 7 == 0) 16 else 10
        (1 to n).map(i => (d.toLong * 1000 + i, ts(d), "weekly"))
      } ++
      (1 to 21).flatMap { d =>
        (1 to (d + 3)).map(i => (d.toLong * 1000 + i, ts(d), "drift"))
      }
    val out = Analytics.forecastBacktest(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val wk = out("weekly")
    assert(wk.getAs[Long]("n_days") == 21L &&
      wk.getAs[Long]("n_scored") == 14L)
    // seasonal is EXACT on the periodic series
    assert(wk.getAs[Long]("mae_seasonal_micro") == 0L)
    // naive misses a spike edge 4 times in the scored window (day 7's
    // own miss falls before scoring starts): days 8, 14, 15, 21, each
    // off by 6 -> 24/14 micro (integer DIV)
    assert(wk.getAs[Long]("mae_naive_micro") == 24L * 1000000L / 14L)
    assert(wk.getAs[String]("winner") == "seasonal")
    val dr = out("drift")
    assert(dr.getAs[Long]("mae_naive_micro") == 1000000L)
    assert(dr.getAs[Long]("mae_seasonal_micro") == 7000000L)
    assert(dr.getAs[String]("winner") == "naive")
  }

  test("benfordTimeline: a planted unit-change day steps the TV series, " +
      "conforming days stay low, pure-integer complement identity") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // days 1-3: a Benford-ish geometric spread; day 4: everything x100
    // lands on leading digit 5 only (a unit-change signature)
    val good = for (d <- 1 to 3; k <- 0 until 60)
      yield (d.toLong * 1000 + k, ts(d), "load", math.pow(1.5, k % 30) * 7.3)
    val bad = (0 until 60).map(k => (4000L + k, ts(4), "load", 555.0))
    val out = Analytics.benfordTimeline(
      (good ++ bad).toDF("event_id", "ts", "event_type", "value"),
      "event_type", "ts", "value")
      .collect().map(r => r.getAs[String]("day") ->
        r.getAs[Long]("tv_micro")).toMap
    assert(out.size == 4)
    // conforming days sit well under the degenerate day
    val goodMax = Seq("2024-01-01", "2024-01-02", "2024-01-03")
      .map(out).max
    // all-digit-5 day: TV = 1 - p5 = 1 - 0.079181 = 0.920819
    assert(out("2024-01-04") == 920819L, s"got ${out("2024-01-04")}")
    assert(goodMax < 300000L, s"conforming day deviated $goodMax")
    assert(out("2024-01-04") > 3 * goodMax)
  }

  test("stlDecompose: exact reconstruction identity, planted weekly " +
      "pattern lands in the seasonal component, dow effects constant") {
    import java.sql.Timestamp
    // 28 days, 10 events/day + 6 extra every Sunday (2024-01-07 is one)
    val rows = (1 to 28).flatMap { d =>
      val day = java.time.LocalDate.of(2024, 1, d)
      val n = if (day.getDayOfWeek.getValue % 7 == 0) 16 else 10
      (1 to n).map(i =>
        (d.toLong * 1000 + i, Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"),
          "click"))
    }
    val out = Analytics.stlDecompose(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect()
    assert(out.length == 28)
    // the decomposition reconstructs EXACTLY by construction
    out.foreach { r =>
      assert(r.getAs[Long]("y") * 1000000L ==
        r.getAs[Long]("trend_micro") + r.getAs[Long]("seasonal_micro")
          + r.getAs[Long]("remainder_micro"))
    }
    // seasonal is a pure function of dow
    out.groupBy(_.getAs[Long]("dow")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("seasonal_micro")).distinct.length == 1)
    }
    // the planted Sunday boost owns the max seasonal effect
    val byDow = out.groupBy(_.getAs[Long]("dow"))
      .map { case (d, rs) => d -> rs.head.getAs[Long]("seasonal_micro") }
    assert(byDow.maxBy(_._2)._1 == 0L, s"got $byDow")
    assert(byDow(0L) > 4000000L) // ~ +6 events, minus the trend smear
  }

  test("mannKendallTrend: hand-checked S/Var/Sen on a small panel, " +
      "monotone series flag increasing, flat series flag none") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 'up': counts 1,2,3,4,5 over 5 days (u events on day u);
    // 'flat': 2 events every day
    val rows =
      (1 to 5).flatMap(d => (1 to d).map(i =>
        (d.toLong * 100 + i, ts(d), "up"))) ++
      (1 to 5).flatMap(d => (1 to 2).map(i =>
        (d.toLong * 100 + i, ts(d), "flat")))
    val out = Analytics.mannKendallTrend(
      rows.toDF("event_id", "ts", "event_type")
        .select(col("event_id"), col("ts"), col("event_type")),
      "event_type", "ts", critZ = 1.96)
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val up = out("up")
    // strictly increasing: every one of the C(5,2)=10 pairs is +1
    assert(up.getAs[Long]("s") == 10L)
    // no ties: 18*Var = n(n-1)(2n+5) = 5*4*15 = 300
    assert(up.getAs[Long]("var18") == 300L)
    // all pairwise slopes are 1/day -> sen = 1e6 micro
    assert(up.getAs[Long]("sen_micro") == 1000000L)
    // z = (10-1)/sqrt(300/18) = 9/sqrt(16.67) = 2.2045 -> increasing
    assert(up.getAs[String]("trend") == "increasing")
    assert(math.abs(up.getAs[Double]("z_r") - 2.2045) < 1e-9)
    val flat = out("flat")
    // all y equal: S = 0, and the tie correction kills the variance
    // entirely (one tie group of 5 -> 300 - 300 = 0) -> NULL z
    assert(flat.getAs[Long]("s") == 0L)
    assert(flat.getAs[Long]("var18") == 0L)
    assert(flat.isNullAt(flat.fieldIndex("z_r")))
    assert(flat.isNullAt(flat.fieldIndex("trend")))
    assert(flat.getAs[Long]("sen_micro") == 0L)
  }

  test("newVsReturning + stickiness: first-day split and DAU/WAU " +
      "hand-checked on a three-day fixture") {
    import java.sql.Timestamp
    val d = (day: Int) => Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // day 1: users 1, 2 (both new); day 2: user 1 (returning, 2
    // events) + user 3 (new); day 3: user 1 only
    val rows = Seq(
      (1L, d(1), 1L), (2L, d(1), 2L),
      (3L, d(2), 1L), (4L, d(2), 1L), (5L, d(2), 3L),
      (6L, d(3), 1L))
    val df = rows.toDF("event_id", "ts", "user_id")
    val nr = Analytics.newVsReturning(df, "user_id", "ts")
      .collect().map(r => r.getAs[String]("day") -> r).toMap
    val d1 = nr("2024-01-01")
    assert(d1.getAs[Long]("active_users") == 2L &&
      d1.getAs[Long]("new_users") == 2L &&
      d1.getAs[Long]("new_share_bp") == 10000L)
    val d2 = nr("2024-01-02")
    assert(d2.getAs[Long]("active_users") == 2L &&
      d2.getAs[Long]("new_users") == 1L &&
      d2.getAs[Long]("returning_users") == 1L &&
      d2.getAs[Long]("new_share_bp") == 5000L)
    assert(d2.getAs[Long]("n_events") == 3L &&
      d2.getAs[Long]("new_events") == 1L)
    val st = Analytics.stickiness(df, "user_id", "ts")
      .collect().map(r => r.getAs[String]("day") -> r).toMap
    // day 1: dau 2, wau 2 (nobody earlier) -> 10000; day 3: dau 1,
    // wau 3 (users 1, 2, 3 all active within the trailing week)
    assert(st("2024-01-01").getAs[Long]("dau") == 2L &&
      st("2024-01-01").getAs[Long]("wau") == 2L &&
      st("2024-01-01").getAs[Long]("stickiness_bp") == 10000L)
    assert(st("2024-01-03").getAs[Long]("dau") == 1L &&
      st("2024-01-03").getAs[Long]("wau") == 3L &&
      st("2024-01-03").getAs[Long]("stickiness_bp") == 3333L)
  }

  test("powerMde: hand-checked MDE at p=0.5, degenerate full-coverage " +
      "metric reads NULL") {
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-10 10:00:00")
    // 100 users; 'half' touched by users 1..50, 'all' by everyone
    val rows =
      (1 to 50).map(u => (u.toLong, t, u.toLong, "half")) ++
      (1 to 100).map(u => (1000L + u, t, u.toLong, "all"))
    val out = Analytics.powerMde(
      rows.toDF("event_id", "ts", "user_id", "event_type"),
      "event_type", "user_id")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val h = out("half")
    assert(h.getAs[Long]("n_users") == 100L && h.getAs[Long]("n_t") == 50L)
    assert(h.getAs[Long]("rate_bp") == 5000L)
    // 2.8016 * sqrt(2*.25/50) = 0.28016 -> 2802 bp
    assert(h.getAs[Long]("mde_bp") == 2802L)
    assert(h.getAs[Long]("rel_mde_bp") == 5604L)
    val a = out("all")
    // p = 1: no variance, nothing to power
    assert(a.isNullAt(a.fieldIndex("mde_bp")) &&
      a.isNullAt(a.fieldIndex("rel_mde_bp")))
  }

  test("sequentialAb: planted strong effect crosses the OBF boundary, " +
      "null effect never stops, counts certified against the shared hash") {
    import java.sql.Timestamp
    def armOf(u: Long): Long =
      ("ab:" + u).foldLeft(0L)((a, c) => (a * 257 + c) % 1000000007L) % 2
    val day = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 400 users all enroll on day 1 (a view); arm-1 users convert 80%
    // on day 1, arm-0 users 10% on day 2 — a huge planted effect
    val users = (1L to 400L)
    val effect = users.flatMap { u =>
      val enroll = Seq((u * 10, day(8), u, "view"))
      val conv =
        if (armOf(u) == 1 && u % 5 != 0) Seq((u * 10 + 1, day(8), u, "purchase"))
        else if (armOf(u) == 0 && u % 10 == 0) Seq((u * 10 + 1, day(9), u, "purchase"))
        else Nil
      enroll ++ conv
    }
    val out = Analytics.sequentialAb(
      effect.toDF("event_id", "ts", "user_id", "event_type"),
      "user_id", "ts", "event_type")
      .collect().map(r => r.getAs[Long]("look") -> r).toMap
    assert(out.size == 5)
    val l1 = out(1L)
    // every user enrolls at look 1; counts match the shared hash split
    val n1exp = users.count(armOf(_) == 1).toLong
    assert(l1.getAs[Long]("n1") == n1exp)
    assert(l1.getAs[Long]("n0") == 400L - n1exp)
    assert(l1.getAs[Long]("c1") == users.count(u => armOf(u) == 1 && u % 5 != 0).toLong)
    assert(l1.getAs[Long]("c0") == 0L) // arm-0 conversions land day 2
    // the effect is enormous: the monitor stops at the FIRST look even
    // under the 4.562 OBF bar
    assert(l1.getAs[Boolean]("crossed"))
    assert(l1.getAs[Long]("stop_look") == 1L)
    assert(l1.getAs[Double]("z_r") > 4.562)
    // null effect: both arms convert by the same u-mod rule
    val flat = users.flatMap { u =>
      Seq((u * 10, day(8), u, "view")) ++
        (if (u % 5 == 0) Seq((u * 10 + 1, day(8), u, "purchase")) else Nil)
    }
    val out2 = Analytics.sequentialAb(
      flat.toDF("event_id", "ts", "user_id", "event_type"),
      "user_id", "ts", "event_type")
      .collect()
    assert(out2.forall(r => r.isNullAt(r.fieldIndex("stop_look"))))
    assert(out2.forall(r => !r.getAs[Boolean]("crossed")))
  }

  test("interarrivalPercentiles: exact rank selection on hand-built gaps") {
    import java.sql.Timestamp
    val t = (s: Int) => new Timestamp(1704067200000L + s * 1000L)
    // type 'x': events at 0s, 1s, 3s -> gaps 1000 ms and 2000 ms
    // type 'y': ten events 1s apart -> every percentile reads 1000 ms
    val rows =
      Seq((1L, t(0), "x"), (2L, t(1), "x"), (3L, t(3), "x")) ++
      (0 to 9).map(i => (10L + i, t(100 + i), "y"))
    val out = Analytics.interarrivalPercentiles(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts",
      "event_id")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val x = out("x")
    assert(x.getAs[Long]("n_gaps") == 2L)
    // rank ceil(2*.5)=1 -> 1000; ceil(2*.9)=2 -> 2000
    assert(x.getAs[Long]("p50_ms") == 1000L)
    assert(x.getAs[Long]("p90_ms") == 2000L &&
      x.getAs[Long]("p99_ms") == 2000L && x.getAs[Long]("max_ms") == 2000L)
    val y = out("y")
    assert(y.getAs[Long]("n_gaps") == 9L &&
      y.getAs[Long]("p50_ms") == 1000L && y.getAs[Long]("p99_ms") == 1000L)
  }

  test("lmomentsValues: hand-checked L-ratios — symmetric reads t3=0, " +
      "planted right skew reads t3=1, point mass reads NULL shape") {
    // 'sym': cents {0, 100, 200} -> l1 = 1.0, t2 = 2/3, t3 = 0;
    // 'skew': cents {0, 0, 300} -> t2 = 1, t3 = 1 (max concentration);
    // 'point': all equal -> lambda2 = 0 -> NULL t3, t2 = 0
    val rows = Seq(
      ("sym", 0.00), ("sym", 1.00), ("sym", 2.00),
      ("skew", 0.00), ("skew", 0.00), ("skew", 3.00),
      ("point", 2.00), ("point", 2.00), ("point", 2.00))
    val out = Analytics.lmomentsValues(
      rows.toDF("event_type", "value"), "event_type", "value")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val sy = out("sym")
    assert(sy.getAs[Long]("l1_micro") == 100000000L) // 100 cents
    assert(sy.getAs[Long]("t2_micro") == 666666L)
    assert(sy.getAs[Long]("t3_micro") == 0L)
    val sk = out("skew")
    assert(sk.getAs[Long]("t2_micro") == 1000000L)
    assert(sk.getAs[Long]("t3_micro") == 1000000L)
    val pt = out("point")
    assert(pt.getAs[Long]("t2_micro") == 0L)
    assert(pt.isNullAt(pt.fieldIndex("t3_micro")))
  }

  test("fanoDaily: exact Var/mean arithmetic — burst reads over, " +
      "constant reads under, near-Poisson sits between") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val mk = (d: Int, t: String, y: Int) =>
      (1 to y).map(i => (d.toLong * 1000 + i, ts(d), t))
    // 'bursty': 1,1,1,9 -> fano = 192e6/48 = 4.0; 'flat': 4,4,4 ->
    // 0; 'mid': 2,5 -> 9e6/14 = 642857
    val rows =
      (1 to 4).flatMap(d => mk(d, "bursty", if (d == 4) 9 else 1)) ++
      (1 to 3).flatMap(d => mk(d, "flat", 4)) ++
      (1 to 2).flatMap(d => mk(d, "mid", if (d == 1) 2 else 5))
    val out = Analytics.fanoDaily(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val b = out("bursty")
    assert(b.getAs[Long]("fano_micro") == 4000000L &&
      b.getAs[String]("verdict") == "overdispersed")
    assert(b.getAs[Long]("mean_micro") == 3000000L)
    assert(out("flat").getAs[Long]("fano_micro") == 0L &&
      out("flat").getAs[String]("verdict") == "underdispersed")
    assert(out("mid").getAs[Long]("fano_micro") == 642857L &&
      out("mid").getAs[String]("verdict") == "poisson-like")
  }

  test("poissonRateTest: doubling flags up, equal windows stable, " +
      "zero-baseline ratio NULL but z still fires") {
    import java.sql.Timestamp
    val t1 = Timestamp.valueOf("2024-01-10 10:00:00")
    val t2 = Timestamp.valueOf("2024-01-17 10:00:00")
    val rows =
      (1 to 100).map(i => (i.toLong, t1, "dbl")) ++
      (1 to 200).map(i => (1000L + i, t2, "dbl")) ++
      (1 to 50).map(i => (2000L + i, t1, "same")) ++
      (1 to 50).map(i => (3000L + i, t2, "same")) ++
      (1 to 5).map(i => (4000L + i, t2, "new"))
    val out = Analytics.poissonRateTest(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts",
      "2024-01-08", "2024-01-15", "2024-01-22")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val d = out("dbl")
    // z = 100/sqrt(300) = 5.7735; ratio = 2x = 20000 bp
    assert(d.getAs[Long]("ratio_bp") == 20000L)
    assert(d.getAs[Double]("z_r") == 5.7735)
    assert(d.getAs[String]("verdict") == "up")
    assert(out("same").getAs[Double]("z_r") == 0.0 &&
      out("same").getAs[String]("verdict") == "stable")
    val n = out("new")
    // k1 = 0: no ratio to quote, but z = 5/sqrt(5) = 2.2361 fires
    assert(n.isNullAt(n.fieldIndex("ratio_bp")))
    assert(n.getAs[Double]("z_r") == 2.2361 &&
      n.getAs[String]("verdict") == "up")
  }

  test("captureRecapture: exact Chapman arithmetic on planted overlap, " +
      "disjoint windows estimate past the seen set") {
    import java.sql.Timestamp
    val t1 = Timestamp.valueOf("2024-01-10 10:00:00")
    val t2 = Timestamp.valueOf("2024-01-17 10:00:00")
    val rows =
      (1 to 50).map(u => (u.toLong, t1, u.toLong, "pop")) ++
      (31 to 70).map(u => (100L + u, t2, u.toLong, "pop")) ++
      (1 to 5).map(u => (200L + u, t1, u.toLong, "disjoint")) ++
      (6 to 10).map(u => (300L + u, t2, u.toLong, "disjoint"))
    val out = Analytics.captureRecapture(
      rows.toDF("event_id", "ts", "user_id", "event_type"),
      "event_type", "user_id", "ts",
      "2024-01-08", "2024-01-15", "2024-01-22")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val p = out("pop")
    // n1=50, n2=40, m=20: chapman = 51*41 DIV 21 - 1 = 98, seen = 70
    assert(p.getAs[Long]("n1") == 50L && p.getAs[Long]("n2") == 40L &&
      p.getAs[Long]("m") == 20L)
    assert(p.getAs[Long]("chapman") == 98L)
    assert(p.getAs[Long]("seen") == 70L)
    assert(p.getAs[Long]("coverage_bp") == 700000L / 98L)
    val dj = out("disjoint")
    // zero recapture: chapman = 36 - 1 = 35 >> the 10 seen users
    assert(dj.getAs[Long]("m") == 0L && dj.getAs[Long]("chapman") == 35L)
    assert(dj.getAs[Long]("coverage_bp") == 2857L)
  }

  test("seasonalStrength: planted weekly series reads strongly seasonal, " +
      "a clean ramp reads strongly trending, flat reads NULL") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val mk = (d: Int, t: String, y: Int) =>
      (1 to y).map(i => (d.toLong * 1000 + i, ts(d), t))
    // 'weekly': 28 days, 10 events when day%7==1 else 2 (pure dow
    // structure); 'trendy': y = d (pure ramp); 'flat': constant 3
    val rows =
      (1 to 28).flatMap(d => mk(d, "weekly", if (d % 7 == 1) 10 else 2)) ++
      (1 to 28).flatMap(d => mk(d, "trendy", d)) ++
      (1 to 28).flatMap(d => mk(d, "flat", 3))
    val out = Analytics.seasonalStrength(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val w = out("weekly")
    assert(w.getAs[Long]("fs_micro") > 500000L,
      s"weekly fs=${w.getAs[Long]("fs_micro")}")
    assert(w.getAs[Long]("fs_micro") <= 1000000L)
    val t = out("trendy")
    assert(t.getAs[Long]("ft_micro") > 900000L,
      s"trendy ft=${t.getAs[Long]("ft_micro")}")
    // the ramp's seasonal strength sits far below the weekly series'
    assert(t.getAs[Long]("fs_micro") < w.getAs[Long]("fs_micro"))
    val f = out("flat")
    // flat: every component variance is 0 -> nothing to measure
    assert(f.isNullAt(f.fieldIndex("fs_micro")) &&
      f.isNullAt(f.fieldIndex("ft_micro")))
  }

  test("runsTestDaily: a level shift reads clustered, a sawtooth reads " +
      "oscillating, a constant series reads NULL") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 'shift': 6 low days then 6 high days (2 runs); 'flip': low/high
    // alternating (12 runs); 'flat': constant
    val mk = (d: Int, t: String, y: Int) =>
      (1 to y).map(i => (d.toLong * 1000 + i, ts(d), t))
    val rows =
      (1 to 12).flatMap(d => mk(d, "shift", if (d <= 6) 1 else 3)) ++
      (1 to 12).flatMap(d => mk(d, "flip", if (d % 2 == 0) 3 else 1)) ++
      (1 to 12).flatMap(d => mk(d, "flat", 2))
    val out = Analytics.runsTestDaily(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val sh = out("shift")
    // lower median = 1 (6th of 12 sorted) -> 6 below (ties below), 6
    // above, 2 runs; z = (12*1 - 72)/sqrt(72*60/11) = -3.0277
    assert(sh.getAs[Long]("runs") == 2L)
    assert(sh.getAs[Long]("n_above") == 6L &&
      sh.getAs[Long]("n_below") == 6L)
    val zExp = math.floor(-60.0 / math.sqrt(72.0 * 60.0 / 11.0)
      * 10000.0 + 0.5) / 10000.0
    assert(sh.getAs[Double]("z_r") == zExp)
    assert(sh.getAs[String]("verdict") == "clustered")
    val fl = out("flip")
    assert(fl.getAs[Long]("runs") == 12L)
    assert(fl.getAs[String]("verdict") == "oscillating")
    val ft = out("flat")
    // constant: nothing above the median -> p = 0 -> NULL z + verdict
    assert(ft.getAs[Long]("n_above") == 0L)
    assert(ft.isNullAt(ft.fieldIndex("z_r")) &&
      ft.isNullAt(ft.fieldIndex("verdict")))
  }

  test("autocorrDaily: exact hand-computed lag-1/lag-7 on a planted " +
      "weekly series, NULL num when the series is shorter than the lag") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 'weekly': 21 days, 8 events on days 1/8/15, 1 otherwise ->
    // exact period 7; 'short': 5 varying days
    val mk = (d: Int, t: String, y: Int) =>
      (1 to y).map(i => (d.toLong * 1000 + i, ts(d), t))
    val rows =
      (1 to 21).flatMap(d => mk(d, "weekly", if (d % 7 == 1) 8 else 1)) ++
      (1 to 5).flatMap(d => mk(d, "short", d))
    val out = Analytics.autocorrDaily(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect()
      .map(r => (r.getAs[String]("group_key"), r.getAs[Long]("lag")) -> r)
      .toMap
    // d = 21y - 42: spikes 126, others -21; den = 3*126^2 + 18*21^2
    // = 55566; num_7 = sum over 14 periodic products = 37044 ->
    // 0.6667; num_1 = 15*441 - 5*2646 = -6615 -> -0.1190
    val w7 = out(("weekly", 7L))
    assert(w7.getAs[Long]("den") == 55566L)
    assert(w7.getAs[Long]("num") == 37044L)
    assert(w7.getAs[Double]("ac_r") == 0.6667)
    val w1 = out(("weekly", 1L))
    assert(w1.getAs[Long]("num") == -6615L)
    assert(w1.getAs[Double]("ac_r") == -0.1190)
    // 5-day series: lag 7 has no pairs -> NULL num and NULL r, but
    // the row still publishes (the spine is den x lags)
    val s7 = out(("short", 7L))
    assert(s7.isNullAt(s7.fieldIndex("num")) &&
      s7.isNullAt(s7.fieldIndex("ac_r")))
    assert(out(("short", 1L)).getAs[Long]("num") != 0L)
  }

  test("spearmanDaily + kendallTauDaily: perfect monotone pairs read " +
      "exactly +/-1, constant series read NULL") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 'mono': day d has d events of value d -> count up, cents up;
    // 'anti': day d has d events of value 12(10-d)/d -> count up,
    // cents 1200*(10-d) strictly DOWN (all exact 2-dp values);
    // 'flat': one event of value 5 every day -> both constant
    val rows =
      (1 to 4).flatMap(d => (1 to d).map(i =>
        (d.toLong * 1000 + i, ts(d), "mono", d.toDouble))) ++
      (1 to 4).flatMap(d => (1 to d).map(i =>
        (d.toLong * 1000 + i, ts(d), "anti", 12.0 * (10 - d) / d))) ++
      (1 to 4).map(d => (d.toLong * 1000, ts(d), "flat", 5.0))
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    val sp = Analytics.spearmanDaily(df, "event_type", "ts", "value")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    assert(sp("mono").getAs[Double]("rho_r") == 1.0)
    assert(sp("anti").getAs[Double]("rho_r") == -1.0)
    assert(sp("flat").isNullAt(sp("flat").fieldIndex("rho_r")))
    assert(sp("flat").getAs[Long]("dena") == 0L)
    val kt = Analytics.kendallTauDaily(df, "event_type", "ts", "value")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    // every one of the C(4,2)=6 pairs agrees / disagrees in order
    assert(kt("mono").getAs[Long]("s") == 6L &&
      kt("mono").getAs[Double]("tau_r") == 1.0)
    assert(kt("anti").getAs[Long]("s") == -6L &&
      kt("anti").getAs[Double]("tau_r") == -1.0)
    // all-tied series: n1 = n0, the variance term dies -> NULL tau
    assert(kt("flat").getAs[Long]("n1") == kt("flat").getAs[Long]("n0"))
    assert(kt("flat").isNullAt(kt("flat").fieldIndex("tau_r")))
  }

  test("theilSenForecast: exact line on a clean ramp, outlier day cannot " +
      "move slope, intercept, or the one-step forecast") {
    import java.sql.Timestamp
    val ts = (d: Int) => Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // 'up': y = x+1 (counts 1..5 over days 1..5); 'spike': same ramp
    // with day 4 replaced by a 100-event outlier
    val rows =
      (1 to 5).flatMap(d => (1 to d).map(i =>
        (d.toLong * 1000 + i, ts(d), "up"))) ++
      (1 to 5).flatMap { d =>
        val y = if (d == 4) 100 else d
        (1 to y).map(i => (d.toLong * 1000 + i, ts(d), "spike"))
      }
    val out = Analytics.theilSenForecast(
      rows.toDF("event_id", "ts", "event_type"), "event_type", "ts")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val up = out("up")
    // every pairwise slope is exactly 1/day; every residual is 1e6
    assert(up.getAs[Long]("sen_micro") == 1000000L)
    assert(up.getAs[Long]("intercept_micro") == 1000000L)
    assert(up.getAs[Long]("x_next") == 5L)
    // the line predicts y = 6 tomorrow, exactly
    assert(up.getAs[Long]("forecast_micro") == 6000000L)
    val sp = out("spike")
    // lower-median slope: sorted slopes [-95e6, 1e6 x6, 33e6, 49e6,
    // 97e6], position (10+1) DIV 2 = 5 -> 1e6; lower-median residual:
    // [1e6 x4, 97e6], position 3 -> 1e6 — the spike owns neither
    assert(sp.getAs[Long]("sen_micro") == 1000000L)
    assert(sp.getAs[Long]("intercept_micro") == 1000000L)
    assert(sp.getAs[Long]("forecast_micro") == 6000000L)
    // a single-day group has no pairs, hence no line — absent
    val solo = Analytics.theilSenForecast(
      Seq((1L, ts(3), "one")).toDF("event_id", "ts", "event_type"),
      "event_type", "ts")
    assert(solo.count() == 0L)
  }
}
