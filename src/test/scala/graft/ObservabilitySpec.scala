package graft

import java.sql.Timestamp

import graft.operators.Observability

class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, "START", 0.0, ""),
    (2L, ts("2024-01-01 00:00:30"), 10L, "SUCCESS", 0.0, ""),
    (3L, ts("2024-01-01 00:01:00"), 10L, "START", 0.0, ""),
    (4L, ts("2024-01-01 00:02:00"), 10L, "FAILURE", 0.0, ""),
    (5L, ts("2024-01-01 00:00:10"), 20L, "START", 0.0, "")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("eventDurations pairs each event with its successor per entity") {
    val out = Observability.eventDurations(events, "user_id")
      .orderBy("user_id", "event_id").collect()
    assert(out.length == 3) // last event per user has no successor
    assert(out(0).getAs[Long]("duration_us") == 30000000L)
    assert(out(0).getAs[String]("next_event_type") == "SUCCESS")
    assert(out(2).getAs[Long]("duration_us") == 60000000L)
  }

  test("stepDurationsStatus pairs START with the next SUCCESS/FAILURE and tags status") {
    val out = Observability.stepDurationsStatus(events, "user_id",
      startType = "START", successType = "SUCCESS", failureType = "FAILURE")
      .orderBy("event_id").collect()
    assert(out.length == 2)
    // event 2: SUCCESS closing the START at t=0
    assert(out(0).getAs[Long]("event_id") == 2L)
    assert(out(0).getAs[String]("status") == "success")
    assert(out(0).getAs[Long]("duration_us") == 30000000L)
    // event 4: FAILURE closing the re-armed START at t=60s
    assert(out(1).getAs[String]("status") == "failure")
    assert(out(1).getAs[Long]("duration_us") == 60000000L)
  }

  test("stepDurationsStatus emits a NULL-start row when no START precedes") {
    val orphan = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "SUCCESS", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Observability.stepDurationsStatus(orphan, "user_id",
      "START", "SUCCESS", "FAILURE").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("start_us")))
  }

  test("gapSessions splits on gaps >= the threshold and merges within") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "A", 0.0, ""),
      (2L, ts("2024-01-01 00:10:00"), 10L, "A", 0.0, ""), // same session
      (3L, ts("2024-01-01 01:00:00"), 10L, "A", 0.0, ""), // 50 min gap -> new
      (4L, ts("2024-01-01 00:00:00"), 20L, "A", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Observability.gapSessions(ev, "user_id", "30 minutes")
      .orderBy("user_id", "first_us").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Long]("span_us") == 600000000L)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("stepStats aggregates durations per type") {
    val stats = Observability.stepStats(Observability.eventDurations(events, "user_id"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("run_count")).toMap
    assert(stats("START") == 2) // START->SUCCESS and SUCCESS->START pairs keyed by first event
  }

  test("funnel counts strict-order first-occurrence reach per step") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val ev = Seq(
      // u1 completes all 3 in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE first click -> depth 2 blocked? no: first
      // click (5) >= first view (4); first purchase (4) < first click -> depth 2
      (2L, "view", ts(4)), (2L, "purchase", ts(4)), (2L, "click", ts(5)),
      // u3 views only
      (3L, "view", ts(6)),
      // u4 clicks without ever viewing -> depth 0
      (4L, "click", ts(7))
    ).toDF("user_id", "event_type", "ts")
    val out = Observability.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("step_idx") ->
        (r.getAs[String]("step"), r.getAs[Long]("n_users"))).toMap
    assert(out == Map(1L -> ("view", 3L), 2L -> ("click", 2L), 3L -> ("purchase", 1L)))
  }

  test("cohortRetention buckets users by first-seen day and counts returns") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // u1 first on day 1, returns day 2 twice (counted once) and day 4;
    // u2 first on day 2 only
    val ev = Seq(
      (1L, ts(1, 9)), (1L, ts(2, 9)), (1L, ts(2, 11)), (1L, ts(4, 9)),
      (2L, ts(2, 10))
    ).toDF("user_id", "ts")
    val out = Observability.cohortRetention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L, ("2024-01-02", 0L) -> 1L))
  }

  test("runMetadata derives status, bounds, and the tag set per run") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // run 1: click then error -> failure; run 2: clean -> success
    val ev = Seq(
      (1L, "click", ts(9)), (1L, "error", ts(10)), (1L, "click", ts(11)),
      (2L, "view", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val out = Observability.runMetadata(ev, "user_id")
      .collect().map(r => r.getAs[Long]("run_id") -> r).toMap
    assert(out(1L).getAs[String]("status") == "failure")
    assert(out(1L).getAs[Long]("n_errors") == 1L)
    assert(out(1L).getAs[String]("tags") == "click,error")
    assert(out(1L).getAs[Long]("duration_us") == 2L * 3600 * 1000000)
    assert(out(2L).getAs[String]("status") == "success")
    assert(out(2L).getAs[Long]("n_events") == 1L)
  }

  test("errorBursts: planted spike flags, quiet hours and low-count spikes don't") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // hours 0-5: 100 events, 1 error each (1% baseline); hour 6: 100
    // events, 10 errors (10% — a 10x spike); hour 7: 2 events, 1 error
    // (50% rate but only 1 error — under the min-error floor)
    val rows = (0 to 5).flatMap { h =>
      (1 to 99).map(i => (h * 1000L + i, ts(f"2024-01-01 0$h%d:01:00"), 1L, "view", 0.0)) :+
        ((h * 1000L + 100, ts(f"2024-01-01 0$h%d:02:00"), 1L, "error", 0.0))
    } ++ (1 to 90).map(i => (6000L + i, ts("2024-01-01 06:01:00"), 1L, "view", 0.0)) ++
      (1 to 10).map(i => (6100L + i, ts("2024-01-01 06:02:00"), 1L, "error", 0.0)) ++
      Seq((7001L, ts("2024-01-01 07:01:00"), 1L, "view", 0.0),
        (7002L, ts("2024-01-01 07:02:00"), 1L, "error", 0.0)) ++
      // hour 20, after a >6h quiet gap: the RANGE frame sees an EMPTY
      // trailing window (a ROWS frame would reach back to hours 2-7 and
      // flag this as a burst against the stale baseline)
      (1 to 50).map(i => (20000L + i, ts("2024-01-01 20:01:00"), 1L, "view", 0.0)) ++
      (1 to 50).map(i => (20100L + i, ts("2024-01-01 20:02:00"), 1L, "error", 0.0))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Observability
      .errorBursts(ev, "error", trailHours = 6, factor = 2, minErrors = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(6))).toMap
    val h = (n: Int) => java.time.LocalDateTime.parse(f"2024-01-01T$n%02d:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(out(h(0)) === ((100L, false))) // no trailing window yet
    assert(out(h(5)) === ((100L, false))) // at baseline
    assert(out(h(6)) === ((1000L, true))) // the spike
    assert(out(h(7)) === ((5000L, false))) // 1 error < minErrors floor
    assert(out(h(20)) === ((5000L, false))) // empty trailing window after gap
  }

  test("transitions: per-user consecutive pairs only, probabilities in bp") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 00:01:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 00:02:00"), 1L, "view", 0.0),
      // user 2's first event must NOT pair with user 1's last
      (4L, ts("2024-01-01 00:03:00"), 2L, "view", 0.0),
      (5L, ts("2024-01-01 00:04:00"), 2L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Observability
      .transitions(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("view", "click")) === ((2L, 10000L)))
    assert(out(("click", "view")) === ((1L, 10000L)))
    assert(out.size === 2)
  }

  test("markovStationary: hand-traced quantized iteration on a biased " +
      "2-chain, absorbing dangling type soaks the whole mass") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // one user walks A A A A B A: P(A->A)=3/4, P(A->B)=1/4, P(B->A)=1
    // -> stationary (0.8, 0.2)
    val seq1 = Seq("A", "A", "A", "A", "B", "A").zipWithIndex.map {
      case (t, i) => (i.toLong + 1, ts(f"2024-01-01 00:0$i:00"), 1L, t, 0.0)
    }
    val out1 = graft.operators.Observability.markovStationary(
      seq1.toDF("event_id", "ts", "user_id", "event_type", "value"),
      "user_id", "ts", "event_id", "event_type", iters = 12)
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    assert(math.abs(out1("A").getAs[Long]("pi_micro") - 800000L) <= 1000L,
      s"piA=${out1("A").getAs[Long]("pi_micro")}")
    assert(math.abs(out1("B").getAs[Long]("pi_micro") - 200000L) <= 1000L)
    // observed mix: A 5/6, B 1/6
    assert(out1("A").getAs[Long]("obs_micro") == 833333L)
    // absorbing chain: A->B, B->C, C never moves (dangling self-loop)
    val seq2 = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A", 0.0),
      (2L, ts("2024-01-01 00:01:00"), 1L, "B", 0.0),
      (3L, ts("2024-01-01 00:02:00"), 2L, "B", 0.0),
      (4L, ts("2024-01-01 00:03:00"), 2L, "C", 0.0))
    val out2 = graft.operators.Observability.markovStationary(
      seq2.toDF("event_id", "ts", "user_id", "event_type", "value"),
      "user_id", "ts", "event_id", "event_type", iters = 12)
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    // uniform start 333333 each; mass drains A -> B -> C and parks
    // (999999, not 1e6 — the documented quantization leak)
    assert(out2("C").getAs[Long]("pi_micro") == 999999L)
    assert(out2("A").getAs[Long]("pi_micro") == 0L)
    assert(out2("B").getAs[Long]("pi_micro") == 0L)
    assert(out2("C").getAs[Long]("gap_micro") == 999999L - 250000L)
  }

  test("sessionPaths: gap splits sessions, path capped at maxLen, ranked") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      // user 1, session 1: view > click > purchase
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 00:01:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 00:02:00"), 1L, "purchase", 0.0),
      // user 1, session 2 (40-min gap): view > click > purchase again
      (4L, ts("2024-01-01 00:42:00"), 1L, "view", 0.0),
      (5L, ts("2024-01-01 00:43:00"), 1L, "click", 0.0),
      (6L, ts("2024-01-01 00:44:00"), 1L, "purchase", 0.0),
      // user 2: one long session — path truncates at maxLen=3
      (7L, ts("2024-01-01 00:00:00"), 2L, "view", 0.0),
      (8L, ts("2024-01-01 00:01:00"), 2L, "view", 0.0),
      (9L, ts("2024-01-01 00:02:00"), 2L, "view", 0.0),
      (10L, ts("2024-01-01 00:03:00"), 2L, "error", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Observability
      .sessionPaths(ev, gapUs = 1800000000L, maxLen = 3, topN = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("view>click>purchase") === ((2L, 1L)))
    assert(out("view>view>view") === ((1L, 2L))) // truncated, error dropped
    assert(out.size === 2)
  }

  test("lastTouchAttribution: latest in-window touch wins, outside-window -> none") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      // user 1: view then click then purchase — click (latest) gets credit
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 02:00:00"), 1L, "purchase", 10.0),
      // user 2: touch 30h before purchase — outside the 24h window
      (4L, ts("2024-01-01 00:00:00"), 2L, "click", 0.0),
      (5L, ts("2024-01-02 06:00:00"), 2L, "purchase", 20.0),
      // user 3: purchase with no touch at all
      (6L, ts("2024-01-01 00:00:00"), 3L, "purchase", 30.0),
      // user 1's second purchase: still the same click (touches don't expire
      // on use), lag 2h
      (7L, ts("2024-01-01 03:00:00"), 1L, "purchase", 40.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Observability
      .lastTouchAttribution(ev, "purchase", Seq("click", "view"),
        windowUs = 86400000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out("click") === ((2L, 5000L, Some(1.5 * 3600000000L)))) // mean of 1h, 2h
    assert(out("none") === ((2L, 5000L, None))) // users 2 and 3
    assert(out.size === 2)
  }
}
