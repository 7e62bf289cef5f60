package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream


import graft.streaming.EventStream

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyTypeCounts aggregates watermarked tumbling windows") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.hourlyTypeCounts(input.toDF(), watermark = "10 minutes")

    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("hourly")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:10:00"), 1, "click", 2.0),
      EventStream.Event(2, ts("2024-01-01 00:20:00"), 1, "click", 3.0),
      EventStream.Event(3, ts("2024-01-01 00:30:00"), 2, "view", 1.0))
    query.processAllAvailable()
    // event far enough ahead to advance the watermark past the 00:00 window
    input.addData(EventStream.Event(4, ts("2024-01-01 03:00:00"), 1, "click", 1.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("hourly")
      .collect().map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type")) -> (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toMap
    assert(rows(("2024-01-01 00:00:00.0", "click")) == ((2L, 5.0)))
    assert(rows(("2024-01-01 00:00:00.0", "view")) == ((1L, 1.0)))
  }

  test("decayScoreStream: final streamed scores equal the batch operator's") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.decayScoreStream(input.toDF(), n = 4)

    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("decay")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    // user 1 gets 3 events in batch 1, 2 more (plus a RE-DELIVERY of
    // event 3) in batch 2 — with n=4 only the newest 4 count
    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.00),
      EventStream.Event(2, ts("2024-01-02 00:00:00"), 1, "click", 2.00),
      EventStream.Event(3, ts("2024-01-03 00:00:00"), 1, "click", 3.00))
    query.processAllAvailable()
    input.addData(
      EventStream.Event(3, ts("2024-01-03 00:00:00"), 1, "click", 3.00),
      EventStream.Event(4, ts("2024-01-04 00:00:00"), 1, "click", 4.00),
      EventStream.Event(5, ts("2024-01-05 00:00:00"), 1, "click", 0.50))
    query.processAllAvailable()
    query.stop()

    // latest emitted row per user (append mode emits one per touched batch)
    val last = spark.table("decay").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).last
    val batch = graft.operators.Analytics.decayScores(
      Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.00),
        (2L, ts("2024-01-02 00:00:00"), 1L, 2.00),
        (3L, ts("2024-01-03 00:00:00"), 1L, 3.00),
        (4L, ts("2024-01-04 00:00:00"), 1L, 4.00),
        (5L, ts("2024-01-05 00:00:00"), 1L, 0.50))
        .toDF("event_id", "ts", "user_id", "value"),
      "user_id", "ts", "event_id", "value", n = 4).collect().head
    assert(last == ((1L, batch.getLong(1), batch.getLong(2))),
      s"stream $last vs batch $batch")
    // hand check: newest 4 = (50c*8 + 400c*4 + 300c*2 + 200c*1) = 2800
    assert(last._3 == 2800L)
  }

  test("decayScoreStream: cents conversion matches batch OFF the 2-dp domain") {
    // 1.005 is the canonical trap: the double is 1.00499999…, so naive
    // math.round(v*100) = 100 while Spark's double→decimal(18,2) cast
    // (shortest-repr parse, HALF_UP) yields 101 cents. 2.675 likewise
    // (267.49999… vs 268). The streamed state must take the cast's side.
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.decayScoreStream(input.toDF(), n = 4)
    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("decay3dp")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, 1.005),
      (2L, ts("2024-01-02 00:00:00"), 7L, 2.675),
      (3L, ts("2024-01-03 00:00:00"), 7L, 0.125))
    input.addData(events.map { case (id, t, u, v) =>
      EventStream.Event(id, t, u, "click", v) }: _*)
    query.processAllAvailable()
    query.stop()
    val last = spark.table("decay3dp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).last
    val batch = graft.operators.Analytics.decayScores(
      events.toDF("event_id", "ts", "user_id", "value"),
      "user_id", "ts", "event_id", "value", n = 4).collect().head
    assert(last == ((7L, batch.getLong(1), batch.getLong(2))),
      s"stream $last vs batch $batch")
    // hand check with the cast's cents, weights 2^(n-1-i) newest-first:
    // 13c*8 + 268c*4 + 101c*2 = 1378 (naive rounding would give 12c/267c/
    // 100c → 1364)
    assert(last._3 == 1378L)
  }

  test("malformed values (NaN/Infinity/overflow) skip like the batch " +
      "cast's NULL instead of killing the stream") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.runningTotalsStream(input.toDF())
    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("runningbad")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 9L, "click", 2.50),
      EventStream.Event(2, ts("2024-01-02 00:00:00"), 9L, "click", Double.NaN),
      EventStream.Event(3, ts("2024-01-03 00:00:00"), 9L, "click",
        Double.PositiveInfinity),
      EventStream.Event(4, ts("2024-01-04 00:00:00"), 9L, "click", 1e17),
      EventStream.Event(5, ts("2024-01-05 00:00:00"), 9L, "click", 1.25))
    query.processAllAvailable() // would throw here if centsOf threw
    query.stop()
    val totals = spark.table("runningbad").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // the three malformed events emit rows with the sum unchanged —
    // exactly a batch running sum over (2.50, NULL, NULL, NULL, 1.25)
    assert(totals == Map(1L -> 2.50, 2L -> 2.50, 3L -> 2.50,
      4L -> 2.50, 5L -> 3.75), totals.toString)
  }

  test("runningTotalsStream: cents conversion matches batch OFF the 2-dp domain") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.runningTotalsStream(input.toDF())
    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("running3dp")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 9L, "click", 1.005),
      EventStream.Event(2, ts("2024-01-02 00:00:00"), 9L, "click", 2.675))
    query.processAllAvailable()
    query.stop()
    val totals = spark.table("running3dp").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // cast-cents: 101 then 101+268 = 369 → 1.01, 3.69 (naive rounding
    // would read 1.00 / 3.67)
    assert(totals(1L) == 1.01 && totals(2L) == 3.69, totals.toString)
  }

  test("hllRegisterStream: streamed registers equal the batch builder's") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.hllRegisterStream(input.toDF())

    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("hllregs")
      .outputMode("complete")
      .option("checkpointLocation", chk)
      .start()

    val batch1 = (1 to 300).map(u =>
      EventStream.Event(u, ts("2024-01-01 00:10:00"), u, "click", 1.0))
    val batch2 = (200 to 500).map(u => // overlap 200..300 re-delivers
      EventStream.Event(1000 + u, ts("2024-01-01 01:10:00"), u, "click", 1.0))
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("hllregs").collect()
      .map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mx")).toMap
    import graft.operators.Approx
    val batch = Approx.hllRegisters(
      (1 to 500).map(u => ("click", u.toLong)).toDF("event_type", "user_id"),
      "event_type", "user_id")
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Int]("mx")).toMap
    assert(streamed == batch)
  }

  test("cmsCellStream: streamed cells equal the batch sketch's") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.IngestDoc]
    val out = EventStream.cmsCellStream(input.toDF(), d = 3, w = 64)

    val chk = Files.createTempDirectory("graft-cms-stream").toString
    val query = out.writeStream
      .format("memory").queryName("cmscells")
      .outputMode("complete")
      .option("checkpointLocation", chk)
      .start()

    val texts = (1 to 40).map(i =>
      s"alpha beta tok$i gamma ${if (i % 2 == 0) "delta" else "eps"}")
    input.addData(texts.take(25).zipWithIndex.map { case (t, i) =>
      EventStream.IngestDoc(i.toLong, ts("2024-01-01 00:10:00"), t, "s")
    }: _*)
    query.processAllAvailable()
    input.addData(texts.drop(25).zipWithIndex.map { case (t, i) =>
      EventStream.IngestDoc(100L + i, ts("2024-01-01 01:10:00"), t, "s")
    }: _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("cmscells").collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("b")) -> r.getAs[Long]("v"))
      .toMap
    val batchToks = texts.toDF("text")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("token"))
    val batch = graft.operators.Approx.cmsCells(batchToks, 3, 64).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("b")) -> r.getAs[Long]("v"))
      .toMap
    assert(streamed == batch)
    // constant state: never more than d*w cells however long the stream
    assert(streamed.size <= 3 * 64)
  }

  test("benfordCellStream: streamed digit cells equal the batch timeline's " +
      "across microbatches, sub-1 and NULL values drop") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.benfordCellStream(input.toDF(),
      "event_type", "ts", "value")

    val chk = Files.createTempDirectory("graft-benford-stream").toString
    val query = out.writeStream
      .format("memory").queryName("benfcells")
      .outputMode("complete")
      .option("checkpointLocation", chk)
      .start()

    // values spanning digits 1..9 plus sub-1 rows that must drop
    val mk = (i: Int, day: Int, t: String) => EventStream.Event(
      i.toLong, ts(f"2024-01-$day%02d 10:00:00"), i.toLong, t,
      if (i % 10 == 0) 0.5 else (i % 9 + 1) * math.pow(10, i % 3))
    val evs = (1 to 60).map(i => mk(i, 1 + i % 2, if (i % 3 == 0) "a" else "b"))
    input.addData(evs.take(35): _*)
    query.processAllAvailable()
    input.addData(evs.drop(35): _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("benfcells").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("digit")) -> r.getAs[Long]("n_d")).toMap
    val batch = evs.toDF()
      .where($"value" >= 1)
      .select($"event_type".as("g"), $"ts".cast("date").as("day"),
        graft.operators.Analytics.benfordDigit($"value").as("digit"))
      .groupBy($"g", $"day", $"digit")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_d"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("digit")) -> r.getAs[Long]("n_d")).toMap
    assert(streamed == batch)
    // bounded state: never more than groups x days x 9 cells
    assert(streamed.size <= 2 * 2 * 9)
    // and the shared downstream half turns the cells into the timeline
    val tl = graft.operators.Analytics.benfordTimelineFromCells(
      spark.table("benfcells").localCheckpoint())
      .collect().map(r => (r.getAs[String]("group_key"),
        r.getAs[String]("day")) -> r.getAs[Long]("tv_micro")).toMap
    assert(tl.nonEmpty && tl.values.forall(v => v >= 0L && v <= 1000000L))
  }

  test("heavyHittersStream: SpaceSaving guarantees hold against exact counts " +
      "across microbatches, state bounded at m") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.heavyHittersStream(input.toDF(), m = 4)
    val chk = Files.createTempDirectory("graft-hh-stream").toString
    val query = out.writeStream
      .format("memory").queryName("hh")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    // frequencies: user 1 x20, 2 x10, 3 x6, then a tail of 12 singletons
    // — N = 48, m = 4, so anything with freq > 12 MUST be tracked
    def ev(id: Long, u: Long, minute: Int) =
      EventStream.Event(id, ts(f"2024-01-01 00:$minute%02d:00"), u, "click", 1.0)
    val batch1 = (1 to 12).map(i => ev(i, 1, 1)) ++
      (13 to 18).map(i => ev(i, 2, 2)) ++
      (19 to 24).map(i => ev(i, 100 + i, 3))
    val batch2 = (25 to 32).map(i => ev(i, 1, 11)) ++
      (33 to 36).map(i => ev(i, 2, 12)) ++
      (37 to 42).map(i => ev(i, 3, 13)) ++
      (43 to 48).map(i => ev(i, 200 + i, 14))
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()
    val all = spark.table("hh").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getAs[Long]("n_seen")))
    // per-batch emission is bounded at m rows
    assert(all.length <= 2 * 4)
    // n_seen = Σ est = arrivals folded so far: monotone across the two
    // emissions (24 then 48), so max-n_seen selects the FINAL summary —
    // the selection rule the q_stream_spacesaving driver row drains by
    assert(all.map(_._6).toSet == Set(24L, 48L))
    val latest = all.filter(_._6 == 48L)
    assert(latest.length == 4)
    val trueCount = Map(1L -> 20L, 2L -> 10L, 3L -> 6L)
      .withDefaultValue(1L)
    latest.foreach { case (_, item, est, err, _, _) =>
      assert(est >= trueCount(item), s"underestimate for $item")
      assert(est - err <= trueCount(item), s"est-err overshoot for $item")
    }
    // freq > N/m = 12: users 1 (20) MUST be tracked; user 2 (10) and
    // 3 (6) fit comfortably in m=4 here too
    assert(latest.exists(_._2 == 1L))
    assert(latest.find(_._2 == 1L).get._3 == 20L) // tracked from batch 1: exact
  }

  test("kmvRegisterStream: bottom-k register file absorbs re-delivery, " +
      "final state equals the bottom-k of all hashes, bounded at k") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val k = 4
    val input = MemoryStream[(String, Long)]
    val out = EventStream.kmvRegisterStream(
      input.toDF().toDF("g", "hc"), k)
    val chk = Files.createTempDirectory("graft-kmv-stream").toString
    val query = out.writeStream
      .format("memory").queryName("kmvreg")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    // batch 1: hashes 50,40,30,20,10 -> state {10,20,30,40};
    // batch 2 re-delivers 20 (no-op by the set law) and adds 5, 35
    // -> final state {5,10,20,30}
    input.addData(Seq(("a", 50L), ("a", 40L), ("a", 30L), ("a", 20L),
      ("a", 10L)): _*)
    query.processAllAvailable()
    input.addData(Seq(("a", 20L), ("a", 5L), ("a", 35L)): _*)
    query.processAllAvailable()
    query.stop()
    val all = spark.table("kmvreg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(all.length <= 2 * k) // emission bound per touched batch
    // final emission = last k rows; equals bottom-k of the union
    val fin = all.takeRight(k).map(t => (t._2, t._3)).toSet
    assert(fin == Set((1L, 5L), (2L, 10L), (3L, 20L), (4L, 30L)),
      s"got $fin")
    // the emission-log re-derivation (the driver row's drain rule):
    // distinct hashes across ALL emissions, re-ranked, bottom-k
    val rederived = all.map(_._3).distinct.sorted.take(k).toSet
    assert(rederived == Set(5L, 10L, 20L, 30L))
  }

  test("groupSampleStream: final sample equals Sampling.groupSample across " +
      "microbatches with a planted re-delivery, state bounded at k") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val k = 3
    val input = MemoryStream[(Long, String)]
    val out = EventStream.groupSampleStream(
      input.toDF().toDF("doc_id", "source"), k)
    val chk = Files.createTempDirectory("graft-gsample-stream").toString
    val query = out.writeStream
      .format("memory").queryName("gsample")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    val batch1 = (1L to 8L).map(i => (i, "web")) ++
      (101L to 104L).map(i => (i, "books"))
    // batch 2 re-delivers doc 3 (at-least-once source) and adds new rows
    val batch2 = (9L to 14L).map(i => (i, "web")) ++ Seq((3L, "web")) ++
      (105L to 110L).map(i => (i, "books"))
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()
    val all = spark.table("gsample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // each touched group emits <= k rows per microbatch
    assert(all.length <= 2 * 2 * k)
    // final snapshot = the last emission per group
    val finalRows = all.zipWithIndex.groupBy(_._1._1).map { case (_, rows) =>
      val lastRank1 = rows.filter(_._1._3 == 1L).map(_._2).max
      rows.filter(_._2 >= lastRank1).map(_._1)
    }.flatten.toSet
    val allDocs = (batch1 ++ batch2).toDF("doc_id", "source")
    val expected = graft.operators.Sampling
      .groupSample(allDocs, "source", k).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank"))).toSet
    assert(finalRows == expected,
      s"stream $finalRows != batch $expected")
    assert(finalRows.count(_._1 == "web") == k) // state/emission bound
  }

  test("dedupStream drops re-delivered events within the watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.dedupStream(input.toDF(), "10 minutes", Seq("event_id"))

    val chk = Files.createTempDirectory("graft-dedup-stream").toString
    val query = out.writeStream
      .format("memory").queryName("deduped")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:10:00"), 1, "click", 2.0),
      EventStream.Event(1, ts("2024-01-01 00:10:00"), 1, "click", 2.0), // same-batch dup
      EventStream.Event(2, ts("2024-01-01 00:11:00"), 1, "view", 1.0))
    query.processAllAvailable()
    // re-delivery in a later microbatch, still inside the watermark
    input.addData(EventStream.Event(1, ts("2024-01-01 00:12:00"), 1, "click", 2.0))
    query.processAllAvailable()
    query.stop()

    val ids = spark.table("deduped").collect().map(_.getAs[Long]("event_id")).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("enriched joins the stream against a broadcast static dimension") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val out = EventStream.enriched(input.toDF(), dim, "user_id")

    val chk = Files.createTempDirectory("graft-stream3").toString
    val query = out.writeStream
      .format("memory").queryName("enriched_events")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 00:00:10"), 9, "click", 1.0)) // no dim row
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("enriched_events")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
    assert(rows == Map(1L -> "gold")) // inner join drops user 9
  }

  test("stream-stream interval join attributes errors to recent clicks") {
    implicit val sq = spark.sqlContext
    val errIn = MemoryStream[(Long, Timestamp)]
    val clickIn = MemoryStream[(Long, Timestamp, Double)]
    val out = EventStream.attributeToRecent(
      errIn.toDF().toDF("err_user", "err_ts"),
      clickIn.toDF().toDF("click_user", "click_ts", "click_value"),
      watermark = "10 minutes", lookback = "30 MINUTES")

    val chk = Files.createTempDirectory("graft-ssj").toString
    val q = out.writeStream.format("memory").queryName("attributed")
      .outputMode("append").option("checkpointLocation", chk).start()

    clickIn.addData((1L, ts("2024-01-01 00:00:00"), 5.0),
      (1L, ts("2024-01-01 01:00:00"), 7.0))
    errIn.addData((1L, ts("2024-01-01 00:10:00"))) // within 30m of click#1 only
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attributed")
      .collect().map(r => (r.getAs[Long]("err_user"), r.getAs[Double]("click_value")))
    assert(rows.toSeq == Seq((1L, 5.0)))
  }

  test("foreachBatch upsert sink lands microbatches into the RDB idempotently") {
    implicit val sq = spark.sqlContext
    val url = s"jdbc:derby:memory:graftstream_${System.identityHashCode(this)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE sink_target (event_id BIGINT, value DOUBLE)")
    conn.close()

    val input = MemoryStream[(Long, Double)]
    val chk = Files.createTempDirectory("graft-sink").toString
    val q = EventStream.upsertSink(input.toDF().toDF("event_id", "value"),
      url, "sink_target", keys = Seq("event_id"), checkpoint = chk)
    input.addData((1L, 1.0), (2L, 2.0))
    q.processAllAvailable()
    input.addData((2L, 9.0), (3L, 3.0)) // re-keyed row must replace, not append
    q.processAllAvailable()
    q.stop()

    val rows = graft.sources.Rdb.readQuery(spark, url,
      "SELECT event_id, value FROM sink_target")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == Map(1L -> 1.0, 2L -> 9.0, 3L -> 3.0))
  }

  test("sessionize tracks per-user state across a microbatch") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.sessionize(input.toDF(), gapMs = 0)

    val chk = Files.createTempDirectory("graft-stream2").toString
    val query = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 00:00:45"), 7, "view", 1.0))
    query.processAllAvailable()
    query.stop()

    val r = spark.table("sessions").where($"user_id" === 7).head()
    assert(r.getAs[Long]("n_events") == 2)
    assert(r.getAs[Long]("duration_us") == 45000000L)
    assert(!r.getAs[Boolean]("closed"))
  }

  test("semDedupStream admits representatives and drops near-dups across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Vec]
    val centroids = Seq(Seq(8.0f, 0.0f), Seq(0.0f, 8.0f))
    val out = EventStream.semDedupStream(input.toDF(), centroids,
      minCosine = 0.999, maxRepsPerCell = 16)

    val chk = Files.createTempDirectory("graft-stream3").toString
    val query = out.writeStream
      .format("memory").queryName("semdedup")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    input.addData(
      EventStream.Vec(1, Array(8.0f, 0.0f)),   // admitted, cell 0
      EventStream.Vec(2, Array(8.0f, 0.0f)),   // dup of 1 (same batch)
      EventStream.Vec(3, Array(0.0f, 8.0f)))   // admitted, cell 1
    query.processAllAvailable()
    input.addData(
      EventStream.Vec(4, Array(8.0f, 0.001f)), // dup of 1 (later batch, state)
      EventStream.Vec(5, Array(0.0f, 9.0f)))   // dup of 3
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("semdedup").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("kept"), r.getAs[Long]("dup_of"))).toMap
    assert(rows(1L) == ((true, -1L)))
    assert(rows(2L) == ((false, 1L)))
    assert(rows(3L) == ((true, -1L)))
    assert(rows(4L) == ((false, 1L)))
    assert(rows(5L) == ((false, 3L)))
  }

  test("corpus-ingest chain: decontam gate -> streaming dedup -> foreachBatch sink") {
    // the streaming twin of the batch corpus-prep front half, end to end:
    // gates and dedup run INSIDE the stream, the sink lands survivors
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.IngestDoc]
    val bench = Seq((900L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val out = EventStream.corpusIngestStream(input.toDF(), bench, n = 8,
      minTokens = 3, maxHitRatio = 0.2, watermark = "1 hour")

    val root = Files.createTempDirectory("graft-ingest").toString
    val query = out.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("doc_id", "source", "n_tokens")
          .write.mode("append").parquet(s"$root/landed")
      }
      .start()

    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    input.addData(
      EventStream.IngestDoc(1L, ts("2024-05-01 10:00:00"), clean, "s0"),
      // contaminated: the benchmark text itself (hit_ratio 1.0 > 0.2)
      EventStream.IngestDoc(2L, ts("2024-05-01 10:00:01"),
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "s0"),
      // too short for the length gate
      EventStream.IngestDoc(3L, ts("2024-05-01 10:00:02"), "a b", "s0"),
      // exact duplicate of doc 1, same microbatch
      EventStream.IngestDoc(4L, ts("2024-05-01 10:00:03"), clean, "s1"))
    query.processAllAvailable()
    input.addData(
      // exact duplicate of doc 1, LATER microbatch — cross-batch state
      EventStream.IngestDoc(5L, ts("2024-05-01 10:05:00"), clean, "s2"),
      // novel clean doc
      EventStream.IngestDoc(6L, ts("2024-05-01 10:05:01"),
        "rho sigma tau phi chi psi omega mu nu xi", "s1"))
    query.processAllAvailable()
    query.stop()

    val landed = spark.read.parquet(s"$root/landed")
      .collect().map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    // exactly one copy of the clean text (doc 1 — first within the batch
    // after arrival normalization), plus the novel doc 6; the
    // contaminated, short, and duplicate docs never reach the sink
    assert(landed == Seq(1L, 6L))
  }

  test("ingest gate + dup alerts against a static signature index") {
    implicit val sq = spark.sqlContext
    val indexed = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val index = graft.operators.Ingest.signatureIndex(
      Seq((100L, indexed)).toDF("doc_id", "text"), 64).localCheckpoint()

    val input = MemoryStream[EventStream.IngestDoc]
    val docs = input.toDF().select($"doc_id", $"ts", $"text")
    val gateRoot = Files.createTempDirectory("graft-gate").toString
    val gate = EventStream.ingestExactGate(docs, index).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$gateRoot/chk")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").write.mode("append").parquet(s"$gateRoot/out")
      }.start()
    val alerts = EventStream.ingestDupAlerts(docs, index,
      k = 64, bands = 16, minSim = 0.5, watermark = "1 hour").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$gateRoot/achk")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id", "verdict", "matched_id")
          .write.mode("append").parquet(s"$gateRoot/alerts")
      }.start()

    input.addData(
      // exact copy of the index doc: blocked at the gate, exact alert
      EventStream.IngestDoc(10L, ts("2024-05-01 10:00:00"), indexed, "s0"),
      // near copy (truncated): PASSES the exact-only gate, near alert
      EventStream.IngestDoc(11L, ts("2024-05-01 10:00:01"),
        indexed.dropRight(30), "s0"),
      // fresh doc: passes, no alert
      EventStream.IngestDoc(12L, ts("2024-05-01 10:00:02"),
        "rho sigma tau phi chi psi omega mu nu xi " * 5, "s0"))
    gate.processAllAvailable(); alerts.processAllAvailable()
    gate.stop(); alerts.stop()

    val passed = spark.read.parquet(s"$gateRoot/out")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(passed == Seq(11L, 12L))
    val alerted = spark.read.parquet(s"$gateRoot/alerts")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("matched_id"))).toMap
    assert(alerted == Map(
      10L -> ("exact_index", 100L),
      11L -> ("near_index", 100L)))
  }

  test("vector gate + dup alerts against a static vector index") {
    implicit val sq = spark.sqlContext
    val a = Array(1.0f, 0.1f, 0.0f, 0.0f)
    val b = Array(0.0f, 0.1f, 1.0f, 0.0f)
    val c = Array(0.0f, 1.0f, 0.1f, 0.0f) // fresh direction
    def scale(v: Array[Float]) = v.map(x => (x * 1.01).toFloat)
    val idx0 = Seq((100L, a), (101L, b)).toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.train(idx0, k = 2, iters = 1)
    val index = graft.operators.Similarity.vectorIndex(idx0, centroids)
      .localCheckpoint()

    val input = MemoryStream[EventStream.VecDoc]
    val vecs = input.toDF().select($"vec_id", $"ts", $"embedding")
    val root = Files.createTempDirectory("graft-vecgate").toString
    val gate = EventStream.vecIngestGate(vecs, index).writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch { (bd: org.apache.spark.sql.DataFrame, _: Long) =>
        bd.select("vec_id").write.mode("append").parquet(s"$root/out")
      }.start()
    val alerts = EventStream.vecDupAlerts(vecs, index, centroids,
      minCosine = 0.95, nprobe = 2, watermark = "1 hour").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/achk")
      .foreachBatch { (bd: org.apache.spark.sql.DataFrame, _: Long) =>
        bd.select("vec_id", "verdict", "matched_id")
          .write.mode("append").parquet(s"$root/alerts")
      }.start()

    input.addData(
      // bitwise copy of index vector 100: blocked at the gate, exact alert
      EventStream.VecDoc(10L, ts("2024-05-01 10:00:00"), a),
      // near copy: PASSES the exact-only gate, near alert
      EventStream.VecDoc(11L, ts("2024-05-01 10:00:01"), scale(a)),
      // fresh vector: passes, no alert
      EventStream.VecDoc(12L, ts("2024-05-01 10:00:02"), c))
    gate.processAllAvailable(); alerts.processAllAvailable()
    gate.stop(); alerts.stop()

    val passed = spark.read.parquet(s"$root/out")
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(passed == Seq(11L, 12L))
    val alerted = spark.read.parquet(s"$root/alerts")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("verdict"), r.getAs[Long]("matched_id"))).toMap
    assert(alerted == Map(
      10L -> ("exact_index", 100L),
      11L -> ("near_index", 100L)))
  }

  test("dup alerts: same doc_id re-arriving with DIFFERENT content still alerts") {
    // the alert dedup is keyed (doc_id, text_hash), not doc_id alone: a
    // re-crawled id carrying new near-dup content inside the watermark
    // window must alert for the new content; only a literal re-arrival
    // of the SAME content is suppressed
    implicit val sq = spark.sqlContext
    val idxA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val idxB = "rho sigma tau phi chi psi omega mu nu xi " * 5
    val index = graft.operators.Ingest.signatureIndex(
      Seq((200L, idxA), (201L, idxB)).toDF("doc_id", "text"), 64).localCheckpoint()

    val input = MemoryStream[EventStream.IngestDoc]
    val docs = input.toDF().select($"doc_id", $"ts", $"text")
    val root = Files.createTempDirectory("graft-realert").toString
    val alerts = EventStream.ingestDupAlerts(docs, index,
      k = 64, bands = 16, minSim = 0.5, watermark = "1 hour").writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id", "verdict", "matched_id")
          .write.mode("append").parquet(s"$root/alerts")
      }.start()

    input.addData(
      EventStream.IngestDoc(42L, ts("2024-05-01 10:00:00"), idxA.dropRight(30), "s0"))
    alerts.processAllAvailable()
    input.addData(
      // same id, DIFFERENT near-dup content, well inside the watermark
      EventStream.IngestDoc(42L, ts("2024-05-01 10:00:05"), idxB.dropRight(30), "s0"),
      // same id, SAME content as the first arrival — suppressed
      EventStream.IngestDoc(42L, ts("2024-05-01 10:00:06"), idxA.dropRight(30), "s0"))
    alerts.processAllAvailable()
    alerts.stop()

    val near = spark.read.parquet(s"$root/alerts")
      .where($"verdict" === "near_index")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_id")))
      .sortBy(_._2).toSeq
    assert(near == Seq((42L, 200L), (42L, 201L)), s"got $near")
  }

  test("staged two-file AvailableNow running totals equal the batch " +
      "window replay, state crossing the batch boundary " +
      "(the q_stream_running contract)") {
    import org.apache.spark.sql.functions.{col, lit}
    val evs = Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.10),
      EventStream.Event(2, ts("2024-01-01 11:00:00"), 1, "a", 2.20),
      EventStream.Event(3, ts("2024-01-02 09:00:00"), 1, "a", 0.70), // file 2
      EventStream.Event(4, ts("2024-01-01 10:30:00"), 2, "a", 5.00),
      EventStream.Event(5, ts("2024-01-02 10:00:00"), 2, "a", 0.25)) // file 2
    val df = evs.toDF()
      .select("event_id", "ts", "user_id", "event_type", "value")
    val base = Files.createTempDirectory("graft-run2p").toString
    EventStream.stageTwoPhase(df,
      col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"), base)
    val got = EventStream.drainAvailableNow(
      EventStream.runningTotalsStream(
        spark.readStream.schema(df.schema)
          .option("maxFilesPerTrigger", 1).parquet(base)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // user 1's third event continues from the 3.30 carried across the
    // batch boundary in exact cents
    assert(got == Map(1L -> 1.10, 2L -> 3.30, 3L -> 4.00,
      4L -> 5.00, 5L -> 5.25))
  }

  test("staged two-file AvailableNow drain emits exactly the batch bars " +
      "below max(ts) - delay (the q_stream_ohlc contract)") {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    val evs = Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 5.0),
      EventStream.Event(2, ts("2024-01-01 10:40:00"), 1, "click", 9.0),
      EventStream.Event(3, ts("2024-01-01 11:15:00"), 2, "click", 1.0),
      EventStream.Event(4, ts("2024-01-01 13:30:00"), 1, "click", 7.0), // batch 2
      EventStream.Event(5, ts("2024-01-01 16:30:30"), 1, "click", 2.0)) // batch 2
    val df = evs.toDF().select(col("event_id"), col("ts"),
      col("event_type"), col("value"))
    val base = Files.createTempDirectory("graft-ohlc2p").toString
    EventStream.stageTwoPhase(df,
      col("ts") < lit("2024-01-01 12:00:00").cast("timestamp"), base)
    // two files, early one older
    val files = new java.io.File(base).listFiles.sortBy(_.getName)
    assert(files.map(_.getName).toSeq == Seq("1_early.parquet", "2_late.parquet"))
    assert(files(0).lastModified < files(1).lastModified)
    val stream = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(base)
    val got = EventStream.drainAvailableNow(
      EventStream.ohlcStream(stream, watermark = "2 hours"))
      .select(unix_micros(col("window_start")), col("event_type"),
        col("open"), col("close"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    // final watermark = 16:30:30 - 2h = 14:30:30 -> the 10:00, 11:00 and
    // 13:00 windows flush; 16:00 stays open
    val want = Map(
      (ts("2024-01-01 10:00:00").getTime * 1000L, "click") -> (5.0, 9.0, 2L),
      (ts("2024-01-01 11:00:00").getTime * 1000L, "click") -> (1.0, 1.0, 1L),
      (ts("2024-01-01 13:00:00").getTime * 1000L, "click") -> (7.0, 7.0, 1L))
    assert(got == want)
  }

  test("the emitted set is state-store-provider independent: RocksDB " +
      "and the HDFS session default (what the registered rows use) " +
      "drain identical rows (r14 judge item 5)") {
    import org.apache.spark.sql.functions.{col, lit}
    // the running-totals stream carries KEYED STATE across the staged
    // batch boundary — the shape where a provider-dependent bug would
    // show: a value served stale from one provider moves a prefix sum
    val evs = Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.10),
      EventStream.Event(2, ts("2024-01-01 11:00:00"), 1, "a", 2.20),
      EventStream.Event(3, ts("2024-01-02 09:00:00"), 1, "a", 0.70),
      EventStream.Event(4, ts("2024-01-01 10:30:00"), 2, "a", 5.00),
      EventStream.Event(5, ts("2024-01-02 10:00:00"), 2, "a", 0.25))
    val df = evs.toDF()
      .select("event_id", "ts", "user_id", "event_type", "value")
    val base = Files.createTempDirectory("graft-prov").toString
    EventStream.stageTwoPhase(df,
      col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"), base)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    def drain(provider: Option[String]) = EventStream.drainAvailableNow(
      EventStream.runningTotalsStream(
        spark.readStream.schema(df.schema)
          .option("maxFilesPerTrigger", 1).parquet(base)), provider)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val rocks = drain(Some(EventStream.RocksDbProvider))
    val hdfs = drain(None) // session default = the HDFS-backed provider
    assert(rocks == hdfs && rocks.nonEmpty,
      s"provider-dependent emission: rocksdb $rocks vs hdfs $hdfs")
    // and the drain restored the session conf (no provider leak —
    // getOption surfaces the registered default, so compare to before)
    assert(spark.conf.getOption(key) == before)
  }

  test("ohlcStream bars equal the batch ohlcBars over the same events") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{col, unix_micros}
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.ohlcStream(input.toDF(), watermark = "10 minutes")
    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("ohlc")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    val evs = Seq(
      EventStream.Event(2, ts("2024-01-01 10:00:00"), 1, "click", 9.0), // open tie: id 1 wins
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 5.0),
      EventStream.Event(3, ts("2024-01-01 10:30:00"), 2, "click", 1.0),
      EventStream.Event(4, ts("2024-01-01 10:59:00"), 1, "click", 7.0))
    input.addData(evs: _*)
    query.processAllAvailable()
    // advance the watermark past the 10:00 window so the bar emits
    input.addData(EventStream.Event(5, ts("2024-01-01 13:00:00"), 1, "click", 2.0))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("ohlc")
      .select(unix_micros(col("window_start")).as("bucket_us"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    import spark.implicits._
    val batch = graft.operators.Analytics.ohlcBars(
      evs.toDF(), "event_type", "ts", "event_id", "value", "hour")
      .collect().map(r => (r.getLong(1), r.getString(0)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    // evs holds only the 10:00-hour events, so the batch result is exactly
    // the set of closed windows the stream must have emitted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("runningTotalsStream carries exact-cents cumulative state across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.runningTotalsStream(input.toDF())
    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("running")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    // batch 1: out-of-order arrival within the batch must apply in ts order
    input.addData(
      EventStream.Event(2, ts("2024-01-01 00:02:00"), 1, "click", 0.2),
      EventStream.Event(1, ts("2024-01-01 00:01:00"), 1, "click", 0.1),
      EventStream.Event(3, ts("2024-01-01 00:01:00"), 2, "view", 5.0))
    query.processAllAvailable()
    // batch 2: state continues from 0.3 (not 0.30000000000000004 — cents)
    input.addData(EventStream.Event(4, ts("2024-01-01 00:03:00"), 1, "click", 0.3))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("running")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[Double]("running_sum"))).toMap
    assert(rows(1L) === ((1L, 0.1)))
    assert(rows(2L) === ((1L, 0.3)))  // 0.1+0.2 exact in cents
    assert(rows(3L) === ((2L, 5.0)))
    assert(rows(4L) === ((1L, 0.6)))  // cross-batch continuation
  }

  test("runningTotalsStream folds SAME-MILLISECOND events in true " +
      "microsecond order, not getTime-tie event_id order") {
    implicit val sq = spark.sqlContext
    // two events of one user inside one millisecond, with event_id order
    // OPPOSING micros order: a getTime (millis) sort would tie and fall
    // through to event_id, swapping the prefix sums vs the batch replay
    val t9 = ts("2024-01-01 00:00:00"); t9.setNanos(100000)  // .000100
    val t4 = ts("2024-01-01 00:00:00"); t4.setNanos(900000)  // .000900
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.runningTotalsStream(input.toDF())
    val chk = Files.createTempDirectory("graft-stream").toString
    val query = out.writeStream
      .format("memory").queryName("running_us")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(
      EventStream.Event(4, t4, 1, "click", 2.00),
      EventStream.Event(9, t9, 1, "click", 1.00))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("running_us")
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Double]("running_sum")).toMap
    // micros order: id 9 (.000100) folds before id 4 (.000900)
    assert(rows == Map(9L -> 1.00, 4L -> 3.00))
  }

  test("lastTouchStream credits purchases like the batch operator across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val out = EventStream.lastTouchStream(input.toDF(),
      purchaseType = "purchase", touchTypes = Set("click", "view"),
      windowUs = 86400000000L)

    val chk = Files.createTempDirectory("graft-attr").toString
    val query = out.writeStream
      .format("memory").queryName("attributions")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()

    input.addData(
      EventStream.Event(1, ts("2024-01-01 00:00:00"), 7, "view", 1.0),
      EventStream.Event(2, ts("2024-01-01 01:00:00"), 7, "click", 1.0),
      EventStream.Event(3, ts("2024-01-01 02:00:00"), 7, "purchase", 10.0),
      EventStream.Event(4, ts("2024-01-01 00:00:00"), 8, "purchase", 5.0))
    query.processAllAvailable()
    // batch 2: the click state must survive the epoch; a 30h-later
    // purchase falls outside the 24h window
    input.addData(
      EventStream.Event(5, ts("2024-01-01 03:00:00"), 7, "purchase", 2.0),
      EventStream.Event(6, ts("2024-01-02 08:00:00"), 7, "purchase", 1.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("attributions")
      .collect().map(r => r.getLong(1) -> (r.getString(2), r.getLong(3))).toMap
    assert(rows(3L) === (("click", 3600000000L)))
    assert(rows(4L) === (("none", -1L)))        // no touch at all
    assert(rows(5L) === (("click", 7200000000L))) // state crossed the epoch
    assert(rows(6L) === (("none", -1L)))        // outside the 24h window
    assert(rows.size === 4)

    // the same events through the batch operator give the same credits
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0),
      (2L, ts("2024-01-01 01:00:00"), 7L, "click", 1.0),
      (3L, ts("2024-01-01 02:00:00"), 7L, "purchase", 10.0),
      (4L, ts("2024-01-01 00:00:00"), 8L, "purchase", 5.0),
      (5L, ts("2024-01-01 03:00:00"), 7L, "purchase", 2.0),
      (6L, ts("2024-01-02 08:00:00"), 7L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = graft.operators.Observability
      .lastTouchAttribution(batch, "purchase", Seq("click", "view"),
        windowUs = 86400000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamAgg = rows.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(agg === streamAgg)
  }

  test("tableDigestStream: streamed per-partition triples equal the batch " +
      "tableDigest across microbatches, incl. NULLs and a re-keyed part") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[(String, String, String)]
    val hashed = input.toDF().toDF("part", "a", "b")
      .select(col("part"),
        graft.validation.Reconcile.canonRowHash(Seq(col("a"), col("b")))
          .as("h"))
    val out = EventStream.tableDigestStream(hashed)
    val chk = Files.createTempDirectory("graft-digest-stream").toString
    val query = out.writeStream
      .format("memory").queryName("digests")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    val batch1 = Seq(("p1", "x", "y"), ("p1", "p", "q"), ("p2", "m", "n"))
    val batch2 = Seq(("p1", "z", null: String), ("p3", "k", "l"),
      ("p2", "m", "n")) // p2 gets a genuine duplicate row in batch 2
    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()
    // newest emission per part = the final streamed triple
    val streamed = spark.table("digests").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    val batch = graft.validation.Reconcile.tableDigest(
      (batch1 ++ batch2).toDF("part", "a", "b"), col("part"),
      Seq(col("a"), col("b")))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_digest"),
          r.getAs[Long]("sum_digest"))).toMap
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed("p2")._1 == 2L) // the duplicate counted, xor cancelled
  }

  test("quantileStateStream: streamed bottom-k state equals the batch " +
      "sketch across microbatches, absorbing a re-delivered row") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // (g, ts-day, id, value): 2 days x 8 rows, k=4 forces selection
    val all = (0 until 16).map { i =>
      ("m", if (i % 2 == 0) "2024-05-01" else "2024-05-02",
        i.toLong, (i * 37 % 100) / 100.0 * 50 + 1.0)
    }
    val input = MemoryStream[(String, String, Long, Double)]
    val hashed = input.toDF().toDF("g", "day", "id", "value")
      .select(col("g"), col("day"),
        graft.operators.Approx.quantileSketchHash(col("id")).as("hk"),
        col("id"), (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("v"))
    val out = EventStream.quantileStateStream(hashed, k = 4)
    val chk = Files.createTempDirectory("graft-qsk-stream").toString
    val query = out.writeStream
      .format("memory").queryName("qsk_states")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(all.take(7): _*)
    query.processAllAvailable()
    // batch 2 re-delivers row 3 (at-least-once) — must be absorbed
    input.addData((all.drop(7) :+ all(3)): _*)
    query.processAllAvailable()
    query.stop()
    // newest emission per (g, day, rk) = the final streamed state
    val streamed = spark.table("qsk_states").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    // the batch sketch of the same rows, via quantileSketchDaily
    val batchDf = all.toDF("g", "ts", "id", "value")
      .select(col("g"), col("ts").cast("timestamp").as("ts"),
        col("id"), col("value"))
    val batch = graft.operators.Approx.quantileSketchDaily(
      batchDf, "g", "ts", "id", "value", k = 4).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("rk")) ->
        (r.getAs[Long]("hk"), r.getAs[Long]("id"), r.getAs[Long]("v")))
      .toMap
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed.keySet.count(_._2 == "2024-05-01") == 4) // k-bounded
  }

  test("columnDigestStream: live per-column triples equal the batch " +
      "columnDigest scan, and a planted divergence localizes to exactly " +
      "the corrupted (part, column)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode, array, struct, lit}
    def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val source: Seq[(String, String, java.lang.Long)] = Seq(
      ("p1", "x", jl(10L)), ("p1", "y", jl(20L)), ("p2", "m", jl(30L)),
      ("p2", "n", null), ("p3", "k", jl(50L)))
    // the replica stream diverges in ONE column of ONE partition: p2's
    // numeric field is corrupted, its string field intact
    val replica = source.map {
      case (p, a, b) if p == "p2" && b != null =>
        (p, a, jl(b.longValue + 1L))
      case r => r
    }
    // the long-form (part, column, h) projection — the SAME expression
    // tree on the stream side as the batch law uses, hashes via the
    // shared Reconcile.canonColumnHash
    def longForm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("part"), explode(array(
        struct(lit("a").as("column"),
          graft.validation.Reconcile.canonColumnHash("a", col("a")).as("h")),
        struct(lit("b").as("column"),
          graft.validation.Reconcile.canonColumnHash("b", col("b")).as("h"))))
        .as("c"))
        .select(col("part"), col("c.column").as("column"), col("c.h").as("h"))
    val input = MemoryStream[(String, String, java.lang.Long)]
    val out = EventStream.columnDigestStream(
      longForm(input.toDF().toDF("part", "a", "b")))
    val chk = Files.createTempDirectory("graft-coldigest-stream").toString
    val query = out.writeStream
      .format("memory").queryName("col_digests")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(replica.take(2): _*)
    query.processAllAvailable()
    input.addData(replica.drop(2): _*)
    query.processAllAvailable()
    query.stop()
    def tripleMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    val streamed = tripleMap(spark.table("col_digests").collect())
    // law 1: the live triples equal the batch columnDigest scan of the
    // same (replica) rows — stream == batch, per column
    val replicaBatch = tripleMap(graft.validation.Reconcile.columnDigest(
      replica.toDF("part", "a", "b"), col("part"),
      Seq("a" -> col("a"), "b" -> col("b"))).collect()
      .map(r => org.apache.spark.sql.Row(r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(streamed == replicaBatch,
      s"streamed $streamed vs batch $replicaBatch")
    // law 2: against the SOURCE's batch per-column digests, the ONLY
    // diverging cell is the corrupted (p2, b) — the drill-down answer
    // was already live in the stream state
    val sourceBatch = tripleMap(graft.validation.Reconcile.columnDigest(
      source.toDF("part", "a", "b"), col("part"),
      Seq("a" -> col("a"), "b" -> col("b"))).collect()
      .map(r => org.apache.spark.sql.Row(r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))))
    val diverged = sourceBatch.keySet.filter(k => streamed(k) != sourceBatch(k))
    assert(diverged == Set(("p2", "b")), s"diverged cells: $diverged")
  }

  test("sessionStream: a session SPANNING the two staged files merges " +
      "across micro-batches, and only watermark-cleared sessions emit") {
    import org.apache.spark.sql.functions.{col, lit}
    // user 1: events at 11:50 (file 1) and 12:10 (file 2) — 20 min gap,
    // ONE session across the batch boundary. user 2: a closed early
    // session plus a too-fresh session inside the 2h watermark horizon
    // of the max event (18:00) that must stay open.
    val evs = Seq(
      EventStream.Event(1, ts("2024-01-01 11:50:00"), 1, "a", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:00:00"), 2, "a", 1.0),
      EventStream.Event(3, ts("2024-01-01 12:10:00"), 1, "a", 1.0), // file 2
      EventStream.Event(4, ts("2024-01-01 17:30:00"), 2, "a", 1.0), // open
      EventStream.Event(5, ts("2024-01-01 18:00:00"), 3, "a", 1.0)) // wm anchor
    val df = evs.toDF().select("user_id", "ts")
    val base = Files.createTempDirectory("graft-sess2p").toString
    EventStream.stageTwoPhase(df,
      col("ts") < lit("2024-01-01 12:00:00").cast("timestamp"), base)
    val got = EventStream.drainAvailableNow(
      EventStream.sessionStream(
        spark.readStream.schema(df.schema)
          .option("maxFilesPerTrigger", 1).parquet(base),
        gap = "30 minutes", watermark = "2 hours"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    def us(s: String) = ts(s).getTime * 1000L
    // watermark = 18:00 - 2h = 16:00; emitted sessions need
    // last + 30min <= 16:00. user 1's spanning session (ends 12:10)
    // emits MERGED (2 events, one row); user 2's 10:00 singleton emits;
    // the 17:30 and 18:00 sessions stay open.
    assert(got === Set(
      (1L, us("2024-01-01 11:50:00"), 2L),
      (2L, us("2024-01-01 10:00:00"), 1L)))
  }
}
