package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-event analytics re-expressed as window functions.
  *
  * Reference: etl/utils/observability.py:113 (RunAnalyzer.get_step_durations)
  * pairs STEP_START with the following STEP_SUCCESS/FAILURE by scanning the
  * event log in a driver-side dict — inherently single-node. Spark-first:
  * a window over (entity, time) computes every pairing in one shuffle,
  * partitioned by the entity key so it scales with the number of entities.
  */
object Observability {

  /** Per-entity event durations: each event paired with its successor.
    * Emits exact integer microsecond arithmetic (no float drift).
    */
  def eventDurations(events: DataFrame, entityCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col("start_us"), col("event_id"))
    events
      .select(
        col(entityCol),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("start_us"))
      .withColumn("end_us", lead(col("start_us"), 1).over(w))
      .withColumn("next_event_type", lead(col("event_type"), 1).over(w))
      .where(col("end_us").isNotNull)
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Status-matched step durations — the reference's exact pairing
    * semantics (etl/utils/observability.py:113-159): a START event arms
    * the step; the next SUCCESS/FAILURE event of the same entity closes it
    * with `status` = success/failure, `start` = the latest strictly
    * preceding START (NULL start -> NULL duration, emitted anyway, exactly
    * like the reference's `starts.get(step_key)` miss). The driver-side
    * dict scan becomes one window over (entity, time) — a single shuffle
    * partitioned by entity.
    */
  def stepDurationsStatus(events: DataFrame, entityCol: String,
      startType: String, successType: String, failureType: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("end_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .where(col("event_type").isin(startType, successType, failureType))
      .select(col(entityCol), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("end_us"))
      .withColumn("start_us",
        last(when(col("event_type") === startType, col("end_us")),
          ignoreNulls = true).over(w))
      .where(col("event_type").isin(successType, failureType))
      .select(col(entityCol), col("event_id"),
        when(col("event_type") === successType, lit("success"))
          .otherwise(lit("failure")).as("status"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
  }

  /** Run-level metadata summary (etl/utils/observability.py:36-47,
    * get_run_metadata: run_id / job_name / status / tags): one row per
    * run — id, start/end/duration, event count, failure count, derived
    * status (any error event fails the run), and the sorted distinct
    * event-type set as the tags analog. The reference looks up ONE run
    * in the orchestrator's DB; the batch dual summarizes every run in a
    * single run-keyed aggregate with map-side partials — no window, no
    * join, one shuffle sized by the number of runs.
    */
  def runMetadata(events: DataFrame, entityCol: String): DataFrame = {
    val nErrors = count(when(col("event_type") === "error", 1))
    events
      .select(col(entityCol).as("run_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .groupBy(col("run_id"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        count(lit(1)).as("n_events"),
        nErrors.as("n_errors"),
        when(nErrors > 0, lit("failure")).otherwise(lit("success"))
          .as("status"),
        concat_ws(",", array_sort(collect_set(col("event_type"))))
          .as("tags"))
  }

  /** Materializations listing (etl/utils/observability.py:74-111): filter
    * the event log to materialization events, build the dotted asset key,
    * and flatten the metadata map into typed columns — the reference's
    * `{**metadata}` row splat.
    */
  def materializations(events: DataFrame, matType: String): DataFrame =
    events
      .where(col("event_type") === matType)
      .select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        concat(lit("stage.user_"), col("user_id")).as("asset_key"),
        get_json_object(col("props"), "$.k").cast("long").as("meta_k"),
        col("value").as("meta_value"))

  /** Gap-based sessions via Spark's native session_window: consecutive
    * events of an entity belong to one session while the gap stays under
    * `gap` (e.g. "30 minutes"). This is the scalable form of
    * sessionization — one shuffle on the entity key, windows merged by
    * the operator — and the same call works unchanged in Structured
    * Streaming with a watermark. Emits exact integer-microsecond session
    * bounds (first/last event) rather than the window's padded end.
    */
  def gapSessions(events: DataFrame, entityCol: String, gap: String): DataFrame =
    events
      .groupBy(col(entityCol), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .select(col(entityCol), col("first_us"), col("last_us"),
        col("n_events"), (col("last_us") - col("first_us")).as("span_us"))

  /** Per-step duration stats (avg/max/count), the reference's
    * "performance bottleneck" query (docs/trino_observability_ddl.sql q2).
    * avg over exact integral micros stays deterministic.
    */
  def stepStats(durations: DataFrame): DataFrame =
    durations
      .groupBy(col("event_type"))
      .agg(
        avg(col("duration_us")).as("avg_duration_us"),
        max(col("duration_us")).as("max_duration_us"),
        count(lit(1)).as("run_count"))

  /** Strict-order funnel over first occurrences: a user completes step i
    * when their first step-i event is at or after their first step-(i-1)
    * event and every earlier step completed. Output: one row per step
    * with the count of users who reached it.
    *
    * One user-keyed aggregate computes every step's first timestamp in a
    * single pass (min-when per step, map-side combinable); the depth
    * fold and the step explode are per-user projections; the final
    * aggregate has |steps| groups. Nothing in the plan is per-event
    * after the first aggregate — funnel cost = one shuffle of one row
    * per user.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val aggs = steps.map(st =>
      min(when(col("event_type") === st, unix_micros(col("ts")))).as(s"t_$st"))
    val firsts = events.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
    val depth = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (st, i)) =>
      val ok =
        if (i == 0) col(s"t_$st").isNotNull
        else col(s"t_$st").isNotNull &&
          col(s"t_$st") >= col(s"t_${steps(i - 1)}") && acc === lit(i)
      when(ok, lit(i + 1)).otherwise(acc)
    }
    firsts
      .select(depth.as("depth"))
      .where(col("depth") >= 1)
      .select(explode(sequence(lit(1), col("depth"))).as("step_idx"))
      .groupBy(col("step_idx"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("step_idx").cast("long").as("step_idx"),
        element_at(typedLit(steps), col("step_idx")).as("step"),
        col("n_users"))
  }

  /** Cohort retention: users bucketed by first-seen day, distinct
    * returning users per (cohort_day, day offset) — the classic activity
    * triangle. All integer counts, so the result is engine-exact.
    *
    * Timezone: `ts.cast("date")` derives the day in the SESSION timezone
    * (this repo's mains pin spark.sql.session.timeZone=UTC, matching the
    * naive-timestamp oracle). An externally built session in another zone
    * shifts cohort days — set the session zone to UTC, or swap in
    * to_date(from_utc_timestamp(ts, zone)) to pin a zone explicitly.
    *
    * 100 TB posture: the (user, day) activity set is deduped map-side
    * BEFORE any join (one row per user-day, not per event), first-seen
    * days are a user-keyed aggregate that joins back on the same
    * user_id hash partitioning (no extra exchange under AQE), and the
    * final (cohort, offset) aggregate is tiny. countDistinct is safe
    * here because its group space (days x offsets) is bounded, unlike a
    * per-user expand.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Time-CONSTRAINED funnel: each step must land within `windowUs` of
    * the previous step's matched event (the standard product-analytics
    * "converted within 24 h" ask, which the first-occurrence funnel
    * cannot express). Stage k's matched time is the EARLIEST step-k
    * event inside stage k-1's window — computed as a chain of |steps|
    * user-keyed conditional-min aggregates, each exchanging ONE slim row
    * per surviving user (the candidate-event filter happens before the
    * exchange). Per reached step: user count and the exact-integer mean
    * latency from the previous step.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String],
      windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val ts = unix_micros(col("ts"))
    val stage0 = events.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(ts).as("t_prev"))
    val stages = steps.drop(1).scanLeft(stage0) { (prev, step) =>
      events.where(col("event_type") === step)
        .select(col("user_id"), ts.as("t_ev"))
        .join(prev, "user_id")
        .where(col("t_ev") >= col("t_prev") &&
          col("t_ev") <= col("t_prev") + windowUs)
        .groupBy(col("user_id"))
        .agg(min(col("t_ev")).as("t_cur"), min(col("t_prev")).as("t_from"))
        .select(col("user_id"), col("t_cur").as("t_prev"),
          (col("t_cur") - col("t_from")).as("delta_us"))
    }
    stages.zipWithIndex.map { case (df, i) =>
      val mean =
        if (i == 0) lit(null).cast("double")
        else (sum(col("delta_us")).cast("double") / count(lit(1)))
      df.agg(count(lit(1)).as("n_users"), mean.as("mean_us_from_prev"))
        .select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
          col("n_users"), col("mean_us_from_prev"))
    }.reduce(_ unionByName _)
  }

  /** Error-burst detection: per-hour error rate (bp) against the mean
    * rate of the trailing `trailHours` CLOCK hours; a burst is a rate
    * above `factor`x the trailing mean with at least `minErrors` errors
    * (the floor keeps one error in a quiet hour from alarming). The
    * corpus collapses to ONE bounded hourly series first (map-side
    * combined), so the trailing window runs over hours, not events —
    * the constant partition key declares that deliberately bounded
    * one-task window, the same idiom as the rank-cut histograms.
    * The trailing frame is a RANGE over hour_us (microseconds), not a
    * ROWS frame: hours with zero events have no row, and a ROWS frame
    * would silently reach past a quiet gap into arbitrarily old hours.
    * Rates are integer basis points; the burst test cross-multiplies
    * (rate * trail_total vs factor * trail_err * total) so no division
    * ever happens — engine-exact.
    */
  def errorBursts(events: DataFrame, errorType: String, trailHours: Int,
      factor: Int, minErrors: Int): DataFrame = {
    val hourly = events.groupBy(
        unix_micros(date_trunc("hour", col("ts")).cast("timestamp")).as("hour_us"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === errorType, 1)).as("n_errors"))
    val w = Window.partitionBy(lit(1)).orderBy(col("hour_us").asc)
      .rangeBetween(-trailHours * 3600000000L, -1L)
    hourly
      .withColumn("trail_errors", sum(col("n_errors")).over(w))
      .withColumn("trail_events", sum(col("n_events")).over(w))
      .select(col("hour_us"), col("n_events"), col("n_errors"),
        floor(col("n_errors") * 10000.0 / col("n_events") + 0.5).cast("long")
          .as("rate_bp"),
        col("trail_errors"), col("trail_events"),
        (col("trail_events").isNotNull && col("trail_events") > 0 &&
          col("n_errors") >= minErrors &&
          col("n_errors") * col("trail_events") >
            lit(factor) * col("trail_errors") * col("n_events")).as("burst"))
  }

  /** Event-type transition matrix (first-order Markov counts): per user,
    * consecutive event pairs in (ts, id) order, counted by (from, to).
    * The lead window is per-user (scales with the key), the output is
    * bounded at |types|^2; transition probability is emitted in exact
    * basis points of the from-type's total.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        floor(col("n") * 10000.0 / col("n_from") + 0.5).cast("long").as("p_bp"))
  }

  /** Stationary distribution of the event-type transition chain — the
    * LONG-RUN mix the first-order Markov model of [[transitions]]
    * predicts, next to the mix actually observed ("if user behavior is
    * really first-order, where does traffic settle — and how far is
    * today's mix from that equilibrium?" — a large gap means the chain
    * is NOT the right model or the mix is still drifting):
    * π·P iterated `iters` times from the uniform start, entirely in
    * integer micro-units — P's rows are n·10⁶ DIV n_from, each step is
    * π'(j) = Σ_i π(i)·p(i,j) DIV 10⁶ (sum-then-divide: exact,
    * order-independent), so the iterate is bit-identical on any
    * engine. Types with NO observed outgoing transition self-loop at
    * 1.0 (the dangling-row convention, documented). Quantization leaks
    * < k micro of mass per step (k = |types| — bounded, never
    * renormalized mid-flight so both engines leak identically); after
    * the default 12 steps a handful-of-types chain is far past mixing
    * for the 10⁻⁶ grid. NULL-keyed rows are filtered on BOTH engines
    * before the window (the asc-NULLS divergence guard).
    *
    * Output: one row per type — n_events, obs_micro (observed event
    * share), pi_micro (stationary share), gap_micro. Scale shape: the
    * per-user lead window is the one data-sized pass (the transitions
    * cost); every iteration runs on the bounded types² matrix.
    */
  def markovStationary(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters out of range: $iters")
    val ev = events.where(col(userCol).isNotNull && col(tsCol).isNotNull &&
      col(idCol).isNotNull && col(typeCol).isNotNull)
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val counts = ev
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // bounded types^2 matrix, three consumers
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    val types = counts.select(col("from_type").as("t"))
      .union(counts.select(col("to_type").as("t"))).distinct()
      .localCheckpoint() // bounded type spine, four consumers
    val pReal = counts.join(totals, "from_type")
      .select(col("from_type").as("f"), col("to_type").as("to_t"),
        expr("(n * 1000000) DIV n_from").as("p_micro"))
    val dangling = types
      .join(totals.select(col("from_type").as("t")), Seq("t"), "left_anti")
      .select(col("t").as("f"), col("t").as("to_t"),
        lit(1000000L).as("p_micro"))
    val pmat = pReal.unionByName(dangling).localCheckpoint()
    val k = types.count() // bounded driver pull: |types| rows
    var pi = types.select(col("t"), lit(1000000L / math.max(k, 1L)).as("pi"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      pi = pmat.join(pi, pmat("f") === pi("t"))
        .groupBy(col("to_t"))
        .agg(expr("CAST(sum(pi * p_micro) DIV 1000000 AS BIGINT)").as("pi"))
        .select(col("to_t").as("t"), col("pi"))
      // materialize every 4th iterate (and the last): the frame is
      // bounded, but each localCheckpoint is a job barrier — cutting
      // 12 barriers to 3 halves the wall clock while keeping the
      // lineage shallow enough to plan
      if (i % 4 == 0 || i == iters) pi = pi.localCheckpoint()
    }
    val obs = ev.groupBy(col(typeCol).as("t"))
      .agg(count(lit(1)).as("n_events"))
    val obsShare = obs.crossJoin(
      broadcast(obs.agg(sum(col("n_events")).as("n_tot"))))
      .select(col("t"), col("n_events"),
        expr("(n_events * 1000000) DIV n_tot").as("obs_micro"))
    types.join(pi, Seq("t"), "left")
      .join(obsShare, Seq("t"), "left")
      .select(col("t").as("group_key"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("obs_micro"), lit(0L)).as("obs_micro"),
        coalesce(col("pi"), lit(0L)).as("pi_micro"))
      .withColumn("gap_micro", col("pi_micro") - col("obs_micro"))
      .orderBy(col("group_key"))
  }

  /** Per-group z-score outliers: events whose value sits more than
    * `z` population standard deviations from their event_type's mean —
    * the sensor-threshold alarm every monitoring pass runs over a metric
    * stream.
    *
    * Numeric portability: a streamed stddev (Welford / central moments)
    * is merge-order-dependent in floats, so the flag would flap between
    * engines and runs. Instead values are quantized to integer
    * centi-units at the scan (they carry 2 decimals), the per-type
    * (n, Σv, Σv²) are EXACT longs, and the outlier test is the
    * denominator-cleared integer inequality
    *     (n·v − Σv)² > z²·(n·Σv² − (Σv)²)
    * — no division, no sqrt, no epsilon: bit-identical everywhere. The
    * reported z-score does one sqrt of an exact long, for humans only.
    *
    * Scale shape: the stats aggregate collapses to one row per
    * event_type (map-side combined, broadcast back), so the corpus is
    * scanned twice but never shuffled; Σv² of centi-values stays within
    * long for ~10^12 events at value ~100, far past any per-type slice.
    */
  def eventAnomalies(events: DataFrame, z: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val vc = floor(col("value") * 100.0 + 0.5).cast("long")
    val base = events.select(col("event_id"), col("event_type"), col("value"),
      vc.as("v_c"))
    val stats = base.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("v_c")).as("s1"),
      sum(col("v_c") * col("v_c")).as("s2"))
    // the cleared-denominator terms outgrow int64 around 10^9 events per
    // type (n·Σv² ~ n²·v²), so they are 128-bit-exact decimals here and
    // HUGEINTs in the oracle — headroom to ~10^12 events/type at 4-digit
    // values, with the test still division-free and bit-exact
    val dev = col("n").cast(dec) * col("v_c").cast(dec) - col("s1").cast(dec)
    val varTerm = col("n").cast(dec) * col("s2").cast(dec) -
      col("s1").cast(dec) * col("s1").cast(dec)
    base
      .join(broadcast(stats), "event_type")
      .where(dev * dev > lit(z.toLong * z).cast(dec) * varTerm)
      .withColumn("zscore_r",
        floor(dev.cast("double") / sqrt(varTerm.cast("double")) * 10000.0 + 0.5)
          / 10000.0)
      .select(col("event_id"), col("event_type"), col("value"),
        col("zscore_r"), (dev > lit(0).cast(dec)).as("high"))
  }

  /** Top-N session paths: gap-sessionize per user, spell each session as
    * the '>'-joined sequence of its first `maxLen` event types (in
    * (ts, event_id) order — the id tie-break makes same-microsecond
    * events deterministic), count sessions per path, rank.
    *
    * Scale shape: the lag/cumsum session split and the per-session
    * collect are per-user windows/aggregates (scale with the key); the
    * collected list is capped at `maxLen` semantically but collected
    * whole per session — sessions are gap-bounded, so the list is the
    * session length, not the corpus. The path table is bounded by
    * |event types|^maxLen distinct rows, so the final rank is the
    * deliberately-bounded one-task window (rank-cut idiom).
    */
  def sessionPaths(events: DataFrame, gapUs: Long, maxLen: Int,
      topN: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val sess = base
      .withColumn("new_session",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= gapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sess
      .groupBy(col("user_id"), col("session_seq"))
      .agg(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(array_join(
        expr(s"transform(slice(evs, 1, $maxLen), e -> e.event_type)"),
        ">").as("path"))
    val counts = paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
    val rw = Window.partitionBy(lit(1))
      .orderBy(col("n_sessions").desc, col("path").asc)
    counts
      .withColumn("rk", row_number().over(rw).cast("long"))
      .where(col("rk") <= topN)
  }

  /** Last-touch attribution: each `purchaseType` event is credited to the
    * latest preceding `touchTypes` event of the same user within
    * `windowUs` (strictly before in (ts, event_id) order), else 'none'.
    * Per attributed type: purchase count, exact revenue in integer cents,
    * and the mean touch-to-purchase latency (avg over exact integral
    * micros — deterministic).
    *
    * Scale shape: the candidate filter (purchase + touch types only)
    * happens before the one per-user window pass; the running
    * last-touch is two ignore-nulls `last` columns over the same frame,
    * so no self-join of the event stream ever happens — the as-of pair
    * is found in the sort the window already pays for. Output is
    * bounded at |touchTypes| + 1 rows.
    */
  def lastTouchAttribution(events: DataFrame, purchaseType: String,
      touchTypes: Seq[String], windowUs: Long): DataFrame = {
    val base = events
      .where(col("event_type") === purchaseType ||
        col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("v_c"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touchTypes: _*)
    val inWindow = col("t_us").isNotNull &&
      col("us") - col("t_us") <= windowUs
    base
      .withColumn("t_us",
        last(when(isTouch, col("us")), ignoreNulls = true).over(w))
      .withColumn("t_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === purchaseType)
      .select(
        when(inWindow, col("t_type")).otherwise(lit("none"))
          .as("attributed_type"),
        col("v_c"),
        when(inWindow, col("us") - col("t_us")).as("lag_us"))
      .groupBy(col("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v_c")).as("revenue_cents"),
        avg(col("lag_us")).as("mean_lag_us"))
  }
}
