package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming analogs of the batch event analytics.
  *
  * The reference consumes event logs in scheduled daily batches
  * (etl/sensors/run_log_sensor.py polls for finished runs). Spark-first the
  * same analytics run continuously: readStream over the landing directory,
  * watermarked tumbling windows for aggregates, and
  * flatMapGroupsWithState for sessionization that the batch window
  * functions compute retrospectively.
  */
object EventStream {

  /** File-source stream over an events parquet directory (the landing zone
    * a collector writes into). Schema is fixed up front — required for
    * streaming sources and good hygiene at scale anyway.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** Watermarked tumbling-window aggregation: per event-type counts and
    * value sums per hour. Late events beyond the watermark are dropped,
    * bounding state — the property that keeps this runnable forever on a
    * real cluster.
    */
  def hourlyTypeCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop re-deliveries of the same content key
    * inside the watermark horizon — the continuous dual of
    * Dedup.exactDedup, and the standard front gate of a streaming
    * ingestion pipeline (at-least-once sources re-deliver). State is one
    * entry per distinct key within the watermark and is evicted as the
    * watermark advances — bounded, unlike an unwatermarked dropDuplicates.
    * `keyCols` should be the content identity (id, or a content hash for
    * near-the-source text dedup).
    */
  def dedupStream(events: DataFrame, watermark: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join the event stream against a static
    * dimension table (broadcast — re-read per microbatch if the dim is a
    * file source, so slowly-changing dims refresh for free).
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), key)

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(count: Long, firstTs: Long, lastTs: Long)
  case class SessionSummary(user_id: Long, n_events: Long, duration_us: Long, closed: Boolean)

  /** Custom stateful sessionization with an inactivity gap: the streaming
    * dual of Observability.eventDurations. State per user is O(1); with
    * gapMs > 0 sessions close via processing-time timeout (note: timers make
    * Spark run continuous empty microbatches); gapMs <= 0 disables timeout.
    */
  def sessionize(events: DataFrame, gapMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (gapMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, timeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.count, s.lastTs - s.firstTs, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val prev = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, Long.MinValue))
            val next = sorted.foldLeft(prev) { (st, e) =>
              val us = e.ts.getTime * 1000L
              SessionState(st.count + 1, math.min(st.firstTs, us), math.max(st.lastTs, us))
            }
            state.update(next)
            if (gapMs > 0) state.setTimeoutDuration(gapMs)
            Iterator(SessionSummary(userId, next.count, next.lastTs - next.firstTs, closed = false))
          }
      }.toDF()
  }
}
