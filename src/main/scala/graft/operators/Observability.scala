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
}
