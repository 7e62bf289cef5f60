package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over a scale-factor directory of parquet files.
  *
  * Spark-first analog of the reference's storage resources
  * (reference: etl/resources/s3.py:60 hive-style
  * `stage/job_name=X/date=YYYYMMDD/` layout; etl/resources/rdb.py source
  * tables). At cluster scale each table is a partitioned parquet/lakehouse
  * dataset; locally each is a single file. All readers go through here so
  * schema pruning and partition filters stay at the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** The events stream table: `ts` surfaced as a session-tz TimestampType
    * column whatever the parquet physically stores. Two generator layouts
    * exist across driver rounds: int64 nanoseconds (read as raw longs via
    * legacy.parquet.nanosAsLong — Spark rejects nanos otherwise — then
    * truncated to micros with integer DIV, since ~1.7e18 ns exceeds
    * double's exact range) and native micros timestamp (TIMESTAMP_NTZ,
    * cast — value-preserving under the UTC session tz every repo main
    * sets). Dispatch is on the footer schema, so a session sees the layout
    * it actually has.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = eventsRaw(s, d)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts",
        timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Events with `ts` exactly as stored (int64 nanos in the legacy layout,
    * timestamp in the current one). Filters on the stored column push down
    * to the scan; prefer [[eventsDayRange]], which phrases the filter in
    * whichever type the file carries.
    *
    * SIDE EFFECT: sets `spark.sql.legacy.parquet.nanosAsLong` on the
    * session (idempotent; any later nanos-timestamp parquet read in this
    * session also gets LongType instead of an error). The repo's own mains
    * set it at session build; this remains as a net for externally built
    * sessions (the driver constructs its own for the entry smoke check).
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** Events restricted to `[fromDay, untilExclDay)` with the range phrased
    * against the STORED `ts` representation, so it reaches the parquet scan
    * as a pushed predicate + row-group stats prune in either layout. This
    * is the 100 TB daily-extract shape: a filter on a COMPUTED timestamp
    * (to_date over a converted column) cannot push down, a range on the
    * stored column can. `ts` in the result is still raw — convert via
    * [[events]] semantics only if the output needs it.
    */
  def eventsDayRange(s: SparkSession, d: String,
      fromDay: String, untilExclDay: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = eventsRaw(s, d)
    val lo = java.time.LocalDate.parse(fromDay)
    val hi = java.time.LocalDate.parse(untilExclDay)
    raw.schema("ts").dataType match {
      case LongType =>
        val loNs = lo.toEpochDay * 86400L * 1000000000L
        val hiNs = hi.toEpochDay * 86400L * 1000000000L
        raw.where(col("ts") >= loNs && col("ts") < hiNs)
      case TimestampNTZType =>
        raw.where(col("ts") >= lit(lo.atStartOfDay()) &&
          col("ts") < lit(hi.atStartOfDay()))
      case _ =>
        raw.where(
          col("ts") >= lit(java.sql.Timestamp.valueOf(lo.atStartOfDay())) &&
          col("ts") < lit(java.sql.Timestamp.valueOf(hi.atStartOfDay())))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
