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
  /** The events stream table carries nanosecond timestamps, which Spark's
    * parquet reader rejects by default. Read them as raw nanos
    * (legacy.parquet.nanosAsLong) and surface a proper TimestampType `ts`
    * truncated to micros — integer DIV, since ~1.7e18 ns exceeds double's
    * exact range.
    */
  def events(s: SparkSession, d: String): DataFrame =
    eventsRaw(s, d)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))

  /** Events with `ts` as the raw int64 nanos the parquet stores. Filters on
    * this column push down to the scan (the converted TimestampType column
    * is computed, so predicates on it cannot) — use for partition-style
    * date filters, then convert.
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
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
