package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point rows to interval rows
  * with `lo <= point <= hi`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin — O(n*m)
  * and only viable when one side broadcasts. The scale formulation buckets
  * the domain: each point maps to one bucket, each interval explodes to
  * the buckets it covers (|span|/width per interval), and the join becomes
  * an equi-join on the bucket key followed by the exact predicate. One
  * shuffle, work proportional to true match density.
  */
object RangeJoin {

  /** @param points    rows with a numeric `pointCol`
    * @param intervals rows with numeric `loCol`/`hiCol` (inclusive)
    * @param bucketWidth domain width per bucket — tune to the typical
    *                    interval span so each interval covers O(1) buckets
    */
  def bucketed(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals
      .withColumn("_bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, "_bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }
}
