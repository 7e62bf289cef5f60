package graft

/** Whole-registry plan audit: every registered query must build a plan at
  * sf0.001 without a non-broadcast cartesian product — the one join shape
  * that is never acceptable at scale. (Broadcast nested-loop joins against
  * tiny broadcast sides — the brute-force ANN baseline — are intentional
  * and allowed.)
  */
class PlanAuditSpec extends SparkSpec {

  test("no registered query plans a non-broadcast cartesian product") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // one hot key holds ~99% of the fact side — the shape salting/AQE
    // exist for. With the skew thresholds scaled down to toy size, the
    // final adaptive plan must mark the sort-merge join partition as
    // skew-handled instead of funneling the hot key through one task.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = (0 until 40000).map(i =>
        (if (i % 100 == 0) (i % 7).toLong + 1 else 0L, s"payload_$i"))
        .toDF("k", "v")
      val dim = (0L until 8L).map(k => (k, s"dim_$k")).toDF("k", "d")
      // no aggregate on the join key downstream: OptimizeSkewedJoin
      // declines to split when a later stage requires the unsplit hash
      // distribution (it would add a shuffle back)
      val joined = fact.join(dim, "k").select(col("k"), col("v"), col("d"))
      joined.collect() // execute THIS dataset's QueryExecution so the
      // AdaptiveSparkPlan below is the re-optimized final plan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val adaptive = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a
        case other => fail(s"expected an adaptive plan, got: $other")
      }
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-handled join in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("no registered query plans an unpartitioned window over unbounded input") {
    // a Window with an empty partitionSpec funnels the whole input through
    // one task — acceptable only on limit-bounded inputs, which the
    // registry expresses with an explicit constant partition key instead
    import org.apache.spark.sql.execution.window.WindowExec
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val offenders = fn(spark, dir).queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(offenders.isEmpty, s"$name plans an unpartitioned Window")
    }
  }
}
