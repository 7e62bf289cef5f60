package graft

/** Evidence for the SURVEY §4 claim: bucketing both sides of a recurring
  * fact-fact join on the join key removes the per-query shuffle — at 100 TB
  * the write-side cost is paid once and every downstream join is co-located.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("registered q_bucketed_join: only exchange in the plan is the final agg") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges:\n$plan")
    assert(df.count() == 5) // one row per order priority
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real join (no broadcast) to observe the exchange behavior
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
      (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")

      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == 1000)

      // contrast: the same join over plain (unbucketed) data shuffles
      val plainA = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val plainB = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      val plainPlan = plainA.join(plainB, "k").queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
