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
