package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Etl
import graft.pipeline.Pipeline

/** The backfill planner (Etl.backfillPlan) and the idempotency proof the
  * q_backfill_plan registration promises: a planned day re-runs through
  * the dynamic-partition-overwrite writer byte-equal, and executing the
  * plan drives partitionCompleteness to 10000 bp.
  */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  test("backfillPlan: neighbor-interpolated est_rows, gap-and-island " +
    "batching, deterministic idem keys") {
    // type a: present 1,4,5,8 (counts 1,2,3,4 rows) -> missing {2,3},{6,7}
    // type b: present only day 3 -> missing {1,2} and {4..8}, one-sided ests
    val rows =
      Seq.fill(1)(("a", "2024-01-01")) ++ Seq.fill(2)(("a", "2024-01-04")) ++
      Seq.fill(3)(("a", "2024-01-05")) ++ Seq.fill(4)(("a", "2024-01-08")) ++
      Seq.fill(5)(("b", "2024-01-03"))
    val plan = Etl.backfillPlan(rows.toDF("event_type", "ts"),
      "event_type", "ts", batchDays = 2).collect()
    val byKey = plan.map(r => (r.getAs[String]("event_type"),
      r.getAs[String]("day")) -> r).toMap
    assert(plan.length == 4 + 7) // a misses 4 days, b misses 7

    // two-sided interpolation: (prev + next) DIV 2
    assert(byKey(("a", "2024-01-02")).getAs[Long]("est_rows") == 1L) // (1+2)/2
    assert(byKey(("a", "2024-01-06")).getAs[Long]("est_rows") == 3L) // (3+4)/2
    // one-sided at the series edges (type b has one present day)
    assert(byKey(("b", "2024-01-01")).getAs[Long]("est_rows") == 5L)
    assert(byKey(("b", "2024-01-08")).getAs[Long]("est_rows") == 5L)

    // islands: a's {2,3} and {6,7} are separate batches even though
    // both fit in one 2-day chunk — non-contiguous days never share one
    val a2 = byKey(("a", "2024-01-02"))
    assert(a2.getAs[String]("batch_start") == "2024-01-02" &&
      a2.getAs[String]("batch_end") == "2024-01-03" &&
      a2.getAs[Long]("batch_days") == 2L)
    val a6 = byKey(("a", "2024-01-06"))
    assert(a6.getAs[String]("batch_start") == "2024-01-06" &&
      a6.getAs[String]("batch_end") == "2024-01-07")
    // chunking: b's 5-day island {4..8} splits into 2+2+1
    assert(byKey(("b", "2024-01-04")).getAs[String]("batch_end") == "2024-01-05")
    assert(byKey(("b", "2024-01-06")).getAs[String]("batch_end") == "2024-01-07")
    val b8 = byKey(("b", "2024-01-08"))
    assert(b8.getAs[String]("batch_start") == "2024-01-08" &&
      b8.getAs[Long]("batch_days") == 1L)
    // the idempotency key is the batch bounds, nothing session-specific
    assert(a2.getAs[String]("idem_key") ==
      "backfill:a:2024-01-02:2024-01-03")
  }

  test("executing the plan is idempotent: re-run byte-equal, " +
    "completeness reaches 10000 bp, re-plan drains to empty") {
    val root = Files.createTempDirectory("graft-backfill").toString
    // source of truth: type x, days 1..6, deterministic values
    val truth = (1 to 6).flatMap { d =>
      (1 to 3).map(i => ("x", f"2024-01-0$d", d * 10L + i))
    }.toDF("event_type", "ts", "value")
    // outage: days 3 and 4 never landed
    val landed = truth.where(!col("ts").isin("2024-01-03", "2024-01-04"))
    Pipeline.writeDailyAll(landed.repartition(1).sortWithinPartitions("ts", "value"),
      root, "extract", "ev", col("ts"))

    val table = () => spark.read.parquet(s"$root/extract/job_name=ev")
    val plan = Etl.backfillPlan(table(), "event_type", "ts", batchDays = 7)
    val planned = plan.select("day").as[String].collect().sorted
    assert(planned.sameElements(Array("2024-01-03", "2024-01-04")))

    // one backfill run = re-extract exactly the planned days from the
    // source of truth and land them via dynamic partition overwrite
    def runBackfill(): Unit = Pipeline.overwriteDays(
      truth.where(col("ts").isin(planned.toSeq: _*))
        .repartition(1).sortWithinPartitions("ts", "value"),
      root, "extract", "ev", col("ts"))

    def partDigests(): Map[String, String] = {
      val base = new java.io.File(s"$root/extract/job_name=ev")
      base.listFiles().filter(_.getName.startsWith("date=")).map { dir =>
        val md = MessageDigest.getInstance("SHA-256")
        dir.listFiles().filter(_.getName.endsWith(".parquet"))
          .sortBy(_.length()).foreach(f =>
            md.update(Files.readAllBytes(f.toPath)))
        dir.getName -> md.digest().map("%02x".format(_)).mkString
      }.toMap
    }

    runBackfill()
    val audit1 = Etl.partitionCompleteness(table(), "event_type", "ts")
      .collect()
    assert(audit1.forall(_.getAs[Long]("completeness_bp") == 10000L))
    assert(audit1.forall(_.getAs[Long]("missing_days") == 0L))
    val d1 = partDigests()
    assert(d1.keySet == (1 to 6).map(d => f"date=2024010$d").toSet)

    // the re-run: same plan, same writer — every partition byte-equal
    runBackfill()
    val d2 = partDigests()
    assert(d1 == d2, s"re-run changed partition bytes:\n$d1\nvs\n$d2")

    // and re-planning after the backfill finds nothing left to do
    assert(Etl.backfillPlan(table(), "event_type", "ts").count() == 0L)
  }
}
