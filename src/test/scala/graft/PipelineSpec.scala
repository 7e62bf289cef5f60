package graft

import java.nio.file.Files

import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("writeDaily/readDaily/listDaily round-trip the hive layout") {
    val root = Files.createTempDirectory("graft-pipe").toString
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val path = Pipeline.writeDaily(df, root, "transform", "wip", "2024-01-02")
    assert(path.endsWith("transform/job_name=wip/date=20240102"))
    assert(Pipeline.readDaily(spark, root, "transform", "wip", "2024-01-02").count() == 2)
    Pipeline.writeDaily(df, root, "transform", "wip", "2024-01-03")
    assert(Pipeline.listDaily(root, "transform", "wip") == Seq("20240102", "20240103"))
  }

  test("writeDailyAll + readDay prunes to one partition directory") {
    import org.apache.spark.sql.execution.ExplainMode
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-pruned").toString
    val df = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0)
    ).toDF("id", "day", "value")
    Pipeline.writeDailyAll(df.repartition(1), root, "stage", "j", col("day"))
    val read = Pipeline.readDay(spark, root, "stage", "j", "2024-01-01")
    assert(read.count() == 2)
    // the filter must reach the scan as a PartitionFilter...
    val plan = read.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("20240101"),
      s"no partition filter in plan:\n$plan")
    // ...and the executed scan must have listed ONE file (one file per
    // day was written; inputFiles would show the whole unfiltered
    // relation, so read the scan node's own metrics)
    read.collect()
    val scan = read.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numFiles").value == 1,
      s"scanned ${scan.metrics("numFiles").value} files, expected 1")
  }

  test("overwriteDays replaces only the re-run day (dynamic partition overwrite)") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-dyn").toString
    val df = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0)
    ).toDF("id", "day", "value")
    Pipeline.writeDailyAll(df, root, "stage", "j", col("day"))
    // re-run day 2 with corrected rows; day 1 must survive untouched
    val rerun = Seq((20L, "2024-01-02", 9.0)).toDF("id", "day", "value")
    Pipeline.overwriteDays(rerun, root, "stage", "j", col("day"))
    val all = spark.read.parquet(s"$root/stage/job_name=j")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(all.toSeq == Seq(1L, 20L))
  }

  test("writeLatest/readLatest round-trip non-partitioned master data") {
    val root = Files.createTempDirectory("graft-latest").toString
    val df = Seq((1, "m")).toDF("k", "v")
    val path = Pipeline.writeLatest(df, root, "extract", "item_master")
    assert(path.endsWith("extract/job_name=item_master/latest"))
    assert(Pipeline.readLatest(spark, root, "extract", "item_master").count() == 1)
  }

  test("compactDaily collapses a fragmented day to the target file count") {
    val root = Files.createTempDirectory("graft-compact").toString
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(8)
    Pipeline.writeDaily(df, root, "stage", "j", "2024-01-02")
    val dayDir = new java.io.File(s"$root/stage/job_name=j/date=20240102")
    def parquetFiles = dayDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 8)
    Pipeline.compactDaily(spark, root, "stage", "j", "2024-01-02", targetFiles = 1)
    assert(parquetFiles == 1)
    val back = Pipeline.readDaily(spark, root, "stage", "j", "2024-01-02")
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0) == 5050L)
  }

  test("tenant-scoped daily writes, existence check, and delete") {
    val root = Files.createTempDirectory("graft-tenant").toString
    val df = Seq((1, "a")).toDF("k", "v")
    Pipeline.writeDailyForTenant(df, root, "project_01", "transform", "wip", "2024-01-02")
    Pipeline.writeDailyForTenant(df, root, "project_02", "transform", "wip", "2024-01-02")
    assert(Pipeline.listTenantDaily(root, "project_01", "transform", "wip") == Seq("20240102"))
    assert(Pipeline.readDailyForTenant(spark, root, "project_02", "transform", "wip",
      "2024-01-02").count() == 1)
    // exists + delete on the tenant-scoped root
    val t1 = s"$root/tenants/project_01"
    assert(Pipeline.existsDaily(t1, "transform", "wip", "2024-01-02"))
    assert(Pipeline.deleteDaily(t1, "transform", "wip", "2024-01-02"))
    assert(!Pipeline.existsDaily(t1, "transform", "wip", "2024-01-02"))
    assert(!Pipeline.deleteDaily(t1, "transform", "wip", "2024-01-02"))
    // the other tenant's data is untouched
    assert(Pipeline.listTenantDaily(root, "project_02", "transform", "wip") == Seq("20240102"))
  }

  test("upsertTable merges on keys across writes") {
    val root = Files.createTempDirectory("graft-upsert").toString + "/table"
    Pipeline.upsertTable(spark, root, Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    Pipeline.upsertTable(spark, root, Seq((2, "B"), (3, "C")).toDF("k", "v"), Seq("k"))
    val out = spark.read.parquet(root).orderBy("k").as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "a"), (2, "B"), (3, "C")))
  }
}
