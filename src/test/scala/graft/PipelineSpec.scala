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

  test("writeLatest/readLatest round-trip non-partitioned master data") {
    val root = Files.createTempDirectory("graft-latest").toString
    val df = Seq((1, "m")).toDF("k", "v")
    val path = Pipeline.writeLatest(df, root, "extract", "item_master")
    assert(path.endsWith("extract/job_name=item_master/latest"))
    assert(Pipeline.readLatest(spark, root, "extract", "item_master").count() == 1)
  }

  test("upsertTable merges on keys across writes") {
    val root = Files.createTempDirectory("graft-upsert").toString + "/table"
    Pipeline.upsertTable(spark, root, Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    Pipeline.upsertTable(spark, root, Seq((2, "B"), (3, "C")).toDF("k", "v"), Seq("k"))
    val out = spark.read.parquet(root).orderBy("k").as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "a"), (2, "B"), (3, "C")))
  }
}
