package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.Formats
import graft.streaming.EventStream

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trips with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/data"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    Formats.writeCsv(df, dir)
    val back = Formats.readCsv(spark, dir, "id LONG, name STRING, score DOUBLE")
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("jsonl round-trips with explicit schema") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/data"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    Formats.writeJsonl(df, dir)
    val back = Formats.readJsonl(spark, dir, "id LONG, v STRING")
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }

  test("xml round-trips with explicit schema and row tag") {
    val dir = Files.createTempDirectory("graft-xml").toString + "/data"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "score")
    Formats.writeXml(df, dir, rootTag = "rows", rowTag = "row")
    val back = Formats.readXml(spark, dir, "id LONG, name STRING, score DOUBLE",
      rowTag = "row")
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("orc round-trips with pushdown-capable columnar layout") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/data"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "name", "score")
    Formats.writeOrc(df, dir)
    val back = Formats.readOrc(spark, dir).where($"id" >= 2)
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b", 2.5), (3L, "c", 3.5)))
    // the filter reaches the ORC scan as a pushed filter
    val plan = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(id,2)"),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("binaryFile source lands payload files as opaque binary rows") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.png"), Array[Byte](5, 6))
    Files.write(dir.resolve("skip.txt"), Array[Byte](9))
    val rows = Formats.readBinaryFiles(spark, dir.toString, "*.png")
      .selectExpr("path", "length", "content")
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(("a.png", 4L, Seq[Byte](1, 2, 3, 4)),
      ("b.png", 2L, Seq[Byte](5, 6))))
    // feeds straight into the multimodal batch-decode operator
    import graft.operators.Multimodal
    val feats = Multimodal.extractFeatures(
      Formats.readBinaryFiles(spark, dir.toString, "*.png")
        .selectExpr("CAST(length AS LONG) AS media_id", "'image' AS kind",
          "content AS payload")
        .as[Multimodal.MediaRow], featureDim = 4)
      .collect()
    assert(feats.length == 2 && feats.forall(_.feature.length == 4))
  }

  test("file-source stream over a parquet landing directory aggregates end-to-end") {
    val landing = Files.createTempDirectory("graft-landing").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, ts("2024-01-01 00:05:00"), 1L, "click", 2.0, ""),
      (2L, ts("2024-01-01 00:25:00"), 1L, "click", 3.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(landing)

    val chk = Files.createTempDirectory("graft-chk").toString
    val query = EventStream.hourlyTypeCounts(
        EventStream.readEvents(spark, landing), watermark = "10 minutes")
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("append").option("checkpointLocation", chk).start()
    query.processAllAvailable()

    // second landing batch advances the watermark past the first window
    Seq((3L, ts("2024-01-01 03:00:00"), 1L, "click", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(landing)
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("file_hourly").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_events")).toMap
    assert(rows("click") == 2L)
  }
}
