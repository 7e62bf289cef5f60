package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline

/** Z-order layout: row-group stats must prune point predicates on BOTH
  * dimensions, where a lexicographic sort only serves its leading key.
  * Measured, not assumed: decoded-row counts come from the executed scan's
  * own metrics.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def decodedRows(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
    val read = spark.read.parquet(path).where(pred)
    val n = read.collect().length.toLong // executes THIS plan, so its scan metrics populate
    val scan = read.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    (scan.metrics("numOutputRows").value, n)
  }

  test("mortonCode interleaves bits") {
    val out = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 6))
      .toDF("x", "y")
      .select(Pipeline.mortonCode(col("x"), col("y"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq // long: inputs widen before shifting
    // z(x,y): x bits at even positions, y bits at odd
    assert(out === Seq(0, 1, 2, 3, 0x2 | 0x8 | 0x4 | 0x1, // (2,3)=b10,b11 -> 1110
      0x1 | 0x10 | 0x8 | 0x20).map(_.toLong).updated(4, 14L))
    assert(out(5) === (1 + 8 + 16 + 32)) // (5,6): x=101 -> 1,16; y=110 -> 8,32
  }

  test("mortonCode stays non-negative for int inputs at bits=31") {
    // pre-fix, y's top bit shifted into the int sign bit for bits >= 16
    val out = Seq((0x7FFFFFFF, 0x7FFFFFFF))
      .toDF("x", "y")
      .select(Pipeline.mortonCode(col("x"), col("y"), 31).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out.head == (1L << 62) - 1) // 62 interleaved ones
    assert(out.head > 0)
  }

  test("z-ordered layout prunes row groups on both dims; lexicographic only on its leading key") {
    val dims = 64 // 64 x 64 grid, one row per cell
    val data = (0 until dims).flatMap(u => (0 until dims).map(d =>
      (u, d, s"pad_${u}_$d")))
      .toDF("user_bucket", "day_bucket", "payload")
    val zPath = Files.createTempDirectory("graft-zorder").toString + "/t"
    val lexPath = Files.createTempDirectory("graft-lex").toString + "/t"
    Pipeline.writeZOrdered(data, "user_bucket", "day_bucket", bits = 6, zPath,
      numFiles = 64)
    // lexicographic control: day-major sort into the same file count
    data.repartitionByRange(64, col("day_bucket"), col("user_bucket"))
      .sortWithinPartitions("day_bucket", "user_bucket")
      .write.mode("overwrite").parquet(lexPath)

    val total = dims.toLong * dims
    // leading-key predicate: both layouts prune
    val (lexDay, lexDayN) = decodedRows(lexPath, col("day_bucket") === 7)
    val (zDay, zDayN) = decodedRows(zPath, col("day_bucket") === 7)
    assert(lexDayN === dims.toLong && zDayN === dims.toLong)
    assert(lexDay < total / 2, s"lex leading-key scan decoded $lexDay of $total")
    assert(zDay < total / 2, s"z-order day scan decoded $zDay of $total")
    // trailing-key predicate: lexicographic decodes EVERY row group
    // (each spans all users); z-order must still prune
    val (lexUser, lexUserN) = decodedRows(lexPath, col("user_bucket") === 7)
    val (zUser, zUserN) = decodedRows(zPath, col("user_bucket") === 7)
    assert(lexUserN === dims.toLong && zUserN === dims.toLong)
    assert(lexUser === total, s"expected full decode on lex trailing key, got $lexUser")
    assert(zUser < total / 2, s"z-order user scan decoded $zUser of $total — no pruning")
  }
}
