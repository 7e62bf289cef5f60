package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing: fill fixed-size context windows (training bins) with
  * whole documents, greedy next-fit per partition — the step between
  * "clean corpus" and "token batches" in a pretraining pipeline.
  *
  * This is one of the rare genuinely per-partition imperative operators
  * (the bin accumulator is sequential state), so it uses typed
  * mapPartitions: each task packs its own partition independently and
  * bin ids are made globally unique by (partitionId << 32 | local index)
  * — no coordination, no shuffle beyond whatever partitioning the caller
  * chose. Packing quality depends on that choice: sort by descending
  * length within partitions (sortWithinPartitions, no extra exchange)
  * approximates first-fit-decreasing.
  *
  * Documents longer than `maxTokens` get a bin of their own (the caller
  * decides whether to window them first — see TextAnalysis.tokenWindows).
  */
object Packing {

  final case class DocTokens(doc_id: Long, n_tokens: Long)

  final case class PackedBin(
      bin_id: Long,
      doc_ids: Seq[Long],
      n_docs: Int,
      total_tokens: Long,
      fill: Double)

  def packGreedy(docs: Dataset[DocTokens], maxTokens: Long): Dataset[PackedBin] = {
    require(maxTokens > 0, "maxTokens must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { rows =>
      val part = org.apache.spark.TaskContext.getPartitionId().toLong
      new Iterator[PackedBin] {
        private var localBin = 0L
        private var ids = List.empty[Long]
        private var tokens = 0L
        private def emit(): PackedBin = {
          val bin = PackedBin((part << 32) | localBin, ids.reverse, ids.size,
            tokens, tokens.toDouble / maxTokens)
          localBin += 1; ids = Nil; tokens = 0L
          bin
        }
        override def hasNext: Boolean = rows.hasNext || ids.nonEmpty
        override def next(): PackedBin = {
          while (rows.hasNext) {
            val d = rows.next()
            if (ids.nonEmpty && tokens + d.n_tokens > maxTokens) {
              val full = emit()
              ids = List(d.doc_id); tokens = d.n_tokens
              return full
            }
            ids = d.doc_id :: ids
            tokens += d.n_tokens
            if (tokens >= maxTokens) return emit()
          }
          emit() // trailing partial bin
        }
      }
    }
  }

  /** Small-file COMPACTION planning — the lake-maintenance twin of
    * [[packGreedy]]: the daily hive layout (s3.py:60's `date=` dirs per
    * job) accretes one file per (job, day), most far below a healthy scan
    * size, and a maintenance pass must group them into ~`targetRows`
    * compaction bins. The plan is computed over the FILE MANIFEST only
    * (one bounded row per file — at 100 TB a million files is a million
    * manifest rows, never data): files sort by (rows DESC, label), a
    * prefix-sum assigns bin = (cumsum - rows) DIV target (sorted
    * sequential fill — deterministic, engine-replayable, and within one
    * oversize file of first-fit-decreasing's quality), and each bin row
    * carries its file count, row mass, fill ratio, and an order-free md5
    * fingerprint of its member list that a resumed compactor checks
    * before rewriting. Oversize files keep a bin of their own. The
    * prefix-sum window runs under an explicit constant partition key —
    * the registry's bounded-input idiom (the manifest IS bounded).
    * The physical rewrite is `repartition(bin).write`; this plan is its
    * audit twin, like shardPlan is for training shards.
    */
  def compactionPlan(events: DataFrame, typeCol: String, tsCol: String,
      targetRows: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val manifest = events
      .groupBy(col(typeCol), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n_rows"))
      .select(concat(col(typeCol), lit(":"), col("day").cast("string"))
        .as("file"), col("n_rows"))
    val w = Window.partitionBy(lit(0))
      .orderBy(col("n_rows").desc, col("file").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .withColumn("cum", sum(col("n_rows")).over(w))
      .withColumn("bin",
        expr(s"(cum - n_rows) DIV ${targetRows}").cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("total_rows"),
        md5(concat_ws(",", sort_array(collect_list(col("file")))))
          .as("files_fp"))
      .select(col("bin"), col("n_files"), col("total_rows"),
        floor(col("total_rows") * 10000.0 / targetRows + 0.5).cast("long")
          .as("fill_bp"), col("files_fp"))
      .orderBy(col("bin"))
  }
}
