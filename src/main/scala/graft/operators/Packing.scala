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

  /** Deterministic LENGTH-BUCKETED packing PLAN — the engine-replayable
    * twin of [[packGreedy]] (which is honest per-partition imperative
    * state and therefore depends on the caller's partitioning): docs
    * bucket by token-count BIT LENGTH (class k holds 2^(k−1) < n ≤ 2^k,
    * the q_degree_hist boundary-exact log2), and within a (class, shard)
    * cell a fixed capacity of maxTokens DIV 2^k docs per bin — every
    * member is ≤ 2^k tokens, so the HARD CAP total ≤ maxTokens holds by
    * construction (certified per bin in `within_cap`), with fill ≥ ~50%
    * per class (each member is > half its class upper). Docs longer
    * than maxTokens land in class −1 as singleton bins, flagged for the
    * caller to window first (TextAnalysis.tokenWindows).
    *
    * Determinism: the shard is the salted portable fold (the splits-and-
    * buckets rule), the within-cell order is doc_id, and the bin index
    * is a row_number DIV — no partition-order dependence anywhere, so
    * the full plan (including each bin's order-free member fingerprint,
    * the compactionPlan resume idiom) replays on any engine.
    *
    * Scale shape: ONE token-count scan, then the row_number windows run
    * per (class, shard) — sharding bounds every window partition at
    * |docs| / (classes·shards), no single-reducer global sort (bins
    * never span shards, so parallel packing costs only the fill lost to
    * ≤ shards−1 partial bins per class). Output is |bins| rows.
    */
  def packPlanBucketed(docs: DataFrame, maxTokens: Long,
      shards: Int = 4): DataFrame = {
    require(maxTokens > 0 && shards >= 1)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    val toks = docs
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val classed = toks
      .withColumn("cls", when(col("n_tokens") > maxTokens, lit(-1L))
        .otherwise(length(bin(col("n_tokens"))).cast("long")))
      .withColumn("shard", pmod(rollingHash(
        concat(lit("pack:"), col("doc_id").cast("string"))), lit(shards))
        .cast("long"))
      .withColumn("cap", when(col("cls") === -1L, lit(1L))
        .otherwise(greatest(lit(1L),
          expr(s"$maxTokens DIV shiftleft(CAST(1 AS BIGINT), CAST(cls AS INT))"))))
    val w = Window.partitionBy(col("cls"), col("shard"))
      .orderBy(col("doc_id"))
    classed
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("bin_idx", expr("(rn - 1) DIV cap"))
      .groupBy(col("cls"), col("shard"), col("bin_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        md5(concat_ws(",", sort_array(collect_list(col("doc_id")))))
          .as("members_fp"))
      .select(
        concat(lit("c"), col("cls"), lit(":"), col("shard"), lit(":"),
          col("bin_idx")).as("bin_id"),
        col("cls"), col("n_docs"), col("total_tokens"),
        expr(s"total_tokens * 10000 DIV $maxTokens").as("fill_bp"),
        (col("total_tokens") <= maxTokens).as("within_cap"),
        col("members_fp"))
      .orderBy(col("bin_id"))
  }
}
