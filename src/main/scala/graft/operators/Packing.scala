package graft.operators

import org.apache.spark.sql.Dataset

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
}
