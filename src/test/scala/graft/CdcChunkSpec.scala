package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftnative.ContentChunkHashes.contentChunkHashes

class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and keeps running through the field " * 8

  private def chunksOf(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toSeq.toDF("id", "text")
      .select(col("id"), contentChunkHashes(col("text"), window = 8, maskBits = 5).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("chunking is deterministic and covers the document") {
    val a = chunksOf(1L -> base)(1L)
    val b = chunksOf(1L -> base)(1L)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("a local edit preserves most chunks (the CDC property)") {
    val edited = base.substring(0, 100) + "INSERTED TEXT HERE " + base.substring(100)
    val m = chunksOf(1L -> base, 2L -> edited)
    val orig = m(1L).toSet
    val upd = m(2L).toSet
    val shared = (orig & upd).size.toDouble / orig.size
    assert(shared > 0.5, s"only ${shared * 100}%% of chunks survived a local edit")
  }

  test("identical documents share all chunk hashes") {
    val m = chunksOf(1L -> base, 2L -> base)
    assert(m(1L) == m(2L))
  }

  test("portable digests share the FNV variant's boundaries exactly") {
    import org.apache.spark.sql.functions.size
    import org.apache.spark.sql.graftnative.ContentChunkHashes.contentChunkHashesPortable
    val edited = base.substring(0, 50) + "XX" + base.substring(50)
    val both = Seq(1L -> base, 2L -> edited).toDF("id", "text")
      .select(col("id"),
        size(contentChunkHashes(col("text"), 8, 5)).as("n_fnv"),
        size(contentChunkHashesPortable(col("text"), 8, 5)).as("n_portable"))
      .collect()
    both.foreach(r => assert(r.getInt(1) == r.getInt(2)))
  }
}
