package graft

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy packs every document once, respects the cap, unique bins") {
    val docs = (1L to 20L).map(i => Packing.DocTokens(i, 100 + (i % 5) * 50))
      .toDS().repartition(2)
    val bins = Packing.packGreedy(docs, maxTokens = 512).collect()
    assert(bins.flatMap(_.doc_ids).sorted.toSeq == (1L to 20L))
    bins.foreach(b => assert(b.total_tokens <= 512 || b.n_docs == 1))
    assert(bins.map(_.bin_id).distinct.length == bins.length)
  }

  test("a document longer than the cap gets a bin of its own") {
    val docs = Seq(Packing.DocTokens(1, 1000), Packing.DocTokens(2, 10),
      Packing.DocTokens(3, 20)).toDS().coalesce(1)
    val bins = Packing.packGreedy(docs, maxTokens = 512).collect()
    val big = bins.find(_.doc_ids.contains(1L)).get
    assert(big.n_docs == 1 && big.total_tokens == 1000)
    assert(bins.find(_.doc_ids.contains(2L)).get.doc_ids.contains(3L))
  }

  test("packing is deterministic for a fixed partitioning") {
    val docs = (1L to 50L).map(i => Packing.DocTokens(i, 37 * (i % 7) + 10))
      .toDS().coalesce(1)
    val a = Packing.packGreedy(docs, 256).collect().map(b => b.bin_id -> b.doc_ids).toMap
    val b = Packing.packGreedy(docs, 256).collect().map(b => b.bin_id -> b.doc_ids).toMap
    assert(a == b)
  }
}
