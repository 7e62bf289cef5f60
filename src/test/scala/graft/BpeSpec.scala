package graft

import graft.operators.{Bpe, Packing}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val S = Bpe.Sep

  // "low low lower lowest" classic BPE example: 'lo' wins round 1 (4 hits),
  // 'low' round 2, then 'low' as a full word ('low' + trailing context is
  // word-internal only here, so round 3 merges 'w' into 'low'... verified
  // against a hand trace below).
  private def corpus = Seq(
    (1L, "low low low lower lower lowest"),
    (2L, "low lower newest newest newest")
  ).toDF("doc_id", "text")

  test("trainMerges learns the expected first merges, deterministically") {
    val m1 = Bpe.trainMerges(corpus, vocabSize = 100, numMerges = 4)
    val m2 = Bpe.trainMerges(corpus, vocabSize = 100, numMerges = 4)
    assert(m1 == m2)
    // hand trace: pairs of {low:4, lower:3, newest:3, lowest:1}
    // round 1: l+o = 4+3+1 = 8, o+w = 8, w+e = 3+3+1, e+r = 3+3(wrong: lower
    // only)... argmax ties l+o / o+w at 8 -> 'l'+'o' wins on pair asc.
    assert(m1.head == s"l${S}o")
    // round 2: lo+w now 8 -> merges to 'low'
    assert(m1(1) == s"lo${S}w")
  }

  test("encode applies merges left-to-right, non-overlapping") {
    val merges = Bpe.trainMerges(corpus, vocabSize = 100, numMerges = 4)
    val out = corpus.select(col("doc_id"),
      Bpe.encode(col("text"), merges).as("ws")).orderBy("doc_id")
      .as[(Long, Seq[String])].collect()
    // every word string keeps its sentinels and has symbols - 1 separators
    out.foreach { case (_, ws) =>
      ws.foreach { w =>
        assert(w.startsWith(S) && w.endsWith(S))
        assert(!w.contains(S + S)) // no empty symbols
      }
    }
    // 'low' is fully merged into one symbol after round 2
    val low = out.head._2.head
    assert(low == s"${S}low${S}")
  }

  test("adjacent occurrences of a merged pair segment canonically") {
    // the r5 ADVICE case: with single-sep boundaries the first replace
    // consumed the shared separator and "aaaa" mis-segmented to [aa,a,a];
    // the doubled-boundary representation yields canonical left-to-right
    // non-overlapping BPE: [aa,aa] and (for "aaaaa") [aa,aa,a]
    val df = Seq((1L, "aaaa aaaaa")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, vocabSize = 10, numMerges = 1)
    assert(merges.head == s"a${S}a")
    val ws = df.select(Bpe.encode(col("text"), merges).as("ws"))
      .as[Seq[String]].collect().head
    assert(ws(0) == s"${S}aa${S}aa${S}")
    assert(ws(1) == s"${S}aa${S}aa${S}a${S}")
    val counts = Bpe.tokenCounts(df, merges).collect().head
    assert(counts.getAs[Long]("n_bpe_tokens") == 5L)
  }

  test("pair-pool exhaustion pads with the no-op sentinel") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // 'ab' has one pair; after merging it there is nothing left
    val merges = Bpe.trainMerges(tiny, vocabSize = 10, numMerges = 5)
    assert(merges.head == s"a${S}b")
    assert(merges.tail.forall(_ == Bpe.NoMerge))
    // the sentinel merge is a no-op on encode
    val counts = Bpe.tokenCounts(tiny, merges).collect().head
    assert(counts.getAs[Long]("n_tokens") == 2L)
    assert(counts.getAs[Long]("n_bpe_tokens") == 2L) // one symbol per word
  }

  test("tokenCounts: empty tokens are dropped, counts are exact") {
    val df = Seq((1L, "aa  aa a"), (2L, "")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, vocabSize = 10, numMerges = 1)
    assert(merges.head == s"a${S}a")
    val rows = Bpe.tokenCounts(df, merges).orderBy("doc_id").collect()
    // doc 1: tokens [aa, aa, a] (double space dropped) -> 1+1+1 symbols
    assert(rows(0).getAs[Long]("n_tokens") == 3L)
    assert(rows(0).getAs[Long]("n_bpe_tokens") == 3L)
    // doc 2: split("") yields one empty token, filtered -> zero of each
    assert(rows(1).getAs[Long]("n_tokens") == 0L)
    assert(rows(1).getAs[Long]("n_bpe_tokens") == 0L)
  }

  test("tokenizerStats rolls up per-doc counts into exact per-source ratios") {
    val df = Seq(
      (1L, "aa aa a", "web"), (2L, "aa a", "web"),
      (3L, "a a a a", "code"))
      .toDF("doc_id", "text", "source")
    val merges = Bpe.trainMerges(df, vocabSize = 10, numMerges = 1)
    val out = Bpe.tokenizerStats(df, merges)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // per-doc ground truth from tokenCounts (hash-exact vs its oracle)
    val per = Bpe.tokenCounts(df, merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bpe_tokens")))).toMap
    val webWords = per(1L)._1 + per(2L)._1
    val webBpe = per(1L)._2 + per(2L)._2
    val web = out("web")
    assert(web.getAs[Long]("n_docs") == 2L)
    assert(web.getAs[Long]("n_words") == webWords)
    assert(web.getAs[Long]("n_bpe_tokens") == webBpe)
    assert(web.getAs[Long]("n_chars") == 7L + 4L)
    assert(web.getAs[Long]("fertility_bp") ==
      math.floor(webBpe * 10000.0 / webWords + 0.5).toLong)
    assert(out("code").getAs[Long]("n_docs") == 1L)
    // fertility >= 10000 always: a word is at least one BPE token
    assert(out.values.forall(_.getAs[Long]("fertility_bp") >= 10000L))
  }

  test("trained merges apply unchanged to a structured stream") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // train offline on the static corpus, tokenize documents as they
    // arrive — the production split: training is a batch job, application
    // is a pure projection that streaming executes as-is
    val merges = Bpe.trainMerges(corpus, vocabSize = 100, numMerges = 4)
    val input = MemoryStream[(Long, String)]
    val counted = Bpe.tokenCounts(input.toDF().toDF("doc_id", "text"), merges)
    val chk = java.nio.file.Files.createTempDirectory("graft-bpestream").toString
    val q = counted.writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").option("checkpointLocation", chk).start()
    input.addData((1L, "low lower lowest"), (2L, "low low"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bpe_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("bpe_hash"))).toMap
    // identical to the batch application of the same merges
    val batch = Bpe.tokenCounts(
      Seq((1L, "low lower lowest"), (2L, "low low")).toDF("doc_id", "text"),
      merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("bpe_hash"))).toMap
    assert(got == batch)
  }

  test("packing consumes BPE counts: bins respect the subword budget") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.trainMerges(docs, vocabSize = 1000, numMerges = 12)
    val scored = docs.select(col("doc_id").as("doc_id"),
      Bpe.tokenCount(col("text"), merges).as("n_tokens"))
      .as[Packing.DocTokens]
    val maxTokens = 512L
    val bins = Packing.packGreedy(
      scored.sortWithinPartitions(col("n_tokens").desc), maxTokens).collect()
    val totalDocs = docs.count()
    assert(bins.map(_.n_docs.toLong).sum == totalDocs)
    // a bin only exceeds the budget when a single oversized doc owns it
    bins.filter(_.total_tokens > maxTokens).foreach(b => assert(b.n_docs == 1))
    // packing in subword units is denser than one doc per bin
    assert(bins.length < totalDocs)
  }
}
