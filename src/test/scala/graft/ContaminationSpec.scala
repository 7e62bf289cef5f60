package graft

import graft.operators.{Contamination, TextAnalysis}

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // 12-token docs; doc 2 shares its first 8 tokens with doc 1 (one shared
  // 3-gram run), doc 3 is disjoint vocabulary.
  private def docs = Seq(
    (1L, "a b c d e f g h i j k l"),
    (2L, "a b c d e f g h x y z w"),
    (3L, "p q r s t u v w2 p2 q2 r2 s2")
  ).toDF("doc_id", "text")

  test("decontaminate counts overlapping distinct n-grams against a broadcast benchmark") {
    // benchmark = doc 1's full text; n=3 -> doc 1 has 10 trigrams, doc 2
    // shares exactly the 6 trigrams inside "a b c d e f g h".
    val bench = docs.where($"doc_id" === 1)
    val out = Contamination.decontaminate(docs, bench, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))).toMap
    assert(out(1L) == ((10L, 10L)))
    assert(out(2L) == ((10L, 6L)))
    assert(!out.contains(3L))
  }

  test("decontaminate hit_ratio uses the stable floor rounding") {
    val bench = docs.where($"doc_id" === 1)
    val r = Contamination.decontaminate(docs, bench, n = 3)
      .where($"doc_id" === 2).head()
    assert(math.abs(r.getAs[Double]("hit_ratio") - 0.6) < 1e-12)
  }

  test("dupSpans finds one maximal run of shared windows") {
    val out = Contamination.dupSpans(docs, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_spans"))).toMap
    // docs 1 and 2 share trigram positions 1..6; doc 3 has none.
    assert(out(1L) == ((10L, 6L, 1L)))
    assert(out(2L) == ((10L, 6L, 1L)))
    assert(!out.contains(3L))
  }

  test("dupSpans counts split runs as separate spans") {
    // doc 5 repeats doc 4's tokens at the start AND end with a unique gap.
    val d2 = Seq(
      (4L, "a b c d m1 m2 m3 w x y z q"),
      (5L, "a b c d g1 g2 g3 w x y z q")
    ).toDF("doc_id", "text")
    val out = Contamination.dupSpans(d2, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_dup_windows"), r.getAs[Long]("n_spans"))).toMap
    // shared trigrams: positions 1,2 ("a b c","b c d") and 8,9,10
    // ("w x y","x y z","y z q") -> 5 dup windows in 2 spans, each doc.
    assert(out(4L) == ((5L, 2L)))
    assert(out(5L) == ((5L, 2L)))
  }

  test("docs shorter than n produce no windows") {
    val tiny = Seq((9L, "a b")).toDF("doc_id", "text")
    assert(Contamination.dupSpans(tiny, n = 3).count() == 0)
    assert(Contamination.decontaminate(tiny, tiny, n = 3).count() == 0)
  }

  test("pairDupSpans reports per-pair extents at both docs' offsets") {
    // doc 5 shares doc 4's head at a DIFFERENT offset (prefix "zz " shifts
    // it by one token) and its tail at the same offset; extents must carry
    // each side's own start position
    val d2 = Seq(
      (4L, "a b c d m1 m2 m3 w x y z q"),
      (5L, "zz a b c d g2 g3 w x y z q")
    ).toDF("doc_id", "text")
    val out = Contamination.pairDupSpans(d2, n = 3, maxOcc = 8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
        r.getAs[Long]("span_tokens"))).toSet
    // head: "a b c d" = 4 tokens at pos 1 in doc 4, pos 2 in doc 5;
    // tail: "w x y z q" = 5 tokens at pos 8 in both
    assert(out == Set((4L, 5L, 1L, 2L, 4L), (4L, 5L, 8L, 8L, 5L)))
  }

  test("pairDupSpans hotness cap excludes replica-clique grams") {
    // 6 identical docs: every gram occurs 6 times > maxOcc = 4, so the
    // pair listing is empty — the clique belongs to exact dedup, not the
    // per-pair diagnostic (C(6,2) rows would otherwise appear per span)
    val clique = (1L to 6L).map(i => (i, "a b c d e f g h"))
      .toDF("doc_id", "text")
    assert(Contamination.pairDupSpans(clique, n = 3, maxOcc = 4).count() == 0)
    // at maxOcc >= 6 the pairs appear: full-doc span for each of 15 pairs
    val listed = Contamination.pairDupSpans(clique, n = 3, maxOcc = 6)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("span_tokens")))
    assert(listed.length == 15)
    assert(listed.forall(_._3 == 8L))
  }

  test("scrubDupSpans removes shared spans keep-first, rebuilds text in order") {
    val out = Contamination.scrubDupSpans(docs, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"))).toMap
    assert(out.size == 3)
    // doc 1 is the lowest id containing the shared trigrams: untouched
    assert(out(1L) == (("a b c d e f g h i j k l", 12L, 0L)))
    // doc 2: dup window starts 1..6 cover tokens 1..8 ("a".."h")
    assert(out(2L) == (("x y z w", 4L, 8L)))
    // doc 3 shares nothing
    assert(out(3L) == (("p q r s t u v w2 p2 q2 r2 s2", 12L, 0L)))
  }

  test("scrubDupSpans keeps short docs (< n tokens) verbatim") {
    val d = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Contamination.scrubDupSpans(d, n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b", 2L -> "a b"))
  }

  test("decontaminateStream matches the join-based report on contaminated docs") {
    val docs = Seq(
      (1L, "the bench sentence one two three four five plus trailing words"),
      (2L, "completely different clean tokens nothing shared here at all ok"),
      (3L, "x the bench sentence one two three four five y z")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the bench sentence one two three four five"))
      .toDF("doc_id", "text")
    val scan = Contamination.decontaminateStream(docs, bench, n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("hit_ratio"))).toMap
    val joined = Contamination.decontaminate(docs, bench, n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("hit_ratio"))).toMap
    // every contaminated doc agrees with the join-based report; the scan
    // form additionally lists clean docs with zero hits
    joined.foreach { case (id, v) => assert(scan(id) == v) }
    assert(scan(2L)._2 == 0L)
  }

  test("decontaminateStream runs as a structured stream") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val bench = Seq((100L, "the bench sentence one two three four five"))
      .toDF("doc_id", "text")
    val out = Contamination.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), bench, n = 8)
    val chk = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    val query = out.writeStream
      .format("memory").queryName("decontam_scan")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    input.addData(
      (1L, "the bench sentence one two three four five plus trailing words"),
      (2L, "completely different clean tokens nothing shared here at all ok"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("decontam_scan").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(rows(1L) > 0L)
    assert(rows(2L) == 0L)
  }

  test("decontaminateBloom never misses an exact hit and matches exact counts on a sparse filter") {
    val bench = docs.where($"doc_id" === 1)
    val exact = Contamination.decontaminateStream(docs, bench, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))).toMap
    val bloom = Contamination.decontaminateBloom(docs, bench, n = 3,
      mBits = 65536, kProbes = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, (ng, nh)) =>
      assert(bloom(id)._1 == ng)
      // zero false negatives always; at 10 grams x 4 probes in 2^16 bits
      // the false-positive probability is ~(40/65536)^4 ~ 1e-13, so the
      // counts must be exactly the exact-set counts here
      assert(bloom(id)._2 == nh)
    }
  }

  test("bloomCalibration: zero FP on a sparse filter, real FP on a saturated one") {
    val bench = docs.where($"doc_id" === 1)
    // 2^16 bits for 10 grams: FP probability ~1e-13 -> measured FPR 0
    val sparse = Contamination.bloomCalibration(docs, bench, n = 3,
      mBits = 65536, kProbes = 4).collect()(0)
    assert(sparse.getAs[Long]("n_docs") == 3L)
    assert(sparse.getAs[Long]("n_probes") == 30L) // 10 distinct grams/doc
    assert(sparse.getAs[Long]("n_true_hits") == 16L) // 10 (doc1) + 6 (doc2)
    assert(sparse.getAs[Long]("n_false_pos") == 0L)
    assert(sparse.getAs[Long]("fpr_bp") == 0L)
    assert(sparse.getAs[Long]("n_docs_false_flagged") == 0L)
    // 64 bits, 4 probes x 10 grams: ~half the bits set -> disjoint doc 3
    // MUST collide somewhere; zero false negatives must still hold
    val tight = Contamination.bloomCalibration(docs, bench, n = 3,
      mBits = 64, kProbes = 4).collect()(0)
    assert(tight.getAs[Long]("n_true_hits") == 16L) // ground truth unchanged
    assert(tight.getAs[Long]("n_bloom_hits") >=
      tight.getAs[Long]("n_true_hits")) // no FN ever
    assert(tight.getAs[Long]("n_false_pos") > 0L) // saturation shows up
    assert(tight.getAs[Long]("fpr_bp") > 0L)
  }

  test("scan-shaped gates (bloom, normalize) run unchanged as structured streams") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val bench = Seq((100L, "the bench sentence one two three four five"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val gated = Contamination.decontaminateBloom(
      input.toDF().toDF("doc_id", "text"), bench, n = 8, mBits = 4096, kProbes = 3)
    val normed = TextAnalysis.normalizeText(input.toDF().toDF("doc_id", "text"))
    val chk1 = java.nio.file.Files.createTempDirectory("graft-bloomstream").toString
    val chk2 = java.nio.file.Files.createTempDirectory("graft-normstream").toString
    val q1 = gated.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").option("checkpointLocation", chk1).start()
    val q2 = normed.writeStream.format("memory").queryName("norm_stream")
      .outputMode("append").option("checkpointLocation", chk2).start()
    input.addData(
      (1L, "the bench sentence one two three four five plus trailing words"),
      (2L, "clean  MIXED case tokens nothing shared here at all okay fine"))
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val hits = spark.table("bloom_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(hits(1L) > 0L && hits(2L) == 0L)
    val clean = spark.table("norm_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(clean(2L) == "clean mixed case tokens nothing shared here at all okay fine")
  }

  test("bloom probe positions are deterministic and within the filter") {
    import org.apache.spark.sql.graftnative.GramBloomStats
    val ps = GramBloomStats.bitPositions(123456789L, 65536, 4)
    assert(ps.sameElements(GramBloomStats.bitPositions(123456789L, 65536, 4)))
    assert(ps.forall(p => p >= 0 && p < 65536))
  }
}
