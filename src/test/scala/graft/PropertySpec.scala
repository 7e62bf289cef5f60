package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Etl, RangeJoin}

/** Randomized equivalence properties (fixed seeds): each optimized /
  * restructured operator must agree with a naive reference formulation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("SortedIntersectCount agrees with array_intersect on random sets") {
    val rnd = new Random(7)
    val rows = Seq.fill(60) {
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val bad = df.select(
        org.apache.spark.sql.graftnative.SortedIntersectCount
          .sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("saltedSumCount agrees with direct aggregation on random data") {
    val rnd = new Random(11)
    val df = Seq.fill(500)((s"k${rnd.nextInt(5)}", rnd.nextInt(10000) / 100.0))
      .toDF("key", "v")
    val salted = Etl.saltedSumCount(df, "key", "v", salt = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = df.groupBy("key")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("s"), count(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("asofJoin agrees with a naive max-filter formulation on random data") {
    val rnd = new Random(13)
    val left = Seq.tabulate(80)(i => (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(1000).toLong))
    val right = Seq.tabulate(60)(i => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, s"v$i"))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
    val l = left.toDF("k", "id", "lts")
    val r = right.toDF("k", "rts", "v")

    val fast = AsOf.asofJoin(l, r, Seq("k"), "lts", "rts")
      .collect().map(x => (x.getLong(1), Option(x.get(3)))).toMap

    val naive = left.map { case (k, id, lts) =>
      val cand = right.filter(rr => rr._1 == k && rr._2 <= lts)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._2))
    }.toMap
    assert(fast == naive)
  }

  test("bucketed range join agrees with a naive inequality join") {
    val rnd = new Random(17)
    val points = Seq.tabulate(100)(i => (i.toLong, rnd.nextInt(200) / 2.0)).toDF("id", "x")
    val intervals = Seq.tabulate(30) { i =>
      val lo = rnd.nextInt(180) / 2.0
      (s"i$i", lo, lo + rnd.nextInt(30) / 2.0)
    }.toDF("name", "lo", "hi")
    val fast = RangeJoin.bucketed(points, intervals, "x", "lo", "hi", bucketWidth = 7.0)
      .select("id", "name").as[(Long, String)].collect().toSet
    val naive = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(fast == naive)
  }

  test("NearestCells agrees with a brute-force argmin on random vectors") {
    val rnd = new Random(19)
    val dim = 12
    val cents: Seq[Seq[Float]] =
      Seq.fill(9)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val vecs = Seq.fill(120)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val fast = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        org.apache.spark.sql.graftnative.NearestCells
          .nearestCells(col("embedding"), cents, 3).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      val naive = cents.zipWithIndex.map { case (c, ci) =>
        val d = v.zip(c).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
        (d, ci)
      }.sortBy(identity).take(3).map(_._2)
      assert(fast(id) == naive, s"vec $id: ${fast(id)} vs $naive")
    }
  }

  test("ByteVecDot agrees with an integer dot on random int8 codes") {
    val rnd = new Random(23)
    // Seq[Byte] (not Array[Byte], which Spark encodes as BINARY) so the
    // column type is array<tinyint>
    val rows = Seq.fill(80) {
      val n = 1 + rnd.nextInt(30)
      (Seq.fill(n)((rnd.nextInt(255) - 127).toByte),
        Seq.fill(n)((rnd.nextInt(255) - 127).toByte))
    }
    val fast = rows.toDF("a", "b")
      .select(org.apache.spark.sql.graftnative.ByteVecDot.bdot(col("a"), col("b")))
      .collect().map(_.getLong(0))
    rows.zip(fast).foreach { case ((a, b), got) =>
      val want = a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
      assert(got == want)
    }
  }

  test("native GramHashes matches the interpreted HOF fold on random docs") {
    val rnd = new Random(23)
    val words = Seq("a", "bb", "ccc", "", "d e", "é", "日本", "x9", "zz")
    val docs = Seq.tabulate(60) { i =>
      val n = rnd.nextInt(14) // includes docs shorter than the window
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    for (n <- Seq(2, 3, 8)) {
      val native = docs
        .select(col("doc_id"),
          org.apache.spark.sql.graftnative.GramHashes.gramHashes(toks, n).as("h"))
        .orderBy("doc_id").select(to_json(struct(col("h")))).as[String].collect().toSeq
      val hof = docs
        .select(col("doc_id"),
          when(size(toks) >= n,
            transform(sequence(lit(1), size(toks) - (n - 1)),
              i => org.apache.spark.sql.graftnative.RollingHash
                .rollingHash(array_join(slice(toks, i, lit(n)), " ")))).as("h"))
        .orderBy("doc_id").select(to_json(struct(col("h")))).as[String].collect().toSeq
      assert(native == hof, s"n=$n")
    }
  }

  test("native DsirBuckets/DsirScore match the interpreted salted-fold HOF on random docs") {
    val rnd = new Random(31)
    val words = Seq("a", "bb", "ccc", "", "é", "日本", "x9", "zz", "qqq")
    val docs = Seq.tabulate(80) { i =>
      val n = 1 + rnd.nextInt(12) // always >= 1 token, incl. 1-token docs
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val m = 64L
    val grams = concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))
    val hof = docs.select(col("doc_id"),
      transform(grams, g => pmod(org.apache.spark.sql.graftnative.RollingHash
        .rollingHash(concat(lit("dsir:"), g)), lit(m))).as("b"))
      .orderBy("doc_id").select(to_json(struct(col("b")))).as[String].collect().toSeq
    val native = docs.select(col("doc_id"),
      org.apache.spark.sql.graftnative.DsirHash.dsirBuckets(toks, m).as("b"))
      .orderBy("doc_id").select(to_json(struct(col("b")))).as[String].collect().toSeq
    assert(native == hof)

    val w = Array.tabulate(m.toInt)(i => (i * 37 - 1000).toLong)
    val scoreHof = docs.select(col("doc_id"),
      aggregate(
        transform(grams, g => pmod(org.apache.spark.sql.graftnative.RollingHash
          .rollingHash(concat(lit("dsir:"), g)), lit(m))),
        lit(0L), (acc, b) => acc + element_at(lit(w), (b + 1).cast("int"))).as("s"))
      .orderBy("doc_id").select(col("s")).as[Long].collect().toSeq
    val scoreNative = docs.select(col("doc_id"),
      org.apache.spark.sql.graftnative.DsirHash.dsirScore(toks, w).as("s"))
      .orderBy("doc_id").select(col("s")).as[Long].collect().toSeq
    assert(scoreNative == scoreHof)
  }

  test("runningTotals agrees with an in-memory exact-cents fold on random data") {
    val rnd = new Random(47)
    val rows = Seq.tabulate(400) { i =>
      (rnd.nextInt(8).toLong, i.toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(100000) / 100.0)
    }
    val out = graft.operators.Analytics.runningTotals(
      rows.toDF("user_id", "event_id", "ts", "value"),
      "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val model = rows.groupBy(_._1).flatMap { case (_, evs) =>
      var cents = 0L
      evs.sortBy(e => (e._3.getTime, e._2)).map { e =>
        cents += math.round(e._4 * 100); e._2 -> cents / 100.0
      }
    }
    model.foreach { case (id, v) => assert(out(id) === v, s"event $id") }
  }

  test("cdcApply agrees with an in-memory last-writer-wins model on random logs") {
    val rnd = new Random(53)
    val rows = Seq.tabulate(500) { i =>
      (rnd.nextInt(30).toLong, i.toLong, rnd.nextInt(40).toLong,
        rnd.nextDouble(), if (rnd.nextInt(4) == 0) "D" else "U")
    }
    val out = graft.operators.Analytics.cdcApply(
      rows.toDF("k", "id", "seq", "payload", "op"), "k", "seq", "id", "op", "D")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    val model = rows.groupBy(_._1).flatMap { case (k, log) =>
      val newest = log.maxBy(e => (e._3, e._2))
      if (newest._5 == "D") None else Some(k -> (newest._2, log.size.toLong))
    }
    assert(out === model)
  }

  test("winsorize agrees with an in-memory rank model on random data") {
    val rnd = new Random(59)
    val rows = Seq.tabulate(300)(i => (s"g${i % 3}", rnd.nextInt(20000) / 100.0 - 50))
    val out = graft.operators.Analytics.winsorize(
      rows.toDF("t", "v"), "t", "v", 50, 950)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val cents = vs.map(v => math.round(v._2 * 100)).sorted
      val n = cents.length
      val lo = cents((n * 50 + 999) / 1000 - 1)
      val hi = cents((n * 950 + 999) / 1000 - 1)
      val win = cents.map(c => math.min(math.max(c, lo), hi)).sum
      assert(out(g) === ((lo / 100.0, hi / 100.0,
        cents.count(_ < lo).toLong, cents.count(_ > hi).toLong, win / 100.0)), s"group $g")
    }
  }

  test("gapFillDaily agrees with an in-memory spine+LOCF model on random data") {
    val rnd = new Random(61)
    val day0 = java.time.LocalDate.parse("2024-02-01")
    val rows = Seq.tabulate(300) { i =>
      val d = rnd.nextInt(12)
      (rnd.nextInt(6).toLong,
        java.sql.Timestamp.valueOf(day0.plusDays(d).atTime(rnd.nextInt(24), 0)),
        if (rnd.nextInt(3) == 0) "purchase" else "view",
        rnd.nextInt(10000) / 100.0)
    }
    val out = graft.operators.Analytics.gapFillDaily(
      rows.toDF("user_id", "ts", "event_type", "value"),
      "user_id", "ts", "value", "event_type", "purchase")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toMap
    // model
    val allDays = rows.map(_._2.toLocalDateTime.toLocalDate)
    val (lo, hi) = (allDays.min, allDays.max)
    val daily = rows.filter(_._3 == "purchase")
      .groupBy(r => (r._1, r._2.toLocalDateTime.toLocalDate))
      .map { case (k, es) => k -> es.map(e => math.round(e._4 * 100)).sum / 100.0 }
    val users = daily.keys.map(_._1).toSet
    val expected = users.flatMap { u =>
      var lastSeen: Option[Double] = None
      Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).map { d =>
        val obs = daily.get((u, d))
        if (obs.isDefined) lastSeen = obs
        (u, d.toString) -> (lastSeen, obs.isEmpty)
      }.toSeq
    }.toMap
    assert(out === expected)
  }

  test("native minhash signatures are stable across partitionings") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(30)(s"w${(i * 7 + 3) % 11}").mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    def sigs(parts: Int) =
      graft.operators.Dedup.minhashSignatures(docs.repartition(parts), 32)
        .orderBy("doc_id").select(to_json(struct(col("sig")))).as[String].collect().toSeq
    assert(sigs(1) == sigs(8))
  }

  test("repetitionMetrics agrees with an in-memory model on random docs") {
    val rnd = new Random(17)
    val docs = Seq.tabulate(40) { i =>
      val n = 3 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(s"t${rnd.nextInt(6)}").mkString(" "))
    }
    val out = graft.operators.TextAnalysis
      .repetitionMetrics(docs.toDF("doc_id", "text"), n = 3, dupFracCut = 0.1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("top_gram_cnt"),
          r.getAs[Long]("dup_gram_cnt"))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = (grams.size.toLong, counts.values.max,
        counts.values.filter(_ > 1).sum)
      assert(out(id) == expected, s"doc $id: ${out(id)} != $expected")
    }
  }

  test("semDedup drop rule: dup_of is always a lower id in the same cell") {
    val rnd = new Random(19)
    val vecs = Seq.tabulate(120) { i =>
      // clustered directions with small jitter -> plenty of near-dups
      val base = Array.fill(8)(0.0f)
      base(i % 4) = 4.0f
      base((i + 1) % 8) = rnd.nextFloat() * 0.3f
      (i.toLong, base)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.train(df, k = 4, iters = 2)
    val dropped = graft.operators.Similarity.semDedup(df, centroids, minCosine = 0.98)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"),
        r.getAs[Long]("n_dups")))
    assert(dropped.nonEmpty)
    dropped.foreach { case (v, dupOf, nDups) =>
      assert(dupOf < v, s"dup_of $dupOf not lower than $v")
      assert(nDups >= 1)
    }
    // determinism across partition layouts
    val again = graft.operators.Similarity
      .semDedup(df.repartition(7), centroids, minCosine = 0.98)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"),
        r.getAs[Long]("n_dups"))).toSet
    assert(again == dropped.toSet)
  }

  test("bloom decontam dominates the exact gate on random corpora (no false negatives)") {
    val rnd = new Random(17)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    def sentence(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq.tabulate(80)(i => (i.toLong, sentence(6 + rnd.nextInt(20))))
      .toDF("doc_id", "text")
    val bench = Seq.tabulate(10)(i => (1000L + i, sentence(12))).toDF("doc_id", "text")
    val exact = graft.operators.Contamination.decontaminateStream(docs, bench, n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))).toMap
    val bloom = graft.operators.Contamination.decontaminateBloom(docs, bench, n = 4,
      mBits = 4096, kProbes = 3) // small filter: false positives likely
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, (ng, nh)) =>
      assert(bloom(id)._1 == ng)
      assert(bloom(id)._2 >= nh, s"doc $id: bloom ${bloom(id)._2} < exact $nh")
    }
  }

  test("cms estimates dominate true counts on random corpora at any width") {
    val rnd = new Random(19)
    for (w <- Seq(4, 64, 2048)) {
      val docs = Seq.tabulate(40)(i =>
        (i.toLong, Seq.fill(15)(s"t${rnd.nextInt(25)}").mkString(" ")))
        .toDF("doc_id", "text")
      graft.operators.Approx.cmsTopK(docs, d = 3, w = w, k = 25)
        .collect().foreach { r =>
          assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_count"))
        }
    }
  }

  test("BPE segmentation is lossless and count-consistent on random corpora") {
    import graft.operators.Bpe
    val rnd = new Random(23)
    def word() = Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(6)).toChar).mkString
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(25))(word()).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, vocabSize = 500, numMerges = 10)
    val enc = docs.select(col("doc_id"), col("text"),
        Bpe.encode(col("text"), merges).as("ws"),
        Bpe.tokenCount(col("text"), merges).as("n_bpe"))
      .collect()
    enc.foreach { r =>
      val text = r.getAs[String]("text")
      val ws = r.getSeq[String](r.fieldIndex("ws")).toList
      // LOSSLESS: stripping separators from each word string reproduces
      // the original tokens exactly — merges re-segment, never rewrite
      assert(ws.map(_.replace(Bpe.Sep, "")) ==
        text.split(" ").filter(_.nonEmpty).toSeq)
      // count-consistent: the aggregate column equals the per-word sum
      assert(r.getAs[Long]("n_bpe") ==
        ws.map(w => w.sliding(1).count(_ == Bpe.Sep) - 1).sum)
      // monotone: merges only shrink token counts, floor 1 per word
      val nChars = text.split(" ").filter(_.nonEmpty).map(_.length.toLong).sum
      assert(r.getAs[Long]("n_bpe") <= nChars)
      assert(r.getAs[Long]("n_bpe") >= ws.size)
    }
  }

  test("column-expression encode equals reference canonical BPE (Sennrich)") {
    import graft.operators.Bpe
    // the r6 doubled-boundary claim, checked against an independent
    // symbol-vector implementation of left-to-right non-overlapping
    // merging — repeated-character words are the adversarial case (the
    // single-separator representation mis-segmented exactly these)
    def canonical(word: String, merges: Seq[(String, String)]): Seq[String] = {
      var syms = word.map(_.toString).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val rnd = new Random(31)
    // heavy repetition: 3-letter alphabet, runs like "aaab", "bbbb"
    def word() = Seq.fill(1 + rnd.nextInt(10))(('a' + rnd.nextInt(3)).toChar).mkString
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(20))(word()).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, vocabSize = 500, numMerges = 12)
    val rules = merges.filter(_ != Bpe.NoMerge).map { m =>
      val Array(a, b) = m.split(Bpe.Sep); (a, b)
    }
    docs.select(col("text"), Bpe.encode(col("text"), merges).as("ws"))
      .collect().foreach { r =>
        val got = r.getSeq[String](1)
          .map(_.split(Bpe.Sep).filter(_.nonEmpty).toSeq)
        val want = r.getString(0).split(" ").filter(_.nonEmpty).toSeq
          .map(w => canonical(w, rules))
        assert(got == want)
      }
  }

  test("NearestCellDist agrees with an in-memory argmin model on random data") {
    val rnd = new Random(37)
    val dim = 5
    val cents = Seq.fill(7)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    // include exact centroid copies so distance-0 and tie paths execute
    val vecs = (Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))) ++
      cents.take(3).zipWithIndex.map { case (c, i) => (100L + i, c.toArray) })
      .toDF("vec_id", "embedding")
    val got = vecs.select(col("vec_id"),
        org.apache.spark.sql.graftnative.NearestCells
          .nearestCellDist(col("embedding"), cents).as("nd"))
      .select(col("vec_id"), col("nd.cell"), col("nd.d"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // the model replays the exact contract: ascending-index double fold,
    // strict < so the EARLIER centroid wins exact ties
    val model = vecs.collect().map { r =>
      val e = r.getSeq[Float](1)
      var bd = Double.MaxValue; var bc = -1
      cents.zipWithIndex.foreach { case (c, ci) =>
        var d = 0.0; var i = 0
        while (i < dim) { val x = e(i).toDouble - c(i).toDouble; d += x * x; i += 1 }
        if (d < bd) { bd = d; bc = ci }
      }
      r.getLong(0) -> ((bc, bd))
    }.toMap
    assert(got == model)
    // and it agrees with NearestCells' top-1 on the same rows
    val top1 = vecs.select(col("vec_id"),
        org.apache.spark.sql.graftnative.NearestCells
          .nearestCell(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.view.mapValues(_._1).toMap == top1)
  }

  test("mortonCode round-trips random int pairs at bits=31") {
    val rnd = new Random(41)
    val pairs = Seq.fill(100)((rnd.nextInt(Int.MaxValue), rnd.nextInt(Int.MaxValue)))
    val out = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.pipeline.Pipeline.mortonCode(col("x"), col("y"), 31).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(z >= 0, s"negative z for ($x, $y)")
      var dx = 0L; var dy = 0L
      (0 until 31).foreach { b =>
        dx |= ((z >> (2 * b)) & 1L) << b
        dy |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert(dx == x.toLong && dy == y.toLong, s"roundtrip failed for ($x, $y)")
    }
  }
}
