package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat", "en", "s0", 22L),
    (2L, "uno dos tres", "es", "s0", 12L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("qualityMetrics computes token and stopword stats") {
    val r = TextAnalysis.qualityMetrics(docs, Seq("the", "on"))
      .where($"doc_id" === 1).head()
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("stopword_count") == 3)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-12)
    assert(!r.getAs[Boolean]("is_quality")) // < 20 tokens
  }

  test("languageId picks argmax with deterministic tie-break") {
    val markers = Seq("en" -> Seq("the", "cat"), "es" -> Seq("uno", "dos"))
    val out = TextAnalysis.languageId(docs, markers)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
  }

  test("fingerprint is stable and counts shingles") {
    val a = TextAnalysis.fingerprint(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.fingerprint(docs).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.head.getAs[Long]("n_shingles") == 4) // 6 tokens -> 4 trigrams
  }

  test("native rollingHash matches the interpreted HOF fold bit-for-bit") {
    import org.apache.spark.sql.functions._
    val texts = Seq("", "a", "hello world", "the quick brown fox 0123",
      "x" * 500).toDF("text")
    val hof = aggregate(
      transform(split($"text", ""), c => ascii(c).cast("long")),
      lit(0L), (acc, c) => (acc * 257 + c) % 1000000007L)
    val out = texts.select(
      TextAnalysis.rollingHash($"text").as("native"), hof.as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("vocabTopK ranks tokens by total count with doc frequency") {
    val out = TextAnalysis.vocabTopK(docs, k = 3).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("term_count"),
        r.getAs[Long]("doc_freq"), r.getAs[Long]("rk")))
    assert(out.length == 3)
    assert(out.map(_._4).toSeq == Seq(1L, 2L, 3L))
    // "the" appears most often across the fixture docs
    assert(out.head._1 == "the")
  }

  test("tokenWindows emits strided fixed-size windows") {
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val wins = TextAnalysis.tokenWindows(d, windowTokens = 4, stride = 2)
      .collect().map(r => r.getAs[Long]("win_idx")).sorted
    assert(wins.toSeq == Seq(0L, 1L, 2L, 3L)) // starts 1,3,5,7 (len 4 each)
  }

  test("redact scrubs planted contact strings and counts matches") {
    val d = Seq((1L, "mail me at bob1@mail.com or call 555-0199 twice 555-1"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redact(d, Seq(
      "<EMAIL>" -> "[a-z0-9]+@[a-z0-9]+\\.[a-z]+",
      "<PHONE>" -> "555-[0-9]+")).head()
    assert(r.getAs[String]("clean_text") ==
      "mail me at <EMAIL> or call <PHONE> twice <PHONE>")
    assert(r.getAs[Long]("n_<EMAIL>") == 1L)
    assert(r.getAs[Long]("n_<PHONE>") == 2L)
  }

  test("normalizeText strips controls, collapses spaces, lowercases, flags changes") {
    val d = Seq(
      (1L, "Already\u0001 MESSY  text\t here "),
      (2L, "clean text stays put")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "already messy text here")
    assert(out(1L).getAs[Boolean]("changed"))
    assert(out(2L).getAs[String]("clean_text") == "clean text stays put")
    assert(!out(2L).getAs[Boolean]("changed"))
    assert(out(1L).getAs[Long]("n_chars_clean") == 23L)
  }

  test("repetitionMetrics flags gram repetition, not natural text") {
    val d = Seq(
      (1L, "a b c a b c a b c"),        // 7 trigrams, all repeated
      (2L, "one two three four five")   // 3 trigrams, all unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(d, n = 3, dupFracCut = 0.1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_grams") == 7)
    assert(out(1L).getAs[Long]("top_gram_cnt") == 3)   // "a b c" x3
    assert(out(1L).getAs[Double]("dup_frac") == 1.0)
    assert(out(1L).getAs[Boolean]("is_repetitive"))
    assert(out(2L).getAs[Long]("dup_gram_cnt") == 0)
    assert(!out(2L).getAs[Boolean]("is_repetitive"))
  }

  test("tokenIds maps by frequency rank with OOV -> 0 and stable hash") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val d = Seq((1L, "the cat the"), (2L, "dog the")).toDF("doc_id", "text")
    // counts: the=3, cat=1, dog=1; vocabSize=2 -> the->1, cat->2 (count
    // desc, token asc); dog is OOV -> 0
    val out = TextAnalysis.tokenIds(d, vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_oov") == 0)
    assert(out(1L).getAs[String]("ids_hash") == md5hex("1 2 1"))
    assert(out(2L).getAs[Long]("n_oov") == 1)
    assert(out(2L).getAs[Double]("oov_rate") == 0.5)
    assert(out(2L).getAs[String]("ids_hash") == md5hex("0 1"))
  }

  test("lmScore means the corpus-bigram log-probs per document") {
    val d = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    // c2: "a b"=2, "b a"=1, "a c"=1; c1: a=3, b=1
    // logp_u: "a b" -> floor(ln(2/3)*1e6+.5) = -405465, "b a" -> 0,
    //         "a c" -> floor(ln(1/3)*1e6+.5) = -1098612
    val out = TextAnalysis.lmScore(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_logp_r"))).toMap
    assert(out(1L) == (3L, -0.5014)) // (-405465 + 0 - 1098612)/3 rounded
    assert(out(2L) == (1L, -0.4055))
  }

  test("pplBuckets thirds each language by fluency with exact rank cuts") {
    import org.apache.spark.sql.functions.col
    // 'en' corpus: a fluent phrase repeated (head material), mild
    // variants, and one scrambled doc whose transitions are rare ->
    // lowest score -> tail. 'xx' is a 2-doc language exercising the
    // small-n cut arithmetic (n=2: r1=ceil(2/3)=1, r2=ceil(4/3)=2).
    val d = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the cat sat on the mat", "en"),
      (3L, "the cat sat on the mat", "en"),
      (4L, "the dog sat on the mat", "en"),
      (5L, "the cat ran on the mat", "en"),
      (6L, "mat the on sat cat the", "en"),
      (7L, "uno dos tres", "xx"),
      (8L, "uno dos cuatro", "xx")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.pplBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("bucket"), r.getAs[Double]("mean_logp_r"),
          r.getAs[Double]("cut_lo"), r.getAs[Double]("cut_hi"))).toMap
    assert(out.size == 8)
    // every doc bucketed; cuts monotone within each language
    out.values.foreach { case (b, _, lo, hi) =>
      assert(Set("head", "middle", "tail")(b)); assert(lo <= hi)
    }
    // the scrambled doc is the worst-scoring 'en' doc and lands in tail
    val enWorst = out.filter(_._2._2 <= out(6L)._2)
    assert(out(6L)._1 == "tail", s"scrambled doc: ${out(6L)}")
    // the thrice-repeated phrase is head material
    assert(out(1L)._1 == "head")
    // bucket rule is the value cut, exactly: score < lo -> tail, < hi ->
    // middle, else head — re-derive from the emitted cuts
    out.values.foreach { case (b, s, lo, hi) =>
      val expect = if (s < lo) "tail" else if (s < hi) "middle" else "head"
      assert(b == expect)
    }
    // 2-doc language: lower doc is tail (rank-1 value = cut_lo), upper head
    assert(Set(out(7L)._1, out(8L)._1).subsetOf(Set("tail", "middle", "head")))
    assert(enWorst.contains(6L))
  }

  test("nbQuality learns junk markers from seeds and flags planted docs") {
    import org.apache.spark.sql.functions.col
    // pos seed: 1,2 (clean); neg seed: 3,4 (carry marker 'zz'); 5 and 6
    // are UNLABELED — the model must generalize: junk-heavy 5 scores
    // negative, clean 6 positive
    val d = Seq(
      (1L, "good clean prose words"),
      (2L, "more good clean words"),
      (3L, "words zz zz"),
      (4L, "clean zz"),
      (5L, "prose zz zz zz"),
      (6L, "good words")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.nbQuality(d,
      posSeed = col("doc_id") <= 2,
      negSeed = col("doc_id") === 3 || col("doc_id") === 4,
      vocabSize = 100)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Double]("nb_score_r"),
          r.getAs[Long]("n_tokens"))).toMap
    assert(out(1L)._1 && out(1L)._2 > 0)
    assert(!out(3L)._1 && out(3L)._2 < 0)
    assert(!out(5L)._1 && out(5L)._2 < 0, s"junk doc 5 must flag: ${out(5L)}")
    assert(out(6L)._1 && out(6L)._2 > 0)
    assert(out(5L)._3 == 4L)
    // hand-check one weight path: doc 6 = good + words;
    // n1=8, n0=5, V=6; w(good)=ln(3/14)-ln(1/11), w(words)=ln(3/14)-ln(2/11)
    val expect = math.floor((math.log(3.0 / 14) - math.log(1.0 / 11)) * 1e6 + 0.5) +
      math.floor((math.log(3.0 / 14) - math.log(2.0 / 11)) * 1e6 + 0.5)
    assert(out(6L)._2 == math.floor(expect / 2 / 1e6 * 1e4 + 0.5) / 1e4)
  }

  test("textEmbed hashes tokens to a deterministic unit-norm embedding") {
    val d = Seq((1L, "a a"), (2L, "a a"), (3L, "b c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.textEmbed(d, dim = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"),
          r.getAs[scala.collection.Seq[Double]]("embedding"))).toMap
    // "a a": both tokens land in one bucket with one sign -> exactly one
    // component, magnitude 1
    val e1 = out(1L)._2
    assert(out(1L)._1 == 2L)
    assert(e1.count(_ != 0.0) == 1 && e1.exists(v => math.abs(v) == 1.0))
    // determinism: identical text embeds identically (cosine 1)
    assert(out(2L)._2 == e1)
    // normalization: unit norm up to the 6-dp component quantization
    // (zero vector only if every bucket cancelled)
    val n3 = math.sqrt(out(3L)._2.map(v => v * v).sum)
    assert(n3 == 0.0 || math.abs(n3 - 1.0) < 1e-3, s"norm $n3")
  }

  test("textCrossLeak catches reversed-token paraphrases the gram gates miss") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "uno dos tres cuatro cinco seis siete ocho")
    ).toDF("doc_id", "text")
    // eval doc 10 is doc 1 token-REVERSED: identical bag, zero shared
    // 3-token shingles
    val eval = Seq(
      (10L, "theta eta zeta epsilon delta gamma beta alpha")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.textCrossLeak(corpus, eval,
      dim = 16, nPlanes = 4, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Double]("sim_r")).toMap
    assert(out == Map((1L, 10L) -> 1.0), s"got $out")
    // and the shingle-based cross-corpus check sees NOTHING
    assert(graft.operators.Dedup.crossCorpusNearDups(corpus, eval,
      k = 64, bands = 16, minSim = 0.5).count() == 0)
  }

  test("bitextMine recovers planted translation pairs mutually, " +
      "suppresses hub matches, and reports the source-side margin") {
    import org.apache.spark.sql.functions.col
    // en docs 1/2/3 each share their token bag with exactly one fr doc
    // (the planted alignment); en doc 4 is a HUB similar to both fr 13
    // and fr 11's vocab but is nobody's mutual best for fr 11
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "uno dos tres cuatro", "en"),
      (3L, "red green blue yellow", "en"),
      (11L, "delta gamma beta alpha", "fr"),   // = doc 1 reversed
      (12L, "cuatro tres dos uno", "fr"),      // = doc 2 reversed
      (13L, "yellow blue green red", "fr")     // = doc 3 reversed
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bitextMine(docs, "lang", "en", "fr",
      dim = 16, nPlanes = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Double]("sim_r"))).toMap
    // every planted pair mined with sim 1.0 (identical token bags)
    assert(out(1L)._1 == 11L && out(1L)._2 == 1.0, s"got $out")
    assert(out(2L)._1 == 12L && out(2L)._2 == 1.0, s"got $out")
    assert(out(3L)._1 == 13L && out(3L)._2 == 1.0, s"got $out")
    // mutuality: one pair per source, no source claims two targets
    assert(out.size == 3)
    // margin is NULL when the source saw a single candidate, else a
    // finite non-negative difference
    val m = TextAnalysis.bitextMine(docs, "lang", "en", "fr",
      dim = 16, nPlanes = 2).collect()
    m.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("margin_r")))
        assert(r.getAs[Double]("margin_r") >= 0.0)
    }
  }

  test("invertedIndex emits df/cf and bounded smallest-id postings") {
    val d = Seq((1L, "a b a"), (2L, "b c"), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(d, maxPostings = 2)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("cf"),
          r.getAs[Seq[Long]]("postings"))).toMap
    assert(out("a") == (2L, 3L, Seq(1L, 3L)))
    assert(out("b") == (3L, 3L, Seq(1L, 2L))) // postings clip at 2; df stays 3
    assert(out("c") == (1L, 1L, Seq(2L)))
  }

  test("binaryMeta reports bytes, chunks, and hash") {
    val r = TextAnalysis.binaryMeta(docs, chunkBytes = 8).where($"doc_id" === 1).head()
    assert(r.getAs[Long]("n_bytes") == 22)
    assert(r.getAs[Long]("n_chunks") == 3) // ceil(22/8)
    assert(r.getAs[String]("content_hash").length == 32)
  }

  test("vocabCoverage reports per-source OOV mass against the top-V vocab") {
    import org.apache.spark.sql.functions._
    // vocab (V=2) = {a, b} (a:4, b:3); src0 has 1 OOV token of 1 type,
    // src1 has 2 OOV tokens of 2 types
    val docs = Seq(
      (1L, "a a b x", "src0"),
      (2L, "a a b b y z", "src1")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.vocabCoverage(docs, vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov_tokens"),
          r.getAs[Long]("n_oov_types"), r.getAs[Long]("coverage_bp"))).toMap
    assert(out("src0") == ((4L, 1L, 1L, 7500L)))
    assert(out("src1") == ((6L, 2L, 2L, 6667L)))
  }

  test("spanCorrupt: counts reconcile, fingerprints differ from the raw text, no shuffle") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (0 until 30).map(p => s"w${i}_$p").mkString(" "))).toDF("doc_id", "text")
    val q = graft.operators.TextAnalysis.spanCorrupt(docs)
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "span corruption must be a pure projection")
    val rows = q.collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      val (n, masked, spans) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 30L)
      // every span covers 1..3 positions (merged runs can be longer, but
      // masked positions always trace back to >= spans and <= 3*spans)
      assert(masked >= spans && masked <= 3 * spans)
      assert(r.getString(4).length === 32 && r.getString(5).length === 32)
    }
    // the fold is salted by doc_id: identical TEXT in different docs must
    // corrupt differently somewhere in a 40-doc sample
    val same = (1L to 40L).map(i => (i, (0 until 30).map(p => s"w_$p").mkString(" ")))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextAnalysis.spanCorrupt(same)
      .collect().map(_.getString(4)).distinct
    assert(fps.length > 1)
  }

  test("spanCorrupt: hand-checked tiny doc with a known span layout") {
    import spark.implicits._
    // find a doc id whose only span start among 6 positions is position 2:
    // then input = t0 t1 <extra_id_0> t5, target = <extra_id_0> t2 t3 t4
    def fold(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 257 + c) % 1000000007L)
    val hit = (1L to 500L).find { id =>
      val starts = (0 until 6).map(p => fold(s"corrupt:$id:$p") % 20 == 0)
      starts.zipWithIndex.forall { case (s, p) => s == (p == 2) }
    }.get
    val docs = Seq((hit, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.spanCorrupt(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((6L, 3L, 1L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(r.getString(4) === md5hex("t0 t1 <extra_id_0> t5"))
    assert(r.getString(5) === md5hex("<extra_id_0> t2 t3 t4"))
  }

  test("fimTransform: hand-checked cut points, pass-through docs, degenerate lengths") {
    import spark.implicits._
    def fold(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 257 + c) % 1000000007L)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // find ids covering: applied-psm, applied-spm, and rate-skipped
    def rate(id: Long) = fold(s"fim:r:$id") % 10
    def mode(id: Long) = fold(s"fim:m:$id") % 2
    val psmId = (1L to 400L).find(i => rate(i) < 9 && mode(i) == 0).get
    val spmId = (1L to 400L).find(i => rate(i) < 9 && mode(i) == 1).get
    val skipId = (1L to 400L).find(i => rate(i) >= 9).get
    val text = "t0 t1 t2 t3 t4 t5"
    val docs = Seq((psmId, text), (spmId, text), (skipId, text),
      (1000L, "one"), (1001L, "a b")) // 1- and 2-token docs never apply
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.fimTransform(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getString(3), r.getInt(4), r.getInt(5), r.getString(6))).toMap

    def cuts(id: Long): (Int, Int) = {
      val af = (fold(s"fim:a:$id") % 5 + 1).toInt
      val bf = (fold(s"fim:b:$id") % 5 + 1).toInt
      (math.min(af, bf), math.max(af, bf))
    }
    val toks = text.split(" ")
    val (pa, pb) = cuts(psmId)
    val expectedPsm = Seq("<PRE>", toks.take(pa).mkString(" "),
      "<SUF>", toks.drop(pb).mkString(" "),
      "<MID>", toks.slice(pa, pb).mkString(" ")).mkString(" ")
    assert(out(psmId) === ((true, "psm", pa, pb, md5hex(expectedPsm))))
    val (sa, sb) = cuts(spmId)
    val expectedSpm = Seq("<SUF>", toks.drop(sb).mkString(" "),
      "<PRE>", toks.take(sa).mkString(" "),
      "<MID>", toks.slice(sa, sb).mkString(" ")).mkString(" ")
    assert(out(spmId) === ((true, "spm", sa, sb, md5hex(expectedSpm))))
    assert(out(skipId) === ((false, "none", 0, 0, md5hex(text))))
    assert(out(1000L) === ((false, "none", 0, 0, md5hex("one"))))
    assert(out(1001L) === ((false, "none", 0, 0, md5hex("a b"))))
  }

  test("abMetrics: fold assignment is deterministic and partitions all users") {
    import spark.implicits._
    val ev = (1L to 50L).flatMap(u => Seq(
      (u, "view", 1.0), (u, if (u % 3 == 0) "purchase" else "click", 2.0)))
      .toDF("user_id", "event_type", "value")
    val out = graft.operators.Analytics.abMetrics(ev, "user_id", "value",
      "event_type", "purchase", arms = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(out.keySet.subsetOf(Set(0, 1)))
    assert(out.values.map(_._1).sum === 50L)
    assert(out.values.map(_._2).sum === (1L to 50L).count(_ % 3 == 0))
  }

  test("noveltyProfile: shared grams aren't novel, unique grams are") {
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share their only gram -> 0 novel for both
      (1L, "a b c", "s1"),
      (2L, "a b c", "s1"),
      // doc 3: grams {d e f, e f g} both unique -> fully novel
      (3L, "d e f g", "s2"),
      // doc 4: too short for a 3-gram -> excluded from its source's docs
      (4L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.noveltyProfile(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("s1") === ((2L, 2L, 0L, 0L)))
    assert(out("s2") === ((1L, 2L, 2L, 10000L)))
  }

  test("corpusDivergence: uniform source has KL 0, skewed source > 0") {
    import spark.implicits._
    val docs = Seq(
      // s1 mirrors the corpus marginal less than s2 does: corpus has
      // 6 'a', 2 'b'; s1 is all 'a' (skewed vs corpus), s2 is half-half
      (1L, "a a a a", "s1"),
      (2L, "a a b b", "s2"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.TextAnalysis.corpusDivergence(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // s1: 1.0 * ln((4*8)/(4*6)) = ln(4/3) ~ 0.2877 -> 287682 micro-nats
    assert(out("s1")._1 === 4L)
    assert(out("s1")._2 === 1L)
    assert(out("s1")._3 === math.floor(math.log(4.0 / 3.0) * 1e6 + 0.5).toLong)
    // s2: 0.5*ln((2*8)/(4*6)) + 0.5*ln((2*8)/(4*2))
    val s2 = math.floor(0.5 * math.log(16.0 / 24.0) * 1e6 + 0.5) +
      math.floor(0.5 * math.log(16.0 / 8.0) * 1e6 + 0.5)
    assert(out("s2")._3 === s2.toLong)
    assert(out.size === 2)
  }

  test("entropyProfile: uniform source saturates, constant source is zero") {
    import spark.implicits._
    // s_flat: 4 distinct tokens once each -> H = ln 4, norm_bp = 10000
    // s_const: one token repeated -> H = 0, single-term -> norm NULL
    // s_skew: 7-of-one + 1-of-another -> 0 < H < ln 2
    val docs = Seq(
      (1L, "a b c d", "x", "s_flat"),
      (2L, "z z z z", "x", "s_const"),
      (3L, "w w w w w w w v", "x", "s_skew"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.entropyProfile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4)))).toMap
    assert(math.abs(out("s_flat")._3 - math.round(math.log(4.0) * 1e6)) <= 2L)
    assert(out("s_flat")._4.contains(10000L))
    assert(out("s_const") === ((4L, 1L, 0L, None)))
    val hSkew = out("s_skew")._3
    assert(hSkew > 0L && hSkew < math.round(math.log(2.0) * 1e6))
  }

  test("vocabRichness: hand-computed Good coverage and Chao1, defined " +
      "on a doubleton-free source") {
    import spark.implicits._
    // s_open: tokens a a b b c d -> N=6 V=4 f1=2(c,d) f2=2(a,b)
    //   coverage = (6-2)*1e4 DIV 6 = 6666; chao1 = 4 + 2*1 DIV 6 = 4;
    //   singleton = 2*1e4 DIV 4 = 5000
    // s_closed: z z z z -> N=4 V=1 f1=0 f2=0 -> coverage 10000,
    //   chao1 = 1 (f2=0 must not divide by zero), singleton 0
    // s_all_new: p q r -> N=3 V=3 f1=3 f2=0 -> coverage 0,
    //   chao1 = 3 + (3*2) DIV 2 = 6, singleton 10000
    val docs = Seq(
      (1L, "a a b b c d", "x", "s_open"),
      (2L, "z z z z", "x", "s_closed"),
      (3L, "p q r", "x", "s_all_new"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.vocabRichness(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("s_open") === ((6L, 4L, 2L, 2L, 6666L, 4L, 5000L)))
    assert(out("s_closed") === ((4L, 1L, 0L, 0L, 10000L, 1L, 0L)))
    assert(out("s_all_new") === ((3L, 3L, 3L, 0L, 0L, 6L, 10000L)))
  }

  test("langIdConfusion: diagonal cells flagged, rows sum to their totals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the a the", "en"), (2L, "the a", "en"),   // correctly en
      (3L, "table row", "en"),                        // en mislabeled fr
      (4L, "table row row", "fr"))                    // correctly fr
      .toDF("doc_id", "text", "lang")
    val markers = Seq("en" -> Seq("the", "a"), "fr" -> Seq("table", "row"))
    val out = TextAnalysis.langIdConfusion(docs, markers)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("en", "en")) === ((2L, 6667L, true)))
    assert(out(("en", "fr")) === ((1L, 3333L, false)))
    assert(out(("fr", "fr")) === ((1L, 10000L, true)))
    assert(out.keySet.size == 3)
  }

  test("hybridSearch: both channels surface, RRF weights are exact integers") {
    import spark.implicits._
    // doc 1: strong keyword match for "alpha beta"; doc 2: same VOCABULARY
    // as the query embedding but diluted keywords; doc 3: unrelated
    val docs = Seq(
      (1L, "alpha beta alpha beta filler filler filler filler"),
      (2L, "alpha beta gamma"),
      (3L, "zeta eta theta iota"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hybridSearch(docs, Seq(7L -> "alpha beta"),
      k = 3, k1 = 1.2, b = 0.75).collect()
    val byDoc = out.map(r => r.getLong(2) ->
      (r.getLong(1), Option(r.get(3)), Option(r.get(4)),
        r.getAs[Long]("rrf_u"))).toMap
    // docs 1 and 2 hit BOTH channels; doc 3 can only arrive via the
    // semantic top-k (it shares no query term)
    assert(byDoc(1L)._2.isDefined && byDoc(1L)._3.isDefined)
    assert(byDoc(2L)._2.isDefined && byDoc(2L)._3.isDefined)
    assert(byDoc.get(3L).forall(_._2.isEmpty), "doc 3 must have no kw rank")
    // every rrf value must be a sum of the exact weight table entries
    val wts = TextAnalysis.rrfWeightsMicro(3, 60).toSet + 0L
    val sums = for (a <- wts; b <- wts) yield a + b
    assert(out.forall(r => sums.contains(r.getAs[Long]("rrf_u"))))
    // dual-channel docs outrank the semantic-only tail
    val top = out.filter(_.getLong(1) == 1L).head.getLong(2)
    assert(top == 1L || top == 2L)
  }

  test("topicLabels: cluster-specific vocabulary outranks shared boilerplate") {
    import spark.implicits._
    // two content families with disjoint key terms + one term shared by
    // all docs; identical texts land in the same LSH bucket by
    // construction (same embedding), so each family forms one cluster
    val fam1 = (1L to 6L).map(i => (i, "alpha beta shared"))
    val fam2 = (11L to 16L).map(i => (i, "gamma delta shared"))
    val docs = (fam1 ++ fam2).toDF("doc_id", "text")
    val out = TextAnalysis.topicLabels(docs, nPlanes = 4, topK = 3,
      stopwords = Seq.empty).collect()
    val byBucket = out.groupBy(_.getLong(0))
    // each cluster's TOP term must be family vocabulary, never 'shared'
    // (equal tf, but df spans both clusters: ln(1+2/2) < ln(1+2/1))
    byBucket.values.foreach { rows =>
      val top = rows.minBy(_.getAs[Long]("rk"))
      assert(top.getAs[String]("term") != "shared",
        s"boilerplate won a cluster: ${rows.toSeq}")
    }
    // family terms have df_buckets == 1, shared has df == n_clusters
    val dfByTerm = out.map(r => r.getAs[String]("term") ->
      r.getAs[Long]("df_buckets")).toMap
    assert(dfByTerm("alpha") == 1L && dfByTerm("gamma") == 1L)
  }

  test("langSegments: per-window verdicts, switch structure, doc tie-break") {
    val markers = Seq("en" -> Seq("the", "cat"), "es" -> Seq("uno", "dos"))
    // doc 1: en-window, es-window, en-window -> 2 switches, code-switched
    // doc 2: one short window -> single segment, no switches
    // doc 3: empty text -> excluded (mirrors the oracle's WHERE)
    // doc 4: en/es windows tied 1-1 on votes -> major ties to 'en'
    //        (first in markers order, the doc-level tie-break)
    val segDocs = Seq(
      (1L, "the cat aa uno dos bb the cat cc", "en", "s0", 0L),
      (2L, "uno", "es", "s0", 0L),
      (3L, "", "en", "s0", 0L),
      (4L, "the cat aa uno dos bb", "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.langSegments(segDocs, markers, window = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(3L), "empty doc must be excluded")
    val d1 = out(1L)
    assert(d1.getAs[String]("seg_langs") == "en,es,en")
    assert(d1.getAs[Long]("n_segments") == 3L)
    assert(d1.getAs[Long]("n_switches") == 2L)
    assert(d1.getAs[Long]("n_langs") == 2L)
    assert(d1.getAs[String]("major_lang") == "en") // votes 2-1
    assert(d1.getAs[Boolean]("is_code_switched"))
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_segments") == 1L)
    assert(d2.getAs[Long]("n_switches") == 0L)
    assert(d2.getAs[String]("seg_langs") == "es")
    assert(!d2.getAs[Boolean]("is_code_switched"))
    val d4 = out(4L)
    assert(d4.getAs[String]("seg_langs") == "en,es")
    assert(d4.getAs[String]("major_lang") == "en") // 1-1 tie -> marker order
  }

  test("piiScan: planted email/phone/long-id patterns flag, any is the " +
      "dedup'd union, clean docs stay quiet") {
    import spark.implicits._
    // docA trips email AND long-id (any must dedup), docB phone only,
    // docC clean
    val docs = Seq(
      (1L, "write to a.b@mail.io ref 999999999 thanks", "web"),
      (2L, "call 010-123-4567 now", "web"),
      (3L, "perfectly clean text", "web"),
      (4L, "also clean", "books"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.piiScan(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val w = out("web")
    assert(w.getAs[Long]("n_docs") == 3L)
    assert(w.getAs[Long]("email_docs") == 1L &&
      w.getAs[Long]("phone_docs") == 1L &&
      w.getAs[Long]("longid_docs") == 1L)
    // docA trips two detectors but counts ONCE in any
    assert(w.getAs[Long]("any_docs") == 2L)
    assert(w.getAs[Long]("any_bp") == 6666L)
    val b = out("books")
    assert(b.getAs[Long]("any_docs") == 0L && b.getAs[Long]("any_bp") == 0L)
  }

  test("heapsCurve: value-wise batches, first-seen new types, exact " +
      "cumulative type-token ratio") {
    import spark.implicits._
    // ids 0..9 with buckets=2: b = id*2 DIV 10 -> ids 0-4 batch 0,
    // ids 5-9 batch 1. Batch 0 holds "a b" twice (4 tokens, 2 types);
    // batch 1 holds "a a" (2 tokens, 0 NEW types)
    val docs = Seq(
      (0L, "a b"), (1L, "a b"), (5L, "a a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.heapsCurve(docs, buckets = 2)
      .collect().map(r => r.getAs[Long]("batch") -> r).toMap
    val b0 = out(0L)
    assert(b0.getAs[Long]("n_docs") == 2L &&
      b0.getAs[Long]("n_tokens") == 4L &&
      b0.getAs[Long]("new_types") == 2L)
    assert(b0.getAs[Long]("ttr_bp") == 5000L)
    val b1 = out(1L)
    // every batch-1 token was already seen: saturation reads as 0 new
    assert(b1.getAs[Long]("n_docs") == 1L &&
      b1.getAs[Long]("n_tokens") == 2L &&
      b1.getAs[Long]("new_types") == 0L)
    assert(b1.getAs[Long]("docs_cum") == 3L &&
      b1.getAs[Long]("tokens_cum") == 6L &&
      b1.getAs[Long]("vocab_cum") == 2L)
    // ttr falls as the vocabulary saturates: 2*1e4 DIV 6 = 3333
    assert(b1.getAs[Long]("ttr_bp") == 3333L)
  }
}
