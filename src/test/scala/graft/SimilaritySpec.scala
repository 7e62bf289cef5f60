package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f, 0.0f), 0),
    (2L, Array(1.0f, 1.0f, 0.0f), 0),
    (3L, Array(1.0f, 0.0f, 0.0f), 1) // identical direction to 0
  ).toDF("vec_id", "embedding", "label")

  test("cosine matches hand computation") {
    val sims = vecs.as("x").crossJoin(vecs.as("y"))
      .select(col("x.vec_id"), col("y.vec_id"),
        Vectors.cosine(col("x.embedding"), col("y.embedding")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((0L, 1L)) == 0.0)
    assert(math.abs(sims((0L, 2L)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(sims((0L, 3L)) - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by similarity desc with id tiebreak") {
    val out = Similarity.bruteForceTopK(vecs.where($"vec_id" === 0), vecs, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(3L, 2L, 1L))
    assert(out.head.getAs[Double]("sim_r") == 1.0)
  }

  test("lsh buckets identical-direction vectors together") {
    val planes = Similarity.hyperplanes(8, 3)
    val buckets = vecs
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(0L) == buckets(3L))
  }

  test("hyperplanes are deterministic") {
    assert(Similarity.hyperplanes(4, 8) == Similarity.hyperplanes(4, 8))
  }

  test("int8 quantization round-trips within scale/2 per component") {
    val out = vecs
      .withColumn("scale", Vectors.int8Scale(col("embedding")))
      .withColumn("q", Vectors.quantize(col("embedding"), col("scale")))
      .withColumn("back", Vectors.dequantize(col("q"), col("scale")))
      .select("embedding", "back", "scale")
      .collect()
    out.foreach { r =>
      val orig = r.getSeq[Float](0)
      val back = r.getSeq[Double](1)
      val scale = r.getDouble(2)
      orig.zip(back).foreach { case (o, b) =>
        assert(math.abs(o - b) <= scale / 2 + 1e-12)
      }
    }
  }

  test("l2Normalize yields unit vectors") {
    import org.apache.spark.sql.graftnative.FloatVecDot.fdot
    val out = vecs
      .withColumn("nrm", sqrt(fdot(col("embedding"), col("embedding"))))
      .select(Vectors.l2Normalize(col("embedding"), col("nrm")).as("u"))
      .selectExpr("aggregate(u, 0D, (acc, x) -> acc + x * x) AS sq")
      .collect().map(_.getDouble(0))
    out.foreach(sq => assert(math.abs(sq - 1.0) < 1e-12))
  }

  test("int8TopK equals bruteForceTopK: the quantized prefilter is lossless") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(i * 16 + d + 1).toFloat))
    }.toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim_r"))).toSet
    val brute = key(Similarity.bruteForceTopK(corpus.where($"vec_id" < 3), corpus, k = 5))
    val int8 = key(Similarity.int8TopK(corpus.where($"vec_id" < 3), corpus, k = 5, prefilter = 4))
    assert(int8 == brute)
  }

  test("jlProject is deterministic across partitionings and roughly norm-preserving") {
    val rnd = new scala.util.Random(23)
    val dim = 64; val k = 16
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val proj = vecs.select(col("vec_id") +:
      Vectors.jlProject(col("embedding"), dim, k): _*)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until k).map(j => r.getAs[Double](s"r_$j")).toArray).toMap
    val again = vecs.repartition(7).select(col("vec_id") +:
      Vectors.jlProject(col("embedding"), dim, k): _*)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (0 until k).map(j => r.getAs[Double](s"r_$j")).toArray).toMap
    proj.foreach { case (id, v) => assert(v.sameElements(again(id))) }
    // JL guarantee (sign matrix, E[|Rx|^2 / k] = |x|^2): scaled projected
    // norms track original norms within a loose factor at k=16
    val orig = vecs.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Seq[Float]]("embedding").map(x => x * x).sum.toDouble).toMap
    var ratioSum = 0.0
    proj.foreach { case (id, v) =>
      val pn = v.map(x => x * x).sum / k
      ratioSum += pn / orig(id)
    }
    val meanRatio = ratioSum / proj.size
    assert(meanRatio > 0.7 && meanRatio < 1.3, s"mean norm ratio $meanRatio")
  }

  test("jlTopK recovers brute-force neighbors when true neighbors exist") {
    val rnd = new scala.util.Random(29)
    val dim = 64
    val base = Seq.tabulate(40)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    // plant 3 genuine near-neighbors per query (small perturbations):
    // the regime ANN serves — neighbors well-separated from the bulk
    val planted = for { q <- 0 until 3; c <- 0 until 3 } yield
      (100L + q * 10 + c,
        base(q)._2.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    val vecs = (base ++ planted).toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(q, vecs, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val jl = Similarity.jlTopK(q, vecs, k = 3, prefilter = 5, dim = dim, kProj = 16)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(jl == brute)
    (0 until 3).foreach { qi =>
      val got = (1 to 3).map(r => jl((qi.toLong, r.toLong))).toSet
      assert(got == Set(100L + qi * 10, 101L + qi * 10, 102L + qi * 10))
    }
  }

  test("multi-probe LSH recall is a superset of single-bucket LSH recall") {
    val rnd = new scala.util.Random(31)
    val dim = 64
    val vecs = Seq.tabulate(80)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 4)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // candidate SETS (pre-rank) widen under multi-probe; compare with a
    // rank cap high enough that ranking never truncates either side
    val single = pairs(Similarity.lshTopK(q, vecs, k = 1000, nPlanes = 8, dim = dim)
      .select("query_id", "neighbor_id"))
    val multi = pairs(Similarity.lshMultiProbeTopK(q, vecs, k = 1000, nPlanes = 8, dim = dim))
    assert(single.subsetOf(multi))
    assert(multi.size >= single.size)
  }

  test("lshCalibration: identical vectors collide at tier 9, negated never") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    val base = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val corpus = (Seq((0L, base)) ++
      Seq((1L, base.clone)) ++ // cosine 1.0 -> tier 9, same bucket
      Seq((2L, base.map(-_))) ++ // cosine -1.0 -> tier -10, all 8 bits flip
      Seq.tabulate(40)(i => (10L + i, Array.fill(dim)(rnd.nextFloat() * 2 - 1))))
      .toDF("vec_id", "embedding")
    val out = Similarity.lshCalibration(
        corpus.where($"vec_id" === 0), corpus, nPlanes = 8, dim = dim)
      .collect().map(r => r.getAs[Int]("tier") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_collide"),
          r.getAs[Double]("mean_hamming_r"), r.getAs[Long]("theo_bp"))))
      .toMap
    val (n9, c9, h9, t9) = out(9)
    assert(n9 == 1L && c9 == 1L && h9 == 0.0)
    assert(t9 == Similarity.lshTheoreticalBp(8).toMap.apply(9))
    val (nm, cm, hm, _) = out(-10)
    assert(nm == 1L && cm == 0L && hm == 8.0)
    // every pair lands in exactly one tier
    assert(out.values.map(_._1).sum == 42L)
  }

  test("hardNegatives ranks only different-label candidates") {
    // query 0 (label 0): same-label 1,2 are excluded; only vec 3
    // (label 1, identical direction) qualifies
    val out = Similarity.hardNegatives(vecs.where($"vec_id" === 0), vecs, k = 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"), r.getAs[Double]("sim_r")))
    assert(out.toSeq == Seq((3L, 1L, 1.0)))
  }

  test("cell-blocked nearDupPairs finds planted duplicates") {
    // three separated clusters; vec 100 duplicates vec 0's direction
    val corpus = ((0 until 30).map { i =>
      val base = Array.fill(6)(0.01f * (i % 3))
      base(i % 3) = 8.0f
      (i.toLong, base)
    } :+ (100L, Array(8.0f, 0.0f, 0.0f, 0.01f * 0, 0f, 0f).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.train(corpus, k = 3, iters = 2)
    val pairs = Similarity.nearDupPairs(corpus, minCosine = 0.999, centroids, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 100L)), s"missing planted pair in ${pairs.toSeq}")
  }

  test("semDedup keeps the lowest-id representative per near-dup group") {
    val corpus = Seq(
      (1L, Array(8.0f, 0.0f, 0.0f)),
      (2L, Array(8.0f, 0.0f, 0.0f)),  // duplicate of 1
      (5L, Array(8.0f, 0.01f, 0.0f)), // near-dup of 1 and 2
      (9L, Array(0.0f, 8.0f, 0.0f))   // distinct direction, own cell
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(8.0f, 0.0f, 0.0f), Seq(0.0f, 8.0f, 0.0f))
    val out = Similarity.semDedup(corpus, centroids, minCosine = 0.999)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[Long]("n_dups"))).toMap
    // 2 and 5 are dropped against representative 1; 9 survives alone
    assert(out.keySet == Set(2L, 5L))
    assert(out(2L) == (1L, 1L))
    assert(out(5L) == (1L, 2L)) // flagged by both 1 and 2
  }

  test("semDedupStaged splits exact and semantic drops") {
    val corpus = Seq(
      (1L, Array(8.0f, 0.0f, 0.0f)),
      (2L, Array(8.0f, 0.0f, 0.0f)),  // bitwise dup of 1 -> exact
      (5L, Array(8.0f, 0.01f, 0.0f)), // near-dup of 1 -> semantic
      (9L, Array(0.0f, 8.0f, 0.0f))   // survives in its own cell
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(8.0f, 0.0f, 0.0f), Seq(0.0f, 8.0f, 0.0f))
    val out = Similarity.semDedupStaged(corpus, centroids, minCosine = 0.999)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("dup_of"), r.getAs[String]("reason"))).toMap
    assert(out == Map(2L -> ((1L, "exact")), 5L -> ((1L, "semantic"))))
  }

  test("semIngestChain decides tier-by-tier against a persisted vector index") {
    // two well-separated directions; quantizer trained on the seeds and
    // never retrained by the chain
    val a = Array(1.0f, 0.1f, 0.0f, 0.0f)
    val b = Array(0.0f, 0.1f, 1.0f, 0.0f)
    val c = Array(0.0f, 1.0f, 0.1f, 0.0f) // fresh direction, cos < 0.95 to both
    def scale(v: Array[Float]) = v.map(x => (x * 1.01).toFloat)
    val index0 = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.train(index0, k = 2, iters = 1)
    val b1 = Seq(
      (10L, a),        // exact_index -> 1
      (11L, scale(a)), // near_index -> 1 (tier 2 beats its near_batch match)
      (12L, c),        // keep: new direction
      (13L, c),        // exact_batch -> 12
      (14L, scale(c))  // near_batch -> 12
    ).toDF("vec_id", "embedding")
    val b2 = Seq(
      (20L, c)         // exact_index -> 12: batch-1 keeper joined the index
    ).toDF("vec_id", "embedding")
    val out = Similarity.semIngestChain(index0, Seq(b1, b2), centroids,
      minCosine = 0.95, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out((1L, 10L)) == ("exact_index", Some(1L)))
    assert(out((1L, 11L)) == ("near_index", Some(1L)))
    assert(out((1L, 12L)) == ("keep", None))
    assert(out((1L, 13L)) == ("exact_batch", Some(12L)))
    assert(out((1L, 14L)) == ("near_batch", Some(12L)))
    assert(out((2L, 20L)) == ("exact_index", Some(12L)))
  }

  test("semIngestChain: durable-staged chain equals localCheckpoint chain " +
      "and the stage root holds the index pieces") {
    val a = Array(1.0f, 0.1f, 0.0f, 0.0f)
    val b = Array(0.0f, 0.1f, 1.0f, 0.0f)
    val c = Array(0.0f, 1.0f, 0.1f, 0.0f)
    def scale(v: Array[Float]) = v.map(x => (x * 1.01).toFloat)
    val index0 = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    val centroids = graft.operators.Ivf.train(index0, k = 2, iters = 1)
    val b1 = Seq((10L, a), (11L, scale(a)), (12L, c), (13L, c))
      .toDF("vec_id", "embedding")
    val b2 = Seq((20L, c)).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    val default = rows(Similarity.semIngestChain(index0, Seq(b1, b2),
      centroids, minCosine = 0.95, nprobe = 2))
    val stage = java.nio.file.Files.createTempDirectory("graft-semstage").toString
    val staged = rows(Similarity.semIngestChain(index0, Seq(b1, b2),
      centroids, minCosine = 0.95, nprobe = 2,
      reliableStagePath = Some(stage)))
    assert(staged == default)
    val staedFiles = new java.io.File(stage).list().toSet
    assert(staedFiles.exists(_.startsWith("index_0")))
    assert(staedFiles.exists(_.startsWith("keepers_1")))
    assert(staedFiles.exists(_.startsWith("dec_2")))
  }

  test("fdot returns NULL on mismatched vector lengths, not a truncated dot") {
    import org.apache.spark.sql.graftnative.FloatVecDot.fdot
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val r = df.select(fdot(col("a"), col("b")).as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("ndcgAudit: perfect ranking scores exactly 10^6") {
    import spark.implicits._
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 1.0f else 0.1f * i)))
      .toDF("vec_id", "embedding")
    val qs = vecs.where($"vec_id" < 2)
    val ideal = Similarity.bruteForceTopK(qs, vecs, 5)
      .select($"query_id", $"neighbor_id", $"rank")
    // the ideal ranking fed back as the approx side: nDCG must be exactly 1
    val perfect = Similarity.ndcgAudit(qs, vecs, 5, ideal).collect()
    assert(perfect.length == 2)
    assert(perfect.forall(_.getAs[Long]("ndcg_micro") == 1000000L))
    assert(perfect.forall(_.getAs[Long]("n_hits") == 5L))
  }

  test("mrrAudit: perfect ranking scores 10^6, a rank-2 first hit half, " +
      "zero hits zero") {
    import spark.implicits._
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 1.0f else 0.1f * i)))
      .toDF("vec_id", "embedding")
    val qs = vecs.where($"vec_id" < 2)
    val ideal = Similarity.bruteForceTopK(qs, vecs, 5)
      .select($"query_id", $"neighbor_id", $"rank")
    val perfect = Similarity.mrrAudit(qs, vecs, 5, ideal).collect()
    assert(perfect.forall(_.getAs[Long]("rr_micro") == 1000000L))
    assert(perfect.forall(_.getAs[Long]("recall_bp") == 10000L))
    // shift every rank down one and put an irrelevant id at rank 1:
    // first relevant now sits at rank 2 -> rr exactly 500000
    val shifted = ideal
      .select($"query_id", $"neighbor_id", ($"rank" + 1).as("rank"))
      .where($"rank" <= 5)
      .unionByName(qs.select($"vec_id".as("query_id"),
        org.apache.spark.sql.functions.lit(999L).as("neighbor_id"),
        org.apache.spark.sql.functions.lit(1L).as("rank")))
    val r2 = Similarity.mrrAudit(qs, vecs, 5, shifted).collect()
    assert(r2.forall(_.getAs[Long]("rr_micro") == 500000L))
    // an entirely irrelevant ranking: rr 0, NULL first hit, recall 0
    val junk = qs.select($"vec_id".as("query_id"),
      org.apache.spark.sql.functions.lit(999L).as("neighbor_id"),
      org.apache.spark.sql.functions.lit(1L).as("rank"))
    val r3 = Similarity.mrrAudit(qs, vecs, 5, junk).collect()
    assert(r3.forall(r => r.getAs[Long]("rr_micro") == 0L &&
      r.isNullAt(r.fieldIndex("first_hit_rank")) &&
      r.getAs[Long]("recall_bp") == 0L))
  }

  test("ndcgAudit: an irrelevant result at rank 1 costs more than at rank 5") {
    import spark.implicits._
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i % 4) 1.0f else 0.1f * i)))
      .toDF("vec_id", "embedding")
    val qs = vecs.where($"vec_id" < 1)
    val idealRows = Similarity.bruteForceTopK(qs, vecs, 5)
      .select($"query_id", $"neighbor_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val qid = idealRows.head._1
    val idealIds = idealRows.map(_._2)
    val junk = (0L until 12L).find(id => id != qid && !idealIds.contains(id)).get
    def ranking(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (n, i) => (qid, n, (i + 1).toLong) }
        .toDF("query_id", "neighbor_id", "rank")
    // junk first, then the ideal top-4  vs  ideal top-4 first, junk last
    val missTop = Similarity.ndcgAudit(qs, vecs, 5,
      ranking(junk +: idealIds.take(4))).collect().head
    val missBottom = Similarity.ndcgAudit(qs, vecs, 5,
      ranking(idealIds.take(4) :+ junk)).collect().head
    assert(missTop.getAs[Long]("n_hits") == 4L)
    assert(missBottom.getAs[Long]("n_hits") == 4L)
    assert(missTop.getAs[Long]("ndcg_micro") <
      missBottom.getAs[Long]("ndcg_micro"),
      s"position discount missing: $missTop vs $missBottom")
    assert(missBottom.getAs[Long]("ndcg_micro") < 1000000L)
  }

  test("pcaPower: a planted dominant axis is recovered with its variance " +
      "share, and the iterate is deterministic across runs") {
    import graft.operators.Similarity
    // 20 vectors strongly along dim 0 with small alternating leakage
    // into dim 1 — the top component must align with e0
    val planted = (0 until 20).map { i =>
      val x = Array.fill(4)(0.0f)
      x(0) = 10.0f + (i % 3).toFloat
      x(1) = if (i % 2 == 0) 0.3f else -0.3f
      (i.toLong, x, 0)
    }.toDF("vec_id", "embedding", "label")
    def run() = Similarity.pcaPower(planted, dim = 4, iters = 6).collect()
    val out = run()
    assert(out.length == 4)
    val byJ = out.map(r => r.getLong(0) -> r).toMap
    assert(math.abs(byJ(0L).getAs[Double]("loading_r6")) > 0.999,
      "dominant axis not recovered")
    (1L to 3L).foreach(j =>
      assert(math.abs(byJ(j).getAs[Double]("loading_r6")) < 0.05,
        s"component $j should be near zero"))
    assert(out.head.getAs[Long]("var_share_bp") > 9900L,
      "the planted axis carries ~all the variance")
    assert(out.head.getAs[Long]("n_vectors") == 20L)
    // the quantized iterate is the DEFINITION: re-runs are byte-equal
    assert(run().map(_.toString).toSeq == out.map(_.toString).toSeq)
  }

  test("pcaTopR: a planted TWO-axis spectrum is recovered in order with " +
      "orthogonal loadings and descending variance shares") {
    import graft.operators.Similarity
    // axis 0 dominant (amplitude ~6), axis 1 secondary (~2), axis 2/3
    // noise-free zero: deflation must peel e0 then find e1
    val planted = (0 until 24).map { i =>
      val x = Array.fill(4)(0.0f)
      x(0) = if (i % 2 == 0) 6.0f else -6.0f
      x(1) = if (i % 3 == 0) 2.0f else -1.0f
      (i.toLong, x, 0)
    }.toDF("vec_id", "embedding", "label")
    def run() = Similarity.pcaTopR(planted, dim = 4, iters = 6, r = 2)
      .collect()
    val out = run()
    assert(out.length == 8) // 2 components x 4 dims
    val c1 = out.filter(_.getAs[Long]("component") == 1L)
      .map(r => r.getLong(1) -> r).toMap
    val c2 = out.filter(_.getAs[Long]("component") == 2L)
      .map(r => r.getLong(1) -> r).toMap
    // component 1 is e0, component 2 is e1
    assert(math.abs(c1(0L).getAs[Double]("loading_r6")) > 0.99,
      "dominant axis not recovered first")
    assert(math.abs(c2(1L).getAs[Double]("loading_r6")) > 0.99,
      "secondary axis not recovered by deflation")
    assert(math.abs(c2(0L).getAs[Double]("loading_r6")) < 0.05,
      "component 2 must not re-find the deflated axis")
    // shares: descending, and together ~all the variance
    val s1 = c1(0L).getAs[Long]("var_share_bp")
    val s2 = c2(0L).getAs[Long]("var_share_bp")
    assert(s1 > s2 && s2 > 0L, s"shares not descending: $s1, $s2")
    assert(s1 + s2 > 9900L, s"two axes should carry ~all variance: $s1+$s2")
    // the certificate: quantized loadings orthogonal to ~1e-6 x 1e-6
    // per coordinate (dim x 1e6/2 ceiling in 1e-12 units)
    assert(out.head.getAs[Long]("ortho_max_e12") < 4L * 500000L,
      s"ortho certificate too large: ${out.head.getAs[Long]("ortho_max_e12")}")
    // deterministic replay, the pcaPower contract
    assert(run().map(_.toString).toSeq == out.map(_.toString).toSeq)
  }
}
