package graft

import graft.operators.Approx

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private def data = (1 to 20000)
    .map(i => (s"g${i % 2}", (i * 37) % 5000)).toDF("g", "v")

  test("approx distinct counts land within declared error of exact") {
    val approx = Approx.distinctCounts(data, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy("g").agg(org.apache.spark.sql.functions.countDistinct($"v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(approx(g) - n).toDouble / n < 0.15, s"$g: ${approx(g)} vs $n")
    }
  }

  test("cmsTopK estimates are one-sided and exact without collisions") {
    // 3 tokens with distinct counts; w=2048 makes a 3-token collision in
    // all 3 rows essentially impossible, so estimates must be exact
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = Approx.cmsTopK(docs, d = 3, w = 2048, k = 10)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("true_count"), r.getAs[Long]("cms_est"))).toMap
    assert(out == Map("a" -> (3L, 3L), "b" -> (2L, 2L), "c" -> (1L, 1L)))
  }

  test("cmsTopK overestimates but never underestimates under forced collisions") {
    // w=2: heavy collisions guaranteed; the sketch may only ADD mass
    val docs = (0 until 50).map(i => (i.toLong, s"t${i % 7} filler"))
      .toDF("doc_id", "text")
    Approx.cmsTopK(docs, d = 2, w = 2, k = 20).collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_count"))
    }
  }

  test("approx percentiles track exact quantiles") {
    val out = Approx.percentiles(data, Seq("g"), "v", Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    // values are (i*37)%5000: near-uniform on [0, 5000)
    out.foreach { case (_, Seq(p50, p95)) =>
      assert(math.abs(p50 - 2500) < 150.0)
      assert(math.abs(p95 - 4750) < 150.0)
    }
  }
}
