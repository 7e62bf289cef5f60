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
