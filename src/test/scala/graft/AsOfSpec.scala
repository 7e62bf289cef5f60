package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the latest right row at or before each left ts") {
    val left = Seq((1L, 100L, 10L), (1L, 101L, 20L), (2L, 102L, 15L))
      .toDF("k", "id", "lts")
    val right = Seq((1L, 5L, "a"), (1L, 15L, "b"), (2L, 20L, "c"))
      .toDF("k", "rts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts")
      .orderBy("id")
      .collect().map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(out == Seq(
      (100L, Some(5L), Some("a")),   // 10 >= 5, not yet 15
      (101L, Some(15L), Some("b")),  // 20 >= 15
      (102L, None, None)))           // 15 < 20: no match -> nulls
  }

  test("asofJoin match is inclusive at equal timestamps") {
    val left = Seq((1L, 1L, 50L)).toDF("k", "id", "lts")
    val right = Seq((1L, 50L, "x")).toDF("k", "rts", "v")
    val r = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts").head()
    assert(r.getAs[String]("v") == "x")
  }

  test("asofJoinTolerance rejects a too-stale match instead of falling " +
      "back to an older row; the bound is inclusive") {
    val left = Seq((1L, 100L, 50L), (1L, 101L, 70L), (1L, 102L, 49L))
      .toDF("k", "id", "lts")
    val right = Seq((1L, 10L, "old"), (1L, 40L, "fresh"))
      .toDF("k", "rts", "v")
    val out = AsOf.asofJoinTolerance(left, right, Seq("k"), "lts", "rts",
      tolerance = 10L)
      .orderBy("id")
      .collect().map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(out == Seq(
      (100L, Some(40L), Some("fresh")), // 50-40 = 10 <= 10: inclusive keep
      (101L, None, None),               // latest is 40, 30 stale -> NULLS,
                                        // NOT the even-staler 'old' row
      (102L, Some(40L), Some("fresh"))))// 49-40 = 9: fresh
  }
}
