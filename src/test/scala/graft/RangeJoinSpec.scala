package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join matches exactly the contained points") {
    val points = Seq((1L, 3.0), (2L, 7.5), (3L, 12.0), (4L, 25.0))
      .toDF("id", "x")
    val intervals = Seq(("a", 2.0, 8.0), ("b", 7.0, 13.0), ("c", 30.0, 40.0))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.bucketed(points, intervals, "x", "lo", "hi", bucketWidth = 4.0)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")))
  }

  test("interval spanning many buckets still matches once per point") {
    val points = Seq((1L, 5.0)).toDF("id", "x")
    val intervals = Seq(("wide", 0.0, 100.0)).toDF("name", "lo", "hi")
    val out = RangeJoin.bucketed(points, intervals, "x", "lo", "hi", bucketWidth = 2.0)
    assert(out.count() == 1)
  }
}
