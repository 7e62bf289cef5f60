package graft

import org.apache.spark.sql.graftnative.GraftExtensions

import graft.pipeline.SqlModels
import graft.pipeline.SqlModels.Model

class SqlModelsSpec extends SparkSpec {
  import spark.implicits._

  test("models run in dependency order and compose lazily") {
    val src = Seq((1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0)).toDF("id", "grp", "amt")
    val out = SqlModels.run(spark, Map("src" -> src), Seq(
      Model("agg", "SELECT grp, sum(amt) AS total FROM stg GROUP BY grp", deps = Seq("stg")),
      Model("stg", "SELECT * FROM src WHERE amt > 15")))
    val rows = out("agg").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows == Map("A" -> 30.0, "B" -> 20.0))
  }

  test("dependency cycles are rejected") {
    intercept[IllegalArgumentException] {
      SqlModels.run(spark, Map.empty, Seq(
        Model("a", "SELECT * FROM b", deps = Seq("b")),
        Model("b", "SELECT * FROM a", deps = Seq("a"))))
    }
  }

  test("GraftExtensions exposes native functions in SQL") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql("SELECT fvec_dot(a, b) AS d, fvec_cosine(a, a) AS c FROM v").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)

    val s = spark.sql(
      """SELECT simhash64(transform(split('a b a', ' '), t -> xxhash64(t))) AS sh,
        |  sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
        |  size(shingle_hashes(split('a b c d', ' '), 3)) AS ns""".stripMargin).head()
    assert(s.getLong(1) == 2L)
    assert(s.getLong(0) != 0L)
    assert(s.getInt(2) == 2)

    val t = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        |  bvec_dot(CAST(array(1, 2) AS ARRAY<TINYINT>), CAST(array(3, 4) AS ARRAY<TINYINT>)) AS bd,
        |  size(content_chunk_hashes('the quick brown fox jumps over it', 8, 2)) AS nc""".stripMargin).head()
    // ((0*257+97)*257+98)*257+99 mod 1e9+7
    assert(t.getLong(0) == ((97L * 257 + 98) * 257 + 99) % 1000000007L)
    assert(t.getLong(1) == 11L)
    assert(t.getInt(2) >= 1)

    // gram_hashes(toks, n): windows of 'a b'/'b c' = rolling_hash of each
    val u = spark.sql(
      "SELECT gram_hashes(split('a b c', ' '), 2) AS gh, rolling_hash('a b') AS h1").head()
    assert(u.getSeq[Long](0).head == u.getLong(1))
    assert(u.getSeq[Long](0).size == 2)
  }
}
