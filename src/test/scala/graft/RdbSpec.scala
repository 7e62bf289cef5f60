package graft

import java.sql.DriverManager

import graft.sources.Rdb

/** JDBC extract/load exercised against embedded Derby (no external DB). */
class RdbSpec extends SparkSpec {
  import spark.implicits._

  private val url =
    s"jdbc:derby:memory:graftdb_${System.identityHashCode(this)};create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql); () } finally c.close()
  }

  test("readQuery and date-filtered extract push the query to the database") {
    exec("CREATE TABLE lot_history (lot_id VARCHAR(10), qty INT, created_at DATE)")
    exec("INSERT INTO lot_history VALUES ('L1', 5, '2024-01-01'), " +
      "('L2', 7, '2024-01-02'), ('L3', 9, '2024-01-02')")

    val all = Rdb.readQuery(spark, url, "SELECT lot_id, qty FROM lot_history")
    assert(all.count() == 3)

    val day = Rdb.readQueryWithDateFilter(spark, url,
      "SELECT lot_id, qty, created_at FROM lot_history", "created_at", "2024-01-02")
    assert(day.select("lot_id").as[String].collect().sorted.toSeq == Seq("L2", "L3"))
  }

  test("date-filter extract rejects non-date days and non-identifier exprs") {
    intercept[java.time.format.DateTimeParseException] {
      Rdb.readQueryWithDateFilter(spark, url,
        "SELECT 1 FROM lot_history", "created_at", "2024-01-02' OR '1'='1")
    }
    intercept[IllegalArgumentException] {
      Rdb.readQueryWithDateFilter(spark, url,
        "SELECT 1 FROM lot_history", "created_at = created_at OR 1=1 --", "2024-01-02")
    }
  }

  test("tableExists and truncate (trino.py:227,:235 parity)") {
    exec("CREATE TABLE load_target (k INT)")
    exec("INSERT INTO load_target VALUES (1), (2)")
    exec("CREATE TABLE loadxtarget (k INT)")
    assert(Rdb.tableExists(url, "load_target"))
    assert(!Rdb.tableExists(url, "no_such_table"))
    // _ must be escaped as a literal, not act as a single-char wildcard:
    // an unescaped "loadxtarge_" pattern would match loadxtarget
    assert(!Rdb.tableExists(url, "loadxtarge_"))
    Rdb.truncate(url, "load_target")
    assert(Rdb.readQuery(spark, url, "SELECT k FROM load_target").count() == 0)
  }

  test("insert appends and upsert replaces keyed rows set-based") {
    exec("CREATE TABLE aps_wip (step VARCHAR(10), qty INT)")
    Rdb.insert(Seq(("ETCH", 10), ("DIFF", 20)).toDF("step", "qty"), url, "aps_wip")

    val (deleted, inserted) =
      Rdb.upsert(Seq(("ETCH", 99), ("NEW", 1)).toDF("step", "qty"),
        url, "aps_wip", keys = Seq("step"))
    assert(deleted == 1 && inserted == 2)

    val rows = Rdb.readQuery(spark, url, "SELECT step, qty FROM aps_wip")
      .as[(String, Int)].collect().toMap
    assert(rows == Map("ETCH" -> 99, "DIFF" -> 20, "NEW" -> 1))
  }
}
