package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the Spark analog of the reference's RDB extract and
  * Trino load resources.
  *
  * Extract (reference: etl/resources/rdb.py:64 execute_query /
  * :78 execute_query_with_date_filter): `spark.read.jdbc` with the query
  * pushed down as a dbtable subquery; at scale add partitionColumn bounds
  * so the read parallelizes across executors.
  *
  * Load (reference: etl/resources/trino.py:104 insert_dataframe /
  * :165 upsert_dataframe): the reference deletes row-by-row then inserts in
  * batches — O(rows) statements. Here upsert is set-based: stage the
  * updates to a temp table with the parallel JDBC writer, then one
  * DELETE-matching-keys + one INSERT-SELECT inside a transaction.
  */
object Rdb {

  /** Run a projected/filtered query against the RDB, as a subquery pushed
    * to the database.
    */
  def readQuery(spark: SparkSession, url: String, query: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, s"($query) graft_sub", props)

  /** Daily-partition extract (reference: rdb.py:78): date filter appended
    * and evaluated in the database, not after transfer.
    *
    * Spark's JDBC reader cannot bind parameters into a dbtable subquery, so
    * instead of interpolating caller strings the day is parsed with
    * `LocalDate.parse` (throws on anything that is not a date) and the
    * literal is rebuilt from the parsed value, and the date expression is
    * restricted to a (possibly qualified) column identifier — the
    * injection-safe equivalent of rdb.py's bound `:partition_date`.
    */
  def readQueryWithDateFilter(spark: SparkSession, url: String, query: String,
      dateExpr: String, day: String, props: Properties = new Properties()): DataFrame = {
    val parsedDay = java.time.LocalDate.parse(day)
    require(dateExpr.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"),
      s"dateExpr must be a column identifier, got: $dateExpr")
    readQuery(spark, url,
      s"SELECT * FROM ($query) q WHERE $dateExpr = '$parsedDay'", props)
  }

  /** Table existence check (reference: etl/resources/trino.py:235
    * table_exists): driver metadata lookup, no query shipped.
    */
  def tableExists(url: String, table: String,
      props: Properties = new Properties()): Boolean = {
    var conn: Connection = null
    try {
      conn = DriverManager.getConnection(url, props)
      val meta = conn.getMetaData
      // getTables takes PATTERNS (_ and % are wildcards, and not every
      // driver honors the declared escape string — Derby doesn't), so
      // list and compare EXACT names case-insensitively instead of
      // pattern-matching; a dot-qualified name is checked against the
      // schema column
      val (schema, bare) = table.split('.') match {
        case Array(s, t) => (Some(s), t)
        case _           => (None, table)
      }
      val rs = meta.getTables(null, null, null, Array("TABLE"))
      try {
        var found = false
        while (!found && rs.next()) {
          found = bare.equalsIgnoreCase(rs.getString("TABLE_NAME")) &&
            schema.forall(_.equalsIgnoreCase(rs.getString("TABLE_SCHEM")))
        }
        found
      } finally rs.close()
    } finally if (conn != null) conn.close()
  }

  /** Truncate (reference: etl/resources/trino.py:227 truncate_table) with
    * DELETE fallback for dialects without TRUNCATE.
    */
  def truncate(url: String, table: String,
      props: Properties = new Properties()): Unit = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"),
      s"table must be an identifier, got: $table")
    var conn: Connection = null
    try {
      conn = DriverManager.getConnection(url, props)
      try { conn.createStatement().executeUpdate(s"TRUNCATE TABLE $table"); () }
      catch { case _: java.sql.SQLException =>
        conn.createStatement().executeUpdate(s"DELETE FROM $table"); ()
      }
    } finally if (conn != null) conn.close()
  }

  /** Parallel append (reference: trino.py:104 insert_dataframe). */
  def insert(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Set-based upsert (reference: trino.py:165 upsert_dataframe): stage →
    * DELETE matching keys → INSERT SELECT, transactionally. Returns
    * (deleted, inserted) like the reference.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
      props: Properties = new Properties()): (Int, Int) = {
    val staging = s"${table}_graft_staging"
    // Spark's default JDBC mapping turns StringType into CLOB on some
    // dialects (Derby), which is not comparable in the key-match below —
    // pin string columns to VARCHAR in the staging DDL.
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(1024)").mkString(", ")
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (stringCols.nonEmpty) writer.option("createTableColumnTypes", stringCols)
     else writer).jdbc(url, staging, props)
    val cols = df.columns
    var conn: Connection = null
    try {
      conn = DriverManager.getConnection(url, props)
      conn.setAutoCommit(false)
      // Staging columns were created by Spark's JDBC writer, which quotes
      // identifiers (exact DataFrame case); quote them here too. The target
      // table is the user's — leave its identifiers unquoted. No alias on
      // the DELETE target: not all dialects (e.g. Derby) allow one.
      def q(c: String) = "\"" + c + "\""
      val keyMatch = keys.map(k => s"$table.$k = s.${q(k)}").mkString(" AND ")
      val deleted = conn.createStatement().executeUpdate(
        s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $staging s WHERE $keyMatch)")
      val inserted = conn.createStatement().executeUpdate(
        s"INSERT INTO $table (${cols.mkString(", ")}) " +
          s"SELECT ${cols.map(q).mkString(", ")} FROM $staging")
      conn.createStatement().executeUpdate(s"DROP TABLE $staging")
      conn.commit()
      (deleted, inserted)
    } finally {
      if (conn != null) conn.close()
    }
  }
}
