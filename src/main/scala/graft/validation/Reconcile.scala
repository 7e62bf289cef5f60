package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-system table reconciliation — the cheap answer to "is the
  * replica byte-identical to the source?" after a CDC apply, an upsert
  * load, or a migration (the check the reference's rdb.py → warehouse
  * loads implicitly trust). Instead of shipping rows, each side computes
  * a tiny per-partition summary and compares summaries.
  */
object Reconcile {

  /** SQL NULL's canonical form: \\u0001 + 'NULL'. Both engines can carry
    * the control byte in a VARCHAR (a raw NUL cannot cross DuckDB, and a
    * plain-text sentinel like ' NULL' aliases a real value too easily);
    * a genuine field value starting with \\u0001 would still alias NULL —
    * accepted and documented, control bytes in real data are the rarer
    * hazard than the separator shift the sentinel exists to prevent.
    * The oracle side spells it `chr(1) || 'NULL'`.
    *
    * FORMAT BREAK (round 11): the sentinel was a raw \\x00 byte in
    * rounds ≤ 10. Changing it changes [[canonRowHash]] and therefore
    * EVERY digest over NULL-bearing rows — digest triples persisted
    * under the old definition will mismatch current ones by
    * construction, not because the data drifted. All in-repo oracles
    * and specs moved in lockstep; treat any stored pre-r11 digest as
    * invalid rather than as evidence of divergence. */
  private[graft] val NullSentinel = "\u0001NULL"

  private def rowHash(salt: String, canon: Column): Column =
    conv(substring(md5(concat(lit(salt), canon)), 1, 13), 16, 10)
      .cast("long")

  private val sumMod =
    "CAST(sum(CAST(%s AS DECIMAL(38,0))) %% 1000000000000000000 AS BIGINT)"

  /** Order-independent per-partition content digest: every row is
    * canonicalized (explicit string forms, the [[NullSentinel]] for SQL
    * NULL so a missing field can't alias a shifted one under the '|'
    * separator), hashed by the portable 52-bit salted md5, and folded
    * per partition three commuting ways — row count, XOR of hashes, and
    * the exact decimal(38,0) SUM (reported mod 10^18 to stay in BIGINT).
    * Any single changed / missing / duplicated row moves at least one
    * fold: XOR alone cancels under duplicate-pair insertion and SUM
    * alone under crafted collisions, so the triple is the
    * reconciliation contract. Folds commute and associate, so
    * shards/retries/merges of partial digests are exact — the same
    * shardability argument as the HLL register file, in additive form.
    *
    * Scale shape: ONE aggregate keyed on the partition column; rows never
    * leave their scan except as (part, 52-bit hash). Comparing two 100 TB
    * tables costs two scans and a |partitions|-row join.
    */
  /** The canonical row hash [[tableDigest]] folds — exposed so the
    * streaming digest twin (`EventStream.tableDigestStream`) hashes
    * arriving rows identically to the batch scan. */
  private[graft] def canonRowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty)
    rowHash("digest:", concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))
  }

  /** One labeled digest-stage frame (stage, part, n_rows, xor_digest,
    * sum_digest) — the [[tableDigest]] fold triple tagged for a
    * multi-stage close artifact. ONE definition (the daily closes, the
    * cadence plain days, and any future composed chain all publish
    * through it) so the stage schema cannot drift between consumers
    * (r13 review finding: three identical inline copies). */
  def digestStage(stage: String, df: DataFrame, part: Column,
      cols: Seq[Column]): DataFrame =
    tableDigest(df, part, cols)
      .select(lit(stage).as("stage"), col("part").cast("string").as("part"),
        col("n_rows"), col("xor_digest"), col("sum_digest"))

  def tableDigest(df: DataFrame, part: Column, cols: Seq[Column]): DataFrame = {
    val h = canonRowHash(cols)
    df.select(part.as("part"), h.as("h"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_digest"),
        expr(sumMod.format("h")).as("sum_digest"))
      .orderBy(col("part"))
  }

  /** Column-localizing digest — the drill-down [[tableDigest]] hands a
    * mismatching partition to: the SAME three commuting folds, but one
    * (xor, sum) pair PER COLUMN, each over that column's value hashed
    * alone with a column-name salt (`digest:<name>:`), so one more scan
    * pinpoints WHICH column diverged inside a flagged partition (a
    * row-level digest can only say "something in this row set moved").
    * Output long-form: (part, column, n_rows, xor_digest, sum_digest),
    * |partitions| × |cols| bounded rows.
    *
    * Scale shape: still ONE aggregate pass — the per-column hashes are
    * projected in the scan, the groupBy(part) computes all 2·C folds
    * map-side, and the long-form explode runs on the aggregated
    * (|partitions|-row) frame, never the data.
    *
    * Column names must be plain identifiers (they ride into `bit_xor`
    * aggregate expressions and the output rows).
    */
  /** The per-column salted hash [[columnDigest]] folds — exposed so the
    * streaming twin (`EventStream.columnDigestStream`) hashes arriving
    * column values identically to the batch scan, the same sharing
    * contract as [[canonRowHash]]. */
  private[graft] def canonColumnHash(name: String, c: Column): Column =
    rowHash(s"digest:$name:", coalesce(c.cast("string"), lit(NullSentinel)))

  def columnDigest(df: DataFrame, part: Column,
      cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty)
    cols.foreach { case (n, _) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"column label must be a plain identifier, got '$n'") }
    val hashed = df.select(part.as("part") +: cols.map { case (n, c) =>
      canonColumnHash(n, c).as(s"h_$n")
    }: _*)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (n, _) =>
      Seq(expr(s"bit_xor(h_$n)").as(s"xor_$n"),
        expr(sumMod.format(s"h_$n")).as(s"sum_$n"))
    }
    hashed.groupBy(col("part")).agg(aggs.head, aggs.tail: _*)
      .select(col("part"), col("n_rows"),
        explode(array(cols.map { case (n, _) =>
          struct(lit(n).as("column"), col(s"xor_$n").as("xor_digest"),
            col(s"sum_$n").as("sum_digest"))
        }: _*)).as("c"))
      .select(col("part"), col("c.column").as("column"), col("n_rows"),
        col("c.xor_digest").as("xor_digest"),
        col("c.sum_digest").as("sum_digest"))
      .orderBy(col("part"), col("column"))
  }

  /** The reconciliation REPORT over two [[tableDigest]] summaries — the
    * workflow's second half: full-outer join the per-partition triples
    * and classify each partition `match` / `content_mismatch` /
    * `count_mismatch` / `source_only` / `target_only`. Emits ONLY
    * non-matching partitions plus one `(all)` summary row, so a clean
    * comparison of two 100 TB tables returns one row. The partition is
    * the repair unit: a mismatch row IS the re-copy work list.
    *
    * Output contract: per-partition rows carry (part, status, s_rows,
    * t_rows) with the two sides' row counts; the `(all)` summary row
    * REUSES those two columns as (matched partitions, mismatched
    * partitions) and reports status `match` or the catch-all `mismatch`
    * (not any specific per-partition status — count mismatches and
    * one-sided partitions also roll up to it).
    */
  def reconcile(source: DataFrame, target: DataFrame, part: Column,
      cols: Seq[Column]): DataFrame = {
    val s = tableDigest(source, part, cols)
      .withColumnsRenamed(Map("n_rows" -> "s_rows", "xor_digest" -> "s_xor",
        "sum_digest" -> "s_sum"))
    val t = tableDigest(target, part, cols)
      .withColumnsRenamed(Map("n_rows" -> "t_rows", "xor_digest" -> "t_xor",
        "sum_digest" -> "t_sum"))
    val j = s.join(t, Seq("part"), "full_outer")
      .withColumn("status",
        when(col("s_rows").isNull, "target_only")
          .when(col("t_rows").isNull, "source_only")
          .when(col("s_rows") =!= col("t_rows"), "count_mismatch")
          .when(col("s_xor") =!= col("t_xor") ||
            col("s_sum") =!= col("t_sum"), "content_mismatch")
          .otherwise("match"))
    val bad = j.where(col("status") =!= "match")
      .select(col("part").cast("string").as("part"), col("status"),
        coalesce(col("s_rows"), lit(0L)).as("s_rows"),
        coalesce(col("t_rows"), lit(0L)).as("t_rows"))
    val summary = j.agg(
      sum(when(col("status") === "match", 1L).otherwise(0L)).as("s_rows"),
      sum(when(col("status") =!= "match", 1L).otherwise(0L)).as("t_rows"))
      .select(lit("(all)").as("part"),
        when(col("t_rows") === 0, "match").otherwise("mismatch")
          .as("status"),
        col("s_rows"), col("t_rows"))
    bad.unionByName(summary).orderBy(col("part"))
  }
}
