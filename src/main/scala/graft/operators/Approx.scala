package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB substitutes for exact operators
  * whose state doesn't fit or whose shuffle doesn't pay:
  *
  * - distinct counts: HyperLogLog++ sketch, constant memory per group vs
  *   the expand/two-phase plan of exact countDistinct;
  * - quantiles: Greenwald-Khanna/KLL-style sketch via approx_percentile,
  *   single pass, no per-group sort;
  * - frequent items: count-min-style via Spark's freqItems.
  *
  * Exact variants live next to each operator (Etl.wipAggregate,
  * q_event_percentiles); these are the declared-error alternatives.
  */
object Approx {

  /** Distinct count per group with bounded relative error (default 5%,
    * Spark's approx_count_distinct rsd).
    */
  def distinctCounts(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Single-pass approximate percentiles per group. `accuracy` trades
    * memory for error (error <= 1/accuracy).
    */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      percentages: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pcts = percentages.mkString("array(", ", ", ")")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_percentile($valueCol, $pcts, $accuracy)")
        .as(s"approx_percentiles_$valueCol"))
  }

  /** Portable HyperLogLog distinct-count audit: per group, the full HLL
    * register file built from the first 52 bits of the salted md5
    * fingerprint (`hc = int(md5("hll:" + v)[0:13 hex], 16)`, p=9 → m=512
    * registers, idx = hc mod 512, rho = leading-zero rank of the remaining
    * 43-bit field), the standard bias-corrected estimate with the
    * linear-counting small-range correction, and the exact distinct count
    * + error in basis points next to it — the certificate a 100 TB run
    * reads before trusting the sketch column alone. md5, not the rolling
    * fold: the fold is affine in the trailing characters, so sequential
    * ids cluster into narrow bands that wreck both the register index and
    * the leading-zero statistic; md5 avalanches and both engines parse the
    * identical hex digits.
    *
    * Engine parity: the registers are pure integer arithmetic (`2^(44-Mj)`
    * summed as BIGINT — no float until the final division), so a SQL oracle
    * replays the register file bit-exactly; the only floats are the single
    * `alpha*m^2*2^44 / S` division and the `512*ln(512/V)` correction,
    * written operation-identically on both engines and rounded to 2 dp.
    *
    * 100 TB posture: a production sketch keeps m=512 BIGINT-weight
    * registers per group — `groupBy(group, idx).agg(max(rho))` map-side
    * combines to ≤ m rows per group per partition, and merging shards is
    * the same `max` per register (proved in ApproxSpec), so distinct counts
    * over an unbounded stream cost constant state and two slim shuffles.
    * The exact-count side (the `distinct()` and the `nv` sum) exists here
    * only to certify the estimate, exactly like cmsTopK's exact column.
    */
  def hllAudit(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllRegisters(df, groupCol, valueCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("npres"), sum(col("nv")).as("n_exact"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mx)")).as("sp"))
      .select(col(groupCol), col("n_exact"), hllVZeroCol.as("v_zero"),
        (hllEstRawCol <= 1280.0 && hllVZeroCol > 0).as("small_range"),
        hllEstimateCol.as("hll_est"))
      .select(col(groupCol), col("n_exact"), col("v_zero"),
        col("small_range"), col("hll_est"),
        round(abs(col("hll_est") - col("n_exact").cast("double")) /
          col("n_exact").cast("double") * 10000.0, 0).cast("long").as("err_bp"))
      .orderBy(col(groupCol))

  /** The estimate arithmetic of [[hllAudit]] over an ALREADY-BUILT
    * (group, idx, mx) register file — the read path a STREAMED register
    * build feeds (EventStream.hllRegisterStream maintains the file;
    * snapshots answer "distinct so far" through exactly this column
    * chain, so the streamed and batch estimates can never drift).
    * No n_exact here: a register file alone cannot certify itself —
    * callers join the exact count from a batch pass when auditing.
    */
  private[graft] def hllEstimateFromRegisters(regs: DataFrame,
      groupCol: String): DataFrame =
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("npres"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mx)")).as("sp"))
      .select(col(groupCol), hllVZeroCol.as("v_zero"),
        (hllEstRawCol <= 1280.0 && hllVZeroCol > 0).as("small_range"),
        hllEstimateCol.as("hll_est"))

  /** HLL register SET OPERATIONS — the audience-overlap path when only
    * register files are stored (the KMV route q_kmv_overlap certifies
    * needs the bottom-k value sets; THIS one works off the same 512
    * registers q_hll_counts already maintains): per group pair,
    * |A∪B| estimated from the MAX-MERGED register file (max-merge is
    * the sketch's union law — exact, not approximate, at the register
    * level) and |A∩B| by inclusion–exclusion est_a + est_b − est_union
    * (the classic HLL intersection: noisy for small overlaps — which
    * is exactly why the exact certification columns ride along, the
    * calibration-family contract). `est_inter` is published UNCLAMPED:
    * near-disjoint pairs can legitimately estimate negative — that is
    * expected inclusion–exclusion noise, to be read against the
    * `exact_inter` certification column, NOT as a count (clamping
    * would hide exactly the error magnitude the audit columns exist to
    * expose). err_union_bp certifies the union estimate against the
    * exact distinct-join truth.
    *
    * Scale shape: register files are groups×512 rows forever; the pair
    * frame is |groups|² bounded; the only data-sized work is the one
    * distinct (the exact certification side, same as kmvOverlap's).
    */
  def hllOverlap(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val regs = hllRegisters(df, groupCol, valueCol)
      .select(col(groupCol).as("g"), col("idx"), col("mx"), col("nv"))
      .localCheckpoint() // bounded groups x 512, three consumers
    val per = regs.groupBy(col("g"))
      .agg(count(lit(1)).as("npres"), sum(col("nv")).as("n_exact"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mx)")).as("sp"))
      .select(col("g"), col("n_exact"), hllEstimateCol.as("est"))
    val pairs = per.select(col("g").as("ga"), col("n_exact").as("n_a"),
        col("est").as("est_a"))
      .crossJoin(broadcast(per.select(col("g").as("gb"),
        col("n_exact").as("n_b"), col("est").as("est_b"))))
      .where(col("ga") < col("gb"))
      .localCheckpoint() // |groups|^2 bounded panel
    val keys = broadcast(pairs.select(col("ga"), col("gb")))
    val contrib = regs.join(keys, col("g") === col("ga"))
        .select(col("ga"), col("gb"), col("idx"), col("mx"))
      .unionByName(regs.join(keys, col("g") === col("gb"))
        .select(col("ga"), col("gb"), col("idx"), col("mx")))
    val uni = contrib.groupBy(col("ga"), col("gb"), col("idx"))
      .agg(max(col("mx")).as("mx"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("npres"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mx)")).as("sp"))
      .select(col("ga"), col("gb"), hllEstimateCol.as("est_union"))
    val d = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .distinct().localCheckpoint() // shared by both exact sides
    val ex = d.select(col("g").as("ga"), col("v"))
      .join(d.select(col("g").as("gb"), col("v")), Seq("v"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("exact_inter"))
    pairs.join(uni, Seq("ga", "gb"))
      .join(ex, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        (col("n_a") + col("n_b") -
          coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
        col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 2)
          .as("est_inter"))
      .withColumn("err_union_bp",
        round(abs(col("est_union") - col("exact_union").cast("double")) /
          col("exact_union").cast("double") * 10000.0, 0).cast("long"))
      .orderBy(col("ga"), col("gb"))
  }

  /** 2^44: the weight of an untouched register (rho ranges 1..44 over the
    * 43-bit field, so `2^(44-rho)` stays integral and `S` fits BIGINT:
    * ≤ 512 * 2^44 < 2^54). */
  private val Pow44 = 17592186044416L

  /** alpha_m * m^2 * 2^44 for m=512, one double so the oracle inlines the
    * identical IEEE value via its decimal string. */
  private[operators] val hllC: Double =
    0.7213 / (1.0 + 1.079 / 512.0) * 262144.0 * 17592186044416.0

  /** First 52 bits of the salted md5, as BIGINT — the avalanche-quality
    * portable hash the sketch operators key on (both engines parse the
    * identical 13 hex chars). */
  private def md5Bits52(salt: String, v: Column): Column =
    conv(substring(md5(concat(lit(salt), v)), 1, 13), 16, 10).cast("long")

  /** The (idx, rho) register projection as plain columns — usable on a
    * STREAMING frame (no distinct; register max is idempotent, so
    * re-delivered values are harmless by construction). `hc >> 9` is the
    * same value as the batch builder's `hc DIV 512` (hc is non-negative).
    */
  private[graft] def hllRegisterCols(value: Column): (Column, Column) = {
    val hc = md5Bits52("hll:", value.cast("string"))
    val w = shiftright(hc, 9)
    (pmod(hc, lit(512L)),
      when(w === 0L, lit(44)).otherwise(lit(44) - length(bin(w))))
  }

  /** The (group…, idx, mx, nv) register file of [[hllAudit]], exposed so
    * the merge law `registers(A ∪ B) == max-merge(registers(A),
    * registers(B))` is spec-checkable — the property that makes the sketch
    * shardable (and, grouped finer than the query, pre-aggregable: see
    * [[hllRollupAudit]]). Accepts derived grouping columns so a date
    * bucket can sit next to the key. */
  private[graft] def hllRegisters(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    hllRegistersBy(df, Seq(col(groupCol)), Seq(groupCol), valueCol)

  private[graft] def hllRegistersBy(df: DataFrame, groups: Seq[Column],
      groupNames: Seq[String], valueCol: String): DataFrame = {
    val hc = md5Bits52("hll:", col("v").cast("string"))
    val g = groupNames.map(col)
    df.select(groups.zip(groupNames).map { case (c, n) => c.as(n) } :+
        col(valueCol).as("v"): _*)
      .where(col("v").isNotNull)
      .distinct()
      .select(g :+ hc.as("hc"): _*)
      .select(g :+ pmod(col("hc"), lit(512L)).as("idx") :+
        expr("hc DIV 512").as("w"): _*)
      .select(g :+ col("idx") :+
        when(col("w") === 0L, lit(44))
          .otherwise(lit(44) - length(bin(col("w")))).as("rho"): _*)
      .groupBy(g :+ col("idx"): _*)
      .agg(max(col("rho")).as("mx"), count(lit(1)).as("nv"))
  }

  /** HLL ROLLUP audit — the pre-aggregated sketch-table pattern: a
    * warehouse stores one 512-register HLL file per (group, DAY) (written
    * incrementally, day by day, like any partitioned aggregate table), and
    * any date-range distinct-count question is answered by max-merging the
    * daily register files — never by rescanning raw data. This query
    * executes the law end to end: the per-day register files, their
    * max-merge to group level, the estimate from the merge, and — the
    * proof — an independently built direct group-level sketch from the raw
    * stream, with a `rollup_matches` verdict (equal by the associativity
    * of per-register max; the engine, not algebra on paper, certifies it —
    * same posture as q_incr_merge's merge == recompute hash proof). Exact
    * distinct + err_bp ride along as the usual certificate.
    *
    * 100 TB posture: the daily sketch table costs 512 rows per group-day
    * FOREVER (a year of 1000 groups = 187M tiny rows); every range query
    * after that touches registers only. The raw-side rebuild here exists
    * only to prove the merge lossless.
    */
  def hllRollupAudit(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = hllRegistersBy(df,
      Seq(col(groupCol), col(tsCol).cast("date")), Seq(groupCol, "day"),
      valueCol).localCheckpoint()
    val merged = daily.groupBy(col(groupCol), col("idx"))
      .agg(max(col("mx")).as("mx"))
    val nDays = daily.groupBy(col(groupCol))
      .agg(countDistinct(col("day")).as("n_days"))
    val direct = hllRegisters(df, groupCol, valueCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("npres"), sum(col("nv")).as("n_exact"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mx)")).as("sp"))
      .select(col(groupCol), col("n_exact"),
        hllEstimateCol.as("hll_est"))
    val rollup = merged.groupBy(col(groupCol))
      .agg(count(lit(1)).as("npres"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mx)")).as("sp"))
      .select(col(groupCol), hllEstimateCol.as("hll_est_rollup"))
    direct.join(rollup, groupCol).join(nDays, groupCol)
      .select(col(groupCol), col("n_days"), col("n_exact"),
        col("hll_est"), col("hll_est_rollup"),
        (col("hll_est") === col("hll_est_rollup")).as("rollup_matches"),
        round(abs(col("hll_est_rollup") - col("n_exact").cast("double")) /
          col("n_exact").cast("double") * 10000.0, 0).cast("long")
          .as("err_bp"))
      .orderBy(col(groupCol))
  }

  /** Cumulative distinct-to-date TIMELINE from the daily sketch table —
    * the growth-curve dual of [[hllRollupAudit]]: where the rollup answers
    * one range question by max-merging day files, the timeline answers
    * EVERY prefix question at once — per (group, day), the estimated
    * distinct values seen up to and including that day (the "unique users
    * to date" dashboard curve). The scalable plan is NOT a prefix rescan
    * per day (quadratic in days): the sparse day files are spread onto a
    * dense (group, day) x 512 grid — the same row count as the sketch
    * table itself, so linear in what the warehouse already stores — and
    * one partitioned running `max` window per (group, idx) forward-fills
    * each register's cumulative state through days it wasn't touched
    * (window max skips nulls). The per-day estimate then reads off the
    * same (npres, sp) arithmetic as every other HLL query. The exact
    * cumulative count rides along as the usual certificate, also in
    * sketch-shaped form: first-seen day per value -> per-day new-value
    * counts -> one running sum (never a per-day re-distinct).
    *
    * 100 TB posture: grid and windows are 512 x group-days rows — a year
    * of 1000 groups is 187M tiny rows, partitioned 512 ways per group —
    * and the raw data is touched exactly twice (register build, first-seen
    * build), both single slim shuffles.
    */
  def hllTimeline(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = hllRegistersBy(df,
      Seq(col(groupCol), col(tsCol).cast("date")), Seq(groupCol, "day"),
      valueCol).localCheckpoint()
    val days = daily.select(col(groupCol), col("day")).distinct()
    val grid = days.withColumn("idx", explode(sequence(lit(0L), lit(511L))))
    val w = Window.partitionBy(col(groupCol), col("idx"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = grid
      .join(daily.select(col(groupCol), col("day"), col("idx"), col("mx")),
        Seq(groupCol, "day", "idx"), "left")
      .withColumn("cmx", max(col("mx")).over(w))
      .groupBy(col(groupCol), col("day"))
      .agg(count(col("cmx")).as("npres"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - cmx)")).as("sp"))
      .select(col(groupCol), col("day"),
        hllEstimateCol.as("hll_est_cum"))
    val wd = Window.partitionBy(col(groupCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = days
      .join(df.select(col(groupCol), col(tsCol).cast("date").as("day"),
          col(valueCol).as("v"))
          .where(col("v").isNotNull)
          .groupBy(col(groupCol), col("v")).agg(min(col("day")).as("day"))
          .groupBy(col(groupCol), col("day"))
          .agg(count(lit(1)).as("n_new0")),
        Seq(groupCol, "day"), "left")
      .withColumn("n_new", coalesce(col("n_new0"), lit(0L)))
      .withColumn("n_exact_cum", sum(col("n_new")).over(wd))
      .select(col(groupCol), col("day"), col("n_new"), col("n_exact_cum"))
    exact.join(est, Seq(groupCol, "day"))
      .select(col(groupCol), col("day"), col("n_new"), col("n_exact_cum"),
        col("hll_est_cum"),
        round(abs(col("hll_est_cum") - col("n_exact_cum").cast("double")) /
          col("n_exact_cum").cast("double") * 10000.0, 0).cast("long")
          .as("err_bp"))
      .orderBy(col(groupCol), col("day"))
  }

  /** The shared estimate arithmetic over an aggregated (npres, sp) pair —
    * ONE definition so hllAudit and hllRollupAudit can never desync on the
    * constant or the small-range branch. */
  private def hllEstRawCol: Column = lit(hllC) /
    (col("sp") + (lit(512L) - col("npres")) * lit(Pow44)).cast("double")

  private def hllVZeroCol: Column = (lit(512L) - col("npres")).cast("int")

  private def hllEstimateCol: Column =
    round(when(hllEstRawCol <= 1280.0 && hllVZeroCol > 0,
      lit(512.0) * log(lit(512.0) / hllVZeroCol.cast("double")))
      .otherwise(hllEstRawCol), 2)

  /** Exact-quantile ROLLUP from day-partitioned value histograms — the
    * EXACT counterpart of [[hllRollupAudit]] for quantiles, and the
    * warehouse reality for bounded value domains (money): each day lands
    * one (group, day, cents, n) histogram partition; any date-range
    * quantile question is answered by SUMMING histograms and reading the
    * rank statistic off the merged counts — never by re-sorting raw rows.
    * The rank statistic is the registry's standard exact form (q_rfm's
    * cuts): the smallest value whose cumulative count reaches
    * ceil(q·N), integer arithmetic only. The proof side recomputes the
    * same statistic from a direct per-row ranking (a different physical
    * route: window row_number over raw rows) and the `rollup_matches`
    * verdict is engine-certified — merge-then-rank equals rank-directly.
    *
    * 100 TB posture: the histogram table is (distinct cents per group-day)
    * rows forever — for 2-dp money a few thousand per partition — and a
    * year-range p99 touches histograms only. The raw-side rank here
    * exists as the certificate, like every rollup audit.
    */
  def histQuantileRollup(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val daily = df
      .groupBy(col(groupCol), col(tsCol).cast("date").as("day"),
        cents.as("cents"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val merged = daily.groupBy(col(groupCol), col("cents"))
      .agg(sum(col("n")).as("n"))
    val cum = merged
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = merged.groupBy(col(groupCol)).agg(sum(col("n")).as("n_rows"))
    // rank target ceil(q·N) via the shared exact-integer helper — see
    // [[ceilRankTarget]] for why the double form ceil(lit(q)·N) is wrong
    def rankTarget(q: Double): Column = ceilRankTarget(q, "n_rows")
    // all quantiles read off ONE conditional aggregate per route (min
    // over the rows at/past each target), not a join chain with one pass
    // per q — same statistic, 2(|qs|−1) fewer joins
    val histAggs = qs.map(q =>
      min(when(col("cum") >= rankTarget(q), col("cents")))
        .as(s"p${(q * 100).toInt}_hist"))
    val hist = cum.join(broadcast(totals), groupCol)
      .groupBy(col(groupCol)).agg(histAggs.head, histAggs.tail: _*)
    // direct route: per-row rank over the raw rows, same rank statistic
    val ranked = df
      .select(col(groupCol), cents.as("cents"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("cents"))))
    val directAggs = qs.map(q =>
      min(when(col("rn") === rankTarget(q), col("cents")))
        .as(s"p${(q * 100).toInt}_direct"))
    val direct = ranked.join(broadcast(totals), groupCol)
      .groupBy(col(groupCol)).agg(directAggs.head, directAggs.tail: _*)
    val eqCols = qs.map(q =>
      col(s"p${(q * 100).toInt}_hist") === col(s"p${(q * 100).toInt}_direct"))
    totals.join(hist, groupCol).join(direct, groupCol)
      .select(Seq(col(groupCol), col("n_rows")) ++
        qs.map(q => col(s"p${(q * 100).toInt}_hist")) ++
        qs.map(q => col(s"p${(q * 100).toInt}_direct")) :+
        eqCols.reduce(_ && _).as("rollup_matches"): _*)
      .orderBy(col(groupCol))
  }

  /** The exact-integer ceil(q·N) rank target over a named BIGINT count
    * column — q read off its decimal digits (0.95 → 95/100), target =
    * (num·N + den − 1) DIV den. Shared by [[histQuantileRollup]] and the
    * bottom-k quantile sketch so the double-form `ceil(lit(q)·N)` hazard
    * (one rank high whenever q·N is integral but carries binary-float
    * error: 0.95·20 = 19.000000000000004 → ceil 20, not 19) cannot
    * re-enter. */
  private def ceilRankTarget(q: Double, nCol: String): Column = {
    val bd = new java.math.BigDecimal(q.toString)
    val den = java.math.BigDecimal.TEN.pow(bd.scale).longValueExact()
    val num = bd.unscaledValue().longValueExact()
    expr(s"($num * $nCol + ${den - 1}) DIV $den")
  }

  /** Bottom-k rows by (hk, id) within each partition-column combination —
    * the skew-safe two-phase rank ([[kmvOverlap]] / knnKeeps pattern):
    * phase 1 ranks within (parts…, input-partition) so no reducer ever
    * holds a whole group, phase 2 ranks the ≤ k·n_partitions survivors
    * globally per group. Equal to a single global row_number (the
    * (hk, id) priority is total) with the hub-safety the single window
    * lacks. Input must carry `hk` and `id`; output adds `rk` (1-based).
    */
  private[graft] def bottomKByHash(df: DataFrame, parts: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = Seq(col("hk").asc, col("id").asc)
    val local = Window
      .partitionBy((parts.map(col) :+ col("__p")): _*).orderBy(pri: _*)
    val global = Window.partitionBy(parts.map(col): _*).orderBy(pri: _*)
    df.withColumn("__p", spark_partition_id())
      .withColumn("__lr", row_number().over(local))
      .where(col("__lr") <= k)
      .withColumn("rk", row_number().over(global).cast("long"))
      .where(col("rk") <= k)
      .drop("__p", "__lr")
  }

  /** PORTABLE mergeable quantile sketch — daily state build. The sketch
    * is the deterministic bottom-k equivalent of a KLL compactor level
    * (the judge-family shape: fixed-size state, exact merge): per
    * (group, day) keep the k rows whose salted 52-bit md5 hash of the
    * UNIQUE row id is smallest — a uniform without-replacement k-sample
    * that is a pure scan predicate (no RNG state; reproducible on any
    * engine, retry, or partitioning — the 43f discipline leveled up to
    * bounded state). Each state row carries (rk, hk, id, v, n_day):
    * cent-integer values, BIGINT hashes and ranks — portable integer
    * arithmetic end to end, and the state replays ROW-FOR-ROW in SQL
    * (row_number over (hk, id) ≤ k).
    *
    * Merge law (what makes it a sketch): bottom-k of the UNION of
    * per-day bottom-k states == bottom-k of the union of the raw days —
    * every element of the union's true bottom-k is in its own day's
    * bottom-k, so the min-k merge is EXACT, not approximate (the
    * [[hllRollupAudit]] max-merge posture with min-k in place of
    * register max; ApproxSpec proves it). Approximation enters only in
    * the ESTIMATOR: the merged state is a uniform k-sample of the
    * range, so the value at integer rank ceil(q·m/100) estimates the
    * population quantile with the O(1/√k) sampling bound — on UNBOUNDED
    * value domains where [[histQuantileRollup]]'s distinct-cents
    * histogram state would grow with the domain.
    *
    * Scale shape: state is min(k, n) rows per (group, day) forever; the
    * build is the skew-safe two-phase rank + one bounded count join —
    * no per-group sort of raw data ever.
    *
    * Contracts (shared by [[quantileRollup]] / [[quantileTimeline]]):
    * `idCol` must be GLOBALLY UNIQUE across days — an id recurring on
    * multiple days would occupy one state slot per day while the direct
    * range sketch ranks it per raw row, which can flip the rollup
    * identity verdict and bias the estimator. Rows with a NULL group or
    * NULL value are excluded up front (the [[kmvSketch]] isNotNull
    * discipline): a NULL value has no rank position — engines disagree
    * on NULL sort order — and a NULL group would silently vanish in the
    * rollup/timeline equi-joins; `n_day`/`n_range` therefore count
    * non-NULL-valued rows only, matching SQL aggregate semantics.
    */
  def quantileSketchDaily(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valueCol: String, k: Int = 128): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = quantileSketchBase(df, groupCol, tsCol, idCol, valueCol)
    val n = base.groupBy(col("g"), col("day"))
      .agg(count(lit(1)).as("n_day"))
    bottomKByHash(base, Seq("g", "day"), k)
      .join(broadcast(n), Seq("g", "day"))
      .select(col("g"), col("day"), col("rk"), col("hk"), col("id"),
        col("v"), col("n_day"))
      .orderBy(col("g"), col("day"), col("rk"))
  }

  /** The canonical (g, day, id, v, hk) projection both sketch queries
    * share — one definition so the daily build and the rollup replay
    * hash and canonicalize identically. */
  /** The quantile sketch's salted 52-bit id hash — exposed so the
    * streaming state twin (`EventStream.quantileStateStream`) hashes
    * arriving rows identically to the batch build (the canonRowHash
    * sharing contract, sketch edition). */
  private[graft] def quantileSketchHash(id: Column): Column =
    md5Bits52("qsk:", id.cast("string"))

  private def quantileSketchBase(df: DataFrame, groupCol: String,
      tsCol: String, idCol: String, valueCol: String): DataFrame =
    df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(tsCol).cast("date").as("day"),
        col(idCol).cast("long").as("id"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("v"))
      .withColumn("hk", quantileSketchHash(col("id")))

  /** Quantile ROLLUP off the daily sketch table (the [[hllRollupAudit]]
    * posture applied to percentiles): a date-range quantile is answered
    * by min-k-merging the range's daily states — never re-reading raw
    * rows — and this audit runs BOTH routes: (a) daily states → min-k
    * merge → integer-rank estimate, (b) an independent direct sketch
    * over the range's raw rows, with the engine-certified
    * `rollup_matches` verdict that the two states are IDENTICAL row
    * sets (the merge law is exact, so any mismatch is a plumbing bug,
    * not sketch noise), plus the exact ceil(q·N) rank statistic over
    * the raw rows and err_bp per quantile — the declared-error contract
    * every sketch in the family ships.
    *
    * Output per (group, quantile): (g, q, n_range, m_sample, est_cents,
    * exact_cents, err_bp, rollup_matches) — bounded at |groups|·|qs|.
    */
  def quantileRollup(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valueCol: String, dayFrom: String, dayTo: String,
      k: Int = 128, qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(k >= 1 && qs.nonEmpty)
    // whole centiles in (0, 1] only: the q output column and the
    // est_/exact_ aggregate aliases are integer-percent labels — a
    // truncated 0.955 would alias 0.95's columns, and q <= 0 or > 1
    // would silently match no rank and emit NULL statistics
    qs.foreach { q =>
      require(q > 0.0 && q <= 1.0, s"quantile out of (0, 1]: $q")
      require((q * 100) == math.rint(q * 100),
        s"quantile must be a whole centile (label is integer percent): $q")
    }
    require(qs.map(q => (q * 100).toInt).distinct.size == qs.size,
      s"duplicate centile labels in $qs")
    import org.apache.spark.sql.expressions.Window
    def pct(q: Double) = (q * 100).toInt
    val base = quantileSketchBase(df, groupCol, tsCol, idCol, valueCol)
      .where(col("day").between(lit(dayFrom), lit(dayTo)))
    // route (a): the daily state table, then the min-k merge of states
    val daily = bottomKByHash(base, Seq("g", "day"), k)
    val merged = bottomKByHash(daily.drop("rk"), Seq("g"), k)
      .localCheckpoint()
    // route (b): one direct sketch over the raw range — a different
    // physical route to what must be the same k rows
    val direct = bottomKByHash(base, Seq("g"), k)
    val cmp = merged.select(col("g"), col("rk"), col("hk").as("m_hk"),
        col("id").as("m_id"), col("v").as("m_v"))
      .join(direct.select(col("g"), col("rk"), col("hk").as("d_hk"),
        col("id").as("d_id"), col("v").as("d_v")),
        Seq("g", "rk"), "full_outer")
      .groupBy(col("g")).agg(
        sum(when(col("m_hk") <=> col("d_hk") &&
          col("m_id") <=> col("d_id") && col("m_v") <=> col("d_v"), 0L)
          .otherwise(1L)).as("mism"))
      .select(col("g"), (col("mism") === 0L).as("rollup_matches"))
    val mSz = merged.groupBy(col("g")).agg(count(lit(1)).as("m_sample"))
    // estimator: merged sample ordered by value, integer rank target
    val vr = merged
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .join(broadcast(mSz), "g")
    val estAggs = qs.map(q =>
      min(when(col("vr") === ceilRankTarget(q, "m_sample"), col("v")))
        .as(s"est_${pct(q)}"))
    val est = vr.groupBy(col("g")).agg(estAggs.head, estAggs.tail: _*)
    // exact rank statistic over the raw range rows (the audit truth)
    val nr = base.groupBy(col("g")).agg(count(lit(1)).as("n_range"))
    val rn = base
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .join(broadcast(nr), "g")
    val exAggs = qs.map(q =>
      min(when(col("rn") === ceilRankTarget(q, "n_range"), col("v")))
        .as(s"exact_${pct(q)}"))
    val exact = rn.groupBy(col("g")).agg(exAggs.head, exAggs.tail: _*)
    nr.join(mSz, "g").join(est, "g").join(exact, "g")
      .join(cmp, "g")
      .select(col("g"), col("n_range"), col("m_sample"),
        col("rollup_matches"),
        explode(array(qs.map(q => struct(lit(pct(q).toLong).as("q"),
          col(s"est_${pct(q)}").as("est_cents"),
          col(s"exact_${pct(q)}").as("exact_cents"))): _*)).as("e"))
      .select(col("g"), col("e.q").as("q"), col("n_range"),
        col("m_sample"), col("e.est_cents").as("est_cents"),
        col("e.exact_cents").as("exact_cents"),
        expr("abs(e.est_cents - e.exact_cents) * 10000 DIV " +
          "greatest(abs(e.exact_cents), 1)").as("err_bp"),
        col("rollup_matches"))
      .orderBy(col("g"), col("q"))
  }

  /** Running quantile-to-date timeline off the daily sketch table — the
    * growth-curve dual of [[quantileRollup]] (the hllTimeline posture
    * applied to percentiles): per (group, day) the p-quantile estimate
    * over EVERYTHING seen up to that day, computed from the daily
    * bottom-k states alone. The as-of prefix merge is a theta join of
    * the state table against the day grid (state rows × later days —
    * bounded by groups·days²·k, STATE-sized, never the data) followed by
    * the same min-k re-rank; the estimator and its exact-integer rank
    * target are [[quantileRollup]]'s. The exact running count rides
    * along sketch-shaped: per-day counts → one running-sum window over
    * the bounded (group, day) grid, never a per-day re-scan.
    *
    * Determinism: every path is the salted-hash order + integer ranks,
    * so the whole timeline replays hash-exact in the oracle; the spec
    * proves final-day == the full-range rollup estimate and monotone
    * sample growth.
    */
  def quantileTimeline(df: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valueCol: String, k: Int = 128,
      qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(k >= 1 && qs.nonEmpty)
    qs.foreach { q =>
      require(q > 0.0 && q <= 1.0, s"quantile out of (0, 1]: $q")
      require((q * 100) == math.rint(q * 100),
        s"quantile must be a whole centile (label is integer percent): $q")
    }
    import org.apache.spark.sql.expressions.Window
    def pct(q: Double) = (q * 100).toInt
    val base = quantileSketchBase(df, groupCol, tsCol, idCol, valueCol)
    val daily = bottomKByHash(base, Seq("g", "day"), k)
      .drop("rk").localCheckpoint()
    val days = daily.select(col("g"), col("day").as("asof")).distinct()
    val prefix = daily.join(days, Seq("g"))
      .where(col("day") <= col("asof"))
    val merged = bottomKByHash(prefix, Seq("g", "asof"), k)
    val mSz = merged.groupBy(col("g"), col("asof"))
      .agg(count(lit(1)).as("m_sample"))
    val vr = merged
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("g"), col("asof"))
          .orderBy(col("v"), col("id"))))
      .join(broadcast(mSz), Seq("g", "asof"))
    val estAggs = qs.map(q =>
      min(when(col("vr") === ceilRankTarget(q, "m_sample"), col("v")))
        .as(s"est_${pct(q)}"))
    val est = vr.groupBy(col("g"), col("asof"))
      .agg(estAggs.head, estAggs.tail: _*)
    val nTo = base.groupBy(col("g"), col("day")).agg(count(lit(1))
        .as("n_day"))
      .withColumn("n_todate", sum(col("n_day")).over(
        Window.partitionBy(col("g")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("day").as("asof"), col("n_todate"))
    nTo.join(mSz, Seq("g", "asof")).join(est, Seq("g", "asof"))
      .select(col("g"), col("asof").as("day"), col("n_todate"),
        col("m_sample"),
        explode(array(qs.map(q => struct(lit(pct(q).toLong).as("q"),
          col(s"est_${pct(q)}").as("est_cents"))): _*)).as("e"))
      .select(col("g"), col("day"), col("e.q").as("q"), col("n_todate"),
        col("m_sample"), col("e.est_cents").as("est_cents"))
      .orderBy(col("g"), col("day"), col("q"))
  }

  /** KMV (k-minimum-values / bottom-k) sketch overlap: per pair of groups,
    * the union-size and Jaccard estimates read ONLY from each group's k=64
    * smallest salted 52-bit md5 hash values (md5, not the rolling fold —
    * see hllAudit), next to the exact intersection / union / Jaccard and
    * the error in basis points. The theta-sketch set
    * operation that audience_overlap-style questions run at 100 TB when
    * the exact pairwise join stops paying: k BIGINTs per group travel to
    * the coordinator instead of the full id sets.
    *
    * Estimators (Beyer et al. / theta sketch): union_est = (k-1) * M /
    * kth-smallest of the merged sketch (M = hash-space size 2^52);
    * jacc_est = |{v in the union's bottom-k : v in sketch(A) ∩ sketch(B)}|
    * / k. When the merged sketch holds fewer than k values both sides are
    * complete sets and the estimates are exact by construction.
    *
    * 100 TB posture: per-group bottom-k runs as the skew-safe two-phase
    * rank (local rank within (group, input-partition) caps any reducer at
    * k * n_partitions rows, then the bounded set ranks globally); the
    * pair stage touches only k-row sketches. Distinct-by-hash first, so
    * both engines see the same value multiset regardless of fold
    * collisions. The exact columns certify the estimates, like hllAudit.
    */
  /** The per-group KMV bottom-k hash sketch + the full distinct hash
    * sets — the shared build of [[kmvOverlap]] and [[kmvDifference]]
    * (one definition so the two set operations cannot hash or rank
    * apart). The +1 maps the hash into 1..2^52 so u_kth (the union_est
    * denominator) can never be 0 — hash value 0 in the bottom-k would
    * otherwise yield an engine-divergent row (Spark null vs DuckDB
    * Infinity); rank order is unchanged (monotone shift) and the
    * estimator bias of one part in 2^52 is far below the 2-dp
    * rounding. */
  /** The KMV hash — salted 52-bit md5 of the value, shifted to 1..2⁵²
    * so a zero kth-hash can never divide: the ONE definition shared by
    * the batch sketch and the streaming twin
    * (`EventStream.kmvRegisterStream`), so the two cannot hash apart. */
  private[graft] def kmvHash(v: Column): Column =
    md5Bits52("kmv:", v.cast("string")) + 1

  private def kmvSketch(df: DataFrame, groupCol: String,
      valueCol: String, k: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val hc = kmvHash(col(valueCol))
    val hashes = df.select(col(groupCol).as("g"), col(valueCol))
      .where(col(valueCol).isNotNull)
      .select(col("g"), hc.as("hc")).distinct()
      .localCheckpoint()
    val localW = Window.partitionBy(col("g"), col("part"))
      .orderBy(col("hc").asc)
    val globalW = Window.partitionBy(col("g")).orderBy(col("hc").asc)
    val sketch = hashes
      .withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(localW)).where(col("lr") <= k)
      .withColumn("rk", row_number().over(globalW)).where(col("rk") <= k)
      .select(col("g"), col("hc"))
      .localCheckpoint()
    (hashes, sketch)
  }

  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (hashes, sketch) = kmvSketch(df, groupCol, valueCol, k)
    val types = sketch.select(col("g")).distinct()
    val pairs = broadcast(types.select(col("g").as("ta"))
      .crossJoin(broadcast(types.select(col("g").as("tb"))))
      .where(col("ta") < col("tb")))
    // merged per-pair sketch rows with side-membership flags
    val merged = pairs
      .join(sketch, col("g") === col("ta") || col("g") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("hc"))
      .agg(max(when(col("g") === col("ta"), 1).otherwise(0)).as("in_a"),
        max(when(col("g") === col("tb"), 1).otherwise(0)).as("in_b"))
    val pairW = Window.partitionBy(col("ta"), col("tb"))
    val est = merged
      .withColumn("urk", row_number().over(pairW.orderBy(col("hc").asc)))
      .withColumn("cnt", count(lit(1)).over(pairW))
      .withColumn("kk", least(lit(k.toLong), col("cnt")))
      .where(col("urk") <= col("kk"))
      .groupBy(col("ta"), col("tb"))
      .agg(max(col("cnt")).as("cnt"), max(col("kk")).as("kk"),
        sum((col("in_a") * col("in_b")).cast("long")).as("matches"),
        max(when(col("urk") === col("kk"), col("hc"))).as("u_kth"))
    // exact side from the full hash sets (the certificate)
    val nper = hashes.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = hashes.select(col("g").as("ga"), col("hc"))
      .join(hashes.select(col("g").as("gb"), col("hc")), "hc")
      .where(col("ga") < col("gb"))
      .groupBy(col("ga").as("ta"), col("gb").as("tb"))
      .agg(count(lit(1)).as("inter_exact"))
    val mD = 4503599627370496.0 // 2^52, the hash space
    est
      .join(nper.select(col("g").as("ta"), col("n").as("n_a")), "ta")
      .join(nper.select(col("g").as("tb"), col("n").as("n_b")), "tb")
      .join(inter, Seq("ta", "tb"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .withColumn("union_exact", col("n_a") + col("n_b") - col("inter_exact"))
      .withColumn("jacc_exact", round(col("inter_exact").cast("double") /
        col("union_exact").cast("double"), 4))
      .withColumn("jacc_kmv", round(col("matches").cast("double") /
        col("kk").cast("double"), 4))
      .withColumn("union_est", round(
        when(col("cnt") < k.toLong, col("cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(mD) /
            col("u_kth").cast("double")), 2))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
        col("inter_exact"), col("union_exact"), col("jacc_exact"),
        col("jacc_kmv"), col("union_est"),
        round(abs(col("jacc_kmv") - col("jacc_exact")) * 10000.0, 0)
          .cast("long").as("jacc_err_bp"),
        round(abs(col("union_est") - col("union_exact").cast("double")) /
          col("union_exact").cast("double") * 10000.0, 0)
          .cast("long").as("union_err_bp"))
      .orderBy(col("ta"), col("tb"))
  }

  /** KMV set-DIFFERENCE estimation — the third theta-sketch set
    * operation next to [[kmvOverlap]]'s union/intersection: per ordered
    * group pair, |A \ B| and |B \ A| estimated from the two bottom-k
    * sketches alone. The merged bottom-kk rows are a uniform sample of
    * the union, so the one-sided membership shares `a_only/kk` and
    * `b_only/kk` scale the union estimate into difference estimates
    * (Beyer et al.'s estimator composed with the disjoint-partition
    * identity |A∪B| = |A\B| + |B\A| + |A∩B|). The published integers
    * (a_only, b_only, matches, kk) are exact sketch facts — hash-exact
    * on any engine — and the scaled estimates reuse [[kmvOverlap]]'s
    * replayable double arithmetic (same CASE, same rounding). Exact
    * differences off the full hash sets certify, with err in bp of the
    * union (the natural denominator: a tiny true difference under a
    * huge union is a share estimate, not a ratio estimate). When the
    * merged sketch holds fewer than k values both sketches are complete
    * and every estimate is exact by construction.
    *
    * Scale shape: identical to [[kmvOverlap]] — k-row sketches into the
    * pair stage, one bounded pair aggregate; sketch build shared via
    * [[kmvSketch]] so the two operations cannot hash or rank apart.
    */
  def kmvDifference(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (hashes, sketch) = kmvSketch(df, groupCol, valueCol, k)
    val types = sketch.select(col("g")).distinct()
    val pairs = broadcast(types.select(col("g").as("ta"))
      .crossJoin(broadcast(types.select(col("g").as("tb"))))
      .where(col("ta") < col("tb")))
    val merged = pairs
      .join(sketch, col("g") === col("ta") || col("g") === col("tb"))
      .groupBy(col("ta"), col("tb"), col("hc"))
      .agg(max(when(col("g") === col("ta"), 1).otherwise(0)).as("in_a"),
        max(when(col("g") === col("tb"), 1).otherwise(0)).as("in_b"))
    val pairW = Window.partitionBy(col("ta"), col("tb"))
    val est = merged
      .withColumn("urk", row_number().over(pairW.orderBy(col("hc").asc)))
      .withColumn("cnt", count(lit(1)).over(pairW))
      .withColumn("kk", least(lit(k.toLong), col("cnt")))
      .where(col("urk") <= col("kk"))
      .groupBy(col("ta"), col("tb"))
      .agg(max(col("cnt")).as("cnt"), max(col("kk")).as("kk"),
        sum((col("in_a") * (lit(1) - col("in_b"))).cast("long"))
          .as("a_only"),
        sum(((lit(1) - col("in_a")) * col("in_b")).cast("long"))
          .as("b_only"),
        sum((col("in_a") * col("in_b")).cast("long")).as("matches"),
        max(when(col("urk") === col("kk"), col("hc"))).as("u_kth"))
    val nper = hashes.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = hashes.select(col("g").as("ga"), col("hc"))
      .join(hashes.select(col("g").as("gb"), col("hc")), "hc")
      .where(col("ga") < col("gb"))
      .groupBy(col("ga").as("ta"), col("gb").as("tb"))
      .agg(count(lit(1)).as("inter_exact"))
    val mD = 4503599627370496.0 // 2^52, the hash space
    val unionEst =
      when(col("cnt") < k.toLong, col("cnt").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(mD) /
          col("u_kth").cast("double"))
    est
      .join(nper.select(col("g").as("ta"), col("n").as("n_a")), "ta")
      .join(nper.select(col("g").as("tb"), col("n").as("n_b")), "tb")
      .join(inter, Seq("ta", "tb"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .withColumn("diff_a_exact", col("n_a") - col("inter_exact"))
      .withColumn("diff_b_exact", col("n_b") - col("inter_exact"))
      .withColumn("union_exact",
        col("n_a") + col("n_b") - col("inter_exact"))
      .withColumn("diff_a_est", round(
        unionEst * col("a_only").cast("double") / col("kk").cast("double"),
        2))
      .withColumn("diff_b_est", round(
        unionEst * col("b_only").cast("double") / col("kk").cast("double"),
        2))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"),
        col("a_only"), col("b_only"), col("matches"), col("kk"),
        col("diff_a_exact"), col("diff_b_exact"),
        col("diff_a_est"), col("diff_b_est"),
        round(abs(col("diff_a_est") -
          col("diff_a_exact").cast("double")) /
          col("union_exact").cast("double") * 10000.0, 0)
          .cast("long").as("diff_a_err_bp"),
        round(abs(col("diff_b_est") -
          col("diff_b_exact").cast("double")) /
          col("union_exact").cast("double") * 10000.0, 0)
          .cast("long").as("diff_b_err_bp"))
      .orderBy(col("ta"), col("tb"))
  }

  /** KMV TIMELINE — audience distinct-to-date per (group, day) off
    * per-day bottom-k states alone (the [[hllTimeline]] /
    * quantileTimeline posture applied to the theta sketch): the
    * warehouse keeps one k-minimum-values state per (group, day) —
    * distinct salted hashes, the SAME "kmv:" fold as [[kmvSketch]], so
    * the set operations and the timeline cannot hash apart — and the
    * distinct-count-to-date at any as-of day is answered by min-k
    * merging the prefix's states. The merge is EXACT (any hash in the
    * true bottom-k of the prefix is in its own day's bottom-k — the
    * smaller hashes that would evict it would also be in the prefix),
    * so only the ESTIMATOR approximates: distinct_est = (k−1)·M / kth
    * smallest of the merged state (Beyer et al.), exact by construction
    * while the merged state holds < k values. The exact
    * distinct-to-date certificate rides state-shaped too: one
    * first-occurrence-day aggregate over the distinct hashes, then a
    * bounded (group, day)-grid running sum — never a per-prefix rescan.
    *
    * Scale shape: states are min(k, n_day) longs per (group, day)
    * forever; the as-of prefix merge is a theta join of the state table
    * against the day grid (groups·days²·k rows, STATE-sized); exact
    * certification is one distinct pass + grid algebra. Distinct is
    * by-hash on both engines ([[kmvOverlap]]'s collision posture).
    */
  def kmvTimeline(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k must be >= 2 (the estimator uses k-1): $k")
    val hc = md5Bits52("kmv:", col(valueCol).cast("string")) + 1
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(tsCol).cast("date").as("day"),
        hc.as("hc"))
      .distinct()
      .localCheckpoint()
    // per-day bottom-k states — the skew-safe two-phase rank
    val localW = Window.partitionBy(col("g"), col("day"), col("part"))
      .orderBy(col("hc").asc)
    val globalW = Window.partitionBy(col("g"), col("day"))
      .orderBy(col("hc").asc)
    val daily = base.withColumn("part", spark_partition_id())
      .withColumn("lr", row_number().over(localW)).where(col("lr") <= k)
      .withColumn("rk", row_number().over(globalW)).where(col("rk") <= k)
      .select(col("g"), col("day"), col("hc"))
      .localCheckpoint()
    val days = daily.select(col("g"), col("day").as("asof")).distinct()
    // as-of prefix merge: distinct hashes across the prefix's states,
    // re-ranked bottom-kk (cross-day repeats of a value collapse here)
    val prefix = daily.join(days, Seq("g"))
      .where(col("day") <= col("asof"))
      .select(col("g"), col("asof"), col("hc")).distinct()
    val w = Window.partitionBy(col("g"), col("asof"))
    val est = prefix
      .withColumn("urk", row_number().over(w.orderBy(col("hc").asc)))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("kk", least(lit(k.toLong), col("cnt")))
      .where(col("urk") <= col("kk"))
      .groupBy(col("g"), col("asof"))
      .agg(max(col("cnt")).as("cnt"), max(col("kk")).as("kk"),
        max(when(col("urk") === col("kk"), col("hc"))).as("u_kth"))
    // exact distinct-to-date: first-occurrence day counts + grid sum
    val firstCounts = base.groupBy(col("g"), col("hc"))
      .agg(min(col("day")).as("fday"))
      .groupBy(col("g"), col("fday")).agg(count(lit(1)).as("nf"))
    val exactAsof = days.join(firstCounts, Seq("g"))
      .where(col("fday") <= col("asof"))
      .groupBy(col("g"), col("asof")).agg(sum(col("nf")).as("exact_distinct"))
    val mD = 4503599627370496.0 // 2^52, the hash space
    est.join(exactAsof, Seq("g", "asof"))
      .withColumn("distinct_est", round(
        when(col("cnt") < k.toLong, col("cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(mD) /
            col("u_kth").cast("double")), 2))
      .select(col("g"), col("asof").as("day"), col("kk").as("m_state"),
        col("exact_distinct"), col("distinct_est"),
        round(abs(col("distinct_est") -
          col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double") * 10000.0, 0)
          .cast("long").as("err_bp"))
      .orderBy(col("g"), col("day"))
  }

  /** Bloom-filtered semi-join audit — the RUNTIME-FILTER pattern: before
    * shuffling a 100 TB probe side into a join, ship an m-bit Bloom filter
    * of the build side's keys to every scan task and drop probe rows whose
    * k bits aren't all set. Bloom admits no false negatives, so the join
    * result is exact; the only cost is the false-positive rows that ride
    * the shuffle for nothing. This query executes the whole contract on
    * orders ⋈ (customers in `nationKey`): builds the m=4096 / k=3 filter
    * from the salted md5 hashes (a bounded ≤ m-bit driver pull, like the
    * centroid/codebook training pulls), gates the probe side, and emits
    * ONE summary row: build/probe/passed/true-match counts, the
    * false-positive count and its rate in bp over the truly-negative
    * probes, and a `no_false_negatives` verdict computed by matching the
    * gated result against the ungated semi-join truth.
    *
    * 100 TB posture: the filter is m/8 bytes forever; the gate is a pure
    * projection at scan speed; what the pattern buys is the shuffle of
    * the (1 - selectivity) dropped rows — here measured, not assumed.
    * Spark's own `spark.sql.optimizer.runtimeFilter` does this opaquely;
    * this operator is the engine-portable, oracle-replayable form.
    */
  def bloomJoinAudit(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String, mBits: Int = 4096, kProbes: Int = 3): DataFrame = {
    def hashes(c: Column): Seq[Column] = (0 until kProbes).map(i =>
      pmod(md5Bits52(s"bj$i:", c.cast("string")), lit(mBits.toLong)))
    val bitsSet: Array[Boolean] = {
      val arr = new Array[Boolean](mBits)
      build.select(explode(array(hashes(col(buildKey)): _*)).as("b"))
        .distinct().collect().foreach(r => arr(r.getLong(0).toInt) = true)
      arr
    }
    val bitsLit = typedLit(bitsSet)
    val pass = hashes(col(probeKey))
      .map(h => element_at(bitsLit, (h + 1L).cast("int")))
      .reduce(_ && _)
    val truth = build.select(col(buildKey).as(probeKey)).distinct()
    val gated = probe
      .select(col(probeKey), pass.as("bloom_pass"))
      .join(truth.withColumn("is_match", lit(true)), Seq(probeKey), "left")
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("is_match").isNotNull, 1L).otherwise(0L)).as("n_match"),
        sum(when(col("bloom_pass") && col("is_match").isNotNull, 1L)
          .otherwise(0L)).as("n_match_passed"))
    gated.crossJoin(broadcast(
        build.agg(count(lit(1)).as("n_build"))))
      .select(col("n_build"), col("n_probe"), col("n_pass"), col("n_match"),
        (col("n_pass") - col("n_match_passed")).as("n_false_pos"),
        round((col("n_pass") - col("n_match_passed")).cast("double") /
          (col("n_probe") - col("n_match")).cast("double") * 10000.0, 0)
          .cast("long").as("fp_bp"),
        (col("n_match_passed") === col("n_match")).as("no_false_negatives"))
  }

  /** Join-size estimation audit by CORRELATED key sampling (the join
    * synopsis a planner consults before choosing a strategy): the true
    * self-join cardinality on a key is Σ_k n_k² — exactly the quantity
    * that explodes on skew — and a 1/2^bits deterministic KEY sample
    * (md5 threshold on the key, so a sampled key keeps ALL its rows —
    * row-sampling would underestimate quadratics) estimates it as
    * 2^bits · Σ_{sampled k} n_k². This query emits, per group, the exact
    * count, the sampled estimate, the realized key-sample rate, and the
    * error in bp — the trust contract for planning joins from synopses
    * instead of scans. Integer arithmetic end to end except the final
    * error ratio.
    *
    * Scale shape: one map-side-combinable (group, key) count, then a
    * bounded per-group aggregate; the synopsis a real warehouse keeps is
    * just the sampled branch (1/2^bits of the key space, forever).
    */
  def joinSizeAudit(df: DataFrame, groupCol: String, keyCol: String,
      shiftBits: Int = 3): DataFrame = {
    require(shiftBits >= 1 && shiftBits <= 20, "1 <= shiftBits <= 20")
    val thresh = 1L << (52 - shiftBits)
    val scale = 1L << shiftBits
    val hc = md5Bits52("js:", col(keyCol).cast("string"))
    df.select(col(groupCol), col(keyCol)).where(col(keyCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("n"), (hc < lit(thresh)).as("in_sample"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_keys_sampled"),
        sum(col("n") * col("n")).as("exact_pairs"),
        (sum(when(col("in_sample"), col("n") * col("n")).otherwise(0L)) *
          scale).as("est_pairs"))
      .select(col(groupCol), col("n_keys"), col("n_keys_sampled"),
        round(col("n_keys_sampled").cast("double") /
          col("n_keys").cast("double") * 10000.0, 0).cast("long")
          .as("sample_bp"),
        col("exact_pairs"), col("est_pairs"),
        round(abs(col("est_pairs") - col("exact_pairs")).cast("double") /
          col("exact_pairs").cast("double") * 10000.0, 0).cast("long")
          .as("err_bp"))
      .orderBy(col(groupCol))
  }

  /** Deterministic hash-sample quantile audit: per group, exact p50/p95
    * next to the same quantiles computed over ONLY the rows whose salted
    * 52-bit md5 hash falls under 2^(52-shiftBits) — a 2^-shiftBits
    * Bernoulli sample that is a pure scan predicate (no RNG state, no
    * reservoir, reproducible on any engine/retry/partitioning, exactly
    * replayable by a SQL oracle), plus the realized sample rate and the
    * per-quantile error in basis points.
    *
    * This is the third leg of the sketch-trust family (43b distinct /
    * 43c t-digest / here sampling): the production path at 100 TB is the
    * sample branch alone — a codegen'd filter feeding a tiny aggregate —
    * and this audit certifies what the hash-sample costs in quantile
    * accuracy. The exact side exists only as the certificate (same
    * posture as hllAudit / cmsTopK).
    */
  def sampleQuantileAudit(df: DataFrame, typeCol: String, valueCol: String,
      idCol: String, shiftBits: Int = 3): DataFrame = {
    require(shiftBits >= 1 && shiftBits <= 20, "1 <= shiftBits <= 20")
    val thresh = 1L << (52 - shiftBits)
    val hc = md5Bits52("sq:", col(idCol).cast("string"))
    df.select(col(typeCol), col(valueCol).as("v"),
        (hc < lit(thresh)).as("in_sample"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sample"),
        expr("percentile(v, 0.5)").as("exact_p50"),
        expr("percentile(v, 0.95)").as("exact_p95"),
        expr("percentile(CASE WHEN in_sample THEN v END, 0.5)").as("samp_p50"),
        expr("percentile(CASE WHEN in_sample THEN v END, 0.95)").as("samp_p95"))
      .select(col(typeCol), col("n_total"), col("n_sample"),
        round(col("n_sample").cast("double") / col("n_total").cast("double")
          * 10000.0, 0).cast("long").as("sample_bp"),
        col("exact_p50"), col("samp_p50"), col("exact_p95"), col("samp_p95"),
        round(abs(col("samp_p50") - col("exact_p50")) / col("exact_p50")
          * 10000.0, 0).cast("long").as("p50_err_bp"),
        round(abs(col("samp_p95") - col("exact_p95")) / col("exact_p95")
          * 10000.0, 0).cast("long").as("p95_err_bp"))
      .orderBy(col(typeCol))
  }

  /** Count-min sketch over the corpus token stream, certified against
    * exact counts for the true top-`k` tokens: (token, true_count,
    * cms_est) with cms_est >= true_count always (one-sided error) and
    * equality whenever none of the token's d cells collide.
    *
    * The sketch is d rows x w counters keyed by the salted portable fold
    * (bucket_r(t) = fold("cms" + r + ":" + t) % w) so a SQL oracle
    * replays the whole structure. 100 TB posture: the cells frame is a
    * map-side-combinable groupBy bounded at d*w counters per partition
    * (and d*w rows total — a fixed-size frequency summary of an unbounded
    * stream); estimates join the candidate set against the BROADCAST
    * sketch. The exact count side exists here to certify the estimates;
    * a production scorer keeps only the d*w cells.
    */
  /** The CMS row-r bucket of token t: `fold("cms<r>:" + t) % w` — shared
    * by the batch sketch and the streaming cell builder so the two can
    * never hash apart. */
  private[graft] def cmsBucket(r: Int, t: Column, w: Int): Column = {
    import org.apache.spark.sql.graftnative.RollingHash.rollingHash
    pmod(rollingHash(concat(lit(s"cms$r:"), t)), lit(w.toLong))
  }

  /** The d x w cell frame of the count-min sketch over a `token` column —
    * cell(r, b) = number of token occurrences hashing to b in row r.
    * Built from the (token, count) aggregate (identical to folding the
    * raw stream — addition commutes — without a d-fold stream blowup);
    * the streaming twin (EventStream.cmsCellStream) folds the raw
    * stream directly and EventStreamSpec proves the files equal. */
  private[graft] def cmsCells(tokens: DataFrame, d: Int, w: Int): DataFrame =
    tokens
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsBucket(r, col("token"), w).as("b"),
          col("c").as("c"))): _*)).as("x"))
      .groupBy(col("x.r").as("r"), col("x.b").as("b"))
      .agg(sum(col("x.c")).as("v"))

  def cmsTopK(docs: DataFrame, d: Int, w: Int, k: Int): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    cmsTopKFromCells(cmsCells(toks, d, w), toks, d, w, k)
  }

  /** The top-k read path of [[cmsTopK]] over an ALREADY-BUILT (r, b, v)
    * cell matrix — shared with the STREAMED cell build (the registered
    * q_stream_cms row): true counts from a batch pass certify the
    * min-over-rows estimates read from whichever sketch the caller
    * maintains, so a streamed matrix and the batch matrix can never
    * estimate through different arithmetic. */
  private[graft] def cmsTopKFromCells(cells: DataFrame, toks: DataFrame,
      d: Int, w: Int, k: Int): DataFrame = {
    val cnt = toks.groupBy(col("token")).agg(count(lit(1)).as("true_count"))
    cnt
      .select(col("token"), col("true_count"),
        posexplode(array((0 until d).map(r =>
          cmsBucket(r, col("token"), w)): _*))
          .as(Seq("r", "b")))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("token"), col("true_count"))
      .agg(min(col("v")).as("cms_est"))
      .orderBy(col("true_count").desc, col("token").asc)
      .limit(k)
  }

  /** Day-merged count-min sketch — the CMS member of the mergeable
    * sketch-warehouse family (HLL/quantile/KMV/SpaceSaving all have
    * their day-merge rows; this completes the symmetry): one d×w cell
    * matrix per day, merged into the range sketch by ELEMENTWISE SUM.
    * Counter addition commutes, so the merged sketch is IDENTICAL to
    * the direct sketch over the whole range — an identity verdict like
    * quantileRollup's, strictly stronger than SpaceSaving's 2e
    * threshold — and every point estimate off the merged cells keeps
    * the CMS one-sided guarantee est >= true. Published rows: the true
    * top-`k` items with exact counts, the merged-sketch estimate, the
    * per-item one-sided verdict, and the cell-level identity verdict
    * (n_cells, cells_match) riding every row (the 43b literal-verdict
    * pattern).
    *
    * Input: (`token` STRING, `day`) rows — token occurrences with their
    * day. Buckets come from [[cmsBucket]] (the salted portable fold
    * shared with [[cmsTopK]] and the 45m streaming cell build), so the
    * daily states, the merge, and the estimates all replay in SQL.
    *
    * 100 TB posture: the daily state is d·w counters per day FOREVER —
    * a constant-size summary of an unbounded stream — and the merge is
    * STATE-sized (days × d·w rows), never data-sized; estimates join
    * the k-row candidate set against the BROADCAST merged cells. The
    * direct-sketch side exists here to certify the merge law; a
    * production rollup reads the daily matrices alone.
    */
  def cmsRollup(toksRaw: DataFrame, d: Int, w: Int, k: Int): DataFrame = {
    val bucket = (r: Int, t: Column) => cmsBucket(r, t, w)
    // NULL token/day rows are excluded up front (the kmvSketch isNotNull
    // discipline): a NULL token has no bucket — cmsBucket's concat
    // null-propagates — and a NULL day would silently vanish from the
    // null-unsafe merge/estimate equi-joins
    val toks = toksRaw.where(col("token").isNotNull && col("day").isNotNull)
    // per-day cell matrices (the persisted daily state), then the merge
    val cntDay = toks.groupBy(col("token"), col("day"))
      .agg(count(lit(1)).as("c"))
    val daily = cntDay
      .select(col("day"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r, col("token")).as("b"),
          col("c").as("c"))): _*)).as("x"))
      .groupBy(col("day"), col("x.r").as("r"), col("x.b").as("b"))
      .agg(sum(col("x.c")).as("v"))
    val merged = daily.groupBy(col("r"), col("b"))
      .agg(sum(col("v")).as("v"))
    // the identity verdict: merged cells == the direct range sketch
    val direct = cmsCells(toks.select(col("token")), d, w)
    val verdict = merged.as("m")
      .join(direct.as("dd"), Seq("r", "b"), "full_outer")
      .agg(count(lit(1)).as("n_cells"),
        (count(lit(1)) === sum(when(col("m.v") === col("dd.v"), 1L)
          .otherwise(0L))).as("cells_match"))
    // point estimates for the true top-k, off the MERGED cells only;
    // true counts re-aggregate the per-day counts already in hand — no
    // third scan of the raw tokens (the direct-sketch scan above is the
    // merge-law certificate and stays independent by design)
    val cnt = cntDay.groupBy(col("token")).agg(sum(col("c")).as("true_count"))
    cnt
      .select(col("token").as("item"), col("true_count"),
        posexplode(array((0 until d).map(r => bucket(r, col("token"))): _*))
          .as(Seq("r", "b")))
      .join(broadcast(merged), Seq("r", "b"))
      .groupBy(col("item"), col("true_count"))
      .agg(min(col("v")).as("cms_est"))
      .withColumn("one_sided", col("cms_est") >= col("true_count"))
      .crossJoin(broadcast(verdict))
      .orderBy(col("true_count").desc, col("item").asc)
      .limit(k)
  }

  /** BATCH SpaceSaving (Metwally et al. 2005) — the per-key
    * identified-top-m summary, folded over a deterministic order: where
    * [[cmsTopK]]'s CMS answers point queries over ALL items in d·w
    * cells, SpaceSaving keeps the m hot items WITH their identities —
    * and this is the batch twin of the streaming
    * `EventStream.heavyHittersStream`, sharing its exact fold: a
    * tracked item increments; an untracked item seizes the minimum
    * counter by (est ASC, item ASC), inheriting its count as one-sided
    * error. Input is (g, i, o1, o2) rows; each group's rows fold in
    * (o1, o2) order — pass a unique ordering pair (the streaming twin's
    * (ts, event_id) discipline) and the summary is identical on any
    * partitioning or retry (the spec proves batch == streaming fold).
    *
    * Scale shape: one exchange keyed on the group, then a
    * sortWithinPartitions + a single streaming pass with O(m) state per
    * group and O(m) output rows — the m counters ARE the whole summary,
    * rows never accumulate. A group's stream is sequential BY
    * DEFINITION (the fold order is the algorithm's input, exactly like
    * the streaming twin's per-key state); groups are the parallelism
    * unit, so use a bounded-cardinality group (event types, days,
    * tenants). Output: (g, item, est, err, n_events) — the group's
    * stream length rides each row (the fold counted it for free; it is
    * the denominator of the ε = 1/m error guarantee every consumer
    * needs).
    */
  /** One SpaceSaving fold step, shared by [[spaceSavingSummary]] and the
    * streaming twin (`EventStream.heavyHittersStream`) — ONE definition
    * so the two folds can never drift: a tracked item increments; an
    * untracked item seizes the (est ASC, item ASC) minimum counter,
    * inheriting its count as one-sided error. */
  private[graft] def ssStep(counters: List[(Long, Long, Long)], item: Long,
      m: Int): List[(Long, Long, Long)] =
    counters.indexWhere(_._1 == item) match {
      case idx if idx >= 0 =>
        val (i2, est, err) = counters(idx)
        counters.updated(idx, (i2, est + 1, err))
      case _ if counters.length < m =>
        (item, 1L, 0L) :: counters
      case _ =>
        val (vit, vest, _) = counters.minBy { case (i2, est, _) => (est, i2) }
        (item, vest + 1, vest) :: counters.filterNot(_._1 == vit)
    }

  def spaceSavingSummary(items: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("g").cast("string"), col("i").cast("long"),
        col("o1").cast("long"), col("o2").cast("long"))
      .as[(String, Long, Long, Long)]
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("o1"), col("o2"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Long, Long)]()
        // explicit started flag, NOT null-as-sentinel: a NULL group key
        // (cast-to-string keeps it null) is a group like any other —
        // sortWithinPartitions puts it first, and a null sentinel would
        // silently fold then drop its counters at the first real group
        var started = false
        var cur: String = null
        var n = 0L
        var counters = List.empty[(Long, Long, Long)]
        // the group streams wholly through this fold, so the stream
        // length N — the epsilon-guarantee denominator every consumer
        // needs — rides each summary row for free
        def flush(): Unit = if (started)
          counters.foreach { case (i2, est, err) =>
            out += ((cur, i2, est, err, n)) }
        it.foreach { case (g, item, _, _) =>
          if (!started || g != cur) {
            flush(); started = true; cur = g; counters = Nil; n = 0L
          }
          n += 1
          counters = ssStep(counters, item, m)
        }
        flush()
        out.iterator
      }
      .toDF("g", "item", "est", "err", "n_events")
  }

  /** SHARDED SpaceSaving — the parallel scale path when one group's
    * stream is too long for a single sequential fold: items shard by
    * the portable salted hash mod `shards`, each shard folds its OWN
    * sub-stream with m counters (the [[ssStep]] fold, same (o1, o2)
    * order within shard), and the merged per-group summary is the plain
    * UNION of shard counters — exact, because item-sharding puts ALL
    * occurrences of an item in one shard, so no counter ever needs
    * cross-shard addition (the degenerate-but-deterministic corner of
    * Agarwal et al.'s mergeable summaries). The guarantees tighten:
    * a shard tracks anything with count > N_shard/m ≤ N/m, so every
    * globally-guaranteed item is still tracked, est ≥ true and
    * est − err ≤ true hold per shard, and err·m ≤ N_shard ≤ N. State
    * is m counters per (group, shard); parallelism is groups × shards
    * instead of groups. Output: (g, shard, item, est, err, n_events)
    * with n_events the SHARD's stream length. Group values must not
    * contain a tab (the composite-key separator).
    */
  def spaceSavingSummarySharded(items: DataFrame, m: Int,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val sharded = items.select(
      concat(col("g").cast("string"), lit("\t"),
        pmod(conv(substring(md5(concat(lit("ssshard:"),
          col("i").cast("string"))), 1, 13), 16, 10).cast("long"),
          lit(shards.toLong)).cast("string")).as("g"),
      col("i"), col("o1"), col("o2"))
    spaceSavingSummary(sharded, m)
      .select(substring_index(col("g"), "\t", 1).as("g"),
        substring_index(col("g"), "\t", -1).cast("int").as("shard"),
        col("item"), col("est"), col("err"), col("n_events"))
  }

  /** The registered AUDIT over [[spaceSavingSummary]] — the 43b
    * sketch-trust pattern: the fold's own est/err are engine state
    * DuckDB cannot replay, so the published rows are the GUARANTEED
    * heavy hitters (exact count · m > N — the set the Metwally theorem
    * promises are all tracked) with their exact counts, plus the four
    * theorem verdicts the oracle asserts as literal true: tracked
    * (guaranteed item present among the m counters), est ≥ exact,
    * est − err ≤ exact, and err·m ≤ N (the error cap). Any fold bug
    * surfaces as a false/NULL verdict → hash mismatch. Exact counts
    * ride the same scan map-side; the group-count frame is
    * |groups|-bounded and broadcasts.
    */
  def spaceSavingAudit(items: DataFrame, m: Int): DataFrame = {
    val summary = spaceSavingSummary(items, m).localCheckpoint()
    // group totals ride the summary (the fold counted its stream), so
    // the audit pays exactly two input scans: the fold and the exact
    // counts; the N frame is |groups| rows off the m·|groups| summary
    val n = summary.groupBy(col("g")).agg(max(col("n_events")).as("n_events"))
    ssAuditCore(summary.select(col("g"), col("item"), col("est"),
      col("err")), n, items, m)
  }

  /** [[spaceSavingAudit]] over the SHARDED summary — the same guaranteed
    * set and the same four theorem verdicts (a globally-guaranteed item
    * is tracked in its shard because count > N/m ≥ N_shard/m; est/err
    * bounds are per-shard facts; err·m ≤ N_shard ≤ N), so the SAME
    * oracle certifies both plans while the fold itself runs
    * groups × shards wide. Item-sharding makes the merged view the
    * plain union of shard counters — no cross-shard addition exists.
    */
  def spaceSavingAuditSharded(items: DataFrame, m: Int,
      shards: Int): DataFrame = {
    val summary = spaceSavingSummarySharded(items, m, shards)
      .localCheckpoint()
    val n = summary.select(col("g"), col("shard"), col("n_events"))
      .distinct()
      .groupBy(col("g")).agg(sum(col("n_events")).as("n_events"))
    ssAuditCore(summary.select(col("g"), col("item"), col("est"),
      col("err")), n, items, m)
  }

  /** [[spaceSavingAudit]] over an ALREADY-FOLDED summary — the entry
    * the streaming twin drains into: `summary` carries (g, item, est,
    * err) (e.g. the final per-group emission of
    * `EventStream.heavyHittersStream`), `n` the per-group stream
    * lengths, `items` the raw (g, i) rows for the exact certification
    * side. Publishes the identical guaranteed-set + theorem-verdict
    * rows as the batch audit, so the batch oracle certifies the
    * streaming fold too (the stream-sketch promotion contract:
    * q_stream_hll/cms/quantile's pattern, completed for SpaceSaving).
    */
  def spaceSavingAuditPrefolded(summary: DataFrame, n: DataFrame,
      items: DataFrame, m: Int): DataFrame =
    ssAuditCore(summary, n, items, m)

  private def ssAuditCore(summary: DataFrame, n: DataFrame,
      items: DataFrame, m: Int, guardFactor: Int = 1): DataFrame = {
    val exact = items.groupBy(col("g"), col("i").as("item"))
      .agg(count(lit(1)).as("exact_cnt"))
    exact.join(broadcast(n), "g")
      .where(col("exact_cnt") * m > col("n_events") * guardFactor)
      .join(summary, Seq("g", "item"), "left")
      .select(col("g").as("group_key"), col("item"), col("exact_cnt"),
        col("est").isNotNull.as("tracked"),
        (col("est") >= col("exact_cnt")).as("est_ge_exact"),
        ((col("est") - col("err")) <= col("exact_cnt")).as("lower_le_exact"),
        (col("err") * m <= col("n_events")).as("err_within_cap"))
      .orderBy(col("group_key"), col("item"))
  }

  /** DAY-MERGED SpaceSaving rollup audit — the mergeable-summaries
    * (Agarwal et al. 2012) completion of the family: a warehouse keeps
    * one m-counter summary per (group, day), and a date-range top-m is
    * answered by MERGING summaries, never refolding raw rows. The merge
    * is the paper's: for each candidate item (tracked anywhere in the
    * range), per day add its tracked `est`/`err`, or — when that day's
    * summary is FULL — the day's minimum counter value as both (the
    * SpaceSaving invariant bounds any untracked item's day-count by the
    * minimum counter; a non-full day tracked everything, so absence
    * means zero); keep the m largest merged counters under the
    * deterministic (est DESC, item ASC) order.
    *
    * Theorems carried through the merge (all in the published verdicts):
    * est ≥ true and est − err ≤ true (per-day bounds sum), and
    * err·m ≤ N_range (each day term ≤ N_day/m because Σ of a day's
    * counters = N_day exactly — every arrival adds net 1). The TOP-M
    * membership guarantee weakens to the 2ε threshold: an item with
    * true·m > 2·N_range MUST be in the merged top-m (if it were
    * dropped, the m kept items would each have est > 2N/m, hence
    * true ≥ est − err > N/m, putting ΣN over N — contradiction), so
    * the audit's guaranteed set uses guardFactor = 2 where the
    * single-fold audit uses 1. State: m counters per (group, day)
    * forever; the merge touches only summaries (m·days rows per group).
    *
    * Input must carry (g, day, i, o1, o2); g and day values must be
    * NON-NULL and must not contain a tab (the composite-key separator,
    * as in the sharded fold — concat null-propagates, so a NULL g or
    * day would collapse that group's days into one NULL composite that
    * the downstream null-unsafe equi-joins then drop silently; callers
    * with nullable keys must coalesce to a sentinel first, the
    * [[Reconcile]] escape discipline).
    */
  def spaceSavingRollupAudit(items: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val composite = items.select(
      concat(col("g").cast("string"), lit("\t"),
        col("day").cast("string")).as("g"),
      col("i"), col("o1"), col("o2"))
    val daily = spaceSavingSummary(composite, m).localCheckpoint()
    val split = daily.select(
      substring_index(col("g"), "\t", 1).as("g"),
      substring_index(col("g"), "\t", -1).as("day"),
      col("item"), col("est"), col("err"), col("n_events"))
    val dayMeta = split.groupBy(col("g"), col("day")).agg(
        min(col("est")).as("min_est"),
        count(lit(1)).as("n_counters"),
        max(col("n_events")).as("n_day"))
      .select(col("g"), col("day"),
        when(col("n_counters") === m, col("min_est")).otherwise(lit(0L))
          .as("floor_est"),
        col("n_day"))
    val cand = split.select(col("g"), col("item")).distinct()
    val contrib = cand.join(dayMeta, "g")
      .join(split.select(col("g"), col("day"), col("item"), col("est"),
        col("err")), Seq("g", "day", "item"), "left")
      .select(col("g"), col("item"),
        coalesce(col("est"), col("floor_est")).as("est_c"),
        coalesce(col("err"), col("floor_est")).as("err_c"))
    val merged = contrib.groupBy(col("g"), col("item"))
      .agg(sum(col("est_c")).as("est"), sum(col("err_c")).as("err"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("est").desc, col("item").asc)))
      .where(col("rk") <= m)
    val nRange = dayMeta.groupBy(col("g")).agg(sum(col("n_day"))
      .as("n_events"))
    ssAuditCore(merged.select(col("g"), col("item"), col("est"),
      col("err")), nRange, items, m, guardFactor = 2)
  }

  /** SpaceSaving TIMELINE — heavy-hitter drift-to-date off the daily
    * summaries [[spaceSavingRollupAudit]] already keeps (the
    * hllTimeline / quantileTimeline posture applied to the Agarwal
    * merge): for every as-of day, the prefix's day summaries merge —
    * per candidate item and day, the tracked est/err or the full day's
    * min-counter floor — into that day's top-m, and the 2ε-threshold
    * guaranteed set (exact·m > 2·N_prefix) publishes all four theorem
    * verdicts AT EVERY PREFIX: how the guaranteed heavy-hitter set
    * drifts as days accumulate. Every prefix satisfies the same merge
    * theorems as the full range (day terms sum; the dropped-item
    * contradiction holds for any prefix), so the verdicts are
    * engine-certifiable per (day, item).
    *
    * The exact certificate is candidate-bounded, never data-sized per
    * prefix: a guaranteed item (exact·m > 2N) had exact_day·m > N_day on
    * at least one prefix day (averaging), so it is TRACKED somewhere in
    * the prefix — exact counts are computed only for tracked-anywhere
    * items, then prefix-summed over the bounded (group, day) grid.
    * State: m counters per (group, day) forever; the timeline touches
    * summaries and the candidate grid only (m·days² per group).
    *
    * Input contract is [[spaceSavingRollupAudit]]'s: (g, day, i, o1, o2),
    * g/day non-null, no tabs. Output per guaranteed (g, day, item):
    * (group_key, day, item, exact_cnt, tracked, est_ge_exact,
    * lower_le_exact, err_within_cap).
    */
  def spaceSavingTimelineAudit(items: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val composite = items.select(
      concat(col("g").cast("string"), lit("\t"),
        col("day").cast("string")).as("g"),
      col("i"), col("o1"), col("o2"))
    val daily = spaceSavingSummary(composite, m).localCheckpoint()
    val split = daily.select(
      substring_index(col("g"), "\t", 1).as("g"),
      substring_index(col("g"), "\t", -1).as("day"),
      col("item"), col("est"), col("err"), col("n_events"))
    val dayMeta = split.groupBy(col("g"), col("day")).agg(
        min(col("est")).as("min_est"),
        count(lit(1)).as("n_counters"),
        max(col("n_events")).as("n_day"))
      .select(col("g"), col("day"),
        when(col("n_counters") === m, col("min_est")).otherwise(lit(0L))
          .as("floor_est"),
        col("n_day"))
      .localCheckpoint()
    val days = dayMeta.select(col("g"), col("day").as("asof")).distinct()
    // candidates per prefix: items tracked in ANY day <= asof
    val trackedDays = split.select(col("g"), col("day"), col("item"))
    val cand = trackedDays.join(days, Seq("g"))
      .where(col("day") <= col("asof"))
      .select(col("g"), col("asof"), col("item")).distinct()
    // the Agarwal merge per prefix: per (candidate, day <= asof) the
    // tracked est/err or the day's floor, summed
    val contrib = cand.join(dayMeta, "g")
      .where(col("day") <= col("asof"))
      .join(split.select(col("g"), col("day"), col("item"), col("est"),
        col("err")), Seq("g", "day", "item"), "left")
      .select(col("g"), col("asof"), col("item"),
        coalesce(col("est"), col("floor_est")).as("est_c"),
        coalesce(col("err"), col("floor_est")).as("err_c"))
    val merged = contrib.groupBy(col("g"), col("asof"), col("item"))
      .agg(sum(col("est_c")).as("est"), sum(col("err_c")).as("err"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g"), col("asof"))
          .orderBy(col("est").desc, col("item").asc)))
      .where(col("rk") <= m)
    val nPrefix = days.join(dayMeta, Seq("g"))
      .where(col("day") <= col("asof"))
      .groupBy(col("g"), col("asof")).agg(sum(col("n_day")).as("n_events"))
    // exact prefix counts, candidate-bounded
    val candItems = trackedDays.select(col("g"), col("item")).distinct()
    val exactDaily = items
      .select(col("g"), col("day").cast("string").as("day"),
        col("i").as("item"))
      .join(candItems, Seq("g", "item"))
      .groupBy(col("g"), col("item"), col("day"))
      .agg(count(lit(1)).as("c"))
    val exactPrefix = exactDaily.join(days, Seq("g"))
      .where(col("day") <= col("asof"))
      .groupBy(col("g"), col("asof"), col("item"))
      .agg(sum(col("c")).as("exact_cnt"))
    exactPrefix.join(nPrefix, Seq("g", "asof"))
      .where(col("exact_cnt") * m > col("n_events") * 2)
      .join(merged.select(col("g"), col("asof"), col("item"), col("est"),
        col("err")), Seq("g", "asof", "item"), "left")
      .select(col("g").as("group_key"), col("asof").as("day"), col("item"),
        col("exact_cnt"),
        col("est").isNotNull.as("tracked"),
        (col("est") >= col("exact_cnt")).as("est_ge_exact"),
        ((col("est") - col("err")) <= col("exact_cnt")).as("lower_le_exact"),
        (col("err") * m <= col("n_events")).as("err_within_cap"))
      .orderBy(col("group_key"), col("day"), col("item"))
  }
}
