package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits over tabular quasi-identifiers — the release gate a
  * training-data pipeline runs before publishing per-entity tables
  * (the reference's warehouse loads, rdb.py / transfer.py, expose
  * exactly such tables; this is the check that belongs in front of
  * them).
  */
object Privacy {

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007): per quasi-identifier combination (equivalence class),
    * the class size — k-anonymity demands every class have at least k
    * members, or its rows are re-identifiable by joining the quasi
    * columns against an external dataset — and the number of DISTINCT
    * sensitive values in the class — l-diversity demands at least l, or
    * a k-anonymous class still leaks the sensitive attribute (everyone
    * in it shares one value). One row per equivalence class, bounded by
    * the quasi-identifier domain, never the table; `releasable` is the
    * conjunction a release gate reads, the per-class counts are what
    * generalization / suppression planning reads.
    *
    * Scale shape: ONE aggregate keyed on the quasi columns; the
    * distinct-sensitive count rides the same shuffle (Spark plans the
    * standard two-phase expand — partial aggregation on (quasi, sens)
    * first, so the exchange carries at most one row per class-value
    * pair, not the table).
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1)
    val g = quasiCols.map(col)
    df.select(g :+ sensitive.as("sens"): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("sens")).as("l_distinct"))
      .select(g ++ Seq(
        col("class_size"),
        (col("class_size") >= k).as("meets_k"),
        col("l_distinct"),
        (col("l_distinct") >= l).as("meets_l"),
        (col("class_size") >= k && col("l_distinct") >= l)
          .as("releasable")): _*)
      .orderBy(g: _*)
  }

  /** t-closeness audit — the third member of the canonical privacy
    * triple ([[kAnonymityAudit]] checks class SIZE (k) and sensitive
    * VARIETY (l); this checks sensitive DISTRIBUTION: a class can be
    * large and diverse yet still leak — 95% one disease in a class vs
    * 5% globally is an inference attack l-diversity cannot see): per
    * quasi class, the total-variation distance between the class's
    * sensitive-value distribution and the GLOBAL distribution,
    *
    *   TV = ½ Σ_v |p_class(v) − p_global(v)|
    *
    * kept EXACT over the common denominator N_c·N: with integer counts
    * n_cv (class-value), n_v (global value), N_c, N,
    *
    *   2·N_c·N·TV = Σ_present |n_cv·N − n_v·N_c| + (N − Σ_present n_v)·N_c
    *
    * (the second term is every ABSENT value's p_global mass via the
    * complement identity Σ_{v∉C} p_g(v) = 1 − Σ_{v∈C} p_g(v) — the
    * sum is pure integers, hence order-independent; ONE double
    * division + round-half-up micro quantization at the very end).
    * Verdict: tv_micro ≤ tMicro.
    *
    * Scale shape: everything derives from one map-side-combined
    * (class, value) count frame; the global distribution is a
    * |values|-bounded broadcast, and the absent-value identity keeps
    * the frame from densifying to classes × values.
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, tMicro: Long): DataFrame = {
    require(quasiCols.nonEmpty && tMicro >= 0L)
    val g = quasiCols.map(col)
    val cells = df.select(g :+ sensitive.as("sens"): _*)
      .where(col("sens").isNotNull)
      .groupBy(g :+ col("sens"): _*)
      .agg(count(lit(1)).as("n_cv"))
      .localCheckpoint() // (class, value) counts, two consumers
    val global = cells.groupBy(col("sens")).agg(sum(col("n_cv")).as("n_v"))
    val total = broadcast(global.agg(sum(col("n_v")).as("n")))
    val classes = cells.groupBy(g: _*)
      .agg(sum(col("n_cv")).as("n_c"),
        count(lit(1)).as("n_values_present"))
    cells.join(broadcast(global), "sens")
      .join(classes.select(g :+ col("n_c"): _*), quasiCols)
      .crossJoin(total)
      .groupBy(g: _*)
      .agg(sum(abs(col("n_cv") * col("n") - col("n_v") * col("n_c")))
          .as("present_num"),
        sum(col("n_v")).as("present_nv"))
      .join(classes, quasiCols)
      .crossJoin(total)
      .select(g ++ Seq(
        col("n_c").as("class_size"),
        col("n_values_present"),
        expr("""CAST(floor(CAST(present_num
          |  + (n - present_nv) * n_c AS DOUBLE)
          |  / (2.0 * CAST(n_c AS DOUBLE) * CAST(n AS DOUBLE))
          |  * 1000000.0 + 0.5) AS BIGINT)""".stripMargin).as("tv_micro")): _*)
      .withColumn("meets_t", col("tv_micro") <= tMicro)
      .orderBy(g: _*)
  }

  /** Generalization-lattice sweep — the planning companion of
    * [[kAnonymityAudit]]: when the full quasi set fails k-anonymity, the
    * fix is to GENERALIZE (publish fewer / coarser quasi columns), and
    * the planner needs every lattice level's risk profile to pick the
    * minimal generalization that releases. One `cube` pass scores all
    * 2^|quasi| subset levels at once: per level, the class count, the
    * smallest class, how many classes violate k, and how many ROWS sit
    * in violating classes (the re-identifiable population — the number a
    * privacy review actually reads). `meets_k` marks releasable levels;
    * the first row in (n_generalized, retained) order with meets_k is
    * the minimal-loss release.
    *
    * Scale shape: cube expands each row 2^|quasi| ways (4 for the
    * registered pair — bounded, declared), partial-aggregates before the
    * exchange, and the level rollup is over class rows only. Quasi
    * columns must be non-null (real NULLs would collide with cube's
    * grouping nulls; `grouping()` flags keep the LEVELS apart but a
    * null-keyed class inside a level would merge — gate upstream).
    */
  def generalizationLattice(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    val g = quasiCols.map(col)
    // grouping() is only legal inside the cube's own agg clause
    val classes = df.cube(g: _*)
      .agg(count(lit(1)).as("class_size"),
        quasiCols.map(c => grouping(col(c)).cast("int").as(s"g_$c")): _*)
      .select(Seq(col("class_size")) ++
        quasiCols.map(c => col(s"g_$c")): _*)
    val retained = concat_ws("+",
      quasiCols.map(c => when(col(s"g_$c") === 0, lit(c))): _*)
    classes
      .groupBy(quasiCols.map(c => col(s"g_$c")): _*)
      .agg(count(lit(1)).as("n_classes"),
        min(col("class_size")).as("min_class_size"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("violating_classes"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_at_risk"))
      .select(
        when(retained === "", "(none)").otherwise(retained).as("retained"),
        quasiCols.map(c => col(s"g_$c")).reduce(_ + _).cast("long")
          .as("n_generalized"),
        col("n_classes"), col("min_class_size"), col("violating_classes"),
        col("rows_at_risk"), (col("violating_classes") === 0).as("meets_k"))
      .orderBy(col("n_generalized"), col("retained"))
  }

  /** Cumulative thresholds of the TWO-SIDED GEOMETRIC mechanism at
    * ε = 1/2 on the 52-bit md5 uniform (Ghosh–Roughgarden–Sundararajan
    * 2009 — the discrete Laplace, the universally utility-optimal
    * mechanism for counting queries): noise = the first k with
    * h < T(k), else +15. Support is clamped to ±15 with the tail mass
    * (~2·10⁻⁴ per side) folded into the extremes — a documented,
    * bounded truncation. FIXED integer literals (the poisson1Cuts
    * discipline — never recomputed from doubles at runtime), shared
    * verbatim with the SQL oracle, so the draw replays bit-for-bit on
    * any engine; theoretical per-value probabilities derive from these
    * SAME cuts by integer subtraction, so calibration can never use a
    * different distribution than the draw. */
  private[graft] val geomHalfCuts: Seq[(Int, Long)] = Seq(
    -15 -> 1550465624943L, -14 -> 2556285655334L, -13 -> 4214602533934L,
    -12 -> 6948704845244L, -11 -> 11456477482171L, -10 -> 18888538112152L,
    -9 -> 31141934557936L, -8 -> 51344369916420L, -7 -> 84652554811898L,
    -6 -> 139568467737484L, -5 -> 230109501477814L, -4 -> 379386429676675L,
    -3 -> 625502476422912L, -2 -> 1031279237754061L, -1 -> 1700292015316535L,
    0 -> 2803307612053960L, 1 -> 3472320389616434L, 2 -> 3878097150947583L,
    3 -> 4124213197693820L, 4 -> 4273490125892681L, 5 -> 4364031159633012L,
    6 -> 4418947072558598L, 7 -> 4452255257454076L, 8 -> 4472457692812560L,
    9 -> 4484711089258344L, 10 -> 4492143149888325L,
    11 -> 4496650922525252L, 12 -> 4499385024836562L,
    13 -> 4501043341715162L, 14 -> 4502049161745552L)

  /** The geometric noise draw off a 52-bit uniform column. */
  private def geomNoise(h: Column): Column =
    geomHalfCuts.tail
      .foldLeft(when(h < geomHalfCuts.head._2, geomHalfCuts.head._1.toLong)) {
        case (e, (k, t)) => e.when(h < t, k.toLong)
      }.otherwise(15L)

  /** The 52-bit md5 uniform of a salted key — the engine-portable
    * deterministic randomness every sampling operator here uses. */
  private def md5bits52(salted: Column): Column =
    conv(substring(md5(salted), 1, 13), 16, 10).cast("long")

  /** ε-differentially-private COUNT release (ε = 1/2): per group, the
    * entity count plus two-sided geometric noise — the release gate a
    * per-entity warehouse runs when even k-anonymous class sizes are
    * too sensitive to publish exactly (the DP complement of
    * [[kAnonymityAudit]]: that gate suppresses, this one perturbs and
    * releases everything). Each entity must contribute to EXACTLY ONE
    * group (sensitivity 1 — the caller's contract; groupBy over a
    * per-entity table satisfies it by construction).
    *
    * Determinism: the noise seed is the salted md5 of the group key
    * ("dp:" + '|'-joined group values), so the release is a pure
    * function of the data — replayable on any engine, idempotent
    * across re-runs (publishing twice cannot leak a second independent
    * draw, the classic DP-deployment footgun). A production deployment
    * that wants fresh randomness per release swaps the salt for a
    * release id; the mechanism and thresholds are unchanged.
    *
    * Scale shape: ONE map-side-combinable aggregate keyed on the group
    * columns; the noise is a scan-stage projection over the bounded
    * aggregate — output is |group domain| rows, never the table. */
  def dpCountRelease(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty)
    val g = groupCols.map(col)
    // canonical seed key: per-column NULL sentinel (chr(1)||'NULL', the
    // canonRowHash discipline) BEFORE the '|' join — a NULL group value
    // must seed the same draw on both engines, not null-propagate the
    // oracle's concatenation into the CASE's ELSE arm. Same caveat as
    // every digest: group values containing '|' can collide seeds
    // (correlated noise, never a wrong count).
    val key = concat(lit("dp:"), concat_ws("|",
      g.map(c => coalesce(c.cast("string"), lit("\u0001NULL"))): _*))
    df.groupBy(g: _*).agg(count(lit(1)).as("n"))
      .select(g ++ Seq(
        (col("n") + geomNoise(md5bits52(key))).as("noisy_n")): _*)
      .orderBy(g: _*)
  }

  /** ε-DP SUM + COUNT release (with the derived mean) — the
    * coarse-grained geometric mechanism, completing the DP family
    * (count → sum → mean) with ZERO new threshold tables: per-entity
    * contributions are clamped to [0, `clampCents`] (so adding or
    * removing one entity moves the group sum by at most the clamp —
    * the standard bounded-contribution contract), and the sum is
    * released at GRANULARITY clampCents:
    *
    *   noisy_sum = clampCents · (sum DIV clampCents + Z_s)
    *
    * where floor(sum/Δ) has sensitivity EXACTLY 1 under a ±Δ sum
    * change (floor((s+Δ)/Δ) = floor(s/Δ)+1), so the SAME ε=1/2
    * [[geomHalfCuts]] apply unchanged — granularity traded for budget,
    * the standard deployment trick when a per-Δ threshold table would
    * need hundreds of inline literals. The count rides a SECOND
    * INDEPENDENT draw (the "dpc:" salt vs the sum's "dps:"), so the
    * released (sum, count) pair costs ε = 1 by sequential composition,
    * and `dp_mean` = noisy_sum DIV noisy_n is free post-processing
    * (NULL when the noisy count is non-positive — surfacing the
    * too-small-to-release group beats fabricating a mean). Exact n and
    * s are aggregated but NEVER emitted — the release publishes only
    * the perturbed columns.
    *
    * NULL contributions count as 0 (explicit coalesce BEFORE the clamp:
    * both engines' greatest/least SKIP nulls rather than propagate
    * them, so an uncoalesced NULL would silently clamp to the bound).
    * Negative releases are legal outputs of the mechanism (noise can
    * push below zero) and divide identically on both engines
    * (truncating DIV, verified). Determinism/idempotence contract as
    * [[dpCountRelease]].
    *
    * Scale shape: ONE map-side-combinable aggregate; both draws and
    * the mean are projections over the bounded output. */
  def dpSumRelease(df: DataFrame, groupCols: Seq[String],
      valueCents: Column, clampCents: Long): DataFrame = {
    require(groupCols.nonEmpty && clampCents >= 1,
      s"need group columns and clampCents >= 1, got $clampCents")
    val g = groupCols.map(col)
    val keyBody = concat_ws("|",
      g.map(c => coalesce(c.cast("string"), lit("\u0001NULL"))): _*)
    val clamped = least(
      greatest(coalesce(valueCents.cast("long"), lit(0L)), lit(0L)),
      lit(clampCents))
    df.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(clamped).as("s"))
      .select(g ++ Seq(
        ((expr(s"s DIV ${clampCents}L") +
          geomNoise(md5bits52(concat(lit("dps:"), keyBody))))
          * clampCents).as("noisy_sum"),
        (col("n") + geomNoise(md5bits52(concat(lit("dpc:"), keyBody))))
          .as("noisy_n")): _*)
      .withColumn("dp_mean",
        when(col("noisy_n") > 0, expr("noisy_sum DIV noisy_n")))
      .orderBy(g: _*)
  }

  /** Stability-thresholded ε-DP release over an UNBOUNDED item domain
    * (the Korolova et al. 2009 / stability-histogram mechanism, the
    * standard way to publish a vocabulary or phrase list from private
    * corpora): per item the distinct-document frequency plus geometric
    * noise, and ONLY items whose noisy count clears `tau` are released
    * — an item a single document contributes can surface only when its
    * noise exceeds τ−1 (probability ≈ the clamped geometric tail, the
    * mechanism's δ), so the release cannot enumerate rare private
    * strings. Items are the document's unigrams and word trigrams
    * (distinct per document — sensitivity 1 per item; production
    * additionally CLAMPS distinct items per document to bound the
    * cross-item composition, documented here, trivially added as a
    * per-doc top-k gate).
    *
    * Determinism: the same item-keyed seed discipline as
    * [[dpCountRelease]] — idempotent re-releases, bit-replayable.
    * Scale shape: distinct (doc, item) projection at the scan, one
    * map-side-combinable aggregate keyed on the item, noise +
    * threshold as a projection over the aggregate; output bounded by
    * the released vocabulary. */
  def dpStabilityRelease(docs: DataFrame, idCol: String, textCol: String,
      tau: Long): DataFrame = {
    require(tau >= 1)
    val toks = split(col(textCol), " ")
    val base = docs.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc"), toks.as("toks"))
    val unigrams = base.select(col("doc"), explode(col("toks")).as("item"))
    // sequence() flips to a DESCENDING range on a negative stop — guard
    // the short-doc case to an explicit empty array instead
    val trigrams = base.select(col("doc"), explode(expr(
      """CASE WHEN size(toks) >= 3 THEN
        |  transform(sequence(0, size(toks) - 3),
        |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
        |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .as("item"))
    unigrams.unionByName(trigrams)
      .select(col("doc"), col("item")).distinct()
      .groupBy(col("item")).agg(count(lit(1)).as("df"))
      .select(col("item"),
        (col("df") + geomNoise(md5bits52(concat(lit("dp:"), col("item")))))
          .as("noisy_df"))
      .where(col("noisy_df") >= tau)
      .orderBy(col("item"))
  }

  /** Calibration of the geometric mechanism (the audit-family contract:
    * every randomized estimator ships a measured-vs-theory row): one
    * noise draw per distinct key, histogrammed by value, with the
    * THEORETICAL share in basis points derived from the SAME inlined
    * cuts by integer subtraction (share_k = (T(k) − T(k−1)) · 10⁴ DIV
    * 2⁵²) and the empirical share alongside — so a mis-transcribed
    * threshold or a biased hash shows up as a histogram deviation, on
    * either engine identically. Output ≤ 31 bounded rows. */
  def dpNoiseCalibration(df: DataFrame, keyCol: String): DataFrame = {
    val two52 = 1L << 52
    val theory: Seq[(Int, Long)] = {
      val cuts = geomHalfCuts :+ (15 -> two52)
      val lows = 0L +: geomHalfCuts.map(_._2)
      cuts.zip(lows).map { case ((k, t), lo) =>
        // BigInt: (t − lo)·10⁴ overflows Long near the distribution mode
        k -> ((BigInt(t) - BigInt(lo)) * 10000 / BigInt(two52)).toLong
      }
    }
    val theoryExpr = theory.tail
      .foldLeft(when(col("noise") === theory.head._1, theory.head._2)) {
        case (e, (k, bp)) => e.when(col("noise") === k, bp)
      }.otherwise(lit(null).cast("long"))
    // the drawn frame feeds two consumers (total + histogram): one scan.
    // NULL keys are excluded (a NULL cannot seed a draw; both engines
    // would otherwise null-propagate into the clamp arm)
    val drawn = df.where(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("k")).distinct()
      .select(geomNoise(md5bits52(concat(lit("dp:"), col("k"))))
        .as("noise"))
      .localCheckpoint()
    val total = drawn.count()
    drawn.groupBy(col("noise"))
      .agg(count(lit(1)).as("n_draws"))
      .select(col("noise"), col("n_draws"),
        expr(s"n_draws * 10000 DIV ${total}L").as("emp_bp"),
        theoryExpr.as("theory_bp"))
      .orderBy(col("noise"))
  }
}
