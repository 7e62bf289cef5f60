package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer trained on the corpus itself (Sennrich et
  * al. 2016): learn `numMerges` merge rules from the most frequent words,
  * then segment every document into subword units. This is the unit real
  * token budgets, packing, and mix plans are denominated in — the
  * frequency-rank mapping in TextAnalysis.tokenIds covers whole words
  * only.
  *
  * Spark-first shape:
  *   - TRAIN on the bounded word vocabulary: one distinct-word count agg
  *     (TakeOrdered top-V — per-partition partial top-k, no full sort),
  *     collected to the driver (bounded pull: V words x avg word length;
  *     at V=1000 that is a few KB — same documented-ceiling pattern as
  *     the IVF centroid and PQ codebook pulls). The merge loop itself is
  *     a driver-side fold over <=V weighted words — sub-millisecond next
  *     to one corpus scan, and NEVER touches the corpus.
  *   - APPLY as a chain of `replace` column expressions baked from the
  *     learned merge table (merge table broadcast as literals, the same
  *     pattern as Ivf.NearestCells) — whole-stage-codegen'd string ops,
  *     one corpus scan, no shuffle, no UDF.
  *
  * Portability: a word travels as a separator-delimited symbol string
  * with a DOUBLED "\u001f" at every symbol boundary, so one merge rule
  * application IS one plain left-to-right non-overlapping string replace
  * — identical semantics in java.lang.String.replace, Spark's `replace`,
  * and the oracle engine's `replace`. The doubling is what makes a single
  * replace CANONICAL left-to-right BPE (Sennrich et al.): the pattern
  * sep+a+sep+sep+b+sep consumes only the INNER half of each outer
  * boundary, so adjacent occurrences of the same pair (word "aaaa",
  * merge a+a) no longer fight over a shared separator — with single
  * separators the first match eats the boundary and "aaaa" mis-segments
  * to [aa,a,a] instead of the canonical [aa,aa]. (Repeating a single-sep
  * replace to fixpoint does NOT fix it either: "aaaaa" converges to
  * [aa,a,aa] where canonical is [aa,aa,a].) The doubled form is internal
  * only — encode collapses sep+sep back to sep after the last merge, so
  * counting, hashing, and every downstream consumer see the same
  * single-separator shape as before. Training tie-breaks (count desc,
  * pair string asc) compare ASCII+0x1f strings, where Java UTF-16 order
  * and bytewise UTF-8 order agree. The oracle replays TRAINING AND
  * APPLICATION exactly: oracleSql unrolls the K merge stages as
  * materialized CTEs (pair count -> argmax -> vocab rewrite), like the
  * IVF/PQ training unrollings.
  *
  * Scale: training cost is one (word, count) aggregate over the corpus —
  * the explode/groupBy pair Spark plans with map-side partials — plus a
  * driver loop on V rows; application is scan-speed. At 100 TB nothing
  * here shuffles the corpus.
  */
object Bpe {

  /** Symbol separator inside a word's working string: 0x1f (ASCII unit
    * separator) — never in the corpus (documents are printable ASCII; a
    * corpus that could contain it should normalize first, §2.24y).
    */
  val Sep = "\u001f"

  /** Sentinel merge for exhausted pair pools (tiny corpora can run out of
    * pairs before numMerges): 0x1e can never appear inside a symbol, so
    * replacing "\u001f\u001e\u001f" is a no-op on every word string. Both
    * engines pad with the same sentinel, keeping the K replace stages
    * structurally identical.
    */
  val NoMerge = "\u001e"

  /** The doubled boundary of the internal working representation. */
  private val Sep2 = Sep + Sep

  private def wordString(w: String): String =
    Sep2 + w.toCharArray.map(_.toString).mkString(Sep2) + Sep2

  /** One merge rule as (pattern, replacement) over the doubled-boundary
    * representation: pair key a+Sep+b becomes pattern Sep+a+Sep2+b+Sep
    * (the inner halves of both outer boundaries plus the full inner one)
    * and replacement Sep+ab+Sep — the surviving outer halves restore the
    * doubled form around the merged symbol.
    */
  private def mergeRule(pair: String): (String, String) =
    (Sep + pair.replace(Sep, Sep2) + Sep, Sep + pair.replace(Sep, "") + Sep)

  /** Train `numMerges` merges on the top `vocabSize` corpus words (count
    * desc, word asc — fully deterministic). Returns merge pair strings
    * "a\u001fb" in learned order, padded with [[NoMerge]] if the pair
    * pool empties.
    */
  def trainMerges(docs: DataFrame, vocabSize: Int, numMerges: Int): Seq[String] = {
    val vocab: Seq[(String, Long)] = docs
      .select(explode(filter(split(col("text"), " "), t => t =!= lit("")))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabSize)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    var words = vocab.map { case (w, c) => (wordString(w), c) }
    (0 until numMerges).map { _ =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        // doubled boundaries split to interleaved empties; keep the symbols
        val syms = w.split(Sep).filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val k = syms(i) + Sep + syms(i + 1)
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) NoMerge
      else {
        // argmax, ties to the smallest pair string — same total order as
        // the oracle's ORDER BY c DESC, pr ASC (ASCII: UTF-16 == bytewise)
        val best = counts.toSeq.minBy { case (p, c) => (-c, p) }._1
        val (pat, rep) = mergeRule(best)
        words = words.map { case (w, c) => (w.replace(pat, rep), c) }
        best
      }
    }
  }

  /** The trained merge chain applied to every whitespace token of `text`:
    * an array of separator-delimited merged-symbol strings, one per
    * non-empty token. Pure codegen'd string expressions.
    */
  def encode(text: Column, merges: Seq[String]): Column = {
    val toks = filter(split(text, " "), t => t =!= lit(""))
    transform(toks, t => {
      val w0 = concat(lit(Sep2), array_join(split(t, ""), Sep2), lit(Sep2))
      val merged = merges.foldLeft(w0) { (w, m) =>
        val (pat, rep) = mergeRule(m)
        replace(w, lit(pat), lit(rep))
      }
      // collapse the doubled boundaries back to the external single-sep
      // shape (every boundary is exactly Sep2, so one pass suffices)
      replace(merged, lit(Sep2), lit(Sep))
    })
  }

  /** BPE token count of one document: symbols per word = separators - 1,
    * summed over words. Long-typed, engine-exact.
    */
  def tokenCount(text: Column, merges: Seq[String]): Column =
    coalesce(
      aggregate(encode(text, merges), lit(0L), (acc, w) =>
        acc + (length(w) - length(replace(w, lit(Sep), lit(""))) - 1)
          .cast("long")),
      lit(0L))

  /** Per-document BPE accounting: whitespace token count, BPE token count,
    * and an md5 witness of the full segmentation (the exact symbol
    * sequence, not just its size — two different segmentations with equal
    * counts can't pass).
    */
  def tokenCounts(docs: DataFrame, merges: Seq[String]): DataFrame = {
    val ws = encode(col("text"), merges)
    docs
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        coalesce(
          aggregate(col("ws"), lit(0L), (acc, w) =>
            acc + (length(w) - length(replace(w, lit(Sep), lit(""))) - 1)
              .cast("long")),
          lit(0L)).as("n_bpe_tokens"),
        md5(array_join(col("ws"), " ")).as("bpe_hash"))
  }

  /** Per-source tokenizer-efficiency report: word / char / BPE-token
    * mass and the two ratios a tokenizer evaluation reads — fertility
    * (BPE tokens per word, bp) and compression (chars per BPE token,
    * 4-dp) — per corpus source. A multi-domain corpus tokenizes at very
    * different rates (code vs prose vs non-Latin scripts); this is the
    * table that decision reads. All sums are exact integers before the
    * one ratio division, so the report is partition-order exact; one
    * corpus scan, bounded |sources| output.
    */
  def tokenizerStats(docs: DataFrame, merges: Seq[String]): DataFrame =
    docs
      .select(col("source"), length(col("text")).cast("long").as("n_chars"),
        encode(col("text"), merges).as("ws"))
      .select(col("source"), col("n_chars"),
        size(col("ws")).cast("long").as("n_words"),
        coalesce(
          aggregate(col("ws"), lit(0L), (acc, w) =>
            acc + (length(w) - length(replace(w, lit(Sep), lit(""))) - 1)
              .cast("long")),
          lit(0L)).as("n_bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe_tokens"),
        floor(sum(col("n_bpe")) * 10000.0 / sum(col("n_words")) + 0.5)
          .cast("long").as("fertility_bp"),
        (floor(sum(col("n_chars")) * 10000.0 / sum(col("n_bpe")) + 0.5)
          / 10000.0).as("chars_per_bpe_r"))

  // --------------------------------------------------------------- oracle

  /** The K training stages unrolled as materialized CTEs plus the apply
    * chain — MATERIALIZED matters: w_i is referenced twice (by m_{i+1}
    * and w_{i+1}), so an inlining engine would otherwise expand the chain
    * 2^K times. Returns the CTE prefix ending after `mm` (the 1-row merge
    * table) and the per-token apply expression over a lambda var `t`.
    */
  private def oracleStages(vocabSize: Int, numMerges: Int): (String, String) = {
    val sep = "chr(31)"
    val sb = new StringBuilder
    sb.append(
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents),
         |vocab AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(toks) AS word FROM tok) GROUP BY word
         |  ORDER BY cnt DESC, word ASC LIMIT $vocabSize),
         |w0 AS MATERIALIZED (
         |  SELECT $sep || $sep ||
         |    array_to_string(string_split(word, ''), $sep || $sep) ||
         |    $sep || $sep AS w,
         |    cnt FROM vocab)""".stripMargin)
    (1 to numMerges).foreach { i =>
      sb.append(
        s""",
           |m$i AS MATERIALIZED (
           |  SELECT pr, SUM(cnt) AS c FROM (
           |    SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
           |      j -> syms[j] || $sep || syms[j + 1])) AS pr, cnt
           |    FROM (SELECT list_filter(string_split(w, $sep), x -> x <> '') AS syms,
           |            cnt FROM w${i - 1}))
           |  GROUP BY pr ORDER BY c DESC, pr ASC LIMIT 1),
           |w$i AS MATERIALIZED (
           |  SELECT replace(w,
           |    $sep || (SELECT coalesce(min(replace(pr, $sep, $sep || $sep)), chr(30)) FROM m$i) || $sep,
           |    $sep || (SELECT coalesce(min(replace(pr, $sep, '')), chr(30)) FROM m$i) || $sep)
           |    AS w, cnt
           |  FROM w${i - 1})""".stripMargin)
    }
    val mmCols = (1 to numMerges).map { i =>
      s"(SELECT coalesce(min(replace(pr, $sep, $sep || $sep)), chr(30)) FROM m$i) AS p$i, " +
        s"(SELECT coalesce(min(replace(pr, $sep, '')), chr(30)) FROM m$i) AS r$i"
    }.mkString(",\n  ")
    sb.append(s",\nmm AS MATERIALIZED (SELECT\n  $mmCols)")
    val chain = (1 to numMerges).foldLeft(
      s"$sep || $sep || array_to_string(string_split(t, ''), $sep || $sep) || $sep || $sep") { (e, i) =>
      s"replace($e, $sep || p$i || $sep, $sep || r$i || $sep)"
    }
    // collapse the doubled boundaries back to the external single-sep shape
    val applied = s"replace($chain, $sep || $sep, $sep)"
    (sb.toString, applied)
  }

  /** Full oracle for [[tokenCounts]]: per-doc (n_tokens, n_bpe_tokens,
    * bpe_hash) with training replayed in SQL.
    */
  def oracleSql(vocabSize: Int, numMerges: Int): String = {
    val (prefix, applied) = oracleStages(vocabSize, numMerges)
    s"""$prefix,
       |app AS (
       |  SELECT doc_id, list_transform(toks, t -> $applied) AS ws
       |  FROM tok CROSS JOIN mm)
       |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(list_sum(list_transform(ws, w ->
       |    len(w) - len(replace(w, chr(31), '')) - 1)), 0) AS BIGINT) AS n_bpe_tokens,
       |  md5(array_to_string(ws, ' ')) AS bpe_hash
       |FROM app""".stripMargin
  }

  /** Oracle for [[tokenizerStats]]: the same training unroll + apply
    * chain, per-doc word/BPE/char accounting (chars joined back from the
    * raw table), then the per-source exact-integer rollup with the two
    * ratio columns.
    */
  def tokenizerStatsOracleSql(vocabSize: Int, numMerges: Int): String = {
    val (prefix, applied) = oracleStages(vocabSize, numMerges)
    s"""$prefix,
       |app AS (
       |  SELECT doc_id, source, list_transform(toks, t -> $applied) AS ws
       |  FROM tok CROSS JOIN mm),
       |per AS (
       |  SELECT a.source,
       |    CAST(len(a.ws) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(a.ws, w ->
       |      len(w) - len(replace(w, chr(31), '')) - 1)), 0) AS BIGINT) AS n_bpe,
       |    CAST(length(d.text) AS BIGINT) AS n_chars
       |  FROM app a JOIN documents d USING (doc_id))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS n_words,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(floor(sum(n_bpe) * 10000.0 / sum(n_words) + 0.5) AS BIGINT)
       |    AS fertility_bp,
       |  floor(sum(n_chars) * 10000.0 / sum(n_bpe) + 0.5) / 10000.0
       |    AS chars_per_bpe_r
       |FROM per GROUP BY source""".stripMargin
  }

  /** Oracle for the corpus-prep pipeline with REAL BPE accounting: the
    * q_corpus_prep chain (quality gate -> language gate -> exact dedup ->
    * split) with its regex token-count proxy replaced by the trained
    * subword count — training CTEs prepended, apply-chain summed per doc.
    */
  def corpusPrepOracleSql(vocabSize: Int, numMerges: Int): String = {
    val (prefix, applied) = oracleStages(vocabSize, numMerges)
    s"""$prefix,
       |c0 AS (
       |  SELECT doc_id, lang, source, text, string_split(text, ' ') AS ctoks
       |  FROM documents),
       |q AS (
       |  SELECT *, CAST(len(ctoks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(ctoks, x -> x IN ('the','a','data','value'))) AS DOUBLE)
       |      / len(ctoks) AS stopword_ratio
       |  FROM c0 WHERE len(ctoks) >= 20),
       |l AS (
       |  SELECT *,
       |    CAST(len(list_filter(ctoks, x -> x IN ('the','a'))) AS BIGINT) AS score_en,
       |    CAST(len(list_filter(ctoks, x -> x IN ('table','row'))) AS BIGINT) AS score_fr,
       |    CAST(len(list_filter(ctoks, x -> x IN ('data','value'))) AS BIGINT) AS score_es,
       |    CAST(len(list_filter(ctoks, x -> x IN ('join','group'))) AS BIGINT) AS score_de,
       |    CAST(len(list_filter(ctoks, x -> x IN ('spark','stream'))) AS BIGINT) AS score_zh
       |  FROM q WHERE stopword_ratio < 0.3),
       |p AS (
       |  SELECT *, greatest(score_en, score_fr, score_es, score_de, score_zh) AS mx
       |  FROM l),
       |f AS (
       |  SELECT * FROM p
       |  WHERE (CASE WHEN score_en = mx THEN 'en' WHEN score_fr = mx THEN 'fr'
       |              WHEN score_es = mx THEN 'es' WHEN score_de = mx THEN 'de'
       |              WHEN score_zh = mx THEN 'zh' ELSE 'und' END) = lang),
       |d AS (
       |  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM f),
       |k AS (
       |  SELECT *,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, c) -> (acc * 257 + c) % 1000000007) % 100 AS bucket
       |  FROM d WHERE doc_id = keep_id)
       |SELECT doc_id, lang, source, n_tokens,
       |  CAST(coalesce(list_sum(list_transform(
       |    list_transform(list_filter(ctoks, x -> x <> ''), t -> $applied),
       |    w -> len(w) - len(replace(w, chr(31), '')) - 1)), 0) AS BIGINT)
       |    AS bpe_tokens,
       |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM k CROSS JOIN mm""".stripMargin
  }

  /** The base-257 salted rolling-hash fold as oracle SQL — the replay of
    * graftnative.RollingHash, shared by every oracle that re-derives a
    * salted-fold decision (budget keep, shard, order).
    */
  private def foldSql(salted: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split($salted, ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, c) -> (acc * 257 + c) % 1000000007)""".stripMargin

  /** The shared tokenize -> per-source budget gate CTE block (s, r, r2,
    * k): per-doc BPE counts, per-source totals + budget, keep-rate in
    * basis points, and the kept rows. ONE definition so q_bpe_budget and
    * q_bpe_shards can never desync on the gate formula; `k` carries every
    * column either consumer needs.
    */
  private def budgetCtes(applied: String, budgetCase: String): String =
    s"""s AS (
       |  SELECT doc_id, source,
       |    CAST(coalesce(list_sum(list_transform(
       |      list_transform(toks, t -> $applied),
       |      w -> len(w) - len(replace(w, chr(31), '')) - 1)), 0) AS BIGINT)
       |      AS n_tokens
       |  FROM tok CROSS JOIN mm),
       |r AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST($budgetCase AS BIGINT) AS budget
       |  FROM s GROUP BY source),
       |r2 AS (
       |  SELECT source, total_tokens, budget,
       |    CAST(floor(least(1.0, CAST(budget AS DOUBLE) / total_tokens) * 10000.0 + 0.5) AS BIGINT) AS keep_bp
       |  FROM r),
       |k AS (
       |  SELECT s.doc_id, s.source, s.n_tokens,
       |    r2.total_tokens, r2.budget, r2.keep_bp
       |  FROM s JOIN r2 USING (source)
       |  WHERE ${foldSql("'budget:' || CAST(s.doc_id AS VARCHAR)")} % 10000 < r2.keep_bp)""".stripMargin

  /** Oracle for the end-to-end tokenize -> budget -> shard chain
    * (q_bpe_shards): BPE training replayed, per-doc subword counts, the
    * token-budget keep gate, then the salted-fold shard/order assignment
    * and the per-shard manifest (doc count, BPE token mass, the
    * bin-count lower bound ceil(tokens / binTokens), and the md5
    * fingerprint of the in-shard doc order). The greedy packer itself is
    * per-partition stateful (not SQL-expressible); PackingSpec proves it
    * lands within the min_bins lower bound this manifest publishes.
    */
  def shardsOracleSql(vocabSize: Int, numMerges: Int, budgetCase: String,
      nShards: Int, binTokens: Long): String = {
    val (prefix, applied) = oracleStages(vocabSize, numMerges)
    s"""$prefix,
       |${budgetCtes(applied, budgetCase)},
       |h AS (
       |  SELECT doc_id, n_tokens,
       |    ${foldSql("'shard:' || CAST(doc_id AS VARCHAR)")} % $nShards AS shard,
       |    ${foldSql("'order:' || CAST(doc_id AS VARCHAR)")} AS ord
       |  FROM k)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS bpe_tokens,
       |  CAST(ceil(CAST(sum(n_tokens) AS DOUBLE) / $binTokens) AS BIGINT) AS min_bins,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY ord, doc_id)) AS order_fp
       |FROM h GROUP BY shard""".stripMargin
  }

  /** Oracle for the BPE-denominated token budget (mirrors the
    * q_token_budget oracle with n_tokens swapped for the BPE count).
    */
  def budgetOracleSql(vocabSize: Int, numMerges: Int,
      budgetCase: String): String = {
    val (prefix, applied) = oracleStages(vocabSize, numMerges)
    s"""$prefix,
       |${budgetCtes(applied, budgetCase)}
       |SELECT source, total_tokens, budget, keep_bp,
       |  count(*) AS n_kept, CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
       |FROM k GROUP BY source, total_tokens, budget, keep_bp""".stripMargin
  }
}
