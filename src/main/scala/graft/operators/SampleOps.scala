package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipeData._

/** Corpus-shaping operators: deterministic stratified sampling and
  * token-budget sequence packing — the two steps between "filtered
  * corpus" and "training shards" in an LLM data pipeline.
  *
  * Both are built to hold at 100 TB:
  *   - sampling is a pure scan-speed predicate on a content hash — no
  *     shuffle, no RNG state, reproducible row-for-row on any cluster
  *     layout (re-runs and backfills keep the exact same sample);
  *   - packing windows are PARTITIONED by language (each stratum is an
  *     independent shard stream) so the running sum never funnels the
  *     corpus through one task the way a global ORDER BY window would.
  */
object SampleOps {

  /** Per-language keep-rate numerators out of 16 (the first hex digit of
    * md5(doc_id) is uniform over 0..15): down-sample the over-represented
    * languages, keep half of English. */
  private val rates: Map[String, Int] =
    Map("en" -> 8, "es" -> 4, "de" -> 4, "fr" -> 2, "zh" -> 2)

  /** Tokens per packed training sequence (8k — a common context length). */
  private val chunkTokens = 8192L

  val all: List[Q] = List(

    // ---- deterministic stratified sampling -----------------------------
    // keep iff hexdigit1(md5(doc_id)) < rate(lang). Hash-based (not
    // rand()): the sample is a FUNCTION of the data, so it is identical
    // across engines, re-runs, partitionings, and cluster sizes — the
    // property that makes ablations and backfills reproducible.
    Q("p_sample_stratified",
      (s, dir) => {
        val digit = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1"
        val rateExpr = rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
          .mkString("CASE ", " ", " ELSE 0 END")
        docs(s, dir)
          .filter(expr(s"($digit) < ($rateExpr)"))
          .select(col("doc_id"), col("lang"))
      },
      Some(s"""SELECT doc_id, lang FROM documents
              |WHERE (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1)
              |  < (CASE ${rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")}
              |     ELSE 0 END)""".stripMargin)),

    // ---- token-budget packing: docs -> fixed-size training chunks ------
    // Per language (shard stream), docs in doc_id order are laid head to
    // tail; a doc's chunk is its START offset div the chunk budget —
    // the standard "concat then split at 8k" packing, computed as one
    // partitioned running-sum window (no per-chunk iteration, no global
    // single-partition window).
    Q("p_pack_chunks",
      (s, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        words(s, dir)
          .withColumn("n_tokens", size(col("ws")).cast("long"))
          .withColumn("cum", sum(col("n_tokens")).over(w))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr(s"(cum - n_tokens) div $chunkTokens").as("chunk_id"))
      },
      Some(s"""WITH dd AS (SELECT doc_id, lang,
              |    len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
              |c AS (SELECT doc_id, lang, n_tokens,
              |        sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              |                            ROWS UNBOUNDED PRECEDING) AS cum
              |      FROM dd)
              |SELECT doc_id, lang, n_tokens,
              |       CAST((cum - n_tokens) // $chunkTokens AS BIGINT) AS chunk_id
              |FROM c""".stripMargin)),

    // ---- no-split bin packing: whole docs -> budget-bounded bins -------
    // The SFT-style counterpart of p_pack_chunks: documents are NOT
    // split across sequences (instruction/chat samples must stay whole),
    // so packing is the classic greedy walk — docs in doc_id order, a
    // bin closes when the next doc would overflow the token budget; an
    // oversized doc gets a bin of its own. The walk is inherently
    // SEQUENTIAL within a shard (a running accumulator with reset has
    // no relational form — no window function expresses it), so it runs
    // as a sorted per-partition fold via mapPartitions, the documented
    // last-resort case. Scale shape: ONE shuffle (repartition by the
    // shard key) then scan-speed sequential packing inside each shard;
    // shards are independent, so at 100 TB the key generalizes to
    // (lang, doc_id div shardDocs) and parallelism tracks corpus size —
    // bin ids are then local to a shard, exactly how production packers
    // (T5/LLM sequence packing) shard the problem. Deterministic: the
    // walk order is (lang, doc_id), a pure function of the data.
    Q("p_pack_bins",
      (s, dir) => {
        import s.implicits._
        val budget = 256L
        words(s, dir)
          .select(col("lang"), col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
          .repartition(col("lang"))
          .sortWithinPartitions("lang", "doc_id")
          .as[(String, Long, Long)]
          .mapPartitions { it =>
            // per-partition greedy state; a hash partition may carry
            // several langs back to back — the sort groups them, and a
            // lang change resets the walk
            var lang: String = null
            var bin = 0L
            var fill = 0L
            it.map { case (l, id, n) =>
              if (l != lang) { lang = l; bin = 0L; fill = n }
              else if (fill + n <= budget) fill += n
              else { bin += 1; fill = n }
              (l, id, n, bin)
            }
          }
          .toDF("lang", "doc_id", "n_tokens", "bin_id")
      },
      Some("""WITH RECURSIVE dd AS (
              |  SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens,
              |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
              |  FROM documents),
              |rec AS (
              |  SELECT lang, rn, doc_id, n_tokens, 0::BIGINT AS bin_id,
              |         n_tokens AS fill
              |  FROM dd WHERE rn = 1
              |  UNION ALL
              |  SELECT d.lang, d.rn, d.doc_id, d.n_tokens,
              |         CASE WHEN r.fill + d.n_tokens <= 256 THEN r.bin_id
              |              ELSE r.bin_id + 1 END,
              |         CASE WHEN r.fill + d.n_tokens <= 256 THEN r.fill + d.n_tokens
              |              ELSE d.n_tokens END
              |  FROM rec r JOIN dd d ON d.lang = r.lang AND d.rn = r.rn + 1)
              |SELECT lang, doc_id, n_tokens, bin_id FROM rec""".stripMargin)),

    // ---- deterministic train/val/test split ----------------------------
    // Same hash-as-function-of-data discipline as the sampler: the split
    // is stable under re-runs, engine changes, and corpus growth (a doc's
    // assignment never changes when other docs are added — the property
    // that keeps eval sets uncontaminated across dataset versions).
    // 14/16 train, 1/16 val, 1/16 test on the SECOND md5 hex digit
    // (independent of the sampler's first-digit decision, so sampling and
    // splitting compose without correlation).
    Q("p_sample_split",
      (s, dir) => {
        val digit = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
        docs(s, dir)
          .withColumn("split", expr(
            s"CASE WHEN ($digit) < 14 THEN 'train' WHEN ($digit) < 15 THEN 'val' ELSE 'test' END"))
          .select(col("doc_id"), col("lang"), col("split"))
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) < 14
             |       THEN 'train'
             |       WHEN (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) < 15
             |       THEN 'val' ELSE 'test' END AS split
             |FROM documents""".stripMargin)),

    // ---- deterministic global shuffle → training-shard layout ----------
    // The last step before the dataloader: break curation order (source
    // files arrive grouped by domain/crawl — training wants documents
    // i.i.d.) with a SEEDED, data-derived permutation, then assign each
    // document a (shard, position). Order is the md5 hex string (hex
    // digit 5 picks the shard — independent of digits 1-4, which the
    // split/stratified/weighted samplers consume, so all four decisions
    // compose uncorrelated), position is the rank within the shard; both
    // are pure functions of the data, so a re-run, a backfill, or a
    // different cluster layout reproduces byte-identical shards — the
    // property "seeded shuffle via sort on rand()" does NOT have. One
    // exchange (the shard window); the production write is the same
    // frame through repartition(shard) + sortWithinPartitions(hk) with
    // n_shards sized to ~shard_size, and hash mass balances shards by
    // construction.
    Q("p_sample_shard",
      (s, dir) => {
        val w = Window.partitionBy(col("shard")).orderBy(col("hk"), col("doc_id"))
        docs(s, dir)
          .withColumn("hk", expr("md5(cast(doc_id as string))"))
          .withColumn("shard", expr(
            "cast((instr('0123456789abcdef', substring(hk, 5, 1)) - 1) % 8 as bigint)"))
          .withColumn("pos", row_number().over(w).cast("long"))
          .select(col("doc_id"), col("shard"), col("pos"))
      },
      Some("""SELECT doc_id,
             |  CAST((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 5, 1)) - 1) % 8 AS BIGINT) AS shard,
             |  CAST(ROW_NUMBER() OVER (
             |    PARTITION BY (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 5, 1)) - 1) % 8
             |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS BIGINT) AS pos
             |FROM documents""".stripMargin)),

    // ---- quality-weighted sampling (importance sampling) ---------------
    // Inclusion probability proportional to a per-doc quality weight —
    // here length capped at 4000 chars, the standard "keep more of the
    // long documents" corpus shaping. Same hash-as-function-of-data
    // discipline as the stratified sampler, on md5 hex digits 3-4
    // (independent of digits 1 and 2, so all three sampling decisions
    // compose without correlation): keep iff
    //   hash256 * 4000 < min(n_chars, 4000) * 256
    // — the float-free integer form of hash256/256 < w, so the decision
    // is exact on both engines with NO float thresholds to disagree on.
    // Scan-speed predicate, no shuffle, no RNG state.
    Q("p_sample_weighted",
      (s, dir) => {
        val h = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 3, 1)) * 16 + " +
          "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 4, 1)) - 17"
        docs(s, dir)
          .filter(expr(s"($h) * 4000 < least(n_chars, 4000) * 256"))
          .select(col("doc_id"), col("lang"), col("n_chars"))
      },
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE ((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 3, 1)) * 16
             |       + strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 4, 1)) - 17) * 4000)
             |      < (least(n_chars, 4000) * 256)""".stripMargin)),

    // ---- weighted reservoir: top-k per stratum without replacement ----
    // Efraimidis–Spirakis A-ES in its exponential-race form: each doc
    // draws a deterministic uniform u from md5 hex digits 5-8 (independent
    // of the other samplers' digits) and races with key −ln(u)/w, weight
    // w = capped length; the k smallest keys per language are the sample.
    // Unlike the Bernoulli samplers above, this yields an EXACTLY-k
    // without-replacement sample with inclusion probability ∝ w — the
    // "pick the best k docs per language, length-weighted" curation op.
    // Determinism: u is an exact power-of-two division, −ln(u)/w runs the
    // identical IEEE expression in both engines, and the key is quantized
    // to 1e-9 fixed point (int64, the p_text_logfreq discipline) before
    // ranking with a doc_id tie-break — orderings cannot diverge. Scale:
    // keys are a scan-speed projection; the per-stratum top-k is one
    // window over a lang-keyed shuffle (or per-partition heaps + a
    // k·|strata|-row merge when k is small — no global sort either way).
    Q("p_sample_reservoir",
      (s, dir) => {
        val h = (5 to 8).map(i =>
          s"(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), $i, 1)) - 1) " +
            s"* ${Seq(4096, 256, 16, 1)(i - 5)}").mkString(" + ")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("key"), col("doc_id"))
        docs(s, dir)
          // 0.5D/65536.0D/1000.0D: plain decimal literals would pull the
          // whole quotient into limited-scale DECIMAL arithmetic before
          // ln() and desync from the oracle's double math
          .withColumn("key", expr(
            s"cast(round(-ln((($h) + 0.5D) / 65536.0D) / (least(n_chars, 4000) / 1000.0D) * 1e9, 0) as bigint)"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("lang"), col("rnk"), col("doc_id"), col("n_chars"), col("key"))
      },
      Some("""WITH k AS (SELECT lang, doc_id, n_chars,
             |  CAST(round(-ln((((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 5, 1)) - 1) * 4096
             |        + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 6, 1)) - 1) * 256
             |        + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 7, 1)) - 1) * 16
             |        + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 8, 1)) - 1)) + 0.5)
             |      / 65536.0)
             |    / (least(n_chars, 4000) / 1000.0) * 1e9, 0) AS BIGINT) AS key
             |  FROM documents),
             |r AS (SELECT lang, doc_id, n_chars, key,
             |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rnk
             |      FROM k)
             |SELECT lang, rnk, doc_id, n_chars, key FROM r WHERE rnk <= 10""".stripMargin)),

    // ---- temperature-scaled multilingual mixing (mT5 α-sampling) ------
    // The standard multilingual corpus-balancing policy: sampling rates
    // ∝ n_lang^α (α = 0.7) instead of ∝ n_lang, boosting low-resource
    // languages without flattening the mix entirely (mT5 / XLM-R). Same
    // two-tiny-aggregates + broadcast-threshold shape as p_curate_mix —
    // per-language counts, one pow() per LANGUAGE (a handful of scalars,
    // not per-row transcendentals), rates floored to an integer
    // /256-threshold on md5 hex digits 9-10 (independent of the other
    // samplers' digits) so every keep decision is an exact integer
    // comparison. Corpus side: one broadcast join + scan-speed predicate,
    // no shuffle, no RNG state — reproducible on any layout.
    Q("p_sample_temperature",
      (s, dir) => {
        // z is a float sum over languages — quantize each pow term to
        // 1e-6 fixed point and sum as int64 (house rule: grouped float
        // sums must be order-free) so partitioning can't perturb thresh
        val langs = docs(s, dir).groupBy("lang").agg(count(lit(1)).as("n_l"))
        val tot = langs.agg(
          sum(expr("cast(round(pow(cast(n_l as double), 0.7D) * 1000000, 0) as bigint)")).as("zq"),
          sum(col("n_l")).as("n_total"))
        val rates = langs.crossJoin(broadcast(tot))
          .withColumn("thresh", expr(
            "cast(floor(least(1.0D, (pow(cast(n_l as double), 0.7D) / (zq / 1000000.0D))" +
              " * (cast(n_total as double) / 2.0D) / n_l) * 256) as int)"))
          .select(col("lang"), col("thresh"))
        val h9 = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 9, 1)) - 1"
        val h10 = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 10, 1)) - 1"
        docs(s, dir).join(broadcast(rates), Seq("lang"))
          .filter(expr(s"(($h9) * 16 + ($h10)) < thresh"))
          .select(col("doc_id"), col("lang"))
      },
      Some("""WITH langs AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
             |tot AS (SELECT CAST(sum(CAST(round(pow(n_l::DOUBLE, 0.7) * 1000000, 0) AS BIGINT))
             |                 AS BIGINT) AS zq,
             |               CAST(sum(n_l) AS BIGINT) AS n_total FROM langs),
             |rates AS (SELECT lang,
             |            CAST(floor(least(1.0,
             |              (pow(n_l::DOUBLE, 0.7) / (zq / 1000000.0)) * (n_total::DOUBLE / 2.0) / n_l)
             |              * 256) AS INT) AS thresh
             |          FROM langs, tot)
             |SELECT doc_id, lang FROM documents JOIN rates USING (lang)
             |WHERE ((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 9, 1)) - 1) * 16
             |     + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 10, 1)) - 1)) < thresh"""
        .stripMargin)),
  )
}
