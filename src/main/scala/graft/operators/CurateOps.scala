package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipeData._

/** Corpus-curation operators — the filter/clean steps of an LLM training
  * pipeline that sit between raw documents and sampling/packing:
  * benchmark decontamination, denylist redaction, repetition scoring,
  * and proportional source mixing.
  *
  * Scale shapes (the reason each is built the way it is):
  *   - decontamination is a broadcast semi-join: the benchmark n-gram set
  *     is tiny (a few eval suites) while the corpus is 100 TB, so the
  *     overlap test must reach every document WITHOUT shuffling the
  *     corpus-side shingle index;
  *   - redaction is a pure scan-speed projection (codegen'd array
  *     transform, no shuffle, no UDF);
  *   - repetition scoring shuffles once on (doc, bigram) with map-side
  *     combine, then a per-doc top-1 window — per-document state only,
  *     never cross-document;
  *   - mixture sampling computes per-source rates from two tiny
  *     aggregates and applies them as a broadcast join + deterministic
  *     hash predicate (same reproducibility story as
  *     [[SampleOps]] p_sample_stratified: the sample is a function of
  *     the data, not of RNG state or partition layout).
  */
object CurateOps {

  /** Terms redacted by p_curate_redact (stand-ins for PII patterns; the
    * mechanism — match term, substitute sentinel, count — is the real
    * pipeline shape, and stays inside whole-stage codegen). */
  private val denylist = Seq("customer", "value")

  val all: List[Q] = List(

    // ---- benchmark decontamination ------------------------------------
    // Docs sharing any word-3-gram with the held-out "benchmark" slice
    // (doc_id % 20 == 0 — a deterministic stand-in for an eval suite)
    // are flagged with their overlap counts; training keeps the
    // complement. The benchmark shingle set is broadcast — at 100 TB the
    // corpus side streams map-only through the semi-join.
    Q("p_curate_decontaminate",
      (s, dir) => {
        val sh = shingles(s, dir)
        val bench = sh.filter(col("doc_id") % 20 === 0)
          .select(col("shingle")).distinct()
        sh.filter(col("doc_id") % 20 =!= 0)
          .join(broadcast(bench), Seq("shingle"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      },
      Some("""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
             |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle FROM dd),
             |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
             |bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 20 = 0)
             |SELECT doc_id, count(*) AS n_hits
             |FROM dsh JOIN bench USING (shingle)
             |WHERE doc_id % 20 <> 0 GROUP BY doc_id""".stripMargin)),

    // ---- bloom-prefiltered decontamination ----------------------------
    // The 100 TB shape of the op above: build a Bloom filter over the
    // benchmark shingles ONCE (distributed treeAggregate; the filter —
    // not the shingles — ships to every task as a literal), drop
    // non-candidate corpus shingles AT THE SCAN with Spark's own
    // codegen'd BloomFilterMightContain predicate, and only then run the
    // exact semi-join on the survivors. False positives cost one join
    // probe each and are removed by the verify join, so the RESULT is
    // bit-identical to the exact op (same oracle); the corpus side still
    // never shuffles, but now it doesn't even HASH non-candidates into
    // the join — at a 1% FP rate the verify join sees ~|hits| rows
    // instead of |corpus|. This is InjectRuntimeFilter's plan shape,
    // made explicit and persistent (a saved filter decontaminates every
    // future crawl batch without touching the benchmark again).
    Q("p_curate_decontaminate_bloom",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val sh = shingles(s, dir)
        val bench = sh.filter(col("doc_id") % 20 === 0)
          .select(col("shingle")).distinct()
        val hashed = bench.select(xxhash64(col("shingle")).as("h"))
        // n ≥ 1 guards the degenerate empty benchmark; 1% FP keeps the
        // filter at ~1.2 bytes/key — 10^9 benchmark shingles ≈ 1.2 GB,
        // still a broadcastable literal
        val bf = hashed.stat.bloomFilter("h", math.max(hashed.count(), 1L), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        val candidates = sh.filter(col("doc_id") % 20 =!= 0)
          .filter(call_function("graft_might_contain",
            lit(bos.toByteArray), xxhash64(col("shingle"))))
        candidates.join(broadcast(bench), Seq("shingle"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      },
      Some("""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
             |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle FROM dd),
             |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
             |bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 20 = 0)
             |SELECT doc_id, count(*) AS n_hits
             |FROM dsh JOIN bench USING (shingle)
             |WHERE doc_id % 20 <> 0 GROUP BY doc_id""".stripMargin)),

    // ---- denylist redaction -------------------------------------------
    // Replace denylisted terms with a sentinel and report the redaction
    // count plus a digest of the scrubbed text (the digest puts the
    // entire rewritten string on the oracle-checked path). Word-array
    // transform instead of regexp_replace: bit-identical across engines
    // (no regex-dialect divergence) and equally codegen'd.
    Q("p_curate_redact",
      (s, dir) => {
        val inList = denylist.map(w => s"'$w'").mkString(", ")
        words(s, dir).select(col("doc_id"),
          expr(s"size(filter(ws, w -> w IN ($inList)))").as("n_redacted"),
          md5(expr(s"array_join(transform(ws, w -> CASE WHEN w IN ($inList)" +
            " THEN '<PII>' ELSE w END), ' ')")).as("scrub_md5"))
      },
      Some {
        val inList = denylist.map(w => s"'$w'").mkString(", ")
        s"""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
           |SELECT doc_id,
           |  len(list_filter(ws, w -> w IN ($inList))) AS n_redacted,
           |  md5(array_to_string(list_transform(ws, w -> CASE WHEN w IN ($inList)
           |      THEN '<PII>' ELSE w END), ' ')) AS scrub_md5
           |FROM dd""".stripMargin
      }),

    // ---- PII redaction (round 16, VERDICT r15 item 5) -----------------
    // Regex-based email/phone/id-number sentinel replacement — the
    // curation gap a training-data pipeline can't ship without. The
    // corpus text carries no PII, so each doc is AUGMENTED with
    // deterministic synthetic contact lines (email, +1-555 phone,
    // SSN-shaped id derived from doc_id — identical construction on
    // both engines), then scrubbed with three patterns in the pinned
    // Spark∩DuckDB regex dialect (the gql_regex subset: character
    // classes, bounded repeats, alternation — no lookaround, no \d
    // shorthand). Output: per-kind match counts (regexp_extract_all
    // size, NOT a count-distinct — duplicate PII must count twice) and
    // the md5 of the fully scrubbed text, putting every rewritten byte
    // on the oracle path. Codegen'd projections at scan speed, zero
    // shuffles; PipelineSpec pins that CLEAN text is a fixed point of
    // the scrub chain (no false rewrites).
    Q("p_curate_pii",
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val idRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
        val phoneRe = "\\+1-555-[0-9]{4}"
        // patterns ride as lit() columns (no SQL-literal backslash
        // unescaping to second-guess); counts via regexp_extract_all
        val pad4 = (c: org.apache.spark.sql.Column) => lpad(c.cast("string"), 4, "0")
        docs(s, dir)
          .withColumn("aug", concat(
            col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@ex-"), (col("doc_id") % 7).cast("string"), lit(".org call +1-555-"),
            pad4(col("doc_id") % 10000),
            lit(" ref 123-45-"), pad4(col("doc_id") % 10000)))
          .select(col("doc_id"),
            size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).cast("long").as("n_email"),
            size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0))).cast("long").as("n_phone"),
            size(regexp_extract_all(col("aug"), lit(idRe), lit(0))).cast("long").as("n_id"),
            md5(regexp_replace(regexp_replace(regexp_replace(col("aug"),
              emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), idRe, "<ID>")).as("scrub_md5"))
      },
      Some("""WITH aug AS (SELECT doc_id,
             |    text || ' contact user' || doc_id || '@ex-' || (doc_id % 7)
             |         || '.org call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |         || ' ref 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(a, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phone,
             |  CAST(len(regexp_extract_all(a, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_id,
             |  md5(regexp_replace(regexp_replace(regexp_replace(a,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
             |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<ID>', 'g')) AS scrub_md5
             |FROM aug""".stripMargin)),

    // ---- repetition scoring (Gopher-style top-bigram fraction) --------
    // Per doc: the most frequent word bigram and the fraction of all
    // bigram slots it occupies — the classic boilerplate/repetition
    // signal. Ties break to the lexicographically smallest bigram so the
    // winner is engine-independent.
    Q("p_curate_repetition",
      (s, dir) => {
        val bg = words(s, dir).filter(size(col("ws")) >= 2)
          .select(col("doc_id"), (size(col("ws")) - 1).as("n_bigrams"),
            explode(expr(
              "transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))"))
              .as("bg"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("n").desc, col("bg"))
        bg.groupBy("doc_id", "n_bigrams", "bg").agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") === 1)
          .select(col("doc_id"), col("bg").as("top_bigram"), col("n").as("top_n"),
            round(col("n").cast("double") / col("n_bigrams"), 6).as("top_frac"))
      },
      Some("""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |bg AS (SELECT doc_id, len(ws) - 1 AS n_bigrams,
             |         unnest(list_transform(range(1, len(ws)),
             |           i -> ws[i] || ' ' || ws[i+1])) AS bg
             |       FROM dd WHERE len(ws) >= 2),
             |counted AS (SELECT doc_id, n_bigrams, bg, count(*) AS n
             |            FROM bg GROUP BY 1, 2, 3),
             |ranked AS (SELECT doc_id, bg, n, n_bigrams,
             |             ROW_NUMBER() OVER (PARTITION BY doc_id
             |                                ORDER BY n DESC, bg) AS rnk
             |           FROM counted)
             |SELECT doc_id, bg AS top_bigram, n AS top_n,
             |       round(n::DOUBLE / n_bigrams, 6) AS top_frac
             |FROM ranked WHERE rnk = 1""".stripMargin)),

    // ---- the full curation pipeline, composed end-to-end --------------
    // What a corpus actually goes through before training, as ONE
    // oracle-checked dataflow: exact dedup (survivor = min doc_id per
    // content hash) → benchmark decontamination (zero 3-gram overlap,
    // broadcast semi-join) → quality gate (length + type-token ratio,
    // compared in exact integer cross-multiplication — no float
    // boundary) → deterministic per-language mixture sampling. Each
    // stage is the same shape as its standalone operator; the
    // composition itself is what a pipeline run executes, so it is
    // pinned as its own operator. Output: the kept training set.
    Q("p_curate_pipeline",
      (s, dir) => {
        val d = docs(s, dir)
        val surv = d.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        val sh = shingles(s, dir)
        val bench = sh.filter(col("doc_id") % 20 === 0)
          .select(col("shingle")).distinct()
        val contaminated = sh.filter(col("doc_id") % 20 =!= 0)
          .join(broadcast(bench), Seq("shingle"), "left_semi")
          .select(col("doc_id")).distinct()
        val rates = Map("en" -> 8, "es" -> 4, "de" -> 4, "fr" -> 2, "zh" -> 2)
        val rateExpr = rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
          .mkString("CASE ", " ", " ELSE 0 END")
        val digit = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1"
        d.join(surv, Seq("doc_id"), "left_semi")
          .filter(col("doc_id") % 20 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("n_words", size(col("ws")))
          .withColumn("n_uniq", size(array_distinct(col("ws"))))
          // ttr > 0.2  <=>  5 * n_uniq > n_words, in exact integers
          .filter(col("n_words") >= 5 && col("n_uniq") * 5 > col("n_words"))
          .filter(expr(s"($digit) < ($rateExpr)"))
          // final stage (round 16): PII scrub of the kept text — same
          // regex chain as p_curate_pii, riding the projection at scan
          // speed. The corpus text is clean, so the digest equals
          // md5(text) — which is exactly the no-false-rewrite property
          // on the oracle path (PipelineSpec pins it directly too).
          .select(col("doc_id"), col("lang"), col("source"),
            md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
              "\\+1-555-[0-9]{4}", "<PHONE>"),
              "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>")).as("pii_scrub_md5"))
      },
      Some("""WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents
             |              GROUP BY md5(text)),
             |dd AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
             |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle FROM dd),
             |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
             |bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 20 = 0),
             |contaminated AS (SELECT DISTINCT doc_id FROM dsh JOIN bench USING (shingle)
             |                 WHERE doc_id % 20 <> 0)
             |SELECT d.doc_id, d.lang, d.source,
             |  md5(regexp_replace(regexp_replace(regexp_replace(d.text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
             |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<ID>', 'g')) AS pii_scrub_md5
             |FROM documents d
             |JOIN surv USING (doc_id)
             |JOIN dd USING (doc_id)
             |WHERE d.doc_id % 20 <> 0
             |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
             |  AND len(ws) >= 5 AND 5 * len(list_distinct(ws)) > len(ws)
             |  AND (strpos('0123456789abcdef', substr(md5(d.doc_id::VARCHAR), 1, 1)) - 1)
             |      < (CASE WHEN lang = 'en' THEN 8 WHEN lang = 'es' THEN 4
             |              WHEN lang = 'de' THEN 4 WHEN lang = 'fr' THEN 2
             |              WHEN lang = 'zh' THEN 2 ELSE 0 END)""".stripMargin)),

    // ---- proportional source mixing -----------------------------------
    // Down-sample each source to a target mixture: source srcN gets
    // weight (N % 4) + 1, the target budget is half the corpus, and each
    // source's keep-rate is min(1, share × budget / count). Rates come
    // from two tiny aggregates (per-source counts + totals), broadcast
    // back, and applied with a deterministic 8-bit hash uniform — the
    // mixture is reproducible row-for-row on any cluster layout.
    // floor() (not round) on the threshold: no banker's-rounding
    // divergence at exact .5 boundaries.
    Q("p_curate_mix",
      (s, dir) => {
        val d = docs(s, dir)
        val srcs = d.groupBy("source").agg(count(lit(1)).as("n_src"))
          .withColumn("w", expr("(cast(substring(source, 4, 10) as int) % 4) + 1"))
        val tot = srcs.agg(sum("n_src").as("n_total"), sum("w").as("w_total"))
        val rates = srcs.crossJoin(broadcast(tot))
          .withColumn("rate", expr(
            "least(1.0, (cast(w as double) / w_total) * (cast(n_total as double) / 2) / n_src)"))
          .withColumn("thresh", expr("cast(floor(rate * 256) as int)"))
          .select(col("source"), col("thresh"))
        val h1 = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1"
        val h2 = "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
        d.join(broadcast(rates), Seq("source"))
          .filter(expr(s"(($h1) * 16 + ($h2)) < thresh"))
          .select(col("doc_id"), col("source"))
      },
      Some("""WITH srcs AS (SELECT source, count(*) AS n_src,
             |         (substr(source, 4)::INT % 4) + 1 AS w
             |       FROM documents GROUP BY source),
             |tot AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_total,
             |               CAST(sum(w) AS BIGINT) AS w_total FROM srcs),
             |rates AS (SELECT source,
             |            CAST(floor(least(1.0,
             |              (w::DOUBLE / w_total) * (n_total::DOUBLE / 2) / n_src) * 256) AS INT)
             |              AS thresh
             |          FROM srcs, tot)
             |SELECT doc_id, source FROM documents JOIN rates USING (source)
             |WHERE ((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
             |     + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1)) < thresh"""
        .stripMargin)),

    // ---- model-based quality gate (fixed-weight logistic classifier) --
    // The fastText/DCLM-style classifier gate as a pure scan-speed
    // projection: a logistic score over the same exact-ratio features
    // the heuristic ops compute (type-token ratio, length saturation,
    // stopword density, duplicated-bigram fraction), with FIXED weights
    // standing in for trained ones — the production shape (model weights
    // broadcast as literals into codegen; scoring never shuffles; the
    // gate is one filterable column). The linear term z is built from
    // exact integer ratios with the identical expression in both
    // engines; only the final sigmoid evaluates transcendentally and is
    // rounded to 6 dp for the cross-engine hash.
    Q("p_curate_quality_model",
      (s, dir) => words(s, dir)
        .withColumn("n_words", size(col("ws")))
        .withColumn("z", expr(
          """-1.0 + 2.0 * (cast(size(array_distinct(ws)) as double) / n_words)
            |     + 1.5 * least(1.0, cast(n_words as double) / 200)
            |     + 3.0 * (cast(size(filter(ws, w -> w = 'the' OR w = 'a')) as double) / n_words)
            |     - 2.0 * (case when n_words >= 2
            |        then cast(n_words - 1 - size(array_distinct(
            |               transform(sequence(0, n_words - 2), i -> concat(ws[i], ' ', ws[i+1]))))
            |             as double) / (n_words - 1)
            |        else 0.0 end)""".stripMargin))
        .select(col("doc_id"),
          round(expr("1.0 / (1.0 + exp(-z))"), 6).as("score"),
          (round(expr("1.0 / (1.0 + exp(-z))"), 6) >= 0.5).as("keep")),
      Some("""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS ws,
             |              len(string_split(text, ' ')) AS n_words FROM documents),
             |f AS (SELECT doc_id,
             |        -1.0 + 2.0 * (len(list_distinct(ws))::DOUBLE / n_words)
             |             + 1.5 * least(1.0, n_words::DOUBLE / 200)
             |             + 3.0 * (len(list_filter(ws, w -> w = 'the' OR w = 'a'))::DOUBLE / n_words)
             |             - 2.0 * (CASE WHEN n_words >= 2
             |                THEN (n_words - 1 - len(list_distinct(list_transform(
             |                       range(1, n_words), i -> ws[i] || ' ' || ws[i+1]))))::DOUBLE
             |                     / (n_words - 1)
             |                ELSE 0.0 END) AS z
             |      FROM dd)
             |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
             |       round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS keep
             |FROM f""".stripMargin)),

    // ---- DSIR-style importance gate (data selection) ------------------
    // Data Selection via Importance Resampling (Xie et al. 2023), the
    // unigram form, as a deterministic gate: target distribution = the
    // English sub-corpus, source = the whole corpus; each word gets an
    // add-1-smoothed log-probability ratio λ(w) = ln p_tgt(w) − ln
    // p_src(w), each document the λ-sum over its words (with
    // multiplicity), and the gate keeps documents whose importance
    // weight is positive — "more target-like than corpus-average". On
    // this corpus the gate keeps 56% of English vs ~30% of each other
    // language (the target boost the method exists for). Determinism:
    // λ is quantized to 1e-9 fixed point (the p_text_logfreq
    // discipline), so the per-doc int64 sums are order-free and the
    // >0 gate is exact cross-engine. Scale shape: two word-level
    // aggregates (map-side combined) build the λ table — vocab-sized,
    // BROADCAST back against the word stream — then one doc_id
    // aggregation; the corpus text is scanned once and never joins
    // anything bigger than the vocabulary. At 100 TB the target stats
    // come from the (small) curated target corpus and the source stats
    // from a sample — both still vocab-sized broadcasts.
    Q("p_curate_dsir",
      (s, dir) => {
        val w = words(s, dir)
          .select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
        val src = w.groupBy("w").agg(count(lit(1)).as("cs"))
        val tgt = w.filter(col("lang") === "en")
          .groupBy("w").agg(count(lit(1)).as("ct"))
        val tots = src.agg(sum("cs").as("ns"), count(lit(1)).as("v"))
        // coalesce mirrors the oracle's tt CTE: on a target-free corpus
        // sum(ct) is NULL, which would NULL every λ and drop ALL
        // documents instead of computing real weights (ADVICE r08)
        val ttot = tgt.agg(coalesce(sum("ct"), lit(0L)).as("nt"))
        val lam = src.join(tgt, Seq("w"), "left")
          .crossJoin(broadcast(tots)).crossJoin(broadcast(ttot))
          .select(col("w"), expr(
            """cast(round((ln((coalesce(ct, 0L) + 1) / cast(nt + v as double))
              |          - ln((cs + 1) / cast(ns + v as double))) * 1000000000, 0)
              |     as bigint)""".stripMargin).as("lam"))
        w.join(broadcast(lam), Seq("w"))
          .groupBy("doc_id", "lang")
          .agg(sum("lam").as("weight"))
          .filter(col("weight") > 0)
          .select(col("doc_id"), col("lang"), col("weight"))
      },
      Some("""WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |           FROM documents),
             |src AS (SELECT w, count(*) AS cs FROM w GROUP BY w),
             |tgt AS (SELECT w, count(*) AS ct FROM w WHERE lang = 'en' GROUP BY w),
             |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS ns,
             |               CAST(count(*) AS BIGINT) AS v FROM src),
             |tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt FROM tgt),
             |lam AS (SELECT src.w,
             |          CAST(round((ln((coalesce(ct, 0) + 1)::DOUBLE / (nt + v))
             |                    - ln((cs + 1)::DOUBLE / (ns + v))) * 1000000000, 0)
             |               AS BIGINT) AS lam
             |        FROM src LEFT JOIN tgt ON src.w = tgt.w, tot, tt),
             |d AS (SELECT doc_id, lang, CAST(sum(lam) AS BIGINT) AS weight
             |      FROM w JOIN lam ON w.w = lam.w GROUP BY doc_id, lang)
             |SELECT doc_id, lang, weight FROM d WHERE weight > 0""".stripMargin)),
  )
}
