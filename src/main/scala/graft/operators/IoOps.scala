package graft.operators

import org.apache.spark.sql.functions._
import PipeData._

/** Interchange-format round trips: the engine's answer to "can a user
  * land data in, and hand data off, in something other than parquet".
  * Each operator WRITES a real file-format dataset to a scratch dir and
  * READS IT BACK with an explicit schema before aggregating, so the
  * whole serializer/parser path is on the oracle-checked critical path
  * (the oracle computes the same aggregate from the original parquet —
  * any round-trip corruption hash-mismatches).
  *
  * Scale notes: both writes inherit the input partitioning (one file per
  * partition — the shard layout a 100 TB export actually wants); reads
  * carry explicit schemas (schema inference is a full extra pass at
  * scale and is never used here).
  */
object IoOps {

  /** Deterministic scratch dir per (format, source-dir CONTENT): keyed
    * by [[PipeData.contentTag]] (path + per-file size/mtime), not the
    * path alone, so a regenerated dataset at the same path always lands
    * in a fresh scratch dir (ADVICE r04). Every op here also rewrites
    * its scratch on each invocation, so this is belt-and-braces — but
    * the spec reads these dirs BETWEEN invocations, where the stale
    * window was real. */
  private[graft] def scratch(fmt: String, dir: String): String = {
    val tag = PipeData.contentTag(dir)
    val base = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    // Reap stale siblings (ADVICE r05): every dataset regeneration mints
    // a new tag, and without this the abandoned graft_io_<fmt>_<oldtag>
    // dirs accumulate unbounded disk across regenerations. Best-effort —
    // a concurrently-running sibling session would just rebuild.
    val prefix = s"graft_io_${fmt}_"
    val keep = prefix + tag
    // Age gate (ADVICE r06): only dirs untouched for an hour are
    // reaped, so a concurrent session pinned to an older dataset tag
    // is never deleted mid-read — its active dir has a fresh mtime.
    val cutoff = System.currentTimeMillis() - 3600_000L
    Option(base.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith(prefix) && f.getName != keep &&
          f.lastModified() < cutoff)
        org.apache.commons.io.FileUtils.deleteQuietly(f)
    }
    base.resolve(keep).toString
  }

  val all: List[Q] = List(

    // ---- CSV sink + source round trip ---------------------------------
    Q("p_io_csv",
      (s, dir) => {
        val out = scratch("csv", dir)
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("doc_id LONG, lang STRING, n_chars LONG")
          .csv(out)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      },
      Some("""SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY lang""".stripMargin)),

    // ---- JSON-lines sink + source round trip --------------------------
    // props is a JSON-valued STRING column: written as an escaped string
    // field and re-read as a string, then parsed with get_json_object —
    // the double-encoding survival test semi-structured pipelines hit.
    Q("p_io_jsonl",
      (s, dir) => {
        val out = scratch("jsonl", dir)
        events(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"), col("props"))
          .write.mode("overwrite").json(out)
        s.read.schema("event_id LONG, user_id LONG, value DOUBLE, props STRING")
          .json(out)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"),
            sum(expr("cast(get_json_object(props, '$.k') as bigint)")).as("sum_k"))
      },
      Some("""SELECT user_id, count(*) AS n,
             |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
             |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id""".stripMargin)),

    // ---- ORC sink + source round trip ---------------------------------
    // Spark's other first-class columnar format (predicate pushdown,
    // column pruning, and vectorized read all apply to ORC the same way
    // they do to parquet); the round trip pins the type mapping.
    Q("p_io_orc",
      (s, dir) => {
        val out = scratch("orc", dir)
        docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
          .write.mode("overwrite").orc(out)
        s.read.schema("doc_id LONG, source STRING, n_chars LONG").orc(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      },
      Some("""SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY source""".stripMargin)),

    // ---- corrupt-record tolerance: PERMISSIVE JSON landing ------------
    // Real landing zones contain malformed records; dropping the batch
    // is not an option at 100 TB. Every 7th purchase line is written
    // deterministically truncated; the PERMISSIVE read routes bad lines
    // into _corrupt_record (schema fields null) instead of failing the
    // scan, and the aggregate accounts for both populations — the
    // quarantine-and-continue pattern, with the router on the
    // oracle-checked path.
    Q("p_io_jsonl_corrupt",
      (s, dir) => {
        val out = scratch("jsonlbad", dir)
        events(s, dir).filter(col("event_type") === "purchase")
          .select(when(col("event_id") % 7 === 0,
              concat(lit("{\"event_id\":"), col("event_id"), lit(",TRUNC")))
            .otherwise(to_json(struct(col("event_id"), col("user_id"), col("value"))))
            .as("value"))
          .write.mode("overwrite").text(out)
        // quarantine test = schema field nullity, NOT the corrupt column:
        // a malformed line nulls every schema field (event_id is never
        // null in well-formed rows), and Spark disallows aggregates that
        // the optimizer prunes down to only the internal corrupt-record
        // column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — hit when count(*)
        // pruning drops the data columns)
        s.read
          .schema("event_id LONG, user_id LONG, value DOUBLE, _corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(out)
          .groupBy(col("event_id").isNull.as("quarantined"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
      },
      Some("""SELECT event_id % 7 = 0 AS quarantined, count(*) AS n,
             |  CAST(sum(CASE WHEN event_id % 7 <> 0
             |           THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT) AS cents
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY 1""".stripMargin)),

    // ---- small-file compaction --------------------------------------
    // The table-maintenance op every long-lived 100 TB dataset needs:
    // a landing zone hive-partitioned by day accumulates one+ tiny file
    // per partition (the classic small-file problem); compaction
    // rewrites it into 4 size-targeted shards. The aggregate reads FROM
    // THE COMPACTED COPY so any row lost/duplicated by the rewrite
    // hash-mismatches; the shard-count collapse is spec-pinned. Only
    // the purchase slice is staged (VERDICT r04 item 7: staging the
    // full (type × day) layout made this op 10% of the whole bench —
    // the compaction story is identical on one type's ~30 day
    // partitions at a fifth of the write volume).
    Q("p_io_compact",
      (s, dir) => {
        val frag = scratch("frag", dir)
        val comp = scratch("compact", dir)
        events(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            date_trunc("day", col("ts")).cast("date").as("day"))
          .write.mode("overwrite").partitionBy("day").parquet(frag)
        val back = s.read.parquet(frag)
          .select(col("event_id"), col("user_id"), col("day"))
        back.repartition(4).write.mode("overwrite").parquet(comp)
        s.read.parquet(comp)
          .groupBy(col("day").cast("timestamp").as("day"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""SELECT date_trunc('day', ts) AS day,
             |       count(*) AS n, count(DISTINCT user_id) AS n_users
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY 1""".stripMargin)),

    // ---- snapshot diff: what changed between two dataset versions -----
    // The dataset-ops audit every continuous-crawl pipeline runs before
    // promoting a new snapshot: keyed full-outer join of version A
    // against version B comparing a content hash — each key classifies
    // as added / removed / changed / same, and the counts are the
    // promotion gate (a 40%-removed snapshot is a crawler bug, not a
    // release). Version B is derived deterministically here (drop
    // doc_id ≡ 0 mod 97, rewrite text for ≡ 0 mod 89, append fresh ids
    // past the max), so both engines rebuild the identical pair. Scale
    // shape: ONE co-partitioned full-outer join on the key — against
    // bucketed snapshot stores (p_dedup_incremental's layout) it is
    // exchange-free on the stored side; the md5 comparison makes row
    // width irrelevant (hashes travel, text doesn't).
    Q("p_io_snapshot_diff",
      (s, dir) => {
        val a = docs(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
        val b = docs(s, dir)
          .filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 89 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("h"))
          .unionByName(
            docs(s, dir).agg(max(col("doc_id")).as("m"))
              .select(explode(sequence(col("m") + 1, col("m") + 25)).as("doc_id"),
                md5(concat(lit("new "), (col("m") + 1).cast("string"))).as("h")))
        a.withColumnRenamed("h", "ha").join(
            b.withColumnRenamed("h", "hb"), Seq("doc_id"), "full")
          .select(when(col("ha").isNull, "added")
            .when(col("hb").isNull, "removed")
            .when(col("ha") =!= col("hb"), "changed")
            .otherwise("same").as("status"))
          .groupBy("status").agg(count(lit(1)).as("n"))
      },
      Some("""WITH a AS (SELECT doc_id, md5(text) AS ha FROM documents),
             |mx AS (SELECT max(doc_id) AS m FROM documents),
             |b AS (SELECT doc_id,
             |        md5(CASE WHEN doc_id % 89 = 0 THEN text || ' v2'
             |                 ELSE text END) AS hb
             |      FROM documents WHERE doc_id % 97 <> 0
             |      UNION ALL
             |      SELECT m + i AS doc_id, md5('new ' || (m + 1)::VARCHAR) AS hb
             |      FROM mx, (SELECT unnest(generate_series(1, 25)) AS i)),
             |j AS (SELECT CASE WHEN ha IS NULL THEN 'added'
             |                  WHEN hb IS NULL THEN 'removed'
             |                  WHEN ha <> hb THEN 'changed'
             |                  ELSE 'same' END AS status
             |      FROM a FULL OUTER JOIN b USING (doc_id))
             |SELECT status, count(*) AS n FROM j GROUP BY status""".stripMargin)),

    // ---- schema evolution: mergeSchema over mixed generations ---------
    // The other table-maintenance reality of a long-lived dataset: the
    // schema GROWS. Generation 1 (clicks) is written with the v1 column
    // set, generation 2 (purchases) adds a `value` column; the read
    // merges footers across generations (mergeSchema — an extra
    // footer-only pass, no data rewrite) and the old generation surfaces
    // the new column as NULL. The aggregate pins both populations' row
    // counts, the null-backfill count, and the new column's sum — so a
    // wrong merge (dropped column, misaligned backfill) hash-mismatches.
    // At 100 TB this is the alternative to rewriting history on every
    // schema change; mergeSchema's footer pass is why you bound it to
    // the touched partitions in production.
    Q("p_io_schema_evo",
      (s, dir) => {
        val out = scratch("evo", dir)
        val ev = events(s, dir)
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"))
          .write.mode("overwrite").parquet(s"$out/gen=1")
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"))
          .write.mode("overwrite").parquet(s"$out/gen=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .groupBy(col("gen"))
          .agg(count(lit(1)).as("n"),
            count(col("value")).as("n_with_value"),
            sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
      },
      Some("""SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS gen,
             |       count(*) AS n,
             |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_with_value,
             |       CAST(sum(CASE WHEN event_type = 'purchase'
             |                THEN CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT) AS cents
             |FROM events WHERE event_type IN ('click', 'purchase')
             |GROUP BY 1""".stripMargin)),

    // ---- sort-clustered layout: zone-map pruning ----------------------
    // The other half of layout design besides partitioning: range-
    // repartition + sort within partitions on the filter column, so
    // every parquet row group carries tight ts min/max stats and a
    // time-range scan skips whole files/row groups via footer stats
    // (zone maps). The predicate must reach the scan as a PushedFilter
    // — PlanSpec pins that; the aggregate reads only the first day.
    Q("p_io_sorted",
      (s, dir) => {
        val out = scratch("sorted", dir)
        val ev = events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        ev.repartitionByRange(8, col("ts"))
          .sortWithinPartitions(col("ts"))
          .write.mode("overwrite").parquet(out)
        val lo = ev.agg(min(col("ts"))).collect()(0).getTimestamp(0)
        s.read.parquet(out)
          .filter(col("ts") < lit(lo) + expr("interval 24 hours"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      },
      Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
             |FROM events
             |WHERE ts < (SELECT min(ts) FROM events) + INTERVAL 24 HOUR
             |GROUP BY event_type""".stripMargin)),

    // ---- Z-order (Morton) clustered layout: 2-D data skipping ---------
    // One sort axis zone-map-prunes only itself (p_io_sorted); a query
    // filtering TWO independent dimensions needs the layout to bound
    // BOTH per file. Standard lakehouse Z-ordering (Delta OPTIMIZE
    // ZORDER BY / Iceberg's sort strategy): normalize each dimension to
    // an 8-bit rank against its global [min, max] (two scalar
    // aggregates — at 100 TB these come free from catalog/footer
    // stats), interleave the bits into a 16-bit Morton key (pure
    // codegen shifts/masks, zero UDFs), then range-partition + sort on
    // the key so every output file covers a bounded BOX in
    // (partkey, suppkey) space. The read-back is the oracle-checked
    // path: both box predicates push to the scan, and footer min/max
    // stats skip files whose box misses the query box — ZorderSpec
    // proves the per-file boxes and the skip; at 100 TB the same
    // mechanism is per-row-group skipping inside multi-GB files.
    Q("p_io_zorder",
      (s, dir) => {
        val out = scratch("zorder", dir)
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey").cast("bigint").as("l_partkey"),
            col("l_suppkey").cast("bigint").as("l_suppkey"),
            col("l_quantity").cast("bigint").as("qty"))
        val b = li.agg(min("l_partkey"), max("l_partkey"),
          min("l_suppkey"), max("l_suppkey")).collect()(0)
        val (p0, p1, s0, s1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
        def rank8(c: String, lo: Long, hi: Long) =
          expr(s"cast((($c - $lo) * 256) div (${hi - lo} + 1) as bigint)")
        val z = (0 until 8).map(i =>
            expr(s"shiftleft(shiftright(__dx, $i) & 1, ${2 * i}) | " +
              s"shiftleft(shiftright(__dy, $i) & 1, ${2 * i + 1})"))
          .reduce(_.bitwiseOR(_))
        li.withColumn("__dx", rank8("l_partkey", p0, p1))
          .withColumn("__dy", rank8("l_suppkey", s0, s1))
          .withColumn("__z", z)
          .repartitionByRange(8, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__dx", "__dy", "__z")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .filter(col("l_partkey").between(40, 90) && col("l_suppkey").between(2, 4))
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
      },
      Some("""SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem
             |WHERE l_partkey BETWEEN 40 AND 90 AND l_suppkey BETWEEN 2 AND 4
             |GROUP BY l_suppkey""".stripMargin)),

    // ---- hive-partitioned layout + partition-pruned read --------------
    // Writes events hive-partitioned by event type (`etype=<v>/` dirs —
    // the directory layout a 100 TB landing zone uses so downstream
    // readers touch only the partitions they ask for), then reads ONE
    // partition back. The filter must become a PartitionFilter — zero
    // data files of the other types are opened, which PlanSpec pins.
    Q("p_io_partitioned",
      (s, dir) => {
        val out = scratch("hivepart", dir)
        events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"),
            col("event_type").as("etype"))
          .write.mode("overwrite").partitionBy("etype").parquet(out)
        s.read.parquet(out)
          .filter(col("etype") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
      },
      Some("""SELECT user_id, count(*) AS n,
             |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
             |FROM events WHERE event_type = 'purchase'
             |GROUP BY user_id""".stripMargin)),

    // ---- ANALYZE-style table statistics: one pass, one row per column --
    // The lakehouse maintenance op behind every cost-based decision
    // (join reorder, broadcast thresholds, file skipping): per-column
    // non-null count, distinct count, min, max — computed in ONE scan
    // (all aggregates in a single agg node; count/min/max partially
    // aggregate map-side) and unpivoted with stack() to the catalog's
    // row-per-column shape. Every profiled value is normalized to
    // BIGINT first (quantities truncate exactly, prices quantize to
    // cents, timestamps to epoch millis) so min/max hash-compare across
    // engines with no float/format hazard. Exact NDV here because the
    // oracle must hash-match; at 100 TB the same shape swaps
    // count_distinct for approx_count_distinct (HLL, mergeable,
    // single-pass) since 4 exact distincts cost an expanded 4x shuffle —
    // that variant is p_io_stats_approx below, certificate-checked.
    Q("p_io_stats",
      (s, dir) => {
        val cols = Seq("c_orderkey", "c_quantity", "c_price_cents", "c_shipdate_ms")
        val t = s.read.parquet(s"$dir/lineitem.parquet").select(
          col("l_orderkey").as("c_orderkey"),
          col("l_quantity").cast("bigint").as("c_quantity"),
          expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("c_price_cents"),
          // NTZ parquet timestamp: cast through TIMESTAMP (session UTC,
          // so the wall-clock reading IS the instant) for unix_millis
          unix_millis(col("l_shipdate").cast("timestamp")).as("c_shipdate_ms"))
        val aggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"${c}_n"),
          count_distinct(col(c)).as(s"${c}_ndv"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max")))
        t.agg(aggs.head, aggs.tail: _*)
          .select(expr(s"stack(${cols.size}, " +
            cols.map(c => s"'$c', ${c}_n, ${c}_ndv, ${c}_min, ${c}_max").mkString(", ") +
            ") as (col_name, n_non_null, n_distinct, min_v, max_v)"))
      },
      Some("""WITH t AS (SELECT l_orderkey AS c_orderkey,
             |  CAST(l_quantity AS BIGINT) AS c_quantity,
             |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c_price_cents,
             |  epoch_ms(l_shipdate) AS c_shipdate_ms FROM lineitem)
             |SELECT 'c_orderkey' AS col_name, count(c_orderkey) AS n_non_null,
             |  count(DISTINCT c_orderkey) AS n_distinct,
             |  min(c_orderkey) AS min_v, max(c_orderkey) AS max_v FROM t
             |UNION ALL SELECT 'c_quantity', count(c_quantity),
             |  count(DISTINCT c_quantity), min(c_quantity), max(c_quantity) FROM t
             |UNION ALL SELECT 'c_price_cents', count(c_price_cents),
             |  count(DISTINCT c_price_cents), min(c_price_cents), max(c_price_cents) FROM t
             |UNION ALL SELECT 'c_shipdate_ms', count(c_shipdate_ms),
             |  count(DISTINCT c_shipdate_ms), min(c_shipdate_ms), max(c_shipdate_ms) FROM t""".stripMargin)),

    // ---- the 100 TB variant of p_io_stats: HLL NDV ---------------------
    // Same one-scan row-per-column shape, but n_distinct comes from
    // approx_count_distinct (HyperLogLog++, rsd 0.02): the 4 exact
    // distincts above each expand the shuffle 4x at scale, while the HLL
    // sketches partially aggregate map-side like count/min/max — the
    // whole profile stays ONE map-side-combined pass. Sketches aren't
    // bit-stable across engines, so the certificate pattern
    // (p_events_approx_users) applies: the output carries the EXACT NDV
    // (oracle-hashable) plus ndv_ok = |hll/exact - 1| <= 0.10 (5x the
    // configured rsd — ~never trips honestly, always trips on a broken
    // sketch); the oracle replays exact with literal true. The exact
    // count_distinct here exists only to judge the sketch; the
    // production profile drops it and keeps the HLL column.
    Q("p_io_stats_approx",
      (s, dir) => {
        val cols = Seq("c_orderkey", "c_quantity", "c_price_cents", "c_shipdate_ms")
        val t = s.read.parquet(s"$dir/lineitem.parquet").select(
          col("l_orderkey").as("c_orderkey"),
          col("l_quantity").cast("bigint").as("c_quantity"),
          expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("c_price_cents"),
          unix_millis(col("l_shipdate").cast("timestamp")).as("c_shipdate_ms"))
        // TWO single-pass aggregates, cross-joined (both are 1-row):
        // the production profile (count/min/max/HLL — all map-side-
        // combining, ONE scan, no Expand) and the exact-NDV certificate
        // basis. Mixing the four count_distincts INTO the HLL aggregate
        // would make Catalyst plan every aggregate over the 5× Expand
        // stream it needs for multi-column exact distincts — measured
        // 28× slower than the split (52 s vs 1.8 s at sf0.1). At 100 TB
        // only the first aggregate runs at all.
        val hllAggs = cols.flatMap(c => Seq(
          count(col(c)).as(s"${c}_n"),
          approx_count_distinct(col(c), 0.02).as(s"${c}_hll"),
          min(col(c)).as(s"${c}_min"),
          max(col(c)).as(s"${c}_max")))
        val exactAggs = cols.map(c => count_distinct(col(c)).as(s"${c}_ndv"))
        t.agg(hllAggs.head, hllAggs.tail: _*)
          .crossJoin(t.agg(exactAggs.head, exactAggs.tail: _*))
          .select(expr(s"stack(${cols.size}, " +
            cols.map(c => s"'$c', ${c}_n, ${c}_ndv, " +
              s"abs(cast(${c}_hll as double) / ${c}_ndv - 1.0) <= 0.10, " +
              s"${c}_min, ${c}_max").mkString(", ") +
            ") as (col_name, n_non_null, n_distinct, ndv_ok, min_v, max_v)"))
      },
      Some("""WITH t AS (SELECT l_orderkey AS c_orderkey,
             |  CAST(l_quantity AS BIGINT) AS c_quantity,
             |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c_price_cents,
             |  epoch_ms(l_shipdate) AS c_shipdate_ms FROM lineitem)
             |SELECT 'c_orderkey' AS col_name, count(c_orderkey) AS n_non_null,
             |  count(DISTINCT c_orderkey) AS n_distinct, true AS ndv_ok,
             |  min(c_orderkey) AS min_v, max(c_orderkey) AS max_v FROM t
             |UNION ALL SELECT 'c_quantity', count(c_quantity),
             |  count(DISTINCT c_quantity), true, min(c_quantity), max(c_quantity) FROM t
             |UNION ALL SELECT 'c_price_cents', count(c_price_cents),
             |  count(DISTINCT c_price_cents), true, min(c_price_cents), max(c_price_cents) FROM t
             |UNION ALL SELECT 'c_shipdate_ms', count(c_shipdate_ms),
             |  count(DISTINCT c_shipdate_ms), true, min(c_shipdate_ms), max(c_shipdate_ms) FROM t""".stripMargin)),
  )
}
