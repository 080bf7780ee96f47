package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics surface over the driver's parquet tables.
  *
  * The reference implements no aggregation/ordering/set operators at all
  * (SURVEY.md §2.7) — on Spark they arrive with the DataFrame API. This
  * inventory makes each one a first-class, oracle-verified operator of the
  * engine, written the way the 100 TB plan wants it: group-bys with
  * map-side partial aggregation, dimension joins broadcast, window
  * functions with deterministic tie-breaks, top-k as TakeOrderedAndProject.
  *
  * Float discipline: every aggregate over a double column goes through
  * DECIMAL(18,2) (the data is 2-decimal money), so sums are exact and
  * engine-independent; the FINAL output casts to DOUBLE so both engines'
  * results render through the identical float64 path (a pinned-scale
  * DECIMAL output hash-mismatches on trailing-zero cents because pandas
  * renders Decimal('x.00') and float64 x.0 differently).
  */
object RelOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val dec2 = "decimal(18,2)"

  val all: List[Q] = List(

    // --- aggregation: TPC-H Q1 shape (map-side combine, 2-col group) ----
    Q("q_agg_pricing",
      (s, dir) => {
        val price = col("l_extendedprice").cast(dec2)
        val disc  = col("l_discount").cast(dec2)
        val tax   = col("l_tax").cast(dec2)
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(dec2)).cast("double").as("sum_qty"),
            sum(price).cast("double").as("sum_base_price"),
            sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
            sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // --- star join: facts vs broadcast dims, agg after join -------------
    Q("q_join_star",
      (s, dir) => {
        val region = t(s, dir, "region").filter(col("r_name") === "EUROPE")
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("o_totalprice").cast(dec2)).cast("double").as("revenue"),
               count(lit(1)).as("n_orders"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'EUROPE'
             |GROUP BY n_name""".stripMargin)),

    // --- window: top-3 orders per customer, deterministic tie-break -----
    Q("q_window_topk",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin)),

    // --- window: running sum (exact decimal accumulation) ---------------
    Q("q_window_running",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .withColumn("run_total",
            sum(col("o_totalprice").cast(dec2)).over(w).cast("double"))
          .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total
             |FROM orders""".stripMargin)),

    // --- global top-k: TakeOrderedAndProject, no full sort ---------------
    Q("q_topk_global",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey")),
      Some("""SELECT o_orderkey, o_custkey FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // --- existence semi-join ---------------------------------------------
    Q("q_semijoin",
      (s, dir) => {
        val f = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        t(s, dir, "customer")
          .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin)),

    // --- anti-join --------------------------------------------------------
    Q("q_antijoin",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey")),
      Some("""SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),

    // --- distinct (shuffle dedup) ----------------------------------------
    Q("q_distinct",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("c_nationkey"))
        .distinct(),
      Some("""SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
             |FROM customer""".stripMargin)),

    // --- set ops: symmetric difference with provenance tag ---------------
    Q("q_setops",
      (s, dir) => {
        val cn = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("nationkey")).distinct()
        val sn = t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("nationkey")).distinct()
        cn.except(sn).withColumn("side", lit("customer_only"))
          .unionByName(sn.except(cn).withColumn("side", lit("supplier_only")))
      },
      Some("""SELECT nationkey, 'customer_only' AS side FROM (
             |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
             |  EXCEPT
             |  SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier)
             |UNION ALL
             |SELECT nationkey, 'supplier_only' AS side FROM (
             |  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
             |  EXCEPT
             |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) FROM customer)""".stripMargin)),

    // --- rollup (grouping sets) ------------------------------------------
    Q("q_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(col("l_quantity").cast(dec2)).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
                col("n"), col("sum_qty")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             |       COALESCE(l_linestatus, 'ALL') AS linestatus,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // --- cube: all grouping-set combinations + grouping_id ----------------
    Q("q_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("gid")),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |       COALESCE(o_orderpriority, 'ALL') AS priority,
             |       COUNT(*) AS n,
             |       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // --- explicit grouping sets (beyond rollup/cube's fixed lattices) ----
    Q("q_grouping_sets",
      (s, dir) => t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec2)).cast("double").as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price")),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |       COALESCE(o_orderpriority, 'ALL') AS priority,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // --- ntile: equi-depth bucketing within partitions --------------------
    // Quantile-bucket assignment per priority class (PARTITIONED window —
    // never a global single-partition ORDER BY). Deterministic: ordering
    // ties broken by o_orderkey.
    Q("q_ntile",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").cast(dec2), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("bucket", ntile(4).over(w))
          .groupBy(col("o_orderpriority").as("priority"), col("bucket"))
          .agg(count(lit(1)).as("n"),
            max(col("o_totalprice").cast(dec2)).cast("double").as("max_price"))
      },
      Some("""SELECT o_orderpriority AS priority, bucket, COUNT(*) AS n,
             |       CAST(MAX(tp) AS DOUBLE) AS max_price
             |FROM (SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS tp,
             |        NTILE(4) OVER (PARTITION BY o_orderpriority
             |                       ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS bucket
             |      FROM orders)
             |GROUP BY 1, 2""".stripMargin)),

    // --- having + exact average (int sum / count as double) --------------
    Q("q_having",
      (s, dir) => t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
             (sum(col("p_size").cast("long")).cast("double") / count(lit(1))).as("avg_size"))
        .filter(col("n_parts") > 50),
      Some("""SELECT p_brand, COUNT(*) AS n_parts,
             |       CAST(SUM(CAST(p_size AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_size
             |FROM part GROUP BY p_brand HAVING COUNT(*) > 50""".stripMargin)),

    // --- correlated-subquery shape via window (division-free compare) ----
    Q("q_above_customer_avg",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
        t(s, dir, "orders")
          .withColumn("tp", col("o_totalprice").cast(dec2))
          .withColumn("cust_sum", sum(col("tp")).over(w))
          .withColumn("cust_n", count(lit(1)).over(w))
          .filter(col("tp") * col("cust_n") > col("cust_sum"))
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("""SELECT o_orderkey, o_custkey FROM (
             |  SELECT o_orderkey, o_custkey,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS tp,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS cust_sum,
             |    COUNT(*) OVER (PARTITION BY o_custkey) AS cust_n
             |  FROM orders) WHERE tp * cust_n > cust_sum""".stripMargin)),

    // --- scalar string/conditional functions ------------------------------
    Q("q_scalar_funcs",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        (abs(col("p_size").cast("long") - 25) % 7).as("size_bucket"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "medium")
          .otherwise("large").as("size_class")),
      Some("""SELECT p_partkey,
             |  UPPER(SUBSTR(p_name, 1, 8)) AS name_prefix,
             |  CAST(LENGTH(p_name) AS INT) AS name_len,
             |  p_brand || '#' || p_type AS brand_type,
             |  ABS(CAST(p_size AS BIGINT) - 25) % 7 AS size_bucket,
             |  CASE WHEN p_size < 10 THEN 'small'
             |       WHEN p_size < 30 THEN 'medium'
             |       ELSE 'large' END AS size_class
             |FROM part""".stripMargin)),

    // --- date functions (string-rendered to stay engine-neutral) ----------
    Q("q_date_funcs",
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        quarter(col("o_orderdate")).as("order_quarter"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_ym")),
      Some("""SELECT o_orderkey,
             |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
             |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
             |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS order_quarter,
             |  strftime(o_orderdate, '%Y-%m') AS order_ym
             |FROM orders""".stripMargin)),

    // --- percentiles (exact, interpolated on quantized cents) -------------
    // Quantize to integer cents first: interpolation then runs on exact
    // identical inputs in both engines (Spark percentile ≡ DuckDB
    // quantile_cont), so the doubles agree bit-for-bit.
    Q("q_percentile",
      (s, dir) => t(s, dir, "orders")
        .withColumn("cents", expr("cast(round(o_totalprice * 100, 0) as bigint)"))
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(cents, 0.5)").as("median_cents"),
          expr("percentile(cents, 0.9)").as("p90_cents"),
          count(lit(1)).as("n")),
      Some("""SELECT o_orderpriority,
             |  quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.5) AS median_cents,
             |  quantile_cont(CAST(round(o_totalprice * 100, 0) AS BIGINT), 0.9) AS p90_cents,
             |  COUNT(*) AS n
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // --- lag/lead: consecutive-order deltas per customer -------------------
    Q("q_window_lag",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("cents", expr("cast(round(o_totalprice * 100, 0) as bigint)"))
          .withColumn("prev_cents", lag(col("cents"), 1).over(w))
          .withColumn("delta_cents", col("cents") - col("prev_cents"))
          .select(col("o_orderkey"), col("o_custkey"), col("prev_cents"), col("delta_cents"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  LAG(cents) OVER w AS prev_cents,
             |  cents - LAG(cents) OVER w AS delta_cents
             |FROM (SELECT *, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders)
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // --- pivot (FILTERed aggregates in the oracle) -------------------------
    Q("q_pivot",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L, Seq("F", "O", "P")),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // --- RANGE-frame window: peers aggregate together ---------------------
    // RANGE UNBOUNDED PRECEDING..CURRENT ROW includes ALL rows tied on the
    // order key — deterministic under any partitioning without a unique
    // tie-break column (a ROWS frame on a non-unique key would not be).
    Q("q_window_range",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .withColumn("cents", expr("cast(round(o_totalprice * 100, 0) as bigint)"))
          .withColumn("run_cents", sum(col("cents")).over(w))
          .select(col("o_orderkey"), col("o_custkey"), col("run_cents"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
             |          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
             |FROM orders""".stripMargin)),

    // --- first_value / last_value over a full-partition frame -------------
    Q("q_first_last",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          first(col("o_orderdate")).over(w).as("first_date"),
          last(col("o_orderdate")).over(w).as("last_date"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  first_value(o_orderdate) OVER w AS first_date,
             |  last_value(o_orderdate) OVER w AS last_date
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)),

    // --- salted two-phase aggregation (hot-key skew pattern) --------------
    // l_returnflag has 3 values — at cluster scale a plain groupBy lands
    // each entire key on ONE reducer. The salted form shards each key 16
    // ways on an unrelated column's hash, partially aggregates, then
    // reduces the 3×16 partials: the heavy shuffle is uniform, the hot
    // shuffle is 48 rows. (Spark's map-side combine already blunts this
    // for algebraic aggs; the explicit two-phase shape is what you reach
    // for when combine isn't enough — many distinct map keys per
    // partition, or positional/holistic aggregates.) Results are
    // identical to the plain groupBy — which IS the oracle.
    Q("q_skew_salted",
      (s, dir) => {
        val partial = t(s, dir, "lineitem")
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("l_quantity").cast(dec2)).as("q"), count(lit(1)).as("n"))
        partial.groupBy(col("l_returnflag"))
          .agg(sum(col("q")).cast("double").as("sum_qty"), sum(col("n")).as("n_rows"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // --- ordered string aggregation (listagg) -----------------------------
    // Deterministic across partitionings: collect_list order is runtime-
    // dependent, so the list is sorted IN the row before concatenation.
    Q("q_string_agg",
      (s, dir) => t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("suppliers"),
          count(lit(1)).as("n")),
      Some("""SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
             |       count(*) AS n
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // --- array pairing with zip_with (vectorized per-row math) ------------
    // Per-order quantity/price vectors built by ONE grouped sort_array
    // (struct sort keys the arrays identically on both), then revenue =
    // aggregate(zip_with(qty, cents, *), +) folded IN the row — array
    // math stays codegen'd, no explode-regroup round trip. The shape for
    // per-entity vector features at scale: one shuffle, then row-local HOFs.
    Q("q_array_zip",
      (s, dir) => t(s, dir, "lineitem")
        // ONE sorted struct array per order (the key (ln, q, c) is a total
        // order over the multiset even with duplicate line numbers), then
        // both vectors project from it — so qty[i] and cents[i] always
        // come from the SAME source row, in both engines.
        .groupBy(col("l_orderkey"))
        .agg(expr("array_sort(collect_list(struct(l_linenumber as ln, " +
          "cast(l_quantity as bigint) as q, " +
          "cast(round(l_extendedprice * 100, 0) as bigint) as c)))").as("arr"))
        .select(col("l_orderkey"), size(col("arr")).as("n_lines"),
          expr("transform(arr, s -> s.q)").as("qty"),
          expr("transform(arr, s -> s.c)").as("cents"))
        .select(col("l_orderkey"), col("n_lines"),
          expr("aggregate(zip_with(qty, cents, (q, c) -> q * c), 0L, (a, x) -> a + x)")
            .as("rev_qty_cents")),
      Some("""WITH l AS (SELECT l_orderkey,
             |    list_sort(list({'ln': l_linenumber, 'q': CAST(l_quantity AS BIGINT),
             |                    'c': CAST(round(l_extendedprice * 100, 0) AS BIGINT)})) AS arr
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey, len(arr) AS n_lines,
             |  CAST(list_sum(list_transform(arr, s -> s.q * s.c)) AS BIGINT) AS rev_qty_cents
             |FROM l""".stripMargin)),

    // --- unpivot: wide metrics to long (key, value) rows ------------------
    Q("q_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast(dec2)).cast("double").as("qty"),
          sum(col("l_extendedprice").cast(dec2)).cast("double").as("price"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("price")),
          "metric", "value"),
      Some("""WITH a AS (SELECT l_returnflag,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, 'qty' AS metric, qty AS value FROM a
             |UNION ALL
             |SELECT l_returnflag, 'price' AS metric, price AS value FROM a""".stripMargin)),

    // --- correlated NOT EXISTS (Catalyst subquery decorrelation) ----------
    // Declared as a genuine correlated subquery through the SQL front end;
    // Catalyst decorrelates it to a left-anti hash join (RewritePredicate-
    // Subquery) — the plan a hand-written anti-join would produce, from
    // the declarative form.
    Q("q_exists_correlated",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("v_customer")
        t(s, dir, "orders").createOrReplaceTempView("v_orders")
        s.sql("""SELECT c_custkey, c_name FROM v_customer c
                |WHERE c_mktsegment = 'BUILDING' AND NOT EXISTS (
                |  SELECT 1 FROM v_orders o
                |  WHERE o.o_custkey = c.c_custkey
                |    AND o.o_orderpriority = '1-URGENT')""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE c_mktsegment = 'BUILDING' AND NOT EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |    AND o.o_orderpriority = '1-URGENT')""".stripMargin)),

    // --- LATERAL correlated table subquery: top-3 orders per customer ---
    // The per-row subquery form of q_window_topk's windowed top-k:
    // LATERAL evaluates the correlated ORDER BY … LIMIT 3 per customer.
    // Catalyst DECORRELATES it (DecorrelateInnerQuery) back into the
    // window/join plan rather than executing a per-row loop — which is
    // precisely why the form is usable at 100 TB, and why the identical
    // SQL text runs on DuckDB as the oracle. Machinery BUILDING slice
    // keeps the output bounded; ties break on orderkey.
    Q("q_lateral_topn",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("v_customer")
        t(s, dir, "orders").createOrReplaceTempView("v_orders")
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice AS price
                |FROM v_customer c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM v_orders o
                |         WHERE o.o_custkey = c.c_custkey
                |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
                |WHERE c.c_mktsegment = 'MACHINERY'""".stripMargin)
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice AS price
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
             |WHERE c.c_mktsegment = 'MACHINERY'""".stripMargin)),

    // --- deep join tree: TPC-H Q5 local-supplier-volume shape -----------
    // Six tables, two independent FK chains meeting on nationkey (the
    // customer's and the supplier's nation must coincide). The fact-side
    // chain (orders⨝lineitem) shuffles on its keys; every dimension
    // (customer, supplier, nation, region) broadcasts — the mixed
    // SMJ/BHJ tree Catalyst should pick for a star-with-a-twist at any
    // scale. Region filter prunes before any join.
    Q("q_join5_volume",
      (s, dir) => {
        val price = col("l_extendedprice").cast(dec2)
        val disc  = col("l_discount").cast(dec2)
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(price * (lit(1) - disc)).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // --- window rank family: percent_rank + cume_dist -------------------
    // Relative standing of each order inside its priority class — the
    // two rank-normalizing window functions the inventory lacked. Both
    // are deterministic here without a tie-break column: equal totals
    // receive equal percent_rank/cume_dist BY DEFINITION, so the output
    // is a pure function of the value distribution.
    Q("q_window_pct",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  round(percent_rank() OVER (PARTITION BY o_orderpriority
             |                             ORDER BY o_totalprice), 6) AS pct_rank,
             |  round(cume_dist() OVER (PARTITION BY o_orderpriority
             |                          ORDER BY o_totalprice), 6) AS cume
             |FROM orders""".stripMargin)),

    // --- calendar densification: sequence() + explode --------------------
    // Zero-filled monthly time series — the gap-free reporting spine
    // every dashboard needs. The spine is ONE expression over the data's
    // own (min, max) bounds: sequence(lo, hi, interval 1 month) exploded,
    // then LEFT JOINed so empty months surface as 0. This replaced a
    // WITH RECURSIVE formulation (VERDICT r04 item 4): recursion runs one
    // driver-paced job per month — depth grows with the DATE SPAN no
    // matter how many executors you add, ~80 sequential jobs at sf0.1 —
    // while the sequence plan is a single job at any span. The recursive
    // feature itself is demonstrated by q_recursive_months below, with
    // the depth pinned to a constant so it can't become span-bound.
    Q("q_calendar_fill",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val bounds = orders.agg(
          date_trunc("month", min(col("o_orderdate"))).as("lo"),
          date_trunc("month", max(col("o_orderdate"))).as("hi"))
        bounds
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 month"))).as("month"))
          .join(orders.select(
            date_trunc("month", col("o_orderdate")).as("month"),
            col("o_orderkey")), Seq("month"), "left")
          .groupBy(col("month"))
          .agg(count(col("o_orderkey")).as("n_orders"))
      },
      Some("""WITH b AS (SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
             |             CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP) AS hi
             |           FROM orders),
             |months AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m FROM b)
             |SELECT CAST(m AS TIMESTAMP) AS month, count(o_orderkey) AS n_orders
             |FROM months LEFT JOIN orders
             |  ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
             |GROUP BY m""".stripMargin)),

    // --- recursive CTE: fixed-depth feature demo -------------------------
    // WITH RECURSIVE (new in Spark 4.x), identical SQL text on both
    // engines: the 12 months of the data's final order-year, joined to
    // the per-month order counts. The recursion depth is a CONSTANT 12 —
    // each step is a driver-paced job, so unlike the old span-bound
    // calendar recursion this entry's cost never grows with the data's
    // date range; densification at scale belongs to q_calendar_fill's
    // single-pass sequence() plan above.
    Q("q_recursive_months",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("v_orders")
        s.sql("""WITH RECURSIVE months(m, i) AS (
                |  SELECT CAST(date_trunc('year', max(o_orderdate)) AS TIMESTAMP), 1
                |  FROM v_orders
                |  UNION ALL
                |  SELECT m + INTERVAL 1 MONTH, i + 1 FROM months WHERE i < 12
                |)
                |SELECT m AS month, count(o_orderkey) AS n_orders
                |FROM months LEFT JOIN v_orders
                |  ON date_trunc('month', o_orderdate) = m
                |GROUP BY m""".stripMargin)
      },
      Some("""WITH RECURSIVE months(m, i) AS (
             |  SELECT CAST(date_trunc('year', max(o_orderdate)) AS TIMESTAMP), 1
             |  FROM orders
             |  UNION ALL
             |  SELECT m + INTERVAL 1 MONTH, i + 1 FROM months WHERE i < 12
             |)
             |SELECT m AS month, count(o_orderkey) AS n_orders
             |FROM months LEFT JOIN orders
             |  ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
             |GROUP BY m""".stripMargin)),

    // --- bucketed co-located join: shuffle elimination by layout --------
    // Both fact tables are written ONCE bucketed (+sorted) on the join
    // key into the warehouse; the join then reads bucket i against
    // bucket i with NO Exchange on either side — the layout-level answer
    // to "this join shuffles 100 TB every day". The write is the
    // amortized one-time cost a production pipeline pays at ingest; the
    // hint("merge") pins SMJ so the plan demonstrates the bucketed path
    // rather than AQE broadcasting the (locally small) orders side.
    // PlanSpec asserts no hashpartitioning exchange on the join keys.
    Q("q_join_bucketed",
      (s, dir) => {
        // Content-fingerprinted bucketed tables (ADVICE r04-r06 rules
        // live in the shared PipeData.bucketedTable helper).
        val ot = PipeData.bucketedTable(s, "graft_bkt_orders", dir,
          "o_orderkey", 16)(
          t(s, dir, "orders").select("o_orderkey", "o_orderpriority"))
        val lt = PipeData.bucketedTable(s, "graft_bkt_lineitem", dir,
          "l_orderkey", 16)(
          t(s, dir, "lineitem").select("l_orderkey", "l_quantity"))
        s.table(lt).hint("merge")
          .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(dec2)).cast("double").as("sum_qty"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin)),
  )
}
