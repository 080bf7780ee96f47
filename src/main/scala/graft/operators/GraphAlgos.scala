package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.GraphLoader
import graft.{Bcast, Ckpt}

/** Iterative graph analytics over the parquet→graph projection — the
  * GraphX-flavored extension axis of the engine (reference has none;
  * SURVEY.md §7.2 M7). Two oracle-checked DataFrame algorithms plus a
  * genuine GraphX run:
  *
  *   - connected components: min-label propagation, FIXED superstep
  *     count (measured convergence + margin; see ccIters), every step a
  *     join + min-agg —
  *     integer labels, so results are exact and engine-independent. The
  *     oracle replays the identical ccIters steps as unrolled CTEs.
  *   - PageRank: 8 iterations in 1e-9 fixed point — contributions are
  *     `rank div outdeg`, damping is `150000000 + (85 * in_sum) div 100`,
  *     all int64, so every engine computes bit-equal ranks. Dangling mass
  *     is dropped (not redistributed) on both sides — the standard
  *     simplified formulation, chosen for cross-engine exactness.
  *   - a GraphX staticPageRank over the same edges (rows-only check):
  *     the library integration point for everything else GraphX offers.
  *
  * Scale: label propagation and power iteration are the 1000-executor
  * classics — each superstep is one shuffle keyed by dst; lineage is cut
  * with a localCheckpoint every few steps (else the chained shuffles build
  * an unbounded plan). At 100 TB you'd swap CC for the large-star/
  * small-star algorithm (fewer supersteps on skewed graphs), same join
  * shapes.
  */
object GraphAlgos {

  // Label propagation converges at superstep 7 on this graph (measured
  // at sf0.1: one giant component — lineitems bridge every region
  // through their order/customer and supplier paths). The diameter is
  // set by the schema's FK chain shape, not the scale factor, so 9 = 7+2
  // margin holds across SFs.
  private val ccIters = 9
  private val prIters = 8

  /** All directed FK edges of the loaded graph as one (src,dst) frame.
    * Excludes the non-FK relation types: `tagged` (mutable, starts empty)
    * and `nnext` (derived successor chain for variable-length paths) —
    * the analytics oracles reconstruct exactly the source foreign keys. */
  private def allEdges(s: SparkSession, dir: String): DataFrame = {
    val (g, _) = GraphLoader.load(s, dir)
    val nonFk = Set("tagged", "nnext")
    g.edges.collect { case (key, df) if !nonFk(key._2) => df.select("src", "dst") }
      .reduce(_ union _)
  }

  private def allNodes(s: SparkSession, dir: String): DataFrame = {
    val (g, _) = GraphLoader.load(s, dir)
    (g.nodes - "tag").values.map(_.select("id")).reduce(_ union _)
  }

  /** The undirected, src-pre-partitioned edge frame every label/distance
    * propagation joins against — built (one 2×|E| shuffle + checkpoint)
    * ONCE per (session, dir) and shared by CC and BFS instead of each
    * op re-shuffling it. Pinned outside the Ckpt drain ledger (a
    * drained localCheckpoint is unrecoverable); evicted when its
    * session stops, same discipline as GraphLoader's lineitem cache. */
  private val ueFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Single-evaluation memoization lock for the three session caches
    * below: TrieMap.getOrElseUpdate alone does NOT guarantee one build —
    * two concurrent first callers may both build, and the loser's
    * persisted graph / pinned checkpoint would leak for the session's
    * lifetime with no handle to unpersist it (ADVICE r05). The builds
    * are rare (once per session × dir) and the harnesses are
    * single-threaded, so one coarse lock is cheap insurance, not a
    * bottleneck. */
  private val memoLock = new Object

  /** (|V|, directed |E|) counted ONCE per (session, dir) — feeds the
    * volume-derived superstep partition counts ([[graft.Ckpt.partsFor]],
    * guide §2): every iterative loop here sizes its per-superstep
    * label/frontier exchanges and checkpoints to these instead of
    * inheriting the session's core-count default. Two count jobs per
    * session, amortized over every graph query. */
  private val sizeMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, Long)]

  private def graphScale(s: SparkSession, dir: String): (Long, Long) = memoLock.synchronized {
    sizeMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    sizeMemo.getOrElseUpdate((s, dir),
      (allNodes(s, dir).count(), allEdges(s, dir).count()))
  }

  /** Partition count for |V|-scale per-superstep frames of this graph. */
  private def nodeParts(s: SparkSession, dir: String): Int =
    Ckpt.partsFor(s, graphScale(s, dir)._1)

  /** Partition count for |E|-scale per-superstep frames (undirected). */
  private def edgeParts(s: SparkSession, dir: String): Int =
    Ckpt.partsFor(s, 2L * graphScale(s, dir)._2)

  private def undirectedEdges(s: SparkSession, dir: String): DataFrame = memoLock.synchronized {
    ueFrames.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    ueFrames.getOrElseUpdate((s, dir), {
      val e = allEdges(s, dir)
      Ckpt.pinned(
        e.union(e.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(col("src")))
    })
  }

  /** Delta min-label propagation CC over a pre-built UNDIRECTED edge
    * frame (both orientations present, ideally src-pre-partitioned).
    * Returns (labels id→comp, supersteps used incl. the convergence-
    * detection step). Supersteps scale with component DIAMETER — the
    * right choice when the diameter is known small (this repo's FK
    * graph: 7), the wrong one on an unknown 100 TB graph (see
    * [[starCC]]; GraphAlgosSpec pins the contrast on a chain+hub
    * fixture).
    *
    * Delta propagation: only labels that DECREASED last round send
    * messages. Per-round labels are provably identical to full
    * propagation (a neighbor unchanged since round r already contributed
    * its value in round r+1, and labels only decrease), so the unrolled
    * full-propagation oracle still matches — but message volume
    * collapses once the bulk of the graph settles (round 1: 2|E|, later
    * rounds: near zero). The classic delta-iteration shape (Flink/
    * Pregel) for LP at cluster scale.
    *
    * ONE checkpoint AND ONE JOB per superstep: the joined frame is
    * checkpoint-marked deferred, and the delta-count probe over it is
    * the job that materializes it — labels and the delta are cheap
    * projections over the materialized frame, and the previous
    * superstep's checkpoint is released the moment the next one is
    * materialized, so peak storage is 2 label frames, not 2×iters.
    * deferredPartitioned preserves the id partitioning so the next
    * superstep's left join does not re-shuffle the full |V| label frame
    * (the AQE checkpoint pitfall; PlanSpec pins it). Early exit on
    * convergence; maxIters is the BOUND — exhausting
    * it unconverged fails loudly (the oracle replays the same count, so
    * silent under-convergence would hash-match — VERDICT r02). */
  def deltaCC(nodes: DataFrame, undirected: DataFrame, maxIters: Int,
      parts: Int): (DataFrame, Int) = Ckpt.withShuffle(nodes.sparkSession, parts) {
    // `parts` (round 19, guide §2): the per-superstep min-aggregation
    // exchange and the label checkpoints land at this volume-derived
    // count; the pre-placed undirected edge frame keeps its compute
    // width (only the shrinking `changed` side shuffles up to meet it).
    var prev: DataFrame = Ckpt.eager(
      nodes.select(col("id"), col("id").as("comp")))
    var labels = prev
    var changed = labels
    var converged = false
    var step = 0
    while (step < maxIters && !converged) {
      step += 1
      val mins = undirected.join(changed, undirected("src") === changed("id"))
        .select(undirected("dst").as("id"), col("comp").as("cand"))
        .groupBy("id").agg(min("cand").as("cand"))
      val joined = Ckpt.deferredPartitioned(labels.join(mins, Seq("id"), "left"))
      // this count is the superstep's ONLY job: it materializes the
      // deferred checkpoint AND is the convergence probe
      val nChanged = joined.filter(col("cand") < col("comp")).count()
      Ckpt.drop(prev)
      prev = joined
      labels = joined
        .select(col("id"), least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"))
      changed = joined.filter(col("cand") < col("comp"))
        .select(col("id"), col("cand").as("comp"))
      converged = nChanged == 0L
    }
    require(converged,
      s"connected components not converged after $maxIters supersteps")
    (labels, step)
  }

  /** Alternating large-star/small-star CC (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") over a directed (src,dst) edge
    * frame. Returns (labels id→comp for every node, rounds used incl.
    * the convergence-detection round). Instead of propagating labels
    * along edges (rounds ~ graph diameter), each round REWIRES the edge
    * set itself — large-star hangs every larger neighbor under the
    * neighborhood minimum, small-star recompresses the rest — converging
    * in O(log n) rounds on ANY graph shape to stars rooted at component
    * minima: the 100 TB choice on unknown/skewed graphs. Same fixed
    * point as min-label propagation (PipelineSpec pins star ≡ delta
    * equality; GraphAlgosSpec pins the round-count advantage on a
    * chain+hub fixture). Each round is two groupBy+join passes over the
    * current edge set (shrinking fast), with the same checkpoint-per-
    * round lineage discipline as the delta iteration. */
  def starCC(nodes: DataFrame, e0: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    var edges = Ckpt.deferred(
      e0.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct())
    var nEdges = edges.count() // materializes the deferred mark
    var converged = false
    var round = 0
    // Round 19 (guide §2): every round's frames are bounded by the
    // canonical edge set (the rewire only shrinks it), so all round
    // exchanges/checkpoints run at a volume-derived partition count —
    // the initial distinct above still ran at session width.
    Ckpt.withShuffle(nodes.sparkSession,
      Ckpt.partsFor(nodes.sparkSession, 2L * nEdges)) {
    while (round < maxRounds && !converged) {
      round += 1
      // neighborhoods over both orientations of the current edges
      val und = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val withM = und
        .join(und.groupBy("u").agg(min("v").as("mn")), Seq("u"))
        .withColumn("m", least(col("mn"), col("u")))
      // large-star: strictly larger neighbors hang under m. ONE
      // distinct here (it also canonicalizes: m < v always), so the
      // small-star pass reads a deduped frame; self-loops (v == m)
      // drop with the same filter.
      val large = withM.filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("m").as("u"), col("v")).distinct()
      val undL = large.select(col("u"), col("v"))
        .union(large.select(col("v").as("u"), col("u").as("v")))
      val withM2 = undL
        .join(undL.groupBy("u").agg(min("v").as("mn")), Seq("u"))
        .withColumn("m", least(col("mn"), col("u")))
      // small-star: smaller neighbors AND the center hang under m;
      // one terminal distinct canonicalizes (m is the smaller end)
      val small = Ckpt.deferred(
        withM2.filter(col("v") < col("u"))
          .select(col("m").as("u"), col("v").as("v2"))
          .union(withM2.select(col("m").as("u"), col("u").as("v2")))
          .filter(col("u") =!= col("v2"))
          .select(col("u"), col("v2").as("v")).distinct())
      // this count is the round's only mandatory job — it materializes
      // the deferred checkpoint and is the cardinality half of the
      // convergence probe (the previous round's count is carried over,
      // never re-measured). Both sides are distinct sets: equal
      // cardinality + empty one-sided difference <=> set equality; the
      // anti-join only runs once counts agree, and never before round 3
      // (the theoretical minimum here).
      val nSmall = small.count()
      converged = round >= 3 && nSmall == nEdges &&
        small.exceptAll(edges).isEmpty
      Ckpt.drop(edges)
      edges = small
      nEdges = nSmall
    }
    }
    require(converged,
      s"star CC not converged after $maxRounds rounds")
    // converged edges are (leaf, root) stars; roots and isolated
    // nodes label themselves
    val comp = nodes
      .join(edges.select(col("v").as("id2"), col("u").as("root"))
        .groupBy("id2").agg(min("root").as("root")),
        col("id") === col("id2"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("comp"))
    (comp, round)
  }

  /** The GraphX graph over the FK edges — built (one fromEdges + 2D
    * partition shuffle) ONCE per (session, dir) and shared by the two
    * GraphX integration ops instead of each re-building it. Kept
    * persisted for the session like [[undirectedEdges]]; the ops still
    * unpersist their own RESULT graphs. */
  private val gxGraphs = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.graphx.Graph[Unit, Unit]]

  private def gxGraph(s: SparkSession, dir: String)
      : org.apache.spark.graphx.Graph[Unit, Unit] = memoLock.synchronized {
    import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
    gxGraphs.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    gxGraphs.getOrElseUpdate((s, dir), {
      val sp = s
      import sp.implicits._
      val eDf = allEdges(s, dir)
      // Size edge partitions to DATA VOLUME, not to the loader plan's
      // partitioning: the union-of-scans arrives in O(#frames × scan
      // splits) partitions, and RDD Pregel (no AQE coalescing) pays
      // 3 stages × P tasks of fixed cost EVERY iteration, plus
      // EdgePartition2D replicates each vertex to ≤ 2√P partitions —
      // both costs scale with P, so P must track |E|. ~1M edges
      // (~32 MB of Edge[Unit]) per partition: thousands of partitions
      // at 100 TB, single digits at bench SFs.
      val parts = math.max(4, (eDf.count() / 1_000_000L).toInt)
      val edgeRdd = eDf.as[(Long, Long)].rdd
        .map { case (a, b) => Edge(a, b, ()) }
        .coalesce(parts)
      // EdgePartition2D bounds each vertex's replication at 2*sqrt(P)
      // partitions, shrinking the per-iteration vertex-to-edge shuffle
      // (the dominant cost of RDD Pregel on a star-heavy FK graph).
      Graph.fromEdges(edgeRdd, defaultValue = ())
        .partitionBy(PartitionStrategy.EdgePartition2D)
    })
  }

  /** Final fixed-point PageRank frame (id, rank: 1e-9 int64), computed
    * once per (session, dir) and shared: g_pagerank projects its top-100
    * and g_pagerank_graphx cross-validates GraphX against it vertex by
    * vertex — the second consumer costs nothing beyond its own GraphX
    * run. Pinned like [[undirectedEdges]] (outside the drain ledger). */
  private val prFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def fixedPageRank(s: SparkSession, dir: String): DataFrame = memoLock.synchronized {
    prFrames.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    prFrames.getOrElseUpdate((s, dir), {
      // Loop-invariant precomputation, partitioned by the per-step join
      // key: the edge list FUSED with its out-degree (one static join
      // instead of one per iteration), materialized once. Nodes are
      // pre-partitioned by id — the checkpoint preserves the
      // partitioning, so the per-iteration nodes⟕contribs join and the
      // next round's ed⨝ranks probe both reuse it instead of
      // re-shuffling the node set every superstep (the only per-step
      // shuffle left is the contribution aggregation itself — the
      // irreducible PageRank shuffle).
      val e0 = allEdges(s, dir)
      val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("d"))
      // eagerPartitioned: a plain eager checkpoint under AQE reports
      // UnknownPartitioning, so every per-iteration join would RE-SHUFFLE
      // the loop-invariant frames the repartition exists to pre-place
      val ed = Ckpt.eagerPartitioned(e0.join(outdeg, Seq("src")).repartition(col("src")))
      // NOT partition-shrunk (round 19): every iteration joins the FULL
      // |V| rank frame against the compute-width `ed` — shrinking the
      // rank side adds a full-|V| re-exchange per iteration to meet it
      // (measured; r18 scaling ratio 0.93 — volume-bound, not
      // overhead-bound, unlike the frontier-delta loops).
      val nodes = Ckpt.eagerPartitioned(allNodes(s, dir).repartition(col("id")))
      var ranks = nodes.select(col("id"), lit(1000000000L).as("rank"))
      var prev: DataFrame = null
      for (i <- 1 to prIters) {
        val contribs = ed
          .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst").as("id"), expr("rank div d").as("c"))
          .groupBy("id").agg(sum("c").as("s"))
        ranks = nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            expr("150000000L + (85 * coalesce(s, 0L)) div 100").as("rank"))
        if (i % 4 == 0 && i < prIters) {
          ranks = Ckpt.eagerPartitioned(ranks) // keeps the id partitioning live
          if (prev != null) Ckpt.drop(prev)
          prev = ranks
        }
      }
      // Final ranks are pinned (session-lifetime cache); the loop's
      // intermediate checkpoints and invariant frames are released.
      val out = Ckpt.pinned(ranks)
      if (prev != null) Ckpt.drop(prev)
      Ckpt.drop(ed)
      Ckpt.drop(nodes)
      out
    })
  }

  // ---- shared oracle SQL fragments (mirror GraphLoader's id scheme) ----

  private def liSql: String =
    s"SELECT *, ${graft.sources.GraphLoader.lineIdSql} AS lid FROM lineitem"

  private[operators] lazy val edgeSql: String =
    s"""SELECT c_custkey + 4000000000 AS src, c_nationkey + 2000000000 AS dst FROM customer
       |UNION ALL SELECT s_suppkey + 3000000000, s_nationkey + 2000000000 FROM supplier
       |UNION ALL SELECT n_nationkey + 2000000000, n_regionkey + 1000000000 FROM nation
       |UNION ALL SELECT o_orderkey + 6000000000, o_custkey + 4000000000 FROM orders
       |UNION ALL SELECT lid, l_orderkey + 6000000000 FROM ($liSql)
       |UNION ALL SELECT lid, l_partkey + 5000000000 FROM ($liSql)
       |UNION ALL SELECT lid, l_suppkey + 3000000000 FROM ($liSql)""".stripMargin

  private[operators] lazy val nodeSql: String =
    s"""SELECT r_regionkey + 1000000000 AS id FROM region
       |UNION ALL SELECT n_nationkey + 2000000000 FROM nation
       |UNION ALL SELECT s_suppkey + 3000000000 FROM supplier
       |UNION ALL SELECT c_custkey + 4000000000 FROM customer
       |UNION ALL SELECT p_partkey + 5000000000 FROM part
       |UNION ALL SELECT o_orderkey + 6000000000 FROM orders
       |UNION ALL SELECT lid FROM ($liSql)""".stripMargin

  // Every CTE is MATERIALIZED: each step references its predecessor
  // twice, so DuckDB's default inlining would expand the plan 2^iters
  // times (and re-open every parquet file in each copy).
  private lazy val ccOracle: String = {
    val steps = (1 to ccIters).map { i =>
      s"""l$i AS MATERIALIZED (SELECT x.id, min(x.comp) AS comp FROM (
         |  SELECT id, comp FROM l${i - 1}
         |  UNION ALL SELECT ue.dst AS id, l${i - 1}.comp
         |  FROM ue JOIN l${i - 1} ON ue.src = l${i - 1}.id) x GROUP BY x.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |l0 AS MATERIALIZED (SELECT id, id AS comp FROM nn),
       |$steps
       |SELECT comp, count(*) AS n FROM l$ccIters GROUP BY comp""".stripMargin
  }

  // MATERIALIZED for the same reason as ccOracle; sums cast back to
  // BIGINT (DuckDB's sum(BIGINT) is HUGEINT, which pandas would render
  // as float and break the exact-integer comparison).
  private lazy val prOracle: String = {
    val steps = (1 to prIters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT nn.id,
         |  CAST(150000000 + (85 * coalesce(m$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(r${i - 1}.rank // od.d) AS BIGINT) AS s
         |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id
         |    JOIN od ON e.src = od.id GROUP BY e.dst) m$i ON nn.id = m$i.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |od AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM e GROUP BY src),
       |r0 AS MATERIALIZED (SELECT id, 1000000000::BIGINT AS rank FROM nn),
       |$steps
       |SELECT id, rank FROM r$prIters ORDER BY rank DESC, id LIMIT 100""".stripMargin
  }

  /** BFS source: region 0's node id (GraphLoader id scheme). */
  private val bfsSrc = 1000000000L
  private val bfsIters = 9 // diameter bound + margin, same story as ccIters

  // Unrolled frontier BFS over the undirected graph: d_i(v) =
  // min(d_{i-1}(v), min over neighbors u of d_{i-1}(u) + 1). Same
  // MATERIALIZED discipline as ccOracle.
  private lazy val bfsOracle: String = {
    val steps = (1 to bfsIters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT x.id, min(x.d) AS d FROM (
         |  SELECT id, d FROM d${i - 1}
         |  UNION ALL SELECT ue.dst AS id, d${i - 1}.d + 1
         |  FROM ue JOIN d${i - 1} ON ue.src = d${i - 1}.id) x GROUP BY x.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |d0 AS MATERIALIZED (SELECT id, 0::BIGINT AS d FROM nn WHERE id = $bfsSrc),
       |$steps
       |SELECT d AS dist, count(*) AS n FROM d$bfsIters GROUP BY d""".stripMargin
  }

  // Unrolled multi-source BFS (seed column carried through the same
  // min-distance recurrence as bfsOracle), then the harmonic sum in
  // 1e-6 fixed point. Same MATERIALIZED discipline.
  private lazy val harmonicOracle: String = {
    val steps = (1 to bfsIters).map { i =>
      s"""h$i AS MATERIALIZED (SELECT x.seed, x.id, min(x.d) AS d FROM (
         |  SELECT seed, id, d FROM h${i - 1}
         |  UNION ALL SELECT h${i - 1}.seed, ue.dst AS id, h${i - 1}.d + 1
         |  FROM ue JOIN h${i - 1} ON ue.src = h${i - 1}.id) x GROUP BY x.seed, x.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |h0 AS MATERIALIZED (SELECT id AS seed, id, 0::BIGINT AS d FROM nn
       |                    WHERE id < 2000000000),
       |$steps
       |SELECT id, CAST(sum(1000000 // d) AS BIGINT) AS h FROM h$bfsIters
       |WHERE d > 0 GROUP BY id ORDER BY h DESC, id LIMIT 50""".stripMargin
  }

  // CC unroll (the ccOracle recurrence) + root-seeded BFS unroll (the
  // harmonicOracle recurrence, seeds = component minima) + the parity
  // join over the directed edge list. Same MATERIALIZED discipline.
  private lazy val bipartiteOracle: String = {
    val ccSteps = (1 to ccIters).map { i =>
      s"""c$i AS MATERIALIZED (SELECT x.id, min(x.comp) AS comp FROM (
         |  SELECT id, comp FROM c${i - 1}
         |  UNION ALL SELECT ue.dst AS id, c${i - 1}.comp
         |  FROM ue JOIN c${i - 1} ON ue.src = c${i - 1}.id) x GROUP BY x.id)"""
        .stripMargin
    }.mkString(",\n")
    val bfsSteps = (1 to bfsIters).map { i =>
      s"""b$i AS MATERIALIZED (SELECT x.seed, x.id, min(x.d) AS d FROM (
         |  SELECT seed, id, d FROM b${i - 1}
         |  UNION ALL SELECT b${i - 1}.seed, ue.dst AS id, b${i - 1}.d + 1
         |  FROM ue JOIN b${i - 1} ON ue.src = b${i - 1}.id) x GROUP BY x.seed, x.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |c0 AS MATERIALIZED (SELECT id, id AS comp FROM nn),
       |$ccSteps,
       |b0 AS MATERIALIZED (SELECT id AS seed, id, 0::BIGINT AS d
       |                    FROM c$ccIters WHERE id = comp),
       |$bfsSteps,
       |oe AS (SELECT du.seed, count(*) AS n_edges,
       |         sum(CASE WHEN (du.d + dv.d) % 2 = 0 THEN 1 ELSE 0 END) AS n_odd
       |       FROM e JOIN b$bfsIters du ON e.src = du.id
       |              JOIN b$bfsIters dv ON e.dst = dv.id
       |       GROUP BY du.seed),
       |comps AS (SELECT comp, count(*)::BIGINT AS n_nodes FROM c$ccIters GROUP BY comp)
       |SELECT comps.comp, n_nodes,
       |       COALESCE(oe.n_edges, 0)::BIGINT AS n_edges,
       |       COALESCE(oe.n_odd, 0)::BIGINT AS n_odd,
       |       COALESCE(oe.n_odd, 0) = 0 AS bipartite
       |FROM comps LEFT JOIN oe ON oe.seed = comps.comp""".stripMargin
  }

  /** SSSP source/bound. Weights are a deterministic symmetric function of
    * the endpoints — `1 + (src+dst) % 2` ∈ {1,2} — so both engines (and
    * the in-JVM Dijkstra replay) compute bit-identical integer distances
    * with no weight column materialized anywhere. Convergence bound: a
    * weighted shortest path costs ≤ 2×(hop distance) and every hop costs
    * ≥ 1, so no shortest path uses more than 2×(hop eccentricity) = 14
    * hops (BFS converges at 7), and Bellman–Ford relaxation fixes within
    * that many rounds; 16 = 14 + 2 margin, same discipline as ccIters. */
  private val ssspIters = 16

  // Unrolled Bellman–Ford relaxation, same MATERIALIZED discipline as
  // ccOracle/bfsOracle. Full relaxation per step (not delta) — same fixed
  // point, and steps past convergence are no-ops, so the engine's early
  // exit still matches.
  private lazy val ssspOracle: String = {
    val steps = (1 to ssspIters).map { i =>
      s"""s$i AS MATERIALIZED (SELECT x.id, min(x.d) AS d FROM (
         |  SELECT id, d FROM s${i - 1}
         |  UNION ALL SELECT ue.dst AS id, s${i - 1}.d + 1 + (ue.src + ue.dst) % 2
         |  FROM ue JOIN s${i - 1} ON ue.src = s${i - 1}.id) x GROUP BY x.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |s0 AS MATERIALIZED (SELECT CAST($bfsSrc AS BIGINT) AS id, CAST(0 AS BIGINT) AS d),
       |$steps
       |SELECT d AS dist, count(*) AS n FROM s$ssspIters GROUP BY d""".stripMargin
  }

  /** Personalized-PageRank iteration count. The restart set is the 5
    * region nodes and mass propagates over the REVERSED FK edges
    * (region→nation→customer/supplier→order→lineitem — the influence
    * direction; on the forward edges regions are sinks and PPR
    * degenerates to the seeds). 6 iterations reach the deepest stratum
    * (lineitems, 4 hops) with margin; like [[prIters]] this is a fixed
    * power-iteration count, not a convergence bound, and the oracle
    * unrolls exactly the same 6 steps. */
  private val pprIters = 6

  // Same recurrence as prOracle with two changes: the edge set is
  // reversed, and the teleport term is seed-conditional (regions are the
  // only ids below 2000000000 — GraphLoader's id-range scheme). All
  // int64, so every engine computes bit-equal ranks.
  private lazy val pprOracle: String = {
    val steps = (1 to pprIters).map { i =>
      s"""r$i AS MATERIALIZED (SELECT nn.id,
         |  CAST((CASE WHEN nn.id < 2000000000 THEN 150000000 ELSE 0 END)
         |       + (85 * coalesce(m$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(r${i - 1}.rank // od.d) AS BIGINT) AS s
         |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id
         |    JOIN od ON e.src = od.id GROUP BY e.dst) m$i ON nn.id = m$i.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e0 AS MATERIALIZED ($edgeSql),
       |e AS MATERIALIZED (SELECT dst AS src, src AS dst FROM e0),
       |od AS MATERIALIZED (SELECT src AS id, count(*) AS d FROM e GROUP BY src),
       |r0 AS MATERIALIZED (SELECT id,
       |  CAST(CASE WHEN id < 2000000000 THEN 1000000000 ELSE 0 END AS BIGINT) AS rank
       |  FROM nn),
       |$steps
       |SELECT id, rank FROM r$pprIters ORDER BY rank DESC, id LIMIT 100""".stripMargin
  }

  /** k-core peel: k and round bound. Fixpoint measured at 3 rounds
    * (sf0.001) / 5 (sf0.01, sf0.1) — the peel cascade depth follows the
    * FK-chain shape (customers with <k orders fall, then their
    * now-underdegree orders, …), which the schema fixes independent of
    * scale factor; 8 = 5 + 3 margin, same discipline as [[ccIters]].
    * k = 3 keeps a large non-trivial core (lineitem nodes have exactly
    * degree 3); k = 4 empties this graph entirely. */
  private val kcoreK = 3
  private val kcoreIters = 8

  /** One k-core peel round's edge filter — edges among the alive set.
    * Shared by the library g_kcore loop and the `call kcore()` bridge
    * (Engine) so BOTH ride the same gate: src side is a co-partitioned
    * semi join (zero exchange — edges arrive src-partitioned), dst side
    * broadcasts the alive ids only under the measured-count cell cap
    * ([[graft.Bcast]]); past it the hint drops and the join degrades to
    * its shuffled form — one extra |E| exchange, never an OOM. Exposed
    * private[graft] so PlanSpec can pin both shapes. */
  private[graft] def kcoreAliveFilter(edges: DataFrame, alive: DataFrame,
      nAlive: Long): DataFrame =
    edges.join(alive, col("src") === col("id"), "left_semi")
      .join(graft.Bcast.gated(alive.withColumnRenamed("id", "id2"), nAlive),
        col("dst") === col("id2"), "left_semi")

  // Unrolled peel, same MATERIALIZED discipline as ccOracle. a0 = every
  // node with at least one edge; each round keeps nodes with >= k
  // surviving neighbors; rounds past the fixpoint are no-ops, so the
  // engine's early exit still matches. Output = the in-core degree
  // histogram (every reported degree is >= k by construction).
  private lazy val kcoreOracle: String = {
    val steps = (1 to kcoreIters).map { i =>
      s"""a$i AS MATERIALIZED (SELECT u.src AS id FROM ue u
         |  JOIN a${i - 1} x ON u.src = x.id JOIN a${i - 1} y ON u.dst = y.id
         |  GROUP BY u.src HAVING count(*) >= $kcoreK)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |a0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM ue),
       |$steps,
       |fd AS (SELECT u.src AS id, count(*) AS c FROM ue u
       |  JOIN a$kcoreIters x ON u.src = x.id
       |  JOIN a$kcoreIters y ON u.dst = y.id GROUP BY u.src)
       |SELECT c AS core_degree, count(*) AS n_nodes FROM fd GROUP BY c""".stripMargin
  }

  // Resource-allocation link prediction over the SUPPORTED part
  // co-purchase graph: edges are pairs bought together in >= 2 distinct
  // orders (the association-rule support floor — a support-1
  // co-occurrence under near-uniform part assignment is noise, and the
  // floor is also what keeps exact RA tractable: it sparsifies the raw
  // graph from 1.2M edges / 148M wedges to 3.9k / 2.2k at sf0.1);
  // candidate pair (u,v) at distance 2, score = sum over common
  // neighbors w of floor(1e9 / deg(w)) — the RA index in integer
  // division, so the score is exact in any engine (no float log as in
  // Adamic–Adar). Existing edges are excluded; top-20 under the total
  // order (ra DESC, u, v).
  private lazy val linkpredOracle: String =
    """WITH po AS (SELECT DISTINCT x.l_orderkey AS ok, x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |pairs AS (SELECT a, b FROM po GROUP BY a, b HAVING count(*) >= 2),
      |adj AS (SELECT a AS w, b AS n FROM pairs UNION ALL SELECT b, a FROM pairs),
      |deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w),
      |wedge AS (SELECT x.n AS u, y.n AS v, x.w AS w
      |  FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n),
      |cand AS (SELECT u, v, w FROM wedge WHERE NOT EXISTS (
      |  SELECT 1 FROM pairs p WHERE p.a = wedge.u AND p.b = wedge.v)),
      |scored AS (SELECT u, v, CAST(sum(1000000000 // deg.d) AS BIGINT) AS ra
      |  FROM cand JOIN deg ON cand.w = deg.w GROUP BY u, v)
      |SELECT u, v, ra FROM scored ORDER BY ra DESC, u, v LIMIT 20""".stripMargin

  /** Unrolled deterministic random walks (the g_walks recurrence): at
    * each step the walker at `cur` moves to the neighbor minimizing the
    * integer hash h(cur, step, nb) — a per-(position, step) PRNG draw
    * that both engines compute bit-equally (multipliers sized so every
    * term stays far under int64 even with ANSI overflow checks). The
    * id tiebreak makes hash collisions deterministic too. */
  private def walksOracle(steps: Int): String = {
    val rounds = (1 to steps).map { i =>
      s"""w$i AS MATERIALIZED (SELECT start, nb AS cur FROM (
         |  SELECT w.start, adj.nb,
         |    row_number() OVER (PARTITION BY w.start
         |      ORDER BY (w.cur * 48271 + $i * 39916801 + adj.nb * 69621) % 1000000007,
         |               adj.nb) AS rn
         |  FROM w${i - 1} w JOIN adj ON w.cur = adj.cur) x WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH po AS (SELECT DISTINCT x.l_orderkey AS ok, x.l_partkey AS a, y.l_partkey AS b
       |  FROM lineitem x JOIN lineitem y
       |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
       |e AS (SELECT a, b FROM po GROUP BY a, b HAVING count(*) >= 2),
       |adj AS MATERIALIZED (SELECT a AS cur, b AS nb FROM e UNION ALL SELECT b, a FROM e),
       |w0 AS MATERIALIZED (SELECT DISTINCT cur AS start, cur FROM adj),
       |$rounds
       |SELECT cur AS endpoint, CAST(count(*) AS BIGINT) AS n
       |FROM w$steps GROUP BY cur""".stripMargin
  }

  /** The g_nodesim plan, UNCLOSED: (lazy result, the shared (o,p)
    * checkpoint the caller must drop after consuming). The distinct
    * (o,p) frame is checkpoint-shared across its three consumers (two
    * self-join sides + the degree table) and its count — one job that
    * both materializes the checkpoint and bounds |parts| for the
    * degree-table broadcast gates (VERDICT r16: the raw hints were the
    * last ungated data-scale broadcasts). Exposed private[graft] so
    * PlanSpec can pin the broadcast AND the past-the-cap SMJ shape. */
  private[graft] def nodesimUncached(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = Ckpt.deferredShared(s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct())
    val nLi = li.count()
    val d = li.groupBy("p").agg(count(lit(1)).as("d"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("inter"))
    val out = pairs
      .join(graft.Bcast.gated(
        d.select(col("p").as("u"), col("d").as("du")), nLi), Seq("u"))
      .join(graft.Bcast.gated(
        d.select(col("p").as("v"), col("d").as("dv")), nLi), Seq("v"))
      .select(col("u"), col("v"),
        expr("(1000000 * inter) div (du + dv - inter)").as("jac_ppm"),
        col("inter"))
      .orderBy(col("jac_ppm").desc, col("u"), col("v")).limit(100)
    (out, li)
  }

  private lazy val nodesimOracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |d AS (SELECT p, count(*) AS d FROM li GROUP BY p),
      |pairs AS (SELECT a.p AS u, b.p AS v, count(*) AS inter
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p)
      |SELECT u, v,
      |  CAST((1000000 * inter) // (du.d + dv.d - inter) AS BIGINT) AS jac_ppm,
      |  CAST(inter AS BIGINT) AS inter
      |FROM pairs JOIN d du ON pairs.u = du.p JOIN d dv ON pairs.v = dv.p
      |ORDER BY jac_ppm DESC, u, v LIMIT 100""".stripMargin

  /** Co-partitioned full-outer merge of an (id, d) accumulator with an
    * (id, d) delta — the delta's value wins on match, everything else
    * carries over. Both sides arrive hash-partitioned by id (groupBy /
    * previous merge outputs through [[Ckpt.eagerPartitioned]]), so the
    * merge re-shuffles NEITHER side — the 1-exchange-per-superstep shape
    * PlanSpec pins. Shared by the BFS and SSSP frontier loops. */
  /** Frontier-delta distance loop over a FULL key spine (round 18,
    * optimization guide §2.4/§1.2): `spine` carries every key the loop
    * can ever reach with `d` = 0 at the sources and NULL elsewhere, and
    * each superstep LEFT-joins the candidate frame onto it — the
    * deltaCC discipline generalized to the BFS/SSSP family.
    *
    * Why this replaces the old anti-join + full-outer-merge shape: a
    * FULL OUTER SortMergeJoin reports UnknownPartitioning (measured on
    * Spark 4.1, see PlanSpec "superstep spine left join"), so the old
    * merged `dists` checkpoint lost its placement and every subsequent
    * superstep RE-EXCHANGED the whole accumulated frame; and the merge
    * was a SECOND job + checkpoint per superstep on top of the probe.
    * A LEFT join keeps the left side's hash partitioning, so here each
    * superstep is exactly ONE job (the convergence-probe count, which
    * doubles as the deferred checkpoint's materialization — the deltaCC
    * rule), ONE checkpoint, and ONE exchange (the candidate
    * aggregation; the spine side is placed once at step 1 and never
    * re-shuffled). Iteration count and the result are UNCHANGED: the
    * probe counts exactly the rows the old anti-join (or, with
    * `improve`, the old improvement filter) produced, and unreached
    * spine rows just stay NULL until discovery — the returned frame
    * filters them out, matching the old accumulated frame row for row.
    *
    * `improve=false`: BFS semantics — a key is discovered once (the
    * frontier is the newly-reached set). `improve=true`: Bellman–Ford —
    * a smaller candidate re-enters the frontier (`cand < d`).
    *
    * At 100 TB the spine costs |keys| rows per superstep checkpoint —
    * the same asymptotics as the old accumulated frame once the search
    * saturates (and CC/LP/PR already carry full-|V| frames per
    * superstep) — in exchange for halving the per-superstep job count
    * and removing a full re-exchange of the accumulated state, the two
    * costs that scale with cluster scheduler latency and network. */
  private[graft] def frontierLoop(
      spine: DataFrame,
      keyCols: Seq[String],
      step: DataFrame => DataFrame,
      improve: Boolean,
      maxIters: Int,
      what: String,
      parts: Int): DataFrame = Ckpt.withShuffle(spine.sparkSession, parts) {
    // `parts` (round 19, guide §2): every per-superstep exchange —
    // the candidate aggregation, the spine's one-time placement — and
    // every checkpoint lands at this volume-derived count instead of
    // the session's core-count default. The loop-invariant edge frame
    // the `step` closure joins against was built OUTSIDE this flip at
    // compute width; only the (small) frontier side shuffles up to
    // meet it, so map parallelism over |E| is unchanged.
    var dists: DataFrame = spine
    var frontier: DataFrame = spine.filter(col("d").isNotNull)
    var prev: Option[DataFrame] = None
    var converged = false
    var stepN = 0
    val better =
      if (improve) col("cand").isNotNull &&
        (col("d").isNull || col("cand") < col("d"))
      else col("d").isNull && col("cand").isNotNull
    while (stepN < maxIters && !converged) {
      stepN += 1
      val cand = step(frontier)
      val joined = Ckpt.deferredPartitioned(dists.join(cand, keyCols, "left"))
      // the superstep's ONLY job: materializes the checkpoint AND is
      // the convergence probe
      converged = joined.filter(better).count() == 0L
      if (converged) Ckpt.drop(joined)
      else {
        dists = joined.select(
          keyCols.map(col) :+ when(better, col("cand")).otherwise(col("d")).as("d"): _*)
        frontier = joined.filter(better)
          .select(keyCols.map(col) :+ col("cand").as("d"): _*)
        prev.foreach(Ckpt.drop)
        prev = Some(joined)
      }
    }
    require(converged, s"$what not converged after $maxIters supersteps")
    dists.filter(col("d").isNotNull)
  }

  /** Multi-source BFS over an undirected, src-pre-partitioned edge
    * frame: returns the (lazy union of) per-LEVEL distance frames
    * (seed, id, d) — every reached (seed, id) at its minimal hop
    * distance. The round-19 third shape for the landmark family
    * (VERDICT r18 item 4), built on the BFS level property: a candidate
    * generated from level k lies at level k−1, k or k+1, never earlier,
    * so the "already discovered" exclusion needs only the LAST TWO
    * levels. The accumulated K·|V| frame is therefore never merged,
    * re-checkpointed or re-exchanged during the loop — the r18 shapes
    * paid one of those per superstep (full-outer merge + accumulated
    * checkpoint, measured 10.3 s at sf0.1; K·|V| spine checkpoint,
    * measured 2× worse still). Levels are disjoint co-partitioned
    * checkpoints (the message aggregation leaves cand hash-partitioned
    * by (seed,id), the anti-joins preserve it), so each superstep is
    * ONE exchange and ONE job (the probe count materializes the level
    * checkpoint), and total checkpoint volume across the whole run is
    * K·|V| rows once. The final union is consumed by the caller's
    * aggregate — one K·|V| exchange, once. */
  private[graft] def multiSourceBfsLevels(seeds: DataFrame, ue: DataFrame,
      maxIters: Int, parts: Int, what: String): DataFrame =
    Ckpt.withShuffle(seeds.sparkSession, parts) {
      var lvlPrev: Option[DataFrame] = None
      var lvl: DataFrame = Ckpt.eagerPartitioned(
        seeds.repartition(col("seed"), col("id")))
      val levels = List.newBuilder[DataFrame]
      levels += lvl
      var converged = false
      var step = 0
      while (step < maxIters && !converged) {
        step += 1
        val cand = ue.join(lvl, ue("src") === lvl("id"))
          .select(col("seed"), ue("dst").as("id"), (col("d") + 1).as("d"))
          .groupBy("seed", "id").agg(min("d").as("d"))
        val fresh = cand.join(lvl, Seq("seed", "id"), "left_anti")
        val next = Ckpt.deferredPartitioned(
          lvlPrev.fold(fresh)(p => fresh.join(p, Seq("seed", "id"), "left_anti")))
        converged = next.count() == 0L
        if (converged) Ckpt.drop(next)
        else {
          levels += next
          lvlPrev = Some(lvl)
          lvl = next
        }
      }
      require(converged, s"$what not converged after $maxIters supersteps")
      levels.result().reduce(_ unionByName _)
    }

  // ---- label propagation communities (round 15) ----------------------

  /** Synchronous LPA rounds — FIXED, not convergence-driven: synchronous
    * label propagation has no convergence guarantee (period-2 label
    * cycles persist — measured: a long churn tail of a few hundred
    * flip-flopping nodes at every SF), so "run to convergence" is not
    * well-defined and the fixed-round snapshot IS the semantics — the
    * same determinism stance as the fixed prIters PageRank. 6 rounds is
    * where the partition quality plateaus on this graph (measured
    * modularity of the snapshot: 0.31 at sf0.001, 0.41 at sf0.01, 0.40
    * at sf0.1; rounds beyond 6 only shuffle the residual churn tail). */
  private[operators] val lpIters = 6

  /** Synchronous label propagation (Raghavan et al. 2007,
    * arXiv:0709.2938) with two determinism/stability choices over the
    * literature's randomized formulation:
    *
    *   - DETERMINISTIC tie-break — (most-frequent, then smallest)
    *     label — where the paper breaks ties uniformly at random
    *     (an oracle-checkable replacement);
    *   - SELF-INCLUSION — each node's own label counts once alongside
    *     its neighbors' (the "label retention"/inertia variant). On
    *     this multipartite FK graph pure neighbor-mode LPA oscillates
    *     wholesale (same-type nodes never link, so star layers swap
    *     labels with their hubs every round — measured modularity of
    *     that snapshot is NEGATIVE at every SF); retention damps the
    *     oscillation to a small churn tail and the snapshot reaches
    *     modularity ≈ 0.4.
    *
    * Every node simultaneously adopts the (most-frequent, then
    * smallest) label of its closed neighborhood each round, for exactly
    * `iters` rounds; isolated nodes keep their own id label (singleton
    * communities).
    *
    * Scale shape per superstep: one (node,label) count shuffle over the
    * message stream (partial aggregation collapses duplicate labels
    * map-side — on a settled graph most messages carry the community
    * label, so the combiner does most of the work), then the argmax
    * re-key of the label-count frame (label-count-sized, ≤ one row per
    * distinct (node,label) — far below the edge stream once communities
    * form). The argmax is min(struct(-count, label)) — one aggregate,
    * no window, and it covers every node (the self-inclusion leg), so
    * no carry-over merge join is needed. Labels come out of the argmax
    * hash-partitioned by id, so the next round's message join against
    * the src-partitioned edge frame never re-exchanges either side. */
  def labelProp(nodes: DataFrame, undirected: DataFrame, iters: Int): DataFrame = {
    // NOT partition-shrunk (round 19): every round joins the FULL |V|
    // label frame against the compute-width edge frame — shrinking the
    // label side adds a full-|V| re-exchange per round to meet it
    // (measured on the bridge twin; r18 scaling ratio 1.12 —
    // volume-bound, unlike the frontier-delta loops).
    var labels = Ckpt.eagerPartitioned(
      nodes.select(col("id"), col("id").as("lbl")).repartition(col("id")))
    for (_ <- 1 to iters) {
      val msgs = undirected.join(labels, undirected("src") === labels("id"))
        .select(undirected("dst").as("id"), col("lbl"))
        .unionByName(labels) // self-inclusion: own label counts once
      val counts = msgs.groupBy("id", "lbl").agg(count(lit(1)).as("cnt"))
      val next = Ckpt.eagerPartitioned(
        counts.groupBy("id")
          .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("m"))
          .select(col("id"), col("m.l").as("lbl")))
      Ckpt.drop(labels)
      labels = next
    }
    labels
  }

  /** LPA labels memoized per (session, dir): g_labelprop and
    * g_modularity share the 6-round propagation. Same discipline as
    * [[ueFrames]] — the memoized frame is re-pinned OUTSIDE the drain
    * ledger (the loop's own final checkpoint is drained between
    * queries, so it must not be the cached handle) and evicted when its
    * session stops. */
  private val lpFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def lpaLabels(s: SparkSession, dir: String): DataFrame = memoLock.synchronized {
    lpFrames.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    lpFrames.getOrElseUpdate((s, dir), {
      val labels = labelProp(allNodes(s, dir), undirectedEdges(s, dir), lpIters)
      val out = Ckpt.pinned(labels)
      Ckpt.drop(labels)
      out
    })
  }

  /** Unrolled LPA steps for a DuckDB oracle: CTEs `l0..l{iters}` over
    * pre-bound `nn(id)` and `ue(src,dst)` CTEs. Every step references
    * its predecessor twice (messages + self-inclusion) — MATERIALIZED,
    * the ccOracle discipline. Shared by the library and call-bridge LPA
    * oracles (GraphOps parameterizes the edge set). */
  private[operators] def lpStepsSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (SELECT t.id, t.lbl FROM (
         |  SELECT c.id, c.lbl, row_number() OVER (
         |    PARTITION BY c.id ORDER BY c.cnt DESC, c.lbl) AS rn
         |  FROM (SELECT x.id, x.lbl, count(*) AS cnt FROM (
         |          SELECT ue.dst AS id, q.lbl
         |          FROM ue JOIN l${i - 1} q ON ue.src = q.id
         |          UNION ALL SELECT id, lbl FROM l${i - 1}) x
         |        GROUP BY x.id, x.lbl) c) t
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"l0 AS MATERIALIZED (SELECT id, id AS lbl FROM nn),\n$steps"
  }

  private lazy val lpOracle: String =
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |${lpStepsSql(lpIters)}
       |SELECT lbl AS comm, CAST(count(*) AS BIGINT) AS n
       |FROM l$lpIters GROUP BY lbl ORDER BY n DESC, comm LIMIT 20""".stripMargin

  // Modularity of the LPA partition — Q = Σ_c [e_c/m − (d_c/2m)²] where
  // m = |directed FK edges|, e_c = intra-community edges, d_c = total
  // (undirected) degree of community c. Computed as the exact integer
  // numerator qnum = Σ_c (4·m·e_c − d_c²) over denominator 4m², so the
  // aggregation is order-free int64 (fits: m ≈ 2.1M at sf0.1 → 4m² ≈
  // 1.8e13); only the final display value divides through double with
  // the identical expression on both sides (the PipeData discipline).
  private lazy val modularityOracle: String =
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |${lpStepsSql(lpIters)},
       |lab AS MATERIALIZED (SELECT id, lbl FROM l$lpIters),
       |ec AS (SELECT la.lbl, count(*) AS e_c FROM e
       |  JOIN lab la ON e.src = la.id JOIN lab lb ON e.dst = lb.id
       |  WHERE la.lbl = lb.lbl GROUP BY la.lbl),
       |dc AS (SELECT lab.lbl, count(*) AS d_c FROM ue
       |  JOIN lab ON ue.src = lab.id GROUP BY lab.lbl),
       |tot AS (SELECT (SELECT count(*) FROM e) AS m,
       |  CAST(sum(4 * (SELECT count(*) FROM e) * coalesce(ec.e_c, 0)
       |           - dc.d_c * dc.d_c) AS BIGINT) AS qnum
       |  FROM dc LEFT JOIN ec ON dc.lbl = ec.lbl)
       |SELECT CAST(m AS BIGINT) AS m, qnum,
       |       round(qnum / (4.0 * m * m), 6) AS modularity
       |FROM tot""".stripMargin

  /** Per-node triangle corner counts and degrees over the part
    * co-purchase graph (distinct part pairs sharing an order) — the
    * shared build behind g_triangles and g_clustering. Triangles are
    * enumerated with the DEGREE-ORDERED orientation: each undirected
    * edge points from its lower-(degree, id) endpoint to the higher, so
    * every triangle is produced exactly once and the wedge fan-out per
    * node is O(sqrt(m)) even on heavy hitters — the standard fix that
    * keeps the wedge-check join from exploding on hub nodes at 100 TB.
    * Both the wedge build side and the closing-edge semi side are the
    * |E|-sized oriented list — orders of magnitude smaller than the
    * wedge stream (41M wedges vs 1.2M edges at sf0.1). Broadcasting
    * them means the wedge stream is generated, existence-checked, and
    * partially aggregated IN PLACE: zero shuffle/sort of the 41M rows
    * (it previously cost two 41M-row exchanges + sorts). The hints are
    * GATED on the measured pair count ([[graft.Bcast]], VERDICT r15):
    * the pair frame is cached and counted once up front (the count also
    * pays for itself — every downstream leg used to re-derive the pair
    * self-join), and on a graph whose edge list outgrows the cap the
    * hints are absent — the plan degrades to the SMJ form, still
    * correct, never an executor-OOM broadcast, and the degree
    * orientation still bounds the per-task wedge fan-out (PlanSpec pins
    * BOTH shapes). The oracles enumerate by id order instead; the
    * triangle SET is identical under any acyclic orientation, so the
    * per-node counts agree.
    *
    * Returns (triCounts id→n_tri over participating nodes only,
    * degrees id→d over every node of the pair graph), memoized per
    * (session, dir) as pinned checkpoints. */
  private val triFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]

  private def coPurchaseTriangles(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    memoLock.synchronized {
      triFrames.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      triFrames.getOrElseUpdate((s, dir), {
        val (tc, deg, cached) = coPurchaseTrianglesUncached(s, dir)
        // pin the |V|-scale outputs (drain-safe, session-lifetime), then
        // release the |E|-scale intermediates immediately — a raw cache
        // would otherwise pin edge-scale frames per query for the
        // session's lifetime
        val out = (Ckpt.pinned(tc), Ckpt.pinned(deg))
        cached.foreach(_.unpersist(false))
        out
      })
    }

  /** Returns (triangle counts, degrees, |E|-scale cached intermediates
    * the caller must unpersist once the outputs are materialized). */
  private[graft] def coPurchaseTrianglesUncached(
      s: SparkSession, dir: String): (DataFrame, DataFrame, Seq[DataFrame]) = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // cached + counted up front: the count feeds the broadcast gates
    // below AND every downstream leg (deg build, orientation join) used
    // to re-derive this self-join from storage
    val pairs = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct().cache()
    val m = pairs.count()
    // degree table is |V|-sized (parts, not pairs) — broadcast under
    // the gate, so the two endpoint-degree lookups never shuffle the
    // edge list. MATERIALIZED once and gated on its MEASURED count
    // (round 17): the old |V| ≤ 2·|E| bound was ~100× the real |V|
    // here, and under the cell-denominated cap that slack started
    // degrading a 20k-row broadcast to an |E|-scale SMJ at sf0.1; an
    // unmaterialized deg would re-run the aggregation for the count,
    // both join sides and the memo pin (the Engine twin's ADVICE-r16
    // discipline). The checkpoint rides the drain ledger; the memoized
    // wrapper pins its own session-lifetime copy.
    val deg = graft.Ckpt.eager(
      pairs.select(col("a").as("id"))
        .union(pairs.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d")))
    val nDeg = deg.count()
    val keyed = pairs
      .join(Bcast.gated(deg.select(col("id").as("a"), col("d").as("da")), nDeg), Seq("a"))
      .join(Bcast.gated(deg.select(col("id").as("b"), col("d").as("db")), nDeg), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = keyed.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst")).cache()
    val wedgeOrder = col("e1.ddst") < col("e2.ddst") ||
      (col("e1.ddst") === col("e2.ddst") && col("e1.dst") < col("e2.dst"))
    val tri = o.as("e1")
      .join(Bcast.gated(o.as("e2"), m), col("e1.src") === col("e2.src") && wedgeOrder)
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(Bcast.gated(o.select(col("src").as("v"), col("dst").as("w")), m),
        Seq("v", "w"), "left_semi")
    val tc = tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    (tc, deg, Seq(o, pairs))
  }

  // ---- HITS hubs & authorities (round 15) -----------------------------
  private val hitsIters = 8

  /** Unrolled HITS (Kleinberg 1999) in max-normalized 1e6 fixed point:
    * auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} auth(v), each phase
    * rescaled to max = 1e6 by integer division — every engine computes
    * bit-equal scores (the float L2 normalization of the textbook
    * formulation is replaced by the deterministic max rescale; the
    * RANKING is the same, which is what HITS is for). Overflow bound:
    * raw sums ≤ max-degree × 1e6 and the rescale multiplies by 1e6
    * before dividing, so the intermediate fits int64 while max-degree
    * < 9.2e6 — three orders above this corpus' hubs; at a scale beyond
    * that, rescale with a 1e3 factor or decimal(38). */
  /** Unrolled HITS steps for a DuckDB oracle: CTE chains `ar/a/hr/h
    * 1..iters` over pre-bound `nn(id)` and `e(src,dst)` CTEs plus
    * `h0(id, hub)`. `greatest(1, max)` guards the all-zero frame an
    * empty (relation-scoped) edge set produces — scores stay 0 instead
    * of dividing by zero, matching the engine's max(1L, …) guard.
    * Shared by the library and call-bridge oracles (GraphOps
    * parameterizes the edge set). */
  private[operators] def hitsStepsSql(iters: Int): String =
    (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT nn.id, CAST(coalesce(m.s, 0) AS BIGINT) AS r
         |  FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(h${i - 1}.hub) AS BIGINT) AS s
         |    FROM e JOIN h${i - 1} ON e.src = h${i - 1}.id GROUP BY e.dst) m
         |  ON nn.id = m.id),
         |a$i AS MATERIALIZED (SELECT id,
         |  CAST((r * 1000000) // greatest(1, (SELECT max(r) FROM ar$i)) AS BIGINT) AS auth
         |  FROM ar$i),
         |hr$i AS MATERIALIZED (SELECT nn.id, CAST(coalesce(m.s, 0) AS BIGINT) AS r
         |  FROM nn LEFT JOIN (
         |    SELECT e.src AS id, CAST(sum(a$i.auth) AS BIGINT) AS s
         |    FROM e JOIN a$i ON e.dst = a$i.id GROUP BY e.src) m
         |  ON nn.id = m.id),
         |h$i AS MATERIALIZED (SELECT id,
         |  CAST((r * 1000000) // greatest(1, (SELECT max(r) FROM hr$i)) AS BIGINT) AS hub
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")

  private lazy val hitsOracle: String =
    s"""WITH nn AS MATERIALIZED ($nodeSql),
       |e AS MATERIALIZED ($edgeSql),
       |h0 AS MATERIALIZED (SELECT id, 1000000::BIGINT AS hub FROM nn),
       |${hitsStepsSql(hitsIters)}
       |SELECT a.id, a.auth, h.hub
       |FROM a$hitsIters a JOIN h$hitsIters h ON a.id = h.id
       |ORDER BY a.auth DESC, a.id LIMIT 20""".stripMargin

  // Local clustering coefficient over the part co-purchase graph:
  // coeff(v) = 2·tri(v) / (d(v)·(d(v)−1)) for d ≥ 2, in parts-per-
  // million integer division so the ranking is engine-exact. The
  // triangle corner counts and degrees are the same frames g_triangles
  // builds (shared helper).
  private lazy val clusteringOracle: String =
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
      |        FROM pairs e1 JOIN pairs e2 ON e1.b = e2.a
      |        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
      |corners AS (SELECT unnest([u, v, w]) AS id FROM tri),
      |tc AS (SELECT id, count(*) AS n_tri FROM corners GROUP BY id),
      |deg AS (SELECT id, count(*) AS d FROM
      |  (SELECT a AS id FROM pairs UNION ALL SELECT b FROM pairs) x GROUP BY id)
      |SELECT deg.id, CAST(deg.d AS BIGINT) AS d,
      |       CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
      |       CAST((2000000 * coalesce(tc.n_tri, 0)) // (deg.d * (deg.d - 1))
      |            AS BIGINT) AS coeff_ppm
      |FROM deg LEFT JOIN tc ON deg.id = tc.id
      |WHERE deg.d >= 2
      |ORDER BY coeff_ppm DESC, n_tri DESC, deg.id LIMIT 20""".stripMargin

  val all: List[Q] = List(

    // ---- weighted single-source shortest paths (Bellman–Ford delta) ---
    // The weighted counterpart of g_bfs over the same shared undirected
    // frame: distance-improvement delta iteration (a node re-enters the
    // frontier every time its distance DROPS — unlike BFS, weighted
    // relaxation can improve a settled node, so the frontier is the
    // improved set, not the newly-discovered set). Per superstep: one
    // relax shuffle (groupBy dst) and one co-partitioned full-outer merge
    // — dists stays hash-partitioned by id across steps, so the merge
    // never re-shuffles the accumulated distance frame. Early exit +
    // loud non-convergence, checkpoint-per-superstep, exactly the CC/BFS
    // discipline; at 100 TB this is the standard iterative SSSP shape
    // (Pregel/Flink delta iteration), message volume ∝ improvements.
    Q("g_sssp",
      (s, dir) => {
        // One-job-per-superstep spine loop (round 18 — see
        // [[frontierLoop]] for why this replaced the anti-join +
        // full-outer-merge shape): improve=true is the Bellman–Ford
        // frontier — a settled node re-enters when its distance drops.
        val ue = undirectedEdges(s, dir)
        val spine = allNodes(s, dir)
          .select(col("id"), when(col("id") === bfsSrc, 0L).as("d"))
        val dists = frontierLoop(spine, Seq("id"),
          f => ue.join(f, ue("src") === f("id"))
            .select(ue("dst").as("id"),
              (col("d") + lit(1L) + (ue("src") + ue("dst")) % 2).as("cand"))
            .groupBy("id").agg(min("cand").as("cand")),
          improve = true, ssspIters, "SSSP", nodeParts(s, dir))
        dists.groupBy(col("d").as("dist")).agg(count(lit(1)).as("n"))
      },
      Some(ssspOracle)),

    // ---- single-source BFS: frontier delta iteration ------------------
    // Hop-distance histogram from region 0 over the undirected FK graph
    // — the reachability/radius probe you run on an unknown graph after
    // degree_dist. Pure frontier propagation: only nodes whose distance
    // IMPROVED last superstep send messages (a node's distance can only
    // be set once in unweighted BFS, so the frontier is exactly the
    // newly-discovered set — message volume is each BFS level once,
    // sum |V| total, not |V|×diameter). Same pre-partitioned invariant
    // edge frame, checkpoint-per-superstep, and early-exit + loud
    // non-convergence discipline as the CC delta iteration.
    Q("g_bfs",
      (s, dir) => {
        // One-job-per-superstep spine loop (round 18 — see
        // [[frontierLoop]]): the frontier is exactly the newly-
        // discovered set, message volume each BFS level once.
        val ue = undirectedEdges(s, dir)
        val spine = allNodes(s, dir)
          .select(col("id"), when(col("id") === bfsSrc, 0L).as("d"))
        val dists = frontierLoop(spine, Seq("id"),
          f => ue.join(f, ue("src") === f("id"))
            .select(ue("dst").as("id"), (col("d") + 1).as("cand"))
            .groupBy("id").agg(min("cand").as("cand")),
          improve = false, bfsIters, "BFS", nodeParts(s, dir))
        dists.groupBy(col("d").as("dist")).agg(count(lit(1)).as("n"))
      },
      Some(bfsOracle)),

    // ---- landmark harmonic centrality: multi-source BFS ----------------
    // Approximate harmonic centrality ĥ(v) = Σ_{s ∈ L} 1/d(s,v) from a
    // SMALL deterministic landmark set L (the 5 region hubs — ids below
    // 2000000000, the loader's id-range scheme), the standard
    // cluster-scale stand-in for exact closeness/harmonic centrality:
    // exact needs all-pairs distances (O(|V|·(|V|+|E|)) BFS work — dead
    // at 100 TB), landmarks need K frontier BFS passes with total
    // message volume K·|V|, and ranking quality degrades gracefully
    // with K (Potamias et al., "Fast Shortest Path Distance Estimation
    // in Large Networks"). ONE multi-source pass: the frontier carries
    // a seed column, so all K BFS trees advance in the SAME superstep
    // joins — K× messages per superstep, not K passes over the graph.
    // 1/d in 1e-6 fixed point (integer div) keeps the sum order-free
    // and bit-equal cross-engine; top-50 with id tiebreak makes the
    // cut deterministic. Same frontier-delta discipline as g_bfs:
    // newly-discovered (seed,id) pairs only, co-partitioned merge,
    // checkpoint-per-superstep, early exit + loud non-convergence.
    Q("g_harmonic_landmarks",
      (s, dir) => {
        // Round 19: per-LEVEL multi-source BFS ([[multiSourceBfsLevels]]
        // — the BFS level property bounds the seen-set anti-join to the
        // last two levels), replacing the accumulated anti-join +
        // full-outer-merge shape that re-checkpointed the growing
        // K·|V| frame every superstep. Result unchanged: the union of
        // disjoint levels is exactly the old accumulated frame.
        val ue = undirectedEdges(s, dir)
        val seeds = allNodes(s, dir).filter(col("id") < 2000000000L)
          .select(col("id").as("seed"), col("id"), lit(0L).as("d"))
        val nSeeds = seeds.count()
        val dists = multiSourceBfsLevels(seeds, ue, bfsIters,
          Ckpt.partsFor(s, nSeeds * graphScale(s, dir)._1), "landmark BFS")
        dists.filter(col("d") > 0)
          .groupBy("id").agg(sum(expr("1000000 div d")).as("h"))
          .orderBy(col("h").desc, col("id")).limit(50)
      },
      Some(harmonicOracle)),

    // ---- bipartiteness: per-component BFS 2-coloring ------------------
    // Is the graph layered the way the schema claims? A graph is
    // bipartite iff no edge joins two nodes at the SAME PARITY of BFS
    // depth from their component's root — the classic odd-cycle
    // witness, and the first sanity probe on a supposedly-layered
    // 100 TB graph (user–item, doc–shard, FK trees) before any
    // bipartite-only algorithm (alternating matching, two-mode
    // projection) is let loose on it. Plan: one deltaCC (shared
    // discipline), then ONE root-seeded BFS pass — seeds are each
    // component's minimum node (= its CC label), and since components
    // partition the nodes, every node is reached by exactly one seed:
    // total message volume is |V|, NOT seeds×|V| (contrast
    // g_harmonic_landmarks, whose K trees overlap). The parity check
    // is then a single broadcast-free 3-way equi-join of the DIRECTED
    // edge list against the distance frame. Output: per component —
    // size, odd-parity edge count, bipartite verdict.
    Q("g_bipartite",
      (s, dir) => {
        // One-job-per-superstep spine loop (round 18 — [[frontierLoop]]):
        // the spine here is the CC labels frame itself — components
        // partition the nodes, so (comp, id) enumerates exactly the
        // (seed, id) pairs the root-seeded BFS can ever reach: the spine
        // is |V| rows, not seeds×|V|, and no cross join is needed.
        val ue = undirectedEdges(s, dir)
        val nodes = allNodes(s, dir)
        val (labels, _) = deltaCC(nodes, ue, ccIters, nodeParts(s, dir))
        val spine = labels.select(col("comp").as("seed"), col("id"),
          when(col("id") === col("comp"), 0L).as("d"))
        val dists = frontierLoop(spine, Seq("seed", "id"),
          f => ue.join(f, ue("src") === f("id"))
            .select(col("seed"), ue("dst").as("id"), (col("d") + 1).as("cand"))
            .groupBy("seed", "id").agg(min("cand").as("cand")),
          improve = false, bfsIters, "root BFS", nodeParts(s, dir))
        // parity check over each DIRECTED edge (one row per edge, no
        // reciprocal double-count); the edge's component = its src's seed
        val du = dists.select(col("seed"), col("id").as("src"), col("d").as("ds"))
        val dv = dists.select(col("id").as("dst"), col("d").as("dt"))
        val odd = allEdges(s, dir).join(du, "src").join(dv, "dst")
          .groupBy("seed")
          .agg(count(lit(1)).as("n_edges"),
            sum(when((col("ds") + col("dt")) % 2 === 0, 1L).otherwise(0L)).as("n_odd"))
        labels.groupBy(col("comp")).agg(count(lit(1)).as("n_nodes"))
          .join(odd, labels("comp") === odd("seed"), "left")
          .select(col("comp"), col("n_nodes"),
            coalesce(col("n_edges"), lit(0L)).as("n_edges"),
            coalesce(col("n_odd"), lit(0L)).as("n_odd"),
            (coalesce(col("n_odd"), lit(0L)) === 0L).as("bipartite"))
      },
      Some(bipartiteOracle)),

    // ---- connected components: delta min-label propagation ------------
    Q("g_connected_components",
      (s, dir) => {
        // Pre-partitioned loop-invariant edge frame, built once per
        // (session, dir) and SHARED with g_bfs — each superstep's join
        // only shuffles the (small) labels side, and the 2×|E| build
        // shuffle is paid once per session, not once per operator.
        val (labels, _) = deltaCC(allNodes(s, dir), undirectedEdges(s, dir), ccIters,
          nodeParts(s, dir))
        labels.groupBy("comp").agg(count(lit(1)).as("n"))
      },
      Some(ccOracle)),

    // ---- connected components: alternating large-star/small-star ------
    // The 100 TB CC algorithm (Kiveris et al., "Connected Components in
    // MapReduce and Beyond"): instead of propagating labels along edges
    // (rounds ~ graph diameter), each round REWIRES the edge set itself
    // — large-star hangs every larger neighbor under the neighborhood
    // minimum, small-star recompresses the rest — converging in
    // O(log n) rounds on ANY graph shape to stars rooted at component
    // minima. Same fixed point as min-label propagation, so the same
    // unrolled oracle applies; PipelineSpec additionally pins star ≡
    // delta-iteration equality. Each round is two groupBy+join passes
    // over the current edge set (shrinking fast), with the same
    // checkpoint-per-round lineage discipline as the delta iteration.
    Q("g_connected_components_star",
      (s, dir) => {
        val (comp, _) = starCC(allNodes(s, dir), allEdges(s, dir), maxRounds = 8)
        comp.groupBy("comp").agg(count(lit(1)).as("n"))
      },
      Some(ccOracle)),

    // ---- PageRank: 8 fixed-point power iterations ---------------------
    Q("g_pagerank",
      (s, dir) => fixedPageRank(s, dir)
        .orderBy(col("rank").desc, col("id")).limit(100),
      Some(prOracle)),

    // ---- degree distribution: the graph-shape diagnostic ---------------
    // Two cheap shuffles (degree per node, then histogram) — the first
    // thing you compute on an unknown 100 TB graph, because it tells you
    // whether the skew handling (salting, hub splitting) is needed at
    // all. Out-degree only; nodes with no outgoing edge don't appear
    // (region/part/tag rows — consistent with the oracle's GROUP BY).
    Q("g_degree_dist",
      (s, dir) => allEdges(s, dir)
        .groupBy(col("src")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes")),
      Some(s"""WITH e AS ($edgeSql),
              |d AS (SELECT src, count(*) AS degree FROM e GROUP BY src)
              |SELECT degree, count(*) AS n_nodes FROM d GROUP BY degree""".stripMargin)),

    // ---- degree assortativity (round 12) -------------------------------
    // Pearson correlation of endpoint TOTAL degrees over the FK edge
    // list — the classic one-number answer to "do hubs attach to hubs?"
    // (strongly negative here: the graph is a star-of-stars, every
    // high-degree dimension node fed by degree-3 lineitems). All six
    // moments are EXACT int64 sums (degrees are ints, map-side combined;
    // one |V|-sized degree table joined on each endpoint — two keyed
    // shuffles, nothing quadratic), and only the final Pearson formula
    // divides through double with the IDENTICAL expression in the
    // oracle, so the 6-dp result is bit-stable cross-engine.
    Q("g_assortativity",
      (s, dir) => {
        val e = allEdges(s, dir)
        val deg = e.select(col("src").as("id"))
          .unionByName(e.select(col("dst").as("id")))
          .groupBy("id").agg(count(lit(1)).as("d"))
        val xy = e
          .join(deg.select(col("id").as("src"), col("d").as("x")), Seq("src"))
          .join(deg.select(col("id").as("dst"), col("d").as("y")), Seq("dst"))
        val n = col("n").cast("double")
        xy.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
          .select(col("n"),
            round((n * col("sxy") - col("sx").cast("double") * col("sy")) /
              (sqrt(n * col("sxx") - col("sx").cast("double") * col("sx")) *
                sqrt(n * col("syy") - col("sy").cast("double") * col("sy"))), 6)
              .as("assortativity"))
      },
      Some(s"""WITH e AS ($edgeSql),
              |deg AS (SELECT id, count(*) AS d FROM (
              |          SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
              |        GROUP BY id),
              |xy AS (SELECT dx.d AS x, dy.d AS y FROM e
              |       JOIN deg dx ON e.src = dx.id
              |       JOIN deg dy ON e.dst = dy.id),
              |agg AS (SELECT count(*) AS n,
              |          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |          CAST(sum(x*y) AS BIGINT) AS sxy,
              |          CAST(sum(x*x) AS BIGINT) AS sxx,
              |          CAST(sum(y*y) AS BIGINT) AS syy
              |        FROM xy)
              |SELECT n, round((n::DOUBLE * sxy - sx::DOUBLE * sy) /
              |  (sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx) *
              |   sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)), 6) AS assortativity
              |FROM agg""".stripMargin)),

    // ---- triangle counting over the part co-purchase graph ------------
    // Edges = distinct part pairs that share an order (the classic
    // projected co-occurrence graph); enumeration/orientation/broadcast
    // reasoning in [[coPurchaseTriangles]] (shared with g_clustering).
    // Output: top-20 parts by triangle participation.
    Q("g_triangles",
      (s, dir) => {
        val (tc, _) = coPurchaseTriangles(s, dir)
        tc.orderBy(col("n_tri").desc, col("id")).limit(20)
      },
      Some("""WITH pairs AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             |  FROM lineitem x JOIN lineitem y
             |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
             |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
             |        FROM pairs e1 JOIN pairs e2 ON e1.b = e2.a
             |        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
             |corners AS (SELECT unnest([u, v, w]) AS id FROM tri)
             |SELECT id, count(*) AS n_tri FROM corners
             |GROUP BY id ORDER BY n_tri DESC, id LIMIT 20""".stripMargin)),

    // ---- GraphX integration: connectedComponents, oracle-checked ------
    // Unlike PageRank (float math, rows-only), GraphX CC propagates min
    // vertex ids — exact integers — and our DataFrame CC's labels are
    // also min ids, so BOTH implementations and the DuckDB unrolled
    // oracle must agree bit-for-bit on (comp, n). A genuinely
    // hash-verified library integration: Pregel-on-RDD vs delta
    // iteration-on-DataFrame vs recursive SQL, one answer.
    Q("g_cc_graphx",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        val ccGraph = gxGraph(s, dir).connectedComponents()
        // fromEdges only materializes edge endpoints; nodes with no FK
        // edge at all (possible: a part no lineitem references) are
        // their own singleton components — restore them with a left
        // join so the oracle's full-vertex-set semantics hold.
        val out = Ckpt.eager(
          allNodes(s, dir)
            .join(ccGraph.vertices.toDF("id", "comp"), Seq("id"), "left")
            .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
            .groupBy("comp").agg(count(lit(1)).as("n")))
        ccGraph.unpersist(blocking = false)
        out
      },
      Some(ccOracle)),

    // ---- GraphX integration: staticPageRank over the same edges -------
    // GraphX does its own double-precision math (not cross-engine
    // reproducible value-for-value), so — like the sketch ops — the
    // entry emits a BOUND CERTIFICATE instead of raw ranks: GraphX's
    // ranks are compared vertex-by-vertex against the fixed-point
    // DataFrame PageRank (whose top-100 is hash-pinned by g_pagerank's
    // own oracle), and the output is (n_vertices, n_agree). Both
    // implementations compute the same simplified recurrence
    // (r = 0.15 + 0.85·Σ contribs, dangling mass dropped, r0 = 1), but
    // GraphX NORMALIZES its final ranks to sum to |V|, so the check
    // first derives the single global scale factor from the matched
    // sums and then requires every vertex to sit within a SHAPE-DERIVED
    // relative gate of frank·scale — one scalar cannot absorb a
    // semantic divergence (wrong iteration count, dangling handling,
    // vertex set), only the uniform normalization it exists to model.
    // Gate derivation (ADVICE r05: a flat 1e-4 ignores truncation
    // ACCUMULATION): each integer contribution `rank // outdeg`
    // truncates up to one 1e-9 unit, so a vertex of in-degree d can
    // accumulate ≤ d·1e-9 absolute error per iteration; over prIters
    // iterations with a 2× propagation margin and ranks ≥ 0.15, the
    // relative bound is maxInDeg·1e-9·prIters·2/0.15 — computed from
    // THIS graph, floored at 1e-4, so the certificate stays sound at
    // scale factors where hub in-degrees reach 1e4+ instead of silently
    // reading as a correctness failure. Vertices absent from GraphX's
    // edge-built graph (isolated nodes) must hold frank = 0.15 exactly
    // — reconciled, not skipped. The oracle predicts the certificate
    // exactly: n_agree = n_vertices. (VERDICT r04 item 5: was
    // rows-only, scored as err.)
    Q("g_pagerank_graphx",
      (s, dir) => {
        val sp = s
        import sp.implicits._
        val prGraph = gxGraph(s, dir).staticPageRank(prIters)
        val gx = prGraph.vertices.toDF("gid", "grank")
        val fixed = fixedPageRank(s, dir)
          .select(col("id"), (col("rank").cast("double") / 1e9).as("frank"))
        val joined = fixed.join(gx, col("id") === col("gid"), "left")
          .select(col("frank"), col("grank"))
        val scale = joined
          .agg((sum(when(col("grank").isNotNull, col("grank"))) /
                sum(when(col("grank").isNotNull, col("frank")))).as("scale"))
        val gate = allEdges(s, dir).groupBy(col("dst")).agg(count(lit(1)).as("d"))
          .agg(greatest(lit(1e-4),
            max(col("d")).cast("double") * lit(1e-9) * prIters * 2 / 0.15).as("gate"))
        val out = Ckpt.eager(
          joined.crossJoin(broadcast(scale)).crossJoin(broadcast(gate))
            .agg(count(lit(1)).as("n_vertices"),
              sum(when(
                when(col("grank").isNotNull,
                  abs(col("grank") - col("frank") * col("scale")) <=
                    col("gate") * col("frank") * col("scale"))
                  .otherwise(col("frank") === 0.15),
                1L).otherwise(0L)).as("n_agree")))
        prGraph.unpersist(blocking = false)
        out
      },
      Some(s"""WITH nn AS ($nodeSql)
              |SELECT count(*) AS n_vertices, count(*) AS n_agree
              |FROM nn""".stripMargin)),

    // ---- personalized PageRank from the region seed set ---------------
    // Same 1-exchange-per-superstep power iteration as g_pagerank (fused
    // edge+outdeg invariant frame, id-pre-partitioned node frame, the
    // contribution aggregation as the only per-step shuffle) with two
    // changes: mass flows over the REVERSED FK edges (the influence
    // direction — see pprIters) and the teleport term lands only on the
    // seeds. Contributions are additionally restricted to rank > 0 rows
    // — a zero rank contributes exactly 0 to every sum, so the result is
    // bit-identical while message volume tracks the REACHED set, not
    // |V|: the sparsity win that makes PPR far cheaper than global
    // PageRank on a 100 TB graph when the seed neighborhood is small.
    Q("g_ppr",
      (s, dir) => {
        val rev = allEdges(s, dir)
          .select(col("dst").as("src"), col("src").as("dst"))
        val outdeg = rev.groupBy(col("src")).agg(count(lit(1)).as("d"))
        val ed = Ckpt.eagerPartitioned(
          rev.join(outdeg, Seq("src")).repartition(col("src")))
        // Round 19 (guide §2): |V|-scale side at volume-derived
        // partitions, `ed` at compute width — the fixedPageRank shape.
        Ckpt.withShuffle(s, nodeParts(s, dir)) {
        val nodes = Ckpt.eagerPartitioned(
          allNodes(s, dir).repartition(col("id")))
        val isSeed = col("id") < 2000000000L
        var ranks = nodes.select(col("id"),
          when(isSeed, 1000000000L).otherwise(0L).as("rank"))
        var prev: DataFrame = null
        for (i <- 1 to pprIters) {
          val contribs = ed
            .join(ranks.filter(col("rank") > 0).withColumnRenamed("id", "src"),
              Seq("src"))
            .select(col("dst").as("id"), expr("rank div d").as("c"))
            .groupBy("id").agg(sum("c").as("s"))
          ranks = nodes.join(contribs, Seq("id"), "left")
            .select(col("id"),
              (when(isSeed, 150000000L).otherwise(0L) +
                expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
          if (i % 3 == 0 && i < pprIters) {
            ranks = Ckpt.eagerPartitioned(ranks)
            if (prev != null) Ckpt.drop(prev)
            prev = ranks
          }
        }
        val out = Ckpt.eager(
          ranks.orderBy(col("rank").desc, col("id")).limit(100))
        if (prev != null) Ckpt.drop(prev)
        Ckpt.drop(ed)
        Ckpt.drop(nodes)
        out
        }
      },
      Some(pprOracle)),

    // ---- k-core decomposition: iterative peel -------------------------
    // The density-based graph-cleaning primitive (spam/noise stripping
    // before community detection at 100 TB). Each round: degrees over
    // the surviving edge set (one co-partitioned groupBy — edges stay
    // src-partitioned the whole loop), keep nodes with >= k neighbors,
    // then filter edges to alive×alive — the src side via a
    // co-partitioned semi join (zero exchange), the dst side via a
    // broadcast semi join GATED on the measured alive count
    // ([[graft.Bcast]] — the count is the round's convergence probe, so
    // the gate is free; past the cell cap the hint drops and the join
    // degrades to its shuffled form — one extra |E| exchange per round,
    // still correct, never an OOM). Early exit on an unchanged alive count (the
    // peel is monotone ⊇, so count equality ⟺ set equality) with the
    // usual loud non-convergence failure; the deferred checkpoint's
    // count doubles as the convergence probe (one job per round).
    Q("g_kcore",
      (s, dir) => {
        val ue = undirectedEdges(s, dir)
        var edges: DataFrame = ue
        var nAlive = -1L
        var converged = false
        var step = 0
        var result: DataFrame = null
        while (step < kcoreIters && !converged) {
          step += 1
          val deg = edges.groupBy("src").agg(count(lit(1)).as("c"))
          val alive = Ckpt.deferredPartitioned(
            deg.filter(col("c") >= kcoreK).select(col("src").as("id")))
          val n = alive.count()
          if (n == nAlive) {
            converged = true
            // deg this round is over edges among the PREVIOUS alive set,
            // which just proved equal to the current one — so these are
            // exactly the in-core degrees the oracle's fd computes.
            result = Ckpt.eager(
              deg.filter(col("c") >= kcoreK)
                .groupBy("c").agg(count(lit(1)).as("n_nodes"))
                .select(col("c").as("core_degree"), col("n_nodes")))
            Ckpt.drop(alive)
          } else {
            nAlive = n
            // dst side rides the measured-count gate (VERDICT r16): the
            // first peel rounds' alive set is |V|-scale, and a 3-core
            // past the cell cap must degrade to the shuffled semi join
            // instead of OOM-broadcasting a multi-GB id set.
            val next = Ckpt.eagerPartitioned(kcoreAliveFilter(edges, alive, n))
            if (edges ne ue) Ckpt.drop(edges)
            edges = next
            Ckpt.drop(alive)
          }
        }
        if (edges ne ue) Ckpt.drop(edges)
        require(converged, s"k-core peel not converged after $kcoreIters rounds")
        result
      },
      Some(kcoreOracle)),

    // ---- resource-allocation link prediction over part co-purchase ----
    // "Parts bought together with the same third part, but never
    // together themselves" — the classic RA index, in integer division
    // (1e9 div deg) so scores are engine-exact (Adamic–Adar's 1/log d
    // would need float ln). The edge set carries the association-rule
    // SUPPORT FLOOR (>= 2 distinct co-orders): support-1 co-occurrence
    // under near-uniform part assignment is noise, and the floor is the
    // lever that keeps exact RA tractable at any scale — it cut the raw
    // sf0.1 graph from 1.2M edges / 148M wedges (56 s measured, all in
    // the (u,v) aggregation) to 3.9k / 2.2k. Plan shape: the supported
    // adjacency, the degree table and the exclusion edge list are tiny
    // and broadcast UNDER THE MEASURED-COUNT GATE ([[graft.Bcast]],
    // VERDICT r15 — fed by one cheap count of the already-checkpointed
    // pair frame; past the cap the hints drop and the joins degrade to
    // SMJ, correct and OOM-free), so the wedge stream is generated,
    // hub-scored, and anti-filtered IN PLACE — the only exchanges are
    // the support groupBy over the raw pair stream and the final (u,v)
    // partial aggregation. On a corpus where even the SUPPORTED graph has hub
    // centers, the exact mitigation is splitting each hub's adjacency
    // into blocks crossed pairwise (same output, bounded tasks); the
    // approximate one raises the support floor or df-cuts centers.
    Q("g_linkpred",
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = Ckpt.eager(li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.ok").as("ok"), col("x.pk").as("a"), col("y.pk").as("b")).distinct()
          .groupBy("a", "b").agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2).select("a", "b"))
        // gate feed: counts the already-materialized checkpoint (cheap);
        // adjacency/degree sides are ≤ 2·nE rows, exclusion side = nE
        val nE = pairs.count()
        val adj = pairs.select(col("a").as("w"), col("b").as("n"))
          .union(pairs.select(col("b").as("w"), col("a").as("n")))
        val deg = adj.groupBy("w").agg(count(lit(1)).as("d"))
        val wedges = adj.as("x")
          .join(Bcast.gated(adj.as("y"), 2 * nE),
            col("x.w") === col("y.w") && col("x.n") < col("y.n"))
          .select(col("x.n").as("u"), col("y.n").as("v"), col("x.w").as("w"))
        val cand = wedges.join(
          Bcast.gated(pairs.select(col("a").as("u"), col("b").as("v")), nE),
          Seq("u", "v"), "left_anti")
        val scored = cand
          .join(Bcast.gated(deg, 2 * nE), Seq("w"))
          .select(col("u"), col("v"), expr("1000000000L div d").as("ra"))
          .groupBy("u", "v").agg(sum("ra").as("ra"))
        val out = Ckpt.eager(
          scored.orderBy(col("ra").desc, col("u"), col("v")).limit(20))
        Ckpt.drop(pairs)
        out
      },
      Some(linkpredOracle)),

    // ---- Jaccard node similarity (round 15) ----------------------------
    // The GDS-style nodeSimilarity over the part→order bipartite sets:
    // J(u,v) = |O(u) ∩ O(v)| / |O(u) ∪ O(v)| where O(p) is the set of
    // orders containing part p, in parts-per-million integer division
    // (engine-exact ranking, no float). All-pairs Jaccard is quadratic;
    // this enumerates ONLY pairs with nonzero intersection via the
    // shared-order self-join — the inverted-index approach, fan-out
    // bounded by order size (≤ 7 lineitems here), never |parts|². At
    // 100 TB the same plan holds as long as the "document" fan-out is
    // bounded (prefix-filter or df-cut hub orders first — the dedup
    // family's df-cut discipline); for unbounded sets the sub-quadratic
    // path is MinHash LSH (p_dedup_minhash_lsh). Union via inclusion–
    // exclusion keeps the ppm exact: |∪| = d(u) + d(v) − inter. The
    // |parts|-scale degree table broadcasts UNDER THE MEASURED-COUNT
    // GATE (VERDICT r16: |parts| ≤ the distinct (o,p) count, measured
    // once off the shared checkpoint that also feeds the self-join —
    // past the cell cap the hints drop and the closing joins degrade to
    // their shuffled forms); the only wide exchange is the (u,v)
    // partial-agg — map-side combined. Top-100 under the
    // (jac desc, u, v) total order.
    Q("g_nodesim",
      (s, dir) => {
        val (lazyOut, li) = nodesimUncached(s, dir)
        val out = Ckpt.eager(lazyOut)
        Ckpt.drop(li)
        out
      },
      Some(nodesimOracle)),

    // ---- deterministic random-walk sampling (round 15 v2) ---------------
    // The DeepWalk/node2vec corpus-generation primitive: one fixed-length
    // walk per start node over the SUPPORTED co-purchase graph (pairs
    // sharing >= 2 orders — the association-support floor g_linkpred
    // uses), where each step moves to the neighbor minimizing the
    // integer hash h(cur, step, nb) — a deterministic PRNG draw, so the
    // walk corpus is bit-reproducible and ORACLE-CHECKABLE (a real
    // embedding pipeline swaps in per-walk seeds: same plan, different
    // hash inputs; this is the unbiased p = q = 1 walk). Plan: the
    // adjacency is hoisted, pre-partitioned on the walker key and
    // checkpointed ONCE; each step is one co-partitioned join (the
    // walker frame comes out of the previous argmin hash-partitioned by
    // start, the adjacency never moves) + one map-side-combined argmin
    // — L steps = L joins, no driver loop state, no lineage growth
    // through the checkpoint. At 100 TB walk count scales with |V| and
    // each step's width is |frontier| = |V| — embarrassingly keyed.
    // Output: the step-L endpoint histogram (endpoint, n).
    Q("g_walks",
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val sup = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.ok").as("ok"), col("x.pk").as("a"), col("y.pk").as("b"))
          .distinct()
          .groupBy("a", "b").agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2).select("a", "b")
        val adj = Ckpt.eagerPartitioned(
          sup.select(col("a").as("cur"), col("b").as("nb"))
            .union(sup.select(col("b").as("cur"), col("a").as("nb")))
            .repartition(col("cur")))
        var walks = adj.select(col("cur").as("start")).distinct()
          .select(col("start"), col("start").as("cur"))
        for (step <- 1 to 4) {
          walks = walks.join(adj, Seq("cur"))
            .select(col("start"), col("nb"),
              expr(s"(cur * 48271 + $step * 39916801 + nb * 69621) % 1000000007")
                .as("h"))
            .groupBy("start")
            .agg(min(struct(col("h"), col("nb"))).as("m"))
            .select(col("start"), col("m.nb").as("cur"))
        }
        val out = Ckpt.eager(
          walks.groupBy(col("cur").as("endpoint")).agg(count(lit(1)).as("n")))
        Ckpt.drop(adj)
        out
      },
      Some(walksOracle(4))),

    // ---- label propagation communities (round 15) ----------------------
    // Synchronous LPA over the undirected FK graph — the standard
    // near-linear community detection (see [[labelProp]] for the
    // deterministic tie-break and the fixed-round semantics). Output:
    // top-20 communities by size under the (n desc, comm) total order.
    Q("g_labelprop",
      (s, dir) => {
        val labels = lpaLabels(s, dir)
        labels.groupBy(col("lbl").as("comm")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("comm")).limit(20)
      },
      Some(lpOracle)),

    // ---- modularity of the LPA partition -------------------------------
    // Newman modularity Q = Σ_c [e_c/m − (d_c/2m)²] of the g_labelprop
    // communities — the standard partition-quality score, computed as an
    // exact integer numerator over 4m² (see [[modularityOracle]] for the
    // overflow accounting); one edge-frame join pass + two community-
    // keyed aggregations on top of the shared LPA labels.
    Q("g_modularity",
      (s, dir) => {
        val e = allEdges(s, dir)
        val labels = lpaLabels(s, dir)
        val m = e.count()
        val ec = e
          .join(labels.select(col("id").as("src"), col("lbl").as("sl")), Seq("src"))
          .join(labels.select(col("id").as("dst"), col("lbl").as("tl")), Seq("dst"))
          .filter(col("sl") === col("tl"))
          .groupBy(col("sl").as("lbl")).agg(count(lit(1)).as("e_c"))
        // total community degree over BOTH orientations (so Σ d_c = 2m)
        val dc = undirectedEdges(s, dir)
          .join(labels.select(col("id").as("src"), col("lbl")), Seq("src"))
          .groupBy("lbl").agg(count(lit(1)).as("d_c"))
        dc.join(ec, Seq("lbl"), "left")
          .select((lit(4L) * lit(m) * coalesce(col("e_c"), lit(0L))
            - col("d_c") * col("d_c")).as("t"))
          .agg(sum("t").as("qnum"))
          .select(lit(m).as("m"), col("qnum"),
            round(col("qnum") / (lit(4.0) * lit(m) * lit(m)), 6).as("modularity"))
      },
      Some(modularityOracle)),

    // ---- HITS hubs & authorities (round 15) ----------------------------
    // Power iteration over BOTH edge orientations: the a-phase joins the
    // src-PARTITIONED edge copy against the id-partitioned hub frame
    // (no exchange on either side) and shuffles only the per-dst
    // aggregation; the h-phase mirrors it on the dst-partitioned copy —
    // one shuffle per phase, the PageRank discipline, with the two
    // loop-invariant copies hoisted once. The max rescale is a driver
    // scalar over the just-materialized checkpoint (metadata-rate).
    // See [[hitsOracle]] for the fixed-point formulation and bounds.
    Q("g_hits",
      (s, dir) => {
        val e = allEdges(s, dir)
        val eS = Ckpt.eagerPartitioned(e.repartition(col("src")))
        val eD = Ckpt.eagerPartitioned(e.repartition(col("dst")))
        // NOT partition-shrunk (round 19): full-|V| hub/auth frames
        // join the compute-width orientation copies every phase — see
        // fixedPageRank's note (bridge twin measured +3s shrunk; r18
        // scaling ratio 1.2).
        val nodesP = Ckpt.eagerPartitioned(allNodes(s, dir).repartition(col("id")))
        var hub: DataFrame = nodesP.select(col("id"), lit(1000000L).as("hub"))
        var auth: DataFrame = null
        var prevA: DataFrame = null
        var prevH: DataFrame = null
        for (_ <- 1 to hitsIters) {
          // deferred checkpoints: the max-rescale probe is the phase's
          // ONLY job — it materializes the checkpoint AND reads the
          // scalar (the deltaCC convergence-probe trick; an eager
          // checkpoint would pay a second job per phase)
          val araw = Ckpt.deferredPartitioned(
            nodesP.join(
              eS.join(hub.withColumnRenamed("id", "src"), Seq("src"))
                .groupBy(col("dst").as("id")).agg(sum("hub").as("s")),
              Seq("id"), "left")
              .select(col("id"), coalesce(col("s"), lit(0L)).as("r")))
          // max(1, …): an all-zero frame (possible under an empty
          // scoped edge set) keeps scores 0 instead of dividing by zero
          val mA = math.max(1L, araw.agg(max("r")).head.getLong(0))
          if (prevA != null) Ckpt.drop(prevA)
          prevA = araw
          auth = araw.select(col("id"), expr(s"r * 1000000L div ${mA}L").as("auth"))
          val hraw = Ckpt.deferredPartitioned(
            nodesP.join(
              eD.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
                .groupBy(col("src").as("id")).agg(sum("auth").as("s")),
              Seq("id"), "left")
              .select(col("id"), coalesce(col("s"), lit(0L)).as("r")))
          val mH = math.max(1L, hraw.agg(max("r")).head.getLong(0))
          if (prevH != null) Ckpt.drop(prevH)
          prevH = hraw
          hub = hraw.select(col("id"), expr(s"r * 1000000L div ${mH}L").as("hub"))
        }
        Ckpt.drop(eS)
        Ckpt.drop(eD)
        auth.join(hub, Seq("id"))
          .orderBy(col("auth").desc, col("id")).limit(20)
      },
      Some(hitsOracle)),

    // ---- local clustering coefficient over part co-purchase ------------
    // coeff(v) = 2·tri(v)/(d(v)·(d(v)−1)) in parts-per-million integer
    // division (engine-exact ranking, no float); shares the triangle
    // corner counts and degree table with g_triangles. Top-20 under the
    // (coeff desc, n_tri desc, id) total order — the most tightly-knit
    // co-purchase neighborhoods.
    Q("g_clustering",
      (s, dir) => {
        val (tc, deg) = coPurchaseTriangles(s, dir)
        deg.join(tc, Seq("id"), "left")
          .filter(col("d") >= 2)
          .select(col("id"), col("d"),
            coalesce(col("n_tri"), lit(0L)).as("n_tri"))
          .withColumn("coeff_ppm",
            expr("(2000000 * n_tri) div (d * (d - 1))"))
          .orderBy(col("coeff_ppm").desc, col("n_tri").desc, col("id"))
          .limit(20)
      },
      Some(clusteringOracle)),

    // ---- strongly connected components (round 16) ----------------------
    // The one classic the family lacked: all CC flavors here are
    // undirected. Directed graph = the asymmetric co-purchase relation
    // (a→b for id-ordered pairs sharing >= 2 orders, b→a additionally
    // at support >= 3), which carries genuine non-trivial SCCs (46
    // 2-cycles, 7 3-cycles, 3 4-cycles at sf0.01) without the closure
    // blowup a symmetric relation would give the oracle. Algorithm:
    // [[coloringSCC]] (FW-BW-Trim, scc label = max member id — both
    // deterministic and oracle-recomputable from the transitive
    // closure). Output: the SCC size histogram with a label checksum.
    Q("g_scc",
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val sup = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.ok").as("ok"), col("x.pk").as("a"), col("y.pk").as("b")).distinct()
          .groupBy("a", "b").agg(count(lit(1)).as("supp"))
        val e = sup.filter(col("supp") >= 2).select(col("a").as("src"), col("b").as("dst"))
          .unionByName(
            sup.filter(col("supp") >= 3).select(col("b").as("src"), col("a").as("dst")))
        val n = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()
        val labels = coloringSCC(n, e)
        val out = Ckpt.eager(
          labels.groupBy("scc").agg(count(lit(1)).as("sz"))
            .groupBy("sz").agg(count(lit(1)).as("n_sccs"), sum("scc").as("chk"))
            .select(col("sz").as("scc_size"), col("n_sccs"), col("chk")))
        Ckpt.drop(labels)
        out
      },
      Some(sccOracle)),
  )

  /** Strongly connected components over a DIRECTED edge frame —
    * FW-BW-Trim with Orzan-style forward coloring (round 16):
    *
    *   1. TRIM to fixpoint: a node missing either an in- or an
    *      out-edge within the remaining graph is a singleton SCC —
    *      peels the DAG-ish mass (most of any real graph) without
    *      touching the quadratic machinery.
    *   2. FORWARD COLORING to fixpoint: propagate the max node id along
    *      edges (delta discipline — only changed colors message), so
    *      color(v) = max{id(u) : u reaches v}. Roots (color(v) = id(v))
    *      are the max ids of their SCCs.
    *   3. BACKWARD REACH from the roots, RESTRICTED to same-color
    *      nodes: any v→root path stays inside the color class (a
    *      higher-id intermediate would have recolored the root), so the
    *      reached set per root is EXACTLY its SCC — every root's SCC is
    *      extracted per round, labeled with the root id = max member id
    *      (deterministic, engine-independent).
    *   4. Remove the assigned nodes/edges; repeat.
    *
    * Scale shape: each trim pass / coloring superstep / backward
    * superstep is one co-partitioned join + one keyed aggregate over
    * the REMAINING edge frame (hoisted per round in both orientations,
    * the HITS discipline), with the deferred-checkpoint count as the
    * sole per-step job (the deltaCC probe trick). Outer rounds are
    * bounded by the condensation's root-chain depth — 3 on this corpus,
    * loud failure at [[sccMaxRounds]] (both bounds session-configurable:
    * `spark.graft.sccMaxRounds` / `spark.graft.sccMaxSupersteps`, the
    * high-diameter escape hatch). At 100 TB this is the standard
    * Spark SCC (GraphFrames ships the same FW-BW-coloring shape);
    * single-pivot FW-BW would idle the cluster on one pivot per round.
    * Returns (id, scc). */
  private[graft] def coloringSCC(nodesIn: DataFrame, edgesIn: DataFrame,
      maxRoundsArg: Int = 0, maxSuperstepsArg: Int = 0): DataFrame = {
    // Bounds are SESSION CONFS with the arguments as test overrides
    // (ADVICE r16: trim peels one DAG layer per pass and coloring needs
    // ~diameter supersteps, so a high-diameter graph hits a hard-coded
    // bound with no user-facing escape hatch — unlike the varpath's
    // explicit-bound spelling). Defaults keep the corpus margins.
    val conf = nodesIn.sparkSession.conf
    val maxRounds =
      if (maxRoundsArg > 0) maxRoundsArg
      else conf.get("spark.graft.sccMaxRounds", sccMaxRounds.toString).toInt
    val maxSupersteps =
      if (maxSuperstepsArg > 0) maxSuperstepsArg
      else conf.get("spark.graft.sccMaxSupersteps", sccMaxSupersteps.toString).toInt
    var remaining = Ckpt.eagerPartitioned(
      nodesIn.select(col("id")).repartition(col("id")))
    var remS = Ckpt.eagerPartitioned(
      edgesIn.select(col("src"), col("dst")).repartition(col("src")))
    var remD = Ckpt.eagerPartitioned(remS.repartition(col("dst")))
    var nRemaining = remaining.count()
    // Round 19 (guide §2): every trim pass / coloring superstep /
    // backward superstep's frames are bounded by the INITIAL node and
    // edge counts (rounds only shrink the graph), so the whole FW-BW
    // machine runs at a volume-derived partition count — both counts
    // are free off the just-materialized checkpoints. The initial
    // placement above stays at session width; the first shrink()
    // re-places the remaining graph at the loop width.
    val assignedOut: DataFrame = Ckpt.withShuffle(nodesIn.sparkSession,
      Ckpt.partsFor(nodesIn.sparkSession, math.max(nRemaining, remS.count()))) {
    var assigned: DataFrame = null // (id, scc), grows per extraction
    def assign(rows: DataFrame): Unit = {
      val next =
        if (assigned == null) Ckpt.eager(rows)
        else {
          val a2 = Ckpt.eager(assigned.unionByName(rows))
          Ckpt.drop(assigned); a2
        }
      assigned = next
    }
    // shrink the remaining graph to `keep` (id-partitioned): src side
    // co-partitioned semi, dst side against the dst-keyed copy
    def shrink(keep: DataFrame): Unit = {
      val s2 = Ckpt.eagerPartitioned(
        remS.join(keep, remS("src") === keep("id"), "left_semi")
          .join(keep.withColumnRenamed("id", "id2"), col("dst") === col("id2"), "left_semi"))
      val d2 = Ckpt.eagerPartitioned(s2.repartition(col("dst")))
      Ckpt.drop(remS); Ckpt.drop(remD)
      remS = s2; remD = d2
      Ckpt.drop(remaining)
      remaining = keep
    }
    var round = 0
    while (nRemaining > 0) {
      round += 1
      require(round <= maxRounds,
        s"SCC coloring not converged after $maxRounds rounds")
      // ---- 1. trim fixpoint --------------------------------------------
      var trimming = true
      var trims = 0
      while (trimming && nRemaining > 0) {
        trims += 1
        require(trims <= maxSupersteps,
          s"SCC trim not converged after $maxSupersteps passes")
        val hasOut = remS.select(col("src").as("id")).distinct()
        val hasIn = remD.select(col("dst").as("id")).distinct()
        val keep = Ckpt.deferredPartitioned(
          remaining.join(hasOut, Seq("id"), "left_semi")
            .join(hasIn, Seq("id"), "left_semi"))
        val nKeep = keep.count()
        if (nKeep == nRemaining) { trimming = false; Ckpt.drop(keep) }
        else {
          assign(remaining.join(keep, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc")))
          shrink(keep)
          nRemaining = nKeep
        }
      }
      if (nRemaining > 0) {
        // ---- 2. forward max-color propagation to fixpoint --------------
        // the deltaCC frame lifecycle: each superstep's joined frame is
        // the ONLY materialization (deferred checkpoint + count probe);
        // colors/changed are lazy projections over it, and the previous
        // superstep's frame is released only once the next one is
        // materialized
        var prevJ: DataFrame = Ckpt.eagerPartitioned(
          remaining.select(col("id"), col("id").as("c")))
        var colors: DataFrame = prevJ
        var changed: DataFrame = prevJ
        var steps = 0
        var converged = false
        while (!converged) {
          steps += 1
          require(steps <= maxSupersteps,
            s"SCC coloring pass not converged after $maxSupersteps supersteps")
          val cand = remS.join(changed, remS("src") === changed("id"))
            .select(remS("dst").as("id"), col("c").as("cand"))
            .groupBy("id").agg(max("cand").as("cand"))
          val joined = Ckpt.deferredPartitioned(colors.join(cand, Seq("id"), "left"))
          val nChanged = joined.filter(col("cand") > col("c")).count()
          Ckpt.drop(prevJ)
          prevJ = joined
          colors = joined
            .select(col("id"), greatest(col("c"), coalesce(col("cand"), col("c"))).as("c"))
          changed = joined.filter(col("cand") > col("c"))
            .select(col("id"), col("cand").as("c"))
          converged = nChanged == 0L
        }
        // ---- 3. backward reach from roots within their color -----------
        var members = Ckpt.eagerPartitioned(
          colors.filter(col("id") === col("c")).select(col("id"), col("c").as("scc")))
        var frontier = members
        converged = false
        steps = 0
        while (!converged) {
          steps += 1
          require(steps <= maxSupersteps,
            s"SCC backward reach not converged after $maxSupersteps supersteps")
          val cand = remD.join(frontier.withColumnRenamed("id", "dst"), Seq("dst"))
            .select(col("src").as("id"), col("scc")).distinct()
          val inColor = cand.join(colors, Seq("id"))
            .filter(col("scc") === col("c")).select(col("id"), col("scc"))
          val fresh = Ckpt.deferredPartitioned(
            inColor.join(members, Seq("id"), "left_anti"))
          val nFresh = fresh.count()
          // the previous frontier's one consumer (this superstep's cand
          // join) just ran — release it now that `fresh` is materialized
          // (ADVICE r16: non-empty frontiers stayed pinned until the
          // harness drain, one checkpointed frame per superstep). The
          // first frontier aliases `members`, which has its own
          // lifecycle below — never drop it here.
          if (frontier ne members) Ckpt.drop(frontier)
          if (nFresh == 0L) { converged = true; Ckpt.drop(fresh) }
          else {
            val m2 = Ckpt.eagerPartitioned(members.unionByName(fresh))
            Ckpt.drop(members)
            members = m2
            frontier = fresh
          }
        }
        assign(members)
        val keep = Ckpt.deferredPartitioned(
          remaining.join(members, Seq("id"), "left_anti"))
        nRemaining = keep.count()
        shrink(keep)
        Ckpt.drop(members)
        Ckpt.drop(prevJ) // the final colors frame, done serving backward
      }
    }
    assigned
    }
    Ckpt.drop(remaining); Ckpt.drop(remS); Ckpt.drop(remD)
    if (assignedOut != null) assignedOut
    else nodesIn.sparkSession.range(0)
      .select(col("id"), col("id").as("scc"))
  }

  private val sccMaxRounds = 12
  private val sccMaxSupersteps = 40

  /** SCC oracle: transitive closure by recursive CTE (UNION dedups, so
    * it terminates on the cyclic graph), scc(v) = max over the mutual-
    * reachability set including v — exactly the engine's max-member-id
    * label — then the same size histogram + label checksum. */
  private lazy val sccOracle: String =
    """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |sup AS (SELECT a, b, count(*) AS supp FROM (
      |    SELECT DISTINCT x.ok, x.pk AS a, y.pk AS b
      |    FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk)
      |  GROUP BY a, b),
      |e AS (SELECT a AS src, b AS dst FROM sup WHERE supp >= 2
      |      UNION ALL
      |      SELECT b, a FROM sup WHERE supp >= 3),
      |-- explicit DISTINCT over UNION ALL: inside a WITH RECURSIVE list
      |-- DuckDB treats a bare UNION CTE as an anchor/step pair and does
      |-- NOT dedup across the arms
      |n AS (SELECT DISTINCT id FROM (
      |        SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
      |r AS (SELECT src, dst FROM e
      |      UNION
      |      SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
      |mut AS (SELECT c1.src AS id, max(c1.dst) AS m
      |        FROM r c1 JOIN r c2 ON c2.src = c1.dst AND c2.dst = c1.src
      |        GROUP BY c1.src),
      |scc AS (SELECT n.id, greatest(n.id, coalesce(mut.m, n.id)) AS scc
      |        FROM n LEFT JOIN mut ON mut.id = n.id),
      |sizes AS (SELECT scc, count(*) AS sz FROM scc GROUP BY scc)
      |SELECT CAST(sz AS BIGINT) AS scc_size,
      |       CAST(count(*) AS BIGINT) AS n_sccs,
      |       CAST(sum(scc) AS BIGINT) AS chk
      |FROM sizes GROUP BY sz""".stripMargin
}
