package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lang._
import graft.lang.Typing._

/** Spark executor for the MiniGQL 7-instruction IR.
  *
  * The reference interpreter (/root/reference/graphDB/lib/sem.ml:299-378) is
  * an eager left-fold over instructions threading
  * `State(graph, bindingTable, nextId)`. Here the same fold threads
  * `ExecState(graph, bindings: DataFrame, env, nextId)` where every
  * instruction is a LAZY DataFrame transformation — the whole instruction
  * chain fuses into Catalyst plans, and only node creation (which must know
  * the binding-table row count to advance the id counter, sem.ml:45-51,
  * built to the assignment spec: advance by row count, not the reference's
  * `+1` bug) forces materialization.
  *
  * Binding table = one LongType column per bound variable; bag semantics
  * (duplicates preserved) match both Spark defaults and the reference
  * (sem.ml:19-25). Rebinding a variable shadows the old binding (columns
  * prepend in the reference, sem.ml:31; here: fresh internal column name,
  * env lookup takes the latest).
  *
  * Deviations from the reference implementation, all "build to spec"
  * (SURVEY.md §2.1): `set` evaluates its expression per row (the reference
  * evaluates on the first row only, sem.ml:372); conflicting per-node `set`
  * values are resolved deterministically by max; `delete` of a shadowed
  * variable drops every column of that name (the reference corrupts its
  * table there, sem.ml:334-336); `set` through a binding left dangling by
  * an earlier `delete` of an aliasing variable is a no-op (the join-update
  * finds no node row), where the reference's List.assoc would crash;
  * `and`/`or` may short-circuit per row and
  * Catalyst may reorder conjuncts, while the reference evaluates both
  * operands before dispatch (sem.ml:160-161,174-175) — observable only
  * through error effects of a skipped operand (strict-mode unset-attribute
  * raise, ANSI div-by-zero), where the reference raises and we may not.
  */
object Engine {

  /** Identity key for the hoist memo: two graph versions are the same
    * hoist iff their edge MAPS are the same instance (mutation builds a
    * new map). Structural Map equality would be wrong (a re-created
    * equal graph may hold different frames) and expensive. */
  private final class GraphKey(val ref: AnyRef) {
    override def hashCode: Int = System.identityHashCode(ref)
    override def equals(o: Any): Boolean = o match {
      case k: GraphKey => k.ref eq ref
      case _           => false
    }
  }

  /** One call-procedure hoist: the 2·|E| undirected src-partitioned
    * edge frame with its measured row count, plus (built on first
    * bfs/sssp use) the pinned distinct-endpoint spine universe and ITS
    * count — the volume input for the loops' partition sizing
    * ([[graft.Ckpt.partsFor]]) and the per-call spine base (an |V|-
    * scale union instead of re-running the |E|-scale distinct every
    * call). */
  private[engine] final class Hoist(val ue: org.apache.spark.sql.DataFrame, val nUe: Long) {
    lazy val endpoints: org.apache.spark.sql.DataFrame = graft.Ckpt.pinned(
      ue.select(org.apache.spark.sql.functions.col("dst").as("id")).distinct())
    lazy val nEndpoints: Long = endpoints.count()
  }

  /** Session-lifetime memo of the call-procedure bridge's hoisted
    * undirected edge frame, keyed (session, relScope, graph edge-map
    * IDENTITY) — round 19 (ADVICE r18): keying BY the identity instead
    * of guarding on it lets two graphs (or a graph and its mutated
    * successor) coexist instead of evicting each other, and removes the
    * drop-on-replacement that could invalidate still-lazy bindings
    * referencing the superseded pin (call bfs → mutate → call: the old
    * result's trivial-convergence path reads the old spine). Values are
    * drain-ledger-exempt pinned checkpoints that live until their
    * session stops (swept on access); a mutation-heavy session holds one
    * 2·|E| pin per graph VERSION it ran a whole-graph procedure on —
    * bounded by the program's own mutation count, and the price of not
    * unpersisting frames lazy plans may still reference. */
  private val hoistMemo = new Object
  private val ueHoists = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, GraphKey), Hoist]

  /** |V| per (session, graph node-map identity) — one count job per
    * graph version, feeds the bridges' volume-derived superstep
    * partition sizing (guide §2). */
  private val nodeCounts = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, GraphKey), Long]

  /** Per-node triangle counts + pair-degrees of the scoped undirected
    * pair graph, memoized per (session, relScope, graph edge-map
    * identity) — round 19 (VERDICT r18 item 3): `call triangles()` and
    * `call clustering()` consume the SAME |E|-scale wedge enumeration,
    * and the library twins have shared it via coPurchaseTriangles'
    * session memo since round 15 — this is the bridge-side parity move.
    * Values are |V|-scale pinned checkpoints (drain-exempt, live until
    * session stop, same lifecycle as [[ueHoists]]); the |E|-scale
    * intermediates are released at build time. */
  private val triHoists = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, GraphKey),
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  /** Execution config. `strict=true` reproduces the reference's
    * runtime-error semantics for reads of unset attributes / dangling
    * bindings via `raise_error` in the plan (sem.ml:148-158); `false`
    * yields SQL NULL semantics (rows with NULL predicates drop).
    * `deterministicIds=true` totally orders the binding table before
    * allocating fresh node ids, so ids are a function of binding CONTENT,
    * not partition layout — required for cross-engine result comparison;
    * costs one sort per create-on-matched-table (skipped for the common
    * create-from-unit-table case). `expandPaths=true` enables the
    * cross-join → edge-join peephole (see compile below). */
  final case class Config(
      strict: Boolean = true,
      checkpointEvery: Int = 24,
      deterministicIds: Boolean = true,
      expandPaths: Boolean = true)

  /** Lineage-cap key: a node label or an edge-type triple — kept distinct
    * so bump() can checkpoint the matching frame (a stringified edge key
    * would silently never match `graph.nodes`). */
  private type FrameKey = Either[String, (String, String, String)]

  /** env: vname → internal binding column, latest binding first.
    * `nullable`: binding COLUMNS that may be NULL (optional-match
    * targets) — drives the strict-mode null-guard in [[sql]]. */
  final case class ExecState(
      graph: PropertyGraph,
      bindings: DataFrame,
      env: List[(String, String)],
      nextId: Long,
      freshCounter: Int,
      mutationDepth: Map[FrameKey, Int],
      nullable: Set[String] = Set.empty,
      /** True only while `bindings` is the UNTOUCHED 1-row/0-column unit
        * table: the first match/merge then IS its label scan — no cross
        * join. More than convenience: CartesianProduct output has
        * unknown partitioning, so the 1-row cross join would erase a
        * bucketed scan's distribution and force a join-key exchange the
        * bucketed GraphStore layout exists to avoid (PlanSpec pins the
        * exchange-free 1-hop). Cleared after EVERY instruction by the
        * execPlan fold — even a constant `where` changes the row count,
        * so no instruction preserves unit-ness. */
      unitTable: Boolean = false,
      /** Rel bindings (round-10 edge properties): var → its matched
        * edge's (srcColumn, dstColumn) in the binding table — an edge
        * binding ALIASES its endpoint columns, it owns none. Latest
        * binding first; reset by the scope-restricting instructions
        * (return / with) and retired when an endpoint column is dropped
        * (delete of the endpoint variable → later access fails loudly
        * as a dangling binding). */
      edgeEnv: List[(String, (String, String))] = Nil) {
    def colOf(v: String): String =
      env.collectFirst { case (`v`, c) => c }
        .getOrElse(throw new IllegalStateException(s"variable $v not bound"))
    def edgeColsOf(v: String): (String, String) =
      edgeEnv.collectFirst { case (`v`, cs) => cs }
        .getOrElse(throw new IllegalStateException(
          s"rel variable $v dangling (an endpoint binding was deleted?)"))
  }

  /** 1-row, 0-column DataFrame: the nullary cartesian-product identity
    * (reference sem.ml:25 `Table([], [[]])`). */
  def unitBindings(spark: SparkSession): DataFrame = spark.range(1).select()

  /** `nextId` is the post-query id counter (reference State's third
    * component, sem.ml:41) — callers persisting the graph must persist
    * it too, or a later session's creates collide with stored ids
    * (GraphStore round-trips it). */
  final case class QueryResult(graph: PropertyGraph, bindings: DataFrame,
      nextId: Long)

  // --- physical instruction stream -----------------------------------
  // The reference executes the IR literally: a pattern hop
  // `(a)-[:r]->(b:B)` is a cartesian product with ALL b-labeled nodes
  // followed by an existence semi-join (sem.ml:303-329) — O(|T|·|nodes|)
  // intermediate. When the node instruction that introduces the new
  // variable is immediately followed by the edge instruction that
  // constrains it, the pair is equivalent to ONE inner equi-join against
  // the (deduplicated, referentially intact) edge table: per existing
  // row, cross+semi keeps one row per b-node with an (a,r,b) edge, and
  // the edge table holds exactly one row per such pair. The rewrite
  // turns the dominant pattern-match path into a broadcast/shuffle hash
  // join Catalyst can plan well at any scale.
  private sealed trait PhysOp
  private final case class PExec(in: RInstr) extends PhysOp
  /** Join bindings with edge table `key`; `boundVar`'s column matches the
    * src (if `newIsDst`) or dst side; the other side becomes `newVar`.
    * `rv` optionally registers a rel binding for the matched edge
    * (round-10 edge properties) — it aliases the two endpoint columns,
    * adding no join or column of its own. */
  private final case class PExpand(
      key: (String, String, String), boundVar: String, newVar: String,
      newIsDst: Boolean, rv: Option[String] = None) extends PhysOp
  /** Fused undirected hop: cross+semi over EITHER edge orientation fuses
    * to one equi-join against the union of the declared orientation
    * frames, deduplicated on the node pair — cross+semi yields exactly
    * one row per connected (sv,tv) pair, and the union can hold a pair
    * twice (reciprocal edges on a self-label relation), so unlike the
    * directed [[PExpand]] the dedup is load-bearing. `sl`/`tl` are the
    * pattern's sv-/tv-side labels, `fwd`/`rev` which orientations the
    * schema declares (typing guarantees at least one). */
  private final case class PExpandUndir(
      sl: String, rl: String, tl: String, fwd: Boolean, rev: Boolean,
      boundVar: String, newVar: String, newIsTv: Boolean) extends PhysOp
  /** Fused `[:a|b]` alternation hop: one equi-join against the
    * pair-deduped union of the resolved frames (each read in its
    * pattern orientation — `flipped` frames dst-as-src). The dedup is
    * load-bearing exactly like [[PExpandUndir]]'s: a pair connected by
    * several listed types (or both orientations) must yield ONE row. */
  private final case class PExpandAlt(
      frames: List[((String, String, String), Boolean)],
      boundVar: String, newVar: String, newIsTv: Boolean) extends PhysOp
  /** Same peephole for a variable-length hop: cross+semi over the bounded
    * closure fuses to one equi-join against the reach frame. `distVar`
    * additionally binds the minimal hop count (`as d`). */
  private final case class PExpandPath(
      key: (String, String, String), lo: Int, hi: Int, boundVar: String,
      newVar: String, newIsDst: Boolean,
      distVar: Option[String] = None, undir: Boolean = false,
      pathVar: Option[String] = None, allPaths: Boolean = false) extends PhysOp

  private def compilePlan(instrs: List[RInstr], cfg: Config): List[PhysOp] =
    if (!cfg.expandPaths) instrs.map(PExec)
    else instrs match {
      case RMatchNode(v, _) :: RMatchEdge(sv, sl, rl, tv, tl, rv) :: rest
          if tv == v && sv != v =>
        // (bound sv)-[:rl]->(fresh v): new var is the edge's dst
        PExpand((sl, rl, tl), sv, v, newIsDst = true, rv) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RMatchEdge(sv, sl, rl, tv, tl, rv) :: rest
          if sv == v && tv != v =>
        // (fresh v)-[:rl]->(bound tv): new var is the edge's src
        PExpand((sl, rl, tl), tv, v, newIsDst = false, rv) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RMatchEdgeUndir(sv, sl, rl, tv, tl, f, r) :: rest
          if tv == v && sv != v =>
        // (bound sv)-[:rl]-(fresh v): new var is the pattern's tv side
        PExpandUndir(sl, rl, tl, f, r, sv, v, newIsTv = true) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RMatchEdgeUndir(sv, sl, rl, tv, tl, f, r) :: rest
          if sv == v && tv != v =>
        PExpandUndir(sl, rl, tl, f, r, tv, v, newIsTv = false) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RMatchEdgeAlt(sv, _, tv, _, frames) :: rest
          if tv == v && sv != v =>
        PExpandAlt(frames, sv, v, newIsTv = true) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RMatchEdgeAlt(sv, _, tv, _, frames) :: rest
          if sv == v && tv != v =>
        PExpandAlt(frames, tv, v, newIsTv = false) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RVarPath(sv, key, lo, hi, tv, dist, undir, pathV, ap) :: rest
          if tv == v && sv != v =>
        PExpandPath(key, lo, hi, sv, v, newIsDst = true, dist, undir, pathV, ap) :: compilePlan(rest, cfg)
      case RMatchNode(v, _) :: RVarPath(sv, key, lo, hi, tv, dist, undir, pathV, ap) :: rest
          if sv == v && tv != v =>
        PExpandPath(key, lo, hi, tv, v, newIsDst = false, dist, undir, pathV, ap) :: compilePlan(rest, cfg)
      case i :: rest => PExec(i) :: compilePlan(rest, cfg)
      case Nil       => Nil
    }

  def run(spark: SparkSession, prog: TypedProg, graph: PropertyGraph,
          nextId: Long = 0L, config: Config = Config()): QueryResult = {
    // union branches (typing reassembled them around RUnion markers):
    // each is a standalone READ-ONLY query from its own unit table
    // against the shared graph; results are bag-unioned (`union all`)
    // or deduplicated (`union`). Typing guarantees identical output
    // column names/kinds, so this is one Catalyst Union node — each
    // branch keeps its own plan (pushdown, fused hops) and the optional
    // dedup is a single hash aggregate over the combined output.
    val parts: List[List[RInstr]] = {
      val out = List.newBuilder[List[RInstr]]
      var cur = List.newBuilder[RInstr]
      prog.instrs.foreach {
        case RUnion(_) => out += cur.result(); cur = List.newBuilder
        case in        => cur += in
      }
      out += cur.result()
      out.result()
    }
    def branchOut(instrs: List[RInstr]): DataFrame = {
      val st0 = ExecState(graph, unitBindings(spark), Nil, nextId, 0,
        Map.empty[FrameKey, Int].withDefaultValue(0), unitTable = true)
      finalProject(execPlan(spark, prog.schema, st0, instrs, config))
    }
    if (parts.size == 1) {
      val st0 = ExecState(graph, unitBindings(spark), Nil, nextId, 0,
        Map.empty[FrameKey, Int].withDefaultValue(0), unitTable = true)
      val st = execPlan(spark, prog.schema, st0, prog.instrs, config)
      QueryResult(st.graph, finalProject(st), st.nextId)
    } else {
      val all = prog.instrs.collectFirst { case RUnion(a) => a }.get
      val combined = parts.map(branchOut).reduce(_ unionByName _)
      QueryResult(graph, if (all) combined else combined.dropDuplicates(), nextId)
    }
  }

  /** Final table: distinct variable names, latest binding, header order
    * (latest-first, like the reference's prepended header) — unless the
    * query ended in `return`, in which case env is exactly the return
    * list. */
  private def finalProject(st: ExecState): DataFrame = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    // `%`-prefixed bindings are engine-internal (named-path segments,
    // `%rels_` companions) — never user-visible in a return-less table
    val outCols = st.env.flatMap { case (v, c) =>
      if (!v.startsWith("%") && seen.add(v)) Some(col(c).as(v)) else None
    }
    if (outCols.isEmpty) st.bindings else st.bindings.select(outCols: _*)
  }

  /** Fold the compiled physical ops over a state — the reference's
    * instruction fold (sem.ml:299-378), also used recursively for
    * pattern-predicate sub-plans (optional match / not exists). */
  private def execPlan(spark: SparkSession, schema: Schema, st0: ExecState,
      instrs: List[RInstr], config: Config): ExecState = {
    var st = st0
    compilePlan(instrs, config).foreach { op =>
      val wasUnit = st.unitTable
      op match {
      case PExec(in) => st = exec(spark, schema, st, in, config)
      case PExpand(key, boundVar, newVar, newIsDst, rv) =>
        val c = fresh(st)
        val eS = s"${c}_src"
        val edf = st.graph.edges(key).select(col("src").as(if (newIsDst) eS else c),
          col("dst").as(if (newIsDst) c else eS))
        val joined = st.bindings
          .join(edf, col(st.colOf(boundVar)) === col(eS))
          .drop(eS)
        // a rel binding aliases the endpoint columns of the fused join
        val bc = st.colOf(boundVar)
        st = st.copy(bindings = joined, env = (newVar, c) :: st.env,
          freshCounter = st.freshCounter + 1,
          edgeEnv = rv.fold(st.edgeEnv)(x =>
            (x, if (newIsDst) (bc, c) else (c, bc)) :: st.edgeEnv))
      case PExpandUndir(sl, rl, tl, fwd, rev, boundVar, newVar, newIsTv) =>
        val c = fresh(st)
        val eS = s"${c}_src"
        // pair frame in pattern orientation (svSide, tvSide); the rev
        // orientation's frame is read dst-as-svSide. Same broadcast/
        // shuffle hash join as PExpand after the pair dedup.
        val (svName, tvName) = if (newIsTv) (eS, c) else (c, eS)
        val fdf = if (fwd) Some(st.graph.edges((sl, rl, tl))
          .select(col("src").as(svName), col("dst").as(tvName))) else None
        val rdf = if (rev) Some(st.graph.edges((tl, rl, sl))
          .select(col("dst").as(svName), col("src").as(tvName))) else None
        val pairs = (fdf.toSeq ++ rdf.toSeq).reduce(_ unionByName _)
          .dropDuplicates(svName, tvName)
        val joinedU = st.bindings
          .join(pairs, col(st.colOf(boundVar)) === col(eS))
          .drop(eS)
        st = st.copy(bindings = joinedU, env = (newVar, c) :: st.env,
          freshCounter = st.freshCounter + 1)
      case PExpandAlt(frames, boundVar, newVar, newIsTv) =>
        val c = fresh(st)
        val eS = s"${c}_src"
        val (svName, tvName) = if (newIsTv) (eS, c) else (c, eS)
        val pairsA = frames.map { case (key, flipped) =>
          val df = st.graph.edges(key)
          if (flipped) df.select(col("dst").as(svName), col("src").as(tvName))
          else df.select(col("src").as(svName), col("dst").as(tvName))
        }.reduce(_ unionByName _).dropDuplicates(svName, tvName)
        val joinedA = st.bindings
          .join(pairsA, col(st.colOf(boundVar)) === col(eS))
          .drop(eS)
        st = st.copy(bindings = joinedA, env = (newVar, c) :: st.env,
          freshCounter = st.freshCounter + 1)
      case PExpandPath(key, lo, hi, boundVar, newVar, newIsDst, distVar, undir, pathVar, allPaths) =>
        val c = fresh(st)
        val eS = s"${c}_src"
        val cD = s"${c}_d"
        val cP = s"${c}_p"
        // expand the closure FROM the bound side's distinct values —
        // work scales with the seeds' reached frontier, not the
        // relation's full closure (see varPathReachSeeded)
        val seeds = st.bindings.select(col(st.colOf(boundVar)).as("seed")).distinct()
        val rdf0 = varPathReachSeeded(st.graph, key, lo, hi, seeds,
          seedIsSrc = newIsDst, dist = distVar.nonEmpty, undir = undir,
          path = pathVar.nonEmpty, allPaths = allPaths)
        val endpointCols = Seq(col("src").as(if (newIsDst) eS else c),
          col("dst").as(if (newIsDst) c else eS))
        val rdf = rdf0.select(
          endpointCols ++ distVar.map(_ => col("hops").as(cD)) ++
            pathVar.map(_ => col("path").as(cP)): _*)
        val joined0 = st.bindings
          .join(rdf, col(st.colOf(boundVar)) === col(eS))
          .drop(eS)
        // every named path binds its hidden `%rels_<p>` hop-label list
        // alongside the witness (relationships(p) reads it; one label
        // per hop — a lazy per-row projection Catalyst prunes when
        // unread, so unconsumed companions cost nothing)
        val cR = s"${c}_r"
        val joined = pathVar.fold(joined0)(_ => joined0.withColumn(cR,
          array_repeat(lit(key._2), size(col(cP)) - 1)))
        st = st.copy(bindings = joined,
          env = pathVar.map(p => (s"%rels_$p", cR)).toList :::
            pathVar.map(p => (p, cP)).toList :::
            distVar.map(d => (d, cD)).toList ::: (newVar, c) :: st.env,
          freshCounter = st.freshCounter + 1)
      }
      // unit-ness survives nothing: even a constant where filters the row
      if (wasUnit) st = st.copy(unitTable = false)
    }
    st
  }

  /** Execute a pattern-predicate's inner instruction list over the
    * DISTINCT projection of the outer rows' bound columns — the witness
    * build touches each edge frame once per distinct key tuple, not once
    * per outer row, which is the shape that survives a wide outer table
    * at scale. Returns the final sub-state (its bindings hold one row
    * per witness, bound columns under their outer names) and the bound
    * column list. */
  private def innerWitness(spark: SparkSession, schema: Schema, st: ExecState,
      inner: List[RInstr], bound: List[String], cfg: Config): (ExecState, List[String]) = {
    val boundCols = bound.map(st.colOf)
    val probe = st.bindings.select(boundCols.map(col): _*).distinct()
    val sub0 = ExecState(st.graph, probe, bound.map(v => (v, st.colOf(v))),
      st.nextId, st.freshCounter,
      Map.empty[FrameKey, Int].withDefaultValue(0), st.nullable)
    (execPlan(spark, schema, sub0, inner, cfg), boundCols)
  }

  /** Convenience: compile source and run against an empty graph.
    * `params` supplies `$name` query-parameter values, substituted as
    * typed constants before typing (see [[graft.lang.Params]]). */
  def runSource(spark: SparkSession, src: String, config: Config = Config(),
                params: Map[String, Value] = Map.empty): QueryResult = {
    val tp = Typing.compile(src, params)
    run(spark, tp, PropertyGraph.empty(spark, tp.schema), 0L, config)
  }

  /** Compile source and run against a pre-loaded graph (the program's
    * declared schema must structurally match the graph's). */
  def runSourceOn(spark: SparkSession, src: String, graph: PropertyGraph,
                  nextId: Long, config: Config = Config(),
                  params: Map[String, Value] = Map.empty): QueryResult = {
    val tp = Typing.compile(src, params)
    // Structural check, not just label-name subset: a drifted attribute
    // list or relation type would otherwise surface later as an opaque
    // unionByName/analysis error (ADVICE r01). Report the first mismatch.
    tp.schema.nodeAttrs.foreach { case (lbl, attrs) =>
      graph.schema.nodeAttrs.get(lbl) match {
        case None =>
          throw new IllegalArgumentException(
            s"schema mismatch: program declares node label :$lbl absent from graph " +
              s"(graph labels: ${graph.schema.nodeAttrs.keys.toSeq.sorted.mkString(", ")})")
        case Some(gAttrs) if gAttrs.toSet != attrs.toSet =>
          val missing = attrs.toSet -- gAttrs.toSet
          val extra = gAttrs.toSet -- attrs.toSet
          throw new IllegalArgumentException(
            s"schema mismatch on node label :$lbl — program declares " +
              s"${attrs.map { case (f, t) => s"$f $t" }.mkString("{", ", ", "}")} but graph has " +
              s"${gAttrs.map { case (f, t) => s"$f $t" }.mkString("{", ", ", "}")}" +
              (if (missing.nonEmpty) s"; graph lacks ${missing.map(_._1).mkString(", ")}" else "") +
              (if (extra.nonEmpty) s"; graph adds ${extra.map(_._1).mkString(", ")}" else ""))
        case _ => ()
      }
    }
    tp.schema.relTypes.find(rt => !graph.schema.relTypes.contains(rt)).foreach {
      case (sl, rl, tl) =>
        throw new IllegalArgumentException(
          s"schema mismatch: program declares relation (:$sl)-[:$rl]->(:$tl) absent from graph")
    }
    run(spark, tp, graph, nextId, config)
  }

  // -------------------------------------------------------------------

  private def exec(spark: SparkSession, schema: Schema, st: ExecState,
                   in: RInstr, cfg: Config): ExecState = in match {

    case RCreateNode(v, lb) =>
      // Must know the row count to allocate dense ids and advance the
      // counter (spec: PDF §3.6 — one fresh node per binding row).
      // With deterministicIds, totally order the rows first so the
      // id↔row pairing is a function of table content (duplicate rows
      // are interchangeable, so ties are harmless); zipWithIndex then
      // numbers rows in global sort order.
      val ordered =
        if (cfg.deterministicIds && st.bindings.columns.nonEmpty)
          st.bindings.orderBy(st.bindings.columns.map(col).toIndexedSeq: _*)
        else st.bindings
      val bindings = ordered.cache()
      val n = bindings.count()
      val c = fresh(st)
      val withIds: DataFrame = {
        val outSchema = bindings.schema.add(StructField(c, LongType, nullable = false))
        val base = st.nextId
        val rdd = bindings.rdd.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (base + i))
        }
        // Eager localCheckpoint (not cache): materializes the id
        // assignment NOW off the cached parent, cuts its lineage so the
        // parent cache can be released immediately — a plain cache would
        // pin both frames for the life of the session (ADVICE r01).
        graft.Ckpt.eager(spark.createDataFrame(rdd, outSchema))
      }
      bindings.unpersist(false)
      val newNodes = withIds.select(
        col(c).as("id") +:
          schema.nodeAttrs(lb).map { case (f, tp) =>
            lit(null).cast(PropertyGraph.sparkType(tp)).as(f)
          }: _*)
      val g2 = st.graph.copy(nodes = st.graph.nodes.updated(
        lb, st.graph.nodes(lb).unionByName(newNodes)))
      bump(st.copy(graph = g2, bindings = withIds, env = (v, c) :: st.env,
        nextId = st.nextId + n, freshCounter = st.freshCounter + 1), Left(lb), cfg)

    case RMatchNode(v, lb) =>
      val c = fresh(st)
      val scan = st.graph.nodes(lb).select(col("id").as(c))
      // first match on the untouched unit table IS the scan (1 row x S =
      // S) — skipping the cross join keeps the scan's output
      // partitioning (bucketed store) visible to the next join
      val joined = if (st.unitTable) scan else st.bindings.crossJoin(scan)
      st.copy(bindings = joined,
        env = (v, c) :: st.env, freshCounter = st.freshCounter + 1)

    case Typing.RMatchAnyNode(v) =>
      // unlabeled standalone match (round 14): the union of EVERY
      // label's id scan — ids are globally unique (disjoint per-label
      // bases) so the legs are disjoint; each leg is a one-column scan
      // (column pruning reaches the store), and the union is a narrow
      // no-shuffle operator. The hidden `%label_` companion is a
      // per-leg LITERAL (label(v) reads it) — a constant column costs
      // nothing and Catalyst prunes it when unread.
      val c = fresh(st)
      val cL = s"${c}_lbl"
      val scan = st.graph.nodes.toSeq.sortBy(_._1)
        .map { case (lb, df) => df.select(col("id").as(c), lit(lb).as(cL)) }
        .reduceOption(_ unionByName _)
        .getOrElse(spark.range(0).select(col("id").as(c), lit("").as(cL)))
      val joined = if (st.unitTable) scan else st.bindings.crossJoin(scan)
      st.copy(bindings = joined,
        env = (s"%label_$v", cL) :: (v, c) :: st.env,
        freshCounter = st.freshCounter + 1)

    case Typing.RCallProc(proc, yields, args) =>
      // the procedure bridge (round 11): run a whole-graph analytics
      // procedure against the CURRENT graph state and cross-join its
      // result table into the bindings like a fresh match. Yield
      // columns take fresh binding names c0..cN. A string argument
      // (round 12, typing-validated) scopes degree/cc to ONE declared
      // relation type; nodes always stay whole-graph, so unscoped
      // nodes surface as zero-degree / singleton components.
      val cols = yields.indices.map(k => s"__b${st.freshCounter + k}")
      val relScope: Option[String] = args.collectFirst { case StringV(r) => r }
      val allNodes = st.graph.nodes.values.map(_.select(col("id")))
        .reduceOption(_ unionByName _)
        .getOrElse(spark.range(0).select(col("id")))
      val allEdges = st.graph.edges
        .collect { case ((_, rl, _), df) if relScope.forall(_ == rl) =>
          df.select(col("src"), col("dst")) }
        .reduceOption(_ unionByName _)
        .getOrElse(spark.range(0).select(col("id").as("src"), col("id").as("dst")))
      // Loop-invariant frames are hoisted, REPARTITIONED BY THE PER-
      // SUPERSTEP JOIN KEY and materialized once before the iterative
      // loops — the library discipline (GraphAlgos fixedPageRank's
      // Ckpt.eagerPartitioned(edge.repartition(src))). Left lazy, every
      // superstep would re-derive the edge union from the per-relation
      // frames (a storage re-scan) AND re-exchange it for the join —
      // measured 2× vs the library twins on the same graph (VERDICT
      // r12), and at 100 TB the gap is supersteps×|E| of avoidable
      // shuffle. Pinned (AQE off for the materialization) so the
      // checkpoint reports the concrete hash partitioning instead of
      // UnknownPartitioning.
      //
      // Round 18: the hoist is MEMOIZED per (session, relScope, graph
      // edge-map identity) — the loader returns one PropertyGraph
      // instance per (session, dir), so the 13+ whole-graph bridge
      // queries in a bench session share ONE 2|E| hoist (the library's
      // undirectedEdges discipline) instead of each paying the build
      // shuffle + checkpoint. A MUTATED graph is a new map instance and
      // re-hoists; the superseded pin for the same (session, scope) key
      // is dropped on replacement, so a mutate-call-mutate program holds
      // at most one pinned frame per scope (sessions are single-threaded
      // per the Ckpt.confGate contract, so the evicted frame has no
      // in-flight reader). Callers must NOT drop the returned frame.
      def hoistUndirected(): Engine.Hoist =
        Engine.hoistMemo.synchronized {
          Engine.ueHoists.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
          val key = (spark, relScope.getOrElse(""),
            new Engine.GraphKey(st.graph.edges))
          Engine.ueHoists.getOrElseUpdate(key, {
            val df = graft.Ckpt.pinned(
              allEdges.unionByName(
                allEdges.select(col("dst").as("src"), col("src").as("dst")))
                .repartition(col("src")))
            new Engine.Hoist(df, df.count())
          })
        }
      // |V|, memoized per (session, graph version) — the volume input
      // for the |V|-scale bridge loops' partition sizing (guide §2)
      def nNodes(): Long = Engine.hoistMemo.synchronized {
        Engine.nodeCounts.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
        Engine.nodeCounts.getOrElseUpdate(
          (spark, new Engine.GraphKey(st.graph.nodes)), allNodes.count())
      }
      def intArg(what: String): Long = args.head match {
        case IntV(v) => v
        case other   => throw new IllegalStateException(s"$what arg: $other")
      }
      // Shared by triangles() and clustering(): per-node triangle
      // counts and pair-degrees over the canonical undirected pair set,
      // enumerated with the DEGREE-ORDERED orientation (each pair
      // points from its lower-(degree, id) endpoint — every triangle
      // produced once, wedge fan-out O(sqrt(m)) even on hubs; the
      // library g_triangles shape). The |V|-scale degree table and
      // |E|-scale oriented list are broadcast UNDER THE MEASURED-COUNT
      // GATE ([[graft.Bcast]], VERDICT r15): the pair frame is cached
      // and counted once up front (the count pays for itself — every
      // leg used to re-derive the pair distinct), and on a graph whose
      // edge list outgrows the cap the hints drop — the plan degrades
      // to SMJ, still correct, never an executor-OOM broadcast. Counts
      // are materialized NOW (pinned — the [[Engine.triHoists]] memo
      // value, shared by triangles() and clustering() across calls) so
      // the |E|-scale intermediates can be unpersisted immediately.
      def pairTriangleCounts(): (DataFrame, DataFrame) =
        Engine.hoistMemo.synchronized {
          Engine.triHoists.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
          Engine.triHoists.getOrElseUpdate(
            (spark, relScope.getOrElse(""), new Engine.GraphKey(st.graph.edges)),
            pairTriangleCountsUncached())
        }

      def pairTriangleCountsUncached(): (DataFrame, DataFrame) = {
        val pairs = allEdges
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") =!= col("b")).distinct().cache()
        val m = pairs.count()
        // materialized (ADVICE r16): deg feeds the keyed orientation
        // TWICE here and outlives pairs.unpersist below in the
        // `clustering` branch — an unmaterialized plan would re-run the
        // |E|-scale distinct pair self-join to rebuild this |V|-scale
        // table. PINNED (round 19): the frame is one half of the
        // [[Engine.triHoists]] memo value, so it must survive the
        // harness drain for the session lifetime.
        val deg = graft.Ckpt.pinned(
          pairs.select(col("a").as("id"))
            .union(pairs.select(col("b").as("id")))
            .groupBy("id").agg(count(lit(1)).as("d")))
        // gated on the MEASURED |V| (free off the checkpoint — round
        // 17): the old 2·|E| bound was ~100× the real count and under
        // the cell cap would degrade a 20k-row broadcast at sf0.1
        val nDeg = deg.count()
        val keyed = pairs
          .join(graft.Bcast.gated(
            deg.select(col("id").as("a"), col("d").as("da")), nDeg), Seq("a"))
          .join(graft.Bcast.gated(
            deg.select(col("id").as("b"), col("d").as("db")), nDeg), Seq("b"))
        val aFirst = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val o = keyed.select(
          when(aFirst, col("a")).otherwise(col("b")).as("src"),
          when(aFirst, col("b")).otherwise(col("a")).as("dst"),
          when(aFirst, col("db")).otherwise(col("da")).as("ddst")).cache()
        val wedgeOrder = col("e1.ddst") < col("e2.ddst") ||
          (col("e1.ddst") === col("e2.ddst") && col("e1.dst") < col("e2.dst"))
        val tri = o.as("e1")
          .join(graft.Bcast.gated(o.as("e2"), m),
            col("e1.src") === col("e2.src") && wedgeOrder)
          .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
          .join(graft.Bcast.gated(o.select(col("src").as("v"), col("dst").as("w")), m),
            Seq("v", "w"), "left_semi")
        val counts = graft.Ckpt.pinned(
          tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
            .groupBy("id").agg(count(lit(1)).as("n_tri")))
        o.unpersist(false)
        pairs.unpersist(false)
        (counts, deg)
      }
      val table: DataFrame = proc match {
        case "degree" =>
          // out/in degree over EVERY relation type; isolated nodes
          // surface with zeros (the left joins' coalesce)
          val od = allEdges.groupBy(col("src").as("id"))
            .agg(count(lit(1)).as("od"))
          val ind = allEdges.groupBy(col("dst").as("id"))
            .agg(count(lit(1)).as("ind"))
          allNodes.join(od, Seq("id"), "left").join(ind, Seq("id"), "left")
            .select(col("id").as(cols(0)),
              coalesce(col("od"), lit(0L)).as(cols(1)),
              coalesce(col("ind"), lit(0L)).as(cols(2)))
        case "cc" =>
          // delta min-label propagation to the fixed point (the
          // library deltaCC's recurrence; comp = component min id).
          // Diameter-bound loop with the usual loud non-convergence.
          val ue = hoistUndirected().ue
          // NOT partition-shrunk (round 19): unlike the frontier-delta
          // loops, every superstep here joins the FULL |V| label frame
          // against the compute-width edge hoist — shrinking the label
          // side adds a full-|V| re-exchange per superstep to meet the
          // hoist (measured +10s at sf0.1), and the r18 scaling data
          // shows this loop was volume-bound (ratio 1.03), not
          // overhead-bound.
          var labels = graft.Ckpt.eager(allNodes.select(col("id"), col("id").as("comp")))
          var converged = false
          var stepN = 0
          val maxIters = 20
          while (stepN < maxIters && !converged) {
            stepN += 1
            val mins = ue.join(labels, ue("src") === labels("id"))
              .select(ue("dst").as("id"), col("comp").as("cand"))
              .groupBy("id").agg(min("cand").as("cand"))
            val joined = graft.Ckpt.deferredPartitioned(
              labels.join(mins, Seq("id"), "left"))
            val changed = joined.filter(col("cand") < col("comp")).count()
            val next = joined.select(col("id"),
              least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"))
            graft.Ckpt.drop(labels)
            labels = next
            converged = changed == 0L
          }
          require(converged, s"call cc(): not converged after $maxIters supersteps")
          labels.select(col("id").as(cols(0)), col("comp").as(cols(1)))
        case "pagerank" =>
          // the analytics library's fixed-point INTEGER PageRank
          // recurrence (8 iterations, rank0 = 1e9, damping 0.85 in
          // exact integer arithmetic: 150000000 + 85·Σ/100) over the
          // graph's full edge set — deterministic, so oracle-checkable
          // edge list FUSED with its out-degree (one static join, not
          // one per iteration) and pre-placed on the probe key; nodes
          // pre-partitioned by id so the per-iteration left join and
          // the next round's probe both reuse the placement — the only
          // per-superstep shuffle left is the contribution aggregation
          // itself (the irreducible PageRank shuffle).
          val od = allEdges.groupBy(col("src"))
            .agg(count(lit(1)).as("od"))
          val ed = graft.Ckpt.eagerPartitioned(
            allEdges.join(od, Seq("src")).repartition(col("src")))
          val nodesP = graft.Ckpt.eagerPartitioned(
            allNodes.repartition(col("id")))
          var rank = graft.Ckpt.eager(
            nodesP.select(col("id"), lit(1000000000L).as("rank")))
          for (_ <- 1 to 8) {
            val contrib = ed.join(rank.withColumnRenamed("id", "src"), Seq("src"))
              .select(col("dst").as("id"),
                expr("rank div od").as("c"))
              .groupBy("id").agg(sum(col("c")).as("s"))
            val next = graft.Ckpt.eagerPartitioned(
              nodesP.join(contrib, Seq("id"), "left")
                .select(col("id"),
                  (lit(150000000L) + expr("85 * coalesce(s, 0) div 100")).as("rank")))
            graft.Ckpt.drop(rank)
            rank = next
          }
          graft.Ckpt.drop(ed)
          graft.Ckpt.drop(nodesP)
          rank.select(col("id").as(cols(0)), col("rank").as(cols(1)))
        case "bfs" =>
          // undirected hop distances from the literal source id —
          // one-job-per-superstep spine loop (round 18; algorithm +
          // plan-shape notes on [[graft.operators.GraphAlgos.frontierLoop]]),
          // reached nodes in the output, absent source reaches nothing
          val hoist = hoistUndirected()
          val ue = hoist.ue
          val srcId = intArg("bfs")
          // spine = the REACHABLE key universe, not allNodes: the edge
          // frame may be relation-scoped (call bfs over one relation's
          // subgraph), and a full-|V| spine checkpointed per superstep
          // measured 1.7× slower on the _rel variants at sf0.1 — BFS can
          // only reach edge endpoints plus the source. Round 19: the
          // endpoint set is memoized on the hoist (pinned + counted), so
          // the per-call distinct is |V|-scale, not |E|-scale, and its
          // count sizes the loop's partitions (guide §2).
          val spine = hoist.endpoints
            .unionByName(allNodes.filter(col("id") === srcId).select(col("id")))
            .distinct()
            .select(col("id"), when(col("id") === srcId, 0L).as("d"))
          val dists = graft.operators.GraphAlgos.frontierLoop(
            spine, Seq("id"),
            f => ue.join(f, ue("src") === f("id"))
              .select(ue("dst").as("id"), (col("d") + 1).as("cand"))
              .groupBy("id").agg(min("cand").as("cand")),
            improve = false, maxIters = 20, "call bfs()",
            graft.Ckpt.partsFor(spark, hoist.nEndpoints))
          dists.select(col("id").as(cols(0)), col("d").as(cols(1)))
        case "sssp" =>
          // weighted Bellman–Ford delta iteration (the library g_sssp
          // recurrence): deterministic integer weight w(u,v) = 1 +
          // (u + v) mod 2 — no weight column materialized anywhere,
          // exact in any engine. The frontier is the IMPROVED set (a
          // settled node re-enters when its distance drops — weighted
          // relaxation, unlike BFS, can improve a settled node).
          // one-job-per-superstep spine loop (round 18 — see
          // [[graft.operators.GraphAlgos.frontierLoop]]); improve=true
          // is the Bellman–Ford frontier (a settled node re-enters when
          // its distance drops)
          val hoist = hoistUndirected()
          val ue = hoist.ue
          val srcId = intArg("sssp")
          // reachable-endpoints spine, not allNodes — same scoped-edge-
          // frame reasoning (and round-19 memoized endpoint set +
          // volume-derived partitions) as the bfs case above
          val spine = hoist.endpoints
            .unionByName(allNodes.filter(col("id") === srcId).select(col("id")))
            .distinct()
            .select(col("id"), when(col("id") === srcId, 0L).as("d"))
          val dists = graft.operators.GraphAlgos.frontierLoop(
            spine, Seq("id"),
            f => ue.join(f, ue("src") === f("id"))
              .select(ue("dst").as("id"),
                (col("d") + lit(1L) + (ue("src") + ue("dst")) % 2).as("cand"))
              .groupBy("id").agg(min("cand").as("cand")),
            improve = true, maxIters = 24, "call sssp()",
            graft.Ckpt.partsFor(spark, hoist.nEndpoints))
          dists.select(col("id").as(cols(0)), col("d").as(cols(1)))
        case "kcore" =>
          // iterative k-core peel (the library g_kcore recurrence, k as
          // the call argument): each round degrees the surviving edges
          // (co-partitioned groupBy — the hoisted frame stays src-
          // partitioned the whole loop), keeps nodes with >= k
          // neighbors, filters edges to alive×alive (src side
          // co-partitioned semi, dst side broadcast semi). Early exit
          // on an unchanged alive count (the peel is monotone ⊇).
          val k = intArg("kcore")
          val ue = hoistUndirected().ue
          var edges: DataFrame = ue
          var nAlive = -1L
          var converged = false
          var stepN = 0
          val maxIters = 12
          var result: DataFrame = null
          while (stepN < maxIters && !converged) {
            stepN += 1
            val deg = edges.groupBy("src").agg(count(lit(1)).as("c"))
            val alive = graft.Ckpt.deferredPartitioned(
              deg.filter(col("c") >= k).select(col("src").as("id")))
            val n = alive.count()
            if (n == nAlive) {
              converged = true
              // deg this round is over edges among the PREVIOUS alive
              // set, which just proved equal to the current one — the
              // in-core degrees
              result = graft.Ckpt.eager(
                deg.filter(col("c") >= k)
                  .select(col("src").as(cols(0)), col("c").as(cols(1))))
              graft.Ckpt.drop(alive)
            } else {
              nAlive = n
              // dst side: alive is |V|-scale on the FIRST rounds (every
              // endpoint), shrinking as the peel proceeds — the round's
              // edge filter is the SHARED library helper (VERDICT r16:
              // one conf, one gate — the old hard-coded 4M literal here
              // could drift from the library twin's cap), so the
              // broadcast hint rides the measured-count cell gate and
              // degrades to the shuffled form past it.
              val next = graft.Ckpt.eagerPartitioned(
                graft.operators.GraphAlgos.kcoreAliveFilter(edges, alive, n))
              if (edges ne ue) graft.Ckpt.drop(edges)
              edges = next
              graft.Ckpt.drop(alive)
            }
          }
          if (edges ne ue) graft.Ckpt.drop(edges)
          require(converged, s"call kcore(): not converged after $maxIters rounds")
          result
        case "triangles" =>
          // per-node triangle counts (see pairTriangleCounts);
          // zero-participation nodes surface with 0
          val (counts, _) = pairTriangleCounts()
          allNodes.join(counts, Seq("id"), "left")
            .select(col("id").as(cols(0)),
              coalesce(col("n_tri"), lit(0L)).as(cols(1)))
        case "clustering" =>
          // local clustering coefficient through the bridge (round 15):
          // coeff(v) = 2·tri(v)/(d(v)·(d(v)−1)) in parts-per-million
          // integer division (the library g_clustering formula —
          // engine-exact ranking, no float) over the canonical
          // undirected pair set; nodes with pair-degree < 2 have no
          // defined coefficient and are omitted (matching the library)
          val (counts, deg) = pairTriangleCounts()
          deg.filter(col("d") >= 2).join(counts, Seq("id"), "left")
            .select(col("id").as(cols(0)),
              expr("(2000000 * coalesce(n_tri, 0)) div (d * (d - 1))")
                .as(cols(1)))
        case "degreedist" =>
          // out-degree histogram over the scoped directed edge set —
          // the library g_degree_dist shape; nodes with no outgoing
          // edge don't appear (consistent with the library + oracle)
          allEdges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
            .groupBy("deg").agg(count(lit(1)).as("n"))
            .select(col("deg").as(cols(0)), col("n").as(cols(1)))
        case "harmonic" =>
          // landmark harmonic centrality through the bridge (round 15):
          // the library g_harmonic_landmarks recurrence — ONE
          // multi-source BFS whose frontier carries a seed column (all
          // K trees advance in the same superstep joins, K·|V| total
          // messages), ĥ(v) = Σ_s 1/d(s,v) summed in 1e-6 fixed
          // point (integer div — order-free, bit-equal cross-engine).
          // Same frontier-delta discipline as call bfs().
          //
          // Seed set = ids below a band bound: an optional leading int
          // argument (`call harmonic(1000)`), defaulting to the
          // loader's region band (< 2e9). ADVICE r15: on a user-built
          // graph with small dense ids the default band would silently
          // make EVERY node a seed — all-sources instead of landmark
          // harmonic — so the DEFAULT band is guarded loudly below;
          // an explicit argument states intent and skips the guard.
          // Round 19: per-LEVEL multi-source BFS (the library
          // multiSourceBfsLevels helper — the BFS level property bounds
          // the seen-set anti-join to the last two levels), replacing
          // the accumulated anti-join + full-outer-merge shape that
          // re-checkpointed the growing K·|V| frame every superstep.
          val bandArg = args.collectFirst { case IntV(v) => v }
          val band = bandArg.getOrElse(2000000000L)
          val ue = hoistUndirected().ue
          val seeds = allNodes.filter(col("id") < band)
            .select(col("id").as("seed"), col("id"), lit(0L).as("d"))
          val nSeeds = seeds.count()
          if (bandArg.isEmpty) {
            val nOut = allNodes.filter(col("id") >= band).count()
            require(nSeeds > 0 && nOut > 0,
              "call harmonic(): the default seed band (id < 2000000000, the " +
                s"parquet loader's region band) selects $nSeeds of " +
                s"${nSeeds + nOut} nodes on this graph — not a landmark set. " +
                "Pass the seed band explicitly: call harmonic(<id bound>).")
          }
          val dists = graft.operators.GraphAlgos.multiSourceBfsLevels(
            seeds, ue, maxIters = 20,
            graft.Ckpt.partsFor(spark, nSeeds * nNodes()), "call harmonic()")
          dists.filter(col("d") > 0)
            .groupBy("id").agg(sum(expr("1000000 div d")).as("h"))
            .select(col("id").as(cols(0)), col("h").as(cols(1)))
        case "scc" =>
          // strongly connected components over the scoped DIRECTED edge
          // set (round 16) — delegates to the library coloringSCC
          // (FW-BW-Trim; algorithm + scale notes there). comp = max
          // member id: deterministic, so oracle-checkable closed-form.
          // Nodes outside the scoped edge set trim out as singletons in
          // the first pass, so the result covers the whole graph like
          // cc() does.
          val labels = graft.operators.GraphAlgos.coloringSCC(allNodes, allEdges)
          labels.select(col("id").as(cols(0)), col("scc").as(cols(1)))
        case "hits" =>
          // Kleinberg HITS (round 15): 8 two-phase power iterations in
          // max-normalized 1e6 fixed point — the library g_hits
          // recurrence over the scoped edge set. Both orientation
          // copies of the loop-invariant edge frame are hoisted once;
          // each phase's max-rescale probe materializes its DEFERRED
          // checkpoint (one job per phase). max(1, …) keeps an empty
          // scoped edge set at all-zero scores instead of a div/0.
          val eS = graft.Ckpt.eagerPartitioned(allEdges.repartition(col("src")))
          val eD = graft.Ckpt.eagerPartitioned(allEdges.repartition(col("dst")))
          val nodesP = graft.Ckpt.eagerPartitioned(allNodes.repartition(col("id")))
          var hub: DataFrame = nodesP.select(col("id"), lit(1000000L).as("hub"))
          var auth: DataFrame = null
          var prevA: DataFrame = null
          var prevH: DataFrame = null
          for (_ <- 1 to 8) {
            val araw = graft.Ckpt.deferredPartitioned(
              nodesP.join(
                eS.join(hub.withColumnRenamed("id", "src"), Seq("src"))
                  .groupBy(col("dst").as("id")).agg(sum("hub").as("s")),
                Seq("id"), "left")
                .select(col("id"), coalesce(col("s"), lit(0L)).as("r")))
            val mA = math.max(1L, araw.agg(max("r")).head.getLong(0))
            if (prevA != null) graft.Ckpt.drop(prevA)
            prevA = araw
            auth = araw.select(col("id"), expr(s"r * 1000000L div ${mA}L").as("auth"))
            val hraw = graft.Ckpt.deferredPartitioned(
              nodesP.join(
                eD.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
                  .groupBy(col("src").as("id")).agg(sum("auth").as("s")),
                Seq("id"), "left")
                .select(col("id"), coalesce(col("s"), lit(0L)).as("r")))
            val mH = math.max(1L, hraw.agg(max("r")).head.getLong(0))
            if (prevH != null) graft.Ckpt.drop(prevH)
            prevH = hraw
            hub = hraw.select(col("id"), expr(s"r * 1000000L div ${mH}L").as("hub"))
          }
          graft.Ckpt.drop(eS)
          graft.Ckpt.drop(eD)
          auth.join(hub, Seq("id"))
            .select(col("id").as(cols(0)), col("auth").as(cols(1)),
              col("hub").as(cols(2)))
        case "labelprop" =>
          // synchronous label propagation communities (round 15): every
          // node simultaneously adopts the (most-frequent, then
          // smallest) label of its CLOSED neighborhood (self-inclusion
          // — own label counts once; pure neighbor-mode LPA oscillates
          // wholesale on this multipartite graph) each round, for a
          // FIXED 6 rounds — the library labelProp recurrence
          // (GraphAlgos.lpIters; synchronous LPA has no convergence
          // guarantee, so the fixed-round snapshot IS the semantics).
          // Isolated/unscoped nodes keep their own id label (singleton
          // communities). Per superstep: one (node,label) count shuffle
          // over the message stream + the label-count-sized argmax
          // re-key; the argmax covers every node (self leg), so there
          // is no carry-over merge join, and labels come out hash-
          // partitioned by id for the next round's message join.
          val ue = hoistUndirected().ue
          // NOT partition-shrunk (round 19): full-|V| label frame joins
          // the hoist every round — see the cc() note above
          var labels = graft.Ckpt.eagerPartitioned(
            allNodes.select(col("id"), col("id").as("lbl"))
              .repartition(col("id")))
          for (_ <- 1 to 6) {
            val msgs = ue.join(labels, ue("src") === labels("id"))
              .select(ue("dst").as("id"), col("lbl"))
              .unionByName(labels)
            val next = graft.Ckpt.eagerPartitioned(
              msgs.groupBy("id", "lbl").agg(count(lit(1)).as("cnt"))
                .groupBy("id")
                .agg(min(struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("m"))
                .select(col("id"), col("m.l").as("lbl")))
            graft.Ckpt.drop(labels)
            labels = next
          }
          labels.select(col("id").as(cols(0)), col("lbl").as(cols(1)))
        case other =>
          throw new IllegalStateException(s"unreachable: unknown procedure $other")
      }
      val joined = if (st.unitTable) table else st.bindings.crossJoin(table)
      st.copy(bindings = joined,
        env = yields.zip(cols).reverse.toList ::: st.env,
        freshCounter = st.freshCounter + yields.size)

    case RMergeNode(v, lb, props, onCreate, onMatch) =>
      // conditional actions (round 11 — Cypher ON CREATE/MATCH SET):
      // this merge form decides match-vs-create GLOBALLY (see the Merge
      // scaladoc), so exactly one action list fires, re-entering the
      // ordinary set machinery on the post-merge state
      def applyActions(s2: ExecState, as: List[RInstr]): ExecState =
        as.foldLeft(s2)((s, in) => exec(spark, schema, s, in, cfg))
      // Constant-prop lookup: a pushdown-eligible filtered label scan,
      // row-independent by construction (typing enforces const props) —
      // which is what lets Cypher's sequential MERGE collapse to
      // match-or-create-one (see the Merge scaladoc). Matching uses
      // NULL-propagating equality regardless of strict mode: an unset
      // attribute never matches, as in Cypher. The count() actions are
      // metadata-rate: merge, like create, is a mutation point that must
      // know whether it mutates before the fold continues.
      val c = fresh(st)
      val matches = props.foldLeft(st.graph.nodes(lb)) {
        case (df, (f, value)) => df.filter(col(f) === valueLit(value))
      }
      if (matches.count() > 0L) {
        val scan = matches.select(col("id").as(c))
        applyActions(st.copy(
          bindings = if (st.unitTable) scan else st.bindings.crossJoin(scan),
          env = (v, c) :: st.env, freshCounter = st.freshCounter + 1), onMatch)
      }
      else if (st.bindings.isEmpty)
        // zero rows merge nothing (Cypher: MERGE runs per row) — the
        // binding column still appears, typed and empty; neither action
        // fires (no row merged anything)
        st.copy(bindings = st.bindings.withColumn(c, lit(null).cast(LongType)),
          env = (v, c) :: st.env, freshCounter = st.freshCounter + 1)
      else {
        val id = st.nextId
        val attrs = schema.nodeAttrs(lb)
        val newNode = spark.range(1).select(
          lit(id).as("id") +: attrs.map { case (f, tp) =>
            props.collectFirst { case (`f`, value) => valueLit(value).as(f) }
              .getOrElse(lit(null).cast(PropertyGraph.sparkType(tp)).as(f))
          }: _*)
        val g2 = st.graph.copy(nodes = st.graph.nodes.updated(
          lb, st.graph.nodes(lb).unionByName(newNode)))
        applyActions(
          bump(st.copy(graph = g2, bindings = st.bindings.withColumn(c, lit(id)),
            env = (v, c) :: st.env, nextId = id + 1,
            freshCounter = st.freshCounter + 1), Left(lb), cfg), onCreate)
      }

    case RCreateEdge(sv, sl, rl, tv, tl, props) =>
      val key = (sl, rl, tl)
      val old = st.graph.edges(key)
      // inline edge properties evaluated PER ROW (they may reference
      // node attributes — they ride the same joins as where/set)
      val (joinedC, refsC) = joinAttrs(st, props.map(_._3))
      val newEdges0 = joinedC.select(
        col(st.colOf(sv)).as("src") +: col(st.colOf(tv)).as("dst") +:
          props.map { case (f, _, te) =>
            expr(sql(te, refsC, st, cfg.strict)).as(f) }: _*)
      val attrNames = old.columns.drop(2).toSeq // declared attr columns
      val withAll = attrNames.foldLeft(newEdges0) { (df, f) =>
        if (df.columns.contains(f)) df
        else df.withColumn(f, lit(null).cast(old.schema(f).dataType))
      }
      // set semantics on (src,dst) — reference graphstruct.ml:30-32.
      // Among the new rows, a pair created by several rows resolves
      // conflicting prop values by max (the node-set rule); a pair that
      // ALREADY exists keeps its stored attrs — re-create is a no-op
      // (test3.q), existing rows winning through the per-pair
      // stored-wins aggregate below.
      //
      // Round 16 (pre-existing since round 10, surfaced by the r15
      // judge's suite run): the previous spelling — `old.unionByName(
      // newDistinct.join(old, anti))` — referenced `old` TWICE per
      // create, so k same-type creates built a 2^k-node plan tree and
      // Catalyst ANALYSIS (DeduplicateRelations' duplicate-relation
      // renewal) went exponential: test2.q's 13-create chains spent
      // ~15 MINUTES in the analyzer before one task ran. One union +
      // one keyed aggregate references `old` exactly once — plan depth
      // linear in creates, result identical: old rows carry flag 1 and
      // the per-pair max(struct(flag, attrs…)) keeps the stored row
      // when present (flag dominates the comparison), the max-resolved
      // new row otherwise.
      val newDistinct =
        if (attrNames.isEmpty) withAll.dropDuplicates("src", "dst")
        else withAll.groupBy("src", "dst").agg(
          max(attrNames.head).as(attrNames.head),
          attrNames.tail.map(f => max(f).as(f)): _*)
      val e2 =
        if (attrNames.isEmpty)
          old.unionByName(newDistinct).dropDuplicates("src", "dst")
        else {
          val flagged = old.withColumn("%stored", lit(1))
            .unionByName(newDistinct.withColumn("%stored", lit(0)))
          val w = col("%w")
          flagged.groupBy("src", "dst")
            .agg(max(struct(col("%stored") +: attrNames.map(col): _*)).as("%w"))
            .select(col("src") +: col("dst") +:
              attrNames.map(f => w.getField(f).as(f)): _*)
        }
      bump(st.copy(graph = st.graph.copy(edges = st.graph.edges.updated(key, e2))),
        Right(key), cfg)

    case RMatchEdge(sv, sl, rl, tv, tl, rv) =>
      val edf = st.graph.edges((sl, rl, tl))
      val joined = st.bindings.join(edf,
        st.bindings(st.colOf(sv)) === edf("src") && st.bindings(st.colOf(tv)) === edf("dst"),
        "left_semi")
      st.copy(bindings = joined,
        edgeEnv = rv.fold(st.edgeEnv)(x =>
          (x, (st.colOf(sv), st.colOf(tv))) :: st.edgeEnv))

    case RMatchEdgeAlt(sv, _, tv, _, frames) =>
      // any-of existence: semi-join against the union of the resolved
      // frames (flipped ones read dst-as-src); left_semi ignores
      // multiplicity, so no pair dedup is needed on this path
      val pairsAlt = frames.map { case (key, flipped) =>
        val df = st.graph.edges(key)
        if (flipped) df.select(col("dst").as("src"), col("src").as("dst"))
        else df.select(col("src"), col("dst"))
      }.reduce(_ unionByName _)
      st.copy(bindings = st.bindings.join(pairsAlt,
        st.bindings(st.colOf(sv)) === pairsAlt("src") &&
          st.bindings(st.colOf(tv)) === pairsAlt("dst"),
        "left_semi"))

    case RMatchEdgeUndir(sv, sl, rl, tv, tl, fwd, rev) =>
      // either-direction existence: semi-join against the union of the
      // declared orientation frames (rev read dst-as-src). left_semi
      // ignores multiplicity, so no pair dedup is needed here — the
      // fused PExpandUndir path is where the dedup matters.
      val fdf = if (fwd) Some(st.graph.edges((sl, rl, tl))
        .select(col("src"), col("dst"))) else None
      val rdf = if (rev) Some(st.graph.edges((tl, rl, sl))
        .select(col("dst").as("src"), col("src").as("dst"))) else None
      val pairs = (fdf.toSeq ++ rdf.toSeq).reduce(_ unionByName _)
      val joinedU = st.bindings.join(pairs,
        st.bindings(st.colOf(sv)) === pairs("src") &&
          st.bindings(st.colOf(tv)) === pairs("dst"),
        "left_semi")
      st.copy(bindings = joinedU)

    case RDeleteNode(v, lbl) =>
      val cs = st.env.collect { case (`v`, c) => c }
      val doomed = st.bindings.select(col(cs.head).as("id")).distinct()
      val n2 = st.graph.nodes(lbl).join(doomed, Seq("id"), "left_anti")
      // only relation types whose endpoints can reference this label
      val e2 = st.graph.edges.map { case (key @ (sl, _, tl), df) =>
        var d = df
        if (sl == lbl) d = d.join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        if (tl == lbl) d = d.join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        key -> d
      }
      val g2 = st.graph.copy(nodes = st.graph.nodes.updated(lbl, n2), edges = e2)
      // rel bindings aliasing a dropped column are retired — a later
      // access fails loudly as dangling (edgeColsOf)
      val csSet = cs.toSet
      bump(st.copy(graph = g2, bindings = st.bindings.drop(cs: _*),
        env = st.env.filterNot(_._1 == v),
        edgeEnv = st.edgeEnv.filterNot { case (_, (a, b)) => csSet(a) || csSet(b) }),
        Left(lbl), cfg)

    case Typing.RDeleteAnyNode(v) =>
      // unlabeled delete (round 14): the binding carries only ids — ids
      // are globally unique, so anti-joining EVERY label frame removes
      // exactly the owning rows (other frames lose nothing), and every
      // relation frame drops incident edges on both endpoints. The
      // doomed id set feeds one anti-join per frame, so it materializes
      // once through the drain ledger instead of recomputing per frame.
      // The hidden %label_ companion column unbinds with its owner so
      // the dead string column doesn't ride through later cross joins.
      val comp = s"%label_$v"
      val cs = st.env.collect { case (`v`, c) => c }
      val csComp = st.env.collect { case (`comp`, c) => c }
      val doomed = graft.Ckpt.eager(
        st.bindings.select(col(cs.head).as("id")).distinct())
      val n2 = st.graph.nodes.map { case (lbl, df) =>
        lbl -> df.join(doomed, Seq("id"), "left_anti") }
      val e2 = st.graph.edges.map { case (key, df) =>
        key -> df
          .join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      }
      val csSet = cs.toSet
      val st2 = st.copy(graph = st.graph.copy(nodes = n2, edges = e2),
        bindings = st.bindings.drop(cs ++ csComp: _*),
        env = st.env.filterNot(e => e._1 == v || e._1 == comp),
        edgeEnv = st.edgeEnv.filterNot { case (_, (a, b)) => csSet(a) || csSet(b) })
      // every frame mutated: advance each one's checkpoint cadence
      val stE = st.graph.edges.keys.foldLeft(st2)((s2, k) => bump(s2, Right(k), cfg))
      st.graph.nodes.keys.foldLeft(stE)((s2, l) => bump(s2, Left(l), cfg))

    case RDeleteEdge(sv, sl, rl, tv, tl) =>
      val key = (sl, rl, tl)
      val victims = st.bindings.select(
        col(st.colOf(sv)).as("src"), col(st.colOf(tv)).as("dst")).distinct()
      val e2 = st.graph.edges(key).join(victims, Seq("src", "dst"), "left_anti")
      bump(st.copy(graph = st.graph.copy(edges = st.graph.edges.updated(key, e2))),
        Right(key), cfg)

    case RReturn(vs) =>
      val projected = st.bindings.select(vs.map(v => col(st.colOf(v)).as(v)): _*)
      // scope restriction drops every rel binding (not returnable)
      st.copy(bindings = projected, env = vs.map(v => (v, v)), edgeEnv = Nil)

    case RReturnExt(pairs, order, skip, limit, distinct) =>
      // items are named positionally by their resolved pair name
      // (explicit alias or derived outName), so duplicate structural
      // items with distinct aliases each get their own column
      val shaped = shapeExt(st, pairs, order, skip, limit, distinct, cfg.strict)
      // engine env lists EVERY output column (the final projection walks
      // it); the TYPING env is what restricts later instructions to the
      // plain-variable bindings, so the extra name entries are inert
      st.copy(bindings = shaped, env = pairs.map { case (_, a) => (a, a) },
        edgeEnv = Nil)

    case RWith(aliasedItems, order, skip, limit, distinct) =>
      // Same shaping as extended return, but the fold CONTINUES: each
      // item lands in a fresh internal binding column and re-binds under
      // its alias — plain variables stay node bindings, attr/agg items
      // become scalar bindings (virtual labels) whose `.val` reads the
      // column itself. Shaping cost is identical to the equivalent
      // return: one hash aggregate when aggregating (map-side partial
      // free from Catalyst), TakeOrderedAndProject for order+limit.
      val items = aliasedItems.map(_._1)
      val base = st.freshCounter
      val cols = items.indices.map(i => s"__b${base + i}").toList
      // name items by POSITION (duplicate structural items get their own
      // columns); order keys resolve to their first occurrence — typing
      // guarantees agg/distinct keys are items, and duplicates hold
      // identical values so either column orders the same
      val shaped = shapeExt(st, items.zip(cols), order, skip, limit, distinct,
        cfg.strict)
      // with-scalars have binding-NULL semantics (like optional-match
      // targets): a NULL value — e.g. sum over an empty global group —
      // fails predicates instead of raising under strict mode. Variable
      // items keep their nullability.
      val nullable2: Set[String] = aliasedItems.zip(cols).flatMap {
        case ((RRetVar(v), _), c) =>
          if (st.nullable(st.colOf(v))) Some(c) else None
        case ((_, _), c) => Some(c)
      }.toSet
      st.copy(bindings = shaped,
        env = aliasedItems.zip(cols).map { case ((_, a), c) => (a, c) },
        freshCounter = base + items.size,
        nullable = nullable2,
        edgeEnv = Nil) // with resets the scope; rel bindings don't survive it

    case Typing.RCallSub(imports, inner, pairs, order, skip, limit, distinct) =>
      // Cypher CALL subquery (round 15): run the inner match/where plan
      // ONCE over the distinct imported tuples (the innerWitness
      // distinct-probe trick — per-row semantics at per-distinct-tuple
      // cost), shape its return PER TUPLE (grouping keys always include
      // the imports; order/skip/limit page via a keyed row_number
      // window — the per-key top-k no other clause expresses), and join
      // the shaped rows back on the imported columns. Zero subquery
      // rows drop the input row (inner join), EXCEPT when every item
      // aggregates — Cypher's one-row-per-invocation rule, padded in
      // shapeCallSub. New bindings append to the outer scope.
      val (sub, boundCols) = innerWitness(spark, schema, st, inner, imports, cfg)
      val base = sub.freshCounter
      val cols = pairs.indices.map(k => s"__b${base + k}").toList
      val probe = st.bindings.select(boundCols.map(col): _*).distinct()
      val shaped = shapeCallSub(sub, boundCols, pairs.map(_._1).zip(cols),
        order, skip, limit, distinct, cfg.strict, probe)
      val joinedBack =
        if (imports.isEmpty) st.bindings.crossJoin(shaped)
        else st.bindings.join(shaped, boundCols)
      st.copy(bindings = joinedBack,
        env = pairs.map(_._2).zip(cols).toList ::: st.env,
        freshCounter = base + pairs.size,
        nullable = st.nullable ++ cols)

    case ROptPath(inner, bound, freshVars) =>
      // All-or-nothing witness expansion (Cypher OPTIONAL MATCH): run
      // the pattern tail as a sub-plan over the distinct bound tuples,
      // then LEFT-join the witnesses back — the same broadcast/shuffle
      // hash join as match-edge, just outer. One row per witness; rows
      // with no complete witness bind ALL fresh variables to NULL (never
      // a partial path). A NULL bound column (an earlier unmatched
      // optional) never equals a witness key and binds NULL too.
      val (sub, boundCols) = innerWitness(spark, schema, st, inner, bound, cfg)
      val freshCols = freshVars.map { case (v, _) => sub.colOf(v) }.distinct
      val wAliases = boundCols.indices.map(k => s"__w$k").toList
      val witness = sub.bindings.select(
        boundCols.zip(wAliases).map { case (bc, a) => col(bc).as(a) } ++
          freshCols.map(col): _*)
      val cond = boundCols.zip(wAliases)
        .map { case (bc, a) => st.bindings(bc) === witness(a) }.reduce(_ && _)
      val joined = st.bindings.join(witness, cond, "left").drop(wAliases: _*)
      st.copy(bindings = joined,
        env = freshVars.reverse.map { case (v, _) => (v, sub.colOf(v)) } ::: st.env,
        freshCounter = sub.freshCounter,
        nullable = st.nullable ++ freshCols)

    case RExists(inner, bound) =>
      // Positive pattern predicate: keep rows WITH a witness — the same
      // distinct-probe witness sub-plan as not-exists, joined left_semi
      // (match-edge's join type, but existential: no bindings, no row
      // multiplication). A NULL bound column never equals a witness key
      // and drops, the complement of its not-exists survival.
      val (subE, boundColsE) = innerWitness(spark, schema, st, inner, bound, cfg)
      val wAliasesE = boundColsE.indices.map(k => s"__w$k").toList
      val witnessE = subE.bindings.select(
        boundColsE.zip(wAliasesE).map { case (bc, a) => col(bc).as(a) }: _*)
      val condE = boundColsE.zip(wAliasesE)
        .map { case (bc, a) => st.bindings(bc) === witnessE(a) }.reduce(_ && _)
      st.copy(bindings = st.bindings.join(witnessE, condE, "left_semi"),
        freshCounter = subE.freshCounter)

    case RNotExists(inner, bound) =>
      // The mirror of match-edge's left_semi: keep rows with NO witness.
      // Witness keys are the bound columns only (inner declarations are
      // existential); a NULL bound column trivially has no witness and
      // survives, consistent with the optional-match NULL semantics.
      val (sub, boundCols) = innerWitness(spark, schema, st, inner, bound, cfg)
      val wAliases = boundCols.indices.map(k => s"__w$k").toList
      val witness = sub.bindings.select(
        boundCols.zip(wAliases).map { case (bc, a) => col(bc).as(a) }: _*)
      val cond = boundCols.zip(wAliases)
        .map { case (bc, a) => st.bindings(bc) === witness(a) }.reduce(_ && _)
      st.copy(bindings = st.bindings.join(witness, cond, "left_anti"),
        freshCounter = sub.freshCounter)

    case RVarPath(sv, key, lo, hi, tv, dist, undir, pathV, allPaths) =>
      // Both endpoints are bound (normalize emits the node instruction
      // first); constrain existing rows to pairs in the bounded closure.
      // both sides bound: seed the closure from the source side's
      // distinct values (either side works; src keeps the expansion
      // forward), then re-constrain both endpoints as before
      val seeds = st.bindings.select(col(st.colOf(sv)).as("seed")).distinct()
      if (dist.isEmpty && pathV.isEmpty) {
        val reach = varPathReachSeeded(st.graph, key, lo, hi, seeds,
          seedIsSrc = true, dist = false, undir = undir)
        val joined = st.bindings.join(reach,
          st.bindings(st.colOf(sv)) === reach("src") &&
            st.bindings(st.colOf(tv)) === reach("dst"),
          "left_semi")
        st.copy(bindings = joined)
      } else {
        // same row filter, but each surviving row additionally binds
        // the pair's minimal hop count and/or canonical witness list —
        // an inner equi-join against the (src, dst, hops[, path]) frame
        // (exactly one row per pair, so row multiplicity is unchanged
        // vs the semi join; under allShortestPaths the frame holds one
        // row per MINIMAL-HOP WALK, so the join fans each binding row
        // out per witness — Cypher's enumeration semantics)
        val cD = dist.map(_ => fresh(st))
        val cP = pathV.map(_ => s"${fresh(st)}_p")
        val reach0 = varPathReachSeeded(st.graph, key, lo, hi, seeds,
          seedIsSrc = true, dist = dist.nonEmpty, undir = undir,
          path = pathV.nonEmpty, allPaths = allPaths)
        val reach = reach0.select(
          col("src") +: col("dst") +:
            (cD.map(c => col("hops").as(c)).toSeq ++
              cP.map(c => col("path").as(c)).toSeq): _*)
        val joined0 = st.bindings.join(reach,
          st.bindings(st.colOf(sv)) === reach("src") &&
            st.bindings(st.colOf(tv)) === reach("dst"))
          .drop("src", "dst")
        // hidden `%rels_<p>` hop-label companion, as in the fused
        // PExpandPath case (pruned when unread)
        val cR = cP.map(c => s"${c}r")
        val joined = cP.fold(joined0)(c => joined0.withColumn(cR.get,
          array_repeat(lit(key._2), size(col(c)) - 1)))
        st.copy(bindings = joined,
          env = pathV.zip(cR).map { case (p, c) => (s"%rels_$p", c) }.toList :::
            pathV.zip(cP).toList ::: dist.zip(cD).toList ::: st.env,
          freshCounter = st.freshCounter + 1)
      }

    case Typing.RNamedPath(p, segs) =>
      // Pattern-order concatenation of the per-segment witnesses (round
      // 13): reverse hops flip their storage-ordered witness; each
      // segment after the first drops its leading junction node. Pure
      // per-row array projections — no join, no shuffle, row
      // multiplicity unchanged; a NULL segment (inside an optional
      // witness) propagates NULL through concat, the all-or-nothing
      // semantics. The `%rels_<p>` companion is the per-segment label
      // repeated hop-count (size-1) times, concatenated.
      def segCol(sv: String, rev: Boolean): Column = {
        val c = col(st.colOf(sv))
        if (rev) reverse(c) else c
      }
      val nodesCol = segs.tail.foldLeft(segCol(segs.head._1, segs.head._3)) {
        case (acc, (sv, _, rev)) =>
          val c = segCol(sv, rev)
          concat(acc, slice(c, lit(2), size(c) - 1))
      }
      val relsCol = segs.map { case (sv, rl, _) =>
        array_repeat(lit(rl), size(col(st.colOf(sv))) - 1)
      }.reduce(concat(_, _))
      val base = fresh(st)
      val (cP2, cR2) = (s"${base}_p", s"${base}_r")
      st.copy(
        bindings = st.bindings.withColumn(cP2, nodesCol).withColumn(cR2, relsCol),
        env = (s"%rels_$p", cR2) :: (p, cP2) :: st.env,
        freshCounter = st.freshCounter + 1)

    case RWhere(te) =>
      val (joined, refs) = joinAttrs(st, te :: Nil)
      val filtered = joined.filter(expr(sql(te, refs, st, cfg.strict)))
      st.copy(bindings = filtered.select(st.bindings.columns.map(col): _*))

    case RUnwind(tes, alias, _) =>
      // Per row, one output row per list element — explode over the
      // per-row array of compiled element expressions: a codegen'd
      // generator inheriting the scan's partitioning (no shuffle), the
      // same shape as the multimodal frame-sample explode. Elements ride
      // the where/set attribute joins; the new column is a scalar
      // binding with with-scalar NULL semantics (null-guarded under
      // strict mode).
      val (joinedU2, refsU) = joinAttrs(st, tes)
      val c2 = fresh(st)
      val elems = tes.map(te => expr(sql(te, refsU, st, cfg.strict)))
      val unwound = joinedU2.select(
        st.bindings.columns.map(col) :+ explode(array(elems: _*)).as(c2): _*)
      st.copy(bindings = unwound, env = (alias, c2) :: st.env,
        freshCounter = st.freshCounter + 1,
        nullable = st.nullable + c2)

    case RUnwindVar(v, alias, elemTp) =>
      // one row per element of the with-bound list: the same codegen'd
      // Generate as literal unwind, over the stored array column. The
      // element binding is a plain with-scalar; a NULL list (an
      // optional-null'd with chain) drops its rows like Cypher's
      // UNWIND NULL.
      val c2 = fresh(st)
      val unwound = st.bindings.select(
        st.bindings.columns.map(col) :+ explode(col(st.colOf(v))).as(c2): _*)
      st.copy(bindings = unwound, env = (alias, c2) :: st.env,
        freshCounter = st.freshCounter + 1,
        nullable = st.nullable + c2)

    case RUnwindExpr(te, alias, _) =>
      // general list-expression unwind (`unwind range(1, n.x) as i`):
      // attrs in the expression ride the standard joins; same explode
      // shape as the other unwind forms. An EMPTY per-row list yields
      // zero rows for that binding row (Cypher), which explode gives.
      val (joinedE, refsE) = joinAttrs(st, te :: Nil)
      val c2 = fresh(st)
      val unwound = joinedE.select(
        st.bindings.columns.map(col) :+
          explode(expr(sql(te, refsE, st, cfg.strict))).as(c2): _*)
      st.copy(bindings = unwound, env = (alias, c2) :: st.env,
        freshCounter = st.freshCounter + 1,
        nullable = st.nullable + c2)

    case RUnion(_) =>
      throw new IllegalStateException(
        "union marker reached the instruction executor — run() splits branches")

    case RSet(v, lbl, f, tp, te) =>
      val (joined, refs) = joinAttrs(st, te :: Nil)
      val vc = st.colOf(v)
      // per-row evaluation (spec, not the reference's first-row-only bug);
      // conflicting per-node values resolved deterministically by max.
      val upd = joined
        .select(col(vc).as("id"), expr(sql(te, refs, st, cfg.strict)).as("__newv"))
        .groupBy("id").agg(max("__newv").as("__newv"))
      val n2 = st.graph.nodes(lbl)
        .join(upd, Seq("id"), "left")
        .withColumn(f, coalesce(col("__newv"), col(f)))
        .drop("__newv")
      bump(st.copy(graph = st.graph.copy(nodes = st.graph.nodes.updated(lbl, n2))), Left(lbl), cfg)

    case RRemove(v, lbl, f) =>
      // NULL-out the attribute on the bound nodes: a marker semi-join
      // against the distinct bound ids, then a conditional projection —
      // the set machinery minus the value computation (NULL bound ids,
      // unmatched optionals, drop in the join)
      val vcR = st.colOf(v)
      val victimsR = st.bindings.select(col(vcR).as("id")).na.drop().distinct()
        .withColumn("__rm", lit(true))
      val n2R = st.graph.nodes(lbl)
        .join(victimsR, Seq("id"), "left")
        .withColumn(f, when(col("__rm").isNotNull, lit(null)).otherwise(col(f)))
        .drop("__rm")
      bump(st.copy(graph = st.graph.copy(nodes = st.graph.nodes.updated(lbl, n2R))),
        Left(lbl), cfg)

    case RRemoveEdge(v, key, f) =>
      // edge twin through the rel binding's (src, dst) identity
      val (cSR, cDR) = st.edgeColsOf(v)
      val victimsE = st.bindings.select(col(cSR).as("src"), col(cDR).as("dst"))
        .na.drop().distinct().withColumn("__rm", lit(true))
      val e2R = st.graph.edges(key)
        .join(victimsE, Seq("src", "dst"), "left")
        .withColumn(f, when(col("__rm").isNotNull, lit(null)).otherwise(col(f)))
        .drop("__rm")
      bump(st.copy(graph = st.graph.copy(edges = st.graph.edges.updated(key, e2R))),
        Right(key), cfg)

    case RSetEdge(v, key, f, _, te) =>
      // `set x.f = e` through a rel binding: the node-set join-update
      // applied to the edge frame on its (src, dst) identity — per-row
      // evaluation, max conflict resolution.
      val (joinedS, refsS) = joinAttrs(st, te :: Nil)
      val (cS, cD) = st.edgeColsOf(v)
      val upd = joinedS
        .select(col(cS).as("src"), col(cD).as("dst"),
          expr(sql(te, refsS, st, cfg.strict)).as("__newv"))
        .groupBy("src", "dst").agg(max("__newv").as("__newv"))
      val e2 = st.graph.edges(key)
        .join(upd, Seq("src", "dst"), "left")
        .withColumn(f, coalesce(col("__newv"), col(f)))
        .drop("__newv")
      bump(st.copy(graph = st.graph.copy(edges = st.graph.edges.updated(key, e2))),
        Right(key), cfg)

    case RDeleteEdgeBinding(v, key) =>
      // `delete x`: remove the bound (src, dst) pairs; the table keeps
      // its rows (an edge binding owns no column)
      val (cS, cD) = st.edgeColsOf(v)
      val victims = st.bindings.select(col(cS).as("src"), col(cD).as("dst")).distinct()
      val e2 = st.graph.edges(key).join(victims, Seq("src", "dst"), "left_anti")
      bump(st.copy(graph = st.graph.copy(edges = st.graph.edges.updated(key, e2)),
        edgeEnv = st.edgeEnv.filterNot(_._1 == v)), Right(key), cfg)
  }

  /** The shared return/with shaping: attribute joins, aggregation
    * (plain items = grouping keys), distinct, order, skip, limit. `name`
    * assigns each item (and, transitively, each item-typed order key)
    * its output column. Attribute items/keys ride the same per-variable
    * left joins the where/set path uses; everything below stays one
    * Catalyst plan. `skip` (Cypher's OFFSET) drops rows after ordering
    * and before limit — Spark plans offset+limit into the same global
    * limit operator (the driver fetches skip+n rows, discards skip), so
    * pagination stays a top-k shape, not a global sort. */
  /** Integer avg = sum div count (truncating), computed with Spark's
    * IntegralDivide so the quotient stays in exact int64 arithmetic
    * for ALL long sums — the earlier (s - s%n)/n double route rounded
    * once |sum| exceeded 2^53 (ADVICE r08), a range 100 TB-scale sums
    * reach routinely. Same truncation rule as the expression language's
    * `div` (sql compiler below) and the DuckDB oracle's integer `//`. */
  private def intAvg(s: Column, n: Column): Column =
    call_function("div", s, n)

  /** One aggregate item's Column (shared by [[shapeExt]] and
    * [[shapeCallSub]]). Distinct aggregates plan as Spark's standard
    * two-phase distinct aggregation (partial dedup before the final agg
    * — no row ships twice); min/max over distinct values equal plain
    * min/max. */
  private def aggExpr(fn: AggFn, c: Column, dist: Boolean): Column = (fn, dist) match {
    case (AggCount, true) => count_distinct(c)
    case (AggSum, true)   => sum_distinct(c)
    case (AggAvg, true)   => intAvg(sum_distinct(c), count_distinct(c))
    case (AggCount, _)    => count(c)
    case (AggSum, _)      => sum(c)
    case (AggAvg, _)      => intAvg(sum(c), count(c))
    case (AggMin, _)      => min(c)
    case (AggMax, _)      => max(c)
    // sorted concat (round 11): ascending order makes the result a
    // pure function of the group's value BAG (set under distinct) —
    // row order, partitioning, and merge order can't perturb it.
    // collect_list/_set keep map-side partial aggregation; the sort
    // happens once per group at the final merge.
    case (AggStrJoin, false) => array_join(array_sort(collect_list(c)), ",")
    case (AggStrJoin, true)  => array_join(array_sort(collect_set(c)), ",")
    // list collect (round 11): same sorted-ascending determinism rule
    case (AggCollect, false) => array_sort(collect_list(c))
    case (AggCollect, true)  => array_sort(collect_set(c))
    // exact LOW median (round 11): element (n-1) div 2 of the sorted
    // group — deterministic, no interpolation. NULL on an empty
    // (global) group like sum/min/max — the when-guard keeps ANSI
    // element_at from raising on index 0 there. No map-side partial
    // form: the group's values gather at the merge (exact-median
    // cost; the sketch-based twin is p_events_quantiles_approx).
    case (AggMedian, d) =>
      val sorted = array_sort(if (d) collect_set(c) else collect_list(c))
      when(size(sorted) === 0, lit(null).cast("bigint"))
        .otherwise(element_at(sorted, ((size(sorted) + 1) / 2).cast("int")))
  }

  /** Shape a call subquery's final return PER IMPORTED TUPLE (round
    * 15): like [[shapeExt]], but grouping keys always include the
    * imported key columns, and order/skip/limit page per tuple via a
    * keyed row_number window instead of globally. `probe` is the
    * distinct imported-tuple frame — when every item aggregates,
    * Cypher's one-row-per-invocation rule pads tuples whose subquery
    * matched nothing (count/sum 0; min/max/avg/median NULL; a
    * documented deviation: collect pads NULL, not []). An uncorrelated
    * subquery (no imports) takes the global orderBy/offset/limit path —
    * a row_number window over an empty partition list would
    * single-thread the frame. */
  private def shapeCallSub(sub: ExecState, keyCols: List[String],
      namedItems: List[(RRet, String)], order: List[(RRet, Boolean)],
      skip: Option[Long], limit: Option[Long], distinct: Boolean,
      strict: Boolean, probe: DataFrame): DataFrame = {
    val items = namedItems.map(_._1)
    val attrRefs = (items ++ order.map(_._1)).flatMap(collectRetAttrs).distinct
    val (joined, refs) = joinAttrs(sub, attrRefs.map(a => a: TExpr))
    def leafCol(it: RRet): Column = it match {
      case RRetVar(v)           => col(sub.colOf(v))
      case RRetAttr(v, _, f, _) => col(refs((v, f)))
      case RRetExpr(te)         => expr(sql(te, refs, sub, strict))
      case _: RRetAgg           => throw new IllegalStateException("agg leaf")
    }
    val keys = keyCols.map(col)
    def page(df: DataFrame, orderCols: Seq[Column]): DataFrame =
      if (skip.isEmpty && limit.isEmpty) df
      else if (keyCols.isEmpty) {
        val sorted = if (orderCols.isEmpty) df else df.orderBy(orderCols: _*)
        val skipped = skip.fold(sorted)(n => sorted.offset(n.toInt))
        limit.fold(skipped)(n => skipped.limit(n.toInt))
      } else {
        val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
        val lo = skip.getOrElse(0L)
        val hi = limit.map(lo + _)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") > lo &&
            hi.fold(lit(true))(h => col("__rn") <= h))
          .drop("__rn")
      }
    // aggregated/distinct shapes order on output names (typing: keys
    // are items); the plain shape admits arbitrary keys, computed as
    // hidden helper columns dropped after the page
    def name(it: RRet): String = namedItems.find(_._1 == it).get._2
    def orderOnNames: Seq[Column] = order.map { case (k, asc) =>
      if (asc) col(name(k)).asc else col(name(k)).desc }
    val hasAgg = items.exists(_.isInstanceOf[RRetAgg])
    if (hasAgg) {
      val groups = keys ++ namedItems.collect {
        case (it @ (_: RRetVar | _: RRetAttr | _: RRetExpr), a) => leafCol(it).as(a) }
      val aggs = namedItems.collect { case (RRetAgg(fn, arg, d), a) =>
        aggExpr(fn, leafCol(arg), d).as(a) }
      val grouped = joined.groupBy(groups: _*).agg(aggs.head, aggs.tail: _*)
      val padded =
        if (items.forall(_.isInstanceOf[RRetAgg]) && keyCols.nonEmpty)
          probe.join(grouped, keyCols, "left")
            .select(keys ++ namedItems.map {
              case (RRetAgg(fn, _, _), a) if fn == AggCount || fn == AggSum =>
                coalesce(col(a), lit(0L)).as(a)
              case (_, a) => col(a)
            }: _*)
        else grouped
      page(padded, orderOnNames)
    } else if (distinct) {
      val projected = joined.select(keys ++ namedItems.map {
        case (it, a) => leafCol(it).as(a) }: _*).dropDuplicates()
      page(projected, orderOnNames)
    } else {
      val okCols = order.indices.map(k => s"__ok$k").toList
      val projected = joined.select(keys ++
        namedItems.map { case (it, a) => leafCol(it).as(a) } ++
        order.zip(okCols).map { case ((k, _), c) => leafCol(k).as(c) }: _*)
      val ordered = page(projected, order.zip(okCols).map { case ((_, asc), c) =>
        if (asc) col(c).asc else col(c).desc })
      ordered.drop(okCols: _*)
    }
  }

  private def shapeExt(st: ExecState, namedItems: List[(RRet, String)],
      order: List[(RRet, Boolean)], skip: Option[Long], limit: Option[Long],
      distinct: Boolean, strict: Boolean): DataFrame = {
    val items = namedItems.map(_._1)
    // order keys equal to an item resolve to its FIRST occurrence —
    // structurally-equal duplicates hold identical values, so either
    // column orders the same. Item projection itself is positional
    // (namedItems zip), so `return n.x as a, n.x as b` names both.
    def name(it: RRet): String = namedItems.find(_._1 == it).get._2
    def page(df: DataFrame): DataFrame = {
      val skipped = skip.fold(df)(n => df.offset(n.toInt))
      limit.fold(skipped)(n => skipped.limit(n.toInt))
    }
    val attrRefs = (items ++ order.map(_._1)).flatMap(collectRetAttrs).distinct
    val (joined, refs) = joinAttrs(st, attrRefs.map(a => a: TExpr))
    def leafCol(it: RRet): Column = it match {
      case RRetVar(v)             => col(st.colOf(v))
      case RRetAttr(v, _, f, _)   => col(refs((v, f)))
      // full-expression item / order key / aggregate argument: the same
      // compiled-SQL column the where/set path uses (strict-mode
      // unset-attr guards included) — stays inside the one projection
      case RRetExpr(te)           => expr(sql(te, refs, st, strict))
      case _: RRetAgg             => throw new IllegalStateException("agg leaf")
    }
    val hasAgg = items.exists(_.isInstanceOf[RRetAgg])
    if (!hasAgg && !distinct) {
      // order pre-projection (keys may reference non-returned attrs);
      // orderBy+limit plans as TakeOrderedAndProject — the distributed
      // top-n, no global sort materialization — which is the shape
      // that survives scale.
      val sorted =
        if (order.isEmpty) joined
        else joined.orderBy(order.map { case (k, asc) =>
          if (asc) leafCol(k).asc else leafCol(k).desc }: _*)
      page(sorted).select(namedItems.map { case (it, a) => leafCol(it).as(a) }: _*)
    } else if (!hasAgg) {
      // distinct: project → dedup → order → limit. Typing guarantees
      // order keys are items, so ordering happens on out names AFTER
      // the dedup (SQL DISTINCT semantics); the dedup is one hash
      // aggregate on the projected columns and the order+limit still
      // plans as TakeOrderedAndProject above it.
      val projected = joined
        .select(namedItems.map { case (it, a) => leafCol(it).as(a) }: _*)
        .dropDuplicates()
      val sorted =
        if (order.isEmpty) projected
        else projected.orderBy(order.map { case (k, asc) =>
          if (asc) col(name(k)).asc else col(name(k)).desc }: _*)
      page(sorted)
    } else {
      // plain items are the grouping keys (SQL semantics); zero plain
      // items = global aggregate. Partial (map-side) aggregation comes
      // free from Catalyst.
      val groups = namedItems.collect { case (it @ (_: RRetVar | _: RRetAttr | _: RRetExpr), a) =>
        leafCol(it).as(a) }
      val aggs = namedItems.collect { case (RRetAgg(fn, arg, dist), a) =>
        aggExpr(fn, leafCol(arg), dist).as(a) }
      val grouped = joined.groupBy(groups: _*).agg(aggs.head, aggs.tail: _*)
      // aggregated order keys are items → order on out names
      val sorted =
        if (order.isEmpty) grouped
        else grouped.orderBy(order.map { case (k, asc) =>
          if (asc) col(name(k)).asc else col(name(k)).desc }: _*)
      page(sorted).select(namedItems.map { case (_, a) => col(a) }: _*)
    }
  }

  private def fresh(st: ExecState): String = s"__b${st.freshCounter}"

  private def valueLit(v: Value): Column = v match {
    case BoolV(b)   => lit(b)
    case IntV(i)    => lit(i)
    case StringV(s) => lit(s)
  }

  /** Cap lineage growth on frequently re-written frames: after every
    * `checkpointEvery` mutations of the same node label / edge type, cut
    * the plan with an eager localCheckpoint (the engine-level
    * materialization policy of SURVEY.md §3.4 — Catalyst has no rule for
    * this). */
  private def bump(st: ExecState, key: FrameKey, cfg: Config): ExecState = {
    val d = st.mutationDepth(key) + 1
    if (d >= cfg.checkpointEvery) {
      val g = st.graph
      val g2 = key match {
        case Left(lbl) =>
          g.copy(nodes = g.nodes.updated(lbl, graft.Ckpt.eager(g.nodes(lbl))))
        case Right(ek) =>
          g.copy(edges = g.edges.updated(ek, graft.Ckpt.eager(g.edges(ek))))
      }
      st.copy(graph = g2, mutationDepth = st.mutationDepth.updated(key, 0))
    } else st.copy(mutationDepth = st.mutationDepth.updated(key, d))
  }

  /** Join the attribute columns needed by the given expressions onto the
    * binding table. One left join per distinct referenced variable, aliased
    * so repeated variables of the same label don't collide. Returns the
    * joined frame and the (var,field) → column-name map. */
  private def joinAttrs(st: ExecState, tes: Seq[TExpr])
      : (DataFrame, Map[(String, String), String]) = {
    val accesses = tes.flatMap(collectAttrs).distinct
    val byVar = accesses.groupBy(a => (a.v, a.label))
    var df = st.bindings
    val refs = Map.newBuilder[(String, String), String]
    byVar.zipWithIndex.foreach { case (((v, lbl), as), vIdx) =>
      if (Typing.isRelLabel(lbl)) {
        // rel binding: left-join the EDGE frame on the (src, dst)
        // identity pair the binding aliases — one row per pair (edge
        // set semantics), so row multiplicity is unchanged, exactly
        // like the per-variable node joins. Ref column names derive
        // from the internal endpoint columns plus a per-variable index
        // (never from the user variable, which may be an auto `%rN`
        // name unsafe in SQL) — the index keeps two rel variables bound
        // to the SAME endpoint pair from joining identically-named
        // columns (e.g. `match (a)-[x:r]->(b) match (a)-[y:r]->(b)`).
        val (cS, cD) = st.edgeColsOf(v)
        val key = Typing.relKeyOf(lbl)
        val fields = as.map(_.field).distinct
        val base = s"__ea${vIdx}_${cS}_${cD}"
        val proj = st.graph.edges(key).select(
          col("src").as(s"${base}_src") +: col("dst").as(s"${base}_dst") +:
            fields.map(f => col(f).as(s"${base}_$f")): _*)
        df = df.join(proj,
          df(cS) === proj(s"${base}_src") && df(cD) === proj(s"${base}_dst"),
          "left")
          .drop(s"${base}_src", s"${base}_dst")
        fields.foreach(f => refs += ((v, f)) -> s"${base}_$f")
      } else if (Typing.isVirtual(lbl))
        // a virtual binding's attribute (`d.hops`, `cnt.val`) IS its
        // binding column — no attribute frame exists, no join needed
        as.map(_.field).distinct.foreach(f => refs += ((v, f)) -> st.colOf(v))
      else {
        val vc = st.colOf(v)
        val fields = as.map(_.field).distinct
        val proj = st.graph.nodes(lbl).select(
          col("id").as(vc) +: fields.map(f => col(f).as(s"__a_${vc}_$f")): _*)
        df = df.join(proj, Seq(vc), "left")
        fields.foreach(f => refs += ((v, f)) -> s"__a_${vc}_$f")
      }
    }
    (df, refs.result())
  }

  private def collectAttrs(te: TExpr): Seq[TAttr] = te match {
    case a: TAttr         => Seq(a)
    case TBin(_, l, r, _) => collectAttrs(l) ++ collectAttrs(r)
    case TUn(_, e, _)     => collectAttrs(e)
    case TSubstr(a, b, c)  => collectAttrs(a) ++ collectAttrs(b) ++ collectAttrs(c)
    case TReplace(a, b, c) => collectAttrs(a) ++ collectAttrs(b) ++ collectAttrs(c)
    case TCase(ws, o, _)  =>
      ws.flatMap { case (c, v) => collectAttrs(c) ++ collectAttrs(v) } ++ collectAttrs(o)
    case Typing.TInList(e, items, _) => collectAttrs(e) ++ items.flatMap(collectAttrs)
    case Typing.TCoalesce(items, _)  => items.flatMap(collectAttrs)
    case Typing.TIndex(e, ix, _)     => collectAttrs(e) ++ collectAttrs(ix)
    case Typing.TRange(a, b)         => collectAttrs(a) ++ collectAttrs(b)
    case Typing.TInListE(e, l, _)    => collectAttrs(e) ++ collectAttrs(l)
    case Typing.TSplit(s, sep)       => collectAttrs(s) ++ collectAttrs(sep)
    case Typing.TSlice(e, lo, hi, _) =>
      collectAttrs(e) ++ collectAttrs(lo) ++ collectAttrs(hi)
    // lambda bodies: OUTER attr references need their joins like
    // anywhere else; the lambda's own variable (TLamVar) needs none
    case Typing.TListPred(_, _, l, p) => collectAttrs(l) ++ collectAttrs(p)
    case Typing.TListComp(_, l, p, m, _) =>
      collectAttrs(l) ++ p.toSeq.flatMap(collectAttrs) ++ m.toSeq.flatMap(collectAttrs)
    case Typing.TReduce(_, init, _, l, b) =>
      collectAttrs(init) ++ collectAttrs(l) ++ collectAttrs(b)
    case _                => Nil
  }

  private def collectRetAttrs(it: RRet): Seq[TAttr] = it match {
    case RRetAttr(v, l, f, tp) => Seq(TAttr(v, l, f, tp))
    case RRetAgg(_, arg, _)    => collectRetAttrs(arg)
    case RRetExpr(te)          => collectAttrs(te)
    case _: RRetVar            => Nil
  }

  /** Distinct (src,dst) pairs connected by `lo..hi` consecutive edges of
    * one label-homogeneous relation type — the FULL bounded transitive
    * closure behind `-[:r*lo..hi]->`. Each extra hop is ONE distributed
    * self-join of the edge frame followed by a distinct; the per-level
    * dedup keeps the intermediate linear in reachable-pairs (path
    * multiplicity never materializes) — the depth cap (typing: hi <= 10)
    * bounds the join chain. The ENGINE no longer calls this directly:
    * both varpath paths seed the expansion from the bound endpoints
    * ([[varPathReachSeeded]]), whose work tracks the bindings' frontier
    * instead of the whole relation; this full closure remains the
    * exactness baseline the seeded path is differentially pinned
    * against (PlanSpec / GoldenSpec). */
  private[graft] def varPathReach(graph: PropertyGraph,
      key: (String, String, String), lo: Int, hi: Int): DataFrame = {
    val edges = graph.edges(key).select(col("src"), col("dst"))
    // lo = 0 (Cypher zero-length path): seed with the identity pair of
    // EVERY node of the homogeneous label — including isolated nodes,
    // which have a zero-length path to themselves but touch no edge.
    // The node frame is id-partitioned like the edge endpoints, so the
    // union adds no exchange beyond the closure's own.
    val ident =
      if (lo == 0) Some(graph.nodes(key._1).select(col("id").as("src"), col("id").as("dst")))
      else None
    if (hi == 0) ident.get.dropDuplicates("src", "dst")
    else {
      var cur = edges // exactly-d-hop pairs (deduped), d = 1 …
      var acc = if (lo <= 1) edges else null
      for (d <- 2 to hi) {
        val stepped = cur.as("p")
          .join(edges.as("e"), col("p.dst") === col("e.src"))
          .select(col("p.src").as("src"), col("e.dst").as("dst"))
          .dropDuplicates("src", "dst")
        cur = stepped
        if (d >= lo) acc = if (acc == null) cur else acc.unionByName(cur)
      }
      val hops = if (acc == null) cur else acc
      ident.fold(hops)(_.unionByName(hops)).dropDuplicates("src", "dst")
    }
  }

  /** Bindings-seeded bounded closure — the engine's varpath path.
    *
    * [[varPathReach]]/[[varPathReachDist]] materialize the relation's
    * FULL lo..hi closure before the bindings join, so their work scales
    * with |graph|² on a dense relation even when the binding table holds
    * a handful of rows. This variant expands hop-by-hop FROM the distinct
    * bound endpoint set (the [[innerWitness]] distinct-probe trick
    * applied to the closure): per-hop work tracks the reached frontier of
    * the seeds, not the whole relation — the plan every Cypher engine
    * uses here. When the seed set IS the whole label (a varpath whose
    * bound side was itself a full label scan) the expansion degenerates
    * to exactly the full closure, so there is no regression in the
    * worst case and no coverage heuristic to tune.
    *
    * `seeds` must be a single-column frame `seed` of DISTINCT node ids
    * (NULL seeds — unmatched optional bindings — drop in the first join,
    * matching the closure path where NULL equals nothing). `seedIsSrc`
    * selects the expansion direction: seeds on the pattern's source side
    * expand forward along edges; seeds on the destination side expand
    * backward over the flipped edge frame (same frontier argument, same
    * per-hop dedup). Returns `(src, dst)` pairs of the closure restricted
    * to the seeded side — plus minimal `hops` within the window when
    * `dist` — in the PATTERN's orientation, bit-identical to the full
    * closure filtered to the seed set:
    *   - per-depth frontiers are deduped on (seed, reached) exactly like
    *     the closure's per-level (src, dst) dedup, so level d holds the
    *     same exactly-d-hop pairs restricted to seeds;
    *   - the lo = 0 identity seeds only nodes PRESENT in the label frame
    *     (left_semi against it), mirroring the closure's identity scan —
    *     a dangling binding (node deleted after bind) self-pairs in
    *     neither.
    * Scale shape: ≤ hi equi-joins of frontier × edges, each followed by
    * a pair-keyed dedup; the closing dedup / min-hops aggregate runs
    * over seed-reachable pairs only. Each intermediate frontier level is
    * consumed TWICE (its output-union branch and the next hop's join),
    * so those levels are deferred-localCheckpointed ([[Ckpt.deferred]]):
    * the level's blocks materialize once inside the query's own action
    * and both consumers read them — without this, each union branch
    * re-embeds the whole prior join chain and the edge frame is scanned
    * O(hi²) times instead of exactly hi (PlanSpec pins the residual
    * single edge scan + one LogicalRDD leaf per materialized level). */
  private[graft] def varPathReachSeeded(graph: PropertyGraph,
      key: (String, String, String), lo: Int, hi: Int,
      seeds: DataFrame, seedIsSrc: Boolean, dist: Boolean,
      undir: Boolean = false, path: Boolean = false,
      allPaths: Boolean = false): DataFrame = {
    // undirected closure (`-[:r*lo..hi]-`): walk the SYMMETRIZED edge
    // relation — each declared edge usable in either direction. No base
    // dedup (reciprocal pairs duplicate only until the depth-1 frontier's
    // pair dedup); the seedIsSrc flip is then a semantic no-op but kept
    // so the output orientation logic below stays untouched.
    //
    // `path` (round 12, named paths): additionally carry ONE canonical
    // witness node-id list per (src, dst) pair — the lexicographically
    // smallest among the MINIMAL-hop walks, in STORAGE src→dst order
    // regardless of which side seeds (append when walking forward,
    // prepend when walking reversed, so the stored array is always
    // storage-ordered and the per-level lex-min prune is canonical by
    // prefix-optimality: a lex-min k-hop walk's pruned sub-walk is
    // itself lex-min for its endpoints). Arrays ride the same frontier
    // frames; dedup becomes a groupBy min instead of dropDuplicates —
    // same single shuffle per level.
    val raw0 = graph.edges(key).select(col("src"), col("dst"))
    val raw =
      if (undir) raw0.unionByName(raw0.select(col("dst").as("src"), col("src").as("dst")))
      else raw0
    val edges0 = if (seedIsSrc) raw else raw.select(col("dst").as("src"), col("src").as("dst"))
    // Multi-hop closures consume the oriented edge frame once per
    // superstep. A STORAGE-BACKED relation re-scans in place each hop —
    // cheap, and for a bucketed store the scan's bucket alignment is
    // exactly what keeps the per-hop joins exchange-free (PlanSpec pins
    // it), so a checkpoint would be a pessimization there. A freshly
    // MUTATED relation is the opposite: its frame carries up to
    // checkpointEvery union+dedup+join layers of lineage, and
    // re-planning + re-executing that stack under AQE once per
    // superstep is quadratic — a 12-hop closure over a 12-create chain
    // took minutes (round 16). So hoist through ONE shared deferred
    // checkpoint (the library algos' loop-invariant discipline) exactly
    // when the frame's own plan does real work: any join, aggregate, or
    // set-semantics dedup in it.
    def complexPlan(df: DataFrame): Boolean = {
      import org.apache.spark.sql.catalyst.plans.{logical => L}
      df.queryExecution.optimizedPlan.exists {
        case _: L.Join | _: L.Aggregate | _: L.Deduplicate | _: L.Window => true
        case _ => false
      }
    }
    val edges =
      if (hi >= 2 && complexPlan(edges0)) graft.Ckpt.deferredShared(edges0)
      else edges0
    val identLabel = if (seedIsSrc) key._1 else key._3
    val withHops = dist || path
    val ident =
      if (lo == 0) Some {
        val self = seeds
          .join(graph.nodes(identLabel).select(col("id").as("seed")), Seq("seed"), "left_semi")
        self.select(
          Seq(col("seed").as("src"), col("seed").as("dst")) ++
            (if (withHops) Seq(lit(0L).as("hops")) else Nil) ++
            (if (path) Seq(array(col("seed")).as("path")) else Nil): _*)
      }
      else None
    // per-level pair dedup: plain distinct, or the canonical lex-min
    // witness when paths ride along (all walks at one level share the
    // hop count, so min(path) alone is the right tie-break here)
    def dedup(df: DataFrame): DataFrame =
      // allShortestPaths keeps EVERY distinct walk per pair; the single-
      // witness mode collapses to the canonical lex-min; the plain
      // closure needs only the pair
      if (allPaths) df.dropDuplicates("src", "dst", "path")
      else if (path) df.groupBy("src", "dst").agg(min("path").as("path"))
      else df.dropDuplicates("src", "dst")
    // allShortestPaths prefix prune (valid only when the window floor is
    // <= 1, i.e. per-pair minimality == global BFS minimality): a walk
    // whose endpoint pair was reached at an earlier level can neither be
    // minimal nor prefix a minimal walk (a shortest walk's prefixes are
    // shortest), so each level anti-joins the accumulated reached-pair
    // set — the frontier holds exactly the shortest-prefix walks (the
    // classic BFS-DAG enumeration) instead of every walk. With a floor
    // >= 2, window-minimal walks may ride non-shortest prefixes (e.g.
    // a 3-hop walk over a pair at distance 1), so the prune is off and
    // minimality is restored by the closing per-pair filter.
    //
    // The UNBOUNDED closure (round 16) turns the prune on for EVERY
    // mode — the converged result is the FIRST-REACH closure (plain:
    // membership; dist: BFS level = min hops; witness: prefix-optimal
    // lex-min, the same argument as the bounded single-witness prune)
    // — and the anti-join doubles as the TERMINATION argument: a
    // frontier of strictly-new pairs empties exactly at the
    // reachability fixed point. A floor lo >= 2 (round 17) does NOT
    // turn the prune off the way bounded floors do: the window is
    // recovered from the converged closure by composition (see the
    // `windowed` extension below), so the base run always prunes.
    val unbounded = hi == Typing.varPathUnbounded
    val pruned = unbounded || (allPaths && lo <= 1)
    var reached: DataFrame = null
    def prune(df: DataFrame): DataFrame =
      if (!pruned || reached == null) df
      else df.join(reached, Seq("src", "dst"), "left_anti")
    def reach(df: DataFrame): Unit =
      if (pruned) {
        val pairs = df.select(col("src"), col("dst"))
        reached = if (reached == null) pairs else reached.unionByName(pairs)
      }
    // depth-1 frontier: seeds × edges, deduped on the pair; and the
    // hop-extension step shared by the bounded unroll and the
    // convergence loop
    def level1: DataFrame =
      dedup(seeds.join(edges, seeds("seed") === edges("src"))
        .select(col("seed").as("src") +: col("dst") +:
          (if (path) Seq((if (seedIsSrc) array(col("seed"), col("dst"))
                          else array(col("dst"), col("seed"))).as("path"))
           else Nil): _*))
    def step(cur: DataFrame): DataFrame =
      dedup(cur.as("p")
        .join(edges.as("e"), col("p.dst") === col("e.src"))
        .select(col("p.src").as("src") +: col("e.dst").as("dst") +:
          (if (path) Seq((if (seedIsSrc) concat(col("p.path"), array(col("e.dst")))
                          else concat(array(col("e.dst")), col("p.path"))).as("path"))
           else Nil): _*))
    def tag(df: DataFrame, d: Int): DataFrame =
      if (withHops) df.withColumn("hops", lit(d.toLong)) else df
    val levels =
      if (hi == 0) Nil
      else if (unbounded) {
        // convergence-driven closure (round 16, VERDICT r15 item 2): no
        // unrolled depth — each superstep's frontier of strictly-new
        // pairs is checkpoint-marked shared (three consumers: the
        // output union, the next hop's join, the later levels' prunes)
        // and COUNTED, the count being the superstep's ONLY job (it
        // materializes the deferred checkpoint AND is the convergence
        // probe — the deltaCC discipline). Empty frontier ⟺ the
        // reachability fixed point; exhausting varPathMaxSupersteps
        // unconverged fails LOUDLY — never the silent truncation the
        // old default-cap spelling had.
        ident.foreach(df => reach(df))
        val out = List.newBuilder[DataFrame]
        var cur = graft.Ckpt.deferredShared(prune(level1))
        var d = 1
        var n = cur.count()
        // every level joins the base closure regardless of lo — a
        // floor >= 2 windows AFTER convergence (the `windowed`
        // composition); empty frame is harmless
        out += tag(cur, 1)
        reach(cur)
        while (n > 0) {
          require(d < Typing.varPathMaxSupersteps,
            s"unbounded variable-length path not converged after " +
              s"${Typing.varPathMaxSupersteps} supersteps — write an explicit bound")
          d += 1
          cur = graft.Ckpt.deferredShared(prune(step(cur)))
          n = cur.count()
          if (n > 0) { out += tag(cur, d); reach(cur) }
        }
        out.result()
      }
      else {
        if (pruned) ident.foreach(df => reach(df))
        var cur = prune(level1)
        val out = List.newBuilder[DataFrame]
        // a level consumed by BOTH the output union and the next hop's
        // join is materialized once (deferred checkpoint, see scaladoc);
        // a level with a single consumer keeps its lazy plan
        def share(d: Int): Unit =
          if (d < hi && d >= lo) cur = graft.Ckpt.deferredShared(cur)
        share(1)
        reach(cur)
        if (lo <= 1) out += tag(cur, 1)
        for (d <- 2 to hi) {
          cur = prune(step(cur))
          share(d)
          reach(cur)
          if (d >= lo) out += tag(cur, d)
        }
        out.result()
      }
    val unioned = (ident.toList ++ levels).reduce(_ unionByName _)
    val closed =
      if (allPaths) {
        // prefix-pruned levels hold each pair only at its minimal level,
        // so the union IS the enumeration; an un-pruned window (lo >= 2)
        // restores per-pair minimality with one pair-keyed min filter
        if (pruned) unioned
        else unioned
          .join(unioned.groupBy("src", "dst").agg(min("hops").as("mh")),
            Seq("src", "dst"))
          .filter(col("hops") === col("mh")).drop("mh")
      }
      else if (path)
        // min over (hops, path) structs: minimal hops first, then the
        // lex-min storage-order witness among that level's candidates
        unioned.groupBy("src", "dst")
          .agg(min(struct(col("hops"), col("path"))).as("w"))
          .select(col("src"), col("dst"),
            col("w.hops").as("hops"), col("w.path").as("path"))
      else if (dist) unioned.groupBy("src", "dst").agg(min("hops").as("hops"))
      else unioned.dropDuplicates("src", "dst")
    // UNBOUNDED floor >= 2 (round 17, VERDICT r16 item 5 — formerly the
    // one spelling that silently truncated at the depth cap): the
    // window composes as step^(lo-1) OF THE CONVERGED CLOSURE. The
    // per-level step map S_d → S_{d+1} distributes over unions, so
    // step^(lo-1)(∪_{d≥1} S_d) = ∪_{d≥lo} S_d — exists-walk membership
    // is exact on any graph, cyclic included. Hops ride the steps
    // (+1 each) with the same per-pair min collapse: a window-minimal
    // walk's length-(L−lo+1) prefix is itself minimal for its endpoint
    // pair (else a shorter window walk would exist), so extending only
    // the converged minima — and, in witness modes, only their lex-min
    // (resp. all-min) walks — loses nothing. Cost: lo−1 extra
    // co-partitioned edge joins on top of the convergence run.
    val windowed =
      if (!(unbounded && lo >= 2)) closed
      else {
        var cur = closed
        for (_ <- 1 to lo - 1) {
          val j = cur.as("p").join(edges.as("e"), col("p.dst") === col("e.src"))
            .select(Seq(col("p.src").as("src"), col("e.dst").as("dst")) ++
              (if (withHops) Seq((col("p.hops") + lit(1L)).as("hops")) else Nil) ++
              (if (path) Seq((if (seedIsSrc) concat(col("p.path"), array(col("e.dst")))
                              else concat(array(col("e.dst")), col("p.path"))).as("path"))
               else Nil): _*)
          cur =
            if (allPaths) j.dropDuplicates("src", "dst", "path")
            else if (path) j.groupBy("src", "dst")
              .agg(min(struct(col("hops"), col("path"))).as("w"))
              .select(col("src"), col("dst"),
                col("w.hops").as("hops"), col("w.path").as("path"))
            else if (dist) j.groupBy("src", "dst").agg(min("hops").as("hops"))
            else j.dropDuplicates("src", "dst")
        }
        if (allPaths)
          // different origins q reach a pair at different extended
          // lengths — keep only the windowed-minimal walks per pair
          cur.join(cur.groupBy("src", "dst").agg(min("hops").as("mh")),
              Seq("src", "dst"))
            .filter(col("hops") === col("mh")).drop("mh")
        else cur
      }
    if (seedIsSrc) windowed
    else windowed.select(
      Seq(col("dst").as("src"), col("src").as("dst")) ++
        (if (withHops) Seq(col("hops")) else Nil) ++
        (if (path) Seq(col("path")) else Nil): _*)
  }

  /** [[varPathReach]] with the MINIMAL hop count per reachable pair —
    * the shortest-path distance within the lo..hi window (`as d`).
    * Levels are already deduped per hop count, so tagging each level
    * with its depth and taking the per-pair min adds no asymptotic cost:
    * the union holds ≤ (hi−lo+1)×|pairs| rows and the closing groupBy
    * replaces the plain closure's dropDuplicates — same shuffle count,
    * same per-level co-partitioned self-join chain at scale. A zero-
    * length identity pair (lo = 0) is depth 0, trivially the minimum. */
  private[graft] def varPathReachDist(graph: PropertyGraph,
      key: (String, String, String), lo: Int, hi: Int): DataFrame = {
    val edges = graph.edges(key).select(col("src"), col("dst"))
    val ident =
      if (lo == 0) Some(graph.nodes(key._1)
        .select(col("id").as("src"), col("id").as("dst"), lit(0L).as("hops")))
      else None
    val levels =
      if (hi == 0) Nil
      else {
        var cur = edges
        val out = List.newBuilder[DataFrame]
        if (lo <= 1) out += edges.withColumn("hops", lit(1L))
        for (d <- 2 to hi) {
          cur = cur.as("p")
            .join(edges.as("e"), col("p.dst") === col("e.src"))
            .select(col("p.src").as("src"), col("e.dst").as("dst"))
            .dropDuplicates("src", "dst")
          if (d >= lo) out += cur.withColumn("hops", lit(d.toLong))
        }
        out.result()
      }
    (ident.toList ++ levels).reduce(_ unionByName _)
      .groupBy("src", "dst").agg(min("hops").as("hops"))
  }

  /** Compile a typed expression to a Spark SQL string. Integer division
    * uses `div` (truncating, like OCaml's `/`, sem.ml:166) and `%` keeps
    * the dividend's sign (like OCaml `mod`, sem.ml:167). With ANSI mode on,
    * division by zero throws, matching the reference's Division_by_zero.
    * String literals are safe to inline: the MiniGQL lexer only admits
    * `[A-Za-z0-9 ]` inside strings (lexer.mll:26-27). */
  private def sql(te: TExpr, refs: Map[(String, String), String],
      st: ExecState, strict: Boolean): String =
    te match {
      case TConst(BoolV(b))   => if (b) "true" else "false"
      case TConst(IntV(i))    => s"${i}L"
      case TConst(StringV(s)) => s"'$s'"
      case Typing.TNullCheck(v) => s"isnull(${st.colOf(v)})"
      // id(v): the binding column IS the id; a NULL optional binding
      // yields NULL (drops from predicates, recoverable via coalesce)
      case Typing.TIdFn(v) => st.colOf(v)
      case TAttr(v, _, f, tp) =>
        val c = refs((v, f))
        if (strict) {
          val raise =
            s"if(isnull($c), raise_error('attribute $f not set for variable $v'), $c)"
          // rel bindings live in edgeEnv, not env — a matched edge
          // always exists, so no binding-NULL guard applies (an unset
          // edge attribute raises like an unset node attribute)
          st.env.collectFirst { case (`v`, bc) => bc } match {
            case Some(bc) if st.nullable(bc) =>
              // optional-match binding: a NULL binding means "no
              // witness", not "unset attribute" — don't raise, yield
              // NULL (the row then drops from any predicate, SQL
              // semantics), keeping optional match + attribute
              // predicates usable under the reference-parity strict
              // config (ADVICE r06)
              s"if(isnull($bc), cast(null as ${sqlTp(tp)}), $raise)"
            case _ => raise
          }
        } else c
      case TBin(op, l, r, tpB) =>
        val (a, b) = (sql(l, refs, st, strict), sql(r, refs, st, strict))
        op match {
          // string concatenation (typing routed string+string here;
          // Spark `+` would try numeric coercion, so emit concat)
          case BAadd if tpB == StringT => s"concat($a, $b)"
          // string predicates compile to Spark's codegen'd functions
          case BSstarts   => s"startswith($a, $b)"
          case BSends     => s"endswith($a, $b)"
          case BScontains => s"contains($a, $b)"
          // codegen'd Java-regex find; dialect pin at [[graft.lang.BSregex]]
          case BSregex    => s"($a RLIKE $b)"
          case _ =>
            val o = op match {
              case BAadd => "+"; case BAsub => "-"; case BAmul => "*"
              case BAdiv => "div"; case BAmod => "%"
              case BCeq => "="; case BCne => "<>"
              case BCge => ">="; case BCgt => ">"; case BCle => "<="; case BClt => "<"
              case BLand => "AND"; case BLor => "OR"
              case other => throw new IllegalStateException(s"unreachable binop $other")
            }
            s"($a $o $b)"
        }
      case TUn(op, e, _) =>
        val a = sql(e, refs, st, strict)
        op match {
          case USlower => s"lower($a)"
          case USupper => s"upper($a)"
          case UStrim  => s"trim($a)"
          // Spark length()/size() are INT; the language's int is int64.
          // size over a LIST operand (round 11) counts elements.
          case USsize if e.tp.isInstanceOf[ListT] => s"cast(size($a) as bigint)"
          case USsize  => s"cast(length($a) as bigint)"
          case UStoStr => s"cast($a as string)"
          case ULnot   => s"(NOT $a)"
          // int magnitude/signum (round 11); abs(Long.MinValue)
          // raises under ANSI — the strict-engine overflow rule
          case UIabs   => s"abs($a)"
          case UIsign  => s"cast(sign($a) as bigint)"
          // string→int parse; non-numeric RAISES under ANSI (the
          // strict flavor of Cypher's toInteger-null)
          case UStoInt => s"cast($a as bigint)"
        }
      case TSubstr(e1, e2, e3) =>
        // Spark's SQL substring: 1-based position, clamping, negative
        // counts from the end (substringSQL); len<=0 yields ""
        s"substring(${sql(e1, refs, st, strict)}, cast(${sql(e2, refs, st, strict)} as int), cast(${sql(e3, refs, st, strict)} as int))"
      case TReplace(e1, e2, e3) =>
        // replace-all of literal occurrences; empty find = no-op
        s"replace(${sql(e1, refs, st, strict)}, ${sql(e2, refs, st, strict)}, ${sql(e3, refs, st, strict)})"
      case TCase(whens, otherwise, _) =>
        val ws = whens.map { case (c, v) =>
          s"WHEN ${sql(c, refs, st, strict)} THEN ${sql(v, refs, st, strict)}"
        }.mkString(" ")
        s"(CASE $ws ELSE ${sql(otherwise, refs, st, strict)} END)"
      case Typing.TInList(e, items, neg) =>
        // SQL IN with its NULL semantics: a NULL tested value (a
        // guarded optional-match attribute) yields NULL, dropping the
        // row from any predicate — under both polarities
        val list = items.map(sql(_, refs, st, strict)).mkString(", ")
        val in = s"(${sql(e, refs, st, strict)} IN ($list))"
        if (neg) s"(NOT $in)" else in
      case Typing.TCoalesce(items, _) =>
        s"coalesce(${items.map(sql(_, refs, st, strict)).mkString(", ")})"
      case Typing.TIndex(e, ix, _) =>
        // 0-based element access (Cypher's convention; Spark's SQL
        // bracket is GetArrayItem, 0-based); out-of-range RAISES under
        // the session's ANSI mode — the strict-engine flavor of
        // Cypher's null, pinned in GoldenSpec
        s"(${sql(e, refs, st, strict)})[cast(${sql(ix, refs, st, strict)} as int)]"
      case Typing.TRange(lo, hi) =>
        // inclusive a..b, EMPTY when a > b (Cypher's rule — Spark's
        // sequence would descend there, so guard the direction)
        val (a, b) = (sql(lo, refs, st, strict), sql(hi, refs, st, strict))
        s"(case when $a <= $b then sequence($a, $b) " +
          "else cast(array() as array<bigint>) end)"
      case Typing.TInListE(e, le, neg) =>
        val test = s"array_contains(${sql(le, refs, st, strict)}, " +
          s"${sql(e, refs, st, strict)})"
        if (neg) s"(NOT $test)" else test
      case Typing.TSplit(s2, sep) =>
        // literal-separator split: the separator is \Q...\E-quoted so
        // Spark's regex split treats it verbatim (DuckDB's string_split
        // is literal natively). Empty separator RAISES — the two
        // engines disagree on that edge, so it is banned, not divergent.
        val a = sql(s2, refs, st, strict)
        val b = sql(sep, refs, st, strict)
        s"if($b = '', raise_error('split separator must be non-empty'), " +
          s"split($a, concat('\\\\Q', $b, '\\\\E')))"
      case Typing.TSlice(e, lo, hi, _) =>
        // clamped 0-based end-exclusive slice: start = max(lo,0),
        // length = max(0, min(hi, size) - start); Spark slice is
        // 1-based with a length argument. Operands are pure, so the
        // repeated evaluation is unobservable (the CASE-duplication
        // argument from the simple-case desugar).
        val a = sql(e, refs, st, strict)
        val l = sql(lo, refs, st, strict)
        val h = sql(hi, refs, st, strict)
        s"slice($a, cast(greatest($l, 0L) + 1 as int), " +
          s"cast(greatest(least($h, size($a)) - greatest($l, 0L), 0L) as int))"
      // lambda-bound reads compile to the lambda argument. The `__lam_`
      // prefix keeps the SQL name out of every generated-column
      // namespace (attr-join columns, binding columns) — typing already
      // banned shadowing BOUND variables, and generated frame columns
      // never start with __lam_, so capture is impossible.
      case Typing.TLamVar(n, _) => s"__lam_$n"
      case Typing.TListPred(kind, v, le, p) =>
        // Spark's codegen'd higher-order functions; vacuous-truth
        // semantics follow Cypher (all over [] = true, any/single = false)
        val l = sql(le, refs, st, strict)
        val body = s"__lam_$v -> ${sql(p, refs, st, strict)}"
        kind match {
          case "any"    => s"exists($l, $body)"
          case "all"    => s"forall($l, $body)"
          case "none"   => s"(NOT exists($l, $body))"
          case "single" => s"(size(filter($l, $body)) = 1)"
          case other    => throw new IllegalStateException(s"unreachable list predicate $other")
        }
      case Typing.TListComp(v, le, p, m, _) =>
        // filter preserves the operand's canonical ascending order; a
        // mapping arm may break monotonicity, so the result re-sorts —
        // MiniGQL lists are pure functions of their element bag
        val base = sql(le, refs, st, strict)
        val filtered = p.fold(base)(pe =>
          s"filter($base, __lam_$v -> ${sql(pe, refs, st, strict)})")
        m.fold(filtered)(me =>
          s"array_sort(transform($filtered, __lam_$v -> ${sql(me, refs, st, strict)}))")
      case Typing.TReduce(acc, init, v, le, body) =>
        // left fold over the canonical ascending order — deterministic
        // for non-commutative bodies because the order is a value
        // property, not an execution artifact
        s"aggregate(${sql(le, refs, st, strict)}, ${sql(init, refs, st, strict)}, " +
          s"(__lam_$acc, __lam_$v) -> ${sql(body, refs, st, strict)})"
    }

  private def sqlTp(tp: AttribTp): String = tp match {
    case BoolT   => "boolean"
    case IntT    => "bigint"
    case StringT => "string"
    case ListT(el) => s"array<${sqlTp(el)}>"
  }
}
