package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.sources.GraphLoader

/** In-JVM differential tests for the iterative graph analytics at
  * sf0.001: recompute connected components (union-find) and fixed-point
  * PageRank (the identical integer formula) over the collected edge list
  * and require exact equality — the algorithms are all-integer, so there
  * is no tolerance. */
class GraphAlgosSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def collectedEdges(): Seq[(Long, Long)] = {
    val (g, _) = GraphLoader.load(spark, dir)
    // FK edges only — mirror GraphAlgos.allEdges (tagged is mutable,
    // nnext is the derived varpath successor chain)
    val nonFk = Set("tagged", "nnext")
    g.edges.collect { case (key, df) if !nonFk(key._2) => df }
      .flatMap(_.collect().map(r => (r.getLong(0), r.getLong(1)))).toSeq
  }

  private def collectedNodes(): Seq[Long] = {
    val (g, _) = GraphLoader.load(spark, dir)
    (g.nodes - "tag").values.flatMap(_.select(col("id")).collect().map(_.getLong(0))).toSeq
  }

  test("node ids are unique across the loaded graph (lineitem row_number fix)") {
    val ids = collectedNodes()
    assert(ids.size == ids.distinct.size)
  }

  // Running the query also exercises the in-operator convergence
  // assertion (GraphAlgos requires the final-superstep delta be empty),
  // so an under-converged ccIters fails here, not just vs the oracle.
  test("connected components equals in-memory union-find") {
    val nodes = collectedNodes()
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    collectedEdges().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min id of the component (what min-propagation converges to)
    val expected = nodes.groupBy(find).map { case (_, ns) => ns.min -> ns.size.toLong }
    val got = SparkEntry.queries("g_connected_components")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("weighted SSSP equals the in-memory Dijkstra replay") {
    val srcId = 1000000000L // region 0 — same source as g_bfs
    def w(a: Long, b: Long): Long = 1L + (a + b) % 2
    val adj = scala.collection.mutable.Map.empty[Long, List[(Long, Long)]]
      .withDefaultValue(Nil)
    collectedEdges().foreach { case (a, b) =>
      adj(a) = (b, w(a, b)) :: adj(a)
      adj(b) = (a, w(a, b)) :: adj(b)
    }
    val dist = scala.collection.mutable.Map(srcId -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, srcId))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d) adj(u).foreach { case (v, wt) =>
        if (dist.get(v).forall(_ > d + wt)) { dist(v) = d + wt; pq.enqueue((d + wt, v)) }
      }
    }
    val expected = dist.values.groupBy(identity)
      .map { case (d, vs) => d -> vs.size.toLong }
    val got = SparkEntry.queries("g_sssp")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("landmark harmonic centrality equals the in-memory multi-BFS replay") {
    val seeds = collectedNodes().filter(_ < 2000000000L) // the 5 regions
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    collectedEdges().foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val h = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    seeds.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0L)
      var frontier = List(s)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(adj).distinct.filterNot(dist.contains)
        next.foreach(v => dist(v) = d)
        frontier = next
      }
      dist.foreach { case (v, dv) => if (dv > 0) h(v) += 1000000L / dv }
    }
    val expected = h.toSeq.sortBy { case (id, hv) => (-hv, id) }.take(50)
    val got = SparkEntry.queries("g_harmonic_landmarks")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("bipartiteness check equals the in-memory BFS-parity replay") {
    val nodes = collectedNodes()
    val edges = collectedEdges()
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    // components via union-find, root = min id (the CC label contract)
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val rootOf = nodes.groupBy(find).flatMap { case (_, ns) =>
      val root = ns.min; ns.map(_ -> root)
    }
    // BFS depth from each component's root
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    rootOf.values.toSet.foreach { (root: Long) =>
      dist(root) = 0L
      var frontier = List(root); var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(adj).distinct.filterNot(dist.contains)
        next.foreach(v => dist(v) = d)
        frontier = next
      }
    }
    val expected = nodes.groupBy(rootOf).map { case (root, ns) =>
      val es = edges.filter { case (a, _) => rootOf(a) == root }
      val odd = es.count { case (a, b) => (dist(a) + dist(b)) % 2 == 0 }
      root -> ((ns.size.toLong, es.size.toLong, odd.toLong, odd == 0))
    }
    val got = SparkEntry.queries("g_bipartite")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == expected)
  }

  test("fixed-point PageRank equals the in-memory integer replay") {
    val nodes = collectedNodes()
    val edges = collectedEdges()
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 8) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => in(d) += rank(s) / out(s) }
      rank = nodes.map(n => n -> (150000000L + (85L * in(n)) / 100L)).toMap
    }
    val expected = rank.toSeq.sortBy { case (id, r) => (-r, id) }.take(100)
    val got = SparkEntry.queries("g_pagerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("personalized PageRank equals the in-memory integer replay") {
    val nodes = collectedNodes()
    // reversed FK edges — the influence direction (see GraphAlgos.pprIters)
    val edges = collectedEdges().map { case (s, d) => (d, s) }
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    def seed(id: Long): Boolean = id < 2000000000L
    var rank = nodes.map(n => n -> (if (seed(n)) 1000000000L else 0L)).toMap
    for (_ <- 1 to 6) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => in(d) += rank(s) / out(s) }
      rank = nodes.map(n =>
        n -> ((if (seed(n)) 150000000L else 0L) + (85L * in(n)) / 100L)).toMap
    }
    val expected = rank.toSeq.sortBy { case (id, r) => (-r, id) }.take(100)
    val got = SparkEntry.queries("g_ppr")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // the restart mass never leaves the seeds' basin untouched: the 5
    // region seeds hold exactly the teleport term (nothing points AT
    // them in the reversed graph), and they head the ranking
    assert(got.take(5) == (0 until 5).map(i => (1000000000L + i, 150000000L)))
  }

  test("k-core peel equals the in-memory replay") {
    val edges = collectedEdges()
    val und = (edges ++ edges.map(_.swap)).distinct
    var alive = und.map(_._1).toSet
    var done = false
    while (!done) {
      val deg = und.filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val next = deg.filter(_._2 >= 3).keySet
      if (next == alive) done = true else alive = next
    }
    val coreDeg = und.filter { case (a, b) => alive(a) && alive(b) }
      .groupBy(_._1).map { case (_, es) => es.size }
    val expected = coreDeg.groupBy(identity).map { case (d, xs) => d.toLong -> xs.size.toLong }
    val got = SparkEntry.queries("g_kcore")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.keys.forall(_ >= 3L)) // every in-core degree is >= k
  }

  test("RA link prediction equals the in-memory replay") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // supported co-purchase edges: pairs sharing >= 2 distinct orders
    // (the association-rule support floor the operator applies)
    val perOrder = li.toSeq.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq
    // NB: .collect { case (p, _) => p } on a Map would rebuild a MAP
    // (tuple results re-key by first element) and silently collapse
    // (a, b1)/(a, b2) — keySet keeps the pairs intact
    val pairs: Set[(Long, Long)] =
      perOrder.groupBy(identity).filter(_._2.size >= 2).keySet.toSet
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (w, es) => w -> es.map(_._2).toSeq.sorted }
    val deg = adj.map { case (w, ns) => w -> ns.size.toLong }
    val scores = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    adj.foreach { case (w, ns) =>
      for (u <- ns; v <- ns if u < v && !pairs((u, v)))
        scores((u, v)) += 1000000000L / deg(w)
    }
    val expected = scores.toSeq.map { case ((u, v), ra) => (u, v, ra) }
      .sortBy { case (u, v, ra) => (-ra, u, v) }.take(20)
    val got = SparkEntry.queries("g_linkpred")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("Jaccard node similarity equals the in-memory replay (round 15 v2)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val orders: Map[Long, Set[Long]] =
      li.groupBy(_._2).map { case (p, rows) => p -> rows.map(_._1).toSet }
    val inter = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    li.groupBy(_._1).values.foreach { rows =>
      val ps = rows.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) inter((a, b)) += 1L
    }
    val expected = inter.toSeq.map { case ((u, v), n) =>
      val union = orders(u).size + orders(v).size - n
      (u, v, 1000000L * n / union, n)
    }.sortBy { case (u, v, j, _) => (-j, u, v) }.take(100)
    val got = SparkEntry.queries("g_nodesim")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the intersection really is the shared-order count (spot-check
    // the top pair against the set model)
    expected.headOption.foreach { case (u, v, _, n) =>
      assert((orders(u) intersect orders(v)).size.toLong == n)
    }
  }

  test("deterministic random walks equal the in-memory replay (round 15 v2)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perOrder = li.toSeq.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq
    val pairs = perOrder.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (c, es) => c -> es.map(_._2).toSeq.sorted }
    def hop(cur: Long, step: Int): Long =
      adj(cur).minBy(nb => ((cur * 48271 + step * 39916801L + nb * 69621) % 1000000007L, nb))
    val ends = adj.keys.toSeq.map { start =>
      (1 to 4).foldLeft(start)((cur, step) => hop(cur, step))
    }
    val expected = ends.groupBy(identity).map { case (e, xs) => (e, xs.size.toLong) }
      .toSeq.sorted
    val got = SparkEntry.queries("g_walks")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expected)
  }

  // The named 100 TB claim, proved rather than asserted: on a graph
  // whose diameter is NOT schema-bound-small — here a 24-node chain
  // with a 200-leaf hub hanging off one end (high diameter + skew, the
  // adversarial shape for label propagation) — star-CC must converge in
  // O(log n) rounds while delta-CC needs O(diameter) supersteps. The FK
  // graph can't exercise this (diameter 7 by construction), which is
  // why the two implementations' advantage was previously only cited,
  // not measured (VERDICT r06 item 6).
  test("star-CC converges in O(log n) rounds where delta-CC needs O(diameter)") {
    import spark.implicits._
    val chainLen = 24 // diameter ~ chainLen + 1 (leaf → hub → … → chain end)
    val chain = (0L until chainLen - 1).map(i => (i, i + 1))
    val hub = (0L until 200L).map(l => (0L, 100L + l)) // hub at chain head
    val edges = (chain ++ hub).toDF("src", "dst")
    val nodes = ((0L until chainLen) ++ (100L until 300L)).toDF("id")
    val undirected = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))

    val (deltaLabels, deltaSteps) =
      graft.operators.GraphAlgos.deltaCC(nodes, undirected, maxIters = chainLen + 4,
        parts = 2)
    val (starLabels, starRounds) =
      graft.operators.GraphAlgos.starCC(nodes, edges, maxRounds = 8)

    // identical fixed point: every node labeled with the component min (0)
    val d = deltaLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == st && d.values.toSet == Set(0L) && d.size == chainLen + 200)

    // round counts: delta is diameter-bound (min label 0 walks the chain
    // one hop per superstep: chainLen - 1 hops + 1 detection step); star
    // is O(log n) regardless — n = 224 ⇒ well under 8 rounds
    assert(deltaSteps >= chainLen,
      s"delta-CC converged in $deltaSteps supersteps — fixture no longer diameter-bound")
    assert(starRounds <= 8 && starRounds < deltaSteps / 2,
      s"star-CC took $starRounds rounds vs delta's $deltaSteps — O(log n) advantage lost")
  }

  /** In-memory synchronous self-inclusive LPA replay ((count desc,
    * label asc) tie-break over the closed neighborhood) — shared by the
    * labelprop and modularity tests. */
  private def lpaReplay(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    // multiplicity preserved — the operator's ue is union-all, so a
    // hypothetical parallel edge would count twice in the mode too
    val und = edges ++ edges.map(_.swap)
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val incoming = und.groupBy(_._2)
      lbl = lbl.map { case (n, own) =>
        val msgs = incoming.getOrElse(n, Nil).map(e => lbl(e._1)) :+ own
        val counts = msgs.groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  test("label propagation equals the in-memory synchronous replay") {
    val lbl = lpaReplay(collectedNodes(), collectedEdges(), 6)
    val expected = lbl.values.groupBy(identity)
      .map { case (l, xs) => (l, xs.size.toLong) }
      .toSeq.sortBy { case (c, n) => (-n, c) }.take(20)
    val got = SparkEntry.queries("g_labelprop")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("modularity equals the in-memory replay over the LPA partition") {
    val nodes = collectedNodes()
    val edges = collectedEdges()
    val lbl = lpaReplay(nodes, edges, 6)
    val m = edges.size.toLong
    val eC = edges.filter { case (a, b) => lbl(a) == lbl(b) }
      .groupBy { case (a, _) => lbl(a) }.map { case (l, es) => l -> es.size.toLong }
    val dC = (edges ++ edges.map(_.swap))
      .groupBy { case (a, _) => lbl(a) }.map { case (l, es) => l -> es.size.toLong }
    val qnum = dC.map { case (l, d) => 4L * m * eC.getOrElse(l, 0L) - d * d }.sum
    val row = SparkEntry.queries("g_modularity")(spark, dir).collect().head
    assert(row.getLong(0) == m && row.getLong(1) == qnum)
    assert(row.getDouble(2) ==
      BigDecimal(qnum / (4.0 * m * m)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // sanity: a community partition on this graph beats the null model
    assert(row.getDouble(2) > 0.0)
  }

  test("HITS equals the in-memory fixed-point replay") {
    val nodes = collectedNodes()
    val edges = collectedEdges()
    val zeros = nodes.map(n => n -> 0L).toMap
    var hub = nodes.map(n => n -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 8) {
      val ar = zeros ++ edges.groupBy(_._2)
        .map { case (v, es) => v -> es.map(e => hub(e._1)).sum }
      val mA = ar.values.max
      auth = ar.map { case (n, r) => n -> r * 1000000L / mA }
      val hr = zeros ++ edges.groupBy(_._1)
        .map { case (u, es) => u -> es.map(e => auth(e._2)).sum }
      val mH = hr.values.max
      hub = hr.map { case (n, r) => n -> r * 1000000L / mH }
    }
    val expected = nodes.map(n => (n, auth(n), hub(n)))
      .sortBy { case (n, a, _) => (-a, n) }.take(20)
    val got = SparkEntry.queries("g_hits")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("local clustering coefficient equals the in-memory replay") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.toSet
    val adj = (pairs.toSeq ++ pairs.toSeq.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val tri = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((u, v) <- pairs if u < v; w <- adj(u) if w > v && adj(v)(w)) {
      tri(u) += 1; tri(v) += 1; tri(w) += 1
    }
    val expected = adj.toSeq.collect { case (n, ns) if ns.size >= 2 =>
      val d = ns.size.toLong
      (n, d, tri(n), 2000000L * tri(n) / (d * (d - 1)))
    }.sortBy { case (n, _, t, c) => (-c, -t, n) }.take(20)
    val got = SparkEntry.queries("g_clustering")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("SCC coloring equals the in-memory Tarjan replay (round 16)") {
    // Full per-node label differential, not just the histogram: run
    // Tarjan over the collected asymmetric co-purchase graph (a→b at
    // support >= 2 for id-ordered pairs, b→a additionally at >= 3 —
    // the g_scc construction), label every SCC with its max member id,
    // and require coloringSCC's (id, scc) assignment to match exactly.
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perOrder = li.toSeq.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq
    val bySupp = perOrder.groupBy(identity).view.mapValues(_.size)
    val edges: Seq[(Long, Long)] =
      bySupp.filter(_._2 >= 2).keys.toSeq ++
        bySupp.filter(_._2 >= 3).keys.map(_.swap).toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    // iterative Tarjan (explicit stack — the sf0.001 graph is small but
    // recursion depth is the graph's, not ours, so no stack overflow)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .withDefaultValue(Seq.empty)
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val lowlink = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    val sccOf = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    def strongconnect(v0: Long): Unit = {
      // explicit DFS frames: (node, iterator over remaining neighbors)
      val work = scala.collection.mutable.Stack((v0, adj(v0).iterator))
      index(v0) = counter; lowlink(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      while (work.nonEmpty) {
        val (v, it) = work.top
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; lowlink(w) = counter; counter += 1
            stack.push(w); onStack += w
            work.push((w, adj(w).iterator))
          } else if (onStack(w)) lowlink(v) = math.min(lowlink(v), index(w))
        } else {
          work.pop()
          if (work.nonEmpty) {
            val (p, _) = work.top
            lowlink(p) = math.min(lowlink(p), lowlink(v))
          }
          if (lowlink(v) == index(v)) {
            val members = scala.collection.mutable.Buffer.empty[Long]
            var w = 0L
            while ({ w = stack.pop(); onStack -= w; members += w; w != v }) ()
            val label = members.max
            members.foreach(m => sccOf(m) = label)
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongconnect(v))
    val got = graft.operators.GraphAlgos.coloringSCC(
        nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == nodes.size, s"coloringSCC covered ${got.size}/${nodes.size} nodes")
    assert(got == sccOf.toMap,
      s"SCC label mismatch on ${got.toSet.diff(sccOf.toSet).take(5)} …")
    // sanity on the fixture itself: the graph must carry non-trivial
    // SCCs or the differential proves nothing
    assert(sccOf.groupBy(_._2).exists(_._2.size >= 2),
      "fixture degenerated: no non-trivial SCC at sf0.001")
  }

  test("SCC bounds are session-configurable (high-diameter escape hatch)") {
    // ADVICE r16: trim peels one DAG layer per pass, so a directed path
    // of ~2x the superstep bound exhausts the default budget — the conf
    // must let an ordinary high-diameter graph through without a
    // recompile, and the tight default must still fail LOUDLY.
    import spark.implicits._
    val n = 100L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val key = "spark.graft.sccMaxSupersteps"
    intercept[IllegalArgumentException] {
      graft.operators.GraphAlgos.coloringSCC(nodes, edges).collect()
    }
    spark.conf.set(key, "120")
    try {
      val got = graft.operators.GraphAlgos.coloringSCC(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // a path is all singleton SCCs: every node labels itself
      assert(got == (0L until n).map(i => i -> i).toMap,
        "path graph must decompose into singleton SCCs")
    } finally spark.conf.unset(key)
  }
}
