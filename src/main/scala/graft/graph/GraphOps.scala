package graft.graph

import org.apache.spark.graphx.{Edge, EdgeDirection, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Murmur3x64

/** GraphX view of a triples table — the analytics surface the reference
  * declared but never implemented (GREMLIN enum value,
  * protocol/protocol.proto:71; ErrNotImplemented core/query.go:109-112).
  * Flagged extension per BASELINE.json north star.
  *
  * `VertexId = murmur3_64(node id)` — the same hash the reference uses
  * for node identity on its keyspace ring (network/network.go:283-289),
  * so graph partitioning is consistent with store sharding.
  */
object GraphOps {

  /** Build a property graph: vertex attr = node string id, edge attr =
    * predicate. Objects that never appear as subjects (literals) are
    * vertices too — harmless for reachability, filtered where needed.
    */
  def fromTriples(triples: DataFrame): Graph[String, String] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val edges: RDD[Edge[String]] = triples
      .select("subj", "pred", "obj").as[(String, String, String)]
      .rdd.map { case (s, p, o) =>
        Edge(Murmur3x64.hash64(s), Murmur3x64.hash64(o), p)
      }
    val vertices: RDD[(VertexId, String)] = triples
      .select(explode(array(col("subj"), col("obj"))).as("node"))
      .distinct().as[String]
      .rdd.map(n => (Murmur3x64.hash64(n), n))
    // iterative algorithms (Pregel/PageRank/CC) traverse the graph many
    // times — cache once at construction
    Graph(vertices, edges).cache()
  }

  /** Graph construction memo, keyed by (session, source): BFS, PageRank
    * and CC over the same triples view share one cached Graph instead of
    * re-deriving vertices/edges per query — the same reuse a long-lived
    * engine gets from its materialized graph view. NOT a WeakHashMap:
    * the cached Graph's RDDs come from DataFrame.rdd, whose lineage
    * strongly retains the owning session, so a weak key would never be
    * collectable (value → key). Instead, stopped sessions are swept on
    * access — the same lifetime discipline as Tables.triplesMemo.
    */
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.HashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Graph[String, String]]]())

  /** The session that owns this graph's RDDs: prefer the active/default
    * session only when its context matches — binding result DataFrames
    * to an arbitrary thread-active session would attach them to a
    * session that may stop first in multi-session JVMs.
    */
  private def sessionOf(g: Graph[_, _]): SparkSession = {
    val ctx = g.vertices.sparkContext
    SparkSession.getActiveSession.filter(_.sparkContext eq ctx)
      .orElse(SparkSession.getDefaultSession.filter(_.sparkContext eq ctx))
      .getOrElse(throw new IllegalStateException(
        "no active or default SparkSession on the graph's SparkContext — " +
          "run graph ops from a thread bound to the owning session"))
  }

  def cachedGraph(triples: DataFrame, sourceKey: String): Graph[String, String] = {
    memo.keySet.removeIf(sess => sess.sparkContext.isStopped)
    memo.computeIfAbsent(triples.sparkSession,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Graph[String, String]]())
      .computeIfAbsent(sourceKey, _ => fromTriples(triples))
  }

  /** Pregel BFS from `source`, following edges in reverse (obj → subj),
    * up to `maxDepth`. Returns (node, depth) for reached nodes,
    * depth >= 1. Deterministic (min-depth merge is order-free).
    */
  def reverseBfs(triples: DataFrame, source: String, maxDepth: Int): DataFrame =
    reverseBfs(fromTriples(triples), source, maxDepth)

  def reverseBfs(g: Graph[String, String], source: String, maxDepth: Int): DataFrame = {
    val spark = sessionOf(g)
    import spark.implicits._
    val srcId = Murmur3x64.hash64(source)
    // Pregel on a primitive Int depth attr (the node string would ride
    // along in every vertex shuffle otherwise); names join back on once
    val init = g.mapVertices((id, _) => if (id == srcId) 0 else Int.MaxValue)
    val bfs = init.pregel(
      initialMsg = Int.MaxValue,
      maxIterations = maxDepth,
      activeDirection = EdgeDirection.In)(
      vprog = (_, d, msg) => math.min(d, msg),
      // reverse traversal: message flows dst → src
      sendMsg = t =>
        if (t.dstAttr != Int.MaxValue && t.dstAttr + 1 < t.srcAttr)
          Iterator((t.srcId, t.dstAttr + 1))
        else Iterator.empty,
      mergeMsg = math.min)
    g.vertices.join(bfs.vertices)
      .filter { case (_, (_, d)) => d >= 1 && d != Int.MaxValue }
      .map { case (_, (node, d)) => (node, d) }
      .toDF("node", "depth")
  }

  /** Fixed-iteration PageRank over the triples graph (staticPageRank
    * semantics: init 1.0, rank' = 0.15 + 0.85·Σ srcRank/outDeg, dangling
    * mass dropped), ranks floored at 1e-6 for display stability.
    *
    * NOT GraphX staticPageRank: that entry point rebuilds a
    * degree-joined, edge-reweighted graph on every call
    * (outerJoinVertices + mapTriplets + mapVertices each materialize new
    * edge/vertex partitions), so the warmed [[cachedGraph]] buys it
    * nothing — measured 2.7× the fixed-point twin's loop on the same
    * cached graph. Instead this runs the same aggregateMessages loop as
    * [[pageRankFixedPoint]] in Double arithmetic: contributions divide
    * at send time (no reweighted edge copy), with the identical
    * cache/materialize/unpersist round discipline.
    */
  /** Degree-joined edge frame + node universe shared by both PageRank
    * loops: (src, dst, od) with one row per EDGE (multi-edges kept —
    * each triple row contributes, matching the oracle), nodes =
    * distinct subj ∪ obj. Both persisted — each feeds every rank
    * round; callers unpersist after materializing their result.
    */
  private def prFrames(triples: DataFrame): (DataFrame, DataFrame) = {
    val edges = triples.select(col("subj").as("src"), col("obj").as("dst"))
    val ed = edges.join(
        edges.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .persist()
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct()
      .persist()
    (ed, nodes)
  }

  /** Float PageRank as a DataFrame loop (staticPageRank semantics:
    * contrib = rank/outDeg, rank' = 0.15 + 0.85·Σ, dangling mass
    * dropped). Rows-only — parallel float summation is reproducible
    * only to ulps, so no hash-exact oracle; [[pageRankFixedPoint]] is
    * the gated twin. The former GraphX per-round graph churn
    * (outerJoinVertices + cache + unpersist on boxed vertex tuples) was
    * measured superlinear at the 100× probe corpus (the exact twin:
    * 196 s vs 8.1 s at 30×); the declarative loop is three keyed
    * shuffles per round over Tungsten rows, with the degree-joined
    * edge frame built once.
    */
  def pageRank(triples: DataFrame, iters: Int = 10): DataFrame = {
    val (ed, nodes) = prFrames(triples)
    var rank = nodes.withColumn("rank", lit(1.0))
    for (_ <- 0 until iters) {
      val contribs = ed.join(rank, col("src") === col("node"))
        .select(col("dst").as("node"), (col("rank") / col("od")).as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"))
    }
    val out = rank
      .select(col("node"), (floor(col("rank") * 1e6) / 1e6).as("rank"))
      .cache()
    // finally: a task failure mid-materialization must not leak the
    // persisted per-round frames
    try out.count()
    finally {
      ed.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
    out
  }

  /** Connected components (undirected), component labeled by the
    * minimum vertex hash — deterministic.
    */
  def connectedComponents(triples: DataFrame): DataFrame =
    connectedComponents(fromTriples(triples))

  def connectedComponents(g: Graph[String, String]): DataFrame = {
    val spark = sessionOf(g)
    import spark.implicits._
    g.vertices.join(g.connectedComponents().vertices)
      .map { case (_, (node, cc)) => (node, cc) }
      .toDF("node", "component")
  }

  /** Component sizes with a PORTABLE label: the lexicographically
    * smallest node string in each component (the GraphX min-hash label
    * is engine-internal; the min string is reproducible by any engine,
    * which is what makes the oracle possible).
    */
  def componentSizes(triples: DataFrame): DataFrame =
    componentSizes(fromTriples(triples))

  def componentSizes(g: Graph[String, String]): DataFrame =
    connectedComponents(g)
      .groupBy("component")
      .agg(min("node").as("comp"), count(lit(1)).as("n"))
      .select(col("comp").as("component"), col("n"))

  /** Fixed-point PageRank in scaled integer arithmetic (rank units of
    * 1e-6): contrib = rank div outDeg, rank' = 0.15 + 0.85·Σcontrib,
    * all in BIGINT floor division. Integer sums are order-free, so the
    * result is bit-identical on any engine and any partitioning — the
    * oracle-gated twin of the float [[pageRank]] (whose parallel float
    * summation is only reproducible to ulps). Dangling mass is dropped,
    * as in GraphX staticPageRank. Long math headroom: rank mass is
    * nodes·1e6·85 ≈ 1e20 only past ~1e11 nodes; rescale units there.
    */
  def pageRankFixedPoint(triples: DataFrame, iters: Int = 5): DataFrame = {
    val (ed, nodes) = prFrames(triples)
    var rank = nodes.withColumn("rank_u", lit(1000000L))
    for (_ <- 0 until iters) {
      // per-edge contribution rank div outDeg, summed at the target —
      // identical BIGINT floor arithmetic to the unrolled SQL oracle.
      // Message-less nodes still decay to the 150000 dangling floor
      // (left join + coalesce 0, the outerJoinVertices semantics).
      val contribs = ed.join(rank, col("src") === col("node"))
        .select(col("dst").as("node"), expr("rank_u div od").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr("150000L + 85L * coalesce(s, 0L) div 100L").as("rank_u"))
    }
    val out = rank.cache()
    try out.count()
    finally {
      ed.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
    out
  }

  /** Ceiling on the driver-resident seed neighborhood in
    * [[personalizedPageRankFixedPoint]]: the ≤(iters-1)-hop forward
    * closure is collected and re-broadcast as a sorted Long array
    * (2²² ids = 32 MB). Within it, a seed query costs iters-1 scan-only
    * passes over the cached edges plus a neighborhood-sized fixed-point
    * loop — nothing per-round touches a graph-sized vertex RDD. A hub
    * seed on a 100 TB graph that overflows this wants the fully
    * distributed form: the edge table bucketed by src, the frontier kept
    * as an RDD, and each hop a frontier-sized shuffle join against the
    * bucket layout — same rounds, no driver state.
    */
  private[graft] val MaxSeedNeighborhood: Int = 1 << 22

  /** Personalized PageRank in the same order-free fixed-point BIGINT
    * arithmetic as [[pageRankFixedPoint]]: all teleport mass returns to
    * the SEED (rank ∝ seed-restarting-walk visit frequency — the
    * "related nodes" recommendation scorer).
    *
    * Seed-local by construction: in `iters` rounds mass can only leave
    * nodes within iters-1 hops of the seed, so the ≤(iters-1)-hop
    * forward closure is extracted FIRST (broadcast-frontier membership
    * filter over the cached edge RDD — one scan per hop, no shuffle of
    * the edges, no per-round vertex-RDD rebuild) and the fixed-point
    * loop runs on that neighborhood's out-edges only. Every per-round
    * structure (rank, contribs, degree-joined edges) is
    * neighborhood-sized; the full graph is touched by scan-only passes
    * and one final name join. Results are bit-identical to the
    * full-graph loop: the closure contains every node whose rank can be
    * nonzero as a sender, out-degrees are exact (ALL out-edges of an
    * in-closure source are kept, including those leaving it), and the
    * BIGINT sums are order-free. Returns only nodes that receive mass
    * (the full-graph form returned rank-0 rows for untouched nodes;
    * callers filter rank_u > 0 either way).
    */
  def personalizedPageRankFixedPoint(g: Graph[String, String], seed: String,
      iters: Int): DataFrame = {
    val spark = sessionOf(g)
    import spark.implicits._
    val sc = spark.sparkContext
    val seedId = graft.functions.Murmur3x64.hash64(seed)
    def member(sorted: Array[Long], v: Long): Boolean =
      java.util.Arrays.binarySearch(sorted, v) >= 0
    // (src, dst) pairs re-derived lazily per pass from the CACHED edge
    // RDD — each closure hop is a scan, not a materialization
    val pairs = g.edges.map(e => (e.srcId, e.dstId))

    // ---- Phase 1: forward closure to depth iters-1 (the mass sources)
    var reached = Array(seedId)
    var frontier = Array(seedId)
    var depth = 0
    while (depth < iters - 1 && frontier.nonEmpty) {
      val bf = sc.broadcast(frontier)
      val next = pairs.filter { case (s, _) => member(bf.value, s) }
        .map(_._2).distinct().collect()
      bf.destroy()
      val prev = reached
      frontier = next.filter(v => !member(prev, v)).distinct.sorted
      reached = (reached ++ frontier).sorted
      require(reached.length <= MaxSeedNeighborhood,
        s"seed neighborhood exceeds $MaxSeedNeighborhood nodes — use the " +
          "distributed frontier form (see MaxSeedNeighborhood scaladoc)")
      depth += 1
    }

    // ---- Phase 2: neighborhood out-edges with exact out-degrees
    val bs = sc.broadcast(reached)
    val withDeg = {
      val sub = pairs.filter { case (s, _) => member(bs.value, s) }
      val outDeg = sub.mapValues(_ => 1L).reduceByKey(_ + _)
      sub.join(outDeg).cache() // (src, (dst, outDeg)) — neighborhood-sized
    }
    withDeg.foreachPartition(_ => ())

    // ---- Phase 3: the same BIGINT loop, on neighborhood-sized RDDs
    val out = pprFixedPointLoop(g, withDeg, seedId, iters)
    withDeg.unpersist(blocking = false)
    bs.destroy()
    out
  }

  /** The shared PPR fixed-point loop over a (src → (dst, outDeg)) edge
    * RDD: identical order-free BIGINT arithmetic for the seed-local and
    * distributed forms, so both are bit-identical to the full-graph
    * reference loop. Materializes the result before returning (callers
    * unpersist `withDeg`, which the result reads through lineage).
    */
  private def pprFixedPointLoop(g: Graph[String, String],
      withDeg: RDD[(VertexId, (VertexId, Long))], seedId: VertexId,
      iters: Int): DataFrame = {
    val spark = sessionOf(g)
    import spark.implicits._
    val sc = spark.sparkContext
    val seedZero = sc.parallelize(Seq((seedId, 0L)))
    var rank: RDD[(VertexId, Long)] = sc.parallelize(Seq((seedId, 1000000L)))
    for (_ <- 0 until iters) {
      val contribs = withDeg.join(rank)
        .map { case (_, ((dst, dg), r)) => (dst, r / dg) }
        .reduceByKey(_ + _)
      // seedZero keeps the seed present when nothing cycles back to it;
      // the teleport term lands only on the seed, matching the
      // full-graph vprog exactly
      rank = contribs.mapValues(s => 85L * s / 100L)
        .union(seedZero)
        .reduceByKey(_ + _)
        .map { case (v, r) => (v, r + (if (v == seedId) 150000L else 0L)) }
    }
    val out = g.vertices.join(rank)
      .map { case (_, (node, r)) => (node, r) }
      .toDF("node", "rank_u")
    // materialize before releasing the loop cache — the result plan
    // reads withDeg through `rank`'s lineage
    out.cache().count()
    out
  }

  /** The fully distributed PPR form the [[MaxSeedNeighborhood]] scaladoc
    * names: the edge table keyed and hash-partitioned by src once (the
    * "bucketed by src" layout), the frontier kept as a co-partitioned
    * RDD, and each closure hop ONE frontier-sized shuffle join against
    * those buckets — no driver-resident closure, no `require` ceiling,
    * so a hub seed whose (iters-1)-hop neighborhood overflows 2²² nodes
    * still runs. Phases 2–3 and the BIGINT arithmetic are shared with
    * [[personalizedPageRankFixedPoint]], so results are bit-identical
    * (gated against the same naive reference loop in GraphStreamSpec and
    * cross-checked against the seed-local form at 10× via ScaleProbe).
    *
    * Cost shape vs the seed-local form: per hop, a shuffle of the
    * frontier (instead of a broadcast + full edge scan) plus a map-side
    * lookup join in the edge buckets. At small neighborhoods the
    * broadcast form wins (no shuffle latency); past the driver ceiling
    * only this form works. The declared `graph_ppr_related` query keeps
    * the seed-local path; this is the documented 100 TB escape hatch.
    */
  /** BATCHED multi-seed PPR: every phase of the distributed form, with
    * state keyed by (node, seed) pairs — the closure, the rank loop and
    * the teleport all carry the seed through the key, so one pass over
    * the bucketed edge layout serves every seed simultaneously (the
    * "related items for every query entity" production shape: k seeds
    * cost one shared edge shuffle per hop, not k passes). Per-pair
    * arithmetic is the SAME order-free BIGINT loop, so each seed's
    * slice is bit-identical to its single-seed run — the oracle is the
    * per-seed SQL unioned, and GraphStreamSpec pins slice
    * equality. State size is Σ per-seed neighborhood (pair-keyed, never
    * a per-seed broadcast), so a batch of hub seeds stays executor-
    * resident where k driver closures would not.
    */
  def personalizedPageRankFixedPointBatch(g: Graph[String, String],
      seeds: Seq[String], iters: Int): DataFrame = {
    val spark = sessionOf(g)
    import spark.implicits._
    val sc = spark.sparkContext
    val seedIds = seeds.map(s => graft.functions.Murmur3x64.hash64(s)).toArray
    val parts = new org.apache.spark.HashPartitioner(
      math.max(g.edges.getNumPartitions, sc.defaultParallelism))
    val bySrc: RDD[(VertexId, VertexId)] = g.edges
      .map(e => (e.srcId, e.dstId)).partitionBy(parts).cache()

    // closure over (node, seed) pairs: the edge side joins on node, the
    // seed rides along in the value — one frontier-sized shuffle per
    // hop regardless of how many seeds are in flight
    var reached: RDD[(VertexId, VertexId)] = sc
      .parallelize(seedIds.map(sid => (sid, sid)).toSeq).partitionBy(parts).cache()
    var frontier = reached
    var frontierSize = seedIds.length.toLong
    var depth = 0
    while (depth < iters - 1 && frontierSize > 0) {
      val next = frontier.join(bySrc, parts)
        .map { case (_, (sid, dst)) => ((dst, sid), ()) }
        .reduceByKey((a, _) => a)
        .map { case ((dst, sid), _) => (dst, sid) }
        .partitionBy(parts)
        .subtract(reached, parts)
        .cache()
      frontierSize = next.count()
      val prevReached = reached
      val prevFrontier = frontier
      // union is disjoint-distinct by construction (`next` is deduped
      // and subtracted from `reached`), so no distinct pass; both sides
      // share `parts`, making the union partitioner-aware and the
      // partitionBy a no-op guard rather than an extra shuffle
      reached = reached.union(next).partitionBy(parts).cache()
      reached.foreachPartition(_ => ())
      prevReached.unpersist(blocking = false)
      if (prevFrontier ne prevReached) prevFrontier.unpersist(blocking = false)
      frontier = next
      depth += 1
    }

    // out-edges + exact global out-degrees of every reached node (seed
    // union — degree is seed-independent, computed once)
    val reachedNodes = reached.map { case (n, _) => (n, ()) }
      .reduceByKey(parts, (a, _) => a)
    val sub = reachedNodes.join(bySrc, parts).map { case (s, (_, d)) => (s, d) }
    val outDeg = sub.mapValues(_ => 1L).reduceByKey(parts, _ + _)
    val withDeg = sub.join(outDeg, parts).cache()
    withDeg.foreachPartition(_ => ())

    // the shared BIGINT loop, pair-keyed: contributions shuffle on the
    // node (carrying the seed), teleport mass lands on (seed, seed)
    val seedSet = seedIds.toSet
    val seedZero = sc.parallelize(seedIds.map(sid => ((sid, sid), 0L)).toSeq)
    var rank: RDD[((VertexId, VertexId), Long)] =
      sc.parallelize(seedIds.map(sid => ((sid, sid), 1000000L)).toSeq)
    for (_ <- 0 until iters) {
      val contribs = withDeg
        .join(rank.map { case ((n, sid), r) => (n, (sid, r)) }, parts)
        .map { case (_, ((dst, dg), (sid, r))) => ((dst, sid), r / dg) }
        .reduceByKey(_ + _)
      rank = contribs.mapValues(s => 85L * s / 100L)
        .union(seedZero)
        .reduceByKey(_ + _)
        .map { case ((v, sid), r) =>
          ((v, sid), r + (if (v == sid && seedSet(v)) 150000L else 0L)) }
    }
    val names = sc.broadcast(seeds.map(s =>
      graft.functions.Murmur3x64.hash64(s) -> s).toMap)
    val out = g.vertices
      .join(rank.map { case ((n, sid), r) => (n, (sid, r)) })
      .map { case (_, (node, (sid, r))) => (names.value(sid), node, r) }
      .toDF("seed", "node", "rank_u")
    out.cache().count()
    withDeg.unpersist(blocking = false)
    frontier.unpersist(blocking = false)
    reached.unpersist(blocking = false)
    bySrc.unpersist(blocking = false)
    out
  }

  def personalizedPageRankFixedPointDistributed(g: Graph[String, String],
      seed: String, iters: Int): DataFrame = {
    val spark = sessionOf(g)
    val sc = spark.sparkContext
    val seedId = graft.functions.Murmur3x64.hash64(seed)
    val parts = new org.apache.spark.HashPartitioner(
      math.max(g.edges.getNumPartitions, sc.defaultParallelism))
    // the bucketed edge layout: one shuffle to key by src, cached for
    // every hop and for the degree join — the RDD analogue of a table
    // bucketed by src
    val bySrc: RDD[(VertexId, VertexId)] = g.edges
      .map(e => (e.srcId, e.dstId)).partitionBy(parts).cache()

    // ---- Phase 1: forward closure to depth iters-1, frontier as an RDD
    val first: RDD[(VertexId, Unit)] = sc.parallelize(Seq((seedId, ())))
      .partitionBy(parts)
    var reached = first.cache()
    var frontier = reached
    var frontierSize = 1L
    var depth = 0
    while (depth < iters - 1 && frontierSize > 0) {
      // one frontier-sized shuffle join per hop: the frontier moves to
      // the edge buckets (bySrc is already partitioned, so only the
      // frontier side shuffles), new nodes dedup via reduceByKey on the
      // same partitioner and drop already-reached via subtractByKey
      val next = frontier.join(bySrc, parts)
        .map { case (_, (_, dst)) => (dst, ()) }
        .reduceByKey(parts, (a, _) => a)
        .subtractByKey(reached, parts)
        .cache()
      frontierSize = next.count()
      val prevReached = reached
      val prevFrontier = frontier
      reached = reached.union(next).reduceByKey(parts, (a, _) => a).cache()
      reached.foreachPartition(_ => ())
      prevReached.unpersist(blocking = false)
      if (prevFrontier ne prevReached) prevFrontier.unpersist(blocking = false)
      frontier = next
      depth += 1
    }

    // ---- Phase 2: neighborhood out-edges + exact degrees, all keyed
    val sub = reached.join(bySrc, parts)
      .map { case (s, (_, d)) => (s, d) }
    val outDeg = sub.mapValues(_ => 1L).reduceByKey(parts, _ + _)
    val withDeg = sub.join(outDeg, parts).cache()
    withDeg.foreachPartition(_ => ())

    val out = pprFixedPointLoop(g, withDeg, seedId, iters)
    withDeg.unpersist(blocking = false)
    frontier.unpersist(blocking = false)
    reached.unpersist(blocking = false)
    bySrc.unpersist(blocking = false)
    out
  }
}
