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

  /** Pregel BFS from `source`, following edges in reverse (obj → subj),
    * up to `maxDepth`. Returns (node, depth) for reached nodes,
    * depth >= 1. Deterministic (min-depth merge is order-free).
    */
  def reverseBfs(triples: DataFrame, source: String, maxDepth: Int): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val g = fromTriples(triples)
    val srcId = Murmur3x64.hash64(source)
    val init = g.mapVertices((id, attr) =>
      (attr, if (id == srcId) 0 else Int.MaxValue))
    val bfs = init.pregel(
      initialMsg = Int.MaxValue,
      maxIterations = maxDepth,
      activeDirection = EdgeDirection.In)(
      vprog = (_, v, msg) => (v._1, math.min(v._2, msg)),
      // reverse traversal: message flows dst → src
      sendMsg = t =>
        if (t.dstAttr._2 != Int.MaxValue && t.dstAttr._2 + 1 < t.srcAttr._2)
          Iterator((t.srcId, t.dstAttr._2 + 1))
        else Iterator.empty,
      mergeMsg = math.min)
    bfs.vertices
      .filter { case (_, (_, d)) => d >= 1 && d != Int.MaxValue }
      .map { case (_, (node, d)) => (node, d) }
      .toDF("node", "depth")
  }

  /** Fixed-iteration PageRank over the triples graph (GraphX staticPageRank),
    * ranks rounded for display stability.
    */
  def pageRank(triples: DataFrame, iters: Int = 10): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val g = fromTriples(triples)
    val pr = g.staticPageRank(iters)
    g.vertices.join(pr.vertices)
      .map { case (_, (node, rank)) => (node, math.floor(rank * 1e6) / 1e6) }
      .toDF("node", "rank")
  }

  /** Connected components (undirected), component labeled by the
    * minimum vertex hash — deterministic.
    */
  def connectedComponents(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val g = fromTriples(triples)
    g.vertices.join(g.connectedComponents().vertices)
      .map { case (_, (node, cc)) => (node, cc) }
      .toDF("node", "component")
  }
}
