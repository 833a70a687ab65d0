package graft.api

/** DuckDB oracle SQL for the graph-analytics and sharding queries.
  *
  * The iterative algorithms are expressed as UNROLLED CTE rounds (plain
  * SQL has no aggregate-in-recursion), with the arithmetic restricted to
  * forms that are bit-exact on any engine: string `min` for component
  * labels, BIGINT floor division for rank mass. Each builder mirrors its
  * GraphOps twin contract-for-contract.
  */
object GraphSql {

  /** Min-label propagation over the undirected triples graph, `rounds`
    * unrolled rounds (must be >= the eccentricity of each component's
    * min-string node; the star graph's diameter is ~8, so 20 has wide
    * margin — the cross-SF verify sweep would catch a shortfall as a
    * label mismatch).
    */
  def ccSizes(rounds: Int = 20, limit: Int = 20): String = {
    // every CTE is MATERIALIZED: each round references the previous one
    // twice, and inlining would re-expand the parquet-backed `triples`
    // view per round (DuckDB then runs out of file handles)
    val steps = (1 to rounds).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT node, min(lbl) AS lbl FROM (
         |    SELECT node, lbl FROM l${k - 1}
         |    UNION ALL
         |    SELECT e.a AS node, l.lbl FROM edges e JOIN l${k - 1} l ON l.node = e.b)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${StarTriples.sqlCte.replaceFirst("AS \\(", "AS MATERIALIZED (")},
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT subj AS node FROM triples UNION SELECT obj FROM triples)),
       |edges AS MATERIALIZED (
       |  SELECT subj AS a, obj AS b FROM triples
       |  UNION SELECT obj AS a, subj AS b FROM triples),
       |l0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes),
       |$steps
       |SELECT lbl AS component, count(*) AS n FROM l$rounds
       |GROUP BY lbl ORDER BY n DESC, component LIMIT $limit""".stripMargin
  }

  /** Fixed-point integer PageRank, `iters` unrolled rounds — mirrors
    * GraphOps.pageRankFixedPoint: contrib = r // deg, r' = 150000 +
    * (85 · Σcontrib) // 100, everything BIGINT.
    */
  def pagerankFixedPoint(iters: Int = 5, limit: Int = 100): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT t.obj AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS s
         |  FROM triples t
         |  JOIN deg d ON d.subj = t.subj
         |  JOIN r${k - 1} r ON r.node = t.subj
         |  GROUP BY t.obj),
         |r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST(150000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN c$k c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${StarTriples.sqlCte.replaceFirst("AS \\(", "AS MATERIALIZED (")},
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT subj AS node FROM triples UNION SELECT obj FROM triples)),
       |deg AS MATERIALIZED (SELECT subj, count(*) AS deg FROM triples GROUP BY subj),
       |r0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$steps
       |SELECT node, r AS rank_u FROM r$iters
       |ORDER BY rank_u DESC, node LIMIT $limit""".stripMargin
  }

  /** Personalized-PageRank twin of [[pagerankFixedPoint]]: all teleport
    * mass returns to the SEED (r0 = 1e6 on the seed, 0 elsewhere; per
    * round only the seed receives the 15% restart term) — identical
    * BIGINT floor arithmetic to
    * `GraphOps.personalizedPageRankFixedPoint`. Zero-rank nodes
    * contribute `0 // deg = 0`, matching the Spark side's
    * skip-zero-messages optimization exactly.
    */
  /** SQL string-literal escape for seed values interpolated into the
    * PPR oracles — a seed containing a single quote must neither break
    * the oracle nor inject (the node ids here are star-schema entity
    * names, but the operator contract is any string).
    */
  private def sq(s: String): String = s.replace("'", "''")

  def personalizedPagerank(seed0: String, iters: Int = 5): String = {
    val seed = sq(seed0)
    val steps = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT t.obj AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS s
         |  FROM triples t
         |  JOIN deg d ON d.subj = t.subj
         |  JOIN r${k - 1} r ON r.node = t.subj
         |  GROUP BY t.obj),
         |r$k AS MATERIALIZED (
         |  SELECT n.node,
         |    CAST((CASE WHEN n.node = '$seed' THEN 150000 ELSE 0 END)
         |      + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN c$k c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${StarTriples.sqlCte.replaceFirst("AS \\(", "AS MATERIALIZED (")},
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT subj AS node FROM triples UNION SELECT obj FROM triples)),
       |deg AS MATERIALIZED (SELECT subj, count(*) AS deg FROM triples GROUP BY subj),
       |r0 AS MATERIALIZED (SELECT node,
       |  CAST(CASE WHEN node = '$seed' THEN 1000000 ELSE 0 END AS BIGINT) AS r
       |  FROM nodes),
       |$steps
       |SELECT node, r AS rank_u FROM r$iters WHERE r > 0
       |ORDER BY rank_u DESC, node""".stripMargin
  }

  /** Batched-PPR mirror: the per-seed unrolled PPR SQL unioned with a
    * seed label — each seed's slice is exactly the single-seed oracle,
    * which is the equality the batched operator guarantees.
    */
  def personalizedPagerankBatch(seeds: Seq[String], iters: Int = 5): String =
    seeds.map(s =>
      s"""SELECT '${sq(s)}' AS seed, node, rank_u FROM (
         |${personalizedPagerank(s, iters)}
         |)""".stripMargin)
      .mkString("\nUNION ALL\n") + "\nORDER BY seed, rank_u DESC, node"

  /** 60-bit hex value of md5(s)'s first 15 chars — the portable shard
    * hash family (same construction the MinHash/SimHash oracles use).
    */
  def md5Hash60(expr: String): String =
    s"""list_reduce(list_transform(string_split(substr(md5($expr), 1, 15), ''),
       |  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, x) -> a * 16 + x)""".stripMargin

  def shardDistribution(buckets: Int = 8): String =
    s"""WITH ${StarTriples.sqlCte}
       |SELECT bucket, count(*) AS n FROM (
       |  SELECT ${md5Hash60("subj")} % $buckets AS bucket FROM triples)
       |GROUP BY bucket ORDER BY bucket""".stripMargin
}
