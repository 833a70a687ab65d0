package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}

/** The declared operator surface: every entry is one operator from
  * SURVEY.md §2 (or a flagged extension), exercised over the driver
  * testdata, with a DuckDB oracle where SQL can express it.
  *
  * Conventions (driver compare protocol):
  *  - column names identical in Spark and oracle SQL (alias everything);
  *  - deterministic ORDER BY on both sides;
  *  - money math in DECIMAL(12,2) so both engines are exact.
  */
object Queries {
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      /** headline queries run in Bench */
      bench: Boolean = true
  )

  private def pat(subj: String = "", pred: String = "", obj: String = ""): TriplePattern =
    TriplePattern.fromStrings(subj, pred, obj)

  private def withCte(sql: String): String = s"WITH ${StarTriples.sqlCte}\n$sql"

  val registry: scala.collection.immutable.ListMap[String, Q] = scala.collection.immutable.ListMap(
    // ===== Reference parity: triple patterns + ArrayOp algebra =====
    // Operator #8/#10 (triple-pattern match, pattern query execute)
    "tp_subject" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .filter(PatternCompiler.compile(ArrayOp.of(pat(subj = "cust:42"))))
        .select("subj", "pred", "obj").orderBy("pred", "obj"),
      Some(withCte(
        "SELECT subj, pred, obj FROM triples WHERE subj = 'cust:42' ORDER BY pred, obj"))),

    // Operator #9 (AND combinator)
    "tp_and" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .filter(PatternCompiler.compile(ArrayOp.And(Seq(
          pat(pred = "mktsegment"), pat(obj = "BUILDING")))))
        .select("subj", "pred", "obj").orderBy("subj"),
      Some(withCte(
        "SELECT subj, pred, obj FROM triples WHERE pred = 'mktsegment' AND obj = 'BUILDING' ORDER BY subj"))),

    // Operator #9 (OR combinator — the proto3 default mode)
    "tp_or" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .filter(PatternCompiler.compile(ArrayOp.Or(
          triples = Seq(pat(subj = "nation:3")),
          args = Seq(ArrayOp.And(Seq(pat(pred = "mktsegment"), pat(obj = "MACHINERY")))))))
        .select("subj", "pred", "obj").orderBy("subj", "pred", "obj"),
      Some(withCte(
        """SELECT subj, pred, obj FROM triples
          |WHERE subj = 'nation:3' OR (pred = 'mktsegment' AND obj = 'MACHINERY')
          |ORDER BY subj, pred, obj""".stripMargin))),

    // Operator #9 (NOT combinator — row-level negation)
    "tp_not" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .filter(PatternCompiler.compile(ArrayOp.And(
          triples = Seq(pat(pred = "nation")),
          args = Seq(ArrayOp.Not(Seq(pat(obj = "nation:3")))))))
        .select("subj", "pred", "obj").orderBy("subj", "obj"),
      Some(withCte(
        """SELECT subj, pred, obj FROM triples
          |WHERE pred = 'nation' AND NOT (obj = 'nation:3')
          |ORDER BY subj, obj""".stripMargin))),

    // Operator #11 (multi-step traversal): order → customer → nation → name
    "tp_traverse" -> Q(
      (s, d) => Engine.traverse(Tables.starTriples(s, d), Seq(
          ArrayOp.of(pat(subj = "order:1"), pat(subj = "order:2"), pat(subj = "order:3"),
            pat(subj = "order:4"), pat(subj = "order:5")),
          ArrayOp.of(pat(pred = "nation")),
          ArrayOp.of(pat(pred = "name"))))
        .select("subj", "pred", "obj").orderBy("subj"),
      Some(withCte(
        """SELECT DISTINCT t3.subj AS subj, t3.pred AS pred, t3.obj AS obj
          |FROM triples t1
          |JOIN triples t2 ON t2.subj = t1.obj AND t2.pred = 'nation'
          |JOIN triples t3 ON t3.subj = t2.obj AND t3.pred = 'name'
          |WHERE t1.subj IN ('order:1','order:2','order:3','order:4','order:5')
          |ORDER BY subj""".stripMargin))),

    // Operator #2 (insert with dedup — the anti-join identity check)
    "tp_insert_dedup" -> Q(
      (s, d) => {
        val all = Tables.starTriples(s, d)
        val existing = all.filter(col("pred").isin("name", "mktsegment"))
        val incoming = all.filter(col("subj").startsWith("cust:"))
        incoming.join(existing, Seq("subj", "pred", "obj"), "left_anti")
          .agg(count(lit(1)).as("n"))
      },
      Some(withCte(
        """SELECT count(*) AS n FROM
          |  (SELECT * FROM triples WHERE subj LIKE 'cust:%') i
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM (SELECT * FROM triples WHERE pred IN ('name','mktsegment')) e
          |  WHERE e.subj = i.subj AND e.pred = i.pred AND e.obj = i.obj)""".stripMargin))),

    // Operator #16 (count)
    "tp_count" -> Q(
      (s, d) => Tables.starTriples(s, d).agg(count(lit(1)).as("n")),
      Some(withCte("SELECT count(*) AS n FROM triples"))),

    // Operator #17 (sort) + #15 (limit)
    "tp_sort_limit" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .select("subj", "pred", "obj")
        .orderBy("subj", "pred", "obj").limit(100),
      Some(withCte(
        "SELECT subj, pred, obj FROM triples ORDER BY subj, pred, obj LIMIT 100"))),

    // Operators #18/#19 (bloom build + bloom semi-join). The bloom is
    // FP-1e-9 over ~hundreds of keys, so it matches the exact semi-join
    // oracle; the UDF probe mirrors triplestore/bloom.go:39-73.
    "bloom_semijoin" -> Q(
      (s, d) => {
        val triples = Tables.starTriples(s, d)
        val wanted = triples.filter(col("pred") === "nation" && col("subj").startsWith("supp:"))
          .select(col("obj").as("k"))
        import org.apache.spark.util.sketch.BloomFilter
        val n = math.max(wanted.count(), 1L)
        val bf = wanted.select(col("k")).na.drop()
          .rdd.map(_.getString(0))
          .treeAggregate(BloomFilter.create(n, 1e-9))(
            (f, x) => { f.putString(x); f }, (a, b) => { a.mergeInPlace(b); a })
        val bc = s.sparkContext.broadcast(bf)
        val probe = udf((x: String) => bc.value.mightContainString(x))
        triples.filter(col("pred") === "name" && probe(col("subj")))
          .select("subj", "pred", "obj").orderBy("subj")
      },
      Some(withCte(
        """SELECT subj, pred, obj FROM triples t
          |WHERE pred = 'name' AND EXISTS (
          |  SELECT 1 FROM triples w
          |  WHERE w.pred = 'nation' AND w.subj LIKE 'supp:%' AND w.obj = t.subj)
          |ORDER BY subj""".stripMargin))),

    // ===== Extension: graph analytics (GREMLIN-shaped, SURVEY §2 #27) =====
    "graph_out_degree" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .groupBy("subj").agg(count(lit(1)).as("deg"))
        .orderBy(desc("deg"), asc("subj")).limit(50),
      Some(withCte(
        "SELECT subj, count(*) AS deg FROM triples GROUP BY subj ORDER BY deg DESC, subj LIMIT 50"))),

    "graph_in_degree" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .filter(col("obj").startsWith("nation:"))
        .groupBy("obj").agg(count(lit(1)).as("deg"))
        .orderBy(desc("deg"), asc("obj")),
      Some(withCte(
        """SELECT obj, count(*) AS deg FROM triples WHERE obj LIKE 'nation:%'
          |GROUP BY obj ORDER BY deg DESC, obj""".stripMargin))),

    // ===== Extension: analytics over the star schema =====
    // Grouped aggregate (TPC-H Q1 shape); decimal money math.
    "agg_pricing_summary" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("qty", col("l_quantity").cast("decimal(12,2)"))
        .withColumn("price", col("l_extendedprice").cast("decimal(12,2)"))
        .withColumn("disc", col("l_discount").cast("decimal(12,2)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").as("sum_qty"),
          sum("price").as("sum_base_price"),
          sum(col("price") * (lit(1) - col("disc"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
          |  sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
          |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS sum_disc_price,
          |  count(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Join + grouped agg + top-k (TPC-H Q3 shape). Broadcast the dim side.
    "join_topk_revenue" -> Q(
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
          .withColumn("rev",
            col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1) - col("l_discount").cast("decimal(12,2)")))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy("l_orderkey").agg(sum("rev").as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey")).limit(10)
      },
      Some(
        """SELECT l_orderkey,
          |  sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |WHERE EXISTS (SELECT 1 FROM customer
          |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
          |GROUP BY l_orderkey
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql), _)) => k -> sql }

  def benchNames: Seq[String] =
    registry.collect { case (k, q) if q.bench => k }.toSeq
}
