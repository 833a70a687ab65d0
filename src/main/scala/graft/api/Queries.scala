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
  *  - money math in DECIMAL(12,2) internally, but every FINAL numeric
  *    column is DOUBLE or BIGINT: the driver compare normalizes through
  *    pandas, where DuckDB DECIMAL and HUGEINT silently become float64
  *    while Spark-parquet DECIMAL stays Decimal — emitting DOUBLE/BIGINT
  *    keeps both readings identical (tools/compare.py checks both).
  */
object Queries {
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def pat(subj: String = "", pred: String = "", obj: String = ""): TriplePattern =
    TriplePattern.fromStrings(subj, pred, obj)

  private def withCte(sql: String): String = s"WITH ${StarTriples.sqlCte}\n$sql"

  // Single source of truth for graph_k_truss's k: the Spark call and the
  // oracle's unrolled support threshold (sup >= k - 2) must move together
  // (ADVICE r9: a hardcoded 'sup >= 1' silently desyncs if k changes).
  private val kTrussK = 3

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

    // Operator #11 (multi-step traversal): order → customer → nation → name.
    // The derived triples view is scanned once per step — cache it for
    // the iteration (same pattern GraphX uses for iterative algorithms).
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
    // oracle; the codegen'd probe expression mirrors
    // triplestore/bloom.go:39-73.
    "bloom_semijoin" -> Q(
      (s, d) => {
        val triples = Tables.starTriples(s, d)
        val wanted = triples.filter(col("pred") === "nation" && col("subj").startsWith("supp:"))
          .select(col("obj").as("k"))
        // one-pass build: count folded into the filter aggregate, sized
        // at the MinBloomItems floor (one-nation-per-supplier keys stay
        // dimension-scale; a corpus exceeding the floor triggers
        // bloomOnePass's exact rebuild — the old two-job shape, never
        // worse)
        val bf = graft.store.TripleStore.bloomOnePass(
          wanted, graft.store.TripleStore.MinBloomItems, 1e-9)
        val bc = s.sparkContext.broadcast(bf)
        triples.filter(col("pred") === "name" &&
          graft.functions.GraftFunctions.bloomProbe(col("subj"), bc))
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
          // exact decimal sums, surfaced as DOUBLE: the driver compare
          // normalizes via pandas, where DuckDB DECIMAL becomes float64
          // but Spark-parquet DECIMAL stays Decimal — emit float64 on
          // both sides (decimal→double is correctly rounded in both
          // engines, so identical decimals give bit-identical doubles)
          sum("qty").cast("double").as("sum_qty"),
          sum("price").cast("double").as("sum_base_price"),
          sum(col("price") * (lit(1) - col("disc"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
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
          .groupBy("l_orderkey").agg(sum("rev").cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey")).limit(10)
      },
      Some(
        """SELECT l_orderkey,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |WHERE EXISTS (SELECT 1 FROM customer
          |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
          |GROUP BY l_orderkey
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // Window function: top-3 orders per customer by value.
    "window_topk_per_customer" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some(
        """SELECT o_custkey, o_orderkey, rn FROM (
          |  SELECT o_custkey, o_orderkey,
          |    row_number() OVER (PARTITION BY o_custkey
          |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3
          |ORDER BY o_custkey, rn""".stripMargin)),

    // The same top-k, as a bounded aggregate instead of a window: the
    // TopKAggregator keeps k entries per group through a map-side
    // partial, so the shuffle carries <= k rows per customer — the
    // window form must shuffle and SORT every order row. Same oracle
    // as window_topk_per_customer (identical comparator + tie-break).
    "window_topk_per_customer_agg" -> Q(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(graft.functions.TopKAggregator.topk(
          col("o_orderkey"), col("o_totalprice").cast("double"), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), (col("pos") + 1).cast("int").as("rn"))
        .orderBy("o_custkey", "rn"),
      Some(
        """SELECT o_custkey, o_orderkey, rn FROM (
          |  SELECT o_custkey, o_orderkey,
          |    row_number() OVER (PARTITION BY o_custkey
          |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3
          |ORDER BY o_custkey, rn""".stripMargin)),

    // Window breadth: running totals, lag, dense_rank in one frame.
    "window_running_total" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byDate = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        // no tiebreaker: equal prices share a rank, and the rank is a
        // function of p alone, so the output stays deterministic
        val byPrice = Window.partitionBy("o_custkey").orderBy(desc("p"))
        Tables.orders(s, d).filter(col("o_custkey") <= 100)
          .withColumn("p", col("o_totalprice").cast("decimal(12,2)"))
          .select(col("o_custkey"), col("o_orderkey"),
            sum("p").over(byDate.rowsBetween(Window.unboundedPreceding, 0))
              .cast("double").as("running_total"),
            lag(col("p"), 1).over(byDate).cast("double").as("prev_price"),
            dense_rank().over(byPrice).as("price_rank"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        """SELECT o_custkey, o_orderkey,
          |  CAST(sum(p) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
          |  CAST(lag(p) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
          |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY p DESC) AS INT) AS price_rank
          |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
          |        CAST(o_totalprice AS DECIMAL(12,2)) AS p
          |      FROM orders WHERE o_custkey <= 100)
          |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Distinct aggregate.
    "agg_distinct_parts" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some(
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Grouping sets: ROLLUP with coalesced totals rows.
    "rollup_pricing" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("qty", col("l_quantity").cast("decimal(12,2)"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("qty").cast("double").as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
          |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, count(*) AS n
          |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Grouping sets: full CUBE.
    "cube_pricing" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("qty", col("l_quantity").cast("decimal(12,2)"))
        .cube("l_returnflag", "l_linestatus")
        .agg(sum("qty").cast("double").as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
          |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, count(*) AS n
          |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Explicit GROUPING SETS (the non-hierarchical variant rollup/cube
    // can't express: per-flag totals and per-status totals, no pairs).
    "groupingsets_pricing" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("qty", col("l_quantity").cast("decimal(12,2)"))
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum("qty").cast("double").as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
          |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          |  count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Multiset EXCEPT ALL (duplicate-preserving — the variant
    // setop_except's DISTINCT semantics can't express).
    "setop_except_all" -> Q(
      (s, d) => {
        val ord = Tables.orders(s, d)
        ord.select(col("o_custkey").as("custkey"))
          .exceptAll(ord.filter(col("o_totalprice").cast("decimal(12,2)") > 150000)
            .select(col("o_custkey").as("custkey")))
          .groupBy("custkey").agg(count(lit(1)).as("n"))
          .orderBy("custkey")
      },
      Some(
        """SELECT custkey, count(*) AS n FROM (
          |  SELECT o_custkey AS custkey FROM orders
          |  EXCEPT ALL
          |  SELECT o_custkey AS custkey FROM orders
          |  WHERE CAST(o_totalprice AS DECIMAL(12,2)) > 150000)
          |GROUP BY custkey ORDER BY custkey""".stripMargin)),

    // Set ops: INTERSECT / EXCEPT (distinct semantics both engines).
    "setop_intersect" -> Q(
      (s, d) => Tables.orders(s, d).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey"),
      Some(
        """SELECT o_custkey AS custkey FROM orders
          |INTERSECT
          |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          |ORDER BY custkey""".stripMargin)),

    "setop_except" -> Q(
      (s, d) => Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
        .orderBy("custkey"),
      Some(
        """SELECT c_custkey AS custkey FROM customer
          |EXCEPT SELECT o_custkey AS custkey FROM orders
          |ORDER BY custkey""".stripMargin)),

    // Anti join (NOT EXISTS).
    "join_anti_no_orders" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")),
      Some(
        """SELECT count(*) AS n FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // TPC-H Q21 shape (waiting-supplier): late lineitems in finished
    // multi-supplier orders where ONLY this supplier was late — a
    // semi-join AND an anti-join against the same self-joined lineitem
    // scan, the hardest classic decorrelation shape. "Late" is
    // shipdate > orderdate + 90 days (this corpus has no
    // receipt/commit dates). All three lineitem sides join keyed on
    // l_orderkey (shuffle joins that AQE can co-plan); supplier is a
    // broadcast dim. Deterministic top-20 via (numwait DESC, s_name).
    "join_waiting_supplier" -> Q(
      (s, d) => {
        val late = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select("l_orderkey", "l_suppkey")
        val others = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val lateOthers = late
          .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        late
          .join(others,
            col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
            "left_semi")
          .join(lateOthers,
            col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
            "left_anti")
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name")).limit(20)
      },
      Some(
        """WITH late AS (
          |  SELECT l.l_orderkey, l.l_suppkey
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  WHERE o.o_orderstatus = 'F'
          |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
          |SELECT s_name, count(*) AS numwait
          |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
          |WHERE EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM late l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // Left outer join: order counts per customer including zero-order
    // customers.
    "join_outer_order_counts" -> Q(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some(
        """SELECT c_custkey, count(o_orderkey) AS n_orders
          |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // Correlated-subquery shape: orders strictly above their customer's
    // average order value — decorrelated Spark-first as a window average
    // (one shuffle on custkey, no per-row subquery).
    "join_above_avg_orders" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
        Tables.orders(s, d)
          .withColumn("p", col("o_totalprice").cast("decimal(12,2)"))
          .withColumn("cust_total", sum("p").over(w))
          .withColumn("cust_n", count(lit(1)).over(w))
          // compare via cross-multiplication: p * n > total — exact
          // decimal math, no average division scale headaches
          .filter(col("p") * col("cust_n") > col("cust_total"))
          .select(col("o_orderkey"), col("o_custkey"), col("p").cast("double").as("p"))
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS p
          |FROM orders o
          |WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          |    > (SELECT sum(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders i WHERE i.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)),

    // Multi-way join (TPC-H Q5 shape): revenue per ASIA nation.
    "join_regional_revenue" -> Q(
      (s, d) => {
        val asiaNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d).withColumn("rev",
          col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(12,2)")))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(sum("rev").cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some(
        """SELECT n_name,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // Time-window aggregation over the events stream table (batch view of
    // the Structured Streaming tumbling window — same plan shape).
    "events_hourly" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("hr", date_trunc("hour", col("ts")))
        .groupBy("hr", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
        .orderBy("hr", "event_type"),
      Some(
        """SELECT date_trunc('hour', ts) AS hr, event_type,
          |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
          |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    // Cohort retention: users bucketed by first-seen day, distinct
    // actives per (cohort, day offset) across the first week. Exact
    // integer date math; the first-seen frame joins back keyed on
    // user_id (shuffle co-located with the per-user aggregate), and
    // countDistinct runs as the standard two-phase expand/agg.
    "events_retention" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
        ev.join(first, "user_id")
          .withColumn("offset_days", datediff(col("day"), col("cohort")).cast("long"))
          .filter(col("offset_days") <= 7)
          // string cohort: the compare's pandas reading coerces DATE to
          // Timestamp, so date-typed result columns never hash-match
          .groupBy(col("cohort").cast("string").as("cohort"), col("offset_days"))
          .agg(countDistinct("user_id").as("users"))
          .orderBy("cohort", "offset_days")
      },
      Some(
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
          |f AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id)
          |SELECT CAST(cohort AS VARCHAR) AS cohort,
          |  CAST(day - cohort AS BIGINT) AS offset_days,
          |  count(DISTINCT user_id) AS users
          |FROM ev JOIN f USING (user_id)
          |WHERE day - cohort <= 7
          |GROUP BY 1, 2 ORDER BY cohort, offset_days""".stripMargin)),

    // Full cohort-retention matrix — the week-granular triangle chart
    // behind every growth dashboard: cohort = first-active ISO week,
    // cell (cohort, week offset) = distinct users active then. Week
    // arithmetic is integer day-diff div 7 from the cohort's Monday
    // (both engines truncate weeks to ISO Monday); the string cast on
    // the cohort keeps the pandas compare date-safe (the retention
    // query's lesson). Two aggregations + one broadcast-size first-seen
    // join per user — no window, no shuffle beyond the keyed groupBys.
    "events_cohort_matrix" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val first = ev.groupBy("user_id").agg(min("wk").as("cohort"))
        ev.join(first, "user_id")
          .withColumn("offset_weeks",
            expr("CAST(datediff(wk, cohort) AS BIGINT) div 7"))
          .groupBy(col("cohort").cast("string").as("cohort"), col("offset_weeks"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort", "offset_weeks")
      },
      Some(
        """WITH ev AS (
          |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
          |  FROM events),
          |f AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id)
          |SELECT CAST(cohort AS VARCHAR) AS cohort,
          |  CAST(wk - cohort AS BIGINT) // 7 AS offset_weeks,
          |  count(*) AS n_users
          |FROM ev JOIN f USING (user_id)
          |GROUP BY 1, 2 ORDER BY cohort, offset_weeks""".stripMargin)),

    // Hourly anomaly detection: flag (type, hour) buckets whose count
    // sits more than 2σ from the type's mean hourly rate. Mean and
    // variance come from exact integer partials (sum, sum-of-squares
    // are BIGINTs — aggregation-order-free), so the flagging is
    // deterministic on any layout; the per-type stats frame is tiny and
    // broadcasts back onto the hourly counts.
    // CDC latest-state compaction (SCD-1 upsert semantics): one row
    // per user = their most recent event (ts desc, event_id desc as
    // the deterministic tie-break — a CDC log's sequence number), then
    // the per-type census of latest states. The window partitions by
    // user_id — millions of small partitions, never a global sort —
    // which is exactly the MERGE INTO / compaction shape a lakehouse
    // upsert runs at 100 TB; in production the same query maintains
    // the materialized latest-state table incrementally per batch.
    "events_cdc_latest" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
            floor(col("value") * 100).cast("long").as("vc"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            expr("sum(vc) div count(*)").as("mean_value_c"))
          .orderBy("event_type")
      },
      Some(
        """WITH v AS (SELECT user_id, event_id, ts, event_type,
          |             CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
          |latest AS (
          |  SELECT event_type, vc FROM (
          |    SELECT event_type, vc,
          |      row_number() OVER (PARTITION BY user_id
          |        ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM v) WHERE rn = 1)
          |SELECT event_type, count(*) AS n_users,
          |  CAST(sum(vc) // count(*) AS BIGINT) AS mean_value_c
          |FROM latest GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Robust per-type anomaly detection by median absolute deviation —
    // the outlier detector that, unlike the winsorize percentiles, a
    // few extreme values cannot drag (50% breakdown point). Median and
    // MAD are EXACT integer rank selections in cents (the winsorize
    // discipline, rn = (n+1) div 2 — the lower median, never an
    // interpolated float), each a per-type window; the 5·MAD flagging
    // pass joins the 5-row threshold frame back as a broadcast. Output
    // is the per-type anomaly report (volume, median, MAD, flagged
    // count, worst deviation).
    "events_anomaly_mad" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables.events(s, d)
          .select(col("event_type"), floor(col("value") * 100).cast("long").as("vc"))
        def rankMedian(in: DataFrame, valueCol: String, out: String): DataFrame = in
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy(valueCol)))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .groupBy("event_type").agg(min(valueCol).as(out))
        val med = rankMedian(v, "vc", "med_c")
        val dev = v.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("vc") - col("med_c")))
        val mad = rankMedian(dev.select("event_type", "dev"), "dev", "mad_c")
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min("med_c").as("med_c"), min("mad_c").as("mad_c"),
            sum(when(col("dev") > col("mad_c") * 5, 1L).otherwise(0L)).as("n_anomalies"),
            max(when(col("dev") > col("mad_c") * 5, col("dev"))).as("worst_dev_c"))
          .orderBy("event_type")
      },
      Some(
        """WITH v AS (SELECT event_type,
          |             CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
          |r1 AS (SELECT event_type, vc,
          |         row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
          |         count(*) OVER (PARTITION BY event_type) AS n FROM v),
          |med AS (SELECT event_type, min(vc) AS med_c FROM r1
          |        WHERE rn = (n + 1) // 2 GROUP BY event_type),
          |d AS (SELECT v.event_type, v.vc, abs(v.vc - m.med_c) AS dev
          |      FROM v JOIN med m USING (event_type)),
          |r2 AS (SELECT event_type, dev,
          |         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
          |         count(*) OVER (PARTITION BY event_type) AS n FROM d),
          |mad AS (SELECT event_type, min(dev) AS mad_c FROM r2
          |        WHERE rn = (n + 1) // 2 GROUP BY event_type)
          |SELECT d.event_type, count(*) AS n,
          |  min(m.med_c) AS med_c, min(x.mad_c) AS mad_c,
          |  CAST(sum(CASE WHEN d.dev > 5 * x.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
          |  CAST(max(CASE WHEN d.dev > 5 * x.mad_c THEN d.dev END) AS BIGINT) AS worst_dev_c
          |FROM d JOIN med m USING (event_type) JOIN mad x USING (event_type)
          |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin)),

    "events_anomalous_hours" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .withColumn("hr", date_trunc("hour", col("ts")))
          .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
        val st = hourly.groupBy("event_type").agg(
          count(lit(1)).as("hours"),
          sum("n").as("s1"),
          sum(col("n") * col("n")).as("s2"))
        hourly.join(broadcast(st), "event_type")
          .withColumn("mean", col("s1").cast("double") / col("hours"))
          .withColumn("variance",
            col("s2").cast("double") / col("hours") - col("mean") * col("mean"))
          .filter((col("n") - col("mean")) * (col("n") - col("mean")) >
            lit(4.0) * col("variance"))
          .select(col("event_type"), col("hr"), col("n"),
            floor(abs(col("n") - col("mean")) /
              sqrt(greatest(col("variance"), lit(1e-12))) * 100).cast("long").as("z_x100"))
          .orderBy("event_type", "hr")
      },
      Some(TextSql.anomalousHours)),

    // Winsorized value summary per event type: clip `value` to its
    // type's [p1, p99] and report the clipped mean — the outlier-robust
    // metric a feature pipeline emits. Percentile selection is explicit
    // rank-at-ceil(p·n) over integer cents (one sort-window shuffle per
    // type, thresholds broadcast back) — NOT percentile()/quantile():
    // the discrete-vs-interpolated and rank-rounding conventions differ
    // across engines, while rank = (p·n + 99) div 100 is pure integer
    // arithmetic both sides. All outputs are exact integers.
    "events_value_winsorize" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("vc"))
        val ranked = v
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("vc")))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy("event_type")))
        val thresholds = ranked
          .filter(col("rn") === expr("(n + 99) div 100") ||
            col("rn") === expr("(n * 99 + 99) div 100"))
          .groupBy("event_type")
          .agg(min("vc").as("lo_c"), max("vc").as("hi_c"))
        v.join(broadcast(thresholds), "event_type")
          .withColumn("cc", least(greatest(col("vc"), col("lo_c")), col("hi_c")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min("lo_c").as("lo_c"), min("hi_c").as("hi_c"),
            expr("sum(cc) div count(*)").as("mean_clipped_c"))
          .orderBy("event_type")
      },
      Some(
        """WITH v AS (SELECT event_type,
          |             CAST(floor(value * 100) AS BIGINT) AS vc FROM events),
          |r AS (SELECT event_type, vc,
          |        row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
          |        count(*) OVER (PARTITION BY event_type) AS n FROM v),
          |t AS (SELECT event_type, min(vc) AS lo_c, max(vc) AS hi_c
          |      FROM r
          |      WHERE rn = (n + 99) // 100 OR rn = (n * 99 + 99) // 100
          |      GROUP BY event_type)
          |SELECT v.event_type, count(*) AS n,
          |  min(t.lo_c) AS lo_c, min(t.hi_c) AS hi_c,
          |  CAST(sum(least(greatest(v.vc, t.lo_c), t.hi_c)) // count(*) AS BIGINT)
          |    AS mean_clipped_c
          |FROM v JOIN t ON v.event_type = t.event_type
          |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin)),

    // The sketch form of the winsorize thresholds: at 100 TB the exact
    // rank selection's per-type sort-window is the cost; the
    // equal-width integer-grid histogram (Stats.gridThresholds) gets
    // both thresholds from map-side-combined linear scans — no
    // per-type sort at any scale — and, unlike the approx_percentile
    // KLL form it replaces (round-11, verdict ask #6), every output
    // bit replays in DuckDB: thresholds are bucket lower edges at the
    // exact ranks, error ≤ range/4096. OpsSpec still gates the
    // thresholds against the exact twin's rank selection.
    "events_value_winsorize_fast" -> Q(
      (s, d) => {
        val v = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("vc"))
        val t = graft.ops.Stats.gridThresholds(v, "event_type", "vc",
            graft.ops.Stats.GridBins, Seq(1, 99))
          .select(col("event_type"),
            col("q1_c").as("lo_c"), col("q99_c").as("hi_c"))
        v.join(broadcast(t), "event_type")
          .withColumn("cc", least(greatest(col("vc"), col("lo_c")), col("hi_c")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min("lo_c").as("lo_c"), min("hi_c").as("hi_c"),
            expr("sum(cc) div count(*)").as("mean_clipped_c"))
          .orderBy("event_type")
      },
      Some {
        val bins = graft.ops.Stats.GridBins
        s"""WITH v AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc
           |           FROM events),
           |ext AS (SELECT event_type, min(vc) AS mn, max(vc) AS mx, count(*) AS n
           |        FROM v GROUP BY 1),
           |hist AS (SELECT v.event_type,
           |    CASE WHEN mx = mn THEN 0 ELSE ((vc - mn) * $bins) // (mx - mn + 1) END AS bucket,
           |    count(*) AS c
           |  FROM v JOIN ext ON ext.event_type = v.event_type GROUP BY 1, 2),
           |cum AS (SELECT event_type, bucket,
           |    sum(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum FROM hist),
           |th AS (SELECT cum.event_type,
           |    min(CASE WHEN cum >= (n * 1 + 99) // 100 THEN bucket END) AS b1,
           |    min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS b99
           |  FROM cum JOIN ext ON ext.event_type = cum.event_type GROUP BY 1),
           |t AS (SELECT th.event_type,
           |    mn + (b1 * (mx - mn + 1)) // $bins AS lo_c,
           |    mn + (b99 * (mx - mn + 1)) // $bins AS hi_c
           |  FROM th JOIN ext ON ext.event_type = th.event_type)
           |SELECT v.event_type, count(*) AS n, min(t.lo_c) AS lo_c, min(t.hi_c) AS hi_c,
           |  CAST(sum(least(greatest(v.vc, t.lo_c), t.hi_c)) // count(*) AS BIGINT)
           |    AS mean_clipped_c
           |FROM v JOIN t ON v.event_type = t.event_type
           |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin
      }),

    // Two-phase salted aggregation over the 5 hot event types — the
    // canonical skew shape. Exact decimal partials make the salting
    // invisible to the result, so the plain GROUP BY is the oracle.
    "agg_salted_by_type" -> Q(
      (s, d) => graft.ops.Scale.saltedAgg(
          Tables.events(s, d).withColumn("v", col("value").cast("decimal(12,2)")),
          col("event_type"), saltFactor = 8,
          Seq(
            ("total", sum(col("v")), sum(col("total"))),
            ("n", count(lit(1)), sum(col("n")))))
        .select(col("key").as("event_type"),
          col("total").cast("double").as("total"),
          col("n").cast("long").as("n"))
        .orderBy("event_type"),
      Some(
        """SELECT event_type,
          |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
          |  count(*) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Sliding 1-hour windows every 30 minutes (each event lands in two
    // windows — the overlap tumbling windows can't express); oracle
    // replays Spark's epoch-aligned window math in microseconds.
    "events_sliding" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type"),
      Some(
        """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
          |w AS (SELECT event_type, us, unnest([
          |        (us // 1800000000) * 1800000000,
          |        (us // 1800000000) * 1800000000 - 1800000000]) AS b FROM e)
          |SELECT make_timestamp(b) AS w_start, event_type, count(*) AS n
          |FROM w WHERE b <= us AND us < b + 3600000000
          |GROUP BY b, event_type ORDER BY w_start, event_type""".stripMargin)),

    // Day-of-week profile of the event stream (Spark's dayofweek is
    // 1-based Sunday, DuckDB's 0-based — aligned explicitly).
    "events_by_dow" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("dow", (dayofweek(col("ts")) - 1).cast("long"))
        .groupBy("dow")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("dow"),
      Some(
        """SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, count(*) AS n,
          |  count(DISTINCT user_id) AS n_users
          |FROM events GROUP BY 1 ORDER BY dow""".stripMargin)),

    // Sessionization: 30-minute inactivity gap, session count per user.
    "events_sessionize" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("gap", when(col("prev_ts").isNotNull &&
            (col("ts").cast("double") - col("prev_ts").cast("double")) > 1800, 1).otherwise(0))
          .groupBy("user_id")
          .agg((sum("gap") + 1).cast("long").as("n_sessions"))
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id, CAST(1 + sum(CASE WHEN prev_ts IS NOT NULL
          |    AND epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
          |FROM (SELECT user_id, ts, event_id,
          |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |      FROM events)
          |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Ordered funnel over the event stream: per user, the first view,
    // the first click within an hour after it, the first purchase
    // within an hour after that; stage = how deep the user got. Three keyed
    // aggregations + two broadcast-able left joins — no window over the
    // whole stream.
    "events_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("vts"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("vts") &&
            col("ts") <= col("vts") + expr("INTERVAL 1 HOUR"))
          .groupBy("user_id").agg(min("ts").as("cts"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("cts") &&
            col("ts") <= col("cts") + expr("INTERVAL 1 HOUR"))
          .groupBy("user_id").agg(min("ts").as("pts"))
        v.join(c.select(col("user_id"), lit(1).as("has_c")), Seq("user_id"), "left")
          .join(p.select(col("user_id"), lit(1).as("has_p")), Seq("user_id"), "left")
          .withColumn("stage",
            (lit(1) + coalesce(col("has_c"), lit(0)) + coalesce(col("has_p"), lit(0))).cast("long"))
          .groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some(
        """WITH v AS (SELECT user_id, min(ts) AS vts FROM events
          |           WHERE event_type = 'view' GROUP BY user_id),
          |c AS (SELECT e.user_id, min(e.ts) AS cts FROM events e
          |      JOIN v ON v.user_id = e.user_id
          |      WHERE e.event_type = 'click' AND e.ts > v.vts
          |        AND e.ts <= v.vts + INTERVAL 1 HOUR GROUP BY e.user_id),
          |p AS (SELECT e.user_id, min(e.ts) AS pts FROM events e
          |      JOIN c ON c.user_id = e.user_id
          |      WHERE e.event_type = 'purchase' AND e.ts > c.cts
          |        AND e.ts <= c.cts + INTERVAL 1 HOUR GROUP BY e.user_id)
          |SELECT stage, count(*) AS n_users FROM (
          |  SELECT CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
          |       + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage
          |  FROM v LEFT JOIN c ON c.user_id = v.user_id
          |         LEFT JOIN p ON p.user_id = v.user_id)
          |GROUP BY stage ORDER BY stage""".stripMargin)),

    // As-of join (operator Spark lacks natively): for each error event,
    // the most recent click by the same user at-or-before it. Composed
    // Spark-first as a carry-forward window (sort once per user, no
    // range-join row explosion — scales as one shuffle on user_id);
    // oracle is DuckDB's native ASOF LEFT JOIN.
    "join_asof_last_click" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        // at equal ts the click sorts first, so an error sees it (>= semantics)
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1))
          .rowsBetween(Window.unboundedPreceding, 0)
        ev.withColumn("click_ts",
            last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "error")
          .select("user_id", "event_id", "ts", "click_ts")
          .orderBy("event_id")
      },
      Some(
        """WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
          |     errors AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error')
          |SELECT e.user_id, e.event_id, e.ts, c.ts AS click_ts
          |FROM errors e ASOF LEFT JOIN clicks c
          |  ON e.user_id = c.user_id AND e.ts >= c.ts
          |ORDER BY e.event_id""".stripMargin)),

    // Range join: clicks within the 10 minutes preceding each purchase,
    // per purchase. Equality on user_id keeps the join keyed (the range
    // predicate filters within the user's partition — no cross join).
    "join_range_attribution" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("ts_sec", col("ts").cast("double"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_sec").as("pts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_sec").as("cts"))
        purchases.join(clicks,
            purchases("user_id") === clicks("user_id") &&
              col("cts") >= col("pts") - 600 && col("cts") < col("pts"), "left")
          .groupBy("purchase_id")
          .agg(count(col("cts")).as("n_clicks"))
          .orderBy("purchase_id")
      },
      Some(
        """SELECT p.event_id AS purchase_id, count(c.uts) AS n_clicks
          |FROM (SELECT user_id, event_id, epoch(ts) AS uts FROM events WHERE event_type = 'purchase') p
          |LEFT JOIN (SELECT user_id, epoch(ts) AS uts FROM events WHERE event_type = 'click') c
          |  ON c.user_id = p.user_id AND c.uts >= p.uts - 600 AND c.uts < p.uts
          |GROUP BY p.event_id ORDER BY purchase_id""".stripMargin)),

    // Native session_window sessionization: per-user 30-min-gap sessions
    // with event counts; oracle assigns session ids via the lag/cumsum
    // rewrite (the algebraic equivalent).
    "events_session_stats" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some(
        """SELECT user_id, min(ts) AS session_start, count(*) AS n_events
          |FROM (
          |  SELECT user_id, ts,
          |    sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
          |             THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM (SELECT user_id, ts, event_id,
          |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |        FROM events))
          |GROUP BY user_id, session_id
          |ORDER BY user_id, session_start""".stripMargin)),

    // Association mining over the behavioral stream: event-type pairs
    // co-performed by the same user, with support and lift in exact
    // fixed-point (lift = n_ab·n_users·10⁶/(n_a·n_b)). The per-user
    // distinct-type frame is at most |types| rows per user; the pair
    // self-join is keyed on user_id and bounded by |types|² per user —
    // never corpus-quadratic. The lift numerator is computed in
    // DECIMAL(38,0) with integral division: in Long it overflows at
    // ~10⁷ users (n_both·n_users·10⁶ > 2⁶³), where non-ANSI Spark
    // would wrap silently while DuckDB promotes to HUGEINT — the two
    // engines would diverge exactly when the data gets big. `div` on
    // positive decimals and DuckDB's HUGEINT `//` are both exact
    // floor, so the compare stays bit-identical at any scale.
    "events_cooccurrence" -> Q(
      (s, d) => {
        val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
        val nUsers = Tables.events(s, d).agg(
          countDistinct(col("user_id")).as("n_users"))
        val single = ut.groupBy("event_type").agg(count(lit(1)).as("n_single"))
        val pairs = ut.select(col("user_id"), col("event_type").as("ta"))
          .join(ut.select(col("user_id"), col("event_type").as("tb")), "user_id")
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("n_both"))
        pairs
          .join(single.select(col("event_type").as("ta"), col("n_single").as("n_a")), "ta")
          .join(single.select(col("event_type").as("tb"), col("n_single").as("n_b")), "tb")
          .crossJoin(broadcast(nUsers))
          .withColumn("lift_x1e6", expr(
            """CAST((CAST(n_both AS DECIMAL(38,0)) * CAST(n_users AS DECIMAL(38,0))
              |       * CAST(1000000 AS DECIMAL(38,0)))
              |     div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))
              |     AS BIGINT)""".stripMargin))
          .select("ta", "tb", "n_both", "lift_x1e6")
          .orderBy("ta", "tb")
      },
      Some(
        """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          |n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
          |s AS (SELECT event_type, count(*) AS n_single FROM ut GROUP BY 1),
          |p AS (SELECT l.event_type AS ta, r.event_type AS tb, count(*) AS n_both
          |      FROM ut l JOIN ut r ON r.user_id = l.user_id AND l.event_type < r.event_type
          |      GROUP BY 1, 2)
          |SELECT ta, tb, n_both,
          |  CAST((CAST(n_both AS HUGEINT) * CAST(n.n_users AS HUGEINT) * 1000000)
          |       // (CAST(sa.n_single AS HUGEINT) * CAST(sb.n_single AS HUGEINT)) AS BIGINT) AS lift_x1e6
          |FROM p JOIN s sa ON sa.event_type = ta
          |       JOIN s sb ON sb.event_type = tb
          |       CROSS JOIN n
          |ORDER BY ta, tb""".stripMargin)),

    // Event-sequence mining: the per-user next-event transition matrix
    // (first-order Markov counts) with a fixed-point conditional
    // probability. One shuffle on user_id feeds the lead(); the matrix
    // itself is |event_types|² rows at ANY corpus size, so the final
    // aggregate map-side combines down to almost nothing. p is derived
    // in exact integer arithmetic (n·10⁶ / row-total) so both engines
    // floor the same IEEE quotient.
    "events_markov_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val counts = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type")
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("p_x1e6",
            floor(col("n") * lit(1000000L) /
              sum("n").over(Window.partitionBy("event_type"))).cast("long"))
          .orderBy("event_type", "next_type")
      },
      Some(
        """WITH t AS (
          |  SELECT event_type, lead(event_type) OVER
          |      (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          |  FROM events),
          |c AS (SELECT event_type, next_type, count(*) AS n FROM t
          |      WHERE next_type IS NOT NULL GROUP BY 1, 2)
          |SELECT event_type, next_type, n,
          |  CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY event_type)) AS BIGINT) AS p_x1e6
          |FROM c ORDER BY event_type, next_type""".stripMargin)),

    // Exact percentiles (interpolated) per group.
    "percentile_order_value" -> Q(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
      Some(
        """SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS p50,
          |  quantile_cont(o_totalprice, 0.9) AS p90, count(*) AS n
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Manual pivot via conditional aggregation.
    "pivot_revenue_by_flag" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).withColumn("rev",
          col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1) - col("l_discount").cast("decimal(12,2)")))
        li.groupBy("l_linestatus").agg(
            coalesce(sum(when(col("l_returnflag") === "A", col("rev"))), lit(0)).cast("double").as("rev_a"),
            coalesce(sum(when(col("l_returnflag") === "N", col("rev"))), lit(0)).cast("double").as("rev_n"),
            coalesce(sum(when(col("l_returnflag") === "R", col("rev"))), lit(0)).cast("double").as("rev_r"))
          .orderBy("l_linestatus")
      },
      Some(
        """SELECT l_linestatus,
          |  CAST(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) END), 0) AS DOUBLE) AS rev_a,
          |  CAST(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) END), 0) AS DOUBLE) AS rev_n,
          |  CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) END), 0) AS DOUBLE) AS rev_r
          |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // Sketch aggregates, REPLAYABLE form (round-11, verdict ask #6):
    // distinct parts via the deterministic md5-HLL (ops/Hll — register
    // count + digest + exact-integer estimate hash-gate in DuckDB) and
    // the median price via the equal-width integer-grid quantile sketch
    // (Stats.gridThresholds, lower-edge-at-rank convention). Replaces
    // the engine-internal HLL++/KLL pair (approx_count_distinct /
    // approx_percentile) whose sketch state cannot be replayed in SQL —
    // same 100 TB shape (two map-side-combined aggregations, no shuffle
    // of the raw keys; HLL state ≤1024·flags rows, grid state
    // ≤4096·flags rows) but every output bit is engine-checkable. The
    // exact distinct count rides along as the accuracy column; OpsSpec
    // gates both estimates against exact twins.
    "agg_approx_stats" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val hll = graft.ops.Hll.estimate(
            graft.ops.Hll.registers(li, "l_returnflag", col("l_partkey")),
            "l_returnflag")
          .select(col("l_returnflag"), col("m_used"),
            col("register_digest"), col("est_x1e3"))
        val p50 = graft.ops.Stats.gridThresholds(
            li.select(col("l_returnflag"),
              floor(col("l_extendedprice") * 100).cast("long").as("pc")),
            "l_returnflag", "pc", graft.ops.Stats.GridBins, Seq(50))
          .select(col("l_returnflag"), col("n"), col("q50_c").as("p50_grid_c"))
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).cast("long").as("nd_parts_exact"))
        hll.join(p50, "l_returnflag").join(exact, "l_returnflag")
          .orderBy("l_returnflag")
      },
      Some {
        import graft.ops.Hll.{M, W, NumX}
        val bins = graft.ops.Stats.GridBins
        val h60 = GraphSql.md5Hash60("CAST(l_partkey AS VARCHAR)")
        s"""WITH h AS (SELECT l_returnflag, $h60 AS h FROM lineitem),
           |r AS (SELECT l_returnflag, h // ${1L << W} AS idx, h % ${1L << W} AS rem FROM h),
           |rr AS (SELECT l_returnflag, idx,
           |    max(CASE WHEN rem = 0 THEN ${W + 1} ELSE ${W + 1} - length(bin(rem)) END) AS rho
           |  FROM r GROUP BY 1, 2),
           |e AS (SELECT l_returnflag, count(*) AS m_used,
           |    sum(CAST(1 AS BIGINT) << (${W + 1} - CAST(rho AS INT))) AS t_used,
           |    CAST(sum((idx + 1) * rho) AS BIGINT) AS register_digest
           |  FROM rr GROUP BY 1),
           |v AS (SELECT l_returnflag, CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
           |      FROM lineitem),
           |ext AS (SELECT l_returnflag, min(pc) AS mn, max(pc) AS mx, count(*) AS n
           |        FROM v GROUP BY 1),
           |hist AS (SELECT v.l_returnflag,
           |    CASE WHEN mx = mn THEN 0 ELSE ((pc - mn) * $bins) // (mx - mn + 1) END AS bucket,
           |    count(*) AS c
           |  FROM v JOIN ext ON ext.l_returnflag = v.l_returnflag GROUP BY 1, 2),
           |cum AS (SELECT l_returnflag, bucket,
           |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum FROM hist),
           |th AS (SELECT cum.l_returnflag,
           |    min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) AS b50
           |  FROM cum JOIN ext ON ext.l_returnflag = cum.l_returnflag GROUP BY 1),
           |p50 AS (SELECT th.l_returnflag, CAST(n AS BIGINT) AS n,
           |    mn + (b50 * (mx - mn + 1)) // $bins AS p50_grid_c
           |  FROM th JOIN ext ON ext.l_returnflag = th.l_returnflag),
           |x AS (SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts_exact
           |      FROM lineitem GROUP BY 1)
           |SELECT e.l_returnflag, CAST(m_used AS BIGINT) AS m_used, register_digest,
           |  CAST(CAST('$NumX' AS HUGEINT)
           |    // ((CAST(t_used AS HUGEINT)
           |        + CAST($M - m_used AS HUGEINT) * (CAST(1 AS HUGEINT) << ${W + 1}))
           |       * 1000000000) AS BIGINT) AS est_x1e3,
           |  p50.n, p50.p50_grid_c, x.nd_parts_exact
           |FROM e JOIN p50 ON p50.l_returnflag = e.l_returnflag
           |       JOIN x ON x.l_returnflag = e.l_returnflag
           |ORDER BY 1""".stripMargin
      }),

    // Deterministic hash sampling (the reproducible TABLESAMPLE a
    // training pipeline needs: same 5% slice on any engine, any run —
    // seeded-random samplers are engine-internal and unverifiable).
    "sample_hash_5pct" -> Q(
      (s, d) => Tables.orders(s, d)
        .filter(pmod(graft.functions.GraftFunctions.md5Hash60(col("o_orderkey")), lit(100L)) < 5)
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total")),
      Some(
        s"""SELECT count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
           |FROM orders
           |WHERE ${GraphSql.md5Hash60("CAST(o_orderkey AS VARCHAR)")} % 100 < 5""".stripMargin)),

    // Stratified deterministic sampling: per-language rates (downsample
    // the dominant 'en' stratum to 5%, keep 20% elsewhere — the
    // rebalancing move a curation pipeline makes before training).
    // Stateless hash-threshold membership: no sort, no count pass, the
    // same doc survives at any scale and on any executor layout.
    "sample_stratified" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          pmod(graft.functions.GraftFunctions.md5Hash60(
            concat(lit("strat:"), col("doc_id").cast("string"))), lit(100L)).as("h"))
        .filter(col("h") < when(col("lang") === "en", lit(5L)).otherwise(lit(20L)))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id"),
      Some(TextSql.sampleStratified)),

    // Full outer join with presence classification.
    "join_full_outer" -> Q(
      (s, d) => {
        val ord = Tables.orders(s, d)
        val a = ord.filter(year(col("o_orderdate")) === 1995)
          .select(col("o_orderkey").as("k"), lit(1).as("in_a"))
        val b = ord.filter(col("o_totalprice").cast("decimal(12,2)") > 150000)
          .select(col("o_orderkey").as("k"), lit(1).as("in_b"))
        a.join(b, Seq("k"), "full_outer")
          .agg(
            sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1).otherwise(0))
              .cast("long").as("n_both"),
            sum(when(col("in_b").isNull, 1).otherwise(0)).cast("long").as("n_a_only"),
            sum(when(col("in_a").isNull, 1).otherwise(0)).cast("long").as("n_b_only"))
      },
      Some(
        """SELECT
          |  CAST(sum(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
          |  CAST(sum(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
          |  CAST(sum(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only
          |FROM (SELECT o_orderkey AS k FROM orders WHERE year(o_orderdate) = 1995) a
          |FULL OUTER JOIN (SELECT o_orderkey AS k FROM orders
          |                 WHERE CAST(o_totalprice AS DECIMAL(12,2)) > 150000) b
          |  ON a.k = b.k""".stripMargin)),

    // Ordered set aggregation to a string (array functions surface;
    // strings rather than array cells keep the compare representation
    // engine-neutral).
    "agg_type_list" -> Q(
      (s, d) => Tables.part(s, d)
        .groupBy("p_brand")
        .agg(concat_ws(",", sort_array(collect_set(col("p_type")))).as("types"),
          countDistinct(col("p_type")).as("n_types"))
        .orderBy("p_brand"),
      Some(
        """SELECT p_brand, string_agg(p_type, ',' ORDER BY p_type) AS types,
          |  CAST(count(*) AS BIGINT) AS n_types
          |FROM (SELECT DISTINCT p_brand, p_type FROM part)
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // String functions: filter/group/scalar transforms.
    "string_brand_stats" -> Q(
      (s, d) => Tables.part(s, d)
        .filter(col("p_type").endsWith("BRASS"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("p_size").as("sum_size"),
          min(upper(col("p_name"))).as("first_name"))
        .orderBy("p_brand"),
      Some(
        """SELECT p_brand, count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size,
          |  min(upper(p_name)) AS first_name
          |FROM part WHERE p_type LIKE '%BRASS'
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // Date functions: yearly order stats.
    "date_orders_by_year" -> Q(
      (s, d) => Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .groupBy("yr")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
        .orderBy("yr"),
      Some(
        """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin)),

    // Regexp extraction from the JSON-ish props payload (regexp on both
    // sides — avoids DuckDB's json extension dependency).
    "regexp_event_props" -> Q(
      (s, d) => Tables.events(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some(
        """SELECT event_type,
          |  CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
          |  count(*) AS n
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Shard-hash distribution over the triples view. The production
    // ring (model.Keyspace) shards on murmur3-64 like the reference;
    // this query demos the same uniformity contract through the
    // portable 60-bit md5 family so DuckDB can replay it bit-for-bit
    // (the murmur path stays covered by dedup_minhash_fast + the
    // Keyspace ScalaTest suite).
    "shard_distribution" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .withColumn("bucket",
          pmod(graft.functions.GraftFunctions.md5Hash60(col("subj")), lit(8L)))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some(GraphSql.shardDistribution(buckets = 8))),

    // ===== Extension: GraphX/Pregel analytics =====
    // 2-hop reverse reachability from a region node via Pregel BFS;
    // oracle = the equivalent 2 joins.
    "graph_2hop" -> Q(
      (s, d) => graft.graph.GraphOps
        .reverseBfs(graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d),
          "region:2", maxDepth = 2)
        .withColumn("depth", col("depth").cast("long"))
        .orderBy("depth", "node"),
      Some(withCte(
        """SELECT subj AS node, CAST(1 AS BIGINT) AS depth FROM triples
          |WHERE pred = 'region' AND obj = 'region:2'
          |UNION ALL
          |SELECT t.subj AS node, CAST(2 AS BIGINT) AS depth FROM triples t
          |WHERE t.pred = 'nation' AND EXISTS (
          |  SELECT 1 FROM triples w
          |  WHERE w.pred = 'region' AND w.obj = 'region:2' AND w.subj = t.obj)
          |ORDER BY depth, node""".stripMargin))),

    // PageRank over the triples graph (staticPageRank semantics on the
    // shared cached graph — rows-only: parallel float summation is only
    // reproducible to ulps, so no hash-exact SQL oracle;
    // graph_pagerank_exact below is the gated twin). Top-100 for
    // bounded output.
    "graph_pagerank" -> Q(
      (s, d) => graft.graph.GraphOps
        .pageRank(graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d), iters = 5)
        .orderBy(desc("rank"), asc("node")).limit(100),
      None),

    // Fixed-point integer PageRank — order-free BIGINT arithmetic, so
    // the 5-iteration unrolled DuckDB oracle matches bit-for-bit.
    "graph_pagerank_exact" -> Q(
      (s, d) => graft.graph.GraphOps
        .pageRankFixedPoint(graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d), iters = 5)
        .orderBy(desc("rank_u"), asc("node")).limit(100),
      Some(GraphSql.pagerankFixedPoint(iters = 5, limit = 100))),

    // Personalized PageRank from a seed entity — the "related nodes"
    // recommendation scorer (rank ∝ seed-restarting-walk visit
    // frequency). Same order-free fixed-point BIGINT loop as the exact
    // PageRank, teleporting to the seed only; message volume stays
    // proportional to the REACHED frontier (zero-rank vertices send
    // nothing), so a seed query on a 100 TB graph touches its
    // neighborhood, not the graph. Oracle unrolls the same 5 rounds.
    "graph_ppr_related" -> Q(
      (s, d) => graft.graph.GraphOps
        .personalizedPageRankFixedPoint(
          graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d),
          "order:1", iters = 5)
        .filter(col("rank_u") > 0)
        .orderBy(desc("rank_u"), asc("node")),
      Some(GraphSql.personalizedPagerank("order:1", iters = 5))),

    // BATCHED multi-seed PPR — "related nodes for every query entity"
    // in one pass: state is keyed by (node, seed) pairs end-to-end
    // (closure, rank loop, teleport), so k seeds share each hop's
    // edge-bucket shuffle instead of running k passes, and a batch of
    // hub seeds stays executor-resident where k driver closures would
    // not. Per-pair arithmetic is the same order-free BIGINT loop, so
    // each seed's slice is bit-identical to its single-seed run — the
    // oracle IS the single-seed SQL unioned per seed.
    "graph_ppr_batch" -> Q(
      (s, d) => graft.graph.GraphOps
        .personalizedPageRankFixedPointBatch(
          graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d),
          Seq("order:1", "order:2", "order:3"), iters = 5)
        .filter(col("rank_u") > 0)
        .orderBy(asc("seed"), desc("rank_u"), asc("node")),
      Some(GraphSql.personalizedPagerankBatch(
        Seq("order:1", "order:2", "order:3"), iters = 5))),

    // Connected-component sizes, labeled by each component's minimum
    // node string (portable — oracle is 20 unrolled min-label rounds).
    "graph_cc_sizes" -> Q(
      (s, d) => graft.graph.GraphOps
        .componentSizes(graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d))
        .orderBy(desc("n"), asc("component")).limit(20),
      Some(GraphSql.ccSizes(rounds = 20, limit = 20))),

    // BFS depth profile: frontier size per hop from a seed (the
    // reachability fan-out report). The Pregel traversal prunes to the
    // frontier each round — message volume is the frontier's in-edges,
    // never the graph; the oracle unrolls the layered star schema.
    "graph_bfs_profile" -> Q(
      (s, d) => graft.graph.GraphOps
        .reverseBfs(graft.graph.GraphOps.cachedGraph(Tables.starTriples(s, d), d),
          "region:2", maxDepth = 4)
        .groupBy(col("depth").cast("long").as("depth"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("depth"),
      Some(s"""WITH ${StarTriples.sqlCte},
        |d1 AS (SELECT DISTINCT subj FROM triples
        |       WHERE pred = 'region' AND obj = 'region:2'),
        |d2 AS (SELECT DISTINCT t.subj FROM triples t
        |       JOIN d1 ON t.obj = d1.subj WHERE t.pred = 'nation'),
        |d3 AS (SELECT DISTINCT t.subj FROM triples t
        |       JOIN d2 ON t.obj = d2.subj WHERE t.pred = 'customer')
        |SELECT depth, count(*) AS n_nodes FROM (
        |  SELECT subj, CAST(1 AS BIGINT) AS depth FROM d1
        |  UNION ALL SELECT subj, 2 FROM d2
        |  UNION ALL SELECT subj, 3 FROM d3)
        |GROUP BY depth ORDER BY depth""".stripMargin)),

    // Per-predicate cardinality statistics (count + distinct subjects /
    // objects) — the statistics a distributed triple-store planner
    // feeds its join ordering (selectivity = n/n_subj per pred). One
    // map-side-combining aggregate over the triples view.
    "tp_pred_stats" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .groupBy("pred")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("subj")).as("n_subj"),
          countDistinct(col("obj")).as("n_obj"))
        .orderBy("pred"),
      Some(withCte(
        """SELECT pred, count(*) AS n, count(DISTINCT subj) AS n_subj,
          |  count(DISTINCT obj) AS n_obj
          |FROM triples GROUP BY pred ORDER BY pred""".stripMargin))),

    // The reference's intended bloom reconciliation (SURVEY §2 #18-19;
    // its replication TODO) end-to-end as a declared query — the same
    // bloom + keyspace-guard + anti-probe compose TripleStore.syncFrom
    // runs: a "local" replica holds the keyspace slice K of the ring (a
    // WRAPPING interval, so both branches of the unsigned-interval test
    // are exercised) but is missing every 'nation' edge; the sync diff
    // is the peer's K-sliced triples whose canonical key does NOT probe
    // positive in the local bloom — exactly what syncFrom ships into
    // its dedup insert. Ring position is the portable 60-bit md5 hash
    // so the oracle replays the slice; the oracle is the EXACT set
    // difference. NOTE the hash gate is therefore PROBABILISTIC, not
    // structural: a bloom false positive would drop a diff triple and
    // fail the gate, with per-run probability ≈ n_diff · 1e-9 (~10⁻⁶ at
    // the sf0.01 fixture's ~800 diff rows) — negligible, and syncFrom's
    // anti-join insert absorbs even that residue, but if this gate ever
    // flakes, regate rows-only with an OpsSpec oracle⊇result check
    // rather than chasing a phantom regression.
    "tp_sync_diff" -> Q(
      (s, d) => {
        val gf = graft.functions.GraftFunctions
        // [3·2⁵⁸, 2⁵⁸): the wrapping half of the 60-bit md5 ring
        val ks = graft.model.Keyspace(3L << 58, 1L << 58)
        val sliced = Tables.starTriples(s, d).filter(
          graft.store.TripleStore.keyspaceIncludes(ks, gf.md5Hash60(col("subj"))))
        val localKeys = sliced.filter(col("pred") =!= "nation")
          .select(gf.canonicalKey(col("subj"), col("pred"), col("obj"), lit("")).as("k"))
        // bound = half-ring fraction of the (metadata-fast) triple count
        // — NOT the MinBloomItems floor: beyond ~10k keys an
        // under-bound makes bloomOnePass pay its exact REBUILD, i.e.
        // the whole build twice (measured 7.2× scaling at 10× before
        // this; the count() here prunes to row counts at the sources)
        val bound = (Tables.starTriples(s, d).count() + 1) / 2
        val bf = graft.store.TripleStore.bloomOnePass(localKeys, bound, 1e-9)
        val bc = s.sparkContext.broadcast(bf)
        sliced.filter(!gf.bloomProbe(
            gf.canonicalKey(col("subj"), col("pred"), col("obj"), lit("")), bc))
          .select("subj", "pred", "obj")
          .orderBy("subj", "pred", "obj")
      },
      Some(withCte(
        s"""SELECT subj, pred, obj FROM triples
           |WHERE pred = 'nation'
           |  AND (${GraphSql.md5Hash60("subj")} < ${1L << 58}
           |       OR ${GraphSql.md5Hash60("subj")} >= ${3L << 58})
           |ORDER BY subj, pred, obj""".stripMargin))),

    // Degree distribution of the triples graph (the classic power-law
    // sanity report): out-degree per subject, then a histogram over
    // degrees. Two map-side-combining aggregates, key spaces |V| then
    // |distinct degrees| — no wide row ever materializes.
    "graph_degree_distribution" -> Q(
      (s, d) => Tables.starTriples(s, d)
        .groupBy("subj").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("deg"),
      Some(withCte(
        """SELECT deg, count(*) AS n_nodes
          |FROM (SELECT subj, count(*) AS deg FROM triples GROUP BY subj)
          |GROUP BY deg ORDER BY deg""".stripMargin))),

    // ===== Extension: LLM-pipeline — text analysis =====
    "text_stats" -> Q(
      (s, d) => graft.ops.TextOps.stats(Tables.documents(s, d)).orderBy("doc_id"),
      Some(TextSql.stats)),

    "text_langid_eval" -> Q(
      (s, d) => {
        val t = graft.ops.TextOps
        // scores projected once, argmax over the references (see
        // TextOps.langIdFromScores for why this is two selects)
        Tables.documents(s, d)
          .select(col("lang") +:
            t.stopwords.map { case (l, _) => t.langScore(col("text"), l).as(s"s_$l") }: _*)
          .select(col("lang"),
            t.langIdFromScores(t.stopwords.map { case (l, _) => l -> col(s"s_$l") })
              .as("lang_pred"))
          .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
          .orderBy("lang", "lang_pred")
      },
      Some(TextSql.langidEval)),

    // In-engine model training: a 4-feature linear language probe fit
    // by full-batch gradient descent in INTEGER fixed-point — each step
    // is one map-side-combinable aggregation (order-free DECIMAL(38,0)
    // gradient sums → a 6-value driver row), so the training run is
    // bit-identical on any engine/partitioning, unlike MLlib's float
    // reductions. The output is the training curve (pre-step MSE +
    // post-step weights per iteration) — the data-quality probe
    // artifact. Truncating division throughout (Spark `div` ≡ DuckDB
    // `//` on signed operands).
    "text_linear_probe" -> Q(
      (s, d) => graft.ops.TextOps.linearProbe(Tables.documents(s, d), iters = 3)
        .orderBy("iter"),
      Some(TextSql.linearProbe(iters = 3))),

    // The eval half of the probe: score the corpus with the trained
    // weights and report the reliability table (prediction bucket →
    // volume, actual positives, mean prediction) — what decides if the
    // probe's scores can gate a curation pipeline. Trains 20 steps
    // (the curve query stops at 3 — here the scores must SPREAD before
    // bucketing means anything) through the same fit/CTE text as
    // text_linear_probe; scoring is one more scan into an 11-row agg.
    "text_probe_calibration" -> Q(
      (s, d) => graft.ops.TextOps.probeCalibration(Tables.documents(s, d), iters = 20),
      Some(TextSql.probeCalibration(iters = 20))),

    // Composed curation pipeline — what the text/dedup operators exist
    // for: language + quality gates, then exact-dedup keeping the
    // canonical (smallest) doc per fingerprint. One narrow scoring pass,
    // one shuffle on the fingerprint.
    "pipeline_curation" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("fp").orderBy("doc_id")
        graft.ops.TextOps.stats(Tables.documents(s, d))
          .filter(col("lang_pred") === "en" && col("quality") >= 7000)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "quality")
          .orderBy("doc_id")
      },
      Some(TextSql.curation(minQuality = 7000))),

    // Deterministic epoch shuffle: each doc's position comes from
    // md5(seed ‖ doc_id) — stateless, so ANY executor layout reproduces
    // the same epoch order, and changing the seed re-shuffles. At scale
    // this is the standard total-sort-on-random-key training shuffle;
    // the top-100 form here is a TakeOrdered (no global sort
    // materializes for a bounded preview).
    "pipeline_epoch_shuffle" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          substring(md5(concat(lit("epoch7:"), col("doc_id"))), 1, 15).as("rkey"))
        .orderBy("rkey", "doc_id")
        .limit(100),
      Some(
        """SELECT doc_id, substr(md5('epoch7:' || doc_id), 1, 15) AS rkey
          |FROM documents ORDER BY rkey, doc_id LIMIT 100""".stripMargin)),

    // Compression-ratio quality signal (deflate bytes / raw bytes,
    // fixed-point): the web-curation heuristic — template/boilerplate
    // text compresses far below natural prose, near-random payloads
    // barely compress. The per-row deflate runs as a native codegen'd
    // expression (DeflateSizeExpr) with a thread-reused zlib stream;
    // the aggregate is one map-side-combining scan. Rows-only: no
    // cross-engine deflate exists, so the ordering properties
    // (repetitive < natural < high-entropy) gate in OpsSpec instead.
    "text_compression_ratio" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          graft.functions.DeflateSizeExpr(col("text")).as("csz"),
          octet_length(col("text")).cast("long").as("osz"))
        .filter(col("osz") > 0)
        .withColumn("ratio_x1e6", expr("csz * 1000000 div osz"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(ratio_x1e6) div count(*)").as("mean_ratio_x1e6"),
          min("ratio_x1e6").as("min_ratio_x1e6"),
          max("ratio_x1e6").as("max_ratio_x1e6"))
        .orderBy("source"),
      None),

    // Cross-engine-gated twin of the deflate signal above (DuckDB has
    // no deflate, so text_compression_ratio is rows-only): within-doc
    // distinct/total word-trigram ratio — the same redundancy a
    // dictionary coder exploits (repeated trigrams → low distinct ratio
    // → low deflate ratio), deterministic in both engines. Same scan
    // shape as the deflate form: one per-doc scalar (pure column
    // expressions, no explode/shuffle until the final per-source
    // aggregate), integer micro-unit arithmetic. This hash-gates the
    // family's plumbing; OpsSpec gates the deflate expression itself
    // (ordering + codegen/interpreted parity).
    "text_compressibility_proxy" -> Q(
      (s, d) => {
        // O(tokens) guard: the token array and the shingle array are
        // bound as LAMBDA VARIABLES (transform over a singleton array),
        // never as projection aliases. An alias referenced several times
        // inside a lambda body gets re-inlined by CollapseProject — and
        // lambda bodies get no CSE — so the round-6 projection-alias form
        // re-ran the split per element: O(tokens²) splits per doc, 12 s
        // vs <1 s at sf0.1. A lambda variable CANNOT be re-inlined, so
        // the split provably runs once per doc; PlanSpec pins this by
        // counting `split(` occurrences in the optimizedPlan (== 1).
        // The whole per-doc ratio collapses to ONE scalar here so no
        // multi-referenced alias survives for the optimizer to inline;
        // docs with <3 tokens yield a null ratio (counted out by
        // count(uniq_x1e6) — same set as the oracle's len(shs)>0).
        val perDoc = element_at(
          transform(array(graft.ops.TextOps.tokens(col("text"))), tk =>
            element_at(
              transform(
                array(when(size(tk) >= 3,
                  transform(sequence(lit(0), size(tk) - 3),
                    i => concat_ws(" ", element_at(tk, i + 1),
                      element_at(tk, i + 2), element_at(tk, i + 3))))
                  .otherwise(array())),
                shs => graft.functions.GraftFunctions.longDiv(
                  size(array_distinct(shs)).cast("long") * lit(1000000L),
                  nullif(size(shs).cast("long"), lit(0L)))), 1)), 1)
        Tables.documents(s, d)
          .select(col("source"), perDoc.as("uniq_x1e6"))
          .groupBy("source")
          .agg(count(col("uniq_x1e6")).as("n_docs"),
            expr("sum(uniq_x1e6) div count(uniq_x1e6)").as("mean_uniq_x1e6"),
            min("uniq_x1e6").as("min_uniq_x1e6"),
            max("uniq_x1e6").as("max_uniq_x1e6"))
          .filter(col("n_docs") > 0)
          .orderBy("source")
      },
      Some(TextSql.compressibilityProxy)),

    // Exact token-budget sharding: assign docs (in a seeded-hash global
    // order) to 8 shards of ~equal TOKEN mass — the file-level shard
    // manifest distributed training reads. Unlike pack_sequences'
    // shard-LOCAL cumsum, the assignment needs a globally exact running
    // total, built scale-correctly in two phases: a per-bucket cumsum
    // (bucket = top 10 bits of the 60-bit order key, so bucket order IS
    // key order) plus a 1024-row bucket-prefix frame that broadcasts
    // back — no corpus-sized window partition anywhere; the only
    // single-partition window runs over 1024 bucket totals. The oracle
    // computes the same assignment with one flat window, gating the
    // distributed prefix-sum decomposition bit-exactly.
    "pipeline_shard_budget" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nShards = 8L
        val t = Tables.documents(s, d).select(
            col("doc_id"),
            graft.ops.TextOps.tokenCount(col("text")).cast("long").as("tok"),
            graft.functions.GraftFunctions.md5Hash60(
              concat(lit("shard1:"), col("doc_id").cast("string"))).as("key"))
          .withColumn("bucket", expr(s"key div ${1L << 50}"))
        val wb = Window.partitionBy("bucket").orderBy("key", "doc_id")
        val within = t.withColumn("cum_in", sum("tok").over(wb) - col("tok"))
        val btot = t.groupBy("bucket").agg(sum("tok").as("btok"))
        val wp = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val boff = btot
          .withColumn("off", coalesce(sum("btok").over(wp), lit(0L)))
          .withColumn("total", sum("btok").over(
            Window.partitionBy().rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
          .select("bucket", "off", "total")
        within.join(broadcast(boff), "bucket")
          .withColumn("shard",
            expr(s"(off + cum_in) div ((total + ${nShards - 1}) div $nShards)"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
          .orderBy("shard")
      },
      Some(
        s"""WITH t AS (SELECT doc_id,
           |        CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
           |        ${GraphSql.md5Hash60("'shard1:' || CAST(doc_id AS VARCHAR)")} AS key
           |      FROM documents),
           |c AS (SELECT tok,
           |        sum(tok) OVER (ORDER BY key, doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cb,
           |        sum(tok) OVER () AS total
           |      FROM t)
           |SELECT CAST(COALESCE(cb, 0) // ((total + 7) // 8) AS BIGINT) AS shard,
           |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
           |FROM c GROUP BY shard ORDER BY shard""".stripMargin)),

    // Curation observability: survivor counts at each pipeline stage
    // (all → langid → quality gate → exact dedup). Stages 0-2 come from
    // ONE aggregate over the scoring pass (stack() pivots the row to
    // stage rows); only the dedup stage needs its fingerprint window.
    // Two jobs total at any corpus size.
    "pipeline_filter_funnel" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps.stats(Tables.documents(s, d))
        val flat = t.agg(
            count(lit(1)).as("n_all"),
            sum((col("lang_pred") === "en").cast("long")).as("n_lang"),
            sum((col("lang_pred") === "en" && col("quality") >= 7000)
              .cast("long")).as("n_q"))
          .selectExpr(
            "stack(3, '0_all', n_all, '1_lang_en', n_lang, '2_quality', n_q) AS (stage, n_docs)")
        val kept = t.filter(col("lang_pred") === "en" && col("quality") >= 7000)
          .withColumn("rn",
            row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("rn") === 1)
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("stage", lit("3_dedup"))
          .select("stage", "n_docs")
        flat.unionByName(kept).orderBy("stage")
      },
      Some(TextSql.curationFunnel(minQuality = 7000))),

    // Mixture-shaping quota: per predicted language keep the top-5 docs
    // by quality (tie → smallest doc_id) — the selection step after
    // scoring. One narrow scoring pass, one shuffle on lang_pred; with
    // small quotas over many groups the bounded TopKAggregator form
    // (window_topk_per_customer_agg) substitutes unchanged — ≤k rows
    // per group through the shuffle instead of a full sort window.
    "pipeline_quota_sample" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang_pred").orderBy(desc("quality"), asc("doc_id"))
        graft.ops.TextOps.stats(Tables.documents(s, d))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("lang_pred", "doc_id", "quality")
          .orderBy("lang_pred", "doc_id")
      },
      Some(TextSql.quotaSample(perLang = 5))),

    // Weight-proportional sampling without replacement — priority
    // sampling (Duffield–Lund–Thorup, JACM'07): each doc draws a
    // deterministic uniform u from the portable 60-bit md5 family and
    // gets priority u/weight; the k smallest priorities are the sample,
    // so a doc's inclusion odds scale with its weight (here n_chars —
    // sample "by token mass", the mixture a training run actually
    // consumes, not "by doc count"). All integer: pri =
    // (h+1) div w on BIGINTs — both engines floor the same quotient, and
    // (pri, doc_id) ordering resolves floor collisions deterministically,
    // so the gate is exact with no float u anywhere. Stateless like the
    // other samplers (membership is a pure function of doc_id — same
    // sample on any executor layout, reseedable via the salt), and the
    // top-k is a TakeOrdered: no corpus-wide sort, no corpus-sized
    // window — the rank window runs over the 50 selected rows only.
    "pipeline_weighted_sample" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pri = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").as("w"),
            graft.functions.GraftFunctions.md5Hash60(
              concat(lit("wsamp:"), col("doc_id").cast("string"))).as("h"))
          .withColumn("pri", expr("(h + 1) div w"))
        pri.orderBy(asc("pri"), asc("doc_id")).limit(50)
          .withColumn("rnk", row_number().over(
            Window.orderBy(asc("pri"), asc("doc_id"))).cast("long"))
          .select("rnk", "doc_id", "source", "w", "pri")
          .orderBy("rnk")
      },
      Some(
        s"""WITH p AS (SELECT doc_id, source, n_chars AS w,
           |    (${GraphSql.md5Hash60("'wsamp:' || CAST(doc_id AS VARCHAR)")} + 1)
           |      // n_chars AS pri
           |  FROM documents),
           |r AS (SELECT doc_id, source, w, pri,
           |        row_number() OVER (ORDER BY pri, doc_id) AS rnk
           |      FROM p)
           |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, source, w, pri
           |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin)),

    // ===== Extension: LLM-pipeline — deduplication =====
    "dedup_exact" -> Q(
      (s, d) => graft.ops.Dedup.exactGroups(plantedDocs(s, d, exact = true))
        .orderBy("fp"),
      Some(TextSql.dedupExact)),

    // Threshold-tuning readout: the Jaccard distribution of the banded
    // candidates (bucket = floor(j·10)) — pick the dedup threshold by
    // looking at where the mass sits instead of guessing. Same plan as
    // dedup_ngram_jaccard minus the threshold filter; the histogram
    // adds one tiny aggregate over the verified pairs. Runs at
    // Dedup.containmentSchedule(n)'s band cap (the corpus-scheduled
    // knob — this family was the last with a fixed skew cap, 12.7 s at
    // 10× the round-9 family max); the oracle replays the same integer
    // schedule off the same count.
    "dedup_jaccard_histogram" -> Q(
      (s, d) => graft.ops.Dedup.ngramJaccardPairsAuto(
          plantedDocs(s, d, exact = false), threshold = 0.0)
        .withColumn("j_bucket",
          least(lit(9L), floor(col("jaccard") * 10).cast("long")).as("j_bucket"))
        .groupBy("j_bucket").agg(count(lit(1)).as("n_pairs"))
        .orderBy("j_bucket"),
      Some(TextSql.dedupJaccardHistogramAuto)),

    // In-engine prefilter evaluation: recall and precision of the capped
    // banded-MinHash candidate set against the TRUE jaccard>=0.5 pairs,
    // over a deterministic 20% audit sample (hash membership on the
    // BASE doc id, so a plant follows its parent into the sample and
    // planted pairs stay evaluable). The truth side needs no all-pairs
    // scan — a pair at jaccard>=0.5 must share a shingle, so the
    // exhaustive truth comes from the UNCAPPED shingle inverted-index
    // join; sampling is what bounds it (every shingle df drops by the
    // sample rate, so the Σdf² join volume drops by its square — the
    // unsampled form measured 268 s at 10× sf0.1, the audit-sample form
    // stays proportional to the sample).
    "dedup_band_eval" -> Q(
      (s, d) => {
        val docs = plantedDocs(s, d, exact = false)
          .filter(pmod(graft.functions.GraftFunctions.md5Hash60(
            col("doc_id") % 100000), lit(5L)) === 0)
        val sh = graft.ops.Dedup.shingleRows(docs, 3).select("doc_id", "sh")
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val inter = sh.select(col("doc_id").as("a"), col("sh"))
          .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
          .filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("i"))
        val truth = inter
          .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
          .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
          .withColumn("jaccard", round(col("i").cast("double") /
            (col("sza") + col("szb") - col("i")).cast("double"), 6))
          .filter(col("jaccard") >= 0.5)
          .select(col("a"), col("b"), lit(1L).as("is_t"))
        val cand = graft.ops.Dedup.minhashPairs(docs, k = 8, bands = 4)
          .select(col("a"), col("b"), lit(1L).as("is_c"))
        truth.join(cand, Seq("a", "b"), "full_outer")
          .select(coalesce(col("is_t"), lit(0L)).as("is_t"),
            coalesce(col("is_c"), lit(0L)).as("is_c"))
          .agg(sum("is_t").as("n_true"), sum("is_c").as("n_cand"),
            sum(col("is_t") * col("is_c")).as("n_hit"))
          .withColumn("recall_x1e4",
            floor(col("n_hit") * 10000 / col("n_true")).cast("long"))
          .withColumn("precision_x1e4",
            floor(col("n_hit") * 10000 / col("n_cand")).cast("long"))
      },
      Some(TextSql.dedupBandEval)),

    // Curation observability: per-source duplicate rate (a doc is a
    // duplicate iff its fingerprint group has >1 member and it is not
    // the min-id canonical). One shuffle on the 128-bit fingerprint for
    // the group window, then a map-side-combining aggregate on the tiny
    // source key space; rate in exact fixed-point.
    "dedup_rate_by_source" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("fp")
        plantedDocs(s, d, exact = true)
          .select(col("doc_id"), col("source"),
            graft.ops.TextOps.fingerprint(col("text")).as("fp"))
          .withColumn("grp_n", count(lit(1)).over(w))
          .withColumn("grp_min", min("doc_id").over(w))
          .withColumn("is_dup",
            (col("grp_n") > 1 && col("doc_id") =!= col("grp_min")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("is_dup").as("n_dups"),
            floor(sum("is_dup") * lit(1000000L) / count(lit(1))).cast("long")
              .as("dup_rate_x1e6"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT doc_id, text, source FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text, source FROM documents WHERE doc_id < 50),
          |f AS (SELECT doc_id, source,
          |        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          |      FROM docs),
          |g AS (SELECT doc_id, source,
          |        count(*) OVER (PARTITION BY fp) AS grp_n,
          |        min(doc_id) OVER (PARTITION BY fp) AS grp_min
          |      FROM f)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN grp_n > 1 AND doc_id <> grp_min THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
          |  CAST(floor(sum(CASE WHEN grp_n > 1 AND doc_id <> grp_min THEN 1 ELSE 0 END) * 1000000
          |    / count(*)) AS BIGINT) AS dup_rate_x1e6
          |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    "dedup_minhash" -> Q(
      (s, d) => graft.ops.Dedup.minhashPairs(plantedDocs(s, d, exact = false), k = 8, bands = 4)
        .orderBy("a", "b"),
      Some(TextSql.dedupMinhash)),

    "dedup_minhash_fast" -> Q(
      (s, d) => graft.ops.Dedup.minhashPairsFast(plantedDocs(s, d, exact = false))
        .orderBy("a", "b"),
      None),

    "dedup_simhash" -> Q(
      (s, d) => graft.ops.Dedup.simhashPairs(plantedDocs(s, d, exact = false),
          maxHamming = 3, portable = true)
        .orderBy("a", "b"),
      Some(TextSql.dedupSimhash)),

    // murmur3-64 token hashes — the no-hex-materialization fast path
    // (rows-only for the same reason as dedup_minhash_fast).
    "dedup_simhash_fast" -> Q(
      (s, d) => graft.ops.Dedup.simhashPairs(plantedDocs(s, d, exact = false),
          maxHamming = 3, portable = false)
        .orderBy("a", "b"),
      None),

    // Exact-verified Jaccard over the banded candidates, at the same
    // corpus-scheduled band cap as dedup_jaccard_histogram (the oracle
    // replays the schedule, so this is hash-gated at exactly the knobs
    // a 100 TB run would use — the dedup_containment discipline).
    "dedup_ngram_jaccard" -> Q(
      (s, d) => graft.ops.Dedup.ngramJaccardPairsAuto(
          plantedDocs(s, d, exact = false), n = 3, threshold = 0.5)
        .orderBy("a", "b"),
      Some(TextSql.dedupNgramJaccardAuto)),

    // Asymmetric-overlap containment: catches a short quote fully
    // embedded in a long doc, which Jaccard-estimating detectors miss
    // (the planted quotes sit at Jaccard ≈ 0.01, containment 1.0).
    // Runs at Dedup.containmentSchedule(n)'s stop-shingle cap — the
    // corpus-scheduled knob that holds the inverted-index join's
    // candidate bound as n grows (the fixed cap 128 was measured
    // superlinear at 10×, SCALE.md r8/r9); the oracle replays the same
    // integer schedule off the same count, so this is hash-gated at
    // exactly the knobs a 100 TB run would use.
    "dedup_containment" -> Q(
      (s, d) => graft.ops.Dedup.containmentPairsAuto(plantedQuoteDocs(s, d))
        .orderBy("a", "b"),
      Some(TextSql.dedupContainmentAuto())),

    // Multi-detector dedup funnel: exact fingerprint keep-min →
    // MinHash near-dup keep-min over the exact survivors → winnowing
    // partial-overlap keep-min over those — each detector sees only
    // what the previous kept (the order a curation pipeline actually
    // runs: cheapest-and-strictest first), with per-stage doc AND token
    // accounting. Detector internals are the SAME operators as their
    // standalone gates (exactGroups' fingerprint, minhashPairs,
    // winnowPairs) and the oracle composes the same CTE fragments, so
    // the funnel and the detectors cannot drift. Pairwise keep-min
    // (drop the larger id of every pair) is deliberate here — the
    // cluster-resolution variant is `dedup_clusters`/
    // `pipeline_cluster_keep`'s territory.
    "pipeline_dedup_funnel" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps
        val t0 = Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"),
          t.fingerprint(col("text")).as("fp"),
          t.tokenCount(col("text")).cast("long").as("nt"))
        val surv1 = t0
          .withColumn("rn", row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("rn") === 1)
          .select("doc_id", "text", "source", "nt")
        // knobs passed EXPLICITLY from the shared constants the oracle's
        // CTE fragments are generated from — a default drifting on either
        // side cannot silently de-sync the hash gate
        val drop2 = graft.ops.Dedup.minhashPairs(surv1,
            k = graft.ops.Dedup.OracleMinhashK,
            bands = graft.ops.Dedup.OracleMinhashBands)
          .select(col("b").as("doc_id")).distinct()
        val surv2 = surv1.join(drop2, Seq("doc_id"), "left_anti")
        val drop3 = graft.ops.Dedup.winnowPairs(surv2,
            w = graft.ops.Dedup.WinnowW,
            minShared = graft.ops.Dedup.WinnowMinShared)
          .select(col("b").as("doc_id")).distinct()
        val surv3 = surv2.join(drop3, Seq("doc_id"), "left_anti")
        def stageRow(name: String, df: DataFrame): DataFrame = df
          .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
        stageRow("0_all", t0)
          .unionByName(stageRow("1_exact", surv1))
          .unionByName(stageRow("2_minhash", surv2))
          .unionByName(stageRow("3_winnow", surv3))
          .orderBy("stage")
      },
      Some(TextSql.dedupFunnel(
        w = graft.ops.Dedup.WinnowW,
        minShared = graft.ops.Dedup.WinnowMinShared))),

    // Winnowing partial-overlap dedup (MOSS fingerprinting, Schleimer
    // et al. SIGMOD'03): window-min-sampled 3-gram hashes, so any
    // shared token run ≥ n+w-1 = 6 fires regardless of position —
    // the detector for a shared paragraph between otherwise-different
    // docs, which whole-doc MinHash (global Jaccard) cannot propose and
    // capped containment may drop. Fixture: docs doc_id < 10 get a
    // planted sibling 300000+id spliced from first-30-tokens(id) ⧺
    // first-30-tokens(id+10) — each planted doc must pair with BOTH
    // parents on local overlap alone. Cost model is containment's:
    // df-capped inverted-index join, O(Σ df²) ≤ cap · |fp rows|, with
    // the fingerprint frame ~2/(w+1) the size of the shingle frame the
    // Jaccard family already explodes.
    "dedup_winnow" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select("doc_id", "text")
        val pref = base.filter(col("doc_id") < 20)
          .select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 30)).as("p30"))
        val planted = pref.filter(col("doc_id") < 10)
          .select(col("doc_id").as("ida"), col("p30").as("pa"))
          .join(pref.select((col("doc_id") - 10).as("ida"), col("p30").as("pb")), "ida")
          .select((col("ida") + 300000L).as("doc_id"),
            concat_ws(" ", col("pa"), col("pb")).as("text"))
        graft.ops.Dedup.winnowPairs(base.unionByName(planted))
          .orderBy("a", "b")
      },
      Some(TextSql.dedupWinnow())),

    // Exact duplicated-substring census (Lee et al. 2021,
    // arXiv:2107.06499 — the ExactSubstr family, as distributed
    // shingle-diagonal merging, Dedup.exactSubstringRuns): maximal
    // verbatim token runs >= 15 between doc pairs, rolled up to
    // span-level duplication mass per source. The one canonical
    // LLM-dedup operator the near-dup family cannot substitute for:
    // the planted split-copy sibling (400000+id = first-40(id) ⧺
    // first-40(id+12), source 'planted') sits at ~0.5 whole-doc
    // Jaccard to each parent — under MinHash banding recall — yet
    // carries two ~40-token verbatim runs this operator reports
    // (DedupSpec pins both runs per plant). Cost model is
    // containment's capped inverted index at the SAME corpus-scheduled
    // stop-shingle cap, replayed by the oracle; the diagonal
    // gap-islands window is per match-group (cap-bounded), never
    // corpus-sized.
    "dedup_exact_substring" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select("doc_id", "source", "text")
        val pref = base.filter(col("doc_id") < 24)
          .select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 40)).as("p40"))
        val planted = pref.filter(col("doc_id") < 12)
          .select(col("doc_id").as("ida"), col("p40").as("pa"))
          .join(pref.select((col("doc_id") - 12).as("ida"), col("p40").as("pb")), "ida")
          .select((col("ida") + 400000L).as("doc_id"),
            lit("planted").as("source"),
            concat_ws(" ", col("pa"), col("pb")).as("text"))
        val all = base.unionByName(planted)
        val runs = graft.ops.Dedup.exactSubstringRunsAuto(all, n = 5, minRunTokens = 15)
        val perDoc = runs.select(col("a").as("doc_id"), col("run_tokens"))
          .unionByName(runs.select(col("b").as("doc_id"), col("run_tokens")))
        perDoc.join(all.select("doc_id", "source"), "doc_id")
          .groupBy("source")
          .agg(countDistinct("doc_id").cast("long").as("n_docs_dup"),
            count(lit(1)).as("n_doc_runs"),
            max("run_tokens").as("max_run_tokens"),
            sum("run_tokens").as("dup_tokens"))
          .orderBy("source")
      },
      Some(TextSql.dedupExactSubstring(n = 5, minRunTokens = 15, plantMax = 12L))),

    // THE declared embedding near-dup runs at Dedup.lshSchedule(n)
    // knobs — the corpus-size-aware bits/tables that keep the bucket
    // self-join bounded as n grows (a fixed bits=6 was measured
    // quadratic-in-n at 10×: 39.6 s of pure candidate volume). The
    // oracle replays the SAME schedule in integer SQL, so this is
    // hash-gated at exactly the knobs a 100 TB run would use; the
    // formerly rows-only `dedup_embedding_auto` twin is subsumed.
    "dedup_embedding" -> Q(
      (s, d) => graft.ops.Dedup.embeddingNearDupsAuto(Tables.embeddings(s, d), threshold = 0.45)
        .orderBy("a", "b"),
      Some(TextSql.dedupEmbeddingAuto)),

    // PQ-code-collision near-dup pairs (the FAISS-style blocking):
    // candidates are vectors whose ENTIRE 4-code PQ word matches — an
    // equality join on the code vector — then exact-cosine verified.
    // Codebooks come from the SAME pqTrain as emb_pq_error (bit
    // identical, the two queries gate each other); data-adaptive cells
    // complement the data-oblivious sign-LSH candidate path, and the
    // hot-cell cap bounds Σdf² exactly like the containment guard.
    // Fixture: vec_id < 10 get a planted 0.99-scaled sibling 900000+id
    // (cos = 1, same direction — must land in the same cells and
    // verify); scaling happens in DOUBLE on both engines so the
    // fixed-point quantization replays bit-for-bit.
    "dedup_pq_codes" -> Q(
      (s, d) => {
        val base = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val planted = base.filter(col("vec_id") < 10)
          .select((col("vec_id") + 900000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(0.99)).as("embedding"))
        graft.ops.Similarity.pqCodeDups(base.unionByName(planted),
          m = 4, ksub = 8, iters = 2, threshold = 0.45)
          .orderBy("a", "b")
      },
      Some(TextSql.dedupPqCodes(m = 4, ksub = 8, iters = 2, threshold = 0.45))),

    // Cosine histogram over the schedule-knob LSH candidate pairs — the
    // threshold-tuning readout for embedding near-dup (what
    // dedup_jaccard_histogram is to MinHash): every distinct candidate
    // pair scored once, bucketed by floor(cos·10). Same candidate chain
    // and shuffle-hash/ReusedExchange plan as dedup_embedding, but on a
    // deterministic 50% vec-id hash sample (band_eval's audit-sample
    // discipline): scoring EVERY candidate — no threshold prune before
    // the distinct — is quadratic in bucket occupancy, and the sample
    // bounds it to a quarter while keeping the distribution shape. The
    // knob schedule self-adjusts to the sampled count.
    "dedup_embedding_histogram" -> Q(
      (s, d) => graft.ops.Dedup
        .embeddingNearDupsAuto(
          Tables.embeddings(s, d).filter(
            pmod(graft.functions.GraftFunctions.md5Hash60(col("vec_id")), lit(2L)) === 0),
          threshold = -1.0)
        .groupBy(least(lit(9L), floor(col("cos") * 10).cast("long")).as("cos_bucket"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("cos_bucket"),
      Some(TextSql.dedupEmbeddingHistogram)),

    // Semantic dedup (SemDeDup, Abbas et al. 2303.09540): k-means the
    // embedding space, search near-dup pairs only WITHIN a cluster —
    // clustering bounds the pair volume (the paper's whole point), and
    // the cluster id is the join key. nlist runs the semDedupSchedule
    // (cluster size held ~constant → pair volume LINEAR in n, not
    // n²/const), and the oracle replays the schedule from count(*) in
    // integer SQL — the hash gate follows the knob to any corpus size,
    // the dedup_embedding discipline. Training is the shared fixed-point
    // Lloyd trainer (one oracle CTE chain with sim_ann_ivf_exact); keep
    // rule is greedy min-id. Output: per-cluster (n_vecs, n_dropped,
    // n_kept) — the semantic dedup-rate map. Complements dedup_embedding:
    // LSH finds near-exact copies anywhere; SemDeDup finds redundancy
    // within semantic regions.
    "dedup_semantic" -> Q(
      (s, d) => graft.ops.Similarity.semanticDedupAuto(
          Tables.embeddings(s, d), threshold = 0.45)
        .orderBy("cid"),
      Some(TextSql.dedupSemantic())),

    // Cross-source duplication matrix: which source pairs share
    // near-dup content — the contamination map a curation team reads
    // before deciding which source to drop duplicates FROM (e.g. a web
    // crawl quietly re-hosting a wiki dump). Candidate pairs are the
    // SAME capped banded-MinHash chain as dedup_minhash; the source
    // join is keyed on doc_id and the matrix itself is |sources|² rows
    // at any corpus size, so the only added cost is two keyed lookups.
    "dedup_source_matrix" -> Q(
      (s, d) => {
        val docs = plantedDocs(s, d, exact = false)
        val src = docs.select(col("doc_id"), col("source"))
        graft.ops.Dedup.minhashPairs(docs, k = 8, bands = 4)
          .join(src.select(col("doc_id").as("a"), col("source").as("sa")), "a")
          .join(src.select(col("doc_id").as("b"), col("source").as("sb")), "b")
          .groupBy(least(col("sa"), col("sb")).as("src_a"),
            greatest(col("sa"), col("sb")).as("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_a", "src_b")
      },
      Some(TextSql.dedupSourceMatrix)),

    // Incremental ingest dedup: a new batch (the near-dup plants plus a
    // deterministic 5% "re-crawl" slice of exact copies) checked against
    // the existing corpus with NO corpus self-join — corpus band keys
    // are probed by the BROADCAST batch band frame, so the join is
    // map-side over the corpus (PlanSpec pins the broadcast). This is
    // the daily-crawl shape at 100 TB: the corpus side of the work is
    // the stored band index, the batch side is the day's delta.
    "dedup_incremental" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val near = base.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 100000)
          .withColumn("text", concat(col("text"), lit(" planted dup tail")))
        val recrawl = base
          .filter(pmod(graft.functions.GraftFunctions.md5Hash60(col("doc_id")),
            lit(20L)) === 1)
          .withColumn("doc_id", col("doc_id") + 200000)
        graft.ops.Dedup.crossCorpusMatches(base, near.unionByName(recrawl))
          .orderBy("batch_id")
      },
      Some(TextSql.dedupIncremental)),

    // Duplicated n-gram fraction per source — the dedup-health metric
    // of Lee et al. ("Deduplicating Training Data Makes Language Models
    // Better"): pooled share of distinct-per-doc shingles with document
    // frequency > 1. One df window on the shingle key (the same shuffle
    // class as containment's stop-shingle guard) plus a per-source
    // map-side-combining aggregate; reading it per source tells a
    // curation team WHERE the duplication lives before they pay for
    // pair-level dedup.
    "text_dup_ngram_fraction" -> Q(
      (s, d) => {
        val sh = graft.ops.Dedup.shingleRows(plantedDocs(s, d, exact = false), 3)
        sh.withColumn("dfreq", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("sh")))
          .groupBy("source")
          .agg(countDistinct("doc_id").as("n_docs"),
            sum(when(col("dfreq") > 1, 1L).otherwise(0L)).as("dup_shingles"),
            count(lit(1)).as("total_shingles"),
            expr("sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) * 1000000 div count(*)")
              .as("dup_frac_x1e6"))
          .orderBy("source")
      },
      Some(TextSql.dupNgramFraction)),

    // Cluster resolution over the near-dup pair graph: GraphX connected
    // components label every member with its cluster's min doc id — the
    // keep-one-per-cluster step pairwise dedup can't express (A~B, B~C
    // must delete both B and C, not just one of each pair). Oracle is
    // unrolled min-label propagation over the same capped MinHash
    // candidate pairs.
    "dedup_clusters" -> Q(
      (s, d) => graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.minhashPairs(plantedDocs(s, d, exact = false), k = 8, bands = 4))
        .orderBy("canonical_id", "doc_id"),
      Some(TextSql.dedupClusters())),

    // End-to-end near-dedup keep: resolve MinHash pairs into clusters,
    // drop every non-canonical member, report per-language survivor
    // counts — the full "dedup then rebalance" accounting a curation run
    // emits. The drop list is cluster-resolved (pairwise keep-min would
    // under-delete chains), and the anti-join is keyed on doc_id.
    "pipeline_cluster_keep" -> Q(
      (s, d) => {
        val docs = plantedDocs(s, d, exact = false)
        val clusters = graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.minhashPairs(docs, k = 8, bands = 4))
        val drops = clusters.filter(col("canonical_id") =!= col("doc_id"))
          .select("doc_id")
        docs.join(drops, Seq("doc_id"), "left_anti")
          .groupBy("lang").agg(count(lit(1)).as("n_kept"))
          .orderBy("lang")
      },
      Some(TextSql.pipelineClusterKeep())),

    // ===== Extension: LLM-pipeline — similarity search =====
    "sim_cosine_topk" -> Q(
      (s, d) => graft.ops.Similarity.bruteForceTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simCosineTopk)),

    "text_token_estimate" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextOps.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_words"))
        .withColumn("pieces_per_word_pct",
          floor(col("n_bpe") * 100.0 / greatest(col("n_words"), lit(1L))).cast("long"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id, n_bpe, n_words,
          |  CAST(floor(n_bpe * 100.0 / greatest(n_words, 1)) AS BIGINT) AS pieces_per_word_pct
          |FROM (SELECT doc_id,
          |        CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
          |        CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    "text_rolling_fingerprint" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextOps.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  list_reduce(
          |    list_prepend(CAST(0 AS BIGINT),
          |      list_transform(
          |        string_split(regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^\x00-\x7f]', '?', 'g'), ''),
          |        c -> CAST(unicode(c) AS BIGINT))),
          |    (a, b) -> (a * 31 + b) % 1099511627776) AS rh
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // BM25 keyword retrieval over the documents corpus — tf shuffle is
    // filtered to the query terms BEFORE aggregation, df and corpus
    // stats broadcast, per-term scores summed in fixed term order (see
    // TextOps.bm25TopK for the scale/determinism notes).
    "text_bm25_topk" -> Q(
      (s, d) => graft.ops.TextOps.bm25TopK(
          Tables.documents(s, d), terms = Seq("spark", "join", "vector"), k = 20)
        .orderBy(desc("bm25"), asc("doc_id")),
      Some(TextSql.bm25Topk(Seq("spark", "join", "vector"), k = 20))),

    // Top-3 TF-IDF terms per doc (df over the FULL corpus, ranked within
    // a target doc slice).
    "text_tfidf_topterms" -> Q(
      (s, d) => graft.ops.TextOps.tfidfTopTerms(
          Tables.documents(s, d), maxDocId = 30L, perDoc = 3)
        .orderBy("doc_id", "rnk"),
      Some(TextSql.tfidfTopTerms(maxDocId = 30, perDoc = 3))),

    // Intra-document repetition: duplicate 3-gram ratio in basis points
    // — the "looping/boilerplate text" quality signal (high ratio =
    // degenerate text). One codegen'd projection per doc, no shuffle
    // before the presentation sort.
    "text_repetition" -> Q(
      (s, d) => {
        val t = graft.ops.TextOps
        val grams = Tables.documents(s, d).select(col("doc_id"),
          t.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            when(size(col("toks")) >= 3,
              transform(sequence(lit(0), size(col("toks")) - 3),
                i => concat_ws(" ", col("toks")(i), col("toks")(i + 1), col("toks")(i + 2))))
              .otherwise(array()).as("g"))
        grams.select(col("doc_id"),
            size(col("g")).cast("long").as("n_grams"),
            size(array_distinct(col("g"))).cast("long").as("n_distinct"))
          .withColumn("dup_pct_bp",
            floor((col("n_grams") - col("n_distinct")) * lit(10000.0) /
              greatest(col("n_grams"), lit(1L))).cast("long"))
          .orderBy("doc_id")
      },
      Some(TextSql.repetition)),

    // PII audit + redaction: detect emails / IPs / phone numbers and
    // fingerprint the redacted text. The synthetic corpus carries no
    // PII, so docs with doc_id < 25 get a deterministic PII tail
    // planted (same construction in the oracle) — the detector must
    // count exactly those and the clean docs must pass through with
    // fingerprints unchanged by redaction. Pure codegen'd regex
    // projection: one scan, no shuffle before the presentation sort.
    "text_pii_scrub" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select("doc_id", "text")
        val planted = base.filter(col("doc_id") < 25).select(
          (col("doc_id") + 200000).as("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com or +1 555-123-4567 host 10.0."),
            col("doc_id") % 256, lit(".1")).as("text"))
        graft.ops.TextOps.piiScrub(base.unionByName(planted))
          .orderBy("doc_id")
      },
      Some(TextSql.piiScrub(plantMax = 25))),

    // Source-mixture weights: per-language keep probability that
    // equalizes the mixture to the rarest language (the "how much do I
    // downsample each stratum" companion to sample_stratified). Pure
    // arithmetic on a 5-row aggregate — the global window runs on the
    // aggregated frame, never the corpus.
    "pipeline_mix_weights" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .groupBy("lang").agg(count(lit(1)).as("n"))
          .withColumn("keep_pct",
            floor(min("n").over(Window.partitionBy()) * lit(10000.0) / col("n"))
              .cast("long"))
          .orderBy("lang")
      },
      Some(TextSql.mixWeights)),

    // Temperature-scaled source mixing (τ = 0.5, the multilingual-LM
    // rebalancing standard): sampling weight w_i ∝ n_tokens_i^τ —
    // up-weights small sources relative to proportional sampling
    // without flattening to uniform. τ = 0.5 makes the power a sqrt,
    // which IEEE requires correctly rounded, so both engines compute
    // bit-identical s_i; each s_i is floored to fixed-point BEFORE
    // totalling so the denominator is an order-free integer sum (a
    // double Σ√n would depend on aggregation order), and the final
    // ratio is exact DECIMAL(38,0) integral division (Long would
    // overflow at ~10¹³ source tokens). One scan + a |sources|-row
    // aggregate.
    // Epoch repeat-upsampling plan ("repeat good data" multi-epoch
    // scheduling): each source earns a repeat factor from its mean
    // quality (≥8000→4, ≥7000→3, ≥6000→2, else 1 — high-quality
    // sources are seen in more epochs), and the output is the
    // per-epoch (sources, tokens, cumulative tokens) training plan.
    // One corpus scan aggregates to a |sources|-row frame; the epoch
    // explosion and the running total run on that tiny frame only.
    "pipeline_epoch_plan" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps
        val src = Tables.documents(s, d)
          .select(col("source"),
            t.tokenCount(col("text")).cast("long").as("tok"),
            t.qualityScore(col("text")).as("qual"))
          .groupBy("source")
          .agg(sum("tok").as("n_tokens"),
            expr("sum(qual) div count(*)").as("mq"))
          .withColumn("rep",
            when(col("mq") >= 8000, 4L).when(col("mq") >= 7000, 3L)
              .when(col("mq") >= 6000, 2L).otherwise(1L))
        src.select(col("n_tokens"),
            explode(sequence(lit(1L), col("rep"))).as("epoch"))
          .groupBy("epoch")
          .agg(count(lit(1)).as("n_sources"), sum("n_tokens").as("epoch_tokens"))
          .withColumn("cum_tokens", sum("epoch_tokens").over(Window.orderBy("epoch")))
          .orderBy("epoch")
      },
      Some(TextSql.epochPlan)),

    "pipeline_temperature_mix" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .groupBy("source")
          .agg(sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
          .withColumn("s_i",
            floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
          .withColumn("total", sum("s_i").over(Window.partitionBy()))
          .withColumn("w_x1e6", expr(
            "CAST((CAST(s_i AS DECIMAL(38,0)) * 1000000) div CAST(total AS DECIMAL(38,0)) AS BIGINT)"))
          .select("source", "n_tokens", "w_x1e6")
          .orderBy("source")
      },
      Some(TextSql.temperatureMix)),

    // Deterministic stratified train/val/test split (90/5/5 by a seeded
    // 60-bit md5 of doc_id) with per-source doc AND token accounting —
    // the split manifest a training run records. Membership is a pure
    // per-row hash (layout-invariant, reseedable via the salt, same
    // discipline as the sampling family); one aggregate, no shuffle
    // beyond the groupBy. The token sums audit that stratification
    // holds by mass, not just by count.
    "pipeline_split_assign" -> Q(
      (s, d) => Tables.documents(s, d)
        .withColumn("h", pmod(graft.functions.GraftFunctions.md5Hash60(
          concat(lit("split1:"), col("doc_id").cast("string"))), lit(100L)))
        .withColumn("split",
          when(col("h") < 90, "train").when(col("h") < 95, "val")
            .otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
        .orderBy("source", "split"),
      Some(
        s"""SELECT source, split, count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
           |FROM (SELECT source,
           |        CASE WHEN h < 90 THEN 'train'
           |             WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
           |        n_tok
           |      FROM (SELECT source,
           |              ${GraphSql.md5Hash60("'split1:' || CAST(doc_id AS VARCHAR)")} % 100 AS h,
           |              CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
           |            FROM documents))
           |GROUP BY source, split ORDER BY source, split""".stripMargin)),

    // Curriculum schedule: per-source quality quartiles → 4 training
    // stages (easy→hard ordering is the curriculum-learning standard;
    // per-SOURCE boundaries because quality distributions differ by
    // source, and because that keeps the rank-selection windows
    // partitioned). Boundaries are EXACT integer rank selection at
    // ceil(n·k/4) — the winsorize discipline: an actual data value via
    // integer arithmetic, never an interpolated percentile (which the
    // two engines round differently). Output is the per-(source, stage)
    // doc/token manifest a staged training run consumes. At 100 TB the
    // per-source sort window is the cost; the winsorize_fast KLL-sketch
    // path is the documented swap (same thresholds-within-rank-tolerance
    // contract), with stage ASSIGNMENT unchanged — a broadcast join
    // against a |sources|·3 boundary frame.
    "pipeline_curriculum" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps
        val q = Tables.documents(s, d).select(col("source"), col("doc_id"),
          t.tokenCount(col("text")).cast("long").as("tok"),
          t.qualityScore(col("text")).as("qual"))
        val ranked = q
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy("qual", "doc_id")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
        val thr = ranked.groupBy("source").agg(
          min(when(col("rn") === expr("(n + 3) div 4"), col("qual"))).as("q1"),
          min(when(col("rn") === expr("(n * 2 + 3) div 4"), col("qual"))).as("q2"),
          min(when(col("rn") === expr("(n * 3 + 3) div 4"), col("qual"))).as("q3"))
        q.join(broadcast(thr), "source")
          .withColumn("stage",
            when(col("qual") <= col("q1"), 0L).when(col("qual") <= col("q2"), 1L)
              .when(col("qual") <= col("q3"), 2L).otherwise(3L))
          .groupBy("source", "stage")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
            min("qual").as("min_q"), max("qual").as("max_q"))
          .orderBy("source", "stage")
      },
      Some(TextSql.curriculum())),

    // Decontamination: flag corpus docs sharing any 4-gram shingle with
    // the benchmark set (here: doc_id < 10 stands in for an eval set).
    // The benchmark shingle set is tiny → broadcast; the probe join is
    // keyed on the shingle, so cost is one corpus scan + a map-side
    // hash probe — no shuffle of the corpus at all.
    "pipeline_decontaminate" -> Q(
      (s, d) => {
        val sh = graft.ops.Dedup.shingleRows(Tables.documents(s, d), n = 4)
        val bench = sh.filter(col("doc_id") < 10).select("sh").distinct()
        sh.filter(col("doc_id") >= 10)
          .join(broadcast(bench), "sh")
          .select("doc_id").distinct()
          .orderBy("doc_id")
      },
      Some(TextSql.decontaminate(n = 4, benchMax = 10))),

    // Fuzzy decontamination: the near-dup complement of the exact probe
    // above — MinHash band collisions between corpus and benchmark catch
    // paraphrased/perturbed contamination exact 4-gram overlap misses
    // (the planted 'paraphrased tail' copies of the benchmark docs MUST
    // surface here and do not in the exact probe's planted-free form).
    // The benchmark band frame broadcasts; the per-corpus-doc verdict
    // (n_bench_hits, first_bench) is what a curation run routes on.
    "pipeline_decontaminate_fuzzy" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + 300000)
          .withColumn("text", concat(col("text"), lit(" paraphrased tail")))
        val corpus = base.filter(col("doc_id") >= 10).unionByName(plants)
        val bench = base.filter(col("doc_id") < 10)
        graft.ops.Dedup.contaminatedDocs(corpus, bench)
          .orderBy("corpus_id")
      },
      Some(TextSql.decontaminateFuzzy)),

    // Deterministic sequence packing: assign docs to fixed token-budget
    // training sequences by greedy cumulative fill. The cumsum window
    // partitions by (lang, shard) — shard is a stateless hash of the
    // doc id — so no partition is ever corpus-sized and the pack is
    // reproducible on any executor layout (a single global cumsum would
    // serialize the corpus through one reducer). Docs straddling a
    // boundary belong to the sequence their PREVIOUS cumulative total
    // falls in (start-offset packing).
    "pipeline_pack_sequences" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 4096L
        val docs = Tables.documents(s, d).select(
          col("lang"), col("doc_id"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          pmod(graft.functions.GraftFunctions.md5Hash60(
            concat(lit("pack:"), col("doc_id").cast("string"))), lit(8L)).as("shard"))
        val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        docs.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id",
            floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
          .groupBy("lang", "shard", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
          .orderBy("lang", "shard", "seq_id")
      },
      Some(TextSql.packSequences(budget = 4096, shards = 8))),

    // Packing-efficiency readout: fill-rate histogram of the packed
    // sequences (bucket = floor(seq_tokens·10/budget); bucket 10+ =
    // overfilled packs, whose last doc straddles the budget). Derives
    // from the same shard-local cumsum as pipeline_pack_sequences —
    // the histogram adds one tiny aggregate.
    "pipeline_pack_efficiency" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 4096L
        val docs = Tables.documents(s, d).select(
          col("lang"), col("doc_id"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          pmod(graft.functions.GraftFunctions.md5Hash60(
            concat(lit("pack:"), col("doc_id").cast("string"))), lit(8L)).as("shard"))
        val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        docs.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id",
            floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
          .groupBy("lang", "shard", "seq_id")
          .agg(sum("n_tokens").as("seq_tokens"))
          .withColumn("fill_bucket",
            floor(col("seq_tokens") * 10 / budget).cast("long"))
          .groupBy("fill_bucket")
          .agg(count(lit(1)).as("n_seqs"),
            floor(sum("seq_tokens").cast("double") / count(lit(1))).cast("long")
              .as("mean_tokens"))
          .orderBy("fill_bucket")
      },
      Some(
        s"""WITH d AS (
           |  SELECT lang, doc_id,
           |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           |    ${GraphSql.md5Hash60("'pack:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
           |  FROM documents),
           |c AS (
           |  SELECT lang, shard, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM d),
           |p AS (
           |  SELECT lang, shard,
           |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS seq_id,
           |    CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
           |  FROM c GROUP BY lang, shard, seq_id)
           |SELECT CAST(floor(seq_tokens * 10 / 4096) AS BIGINT) AS fill_bucket,
           |  count(*) AS n_seqs,
           |  CAST(floor(CAST(sum(seq_tokens) AS DOUBLE) / count(*)) AS BIGINT) AS mean_tokens
           |FROM p GROUP BY fill_bucket ORDER BY fill_bucket""".stripMargin)),

    // Token-length histogram per language in power-of-two buckets — the
    // packing/truncation planning input (which budget wastes how much).
    // Bucket boundaries are integer COMPARES (no float log2, whose
    // engine-specific ulp at exact powers of two would flip boundary
    // docs); one map-side-combining aggregate plus a |langs×buckets|
    // window for the share.
    "pipeline_length_histogram" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n"))
        .withColumn("bucket",
          when(col("n") < 16, 0L).when(col("n") < 32, 16L)
            .when(col("n") < 64, 32L).when(col("n") < 128, 64L)
            .when(col("n") < 256, 128L).when(col("n") < 512, 256L)
            .otherwise(512L))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("tokens"))
        .withColumn("share_x1e6",
          expr("n_docs * 1000000 div sum(n_docs) OVER (PARTITION BY lang)"))
        .orderBy("lang", "bucket"),
      Some(
        """WITH d AS (
          |  SELECT lang,
          |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
          |  FROM documents),
          |b AS (
          |  SELECT lang,
          |    CASE WHEN n < 16 THEN 0 WHEN n < 32 THEN 16 WHEN n < 64 THEN 32
          |         WHEN n < 128 THEN 64 WHEN n < 256 THEN 128
          |         WHEN n < 512 THEN 256 ELSE 512 END AS bucket,
          |    n
          |  FROM d),
          |g AS (
          |  SELECT lang, CAST(bucket AS BIGINT) AS bucket,
          |    count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tokens
          |  FROM b GROUP BY 1, 2)
          |SELECT lang, bucket, n_docs, tokens,
          |  CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
          |    AS share_x1e6
          |FROM g ORDER BY lang, bucket""".stripMargin)),

    // Per-language document-length percentiles (exact interpolated
    // percentiles — the corpus-QA readout before choosing truncation /
    // packing lengths). Same cross-engine percentile↔quantile_cont
    // pairing as percentile_order_value.
    "text_length_percentiles" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("lang")
        .agg(
          expr("percentile(n_tokens, 0.25)").as("p25"),
          expr("percentile(n_tokens, 0.5)").as("p50"),
          expr("percentile(n_tokens, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("lang"),
      Some(TextSql.lengthPercentiles)),

    // Corpus vocabulary profile: vocabulary size, hapax count (terms in
    // exactly one doc), hottest document frequency — the one-row corpus
    // health readout. One (doc, term) distinct + one term agg, both
    // partial-agg'd.
    "text_vocab_stats" -> Q(
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("df"))
        tf.agg(
          count(lit(1)).as("vocab"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("hapax"),
          max("df").as("max_df"))
      },
      Some(TextSql.vocabStats)),

    // Stopword-coverage readout: what fraction of all corpus tokens the
    // top-k document-frequency terms account for (the payoff curve of a
    // stopword list). One token scan into a term aggregate; the top-k
    // and the totals both derive from it.
    "text_stopword_coverage" -> Q(
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("tf"))
        val top = tf.orderBy(desc("tf"), asc("w")).limit(15)
          .agg(sum("tf").as("top_tf"), count(lit(1)).as("k"))
        val tot = tf.agg(sum("tf").as("total_tf"))
        top.crossJoin(broadcast(tot))
          .select(col("k"),
            col("top_tf"), col("total_tf"),
            floor(col("top_tf") * lit(1000000L) / col("total_tf")).cast("long")
              .as("coverage_x1e6"))
      },
      Some(
        """WITH tf AS (
          |  SELECT w, count(*) AS tf FROM (
          |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |    FROM documents)
          |  WHERE w <> '' GROUP BY w),
          |top AS (SELECT CAST(sum(tf) AS BIGINT) AS top_tf, count(*) AS k FROM (
          |          SELECT tf FROM tf ORDER BY tf DESC, w LIMIT 15)),
          |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tf FROM tf)
          |SELECT k, top_tf, total_tf,
          |  CAST(floor(top_tf * 1000000 / total_tf) AS BIGINT) AS coverage_x1e6
          |FROM top CROSS JOIN tot""".stripMargin)),

    // Heaps-law vocabulary growth: new terms and cumulative vocabulary
    // per log2 doc-id bucket, via each term's FIRST document — one
    // aggregate on the term key (min doc_id), then a ~log(n)-row
    // histogram + running sum. The naive form (distinct-count per
    // growing prefix) rescans the corpus once per point; the
    // first-occurrence trick gets the whole curve from one scan + one
    // term-keyed shuffle, at any corpus size. Buckets are log-spaced
    // because vocabulary growth concentrates early (the synthetic
    // corpus saturates its fixed token set within the first docs —
    // linear deciles collapse to one row); the bucket index is the
    // BINARY-STRING length of first_doc+1, exact integer semantics in
    // both engines (no float log2 at power-of-two boundaries).
    "text_vocab_growth" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(min("doc_id").as("first_doc"))
          .withColumn("log2_bucket",
            (length(bin(col("first_doc") + 1)) - 1).cast("long"))
          .groupBy("log2_bucket").agg(count(lit(1)).as("new_terms"))
          .withColumn("cum_vocab",
            sum("new_terms").over(Window.orderBy("log2_bucket")
              .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
          .orderBy("log2_bucket")
      },
      Some(
        """WITH fd AS (
          |  SELECT w, min(doc_id) AS first_doc FROM (
          |    SELECT DISTINCT doc_id, w FROM (
          |      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |      FROM documents)
          |    WHERE w <> '') GROUP BY w),
          |h AS (SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS log2_bucket,
          |        count(*) AS new_terms
          |      FROM fd GROUP BY 1)
          |SELECT log2_bucket, new_terms,
          |  CAST(sum(new_terms) OVER (ORDER BY log2_bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
          |FROM h ORDER BY log2_bucket""".stripMargin)),

    // Source-drift observability: each source's most over-represented
    // term vs the corpus (frequency ratio in exact fixed-point integer
    // arithmetic — floor(tf_s·total_c·10⁶ / (total_s·tf_c))). ONE
    // (source, term) shuffle produces the base aggregate; the source
    // totals, corpus dfs and corpus total all derive from it by further
    // (small) aggregation, so the corpus is scanned exactly once. Terms
    // with corpus tf < 5 are dropped (hapax ratios are noise).
    "text_source_divergence" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bySrc = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w").agg(count(lit(1)).as("tf_s"))
        val srcTot = bySrc.groupBy("source").agg(sum("tf_s").as("total_s"))
        val byCorp = bySrc.groupBy("w").agg(sum("tf_s").as("tf_c"))
          .filter(col("tf_c") >= 5)
        val corpTot = srcTot.agg(sum("total_s").as("total_c"))
        bySrc.join(byCorp, "w").join(srcTot, "source")
          .crossJoin(broadcast(corpTot))
          .withColumn("ratio_x1e6",
            floor(col("tf_s") * col("total_c") * lit(1000000L) /
              (col("total_s") * col("tf_c"))).cast("long"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy(desc("ratio_x1e6"), asc("w"))))
          .filter(col("rn") === 1)
          .select(col("source"), col("w").as("top_term"), col("ratio_x1e6"))
          .orderBy("source")
      },
      Some(
        """WITH tok AS (
          |  SELECT source, w FROM (
          |    SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |    FROM documents)
          |  WHERE w <> ''),
          |by_src AS (SELECT source, w, count(*) AS tf_s FROM tok GROUP BY 1, 2),
          |src_tot AS (SELECT source, CAST(sum(tf_s) AS BIGINT) AS total_s
          |            FROM by_src GROUP BY 1),
          |by_corp AS (SELECT w, CAST(sum(tf_s) AS BIGINT) AS tf_c
          |            FROM by_src GROUP BY 1 HAVING sum(tf_s) >= 5),
          |corp_tot AS (SELECT CAST(sum(total_s) AS BIGINT) AS total_c FROM src_tot),
          |scored AS (
          |  SELECT b.source, b.w,
          |    CAST(floor(b.tf_s * t.total_c * 1000000 / (s.total_s * c.tf_c)) AS BIGINT) AS ratio_x1e6
          |  FROM by_src b
          |  JOIN by_corp c ON c.w = b.w
          |  JOIN src_tot s ON s.source = b.source
          |  CROSS JOIN corp_tot t),
          |r AS (SELECT source, w, ratio_x1e6,
          |        row_number() OVER (PARTITION BY source
          |          ORDER BY ratio_x1e6 DESC, w) AS rn
          |      FROM scored)
          |SELECT source, w AS top_term, ratio_x1e6 FROM r WHERE rn = 1
          |ORDER BY source""".stripMargin)),

    // Highest-document-frequency terms (stopword discovery).
    "text_top_df_terms" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), asc("w")).limit(15),
      Some(TextSql.topDfTerms(15))),

    // Training-prep chunking: fixed token windows (size 32, stride 24,
    // i.e. 8-token overlap) per document — the context-window slicing a
    // pretokenization pipeline runs before packing. (Window sized to the
    // 10–100-token synthetic docs so multi-chunk splitting is actually
    // exercised; a production corpus would use 1024/768 — the plan is
    // size-independent.) Only the token COUNT enters the plan (window
    // boundaries are arithmetic over it), so this is a codegen
    // projection + explode: no token arrays materialize, no shuffle
    // before the output sort.
    "text_chunk_windows" -> Q(
      (s, d) => {
        val size = 32L; val stride = 24L
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
          .withColumn("n_chunks",
            when(col("n_tok") <= size, lit(1L))
              .otherwise(lit(1L) +
                ceil((col("n_tok") - size).cast("double") / stride).cast("long")))
          .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
          .select(col("doc_id"), col("chunk_idx"),
            least(lit(size), col("n_tok") - col("chunk_idx") * stride).as("chunk_tokens"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(
        """WITH d AS (SELECT doc_id,
          |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
          |  FROM documents),
          |c AS (SELECT doc_id, n_tok,
          |    CASE WHEN n_tok <= 32 THEN 1
          |         ELSE 1 + CAST(ceil((n_tok - 32) / 24.0) AS BIGINT) END AS n_chunks
          |  FROM d),
          |u AS (SELECT doc_id, n_tok,
          |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c)
          |SELECT doc_id, chunk_idx,
          |  CAST(least(32, n_tok - chunk_idx * 24) AS BIGINT) AS chunk_tokens
          |FROM u ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Bigram language-model statistics: adjacent-token pair counts with
    // a fixed-point conditional probability p(w2|w1), top 50 by count.
    // The bigram explode is corpus-linear (tokens − docs rows); the
    // count aggregate map-side combines on (w1,w2); the top-50 is a
    // TakeOrdered, never a full sort.
    // BPE merge training over the vocab table: 5 byte-pair merges with
    // greedy longest-first re-segmentation per round — the tokenizer-
    // construction primitive (subword level, distinct from the
    // token-level bigram query below). One corpus scan builds the
    // word-frequency table; every merge round aggregates the CACHED
    // Heaps-sized vocab (~√corpus), and the only driver traffic is the
    // 1-row argmax per round (the IVF-centroid collect discipline).
    "text_bpe_merges" -> Q(
      (s, d) => graft.ops.TextOps.bpeMerges(Tables.documents(s, d), rounds = 5)
        .orderBy("round"),
      Some(TextSql.bpeMerges(rounds = 5))),

    // Apply-side complement of the merge trainer: segment the vocab
    // with the final longest-first alternation and report each learned
    // symbol's frequency-weighted usage — whether the tokenizer's
    // inventory is actually used (usage ≠ training-round counts, since
    // all merges apply simultaneously at apply time). Shares bpeFit /
    // the oracle CTEs with text_bpe_merges.
    "text_bpe_apply" -> Q(
      (s, d) => graft.ops.TextOps.bpeApply(Tables.documents(s, d), rounds = 5, k = 10)
        .orderBy(desc("cnt"), asc("sym")),
      Some(TextSql.bpeApply(rounds = 5, k = 10))),

    "text_bigram_topk" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pairs = Tables.documents(s, d)
          .select(expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(explode(expr(
            "transform(slice(tk, 1, size(tk) - 1), (w, i) -> struct(w AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
        pairs
          .withColumn("p_x1e6",
            floor(col("n") * lit(1000000L) /
              sum("n").over(Window.partitionBy("w1"))).cast("long"))
          .orderBy(desc("n"), asc("w1"), asc("w2")).limit(50)
      },
      Some(
        """WITH t AS (SELECT list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
          |      FROM t WHERE len(tk) >= 2),
          |c AS (SELECT tk[i] AS w1, tk[i + 1] AS w2, count(*) AS n
          |      FROM u GROUP BY 1, 2)
          |SELECT w1, w2, n,
          |  CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS p_x1e6
          |FROM c ORDER BY n DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Corpus-LM surprisal scoring (the CCNet / Wenzek et al. quality
    // signal, arXiv:1911.00359: score each document by how improbable
    // its text is under a language model trained on the corpus itself;
    // high-surprisal docs are the OOD/noise tail a curation run reviews
    // or drops). The LM is the corpus bigram table; a doc's score is the
    // mean INVERSE conditional probability of its bigrams — the exact
    // rational n(w1)/n(w1,w2) in floor fixed-point (mean perplexity
    // without the float log/exp that would break the cross-engine hash
    // gate; the ordering it induces is the same "how surprising" order).
    // Plan shape: the bigram explode is corpus-linear, the LM build is
    // one (w1,w2) map-side-combining aggregate, the context totals
    // derive from the LM frame (vocab-sized, NOT another corpus pass),
    // and the per-doc score joins bigram rows to the LM keyed on
    // (w1,w2) — a vocab-sized build side that stays a hash join at any
    // corpus scale. BIGINT headroom: nu·10⁶ < 2⁶³ up to ~9·10¹²
    // context occurrences — a 100 TB corpus fits; first overflow wall
    // is DECIMAL(38,0), the pipeline_temperature_mix pattern.
    "text_bigram_surprisal" -> Q(
      (s, d) => {
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), col("lang"), explode(expr(
            "transform(slice(tk, 1, size(tk) - 1), (w, i) -> struct(w AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("doc_id"), col("lang"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
        val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nb"))
        val ctx = lm.groupBy("w1").agg(sum("nb").as("nu"))
        bg.join(lm, Seq("w1", "w2")).join(ctx, Seq("w1"))
          .withColumn("inv_p_x1e6", expr("nu * 1000000L div nb"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_bigrams"),
            expr("sum(inv_p_x1e6) div count(*)").as("mean_inv_p_x1e6"))
          .orderBy(desc("mean_inv_p_x1e6"), asc("doc_id")).limit(20)
      },
      Some(
        """WITH t AS (SELECT doc_id, lang, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT doc_id, lang, tk, unnest(generate_series(1, len(tk) - 1)) AS i
          |      FROM t WHERE len(tk) >= 2),
          |bg AS (SELECT doc_id, lang, tk[i] AS w1, tk[i + 1] AS w2 FROM u),
          |lm AS (SELECT w1, w2, count(*) AS nb FROM bg GROUP BY 1, 2),
          |ctx AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS nu FROM lm GROUP BY 1),
          |sc AS (SELECT bg.doc_id, bg.lang, nu * 1000000 // nb AS ip
          |       FROM bg JOIN lm USING (w1, w2) JOIN ctx USING (w1))
          |SELECT doc_id, lang, count(*) AS n_bigrams,
          |  CAST(sum(ip) // count(*) AS BIGINT) AS mean_inv_p_x1e6
          |FROM sc GROUP BY doc_id, lang
          |ORDER BY mean_inv_p_x1e6 DESC, doc_id LIMIT 20""".stripMargin)),

    // Per-dimension embedding stats in fixed-point (floor(x·10⁶) —
    // integer min/max/mean are order-free, so the parallel aggregation
    // is bit-reproducible; a double SUM would be ulp-order-dependent).
    // The embedding-QA readout: dead dims, range drift, centering.
    "emb_dim_stats" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
        .select(col("dim").cast("long").as("dim"),
          floor(col("x") * 1000000).cast("long").as("q"))
        .groupBy("dim")
        .agg(
          count(lit(1)).as("n"),
          floor(sum("q").cast("double") / count(lit(1))).cast("long").as("mean_x1e6"),
          min("q").as("min_x1e6"),
          max("q").as("max_x1e6"))
        .orderBy("dim"),
      Some(TextSql.embDimStats)),

    // Cluster-tightness QA: per-label mean L1 distance from the label's
    // fixed-point centroid — the readout that says whether labels are
    // coherent enough to drive kNN labeling / stratified sampling.
    // Centroids are floor(mean) of floor(x·10⁶) integers (order-free on
    // both engines); the centroid frame is |labels|·dims rows and
    // BROADCASTS back onto the exploded vectors.
    "emb_cluster_tightness" -> Q(
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .select(col("vec_id"), col("label"), col("dim"),
            floor(col("x") * 1000000).cast("long").as("xq"))
        val cent = q.groupBy("label", "dim")
          .agg(floor(sum("xq").cast("double") / count(lit(1))).cast("long").as("cq"))
        q.join(broadcast(cent), Seq("label", "dim"))
          .groupBy("label", "vec_id")
          .agg(sum(abs(col("xq") - col("cq"))).as("l1"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            floor(sum("l1").cast("double") / count(lit(1))).cast("long")
              .as("mean_l1_x1e6"))
          .orderBy("label")
      },
      Some(
        """WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          |             CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |q AS (SELECT vec_id, label, g.i - 1 AS dim,
          |        CAST(floor(e[g.i] * 1000000) AS BIGINT) AS xq
          |      FROM v CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |c AS (SELECT label, dim,
          |        CAST(floor(CAST(sum(xq) AS DOUBLE) / count(*)) AS BIGINT) AS cq
          |      FROM q GROUP BY 1, 2),
          |l AS (SELECT q.label, q.vec_id, sum(abs(q.xq - c.cq)) AS l1
          |      FROM q JOIN c ON c.label = q.label AND c.dim = q.dim
          |      GROUP BY 1, 2)
          |SELECT label, count(*) AS n_vecs,
          |  CAST(floor(CAST(sum(l1) AS DOUBLE) / count(*)) AS BIGINT) AS mean_l1_x1e6
          |FROM l GROUP BY label ORDER BY label""".stripMargin)),

    // Embedding-quantization QA: per-label mean reconstruction error of
    // symmetric int8 quantization (q = floor(x·127/max|x|), recon =
    // q·max|x|/127) — the report a pipeline runs before shipping
    // quantized vectors to an ANN index. All math happens in
    // floor(x·10⁶) fixed-point so both engines aggregate exact BIGINTs
    // (the two interior divisions are IEEE-double quotients of exact
    // integers — bit-identical cross-engine); the whole query is one
    // codegen projection over the vectors plus a map-side-combining
    // aggregate on the tiny label key space.
    // Product-quantization reconstruction error (Jégou et al. TPAMI'11
    // — the PQ of FAISS's IVFPQ): 4 subspaces × 8-centroid codebooks
    // via the SHARED fixed-point Lloyd trainer (bit-identical to
    // sim_ann_ivf_exact's, so the whole path is oracle-expressible),
    // reporting per-subspace mean/max abs reconstruction error — the
    // (m, ksub) tuning readout, and the complement of the scalar
    // int8 readout below. Assignment is a codegen'd argmin over 8
    // literal centroids per subspace; no shuffle before the 4-row agg.
    "emb_pq_error" -> Q(
      (s, d) => graft.ops.Similarity.pqError(Tables.embeddings(s, d),
        m = 4, ksub = 8, iters = 2),
      Some(TextSql.pqError(m = 4, ksub = 8, iters = 2))),

    "emb_quantize_error" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000) as bigint))").as("q"))
        .withColumn("smax",
          expr("aggregate(q, cast(0 as bigint), (a, x) -> greatest(a, abs(x)))"))
        .filter(col("smax") > 0)
        .withColumn("err", expr(
          """aggregate(q, cast(0 as bigint), (a, x) -> a + abs(x -
            |cast(floor(cast(floor(x * 127.0 / smax) as bigint) * smax / 127.0) as bigint)))""".stripMargin))
        .withColumn("dims", size(col("q")).cast("long"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          floor(sum(col("err")).cast("double") / sum(col("dims"))).cast("long")
            .as("mean_abs_err_x1e6"))
        .orderBy("label"),
      Some(
        """WITH v AS (SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
          |    x -> CAST(floor(x * 1000000) AS BIGINT)) AS q FROM embeddings),
          |m AS (SELECT label, q, list_reduce(
          |    list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> abs(x))),
          |    (a, b) -> greatest(a, b)) AS smax FROM v),
          |e AS (SELECT label, len(q) AS dims, list_reduce(
          |    list_prepend(CAST(0 AS BIGINT), list_transform(q,
          |      x -> abs(x - CAST(floor(CAST(floor(x * 127.0 / smax) AS BIGINT) * smax / 127.0) AS BIGINT)))),
          |    (a, b) -> a + b) AS err
          |  FROM m WHERE smax > 0)
          |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
          |  CAST(floor(CAST(sum(err) AS DOUBLE) / CAST(sum(dims) AS DOUBLE)) AS BIGINT) AS mean_abs_err_x1e6
          |FROM e GROUP BY label ORDER BY label""".stripMargin)),

    // Float-kmeans IVF (rows-only: parallel float means are only
    // reproducible to ulps); the fixed-point twin below is oracle-gated.
    "sim_ann_ivf" -> Q(
      (s, d) => graft.ops.Similarity.ivfTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      None),

    // IVF with integer-arithmetic training — the whole pipeline (scaled
    // vectors → Lloyd rounds → probing → cosine rank) has a DuckDB
    // mirror.
    "sim_ann_ivf_exact" -> Q(
      (s, d) => graft.ops.Similarity.ivfFixedPointTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnIvfExact())),

    // IVFPQ ANN (FAISS IndexIVFPQ shape): coarse cells route each
    // query to nprobe cells, candidates rank by the integer ADC
    // distance — the query's exact subvectors vs each candidate's PQ
    // codewords through a per-QUERY lookup table broadcast with the
    // probes (m lookups + adds per candidate, |Q|-independent plan).
    // Coarse quantizer and codebooks are the shared fixed-point
    // trainers (bit-identical to sim_ann_ivf_exact / emb_pq_error), so
    // the whole approximate-search path is hash-gated — no float ANN
    // nondeterminism.
    "sim_ann_ivfpq" -> Q(
      (s, d) => graft.ops.Similarity.ivfPqTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnIvfPq())),

    // Sign-LSH ANN with md5-nibble hyperplanes — the full pipeline
    // (planes → buckets → candidate join → rank) has a DuckDB mirror.
    "sim_ann_lsh" -> Q(
      (s, d) => graft.ops.Similarity.lshTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnLsh)),

    // Multi-probe sign-LSH top-k at HALF the tables (4 vs sim_ann_lsh's
    // 8): each query also probes the buckets across its 2 nearest
    // hyperplanes (smallest |margin| — the neighbor buckets most likely
    // to hold near vectors). At 100 TB the tables are the cost — each is
    // a full bucketed copy of the corpus in index memory, scan, and
    // shuffle — while extra probes only multiply the broadcast query
    // side, so this is the recall-per-byte knob. Margin ordering ties
    // break on plane index, making the probe set (and the oracle)
    // deterministic.
    "sim_ann_multiprobe" -> Q(
      (s, d) => graft.ops.Similarity.lshMultiProbeTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10,
          tables = 4, extraProbes = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnMultiprobe)),

    // Recall@10 of the ANN path vs the brute-force baseline, in-engine —
    // the measurement every ANN deployment needs as a standing health
    // check (run it on a sampled query set at scale). Left join on the
    // exact top-k so misses count as 0; both sides' own oracles compose
    // into this one's.
    "sim_ann_recall" -> Q(
      (s, d) => {
        val sim = graft.ops.Similarity
        val exact = sim.bruteForceTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L), k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = sim.lshTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L), k = 10)
          .select(col("query_id").as("aq"), col("vec_id").as("av"))
        exact.join(ann,
            col("query_id") === col("aq") && col("vec_id") === col("av"), "left")
          .groupBy("query_id")
          .agg(count(col("av")).as("hits"),
            (count(col("av")) * 10).as("recall_pct"))
          .orderBy("query_id")
      },
      Some(TextSql.simAnnRecall)),

    // kNN label classification: majority vote over the 10 exact cosine
    // neighbors of each of the first 10 vectors (ties to the smallest
    // label) — the weak-supervision / label-propagation building block.
    // The neighbor list is tiny (|Q|·k rows), so it BROADCASTS into the
    // label join; the vote argmax windows over |Q|·|labels| rows. At
    // scale the expensive half is the neighbor search itself, which is
    // the already-benched brute-force/LSH/IVF family — classification
    // adds one broadcast join + one window over a vanishing row count.
    "sim_knn_classify" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nn = graft.ops.Similarity.bruteForceTopK(
            Tables.embeddings(s, d), queryIds = (0L until 10L), k = 10)
          .select(col("query_id"), col("vec_id"))
        val labels = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("nbr_label"))
        val votes = labels.join(broadcast(nn), "vec_id")
          .groupBy("query_id", "nbr_label").agg(count(lit(1)).as("votes"))
        votes
          .withColumn("rn", row_number().over(
            Window.partitionBy("query_id").orderBy(desc("votes"), asc("nbr_label"))))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("nbr_label").as("pred_label"), col("votes"))
          .orderBy("query_id")
      },
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
          |scored AS (
          |  SELECT query_id, vec_id,
          |    round(list_dot_product(e, qe)
          |      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 6) AS cos
          |  FROM v CROSS JOIN q WHERE vec_id <> query_id),
          |r AS (SELECT query_id, vec_id,
          |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
          |      FROM scored),
          |nn AS (SELECT query_id, vec_id FROM r WHERE rnk <= 10),
          |votes AS (SELECT nn.query_id, CAST(v.label AS BIGINT) AS nbr_label, count(*) AS votes
          |          FROM nn JOIN v ON v.vec_id = nn.vec_id GROUP BY 1, 2),
          |w AS (SELECT query_id, nbr_label, votes,
          |        row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nbr_label) AS rn
          |      FROM votes)
          |SELECT query_id, nbr_label AS pred_label, votes FROM w WHERE rn = 1
          |ORDER BY query_id""".stripMargin)),

    // ===== Extension: LLM-pipeline — multimodal columns =====
    "multimodal_bytes" -> Q(
      (s, d) => graft.ops.Multimodal.byteStats(Tables.documents(s, d))
        .orderBy("format"),
      Some(TextSql.multimodalBytes)),

    // Frame sampling: stride-sampled fixed-size chunks of the payload,
    // digested portably (the video-pipeline plumbing slice).
    "multimodal_frame_sample" -> Q(
      (s, d) => graft.ops.Multimodal.frameSample(Tables.documents(s, d))
        .orderBy("asset_id", "frame_idx"),
      Some(TextSql.multimodalFrameSample())),

    // Resize planning: bounding-box target dims from typed metadata.
    "multimodal_resize" -> Q(
      (s, d) => graft.ops.Multimodal.resizePlan(Tables.documents(s, d))
        .orderBy("asset_id"),
      Some(TextSql.multimodalResize())),

    // Decode-stub features; the oracle recovers byte count + scaled mean
    // byte by hex-expanding the payload in SQL.
    "multimodal_features" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions.{col => c}
        graft.ops.Multimodal.decodeStub(
          graft.ops.Multimodal.assetsFromDocuments(Tables.documents(s, d)))
          .toDF()
          .select(c("asset_id"), c("n_bytes"),
            floor(c("mean_byte") * 10000).cast("long").as("mean_byte_x10k"))
          .orderBy("asset_id")
      },
      Some(TextSql.multimodalFeatures)),

    // Frame-level near-dup detection across assets: pairs of assets
    // sharing identical sampled frames (re-encoded copies, clipped
    // videos and boilerplate intros surface here while whole-payload
    // digests differ). Same candidate discipline as containment: a
    // distinct (asset, frame-digest) inverted index, hot digests capped
    // (boilerplate frames would otherwise join df² pairs), equality
    // self-join on the digest — never an all-pairs comparison.
    "multimodal_shared_frames" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val fr = graft.ops.Multimodal.frameSample(plantedDocs(s, d, exact = true))
          .select(col("asset_id"), col("frame_md5")).distinct()
        val capped = fr
          .withColumn("df", count(lit(1)).over(Window.partitionBy("frame_md5")))
          .filter(col("df") <= 64).drop("df")
        val la = capped.select(col("asset_id").as("a"), col("frame_md5"))
        val rb = capped.select(col("asset_id").as("b"), col("frame_md5"))
        la.join(rb, "frame_md5").filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
          .orderBy("a", "b")
      },
      Some(
        """WITH docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
          |a AS (SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
          |        octet_length(encode(text)) AS n
          |      FROM docs WHERE octet_length(encode(text)) > 0),
          |f AS (SELECT DISTINCT asset_id,
          |        md5(substr(hx, CAST(u.i * 128 + 1 AS BIGINT), 128)) AS fm
          |      FROM a, unnest(generate_series(0,
          |        CAST(ceil(n / 64.0) AS BIGINT) - 1, 2)) u(i)),
          |c AS (SELECT asset_id, fm FROM (
          |        SELECT asset_id, fm, count(*) OVER (PARTITION BY fm) AS df FROM f)
          |      WHERE df <= 64),
          |p AS (SELECT l.asset_id AS a, r.asset_id AS b, count(*) AS n_shared
          |      FROM c l JOIN c r ON l.fm = r.fm AND l.asset_id < r.asset_id
          |      GROUP BY 1, 2)
          |SELECT a, b, n_shared FROM p ORDER BY a, b""".stripMargin)),

    // Exact-duplicate detection over the binary asset payload — the
    // multimodal face of dedup_exact: one digest groupBy on md5 of the
    // hex payload (hex so any engine reproduces the digest input),
    // groups > 1 kept, canonical = min asset id. At scale this is a
    // single shuffle on a 128-bit key, identical to text exact dedup.
    // Runs over the planted corpus (exact copies under id+100000) so
    // the detector has real duplicates to find.
    "multimodal_dedup" -> Q(
      (s, d) => graft.ops.Multimodal.assetsFromDocuments(
          plantedDocs(s, d, exact = true)).toDF()
        .select(col("asset_id"), md5(hex(col("content"))).as("digest"),
          length(col("content")).cast("long").as("nb"))
        .groupBy("digest")
        .agg(count(lit(1)).as("n_assets"), min("asset_id").as("canonical_id"),
          min("nb").as("n_bytes"))
        .filter(col("n_assets") > 1)
        .orderBy("digest"),
      Some(
        """WITH docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
          |a AS (SELECT doc_id AS asset_id, md5(hex(encode(text))) AS digest,
          |        CAST(octet_length(encode(text)) AS BIGINT) AS nb
          |      FROM docs)
          |SELECT digest, count(*) AS n_assets, min(asset_id) AS canonical_id,
          |  min(nb) AS n_bytes
          |FROM a GROUP BY digest HAVING count(*) > 1 ORDER BY digest""".stripMargin)),

    // ===== Round 9: basket mining, record linkage, data selection =====

    // Market-basket association rules over co-ordered parts: support /
    // confidence / lift ×1e6 in exact integer arithmetic. The per-order
    // pair explode is bounded by basket width (≤ C(13,2) pair rows per
    // order here) and the support-≥2 prune cuts the edge set before the
    // metric joins — candidates-then-verify on keyed joins only.
    "assoc_part_pairs" -> Q(
      (s, d) => graft.ops.Basket.assocRules(Tables.lineitem(s, d), minSupport = 2)
        .orderBy("pa", "pb"),
      Some(
        """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_both
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |pp AS (SELECT pk, count(*) AS n_part FROM op GROUP BY 1),
          |n AS (SELECT count(DISTINCT ok) AS n_orders FROM op)
          |SELECT pa, pb, n_both,
          |  CAST(CAST(n_both AS HUGEINT) * 1000000 // CAST(na.n_part AS HUGEINT)
          |       AS BIGINT) AS conf_ab_x1e6,
          |  CAST(CAST(n_both AS HUGEINT) * CAST(n.n_orders AS HUGEINT) * 1000000
          |       // (CAST(na.n_part AS HUGEINT) * CAST(nb.n_part AS HUGEINT))
          |       AS BIGINT) AS lift_x1e6
          |FROM e JOIN pp na ON na.pk = pa JOIN pp nb ON nb.pk = pb CROSS JOIN n
          |ORDER BY pa, pb""".stripMargin)),

    // Triangle census on the support-pruned co-order graph (edges
    // oriented a < b so each triangle counts once as a < b < c): the
    // global clustering readout. Both joins are keyed on the pruned
    // edge set — Σ deg² of the THINNED adjacency, not the raw one.
    "graph_triangles" -> Q(
      (s, d) => graft.ops.Basket.triangleStats(Tables.lineitem(s, d), minSupport = 2),
      Some(
        """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e AS (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |w AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
          |      FROM e e1 JOIN e e2 ON e2.pa = e1.pb)
          |SELECT (SELECT count(*) FROM e) AS n_edges,
          |  (SELECT count(*) FROM w) AS n_wedges,
          |  (SELECT count(*) FROM w WHERE EXISTS
          |     (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.c)) AS n_triangles""".stripMargin)),

    // k-core of the support-pruned co-order graph: 5 fixed peeling
    // passes (degree-<3 nodes drop, induced edges re-derived — one
    // degree agg + two semi-joins per round on the SHRINKING edge
    // set). Fixed rounds keep the oracle a mechanical unroll; the spec
    // asserts the corpus fixpoint is reached within them.
    "graph_kcore" -> Q(
      (s, d) => graft.ops.Basket.kCore(Tables.lineitem(s, d), k = 3, rounds = 5),
      Some {
        // every e$i is referenced ~3× by round i+1 — MATERIALIZED stops
        // DuckDB's default CTE inlining from re-evaluating each round
        // combinatorially (the SQL mirror of the lineage truncation the
        // Spark side does with localCheckpoint)
        val base =
          """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
            |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
            |      GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin
        val rounds = (1 to 5).map { i =>
          s"""d$i AS (SELECT node, count(*) AS deg FROM (
             |  SELECT pa AS node FROM e${i - 1} UNION ALL SELECT pb FROM e${i - 1})
             |  GROUP BY 1),
             |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= 3),
             |e$i AS MATERIALIZED (SELECT e.pa, e.pb FROM e${i - 1} e
             |  JOIN k$i ka ON ka.node = e.pa
             |  JOIN k$i kb ON kb.node = e.pb)""".stripMargin
        }.mkString(",\n")
        s"""$base,
           |$rounds
           |SELECT (SELECT count(*) FROM
           |    (SELECT pa AS n FROM e5 UNION SELECT pb FROM e5)) AS n_core_nodes,
           |  (SELECT count(*) FROM e5) AS n_core_edges""".stripMargin
      }),

    // Chi-square independence test between market segment and order
    // priority (the feature-dependence screen a curation pipeline runs
    // before trusting a stratification): per-cell (O·T − R·C)²·1e6 /
    // (R·C·T) floored in DECIMAL(38,0), summed — exact integer
    // arithmetic, so the statistic hash-matches across engines. One
    // fact-dim broadcast join + four aggregations of the pair frame.
    "stats_chi2_segments" -> Q(
      (s, d) => {
        val j = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg"))),
            "o_custkey")
          .select(col("seg"), col("o_orderpriority").as("prio"))
        val obs = j.groupBy("seg", "prio").agg(count(lit(1)).as("obs"))
        val rn = j.groupBy("seg").agg(count(lit(1)).as("rn"))
        val cn = j.groupBy("prio").agg(count(lit(1)).as("cn"))
        val tn = j.agg(count(lit(1)).as("tn"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val cells = obs.join(rn, "seg").join(cn, "prio")
          .crossJoin(broadcast(tn))
          .withColumn("term_x1e6", graft.functions.GraftFunctions.longDiv(
            (dec(col("obs")) * dec(col("tn")) - dec(col("rn")) * dec(col("cn")))
              * (dec(col("obs")) * dec(col("tn")) - dec(col("rn")) * dec(col("cn")))
              * dec(lit(1000000L)),
            dec(col("rn")) * dec(col("cn")) * dec(col("tn"))).cast("long"))
        cells.agg(count(lit(1)).as("n_cells"),
            countDistinct(col("seg")).as("n_seg"),
            countDistinct(col("prio")).as("n_prio"),
            sum("term_x1e6").cast("long").as("chi2_x1e6"))
          .select(col("n_cells"),
            ((col("n_seg") - 1) * (col("n_prio") - 1)).cast("long").as("dof"),
            col("chi2_x1e6"))
      },
      Some(
        """WITH j AS (SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
          |           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
          |obs AS (SELECT seg, prio, count(*) AS obs FROM j GROUP BY 1, 2),
          |r AS (SELECT seg, count(*) AS rn FROM j GROUP BY 1),
          |c AS (SELECT prio, count(*) AS cn FROM j GROUP BY 1),
          |t AS (SELECT count(*) AS tn FROM j),
          |cells AS (SELECT obs.seg, obs.prio,
          |    CAST((CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
          |         * (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
          |         * 1000000
          |         // (CAST(rn AS HUGEINT) * cn * tn) AS BIGINT) AS term_x1e6
          |  FROM obs JOIN r USING (seg) JOIN c USING (prio) CROSS JOIN t)
          |SELECT count(*) AS n_cells,
          |  CAST((count(DISTINCT seg) - 1) * (count(DISTINCT prio) - 1) AS BIGINT) AS dof,
          |  CAST(sum(term_x1e6) AS BIGINT) AS chi2_x1e6
          |FROM cells""".stripMargin)),

    // Blocked fuzzy record linkage over customer names: collapse to
    // DISTINCT names first (exact-dup mass becomes a multiplicity and
    // the dist=0 row), then block on the name minus its last 2 chars
    // and verify with Levenshtein ≤ 2 inside the block. The collapse
    // is the scale move — block width is bounded by the suffix charset
    // (≤ |charset|²) REGARDLESS of how often a name repeats, so pair
    // volume tracks distinct names, not corpus rows (measured: the
    // pre-collapse form cost 96× at the name-replicated 10× corpus).
    "dedup_fuzzy_names" -> Q(
      (s, d) => graft.ops.Linkage.fuzzyNameSummary(
          Tables.customer(s, d), "c_name")
        .orderBy("dist"),
      Some(
        """WITH nm AS (SELECT c_name AS name, count(*) AS m FROM customer GROUP BY 1),
          |k AS (SELECT name, m,
          |        substring(name, 1, length(name) - 2) AS block FROM nm),
          |fz AS (SELECT a.block, a.m * b.m AS w, levenshtein(a.name, b.name) AS dist
          |       FROM k a JOIN k b ON b.block = a.block AND a.name < b.name),
          |ex AS (SELECT CAST(0 AS BIGINT) AS dist,
          |         CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_pairs,
          |         count(DISTINCT block) AS n_blocks
          |       FROM k WHERE m > 1 HAVING sum(m * (m - 1) // 2) IS NOT NULL)
          |SELECT * FROM ex
          |UNION ALL
          |SELECT CAST(dist AS BIGINT) AS dist, CAST(sum(w) AS BIGINT) AS n_pairs,
          |  count(DISTINCT block) AS n_blocks
          |FROM fz WHERE dist <= 2 GROUP BY dist
          |ORDER BY dist""".stripMargin)),

    // Aggressive canonicalization dedup: lowercase + strip punctuation
    // + collapse whitespace, over a corpus with planted punct/case
    // variants (doc_id < 50 re-appended under id+300000 wrapped in
    // punctuation). `exact_too` marks groups the whitespace-normalized
    // fingerprint (dedup_exact's key) already catches — false rows are
    // what canonicalization alone buys. Same one-shuffle hash-groupBy
    // as exact dedup.
    "dedup_canonical" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 300000)
          .withColumn("text", concat(lit("*** "), upper(col("text")), lit(" ???")))
        graft.ops.Linkage.canonicalGroups(base.unionByName(plants))
          .orderBy("cfp")
      },
      Some(
        """WITH docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 300000, '*** ' || upper(text) || ' ???'
          |  FROM documents WHERE doc_id < 50),
          |c AS (SELECT doc_id,
          |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
          |      ' +', ' ', 'g'))) AS cfp,
          |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          |  FROM docs)
          |SELECT cfp, count(*) AS n, min(doc_id) AS canonical_id,
          |  (count(DISTINCT fp) = 1) AS exact_too
          |FROM c GROUP BY cfp HAVING count(*) > 1 ORDER BY cfp""".stripMargin)),

    // DSIR data selection (Xie et al. 2023): rank docs by the hashed-
    // bigram importance weight of a target distribution (the 'en'
    // slice) over the raw corpus. The model is a FIXED 4096-bucket
    // log-ratio table (two map-side-combined aggs) broadcast back onto
    // the token stream; per-bucket scores are floored to ×1e6 BIGINT
    // before the per-doc sum, so doc totals are order-free integer
    // arithmetic. Top 50 by weight = the kept slice.
    "pipeline_dsir_sample" -> Q(
      (s, d) => graft.ops.Selection.dsirWeights(Tables.documents(s, d))
        .orderBy(desc("avg_score_x1e6"), asc("doc_id"))
        .limit(50),
      Some(
        s"""WITH t AS (SELECT doc_id, lang, source,
           |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
           |  FROM documents),
           |bg AS (SELECT doc_id, lang, source,
           |    unnest(list_transform(generate_series(1, len(toks) - 1),
           |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
           |  FROM t WHERE len(toks) >= 2),
           |bk AS (SELECT doc_id, lang, source,
           |    ${GraphSql.md5Hash60("bg")} % 4096 AS bucket FROM bg),
           |counts AS (SELECT bucket, count(*) AS cr,
           |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct FROM bk GROUP BY 1),
           |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM counts),
           |model AS (SELECT counts.bucket,
           |    CAST(floor((ln(counts.ct + 1) - ln(counts.cr + 1)
           |        + ln(tot.tr + 4096) - ln(tot.tt + 4096)) * 1e6) AS BIGINT) AS score_x1e6
           |  FROM counts CROSS JOIN tot),
           |w AS (SELECT doc_id, lang, source, count(*) AS n_bigrams,
           |    sum(score_x1e6) AS w FROM bk JOIN model USING (bucket)
           |  GROUP BY 1, 2, 3)
           |SELECT doc_id, lang, source, n_bigrams,
           |  CAST(CAST(w AS HUGEINT) // CAST(n_bigrams AS HUGEINT) AS BIGINT) AS avg_score_x1e6
           |FROM w ORDER BY avg_score_x1e6 DESC, doc_id LIMIT 50""".stripMargin)),

    // UniMax language mixing (Chung et al., ICLR 2023): spend 90% of
    // the corpus character budget as uniformly across languages as the
    // 1-epoch repeat cap allows. Closed water-filling form — no
    // iteration: capped languages take their capacity, the rest split
    // the remainder exactly (integer division, deterministic remainder
    // distribution; allocations sum to the budget EXACTLY). One corpus
    // agg to a |languages|-row frame; all windows on that tiny frame.
    "pipeline_unimax_mix" -> Q(
      (s, d) => graft.ops.Selection.unimaxAllocation(Tables.documents(s, d))
        .orderBy("lang"),
      Some(
        """WITH lt AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS toks
          |            FROM documents GROUP BY 1),
          |b AS (SELECT CAST(sum(toks) * 9 // 10 AS BIGINT) AS budget FROM lt),
          |s AS (SELECT lang, toks, toks * 1 AS cap,
          |        row_number() OVER (ORDER BY toks * 1, lang) AS i,
          |        sum(toks * 1) OVER (ORDER BY toks * 1, lang
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
          |        count(*) OVER () AS n
          |      FROM lt),
          |f AS (SELECT s.*, b.budget,
          |        CASE WHEN cap * (n - i + 1) <= budget - (p - cap)
          |             THEN 1 ELSE 0 END AS isfull
          |      FROM s CROSS JOIN b),
          |k AS (SELECT COALESCE(max(CASE WHEN isfull = 1 THEN i END), 0) AS k,
          |             COALESCE(max(CASE WHEN isfull = 1 THEN p END), 0) AS pk FROM f)
          |SELECT lang, toks,
          |  CAST(CASE WHEN i <= k.k THEN cap
          |       ELSE (budget - k.pk) // (n - k.k)
          |            + CASE WHEN i - k.k <= (budget - k.pk) % (n - k.k)
          |              THEN 1 ELSE 0 END
          |  END AS BIGINT) AS alloc,
          |  CAST(CASE WHEN i <= k.k THEN cap
          |       ELSE (budget - k.pk) // (n - k.k)
          |            + CASE WHEN i - k.k <= (budget - k.pk) % (n - k.k)
          |              THEN 1 ELSE 0 END
          |  END * 1000000 // toks AS BIGINT) AS epochs_x1e6
          |FROM f CROSS JOIN k ORDER BY lang""".stripMargin)),

    // Zipf's-law fit over the term-frequency ranks: slope of
    // log(freq) vs log(rank) for the top 1000 terms, in fixed-point
    // least squares (per-point logs floored to ×1e6 BIGINT, then the
    // closed-form slope in DECIMAL(38,0) integer sums — order-free).
    // The rank window runs over the VOCABULARY frame (Heaps-bounded,
    // ~√corpus), not the corpus; the corpus-order work is one token agg.
    "text_zipf_slope" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = Tables.documents(s, d)
          .select(explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("cnt"))
        val pts = tf
          .withColumn("rnk", row_number().over(Window.orderBy(desc("cnt"), asc("w"))))
          .filter(col("rnk") <= 1000)
          .select(floor(log(col("rnk")) * 1e6).cast("long").as("x"),
            floor(log(col("cnt")) * 1e6).cast("long").as("y"))
        def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          c.cast("decimal(38,0)")
        pts.agg(count(lit(1)).as("n"),
            sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
            sum(dec(col("x")) * dec(col("y"))).as("sxy"),
            sum(dec(col("x")) * dec(col("x"))).as("sxx"))
          .select(col("n").as("n_terms"),
            expr("""cast((cast(n as decimal(38,0)) * sxy - sx * sy) * 1000000
                   | div (cast(n as decimal(38,0)) * sxx - sx * sx) as bigint)""".stripMargin)
              .as("slope_x1e6"))
      },
      Some(
        """WITH tf AS (
          |  SELECT w, count(*) AS cnt FROM (
          |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
          |    FROM documents) WHERE w <> '' GROUP BY w),
          |pts AS (
          |  SELECT CAST(floor(ln(rnk) * 1e6) AS BIGINT) AS x,
          |         CAST(floor(ln(cnt) * 1e6) AS BIGINT) AS y
          |  FROM (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rnk FROM tf)
          |  WHERE rnk <= 1000),
          |s AS (SELECT count(*) AS n,
          |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
          |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
          |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
          |  FROM pts)
          |SELECT n AS n_terms,
          |  CAST((CAST(n AS HUGEINT) * sxy - sx * sy) * 1000000
          |       // (CAST(n AS HUGEINT) * sxx - sx * sx) AS BIGINT) AS slope_x1e6
          |FROM s""".stripMargin)),

    // RFM customer segmentation: quartile recency / frequency /
    // monetary labels per market segment (rank windows PARTITIONED by
    // segment — the winsorize discipline; the 100 TB swap is KLL
    // boundaries with assignment unchanged). All metrics integer (days
    // since 1992-01-01, order count, cents); ntile ties broken by a
    // total order so both engines bucket identically.
    "customer_rfm" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val m = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(datediff(max(col("o_orderdate").cast("date")),
              to_date(lit("1992-01-01"))).cast("long").as("r_days"),
            count(lit(1)).as("freq"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("mon_c"))
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg")), "o_custkey")
        def q(metric: String): org.apache.spark.sql.Column = ntile(4).over(
          Window.partitionBy("seg").orderBy(col(metric), col("o_custkey")))
        m.select(col("seg"), col("o_custkey"), col("mon_c"),
            q("r_days").as("r_q"), q("freq").as("f_q"), q("mon_c").as("m_q"))
          .groupBy("seg", "r_q", "f_q", "m_q")
          .agg(count(lit(1)).as("n_customers"),
            expr("sum(mon_c) div count(1)").cast("long").as("avg_monetary_c"))
          .withColumn("r_q", col("r_q").cast("long"))
          .withColumn("f_q", col("f_q").cast("long"))
          .withColumn("m_q", col("m_q").cast("long"))
          .select("seg", "r_q", "f_q", "m_q", "n_customers", "avg_monetary_c")
          .orderBy("seg", "r_q", "f_q", "m_q")
      },
      Some(
        """WITH m AS (
          |  SELECT o_custkey,
          |    CAST(date_diff('day', DATE '1992-01-01', CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS r_days,
          |    count(*) AS freq,
          |    sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS mon_c
          |  FROM orders GROUP BY 1),
          |j AS (SELECT m.*, c.c_mktsegment AS seg FROM m
          |      JOIN customer c ON c.c_custkey = m.o_custkey),
          |q AS (SELECT seg, o_custkey, mon_c,
          |    ntile(4) OVER (PARTITION BY seg ORDER BY r_days, o_custkey) AS r_q,
          |    ntile(4) OVER (PARTITION BY seg ORDER BY freq, o_custkey) AS f_q,
          |    ntile(4) OVER (PARTITION BY seg ORDER BY mon_c, o_custkey) AS m_q
          |  FROM j)
          |SELECT seg, CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
          |  CAST(m_q AS BIGINT) AS m_q, count(*) AS n_customers,
          |  CAST(sum(mon_c) // count(*) AS BIGINT) AS avg_monetary_c
          |FROM q GROUP BY seg, r_q, f_q, m_q
          |ORDER BY seg, r_q, f_q, m_q""".stripMargin)),

    // Column profiling of `orders` (the data-quality readout a pipeline
    // runs before trusting a new drop): per column — nulls, exact
    // distinct count, min/max as canonical strings. TWO aggregates, not
    // one: a single combined agg forces Catalyst's distinct-rewrite
    // Expand (×7 input rows, each carrying every non-distinct agg
    // input) — measured 16.1 s at 10×. Split, the distinct-free base
    // agg partial-aggregates to one row per task (no Expand, ~free)
    // and the distinct-only agg's Expand emits NARROW (gid, value)
    // rows that map-side dedup before the shuffle — identical output,
    // 5× less wall at 10× (3.1 s). The two 1-row frames meet in a
    // broadcast cross.
    "profile_columns" -> Q(
      (s, d) => {
        val p = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("o_totalprice_c"),
          col("o_orderdate"), col("o_orderpriority"))
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice_c", "o_orderdate", "o_orderpriority")
        val baseAggs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
          count(col(c)).as(s"${c}_nn"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max")) }
        val distAggs = cols.map(c => countDistinct(col(c)).as(s"${c}_nd"))
        val stackExpr = "stack(" + cols.size + ", " + cols.map { c =>
          s"'$c', n_rows - ${c}_nn, ${c}_nd, ${c}_min, ${c}_max"
        }.mkString(", ") + ") as (column_name, n_nulls, n_distinct, min_s, max_s)"
        p.agg(baseAggs.head, baseAggs.tail: _*)
          .crossJoin(broadcast(p.agg(distAggs.head, distAggs.tail: _*)))
          .select(expr(stackExpr))
          .orderBy("column_name")
      },
      Some(
        """WITH p AS (SELECT o_orderkey, o_custkey, o_orderstatus,
          |    CAST(floor(o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
          |    o_orderdate, o_orderpriority FROM orders)
          |SELECT 'o_custkey' AS column_name,
          |  count(*) - count(o_custkey) AS n_nulls, count(DISTINCT o_custkey) AS n_distinct,
          |  CAST(min(o_custkey) AS VARCHAR) AS min_s, CAST(max(o_custkey) AS VARCHAR) AS max_s FROM p
          |UNION ALL SELECT 'o_orderdate', count(*) - count(o_orderdate), count(DISTINCT o_orderdate),
          |  CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR) FROM p
          |UNION ALL SELECT 'o_orderkey', count(*) - count(o_orderkey), count(DISTINCT o_orderkey),
          |  CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR) FROM p
          |UNION ALL SELECT 'o_orderpriority', count(*) - count(o_orderpriority), count(DISTINCT o_orderpriority),
          |  min(o_orderpriority), max(o_orderpriority) FROM p
          |UNION ALL SELECT 'o_orderstatus', count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
          |  min(o_orderstatus), max(o_orderstatus) FROM p
          |UNION ALL SELECT 'o_totalprice_c', count(*) - count(o_totalprice_c), count(DISTINCT o_totalprice_c),
          |  CAST(min(o_totalprice_c) AS VARCHAR), CAST(max(o_totalprice_c) AS VARCHAR) FROM p
          |ORDER BY column_name""".stripMargin)),

    // Integer EWMA of hourly event volume (α = 1/2 truncated at 10
    // lags): each hour's count SCATTERS to the next 10 hours with
    // weight 2^(9−lag) — an explode-then-agg (no range join, no
    // window), one shuffle on (type, hour). Weighted sums are exact
    // integers; the readout is the last 24 hours per type.
    "events_ewma" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        val mx = Tables.events(s, d)
          .agg(max(date_trunc("hour", col("ts"))).as("mx"))
        hourly
          .withColumn("lag", explode(expr("sequence(0, 9)")))
          .withColumn("t", expr("hr + make_interval(0, 0, 0, 0, lag, 0, 0)"))
          .withColumn("wgt", expr("shiftleft(cast(1 as bigint), 9 - lag)"))
          .groupBy("event_type", "t")
          .agg(sum(col("n") * col("wgt")).as("ewma_wsum"))
          .crossJoin(broadcast(mx))
          .filter(col("t") <= col("mx") &&
            col("t") >= expr("mx - interval 23 hours"))
          .select("event_type", "t", "ewma_wsum")
          .orderBy("event_type", "t")
      },
      Some(
        """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
          |    count(*) AS n FROM events GROUP BY 1, 2),
          |mx AS (SELECT max(date_trunc('hour', ts)) AS mx FROM events),
          |c AS (SELECT event_type,
          |    hr + lag * (INTERVAL 1 HOUR) AS t,
          |    n * (1 << (9 - lag)) AS c
          |  FROM hourly, unnest(generate_series(0, 9)) AS u(lag))
          |SELECT event_type, t, CAST(sum(c) AS BIGINT) AS ewma_wsum
          |FROM c CROSS JOIN mx
          |WHERE t <= mx AND t >= mx - INTERVAL 23 HOUR
          |GROUP BY event_type, t ORDER BY event_type, t""".stripMargin)),

    // Shuffle-key skew diagnostic for the three lineitem join keys:
    // exact distinct counts, hottest-key share, and the max/avg
    // imbalance over 32 md5 hash buckets — the pre-join readout that
    // decides salting / AQE-skew handling before a 100 TB shuffle.
    // Everything is two small aggregations per key; integer ratios.
    "stats_key_skew" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        def skewFor(keyCol: String): DataFrame = {
          val keyed = li.select(col(keyCol).cast("long").as("k"))
          val perKey = keyed.groupBy("k").agg(count(lit(1)).as("cnt"))
          val keyAgg = perKey.agg(sum("cnt").as("n"),
            count(lit(1)).as("n_distinct"), max("cnt").as("max_key"))
          val bktAgg = keyed
            .groupBy(pmod(graft.functions.GraftFunctions.md5Hash60(col("k")), lit(32L)).as("bkt"))
            .agg(count(lit(1)).as("bn"))
            .agg(max("bn").as("max_bucket"))
          keyAgg.crossJoin(broadcast(bktAgg))
            .select(lit(keyCol).as("key_name"), col("n").cast("long").as("n"),
              col("n_distinct"),
              expr("max_key * 1000000L div n").cast("long").as("top_key_share_x1e6"),
              expr("max_bucket * 32L * 1000000L div n").cast("long").as("bucket_imbalance_x1e6"))
        }
        skewFor("l_orderkey")
          .unionByName(skewFor("l_partkey"))
          .unionByName(skewFor("l_suppkey"))
          .orderBy("key_name")
      },
      Some(
        s"""WITH ks AS (
           |  SELECT 'l_orderkey' AS key_name, l_orderkey AS k FROM lineitem
           |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
           |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
           |pk AS (SELECT key_name, k, count(*) AS cnt FROM ks GROUP BY 1, 2),
           |ka AS (SELECT key_name, sum(cnt) AS n, count(*) AS n_distinct,
           |    max(cnt) AS max_key FROM pk GROUP BY 1),
           |bk AS (SELECT key_name, ${GraphSql.md5Hash60("CAST(k AS VARCHAR)")} % 32 AS bkt,
           |    count(*) AS bn FROM ks GROUP BY 1, 2),
           |ba AS (SELECT key_name, max(bn) AS max_bucket FROM bk GROUP BY 1)
           |SELECT ka.key_name, CAST(ka.n AS BIGINT) AS n, ka.n_distinct,
           |  CAST(max_key * 1000000 // ka.n AS BIGINT) AS top_key_share_x1e6,
           |  CAST(max_bucket * 32 * 1000000 // ka.n AS BIGINT) AS bucket_imbalance_x1e6
           |FROM ka JOIN ba USING (key_name) ORDER BY ka.key_name""".stripMargin)),

    // Dominant principal component of the embedding cloud by
    // fixed-point power iteration (All-but-the-Top, Mu & Viswanath
    // 1702.01417 — the direction a whitening pipeline removes first).
    // Matrix-free: each step is one scan computing a codegen'd BIGINT
    // dot (LongDotProduct) + a 64-row per-dim aggregate; the iterate is
    // rescaled to |v|∞ = 2²⁰ by truncating integral division, so every
    // step is exact integer arithmetic and the unrolled 3-step DuckDB
    // oracle gates it hash-exact. Covariance never materializes.
    "emb_pca_power" -> Q(
      (s, d) => graft.ops.Spectral.pcaPower(Tables.embeddings(s, d), iters = 3),
      Some(
        """WITH q0 AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
          |    x -> CAST(floor(x * 1000000) AS BIGINT)) AS xq FROM embeddings),
          |dims AS (SELECT unnest(generate_series(1,
          |    (SELECT len(xq) FROM q0 LIMIT 1))) AS d),
          |m AS (SELECT d, CAST(sum(xq[d]) AS HUGEINT) // count(*) AS mu
          |      FROM q0 CROSS JOIN dims GROUP BY d),
          |ml AS (SELECT list(CAST(mu AS BIGINT) ORDER BY d) AS mu FROM m),
          |qc AS (SELECT list_transform(generate_series(1, len(xq)),
          |         i -> xq[i] - mu[i]) AS q
          |       FROM q0 CROSS JOIN ml),
          |v0 AS (SELECT list_transform(generate_series(1,
          |         (SELECT len(q) FROM qc LIMIT 1)),
          |         i -> CAST(1048576 AS BIGINT)) AS v),
          |d1 AS (SELECT q, list_reduce(list_transform(generate_series(1, len(q)),
          |         i -> q[i] * v[i]), (a, b) -> a + b) AS dot
          |       FROM qc CROSS JOIN v0),
          |s1 AS (SELECT d, sum(CAST(q[d] AS HUGEINT) * CAST(dot AS HUGEINT)) AS s
          |       FROM d1 CROSS JOIN dims GROUP BY d),
          |x1 AS (SELECT greatest(max(abs(s)), 1) AS mx FROM s1),
          |v1 AS (SELECT list(CAST(s * 1048576 // mx AS BIGINT) ORDER BY d) AS v
          |       FROM s1 CROSS JOIN x1),
          |d2 AS (SELECT q, list_reduce(list_transform(generate_series(1, len(q)),
          |         i -> q[i] * v[i]), (a, b) -> a + b) AS dot
          |       FROM qc CROSS JOIN v1),
          |s2 AS (SELECT d, sum(CAST(q[d] AS HUGEINT) * CAST(dot AS HUGEINT)) AS s
          |       FROM d2 CROSS JOIN dims GROUP BY d),
          |x2 AS (SELECT greatest(max(abs(s)), 1) AS mx FROM s2),
          |v2 AS (SELECT list(CAST(s * 1048576 // mx AS BIGINT) ORDER BY d) AS v
          |       FROM s2 CROSS JOIN x2),
          |d3 AS (SELECT q, list_reduce(list_transform(generate_series(1, len(q)),
          |         i -> q[i] * v[i]), (a, b) -> a + b) AS dot
          |       FROM qc CROSS JOIN v2),
          |s3 AS (SELECT d, sum(CAST(q[d] AS HUGEINT) * CAST(dot AS HUGEINT)) AS s
          |       FROM d3 CROSS JOIN dims GROUP BY d),
          |x3 AS (SELECT greatest(max(abs(s)), 1) AS mx FROM s3)
          |SELECT CAST(d AS BIGINT) AS d, CAST(s * 1048576 // mx AS BIGINT) AS v
          |FROM s3 CROSS JOIN x3 ORDER BY d""".stripMargin)),

    // Matryoshka-style truncation quality: the fraction of each
    // vector's energy kept by its first 16 of 64 dims, ×1e6 in exact
    // integer arithmetic over ×1e6-quantized components (the
    // emb_quantize_error discipline), averaged per label. Pure codegen
    // scan + one tiny agg — no shuffle before the label groupBy.
    "emb_truncate_error" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000) as bigint))").as("q"))
        .withColumn("e_full", expr("aggregate(q, cast(0 as bigint), (a, x) -> a + x * x)"))
        .withColumn("e_head", expr("aggregate(slice(q, 1, 16), cast(0 as bigint), (a, x) -> a + x * x)"))
        .filter(col("e_full") > 0)
        .withColumn("kept_x1e6", expr(
          "cast(cast(e_head as decimal(38,0)) * 1000000 div cast(e_full as decimal(38,0)) as bigint)"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          expr("sum(kept_x1e6) div count(1)").cast("long").as("avg_kept_x1e6"))
        .orderBy("label"),
      Some(
        """WITH v AS (SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
          |    x -> CAST(floor(x * 1000000) AS BIGINT)) AS q FROM embeddings),
          |e AS (SELECT label,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(q, x -> x * x)), (a, b) -> a + b) AS e_full,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(q[1:16], x -> x * x)), (a, b) -> a + b) AS e_head
          |  FROM v),
          |k AS (SELECT label,
          |    CAST(CAST(e_head AS HUGEINT) * 1000000 // CAST(e_full AS HUGEINT) AS BIGINT) AS kept_x1e6
          |  FROM e WHERE e_full > 0)
          |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
          |  CAST(sum(CAST(kept_x1e6 AS HUGEINT)) // count(*) AS BIGINT) AS avg_kept_x1e6
          |FROM k GROUP BY label ORDER BY label""".stripMargin)),

    // Heavy hitters by a mergeable Misra-Gries sketch with exact
    // recount (functions/MisraGries.scala): the sketch pass is one
    // map-side-combined aggregation whose shuffle payload is a
    // ≤2·cap-entry map per partition — the token MASS never shuffles —
    // and nominates a candidate superset (guarantee: any token with
    // freq > n/cap survives, since the tracked undercount dec ≤
    // n/(cap+1)). The recount then filters the stream against the
    // broadcast candidates and thresholds on EXACT counts, so the
    // output is the deterministic set {freq·cap > n} — sketch
    // nondeterminism is filtered out and the oracle is a plain HAVING.
    "agg_heavy_hitters" -> Q(
      (s, d) => {
        val cap = 512
        val toks = Tables.documents(s, d)
          .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val sketch = toks.agg(count(lit(1)).as("n"),
          graft.functions.MisraGries.candidates(col("w"), cap).as("cand"))
        val cands = sketch.select(col("n"), explode(col("cand")).as("w"))
        toks.join(broadcast(cands), "w")
          .groupBy("w", "n").agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") * cap > col("n"))
          .select(col("w"), col("n_occ").cast("long").as("n_occ"))
          .orderBy(desc("n_occ"), asc("w"))
      },
      Some(
        """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |            FROM documents),
          |t AS (SELECT w FROM tok WHERE w <> ''),
          |n AS (SELECT count(*) AS n FROM t)
          |SELECT w, count(*) AS n_occ
          |FROM t CROSS JOIN n GROUP BY w, n.n HAVING count(*) * 512 > n.n
          |ORDER BY n_occ DESC, w""".stripMargin)),

    // Exact two-sample Kolmogorov-Smirnov statistic between the
    // quantity distributions of returned (A) vs refused (R) lineitems:
    // KS = max |F_A − F_R| computed as integers — per-value counts, a
    // cumulative window over the DISTINCT-VALUE frame (the only
    // SinglePartition window, bounded by the value domain ≤ 50 rows,
    // not the corpus — for continuous domains the KLL-binned variant is
    // the declared path, the winsorize_fast discipline), and the
    // deviation cross-multiplied (|cumA·nR − cumR·nA|) in DECIMAL so no
    // rational ever rounds before the final ×1e6 floor.
    "stats_ks_flags" -> Q(
      (s, d) => graft.ops.Stats.ksExact(
        Tables.lineitem(s, d)
          .select(col("l_quantity").cast("long").as("qty"), col("l_returnflag").as("fl")),
        "qty", "fl", "A", "R", atName = "at_qty"),
      Some(
        """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS fl
          |            FROM lineitem WHERE l_returnflag IN ('A', 'R')),
          |c AS (SELECT qty,
          |    sum(CASE WHEN fl = 'A' THEN 1 ELSE 0 END) AS ca,
          |    sum(CASE WHEN fl = 'R' THEN 1 ELSE 0 END) AS cb
          |  FROM li GROUP BY 1),
          |cum AS (SELECT qty,
          |    sum(ca) OVER (ORDER BY qty) AS cuma,
          |    sum(cb) OVER (ORDER BY qty) AS cumb,
          |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
          |  FROM c),
          |dv AS (SELECT qty, na, nb,
          |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) AS dev
          |  FROM cum)
          |SELECT qty AS at_qty, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
          |  CAST(dev * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_x1e6
          |FROM dv ORDER BY dev DESC, qty LIMIT 1""".stripMargin)),

    // The same exact KS over a CONTINUOUS money metric: event values in
    // cents between click and purchase events. The distinct-cents frame
    // is bounded by the VALUE DOMAIN (≤ ~49k cents on this corpus, and
    // by the metric's range in general) — at a domain where even cents
    // stop being enumerable, stats_ks_values_fast's sketch-binned form
    // is the declared path.
    "stats_ks_values" -> Q(
      (s, d) => graft.ops.Stats.ksExact(
        Tables.events(s, d)
          .select(floor(col("value") * 100).cast("long").as("vc"),
            col("event_type").as("fl")),
        "vc", "fl", "click", "purchase", atName = "at_cents"),
      Some(
        """WITH ev AS (SELECT CAST(floor(value * 100) AS BIGINT) AS vc, event_type AS fl
          |            FROM events WHERE event_type IN ('click', 'purchase')),
          |c AS (SELECT vc,
          |    sum(CASE WHEN fl = 'click' THEN 1 ELSE 0 END) AS ca,
          |    sum(CASE WHEN fl = 'purchase' THEN 1 ELSE 0 END) AS cb
          |  FROM ev GROUP BY 1),
          |cum AS (SELECT vc,
          |    sum(ca) OVER (ORDER BY vc) AS cuma,
          |    sum(cb) OVER (ORDER BY vc) AS cumb,
          |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
          |  FROM c),
          |dv AS (SELECT vc, na, nb,
          |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) AS dev
          |  FROM cum)
          |SELECT vc AS at_cents, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
          |  CAST(dev * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_x1e6
          |FROM dv ORDER BY dev DESC, vc LIMIT 1""".stripMargin)),

    // Sketch-binned KS — the unbounded-domain escape hatch for the two
    // exact KS queries above: ECDFs evaluated exactly at 64 equal-width
    // integer grid cut points over the exact [min, max] (round-11,
    // verdict ask #6: the cut points were a percentile_approx GK
    // sketch, engine-internal and rows-only; the exact-integer grid
    // replays in DuckDB, so this now hash-gates). Bin assignment is one
    // integer multiply-divide per row, the cumulative window runs over
    // ≤64 rows. Still a lower bound of the exact statistic with gap
    // bounded by the largest inter-edge mass; accuracy vs the exact
    // twin stays gated in StatsSketchSpec.
    "stats_ks_values_fast" -> Q(
      (s, d) => graft.ops.Stats.ksBinned(
        Tables.events(s, d)
          .select(floor(col("value") * 100).cast("long").as("vc"),
            col("event_type").as("fl")),
        "vc", "fl", "click", "purchase", nBins = 64),
      Some(
        """WITH ev AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v, event_type AS fl
          |            FROM events WHERE event_type IN ('click', 'purchase')),
          |ext AS (SELECT min(v) AS mn, max(v) AS mx FROM ev),
          |b AS (SELECT CASE WHEN mx = mn THEN 0 ELSE ((v - mn) * 64) // (mx - mn + 1) END AS bin,
          |        sum(CASE WHEN fl = 'click' THEN 1 ELSE 0 END) AS ca,
          |        sum(CASE WHEN fl = 'purchase' THEN 1 ELSE 0 END) AS cb
          |      FROM ev, ext GROUP BY 1),
          |cum AS (SELECT bin,
          |    sum(ca) OVER (ORDER BY bin) AS cuma, sum(cb) OVER (ORDER BY bin) AS cumb,
          |    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
          |  FROM b),
          |dv AS (SELECT bin, na, nb,
          |    abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) AS dev
          |  FROM cum)
          |SELECT CAST(bin AS BIGINT) AS at_bin, CAST(na AS BIGINT) AS n_a,
          |  CAST(nb AS BIGINT) AS n_b,
          |  CAST(dev * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_x1e6
          |FROM dv ORDER BY dev DESC, bin LIMIT 1""".stripMargin)),

    // Hybrid retrieval by reciprocal-rank fusion (Cormack et al. SIGIR
    // 2009): the lexical BM25 top-100 and the dense cosine top-100
    // (query vector vec_id=0 over the shared corpus id space) fused by
    // RRF(d) = Σ_lists 1e6 div (60 + rank) — integer-exact, so the
    // fusion is hash-gated end-to-end. Each list carries its own scale
    // story (BM25's term-filtered tf shuffle; brute-force cosine's
    // broadcast-bounded scoring with the LSH/IVF variants as the
    // corpus-scale path); the fusion itself joins two ≤100-row ranked
    // frames — driver-trivial at any corpus size.
    "search_hybrid_rrf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lex = graft.ops.TextOps.bm25TopK(
            Tables.documents(s, d), terms = Seq("spark", "join", "vector"), k = 100)
          .withColumn("rank_lex", row_number().over(
            Window.orderBy(desc("bm25"), asc("doc_id"))))
          .select("doc_id", "rank_lex")
        val den = graft.ops.Similarity.bruteForceTopK(
            Tables.embeddings(s, d), queryIds = Seq(0L), k = 100)
          .select(col("vec_id").as("doc_id"), col("rank").as("rank_dense"))
        lex.join(den, Seq("doc_id"), "full_outer")
          .withColumn("rrf_x1e6",
            coalesce(expr("1000000L div (60 + rank_lex)"), lit(0L))
              + coalesce(expr("1000000L div (60 + rank_dense)"), lit(0L)))
          .orderBy(desc("rrf_x1e6"), asc("doc_id")).limit(20)
          // rank 0 = "not in this list": NULL BIGINTs degrade to float64
          // in the driver's pandas reading, so the sentinel keeps both
          // engines integral (the compare-protocol convention)
          .select(col("doc_id"),
            coalesce(col("rank_lex").cast("long"), lit(0L)).as("rank_lex"),
            coalesce(col("rank_dense").cast("long"), lit(0L)).as("rank_dense"),
            col("rrf_x1e6").cast("long").as("rrf_x1e6"))
      },
      Some(TextSql.hybridRrf(Seq("spark", "join", "vector"),
        queryVec = 0L, listK = 100, k = 20))),

    // Benford first-digit conformance of order totals — the
    // sanity/fraud screen over a money column. The leading digit is
    // taken from floor(price) as a string (identical IEEE floor + int
    // formatting on both engines; no cents scaling needed), the
    // expected Benford shares log10(1+1/d) enter as ×1e6 integer
    // constants on BOTH sides, and everything after the 9-row groupBy
    // is arithmetic. Pure codegen scan, scale-perfect.
    "stats_benford" -> Q(
      (s, d) => {
        val benford = "map(1,301029, 2,176091, 3,124938, 4,96910, 5,79181," +
          " 6,66946, 7,57991, 8,51152, 9,45757)"
        val digits = Tables.orders(s, d)
          .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
            .cast("long").as("digit"))
        val tot = digits.agg(count(lit(1)).as("total"))
        digits.groupBy("digit").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .withColumn("share_x1e6", expr("n * 1000000L div total").cast("long"))
          .withColumn("benford_x1e6", expr(s"element_at($benford, cast(digit as int))").cast("long"))
          .select(col("digit"), col("n"), col("share_x1e6"), col("benford_x1e6"),
            (col("share_x1e6") - col("benford_x1e6")).cast("long").as("dev_x1e6"))
          .orderBy("digit")
      },
      Some(
        """WITH dg AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          |            FROM orders),
          |t AS (SELECT count(*) AS total FROM dg),
          |c AS (SELECT digit, count(*) AS n FROM dg GROUP BY 1),
          |b AS (SELECT digit, n,
          |    CAST(n * 1000000 // total AS BIGINT) AS share_x1e6,
          |    CAST(CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
          |      WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
          |      WHEN 7 THEN 57991 WHEN 8 THEN 51152 WHEN 9 THEN 45757 END AS BIGINT) AS benford_x1e6
          |  FROM c CROSS JOIN t)
          |SELECT digit, n, share_x1e6, benford_x1e6,
          |  CAST(share_x1e6 - benford_x1e6 AS BIGINT) AS dev_x1e6
          |FROM b ORDER BY digit""".stripMargin)),

    // Gini coefficient of per-customer revenue, exact, WITHOUT a global
    // sort: ranking uses ops/Stats.bucketedRank — range-bucket on the
    // value, rank inside buckets with a partitioned window, shift by
    // offsets from the tiny occupied-bucket frame (the
    // pipeline_shard_budget two-phase prefix-sum discipline). The
    // oracle's row_number() OVER (ORDER BY rev, cust) is exactly what
    // the two-phase rank reproduces; the statistic is the classic
    // 2·Σrank·x formula in DECIMAL ×1e6.
    "stats_gini_customers" -> Q(
      (s, d) => {
        val rev = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("cust"))
          .agg(sum(expr("cast(floor(o_totalprice) as bigint)")).as("rev"))
        val ranked = graft.ops.Stats.bucketedRank(rev, "rev", "cust",
          bucketWidth = 1L << 22)
        graft.ops.Stats.giniX1e6(ranked, "rev")
      },
      Some(
        """WITH r AS (SELECT o_custkey AS cust,
          |    sum(CAST(floor(o_totalprice) AS BIGINT)) AS rev
          |  FROM orders GROUP BY 1),
          |rk AS (SELECT rev, row_number() OVER (ORDER BY rev, cust) AS rnk FROM r)
          |SELECT count(*) AS n_entities,
          |  CAST(sum(rev) AS BIGINT) AS total_value,
          |  CAST((2 * sum(CAST(rnk AS HUGEINT) * rev)
          |        - (count(*) + 1) * sum(CAST(rev AS HUGEINT))) * 1000000
          |       // (count(*) * sum(CAST(rev AS HUGEINT))) AS BIGINT) AS gini_x1e6
          |FROM rk""".stripMargin)),

    // SCD Type-2 dimension build from the event log: per user, collapse
    // consecutive same-state events (state = event_type), open a
    // validity interval at each change, close it at the next change
    // (lead) — the slowly-changing-dimension twin of events_cdc_latest
    // (which keeps only the last state). Census per state: interval
    // counts, open intervals, exact integer duration stats. Both
    // windows are partitioned by user_id — no global sort at any scale.
    "events_scd2_intervals" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val chg = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        chg
          .withColumn("valid_to", lead("ts", 1).over(w))
          .withColumn("dur_s", expr(
            "(unix_micros(valid_to) - unix_micros(ts)) div 1000000"))
          .groupBy(col("event_type").as("state"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(when(col("valid_to").isNull, 1L).otherwise(0L)).cast("long").as("n_open"),
            expr("sum(dur_s) div nullif(count(dur_s), 0)").cast("long").as("avg_dur_s"),
            max("dur_s").cast("long").as("max_dur_s"))
          .orderBy("state")
      },
      Some(
        """WITH chg AS (
          |  SELECT * FROM (
          |    SELECT user_id, event_id, ts, event_type,
          |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |    FROM events)
          |  WHERE prev IS NULL OR prev <> event_type),
          |iv AS (SELECT event_type AS state, ts,
          |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          |  FROM chg),
          |dur AS (SELECT state, valid_to,
          |    CAST(epoch_us(valid_to) - epoch_us(ts) AS BIGINT) // 1000000 AS dur_s
          |  FROM iv)
          |SELECT state, count(*) AS n_intervals,
          |  CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
          |  CAST(sum(dur_s) // nullif(count(dur_s), 0) AS BIGINT) AS avg_dur_s,
          |  CAST(max(dur_s) AS BIGINT) AS max_dur_s
          |FROM dur GROUP BY state ORDER BY state""".stripMargin)),

    // Weighted single-source shortest paths (Bellman-Ford, 5 declared
    // relaxation rounds — exact for ≤5-hop paths, fixpoint pinned by
    // the spec) over the support-pruned co-order graph; edge cost
    // 1e6 div support. The oracle is the mechanical round unroll with
    // MATERIALIZED CTEs (the graph_kcore discipline).
    "graph_sssp_weighted" -> Q(
      (s, d) => graft.ops.Basket.ssspWeighted(Tables.lineitem(s, d),
        rounds = 5, minSupport = 2, k = 20),
      Some {
        val base =
          """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_both
            |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
            |      GROUP BY 1, 2 HAVING count(*) >= 2),
            |e AS MATERIALIZED (
            |  SELECT pa AS src, pb AS dst, 1000000 // n_both AS w FROM e0
            |  UNION ALL SELECT pb, pa, 1000000 // n_both FROM e0),
            |d0 AS (SELECT src AS node, CAST(0 AS BIGINT) AS dist FROM e
            |       GROUP BY src ORDER BY count(*) DESC, src LIMIT 1)""".stripMargin
        val rounds = (1 to 5).map { i =>
          s"""d$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM d${i - 1}
             |  UNION ALL
             |  SELECT e.dst AS node, d.dist + e.w AS dist
             |  FROM d${i - 1} d JOIN e ON e.src = d.node)
             |  GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""$base,
           |$rounds
           |SELECT node, CAST(dist AS BIGINT) AS dist FROM d5
           |ORDER BY dist, node LIMIT 20""".stripMargin
      }),

    // Z-order (Morton) clustering readout — the Delta/Iceberg OPTIMIZE
    // ZORDER effectiveness report: interleave the low 10 bits of
    // customer key and order-day (10+10 keeps the interleave inside the
    // OCCUPIED domain at every SF — a 16-bit prefix left the top curve
    // bits constant and every row in one bucket), split the curve into
    // 32 leading-bit buckets ("files"), and report each bucket's
    // per-dimension min/max envelope — the zone-map ranges a reader
    // would prune on. Both dimensions stay narrow per bucket (vs a
    // date-sorted layout where custkey spans its full range in every
    // file). Pure codegen bit arithmetic + a 32-row groupBy;
    // scale-perfect.
    "lakehouse_zorder_stats" -> Q(
      (s, d) => {
        val z = (0 until 10).map(i =>
          s"(shiftleft((ck >> $i) & 1, ${2 * i}) + shiftleft((dy >> $i) & 1, ${2 * i + 1}))")
          .mkString(" + ")
        Tables.orders(s, d)
          .select(pmod(col("o_custkey"), lit(1024)).cast("long").as("ck"),
            pmod(datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")),
              lit(1024)).cast("long").as("dy"))
          .withColumn("z", expr(z))
          .withColumn("zbucket", expr("z >> 15").cast("long"))
          .groupBy("zbucket").agg(count(lit(1)).as("n"),
            min("ck").as("ck_min"), max("ck").as("ck_max"),
            min("dy").as("dy_min"), max("dy").as("dy_max"))
          .orderBy("zbucket")
      },
      Some {
        val z = (0 until 10).map(i =>
          s"((((ck >> $i) & 1) << ${2 * i}) + (((dy >> $i) & 1) << ${2 * i + 1}))")
          .mkString(" + ")
        s"""WITH b AS (SELECT CAST(o_custkey % 1024 AS BIGINT) AS ck,
           |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS dy
           |  FROM orders),
           |z AS (SELECT ck, dy, $z AS z FROM b)
           |SELECT CAST(z >> 15 AS BIGINT) AS zbucket, count(*) AS n,
           |  min(ck) AS ck_min, max(ck) AS ck_max,
           |  min(dy) AS dy_min, max(dy) AS dy_max
           |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
      }),

    // Nearest-click as-of join with a ±30-minute tolerance — the
    // bidirectional sibling of join_asof_last_click: each purchase
    // takes the temporally closest click within tolerance (backward
    // wins exact ties). Backward and forward candidates come from two
    // user-partitioned window passes (at same-ts the click sorts first,
    // so the backward pass sees it — dt 0), so there is never a range
    // join or per-row scan; the oracle's LATERAL probe is test-scale
    // only.
    "join_asof_nearest" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tolUs = 1800L * 1000000L
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val ord = when(col("event_type") === "click", 0).otherwise(1)
        val wb = Window.partitionBy("user_id").orderBy(col("ts"), ord)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wf = Window.partitionBy("user_id").orderBy(col("ts"), ord)
          .rowsBetween(0, Window.unboundedFollowing)
        val clickTs = when(col("event_type") === "click", col("ts"))
        ev.withColumn("back", last(clickTs, ignoreNulls = true).over(wb))
          .withColumn("fwd", first(clickTs, ignoreNulls = true).over(wf))
          .filter(col("event_type") === "purchase")
          .withColumn("db", unix_micros(col("ts")) - unix_micros(col("back")))
          .withColumn("df", unix_micros(col("fwd")) - unix_micros(col("ts")))
          .withColumn("click_ts",
            when(col("back").isNotNull && col("db") <= tolUs
                && (col("fwd").isNull || col("df") > tolUs || col("db") <= col("df")),
              col("back"))
            .when(col("fwd").isNotNull && col("df") <= tolUs, col("fwd")))
          .select("user_id", "event_id", "ts", "click_ts")
          .orderBy("event_id")
      },
      Some(
        """WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
          |p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
          |SELECT p.user_id, p.event_id, p.ts, n.ts AS click_ts
          |FROM p LEFT JOIN LATERAL (
          |  SELECT c.ts FROM clicks c
          |  WHERE c.user_id = p.user_id
          |    AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 1800000000
          |  ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts LIMIT 1
          |) n ON TRUE
          |ORDER BY p.event_id""".stripMargin)),

    // Exact join-cardinality forecast — the planner diagnostic that
    // prices a fact-fact shuffle BEFORE running it: per-key counts on
    // each side, matched-key fanout products, and their sum (= the
    // exact inner-join row count), max, and mean. Complements
    // stats_key_skew (which prices the shuffle buckets); two
    // partial-agg'd counts + one keyed join of count frames, no window.
    "stats_join_fanout" -> Q(
      (s, d) => {
        val a = Tables.orders(s, d)
          .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("ca"))
        val b = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cb"))
        a.join(b, "k")
          .select((col("ca") * col("cb")).as("prod"))
          .agg(count(lit(1)).as("n_matched_keys"),
            sum("prod").cast("long").as("join_rows"),
            max("prod").cast("long").as("max_key_product"),
            expr("sum(prod) * 1000000L div count(1)").cast("long").as("mean_product_x1e6"))
      },
      Some(
        """WITH a AS (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1),
          |b AS (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1),
          |j AS (SELECT ca * cb AS prod FROM a JOIN b USING (k))
          |SELECT count(*) AS n_matched_keys,
          |  CAST(sum(prod) AS BIGINT) AS join_rows,
          |  CAST(max(prod) AS BIGINT) AS max_key_product,
          |  CAST(sum(prod) * 1000000 // count(*) AS BIGINT) AS mean_product_x1e6
          |FROM j""".stripMargin)),

    // Embedding-space decontamination — the semantic member of the
    // exact/fuzzy/semantic trio (pipeline_decontaminate catches verbatim
    // n-gram overlap, _fuzzy catches paraphrase via MinHash bands, this
    // catches re-encodings that share no surface form): corpus vectors
    // scoring cos ≥ 0.95 against ANY benchmark vector (vec_id < 50) are
    // flagged with their best match. Fixture: vec_id < 20 re-appended
    // under 800000+id scaled ×0.97 (cos 1.0 — same direction; scaling
    // in DOUBLE so both engines replay it bit-for-bit, the
    // dedup_pq_codes discipline); the real cross-slice max on this
    // corpus is 0.49, so the flags are exactly the plants. The
    // benchmark side BROADCASTS (real benchmarks are small); past that
    // ceiling the sign-LSH bucket join (dedup_embedding's chain) is the
    // declared escalation.
    "pipeline_decontaminate_semantic" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        val planted = base.filter(col("vec_id") < 20)
          .select((col("vec_id") + 800000L).as("vec_id"),
            transform(col("e"), x => x * lit(0.97)).as("e"))
        val bench = base.filter(col("vec_id") < 50)
          .select(col("vec_id").as("bench_id"), col("e").as("be"))
        val corpus = base.filter(col("vec_id") >= 50).unionByName(planted)
        val dot = graft.ops.Similarity.dot _
        val scored = corpus.crossJoin(broadcast(bench))
          .withColumn("cos", round(dot(col("e"), col("be"))
            / (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("be"), col("be")))), 6))
          .filter(col("cos") >= 0.95)
        scored.withColumn("rn", row_number().over(
            Window.partitionBy("vec_id").orderBy(desc("cos"), asc("bench_id"))))
          .filter(col("rn") === 1)
          .select("vec_id", "bench_id", "cos")
          .orderBy("vec_id")
      },
      Some(
        """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |planted AS (SELECT vec_id + 800000 AS vec_id,
          |    list_transform(e, x -> x * 0.97) AS e
          |  FROM base WHERE vec_id < 20),
          |bench AS (SELECT vec_id AS bench_id, e AS be FROM base WHERE vec_id < 50),
          |corpus AS (SELECT vec_id, e FROM base WHERE vec_id >= 50
          |  UNION ALL SELECT vec_id, e FROM planted),
          |scored AS (
          |  SELECT c.vec_id, b.bench_id,
          |    round(list_dot_product(e, be)
          |      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(be, be))), 6) AS cos
          |  FROM corpus c CROSS JOIN bench b),
          |fl AS (SELECT vec_id, bench_id, cos,
          |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
          |  FROM scored WHERE cos >= 0.95)
          |SELECT vec_id, bench_id, cos FROM fl WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // Corpus drift detection: terms rising between the early and late
    // document halves (split at the midpoint of the id range — the
    // stand-in for ingestion time), add-one-smoothed ratio ×1e6 in
    // exact integer arithmetic, minimum late support 20. The trending
    // readout a continuously-ingesting pipeline alerts on. One token
    // scan with conditional sums — no second pass, no window.
    "text_trending_terms" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val mx = docs.agg(max("doc_id").as("mx"))
        docs.crossJoin(broadcast(mx))
          .select(col("doc_id"), col("mx"),
            explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(
            sum(when(col("doc_id") * 2 <= col("mx"), 1L).otherwise(0L)).as("c_early"),
            sum(when(col("doc_id") * 2 > col("mx"), 1L).otherwise(0L)).as("c_late"))
          .filter(col("c_late") >= 20)
          .withColumn("rise_x1e6", expr("(c_late + 1) * 1000000L div (c_early + 1)"))
          .select(col("w"), col("c_early").cast("long").as("c_early"),
            col("c_late").cast("long").as("c_late"),
            col("rise_x1e6").cast("long").as("rise_x1e6"))
          .orderBy(desc("rise_x1e6"), asc("w")).limit(20)
      },
      Some(
        """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
          |tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |        FROM documents),
          |c AS (SELECT w,
          |    sum(CASE WHEN doc_id * 2 <= mx THEN 1 ELSE 0 END) AS c_early,
          |    sum(CASE WHEN doc_id * 2 > mx THEN 1 ELSE 0 END) AS c_late
          |  FROM tok CROSS JOIN mx WHERE w <> '' GROUP BY w)
          |SELECT w, CAST(c_early AS BIGINT) AS c_early, CAST(c_late AS BIGINT) AS c_late,
          |  CAST((c_late + 1) * 1000000 // (c_early + 1) AS BIGINT) AS rise_x1e6
          |FROM c WHERE c_late >= 20
          |ORDER BY rise_x1e6 DESC, w LIMIT 20""".stripMargin)),

    // Per-type volume trend: least-squares slope of hourly event counts
    // over the hour index (hours since the global min hour). All four
    // sums are exact integers (DECIMAL, < 2^53 at any plausible scale),
    // so the final slope division is the only float op — identical
    // IEEE double division + round on both engines (the bm25
    // discipline). Hourly pre-agg collapses the corpus; the per-type
    // regression runs on (type, hour) rows.
    "events_trend_slope" -> Q(
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        val minh = hourly.agg(min("hr").as("mnh"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        hourly.crossJoin(broadcast(minh))
          .withColumn("t", expr("(unix_micros(hr) - unix_micros(mnh)) div 3600000000"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("k"),
            sum(dec(col("t"))).as("st"),
            sum(dec(col("n"))).as("sn"),
            sum(dec(col("t")) * dec(col("n"))).as("stn"),
            sum(dec(col("t")) * dec(col("t"))).as("stt"))
          .select(col("event_type"), col("k").cast("long").as("n_hours"),
            round((dec(col("k")) * col("stn") - col("st") * col("sn")).cast("double")
              / (dec(col("k")) * col("stt") - col("st") * col("st")).cast("double"),
              6).as("slope_per_hour"))
          .orderBy("event_type")
      },
      Some(
        """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
          |               FROM events GROUP BY 1, 2),
          |mn AS (SELECT min(hr) AS mnh FROM hourly),
          |t AS (SELECT event_type,
          |    (epoch_us(hr) - epoch_us(mnh)) // 3600000000 AS t, n
          |  FROM hourly CROSS JOIN mn),
          |s AS (SELECT event_type, count(*) AS k,
          |    sum(CAST(t AS HUGEINT)) AS st, sum(CAST(n AS HUGEINT)) AS sn,
          |    sum(CAST(t AS HUGEINT) * n) AS stn, sum(CAST(t AS HUGEINT) * t) AS stt
          |  FROM t GROUP BY 1)
          |SELECT event_type, CAST(k AS BIGINT) AS n_hours,
          |  round(CAST(k * stn - st * sn AS DOUBLE)
          |        / CAST(k * stt - st * st AS DOUBLE), 6) AS slope_per_hour
          |FROM s ORDER BY event_type""".stripMargin)),

    // Neyman-optimal stratified sampling allocation: a 10k-doc budget
    // split across sources ∝ N_i·σ_i of the char-length metric. The
    // identity N·σ = sqrt(N·Σx² − (Σx)²) keeps everything under the
    // sqrt an EXACT integer (no mean, no float variance), the sqrt and
    // the ×1e3 floor quantization are the pipeline_temperature_mix
    // discipline, and the final allocation is integer floor division —
    // the whole plan is one groupBy over the corpus plus arithmetic on
    // the |sources|-row frame.
    "sample_neyman_alloc" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(dec(col("n_chars"))).as("sx"),
            sum(dec(col("n_chars")) * dec(col("n_chars"))).as("sxx"))
          .withColumn("w", floor(sqrt(
            (dec(col("n_docs")) * col("sxx") - col("sx") * col("sx")).cast("double"))
            * 1e3).cast("long"))
          .withColumn("tw", sum("w").over(Window.partitionBy()))
          .select(col("source"), col("n_docs").cast("long").as("n_docs"),
            col("w").as("nsigma_x1e3"),
            expr("CAST((CAST(w AS DECIMAL(38,0)) * 10000) div CAST(tw AS DECIMAL(38,0)) AS BIGINT)")
              .as("alloc"))
          .orderBy("source")
      },
      Some(
        """WITH s AS (SELECT source, count(*) AS n_docs,
          |    sum(CAST(n_chars AS HUGEINT)) AS sx,
          |    sum(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
          |  FROM documents GROUP BY 1),
          |w AS (SELECT source, n_docs,
          |    CAST(floor(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) * 1e3) AS BIGINT) AS w
          |  FROM s),
          |t AS (SELECT sum(w) AS tw FROM w)
          |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, w AS nsigma_x1e3,
          |  CAST(CAST(w AS HUGEINT) * 10000 // tw AS BIGINT) AS alloc
          |FROM w CROSS JOIN t ORDER BY source""".stripMargin)),

    // Link prediction on the co-order graph: non-adjacent part pairs
    // ranked by common-neighbor Jaccard ("bought with the same things,
    // never together" — the recommendation candidate generator).
    // Candidates only from wedges (keyed neighbor-list self-join, Σdeg²
    // bounded by the support prune), existing edges anti-joined away,
    // exact integer Jaccard.
    "graph_link_prediction" -> Q(
      (s, d) => graft.ops.Basket.linkPrediction(Tables.lineitem(s, d),
        minSupport = 2, k = 20),
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |n AS (SELECT pa AS b, pb AS x FROM e UNION ALL SELECT pb, pa FROM e),
          |deg AS (SELECT x, count(*) AS deg FROM n GROUP BY 1),
          |cm AS (SELECT n1.x AS a, n2.x AS c, count(*) AS common
          |       FROM n n1 JOIN n n2 ON n2.b = n1.b AND n1.x < n2.x
          |       GROUP BY 1, 2),
          |ne AS (SELECT cm.* FROM cm
          |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = cm.a AND e.pb = cm.c))
          |SELECT ne.a, ne.c, CAST(common AS BIGINT) AS common,
          |  CAST(common * 1000000 // (da.deg + dc.deg - common) AS BIGINT) AS jaccard_x1e6
          |FROM ne JOIN deg da ON da.x = ne.a JOIN deg dc ON dc.x = ne.c
          |ORDER BY jaccard_x1e6 DESC, common DESC, a, c LIMIT 20""".stripMargin)),

    // CUSUM changepoint detection over the hourly volume series per
    // event type — the classic mean-shift monitor a pipeline runs over
    // ingest telemetry. S_i = Σ_{j≤i}(x_j − μ) is kept EXACT by scaling
    // ×n: s_xn_i = n·prefix_i − i·total (BIGINT; hours ≤ 1e4 × corpus
    // counts ≤ 1e12 stays far under 2^63). The hourly pre-agg collapses
    // the corpus; the windows run per-type over span-bounded partitions
    // (≤ #hours rows). Reported changepoint = argmax |S|, earliest hour
    // on ties.
    "events_changepoint_cusum" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy("event_type").orderBy("hr")
        val pre = hourly
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("pfx", sum("x").over(w))
        val tot = hourly.groupBy("event_type")
          .agg(sum("x").as("total"), count(lit(1)).as("n_hours"))
        val sn = pre.join(broadcast(tot), "event_type")
          .withColumn("abs_s",
            abs(col("n_hours") * col("pfx") - col("i") * col("total")))
        val pick = Window.partitionBy("event_type")
          .orderBy(col("abs_s").desc, col("hr"))
        sn.withColumn("rk", row_number().over(pick)).filter(col("rk") === 1)
          .select(col("event_type"),
            col("n_hours").cast("long").as("n_hours"),
            col("total").cast("long").as("total"),
            date_format(col("hr"), "yyyy-MM-dd HH:00:00").as("cp_hour"),
            col("abs_s").cast("long").as("s_abs_max_xn"))
          .orderBy("event_type")
      },
      Some(
        """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS x
          |               FROM events GROUP BY 1, 2),
          |tot AS (SELECT event_type, sum(x) AS total, count(*) AS n_hours
          |        FROM hourly GROUP BY 1),
          |pre AS (SELECT event_type, hr,
          |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT) AS i,
          |    sum(x) OVER (PARTITION BY event_type ORDER BY hr) AS pfx
          |  FROM hourly),
          |s AS (SELECT p.event_type, p.hr, t.n_hours, t.total,
          |    abs(t.n_hours * p.pfx - p.i * t.total) AS abs_s
          |  FROM pre p JOIN tot t USING (event_type))
          |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
          |  CAST(total AS BIGINT) AS total,
          |  strftime(hr, '%Y-%m-%d %H:00:00') AS cp_hour,
          |  CAST(abs_s AS BIGINT) AS s_abs_max_xn
          |FROM s
          |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY abs_s DESC, hr) = 1
          |ORDER BY event_type""".stripMargin)),

    // Theil–Sen robust trend slope per event type — the median of all
    // pairwise hourly slopes, the outlier-proof twin of
    // events_trend_slope's OLS. The hourly pre-agg collapses the corpus
    // first, so the pair self-join is O(span_hours²) per type —
    // CORPUS-INDEPENDENT (the 30-day span is ~720 hours at every SF;
    // for year-long spans, pre-bucket hours to days first). Each slope
    // is ONE IEEE double division (exactly rounded, engine-invariant),
    // the median is the deterministic lower median by (slope, t1, t2)
    // order.
    "events_theilsen_slope" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        val minh = hourly.agg(min("hr").as("mnh"))
        val t = hourly.crossJoin(broadcast(minh))
          .withColumn("t", expr("(unix_micros(hr) - unix_micros(mnh)) div 3600000000"))
          .select("event_type", "t", "n")
        val pairs = t.select(col("event_type"), col("t").as("t1"), col("n").as("n1"))
          .join(t.select(col("event_type"), col("t").as("t2"), col("n").as("n2")),
            "event_type")
          .filter(col("t1") < col("t2"))
          .withColumn("slope",
            (col("n2") - col("n1")).cast("double") / (col("t2") - col("t1")).cast("double"))
        val w = Window.partitionBy("event_type").orderBy("slope", "t1", "t2")
        pairs
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("event_type"), col("cnt").cast("long").as("n_pairs"),
            round(col("slope"), 6).as("theilsen_slope"))
          .orderBy("event_type")
      },
      Some(
        """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
          |               FROM events GROUP BY 1, 2),
          |mn AS (SELECT min(hr) AS mnh FROM hourly),
          |t AS (SELECT event_type,
          |    (epoch_us(hr) - epoch_us(mnh)) // 3600000000 AS t, n
          |  FROM hourly CROSS JOIN mn),
          |p AS (SELECT a.event_type, a.t AS t1, b.t AS t2,
          |    CAST(b.n - a.n AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
          |  FROM t a JOIN t b ON b.event_type = a.event_type AND a.t < b.t),
          |r AS (SELECT event_type, slope,
          |    row_number() OVER (PARTITION BY event_type ORDER BY slope, t1, t2) AS rn,
          |    count(*) OVER (PARTITION BY event_type) AS cnt
          |  FROM p)
          |SELECT event_type, CAST(cnt AS BIGINT) AS n_pairs,
          |  round(slope, 6) AS theilsen_slope
          |FROM r WHERE rn = (cnt + 1) // 2
          |ORDER BY event_type""".stripMargin)),

    // Skyline (Pareto frontier) of parts under (minimize price,
    // maximize size). The 2-D dominance test collapses to per-size
    // minima: a part survives iff it has the min price at its size AND
    // every strictly larger size is strictly more expensive — so the
    // whole operator is one groupBy to the ≤50-row size frame, a
    // suffix-min over that DOMAIN-BOUNDED frame, and a broadcast join
    // back (O(n) scan vs the oracle's O(n²) NOT EXISTS, which is
    // test-scale only). Prices in exact cents.
    "skyline_parts" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val parts = Tables.part(s, d).select(col("p_partkey"),
          col("p_size").cast("long").as("size"),
          expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("price_c"))
        val bySize = parts.groupBy("size").agg(min("price_c").as("mp"))
        val w = Window.orderBy(col("size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val sizes = bySize.withColumn("ms", min("mp").over(w))
        parts.join(broadcast(sizes), "size")
          .filter(col("price_c") === col("mp") &&
            (col("ms").isNull || col("ms") > col("price_c")))
          .select(col("p_partkey"), col("size"), col("price_c"))
          .orderBy("size", "p_partkey")
      },
      Some(
        """SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
          |  CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
          |FROM part p
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM part q
          |  WHERE CAST(floor(q.p_retailprice * 100 + 0.5) AS BIGINT)
          |          <= CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
          |    AND q.p_size >= p.p_size
          |    AND (CAST(floor(q.p_retailprice * 100 + 0.5) AS BIGINT)
          |           < CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
          |         OR q.p_size > p.p_size))
          |ORDER BY size, p_partkey""".stripMargin)),

    // k-anonymity / l-diversity audit over the customer table:
    // equivalence classes on the quasi-identifiers (nation, segment),
    // sensitive attribute = account-balance band. A class is at risk if
    // it has fewer than k=5 members (re-identifiable) or fewer than 2
    // distinct sensitive values (attribute disclosure). One groupBy to
    // the |nations|×|segments| frame — scale-perfect.
    "privacy_k_anonymity" -> Q(
      (s, d) => {
        val band = when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 4500, "mid").otherwise("high")
        Tables.customer(s, d)
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"),
            countDistinct(band).as("l_div"))
          .withColumn("at_risk",
            when(col("n") < 5 || col("l_div") < 2, 1L).otherwise(0L))
          .select(col("nation"), col("segment"), col("n"),
            col("l_div").cast("long").as("l_div"), col("at_risk"))
          .orderBy("nation", "segment")
      },
      Some(
        """SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
          |  count(*) AS n,
          |  CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
          |    WHEN c_acctbal < 4500 THEN 'mid' ELSE 'high' END) AS BIGINT) AS l_div,
          |  CASE WHEN count(*) < 5 OR count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
          |    WHEN c_acctbal < 4500 THEN 'mid' ELSE 'high' END) < 2
          |    THEN 1 ELSE 0 END AS at_risk
          |FROM customer GROUP BY 1, 2
          |ORDER BY nation, segment""".stripMargin)),

    // Interval-overlap join: SCD2 state-validity intervals (per-user
    // consecutive same-type collapse, open intervals capped at corpus
    // max ts) ⋈ the top-24 global peak hours by volume (deterministic
    // rank, ties by hour — non-vacuous at every SF, unlike a
    // mean-multiple threshold that empties out as the hourly series
    // flattens). The join is the scale-correct BIN-KEYED form:
    // intervals explode to covered DAYS (bounded by span), peak hours
    // key by their day — an equi-join, no range/theta join anywhere;
    // per-pair overlap is exact integer microseconds. The oracle's
    // range join is test-scale only.
    "join_interval_overlap" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val mx = ev.agg(max("ts").as("mxts"))
        val iv = ev.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("te0", lead("ts", 1).over(w))
          .crossJoin(broadcast(mx))
          .select(col("event_type").as("state"), col("ts").as("tb"),
            coalesce(col("te0"), col("mxts")).as("te"))
        val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        val pk = Window.orderBy(col("n").desc, col("h"))
        val peak = hourly.withColumn("rk", row_number().over(pk))
          .filter(col("rk") <= 24)
          .select(col("h"), to_date(col("h")).as("day"))
        val expanded = iv.withColumn("day",
          explode(expr("sequence(to_date(tb), to_date(te), interval 1 day)")))
        expanded.join(peak, "day")
          .withColumn("ov_us",
            greatest(lit(0L),
              least(unix_micros(col("te")), unix_micros(col("h") + expr("interval 1 hour")))
                - greatest(unix_micros(col("tb")), unix_micros(col("h")))))
          .filter(col("ov_us") > 0)
          .groupBy("state")
          .agg(count(lit(1)).as("n_pairs"), sum("ov_us").cast("long").as("overlap_us"))
          .orderBy("state")
      },
      Some(
        """WITH mx AS (SELECT max(ts) AS mxts FROM events),
          |chg AS (
          |  SELECT * FROM (
          |    SELECT user_id, event_id, ts, event_type,
          |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |    FROM events)
          |  WHERE prev IS NULL OR prev <> event_type),
          |iv AS (SELECT event_type AS state, ts AS tb,
          |    coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), mxts) AS te
          |  FROM chg CROSS JOIN mx),
          |hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
          |           FROM events GROUP BY 1),
          |peak AS (SELECT h FROM hourly
          |         QUALIFY row_number() OVER (ORDER BY n DESC, h) <= 24),
          |ov AS (SELECT state,
          |    greatest(0, epoch_us(least(te, h + INTERVAL 1 HOUR))
          |               - epoch_us(greatest(tb, h))) AS ov_us
          |  FROM iv JOIN peak ON peak.h < iv.te AND iv.tb < peak.h + INTERVAL 1 HOUR)
          |SELECT state, count(*) AS n_pairs, CAST(sum(ov_us) AS BIGINT) AS overlap_us
          |FROM ov WHERE ov_us > 0 GROUP BY 1 ORDER BY state""".stripMargin)),

    // Order-invariant table fingerprint — the Merkle-style integrity
    // check for verifying a 100 TB copy without moving or sorting data:
    // per-row 60-bit portable hash (md5 of the canonical '|'-joined
    // row string, money in exact cents), summed per 32-way hash bucket
    // mod the Mersenne prime 2^61−1 (DECIMAL(38,0) partial sums —
    // commutative/associative, so the whole check is one map-side
    // combinable agg; ROLLUP adds the whole-table row). Two tables
    // differing in any row disagree in exactly the buckets that cover
    // the difference — drill down by re-bucketing only those.
    "lakehouse_table_fingerprint" -> Q(
      (s, d) => {
        val rowStr = concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          col("o_orderpriority"))
        Tables.orders(s, d)
          .withColumn("rs", rowStr)
          .withColumn("h", expr(
            "CAST(conv(substring(md5(rs), 1, 15), 16, 10) AS BIGINT)"))
          .withColumn("bucket", pmod(col("h"), lit(32)).cast("long"))
          .rollup("bucket")
          .agg(count(lit(1)).as("n_rows"),
            expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT)")
              .as("fingerprint"))
          // whole-table row keyed -1, not NULL: a NULL group key turns
          // the column float64 under the driver's pandas reading
          .select(coalesce(col("bucket"), lit(-1L)).as("bucket"),
            col("n_rows"), col("fingerprint"))
          .orderBy("bucket")
      },
      Some {
        val h = GraphSql.md5Hash60(
          """o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
            |CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) || '|' ||
            |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|' || o_orderpriority""".stripMargin)
        s"""WITH r AS (SELECT $h AS h FROM orders),
           |b AS (SELECT h % 32 AS bucket, h FROM r)
           |SELECT CAST(coalesce(bucket, -1) AS BIGINT) AS bucket, count(*) AS n_rows,
           |  CAST(sum(CAST(h AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS fingerprint
           |FROM b GROUP BY ROLLUP(bucket)
           |ORDER BY bucket""".stripMargin
      }),

    // Local clustering-coefficient histogram on the support-pruned
    // co-order graph (see Basket.clusteringCoeff): per-node triangle
    // participation from undirected wedges, cc = 2·tri/(deg·(deg−1))
    // ×1e6 exact, 11 fixed buckets. The node-level frame never leaves
    // the cluster — the histogram is the O(1) readout.
    "graph_clustering_coeff" -> Q(
      (s, d) => graft.ops.Basket.clusteringCoeff(Tables.lineitem(s, d), minSupport = 2),
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |n AS (SELECT pa AS b, pb AS x FROM e UNION ALL SELECT pb, pa FROM e),
          |deg AS (SELECT b AS node, count(*) AS deg FROM n GROUP BY 1),
          |wed AS (SELECT n1.x AS a, n1.b AS b, n2.x AS c
          |        FROM n n1 JOIN n n2 ON n2.b = n1.b AND n1.x < n2.x),
          |tri AS (SELECT b AS node, count(*) AS tri FROM wed
          |        WHERE EXISTS (SELECT 1 FROM e WHERE e.pa = wed.a AND e.pb = wed.c)
          |        GROUP BY 1),
          |cc AS (SELECT d.node, coalesce(t.tri, 0) AS tri, d.deg,
          |    CAST(coalesce(t.tri, 0) AS HUGEINT) * 2000000
          |      // (CAST(d.deg AS HUGEINT) * (d.deg - 1)) AS cc_x1e6
          |  FROM deg d LEFT JOIN tri t ON t.node = d.node
          |  WHERE d.deg >= 2)
          |SELECT CAST(cc_x1e6 // 100000 AS BIGINT) AS cc_bucket,
          |  count(*) AS n_nodes,
          |  CAST(sum(cc_x1e6) AS BIGINT) AS sum_cc_x1e6
          |FROM cc GROUP BY 1 ORDER BY cc_bucket""".stripMargin)),

    // Population-stability-index drift of the doc-length distribution,
    // per source vs the whole corpus — the standard feature-drift
    // monitor. Fixed 20 buckets (n_chars div 256, capped), add-one
    // smoothing over the source × occupied-bucket GRID (two tiny
    // broadcast frames crossed, so zero-count cells participate). Each
    // PSI term is floored ×1e9 BEFORE the sum (per-term doubles are
    // engine-invariant IEEE; the integer sum is order-free), and the
    // exact-rational total-variation distance ×1e6 rides along as the
    // ln-free twin. One corpus groupBy + arithmetic on |sources|×20.
    "stats_psi_sources" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val docs = Tables.documents(s, d)
          .withColumn("b", least(expr("n_chars div 256"), lit(19L)))
        val cell = docs.groupBy("source", "b").agg(count(lit(1)).as("c"))
        val bySrc = docs.groupBy("source").agg(count(lit(1)).as("ns"))
        val byB = docs.groupBy("b").agg(count(lit(1)).as("qc"))
        val n = docs.agg(count(lit(1)).as("nn"))
        val grid = bySrc.crossJoin(broadcast(byB)).crossJoin(broadcast(n))
          .join(cell, Seq("source", "b"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("p", (col("c") + 1).cast("double") / (col("ns") + 20).cast("double"))
          .withColumn("q", (col("qc") + 1).cast("double") / (col("nn") + 20).cast("double"))
          .withColumn("term_x1e9",
            floor((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e9)).cast("long"))
          .withColumn("tvd_num",
            abs(dec((col("c") + 1)) * dec(col("nn") + 20) - dec(col("qc") + 1) * dec(col("ns") + 20)))
        grid.groupBy("source")
          .agg(max("ns").cast("long").as("n_docs"),
            sum("term_x1e9").cast("long").as("psi_x1e9"),
            expr("CAST((sum(tvd_num) * 1000000) div (CAST(max(ns) + 20 AS DECIMAL(38,0)) * (max(nn) + 20) * 2) AS BIGINT)")
              .as("tvd_x1e6"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (SELECT source, least(n_chars // 256, 19) AS b FROM documents),
          |cell AS (SELECT source, b, count(*) AS c FROM docs GROUP BY 1, 2),
          |bysrc AS (SELECT source, count(*) AS ns FROM docs GROUP BY 1),
          |byb AS (SELECT b, count(*) AS qc FROM docs GROUP BY 1),
          |n AS (SELECT count(*) AS nn FROM docs),
          |grid AS (SELECT s.source, s.ns, bb.b, bb.qc, n.nn, coalesce(c.c, 0) AS c,
          |    CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / CAST(s.ns + 20 AS DOUBLE) AS p,
          |    CAST(bb.qc + 1 AS DOUBLE) / CAST(n.nn + 20 AS DOUBLE) AS q
          |  FROM bysrc s CROSS JOIN byb bb CROSS JOIN n
          |  LEFT JOIN cell c ON c.source = s.source AND c.b = bb.b),
          |t AS (SELECT source, ns, nn,
          |    CAST(floor((p - q) * ln(p / q) * 1e9) AS BIGINT) AS term_x1e9,
          |    abs(CAST(c + 1 AS HUGEINT) * (nn + 20) - CAST(qc + 1 AS HUGEINT) * (ns + 20)) AS tvd_num
          |  FROM grid)
          |SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
          |  CAST(sum(term_x1e9) AS BIGINT) AS psi_x1e9,
          |  CAST((sum(tvd_num) * 1000000)
          |       // (CAST(max(ns) + 20 AS HUGEINT) * (max(nn) + 20) * 2) AS BIGINT) AS tvd_x1e6
          |FROM t GROUP BY 1 ORDER BY source""".stripMargin)),

    // Autocorrelation of the hourly volume series per event type, lags
    // 1..6 — the seasonality screen before trusting any hourly trend.
    // EXACT integers throughout: deviations enter ×n (dev = n·x − Σx,
    // DECIMAL products ≤ 1e26 « 10³⁸), so acf = Σdev_t·dev_{t+k} /
    // Σdev² needs no float mean; the signed ×1e6 quantization factors
    // the sign out so truncating div (Spark) and floor div (DuckDB)
    // agree. Lag pairing is a keyed self-join on (type, t+k) over the
    // hourly pre-agg — pair volume O(span·6) per type, gaps pair
    // nothing. The pre-agg exchange is REUSED across its four consumers
    // (AQE: 7 ReusedExchange, 3 residual column-pruned scans — measured
    // FASTER than a localCheckpoint at sf0.1/10×/30×, whose eager
    // materialization costs ~1 s flat); if the residual scans ever
    // dominate at true 100 TB, localCheckpoint()ing the span-bounded
    // hourly frame is the one-line graph_link_prediction escape.
    "events_autocorrelation" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("x"))
        val minh = hourly.agg(min("hr").as("mnh"))
        val t = hourly.crossJoin(broadcast(minh))
          .withColumn("t", expr("(unix_micros(hr) - unix_micros(mnh)) div 3600000000"))
          .select("event_type", "t", "x")
        val st = t.groupBy("event_type").agg(count(lit(1)).as("n"), sum("x").as("sx"))
        val base = t.join(broadcast(st), "event_type")
          .withColumn("dev", dec(col("n")) * dec(col("x")) - dec(col("sx")))
          .select("event_type", "t", "dev")
        val den = base.groupBy("event_type")
          .agg(sum(col("dev") * col("dev")).as("den"))
        val pairs = base
          .withColumn("k", explode(expr("sequence(1L, 6L)")))
          .select(col("event_type"), col("k"), (col("t") + col("k")).as("t2"),
            col("dev").as("dev1"))
          .join(base.select(col("event_type"), col("t").as("t2"), col("dev").as("dev2")),
            Seq("event_type", "t2"))
        pairs.groupBy("event_type", "k")
          .agg(count(lit(1)).as("n_pairs"), sum(col("dev1") * col("dev2")).as("num"))
          .join(broadcast(den), "event_type")
          .select(col("event_type"), col("k").cast("long").as("lag"),
            col("n_pairs"),
            (when(col("num") < 0, lit(-1L)).otherwise(lit(1L)) *
              graft.functions.GraftFunctions.longDiv(
                abs(col("num")) * lit(1000000L).cast("decimal(38,0)"), col("den"))
                .cast("long")).as("acf_x1e6"))
          .orderBy("event_type", "lag")
      },
      Some(
        """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS x
          |               FROM events GROUP BY 1, 2),
          |mn AS (SELECT min(hr) AS mnh FROM hourly),
          |t AS (SELECT event_type,
          |    (epoch_us(hr) - epoch_us(mnh)) // 3600000000 AS t, x
          |  FROM hourly CROSS JOIN mn),
          |st AS (SELECT event_type, count(*) AS n, sum(x) AS sx FROM t GROUP BY 1),
          |base AS (SELECT t.event_type, t.t,
          |    CAST(st.n AS HUGEINT) * t.x - st.sx AS dev
          |  FROM t JOIN st USING (event_type)),
          |den AS (SELECT event_type, sum(dev * dev) AS den FROM base GROUP BY 1),
          |p AS (SELECT b1.event_type, k.k, count(*) AS n_pairs,
          |    sum(b1.dev * b2.dev) AS num
          |  FROM base b1
          |  CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS k) k
          |  JOIN base b2 ON b2.event_type = b1.event_type AND b2.t = b1.t + k.k
          |  GROUP BY 1, 2)
          |SELECT p.event_type, CAST(p.k AS BIGINT) AS lag, p.n_pairs,
          |  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
          |       (abs(num) * 1000000 // den) AS BIGINT) AS acf_x1e6
          |FROM p JOIN den ON den.event_type = p.event_type
          |ORDER BY p.event_type, lag""".stripMargin)),

    // RAKE keyword extraction (Rose et al. 2010) over the corpus:
    // candidate phrases are maximal runs of non-stopword tokens
    // (boundaries = the shared en stopword profile + punctuation-only
    // tokens), capped at 4 tokens; word score = degree/frequency over
    // the kept phrases (deg = Σ phrase length per occurrence), phrase
    // score = Σ word scores ×1e6 in exact integer arithmetic. Shape:
    // one token explode (the text-family norm), per-doc windows for run
    // ids, then keyed groupBys/joins only — word scores join back on
    // the token. Top-20 phrases, deterministic tie-break.
    "text_rake_keywords" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val stop = graft.ops.TextOps.stopwords.toMap.apply("en")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(lower(col("text")), "\\s+"))
            .as(Seq("pos", "raw")))
          .withColumn("w", regexp_replace(col("raw"), "[^a-z0-9]", ""))
          .withColumn("bnd", col("w").isin(stop: _*) || col("w") === "")
        val runs = toks
          .withColumn("run", sum(col("bnd").cast("long"))
            .over(Window.partitionBy("doc_id").orderBy("pos")))
          .filter(!col("bnd"))
        val phrases = runs.groupBy("doc_id", "run")
          .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("tw"))
          .withColumn("toks", expr("transform(tw, s -> s.w)"))
          .filter(size(col("toks")) <= 4)
          .select(col("doc_id"), col("run"),
            concat_ws(" ", col("toks")).as("phrase"),
            size(col("toks")).cast("long").as("plen"), col("toks"))
        val ptoks = phrases.select(col("doc_id"), col("run"), col("phrase"),
          col("plen"), explode(col("toks")).as("w"))
        val wsc = ptoks.groupBy("w")
          .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
          .withColumn("wscore", graft.functions.GraftFunctions.longDiv(
            dec(col("deg")) * lit(1000000L).cast("decimal(38,0)"), dec(col("freq")))
            .cast("long"))
          .select("w", "wscore")
        val occ = ptoks.join(wsc, "w")
          .groupBy("doc_id", "run", "phrase")
          .agg(sum("wscore").cast("long").as("score"))
        occ.groupBy("phrase")
          .agg(count(lit(1)).as("n_occ"), max("score").as("score_x1e6"))
          .orderBy(col("score_x1e6").desc, col("n_occ").desc, col("phrase"))
          .limit(20)
      },
      Some {
        val stop = graft.ops.TextOps.stopwords.toMap.apply("en")
          .map(w => s"'$w'").mkString(", ")
        s"""WITH toks AS (SELECT doc_id,
           |    regexp_split_to_array(lower(text), '\\s+') AS tk FROM documents),
           |pt AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, tk
           |       FROM toks),
           |pw AS (SELECT doc_id, pos,
           |    regexp_replace(tk[pos], '[^a-z0-9]', '', 'g') AS w FROM pt),
           |pb AS (SELECT doc_id, pos, w,
           |    (w IN ($stop) OR w = '') AS bnd FROM pw),
           |r AS (SELECT doc_id, pos, w, bnd,
           |    sum(CASE WHEN bnd THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id ORDER BY pos) AS run
           |  FROM pb),
           |ph AS (SELECT doc_id, run,
           |    string_agg(w, ' ' ORDER BY pos) AS phrase,
           |    CAST(count(*) AS BIGINT) AS plen
           |  FROM r WHERE NOT bnd GROUP BY 1, 2 HAVING count(*) <= 4),
           |pt2 AS (SELECT doc_id, run, phrase, plen,
           |    unnest(string_split(phrase, ' ')) AS w FROM ph),
           |wsc AS (SELECT w,
           |    CAST(CAST(sum(plen) AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS wscore
           |  FROM pt2 GROUP BY 1),
           |occ AS (SELECT doc_id, run, phrase,
           |    CAST(sum(wscore) AS BIGINT) AS score
           |  FROM pt2 JOIN wsc USING (w) GROUP BY 1, 2, 3)
           |SELECT phrase, count(*) AS n_occ, max(score) AS score_x1e6
           |FROM occ GROUP BY 1
           |ORDER BY score_x1e6 DESC, n_occ DESC, phrase LIMIT 20""".stripMargin
      }),

    // DAU / trailing-7-day WAU / stickiness per day — the engagement
    // panel every product pipeline reports. The (user, day) incidence
    // deduplicates FIRST (one shuffle, the frame every metric derives
    // from), WAU comes from the bin-keyed expansion — each active day
    // contributes to the 7 cover days it can serve, a BOUNDED ×7
    // explode, never a range join — and stickiness = dau·1e6 div wau
    // stays exact integer.
    "events_active_users" -> Q(
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val bounds = ud.agg(min("day").as("mn"), max("day").as("mx"))
        val wau = ud
          .withColumn("cover", explode(expr("sequence(day, day + interval 6 day)")))
          .crossJoin(broadcast(bounds))
          .filter(col("cover").between(col("mn"), col("mx")))
          .groupBy(col("cover").as("day"))
          .agg(countDistinct("user_id").as("wau"))
        val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
        dau.join(wau, "day")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau").cast("long").as("dau"), col("wau").cast("long").as("wau"),
            expr("dau * 1000000L div wau").cast("long").as("stickiness_x1e6"))
          .orderBy("day")
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          |b AS (SELECT min(day) AS mn, max(day) AS mx FROM ud),
          |cov AS (SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY,
          |                               INTERVAL 1 DAY)) AS cover
          |        FROM ud),
          |wau AS (SELECT CAST(cover AS DATE) AS day, count(DISTINCT user_id) AS wau
          |        FROM cov CROSS JOIN b
          |        WHERE CAST(cover AS DATE) BETWEEN mn AND mx GROUP BY 1),
          |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
          |SELECT strftime(dau.day, '%Y-%m-%d') AS day,
          |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
          |  CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_x1e6
          |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin)),

    // Degree assortativity of the support-pruned co-order graph — do
    // high-degree parts co-occur with other hubs (r > 0) or with
    // leaves (r < 0)? Each undirected edge enters BOTH orientations, so
    // the x/y marginals coincide and Pearson needs NO sqrt:
    // r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — exact DECIMAL integers,
    // sign factored out of the ×1e6 quantization. Two keyed joins of
    // the degree frame onto the edge list.
    "graph_assortativity" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb")
        val e = e0.unionAll(e0.select(col("pb").as("pa"), col("pa").as("pb")))
        val deg = e.groupBy(col("pa").as("node")).agg(count(lit(1)).as("deg"))
        val xy = e
          .join(deg.select(col("node").as("pa"), col("deg").as("dx")), "pa")
          .join(deg.select(col("node").as("pb"), col("deg").as("dy")), "pb")
        xy.agg(count(lit(1)).as("n2"),
            sum(dec(col("dx"))).as("sx"),
            sum(dec(col("dx")) * dec(col("dx"))).as("sxx"),
            sum(dec(col("dx")) * dec(col("dy"))).as("sxy"))
          .select(
            (col("n2") / 2).cast("long").as("n_edges"),
            (when(dec(col("n2")) * col("sxy") - col("sx") * col("sx") < 0, lit(-1L))
              .otherwise(lit(1L)) *
              graft.functions.GraftFunctions.longDiv(
                abs(dec(col("n2")) * col("sxy") - col("sx") * col("sx")) *
                  lit(1000000L).cast("decimal(38,0)"),
                dec(col("n2")) * col("sxx") - col("sx") * col("sx")).cast("long"))
              .as("assortativity_x1e6"))
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |e AS (SELECT pa, pb FROM e0 UNION ALL SELECT pb, pa FROM e0),
          |deg AS (SELECT pa AS node, count(*) AS deg FROM e GROUP BY 1),
          |xy AS (SELECT CAST(da.deg AS HUGEINT) AS dx, CAST(db.deg AS HUGEINT) AS dy
          |       FROM e JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb),
          |s AS (SELECT count(*) AS n2, sum(dx) AS sx, sum(dx * dx) AS sxx,
          |             sum(dx * dy) AS sxy
          |      FROM xy)
          |SELECT CAST(n2 // 2 AS BIGINT) AS n_edges,
          |  CAST((CASE WHEN n2 * sxy - sx * sx < 0 THEN -1 ELSE 1 END) *
          |       (abs(n2 * sxy - sx * sx) * 1000000
          |        // (n2 * sxx - sx * sx)) AS BIGINT) AS assortativity_x1e6
          |FROM s""".stripMargin)),

    // Mahalanobis-style embedding outliers (diagonal covariance): per
    // dimension, deviations enter ×n (n·x − Σx) against the variance
    // ×n² (n·Σx² − (Σx)²) so every z² term is one exact integer
    // division ×1e6; a vector's score sums its 64 per-dim terms. The
    // 64-row dim-stats frame BROADCASTS back onto the exploded vectors;
    // top-20 outliers, deterministic tie-break. The embedding-QA
    // sibling of events_anomaly_mad.
    "emb_outliers" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .select(col("vec_id"), col("dim"),
            floor(col("x") * 1000000).cast("long").as("xq"))
        val st = q.groupBy("dim")
          .agg(count(lit(1)).as("n"), sum(dec(col("xq"))).as("s"),
            sum(dec(col("xq")) * dec(col("xq"))).as("sxx"))
          .withColumn("varn2", dec(col("n")) * col("sxx") - col("s") * col("s"))
        q.join(broadcast(st), "dim")
          .withColumn("devn", dec(col("n")) * dec(col("xq")) - col("s"))
          .withColumn("z2_x1e6", graft.functions.GraftFunctions.longDiv(
            col("devn") * col("devn") * lit(1000000L).cast("decimal(38,0)"),
            col("varn2")).cast("long"))
          .groupBy("vec_id")
          .agg(sum("z2_x1e6").cast("long").as("md_x1e6"))
          .orderBy(col("md_x1e6").desc, col("vec_id"))
          .limit(20)
      },
      Some(
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |q AS (SELECT vec_id, g.i - 1 AS dim,
          |        CAST(floor(e[g.i] * 1000000) AS BIGINT) AS xq
          |      FROM v CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |st AS (SELECT dim, count(*) AS n, sum(CAST(xq AS HUGEINT)) AS s,
          |         sum(CAST(xq AS HUGEINT) * xq) AS sxx
          |       FROM q GROUP BY 1),
          |z AS (SELECT q.vec_id,
          |    ((st.n * q.xq - st.s) * (st.n * q.xq - st.s) * 1000000)
          |      // (st.n * st.sxx - st.s * st.s) AS z2
          |  FROM q JOIN st USING (dim))
          |SELECT vec_id, CAST(sum(z2) AS BIGINT) AS md_x1e6
          |FROM z GROUP BY 1
          |ORDER BY md_x1e6 DESC, vec_id LIMIT 20""".stripMargin)),

    // ABC / Pareto inventory classification of parts by lineitem
    // revenue: class A covers the first 80% of revenue in descending
    // order, B to 95%, C the tail. The descending cumulative comes from
    // the ASCENDING two-phase prefix sum (Stats.bucketedPrefixSum — no
    // corpus-sized sort partition): cumDesc = total − prefixAsc + rev,
    // which equals the oracle's sum() OVER (ORDER BY rev DESC, pk DESC).
    // Class predicates are exact integer cross-multiplications.
    "orders_abc_classes" -> Q(
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")).as("rev")
            .cast("long").as("rev"))
        val pre = graft.ops.Stats.bucketedPrefixSum(rev, "rev", "pk",
          bucketWidth = 1L << 22)
        val tot = rev.agg(sum("rev").as("total"))
        pre.crossJoin(broadcast(tot))
          .withColumn("cum_desc", col("total") - col("prefix") + col("rev"))
          .withColumn("cls",
            when(col("cum_desc") * 10 <= col("total") * 8, "A")
              .when(col("cum_desc") * 100 <= col("total") * 95, "B")
              .otherwise("C"))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_parts"), sum("rev").cast("long").as("revenue_c"))
          .crossJoin(broadcast(tot))
          // revenue_c·1e6 overflows BIGINT past ~9e12 cents — DECIMAL
          .withColumn("share_x1e6", graft.functions.GraftFunctions.longDiv(
            col("revenue_c").cast("decimal(38,0)") * lit(1000000L).cast("decimal(38,0)"),
            col("total").cast("decimal(38,0)")).cast("long"))
          .select("cls", "n_parts", "revenue_c", "share_x1e6")
          .orderBy("cls")
      },
      Some(
        """WITH rev AS (SELECT l_partkey AS pk,
          |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          |  FROM lineitem GROUP BY 1),
          |t AS (SELECT sum(rev) AS total FROM rev),
          |c AS (SELECT rev,
          |    sum(rev) OVER (ORDER BY rev DESC, pk DESC
          |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_desc
          |  FROM rev),
          |k AS (SELECT rev,
          |    CASE WHEN cum_desc * 10 <= total * 8 THEN 'A'
          |         WHEN cum_desc * 100 <= total * 95 THEN 'B'
          |         ELSE 'C' END AS cls
          |  FROM c CROSS JOIN t)
          |SELECT cls, count(*) AS n_parts, CAST(sum(rev) AS BIGINT) AS revenue_c,
          |  CAST(CAST(sum(rev) AS HUGEINT) * 1000000 // (SELECT total FROM t) AS BIGINT)
          |    AS share_x1e6
          |FROM k GROUP BY 1 ORDER BY cls""".stripMargin)),

    // Shannon entropy of the event-type mix per day — the
    // concentration/diversity monitor (a day where one type crowds out
    // the rest drops toward 0). Per-cell terms floor(c·ln c · 1e6)
    // BEFORE the sum (order-free integer aggregation, the PSI
    // discipline); the per-day combine H = ln(n) − Σc·ln c / n is a
    // fixed sequence of IEEE ops from integers. One groupBy to the
    // day×type frame.
    "events_type_entropy" -> Q(
      (s, d) => {
        val cell = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("c"))
          .withColumn("term", floor(col("c").cast("double") *
            log(col("c").cast("double")) * lit(1000000.0)).cast("long"))
        cell.groupBy("day")
          .agg(sum("c").as("n"), count(lit(1)).as("n_types"), sum("term").as("s"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n").cast("long").as("n"),
            col("n_types").cast("long").as("n_types"),
            floor((log(col("n").cast("double")) * col("n").cast("double") *
              lit(1000000.0) - col("s").cast("double")) / col("n").cast("double"))
              .cast("long").as("entropy_x1e6"))
          .orderBy("day")
      },
      Some(
        """WITH cell AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
          |              FROM events GROUP BY 1, 2),
          |tm AS (SELECT day, c,
          |    CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS term
          |  FROM cell),
          |d AS (SELECT day, sum(c) AS n, count(*) AS n_types, sum(term) AS s FROM tm GROUP BY 1)
          |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
          |  CAST(n_types AS BIGINT) AS n_types,
          |  CAST(floor((ln(CAST(n AS DOUBLE)) * CAST(n AS DOUBLE) * 1000000.0
          |              - CAST(s AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS entropy_x1e6
          |FROM d ORDER BY day""".stripMargin)),

    // Wald–Wolfowitz runs test on the hourly volume series: is the
    // above/below-mean sign sequence random, or does volume trend/
    // cluster? Sign via the exact integer predicate x·H > total; runs
    // from one lag over the span-bounded hourly frame; the expected
    // run count 1 + 2ab/n and its variance 2ab(2ab−n)/(n²(n−1)) stay
    // exact ×1e6 integers — no sqrt, the z-score is the reader's one
    // division.
    "stats_runs_test" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val tot = hourly.agg(sum("x").as("total"), count(lit(1)).as("nh"))
        val signed = hourly.crossJoin(broadcast(tot))
          .withColumn("sgn", (col("x") * col("nh") > col("total")).cast("long"))
        val runs = signed
          .withColumn("chg",
            when(lag("sgn", 1).over(Window.orderBy("h")).isNull, 1L)
              .when(lag("sgn", 1).over(Window.orderBy("h")) =!= col("sgn"), 1L)
              .otherwise(0L))
        runs.agg(max("nh").cast("long").as("n_hours"),
            sum("sgn").cast("long").as("n_above"),
            (max("nh") - sum("sgn")).cast("long").as("n_below"),
            sum("chg").cast("long").as("runs"),
            graft.functions.GraftFunctions.longDiv(
              dec(lit(1000000L)) * (dec(max("nh")) +
                dec(lit(2L)) * dec(sum("sgn")) * (dec(max("nh")) - dec(sum("sgn")))),
              dec(max("nh"))).cast("long").as("expected_x1e6"),
            graft.functions.GraftFunctions.longDiv(
              dec(lit(2L)) * dec(sum("sgn")) * (dec(max("nh")) - dec(sum("sgn"))) *
                (dec(lit(2L)) * dec(sum("sgn")) * (dec(max("nh")) - dec(sum("sgn"))) -
                  dec(max("nh"))) * dec(lit(1000000L)),
              dec(max("nh")) * dec(max("nh")) * (dec(max("nh")) - dec(lit(1L))))
              .cast("long").as("var_x1e6"))
      },
      Some(
        """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS x
          |               FROM events GROUP BY 1),
          |t AS (SELECT sum(x) AS total, count(*) AS nh FROM hourly),
          |sg AS (SELECT h, CASE WHEN x * nh > total THEN 1 ELSE 0 END AS sgn
          |       FROM hourly CROSS JOIN t),
          |r AS (SELECT sgn, CASE WHEN lag(sgn) OVER (ORDER BY h) IS NULL THEN 1
          |                       WHEN lag(sgn) OVER (ORDER BY h) <> sgn THEN 1
          |                       ELSE 0 END AS chg
          |      FROM sg),
          |a AS (SELECT CAST((SELECT nh FROM t) AS HUGEINT) AS n,
          |             CAST(sum(sgn) AS HUGEINT) AS a, sum(chg) AS runs
          |      FROM r)
          |SELECT CAST(n AS BIGINT) AS n_hours, CAST(a AS BIGINT) AS n_above,
          |  CAST(n - a AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS runs,
          |  CAST((1000000 * (n + 2 * a * (n - a))) // n AS BIGINT) AS expected_x1e6,
          |  CAST((2 * a * (n - a) * (2 * a * (n - a) - n) * 1000000)
          |       // (n * n * (n - 1)) AS BIGINT) AS var_x1e6
          |FROM a""".stripMargin)),

    // Period-over-period growth — the monthly revenue panel with
    // month-over-month delta and year-over-year ratio. Prior periods
    // come from SELF-JOINS on computed month keys (add_months), never
    // positional lag: a gap month would silently shift a lag(12) to the
    // wrong year, a calendar join can't. The month frame is span-bounded
    // (one row per month of corpus time), so both joins broadcast.
    // Revenue in exact cents; the YoY ratio is one DECIMAL division.
    "date_mom_growth" -> Q(
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("rev_c"))
        val prev = m.select(col("mo").as("pmo"), col("rev_c").as("prev_c"))
        val yago = m.select(col("mo").as("ymo"), col("rev_c").as("yago_c"))
        m.join(broadcast(prev), add_months(col("mo"), -1) === col("pmo"), "left")
          .join(broadcast(yago), add_months(col("mo"), -12) === col("ymo"), "left")
          .select(date_format(col("mo"), "yyyy-MM").as("month"),
            col("rev_c"),
            // NULLABLE integral outputs must ship as DOUBLE: the
            // compare's pandas reading coerces a nullable BIGINT column
            // to float64, so an integer-typed Spark cell never matches.
            // Values are cents (< 2^53) — the double is exact.
            (col("rev_c") - col("prev_c")).cast("double").as("mom_delta_c"),
            graft.functions.GraftFunctions.longDiv(
              col("rev_c").cast("decimal(38,0)") * lit(1000000L).cast("decimal(38,0)"),
              col("yago_c").cast("decimal(38,0)")).cast("double").as("yoy_x1e6"))
          .orderBy("month")
      },
      Some(
        """WITH m AS (SELECT date_trunc('month', o_orderdate) AS mo,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
          |  FROM orders GROUP BY 1)
          |SELECT strftime(m.mo, '%Y-%m') AS month, m.rev_c,
          |  CAST(m.rev_c - p.rev_c AS DOUBLE) AS mom_delta_c,
          |  CAST(CAST(m.rev_c AS HUGEINT) * 1000000 // y.rev_c AS DOUBLE) AS yoy_x1e6
          |FROM m
          |LEFT JOIN m p ON p.mo = m.mo - INTERVAL 1 MONTH
          |LEFT JOIN m y ON y.mo = m.mo - INTERVAL 12 MONTH
          |ORDER BY month""".stripMargin)),

    // Referential-integrity audit of the whole star schema — the data
    // quality gate a 100 TB warehouse runs before publishing: per FK
    // edge, child row count and orphan row count (child rows whose key
    // has no parent). Each edge first collapses the child to its key
    // frame (count per key — the shuffle is key-cardinality sized, not
    // row sized), then probes the parent key set; dimension parents
    // broadcast. Fact–fact edges (lineitem→orders) stay keyed
    // shuffle joins.
    "quality_referential_integrity" -> Q(
      (s, d) => {
        def edge(name: String, child: DataFrame, ck: String,
                 parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
          // one child scan, one keyed probe, one agg — totals and
          // orphans come from the SAME left join (conditional sums),
          // so no scalar crossJoin and no second pass over the child
          val keys = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("c"))
          val par = parent.select(col(pk).as("k")).distinct()
            .withColumn("hit", lit(1))
          keys.join(if (bcast) broadcast(par) else par, Seq("k"), "left")
            .agg(sum("c").as("n_rows"),
              coalesce(sum(when(col("hit").isNull, col("c"))), lit(0L))
                .as("n_orphan_rows"),
              count(when(col("hit").isNull, lit(1))).as("n_orphan_keys"))
            .select(lit(name).as("fk"), col("n_rows").cast("long"),
              col("n_orphan_rows").cast("long"), col("n_orphan_keys").cast("long"))
        }
        val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
        val c = Tables.customer(s, d); val su = Tables.supplier(s, d)
        val p = Tables.part(s, d); val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        edge("customer.nation", c, "c_nationkey", n, "n_nationkey", bcast = true)
          .unionAll(edge("lineitem.order", li, "l_orderkey", o, "o_orderkey", bcast = false))
          .unionAll(edge("lineitem.part", li, "l_partkey", p, "p_partkey", bcast = false))
          .unionAll(edge("lineitem.supplier", li, "l_suppkey", su, "s_suppkey", bcast = true))
          .unionAll(edge("nation.region", n, "n_regionkey", r, "r_regionkey", bcast = true))
          .unionAll(edge("orders.customer", o, "o_custkey", c, "c_custkey", bcast = false))
          .unionAll(edge("supplier.nation", su, "s_nationkey", n, "n_nationkey", bcast = true))
          .orderBy("fk")
      },
      Some {
        def e(name: String, child: String, ck: String, parent: String, pk: String) =
          s"""SELECT '$name' AS fk, CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(coalesce(sum(CASE WHEN p.$pk IS NULL THEN c END), 0) AS BIGINT)
             |    AS n_orphan_rows,
             |  CAST(count(CASE WHEN p.$pk IS NULL THEN 1 END) AS BIGINT) AS n_orphan_keys
             |FROM (SELECT $ck AS k, count(*) AS c FROM $child GROUP BY 1) kk
             |LEFT JOIN $parent p ON p.$pk = kk.k""".stripMargin
        Seq(
          e("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          e("lineitem.order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          e("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
          e("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          e("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
          e("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
          e("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
      }),

    // Kaplan–Meier survival of time-to-first-purchase (days from a
    // user's first event), right-censored at corpus end — the
    // conversion-lag curve with honest censoring. The corpus collapses
    // to one row per user (first event day, first purchase day), then
    // to the span-bounded day-offset frame; at-risk counts come from a
    // cumulative window over that tiny frame. The KM product is carried
    // in LOG space as exact integers: per-day terms
    // floor(ln((r−e)/r)·1e6) summed cumulatively (order-free — the
    // entropy/PSI discipline), so the gate never hashes an exp().
    // Batch member of the KM family: the SAME survivalUserState →
    // survivalKmFromState derivation as the streaming twin (one code
    // path, zero drift; per-user min/min/max state is commutative, so
    // the twin is disorder-immune — GraphStreamSpec pins equality on a
    // disordered split). The horizon mx = max(last_day) over users
    // equals max(day) over events: every event row enters exactly one
    // user group.
    "events_survival_km" -> Q(
      (s, d) => graft.streaming.EventStream.survivalKmFromState(
        graft.streaming.EventStream.survivalUserState(Tables.events(s, d))),
      Some(
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
          |per AS (SELECT user_id, min(day) AS t0,
          |    min(CASE WHEN event_type = 'purchase' THEN day END) AS conv
          |  FROM ev GROUP BY 1),
          |mx AS (SELECT max(day) AS mx FROM ev),
          |durs AS (SELECT user_id, conv IS NOT NULL AS converted,
          |    CAST(CASE WHEN conv IS NOT NULL THEN conv - t0 ELSE mx - t0 END AS BIGINT) AS dur
          |  FROM per CROSS JOIN mx),
          |bd AS (SELECT dur, sum(CASE WHEN converted THEN 1 ELSE 0 END) AS e,
          |    sum(CASE WHEN converted THEN 0 ELSE 1 END) AS c
          |  FROM durs GROUP BY 1),
          |ar AS (SELECT dur, e, c,
          |    sum(e + c) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
          |                     AND UNBOUNDED FOLLOWING) AS at_risk
          |  FROM bd),
          |tm AS (SELECT dur, e, c, at_risk,
          |    CASE WHEN at_risk > e THEN CAST(floor(ln(CAST(at_risk - e AS DOUBLE)
          |      / CAST(at_risk AS DOUBLE)) * 1000000.0) AS BIGINT) END AS term
          |  FROM ar)
          |SELECT CAST(dur AS BIGINT) AS day_offset, CAST(e AS BIGINT) AS n_conv,
          |  CAST(c AS BIGINT) AS n_censored, CAST(at_risk AS BIGINT) AS at_risk,
          |  CAST(sum(term) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
          |                       AND CURRENT ROW) AS BIGINT) AS log_surv_x1e6
          |FROM tm ORDER BY day_offset""".stripMargin)),

    // HITS hubs/authorities on the customer–part purchase bipartite
    // graph — see ops/Basket.hitsBipartite. The oracle is the
    // mechanical 3-round unroll with MATERIALIZED CTEs (the sssp/kcore
    // discipline); fixed-point rescale keeps both engines in exact
    // BIGINT arithmetic.
    "graph_hits_parts" -> Q(
      (s, d) => graft.ops.Basket.hitsBipartite(
        Tables.lineitem(s, d), Tables.orders(s, d), rounds = 3, k = 20),
      Some {
        val base =
          """WITH e AS MATERIALIZED (
            |  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
            |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
            |h0 AS (SELECT DISTINCT ck, CAST(1048576 AS BIGINT) AS h FROM e)""".stripMargin
        val steps = (1 to 3).flatMap { i =>
          Seq(
            s"""a${i}r AS MATERIALIZED (SELECT pk, sum(h) AS a
               |  FROM e JOIN h${i - 1} USING (ck) GROUP BY 1)""".stripMargin,
            s"""a$i AS MATERIALIZED (SELECT pk,
               |  a * 1048576 // (SELECT max(a) FROM a${i}r) AS a FROM a${i}r)""".stripMargin,
            s"""h${i}r AS MATERIALIZED (SELECT ck, sum(a) AS h
               |  FROM e JOIN a$i USING (pk) GROUP BY 1)""".stripMargin,
            s"""h$i AS MATERIALIZED (SELECT ck,
               |  h * 1048576 // (SELECT max(h) FROM h${i}r) AS h FROM h${i}r)""".stripMargin)
        }
        (Seq(base) ++ steps).mkString(",\n") +
          """
            |SELECT CAST(pk AS BIGINT) AS part_id, CAST(a AS BIGINT) AS auth_x2p20
            |FROM a3 ORDER BY a DESC, pk LIMIT 20""".stripMargin
      }),

    // CCNet-style perplexity bucketing (Wenzek et al., LREC'20): every
    // doc scored by its mean corpus-bigram inverse probability (the
    // text_bigram_surprisal model, ×1e6 integers), then split into
    // head/middle/tail TERCILES by exact two-phase rank — the
    // bucket boundary is (rank−1)·3 div n on both sides, so the gate
    // never hashes a float quantile. The LM fit and the scoring are the
    // same two keyed joins; ranking adds no corpus-sized window
    // (Stats.bucketedRank).
    "text_perplexity_buckets" -> Q(
      (s, d) => {
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(slice(tk, 1, size(tk) - 1), (w, i) -> struct(w AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nb"))
        val ctx = lm.groupBy("w1").agg(sum("nb").as("nu"))
        val scored = bg.join(lm, Seq("w1", "w2")).join(ctx, Seq("w1"))
          .withColumn("inv_p_x1e6", expr("nu * 1000000L div nb"))
          .groupBy("doc_id")
          .agg(expr("sum(inv_p_x1e6) div count(*)").as("score"))
        val ranked = graft.ops.Stats.bucketedRank(scored, "score", "doc_id",
          bucketWidth = 1L << 32)
        val tot = scored.agg(count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("bucket", expr("(rank - 1) * 3 div n"))
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
          .groupBy(when(col("bucket") === 0, "head")
            .when(col("bucket") === 1, "middle").otherwise("tail").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            expr("sum(score) div count(*)").cast("long").as("mean_score_x1e6"),
            expr("sum(n_chars) div count(*)").cast("long").as("mean_chars"))
          .orderBy("bucket")
      },
      Some(
        """WITH t AS (SELECT doc_id, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
          |      FROM t WHERE len(tk) >= 2),
          |bg AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM u),
          |lm AS (SELECT w1, w2, count(*) AS nb FROM bg GROUP BY 1, 2),
          |ctx AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS nu FROM lm GROUP BY 1),
          |sc AS (SELECT doc_id,
          |    CAST(sum(nu * 1000000 // nb) // count(*) AS BIGINT) AS score
          |  FROM bg JOIN lm USING (w1, w2) JOIN ctx USING (w1)
          |  GROUP BY doc_id),
          |rk AS (SELECT doc_id, score,
          |    row_number() OVER (ORDER BY score, doc_id) AS rank,
          |    count(*) OVER () AS n
          |  FROM sc),
          |bk AS (SELECT doc_id, score, (rank - 1) * 3 // n AS bucket FROM rk)
          |SELECT CASE bucket WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
          |         ELSE 'tail' END AS bucket,
          |  count(*) AS n_docs,
          |  CAST(sum(score) // count(*) AS BIGINT) AS mean_score_x1e6,
          |  CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars
          |FROM bk JOIN documents USING (doc_id)
          |GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // 1-D earth-mover distance (Wasserstein-1) of each source's
    // document-length distribution against the whole corpus — the
    // drift metric that measures how FAR mass moved, complementing
    // PSI/KS/TVD which only see that it moved. Lengths bin to a fixed
    // 64-cell grid over the global [min,max]; EMD = Σ_bins
    // |CumF_src − CumF_all| with the ECDF difference cross-multiplied
    // into exact integers (the KS discipline) and ONE integral
    // division per source at the end. The corpus collapses to the
    // source×bin grid in a single aggregation; every window runs on
    // that ≤ sources×64 frame.
    "stats_emd_sources" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
        val ext = docs.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
        val cell = docs.crossJoin(broadcast(ext))
          .withColumn("bin", least(
            expr("(n_chars - mn) * 64 div (mx - mn + 1)"), lit(63L)))
          .groupBy("source", "bin").agg(count(lit(1)).as("c"))
        // dense grid: every (source × 0..63) cell, zeros included, so
        // the cumulative is defined at every bin edge
        val grid = cell.select("source").distinct()
          .select(col("source"), explode(expr("sequence(0L, 63L)")).as("bin"))
          .join(cell, Seq("source", "bin"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val wSrc = Window.partitionBy("source").orderBy("bin")
        val cum = grid.withColumn("cum_s", sum("c").over(wSrc))
        val all = cum.groupBy("bin").agg(sum("c").as("ca"))
          .withColumn("cum_a", sum("ca").over(Window.orderBy("bin")))
          .select("bin", "cum_a")
        val nS = cell.groupBy("source").agg(sum("c").as("n_s"))
        val nAll = docs.agg(count(lit(1)).as("n_all"))
        cum.join(broadcast(all), "bin").join(broadcast(nS), "source")
          .crossJoin(broadcast(nAll))
          .withColumn("dev", abs(dec(col("cum_s")) * dec(col("n_all")) -
            dec(col("cum_a")) * dec(col("n_s"))))
          .groupBy("source")
          .agg(max("n_s").cast("long").as("n_docs"),
            graft.functions.GraftFunctions.longDiv(
              sum("dev") * dec(lit(1000000L)),
              dec(max("n_s")) * dec(max("n_all"))).cast("long").as("emd_x1e6"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (SELECT source, n_chars FROM documents),
          |ext AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM docs),
          |cell AS (SELECT source,
          |    least((n_chars - mn) * 64 // (mx - mn + 1), 63) AS bin,
          |    count(*) AS c
          |  FROM docs CROSS JOIN ext GROUP BY 1, 2),
          |grid AS (SELECT s.source, b.bin, coalesce(cell.c, 0) AS c
          |  FROM (SELECT DISTINCT source FROM cell) s
          |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bin) b
          |  LEFT JOIN cell ON cell.source = s.source AND cell.bin = b.bin),
          |cum AS (SELECT source, bin, c,
          |    sum(c) OVER (PARTITION BY source ORDER BY bin) AS cum_s
          |  FROM grid),
          |al AS (SELECT bin, sum(c) AS ca FROM cum GROUP BY bin),
          |alc AS (SELECT bin, sum(ca) OVER (ORDER BY bin) AS cum_a FROM al),
          |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM cell GROUP BY 1),
          |na AS (SELECT count(*) AS n_all FROM docs)
          |SELECT source, CAST(n_s AS BIGINT) AS n_docs,
          |  CAST(sum(abs(CAST(cum_s AS HUGEINT) * n_all - CAST(cum_a AS HUGEINT) * n_s))
          |    * 1000000 // (CAST(n_s AS HUGEINT) * n_all) AS BIGINT) AS emd_x1e6
          |FROM cum JOIN alc USING (bin) JOIN ns USING (source) CROSS JOIN na
          |GROUP BY source, n_s, n_all ORDER BY source""".stripMargin)),

    // Contrastive hard-negative mining — see ops/Similarity.hardNegatives.
    "sim_hard_negatives" -> Q(
      (s, d) => graft.ops.Similarity.hardNegatives(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5)
        .orderBy("query_id", "rnk"),
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT vec_id AS query_id, label AS qlabel, e AS qe
          |      FROM v WHERE vec_id IN (0, 1, 2, 3, 4)),
          |scored AS (
          |  SELECT query_id, vec_id, label,
          |    round(list_dot_product(e, qe)
          |      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 6) AS cos
          |  FROM v CROSS JOIN q WHERE vec_id <> query_id AND label <> qlabel),
          |r AS (SELECT query_id, vec_id, label, cos,
          |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
          |      FROM scored)
          |SELECT query_id, vec_id, CAST(label AS BIGINT) AS neg_label, cos,
          |  CAST(rnk AS INT) AS rnk
          |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin)),

    // Wide star-schema flatten with a per-region order-invariant
    // checksum — the "denormalize 100 TB for export, then prove the
    // copy" primitive: lineitem joined through orders→customer→nation→
    // region plus part and supplier (the classic 6-way star), each row
    // fingerprinted with the portable 60-bit md5 family and summed
    // mod 2⁶¹−1 per region (the lakehouse_table_fingerprint
    // discipline — repartition/order-invariant, map-side combinable).
    // Fact–fact joins stay keyed; nation/region broadcast.
    "lakehouse_denorm_checksum" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
        val su = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
        val n = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .withColumn("h", graft.functions.GraftFunctions.md5Hash60(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"),
            col("c_name"), col("p_brand"), col("s_name"), col("n_name"),
            col("r_name"))))
          .groupBy(col("r_name").as("region"))
          .agg(count(lit(1)).as("n_rows"),
            expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT)")
              .as("fingerprint"))
          .orderBy("region")
      },
      Some {
        val h = GraphSql.md5Hash60(
          """l_orderkey || '|' || l_linenumber || '|' || o_orderstatus || '|' ||
            |c_name || '|' || p_brand || '|' || s_name || '|' || n_name || '|' ||
            |r_name""".stripMargin)
        s"""SELECT r_name AS region, count(*) AS n_rows,
           |  CAST(sum(CAST($h AS HUGEINT)) % 2305843009213693951 AS BIGINT)
           |    AS fingerprint
           |FROM lineitem
           |JOIN orders ON o_orderkey = l_orderkey
           |JOIN customer ON c_custkey = o_custkey
           |JOIN part ON p_partkey = l_partkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN nation ON n_nationkey = c_nationkey
           |JOIN region ON r_regionkey = n_regionkey
           |GROUP BY 1 ORDER BY region""".stripMargin
      }),

    // Deterministic Poisson bootstrap CI for the mean order value
    // (Chamandy et al., "Estimating uncertainty for massive data
    // streams", Google TR 2012): replica b resamples each order with
    // weight ~ Poisson(1), derived NOT from an RNG but from the 60-bit
    // md5 of (orderkey:b) against fixed inverse-CDF thresholds
    // (floor(cdf·2⁶⁰) literals, identical on both sides) — fully
    // deterministic, repartition-invariant, and replayable in SQL. The
    // 32 replica means come from ONE pass: the ×32 explode feeds a
    // 32-group aggregate with map-side combine, so nothing
    // corpus-sized shuffles; the CI is the 2nd/31st order statistic of
    // the 32-row replica frame.
    "stats_bootstrap_ci" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
        // the ×32 explode multiplies CPU (32 md5s/row) but not input
        // bytes, so scan-split parallelism understates the work: a
        // single 23 MB parquet split would run the whole fan-out on
        // one core. The pre-explode repartition ships 16 bytes/row to
        // unlock 32 hashes/row of parallelism — at full scale the scan
        // has thousands of splits and AQE keeps this exchange cheap.
        val rep = o.repartition(o.sparkSession.sparkContext.defaultParallelism)
          .select(col("o_orderkey"), col("cents"),
            explode(expr("sequence(0, 31)")).as("b"))
          .withColumn("h", graft.functions.GraftFunctions.md5Hash60(
            concat_ws(":", col("o_orderkey"), col("b"))))
          .withColumn("w", graft.ops.Stats.poissonWeight(col("h")))
        val means = rep.groupBy("b")
          .agg(expr("sum(w * cents) div sum(w)").as("m"))
        val ranked = means
          .withColumn("r", row_number().over(Window.orderBy("m", "b")))
        val point = o.agg(count(lit(1)).as("n_orders"),
          expr("sum(cents) div count(*)").as("mean_c"))
        point
          .crossJoin(broadcast(ranked.filter(col("r") === 2)
            .select(col("m").as("boot_lo_c"))))
          .crossJoin(broadcast(ranked.filter(col("r") === 31)
            .select(col("m").as("boot_hi_c"))))
          .select(col("n_orders").cast("long").as("n_orders"),
            col("mean_c").cast("long").as("mean_c"),
            col("boot_lo_c").cast("long").as("boot_lo_c"),
            col("boot_hi_c").cast("long").as("boot_hi_c"))
      },
      Some {
        val h = GraphSql.md5Hash60("o_orderkey || ':' || b")
        s"""WITH o AS (SELECT o_orderkey,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
           |rep AS (SELECT o_orderkey, cents, unnest(generate_series(0, 31)) AS b FROM o),
           |hh AS (SELECT cents, b, $h AS h FROM rep),
           |ww AS (SELECT cents, b,
           |    CASE WHEN h < 424136118829305344 THEN 0
           |         WHEN h < 848272237658610688 THEN 1
           |         WHEN h < 1060340297073263360 THEN 2
           |         WHEN h < 1131029650211480960 THEN 3
           |         WHEN h < 1148701988496035328 THEN 4
           |         WHEN h < 1152236456152946176 THEN 5
           |         ELSE 6 END AS w
           |  FROM hh),
           |m AS (SELECT b, sum(w * cents) // sum(w) AS m FROM ww GROUP BY 1),
           |r AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM m),
           |p AS (SELECT count(*) AS n_orders, sum(cents) // count(*) AS mean_c FROM o)
           |SELECT CAST(n_orders AS BIGINT) AS n_orders,
           |  CAST(mean_c AS BIGINT) AS mean_c,
           |  CAST((SELECT m FROM r WHERE r = 2) AS BIGINT) AS boot_lo_c,
           |  CAST((SELECT m FROM r WHERE r = 31) AS BIGINT) AS boot_hi_c
           |FROM p""".stripMargin
      }),

    // Label-propagation communities — see ops/Basket.labelPropagation.
    // Oracle = the mechanical 3-round unroll (min-of-modes tie-break
    // replayed with a windowed row_number on identical (cnt DESC,
    // lbl) order).
    "graph_label_propagation" -> Q(
      (s, d) => graft.ops.Basket.labelPropagation(Tables.lineitem(s, d),
        rounds = 3, minSupport = 2, k = 20),
      Some {
        val base =
          """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
            |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
            |      GROUP BY 1, 2 HAVING count(*) >= 2),
            |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0
            |                   UNION ALL SELECT pb, pa FROM e0),
            |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)""".stripMargin
        val rounds = (1 to 3).map { i =>
          s"""l$i AS MATERIALIZED (SELECT node, lbl FROM (
             |  SELECT node, lbl, row_number() OVER (PARTITION BY node
             |           ORDER BY cnt DESC, lbl) AS rn
             |  FROM (SELECT e.dst AS node, l.lbl, count(*) AS cnt
             |        FROM e JOIN l${i - 1} l ON l.node = e.src GROUP BY 1, 2))
             |  WHERE rn = 1)""".stripMargin
        }
        (Seq(base) ++ rounds).mkString(",\n") +
          """
            |SELECT CAST(lbl AS BIGINT) AS community, count(*) AS n_members
            |FROM l3 GROUP BY 1 ORDER BY n_members DESC, community LIMIT 20""".stripMargin
      }),

    // Repeat-payment audit — the fraud/data-entry screen every AP
    // system runs: pairs of orders from the SAME customer in the SAME
    // $100 amount band, histogrammed by time gap. The self-join keys
    // on (customer, amount band) — group sizes are bounded by
    // per-customer order counts, so the pair explosion is O(rows ·
    // ordersPerCustomer), never quadratic in the table; the gap
    // bucketing is exact integer day arithmetic.
    "quality_repeat_payments" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
          col("o_custkey").as("ck"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) div 10000").as("amt"),
          to_date(col("o_orderdate")).as("day"))
        val b = o.select(col("ok").as("ok2"), col("ck"), col("amt"),
          col("day").as("day2"))
        o.join(b, Seq("ck", "amt"))
          .filter(col("ok") < col("ok2"))
          .withColumn("gap", abs(datediff(col("day2"), col("day"))))
          .groupBy(when(col("gap") <= 90, "0-90")
            .when(col("gap") <= 365, "91-365").otherwise("365+").as("gap_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct("ck").as("n_customers"),
            sum(col("amt") * 100L).cast("long").as("amount_dollars"))
          .orderBy("gap_bucket")
      },
      Some(
        """WITH o AS (SELECT o_orderkey AS ok, o_custkey AS ck,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 10000 AS amt,
          |    CAST(o_orderdate AS DATE) AS day
          |  FROM orders),
          |p AS (SELECT a.ck, a.amt, abs(b.day - a.day) AS gap
          |      FROM o a JOIN o b ON b.ck = a.ck AND b.amt = a.amt AND a.ok < b.ok)
          |SELECT CASE WHEN gap <= 90 THEN '0-90'
          |            WHEN gap <= 365 THEN '91-365' ELSE '365+' END AS gap_bucket,
          |  count(*) AS n_pairs, count(DISTINCT ck) AS n_customers,
          |  CAST(sum(amt * 100) AS BIGINT) AS amount_dollars
          |FROM p GROUP BY 1 ORDER BY gap_bucket""".stripMargin)),

    // Gaps-and-islands: maximal consecutive-day activity streaks per
    // user, as a streak-length histogram — the engagement-streak panel.
    // The island key is the SQL-canon dayNumber − row_number trick, in
    // pure integers (days since epoch) so both engines agree; every
    // window partitions on the user.
    "window_gap_islands" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ud = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        ud.withColumn("dnum", datediff(col("day"), lit("1970-01-01")).cast("long"))
          .withColumn("rn", row_number().over(w))
          .withColumn("grp", col("dnum") - col("rn"))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy(col("len").cast("long").as("streak_len"))
          .agg(count(lit(1)).as("n_streaks"),
            countDistinct("user_id").as("n_users"))
          .orderBy("streak_len")
      },
      Some(
        """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
          |rn AS (SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS dnum,
          |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM ud),
          |isl AS (SELECT user_id, dnum - rn AS grp, count(*) AS len
          |        FROM rn GROUP BY 1, 2)
          |SELECT CAST(len AS BIGINT) AS streak_len, count(*) AS n_streaks,
          |  count(DISTINCT user_id) AS n_users
          |FROM isl GROUP BY 1 ORDER BY streak_len""".stripMargin)),

    // Day-of-week × hour traffic heatmap with the independence-model
    // deviation ratio (obs/expected ×1e6, expected = rowTotal·colTotal/n
    // — the chi-square grid's readout form): the dashboard that shows
    // WHEN the load concentrates. The dow comes from pure epoch-day
    // arithmetic ((days+4) mod 7, 0=Sunday) — date_format/dayofweek
    // conventions differ between engines, integers don't. One corpus
    // scan to the 168-cell grid; marginals join back broadcast.
    "events_dow_hour_heatmap" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        // the 168-row cell grid feeds FOUR consumers (cells + three
        // marginals): checkpoint it so the corpus scans once, not per
        // consumer
        val cell = Tables.events(s, d)
          .select(((datediff(to_date(col("ts")), lit("1970-01-01")) + 4) % 7)
              .cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .groupBy("dow", "hr").agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        val rt = cell.groupBy("dow").agg(sum("n").as("rt"))
        val ct = cell.groupBy("hr").agg(sum("n").as("ct"))
        val tot = cell.agg(sum("n").as("t"))
        cell.join(broadcast(rt), "dow").join(broadcast(ct), "hr")
          .crossJoin(broadcast(tot))
          .select(col("dow"), col("hr"), col("n").cast("long").as("n"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("n")) * dec(col("t")) * dec(lit(1000000L)),
              dec(col("rt")) * dec(col("ct"))).cast("long").as("ratio_x1e6"))
          .orderBy("dow", "hr")
      },
      Some(
        """WITH e AS (SELECT
          |    (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 4) % 7 AS dow,
          |    CAST(hour(ts) AS BIGINT) AS hr FROM events),
          |cell AS (SELECT dow, hr, count(*) AS n FROM e GROUP BY 1, 2),
          |rt AS (SELECT dow, CAST(sum(n) AS BIGINT) AS rt FROM cell GROUP BY 1),
          |ct AS (SELECT hr, CAST(sum(n) AS BIGINT) AS ct FROM cell GROUP BY 1),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cell)
          |SELECT dow, hr, CAST(n AS BIGINT) AS n,
          |  CAST(CAST(n AS HUGEINT) * t * 1000000
          |    // (CAST(rt AS HUGEINT) * ct) AS BIGINT) AS ratio_x1e6
          |FROM cell JOIN rt USING (dow) JOIN ct USING (hr) CROSS JOIN tot
          |ORDER BY dow, hr""".stripMargin)),

    // Herfindahl–Hirschman supplier-concentration index per nation:
    // HHI = Σ (supplier revenue share)², the antitrust/market-power
    // statistic ×1e6 in EXACT integers — Σrev² and (Σrev)² cross-
    // multiplied in DECIMAL(38,0), one integral division per nation.
    // The corpus collapses per supplier first (one shuffle on the
    // supplier key); the supplier→nation attach broadcasts.
    "stats_hhi_suppliers" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val sr = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey").as("sk"))
          .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("rev"))
        val sn = sr
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey").as("sk"), col("s_nationkey"))), "sk")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
            "s_nationkey")
        sn.groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).as("n_suppliers"),
            graft.functions.GraftFunctions.longDiv(
              sum(dec(col("rev")) * dec(col("rev"))) * dec(lit(1000000L)),
              dec(sum("rev")) * dec(sum("rev"))).cast("long").as("hhi_x1e6"))
          .orderBy("nation")
      },
      Some(
        """WITH sr AS (SELECT l_suppkey AS sk,
          |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          |  FROM lineitem GROUP BY 1),
          |sn AS (SELECT sk, rev, n_name FROM sr
          |       JOIN supplier ON s_suppkey = sk
          |       JOIN nation ON n_nationkey = s_nationkey)
          |SELECT n_name AS nation, count(*) AS n_suppliers,
          |  CAST(sum(CAST(rev AS HUGEINT) * rev) * 1000000
          |    // (CAST(sum(rev) AS HUGEINT) * sum(rev)) AS BIGINT) AS hhi_x1e6
          |FROM sn GROUP BY 1 ORDER BY nation""".stripMargin)),

    // Per-label embedding centroid drift between the even/odd vector
    // halves (the "old batch vs new batch" monitor an embedding
    // pipeline runs after each re-encode): squared L2 distance between
    // half-centroids in EXACT rational arithmetic — per dim the
    // difference s₁/n₁ − s₂/n₂ cross-multiplies to (s₁n₂ − s₂n₁), its
    // square sums in DECIMAL(38,0), one integral division by (n₁n₂)²
    // at the end. Components enter as floor(x·10⁶) integers (the
    // emb_dim_stats discipline); one explode, one (label, dim)
    // aggregation, everything after runs on the labels×64 frame.
    "emb_centroid_drift" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label"), (col("vec_id") % 2 === 0).as("ha"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val cell = q.groupBy("label", "dim")
          .agg(sum(when(col("ha"), col("q"))).as("s1"),
            sum(when(col("ha"), 1L).otherwise(0L)).as("n1"),
            sum(when(!col("ha"), col("q"))).as("s2"),
            sum(when(!col("ha"), 1L).otherwise(0L)).as("n2"))
        cell.groupBy(col("label").cast("long").as("label"))
          .agg(max("n1").cast("long").as("n_even"),
            max("n2").cast("long").as("n_odd"),
            graft.functions.GraftFunctions.longDiv(
              sum((dec(col("s1")) * dec(col("n2")) - dec(col("s2")) * dec(col("n1"))) *
                (dec(col("s1")) * dec(col("n2")) - dec(col("s2")) * dec(col("n1")))),
              dec(max("n1")) * dec(max("n2")) * dec(max("n1")) * dec(max("n2")))
              .cast("long").as("drift_l2sq_q"))
          .orderBy("label")
      },
      Some(
        """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT label, vec_id % 2 = 0 AS ha, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |cell AS (SELECT label, dim,
          |    CAST(sum(CASE WHEN ha THEN q END) AS HUGEINT) AS s1,
          |    CAST(sum(CASE WHEN ha THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
          |    CAST(sum(CASE WHEN NOT ha THEN q END) AS HUGEINT) AS s2,
          |    CAST(sum(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS HUGEINT) AS n2
          |  FROM q GROUP BY 1, 2)
          |SELECT CAST(label AS BIGINT) AS label,
          |  CAST(max(n1) AS BIGINT) AS n_even, CAST(max(n2) AS BIGINT) AS n_odd,
          |  CAST(sum((s1 * n2 - s2 * n1) * (s1 * n2 - s2 * n1))
          |    // (max(n1) * max(n2) * max(n1) * max(n2)) AS BIGINT) AS drift_l2sq_q
          |FROM cell GROUP BY label ORDER BY label""".stripMargin)),

    // Point-in-time customer feature snapshot — the feature-store
    // primitive: every feature computed AS OF a cutoff (90 days before
    // corpus end), using only orders on or before it, so training
    // never leaks the future. One customer-key collapse with
    // conditional sums for the trailing-90d window; the cutoff is a
    // 1-row broadcast. Top-20 by trailing revenue keeps the readout
    // bounded; the full frame is the same plan minus the limit.
    "features_customer_snapshot" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
          to_date(col("o_orderdate")).as("day"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
        val cut = o.agg(date_sub(max("day"), 90).as("cutoff"))
        o.crossJoin(broadcast(cut))
          .filter(col("day") <= col("cutoff"))
          .groupBy("ck")
          .agg(max("cutoff").as("cutoff"),
            count(lit(1)).as("n_orders"),
            sum(when(col("day") > date_sub(col("cutoff"), 90), 1L).otherwise(0L))
              .as("orders_90d"),
            coalesce(sum(when(col("day") > date_sub(col("cutoff"), 90),
              col("cents"))), lit(0L)).as("rev_90d_c"),
            datediff(max("cutoff"), max("day")).as("recency_days"),
            datediff(max("cutoff"), min("day")).as("tenure_days"))
          .select(col("ck").cast("long").as("custkey"),
            col("n_orders").cast("long").as("n_orders"),
            col("orders_90d").cast("long").as("orders_90d"),
            col("rev_90d_c").cast("long").as("rev_90d_c"),
            col("recency_days").cast("long").as("recency_days"),
            col("tenure_days").cast("long").as("tenure_days"))
          .orderBy(desc("rev_90d_c"), asc("custkey")).limit(20)
      },
      Some(
        """WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS day,
          |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
          |cut AS (SELECT max(day) - 90 AS cutoff FROM o),
          |f AS (SELECT ck,
          |    count(*) AS n_orders,
          |    sum(CASE WHEN day > cutoff - 90 THEN 1 ELSE 0 END) AS orders_90d,
          |    coalesce(sum(CASE WHEN day > cutoff - 90 THEN cents END), 0) AS rev_90d_c,
          |    CAST(max(cutoff) - max(day) AS BIGINT) AS recency_days,
          |    CAST(max(cutoff) - min(day) AS BIGINT) AS tenure_days
          |  FROM o CROSS JOIN cut WHERE day <= cutoff GROUP BY ck)
          |SELECT CAST(ck AS BIGINT) AS custkey, CAST(n_orders AS BIGINT) AS n_orders,
          |  CAST(orders_90d AS BIGINT) AS orders_90d,
          |  CAST(rev_90d_c AS BIGINT) AS rev_90d_c, recency_days, tenure_days
          |FROM f ORDER BY rev_90d_c DESC, custkey LIMIT 20""".stripMargin)),

    // Dedup survivorship audit: did min-id canonical selection keep
    // the BEST copy? Per near-dup cluster (the dedup_clusters
    // machinery), compare the canonical member's length against the
    // cluster max — the report that motivates quality-ranked
    // survivorship rules over arbitrary (min-id) ones. One readout
    // row; the oracle nests the full cluster unroll as a subselect
    // (the pipelineClusterKeep discipline — the two oracles cannot
    // drift).
    "pipeline_cluster_audit" -> Q(
      (s, d) => {
        val docs = plantedDocs(s, d, exact = false)
        val lbl = graft.ops.Dedup.duplicateClusters(
          graft.ops.Dedup.minhashPairs(docs, k = 8, bands = 4))
        val len = docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
        val cl = lbl.join(len, "doc_id")
          .groupBy("canonical_id")
          .agg(count(lit(1)).as("sz"), max("len").as("max_len"),
            max(when(col("doc_id") === col("canonical_id"), col("len")))
              .as("canon_len"),
            sum(when(col("doc_id") =!= col("canonical_id"), col("len")))
              .as("drop_len"),
            sum(when(col("doc_id") =!= col("canonical_id"), 1L).otherwise(0L))
              .as("n_drop"))
          .filter(col("sz") >= 2)
        cl.agg(count(lit(1)).cast("long").as("n_clusters"),
          sum(when(col("canon_len") === col("max_len"), 1L).otherwise(0L))
            .cast("long").as("n_canonical_longest"),
          expr("sum(canon_len) div count(*)").cast("long").as("mean_kept_chars"),
          expr("sum(drop_len) div sum(n_drop)").cast("long").as("mean_dropped_chars"))
      },
      Some(
        s"""WITH lbl AS MATERIALIZED (SELECT * FROM (${TextSql.dedupClusters()})),
           |${TextSql.plantCteRenamed("docs2")},
           |m AS (SELECT l.doc_id, l.canonical_id, length(d.text) AS len
           |      FROM lbl l JOIN docs2 d USING (doc_id)),
           |cl AS (SELECT canonical_id, count(*) AS sz, max(len) AS max_len,
           |    max(CASE WHEN doc_id = canonical_id THEN len END) AS canon_len,
           |    sum(CASE WHEN doc_id <> canonical_id THEN len END) AS drop_len,
           |    sum(CASE WHEN doc_id <> canonical_id THEN 1 ELSE 0 END) AS n_drop
           |  FROM m GROUP BY 1 HAVING count(*) >= 2)
           |SELECT count(*) AS n_clusters,
           |  CAST(sum(CASE WHEN canon_len = max_len THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_canonical_longest,
           |  CAST(sum(canon_len) // count(*) AS BIGINT) AS mean_kept_chars,
           |  CAST(sum(drop_len) // sum(n_drop) AS BIGINT) AS mean_dropped_chars
           |FROM cl""".stripMargin)),

    // Fulfillment SLA compliance per order priority: share of orders
    // whose FIRST line shipped within 30 days. One keyed fact–fact
    // join (order grain collapse with map-side combine), then the
    // priority rollup; rate ×1e6 exact.
    "orders_sla_compliance" -> Q(
      (s, d) => {
        val f = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            to_date(col("o_orderdate")).as("od"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey").as("o_orderkey"),
              to_date(col("l_shipdate")).as("sd")), "o_orderkey")
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(datediff(min("sd"), min("od")).cast("long").as("lag_days"))
        f.groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("lag_days") <= 30, 1L).otherwise(0L)).cast("long")
              .as("n_on_time"),
            expr("sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) * 1000000L div count(*)")
              .cast("long").as("on_time_x1e6"))
          .orderBy("priority")
      },
      Some(
        """WITH f AS (SELECT o_orderkey, o_orderpriority,
          |    CAST(min(CAST(l_shipdate AS DATE)) - CAST(min(o_orderdate) AS DATE) AS BIGINT)
          |      AS lag_days
          |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |  GROUP BY 1, 2)
          |SELECT o_orderpriority AS priority, count(*) AS n_orders,
          |  CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
          |  CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) * 1000000 // count(*)
          |    AS BIGINT) AS on_time_x1e6
          |FROM f GROUP BY 1 ORDER BY priority""".stripMargin)),

    // Maximum drawdown of the daily revenue series — the risk metric
    // read off any cumulative-performance dashboard: running peak via
    // a window over the SPAN-BOUNDED day frame (the corpus collapses
    // to one row per day first), drawdown = peak − value, worst day
    // reported with an exact ×1e6 relative depth. First-occurrence
    // tie-break (draw DESC, day ASC) pins determinism.
    "stats_max_drawdown" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("rev"))
        val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        day.withColumn("peak", max("rev").over(w))
          .withColumn("draw", col("peak") - col("rev"))
          .select(date_format(col("d"), "yyyy-MM-dd").as("trough_day"),
            col("peak").cast("long").as("peak_c"),
            col("rev").cast("long").as("trough_c"),
            col("draw").cast("long").as("drawdown_c"),
            graft.functions.GraftFunctions.longDiv(
              col("draw").cast("decimal(38,0)") * lit(1000000L).cast("decimal(38,0)"),
              col("peak").cast("decimal(38,0)")).cast("long").as("drawdown_x1e6"))
          .orderBy(desc("drawdown_c"), asc("trough_day")).limit(1)
      },
      Some(
        """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          |  FROM orders GROUP BY 1),
          |r AS (SELECT d, rev, max(rev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
          |        PRECEDING AND CURRENT ROW) AS peak FROM day),
          |dd AS (SELECT d, rev, peak, peak - rev AS draw FROM r)
          |SELECT strftime(d, '%Y-%m-%d') AS trough_day, CAST(peak AS BIGINT) AS peak_c,
          |  CAST(rev AS BIGINT) AS trough_c, CAST(draw AS BIGINT) AS drawdown_c,
          |  CAST(CAST(draw AS HUGEINT) * 1000000 // peak AS BIGINT) AS drawdown_x1e6
          |FROM dd ORDER BY draw DESC, d LIMIT 1""".stripMargin)),

    // Local bridges of the support-pruned co-order graph: edges whose
    // endpoints share NO common neighbor — removing one disconnects
    // its endpoints locally (Granovetter's weak ties). The closed-pair
    // frame comes from the wedge join (the clusteringCoeff Σdeg²
    // bound); bridge status is ONE left probe with a conditional agg
    // (the referential-integrity shape — no anti-join + scalar cross).
    "graph_local_bridges" -> Q(
      (s, d) => {
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb").localCheckpoint(true)
        val adj = e0.unionByName(
          e0.select(col("pb").as("pa"), col("pa").as("pb")))
        val closed = adj.as("w1")
          .join(adj.as("w2"), col("w1.pb") === col("w2.pa"))
          .filter(col("w1.pa") < col("w2.pb"))
          .select(col("w1.pa").as("pa"), col("w2.pb").as("pb")).distinct()
          .withColumn("hit", lit(1))
        e0.join(closed, Seq("pa", "pb"), "left")
          .agg(count(lit(1)).cast("long").as("n_edges"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_bridges"),
            expr("sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) * 1000000L div count(*)")
              .cast("long").as("bridge_x1e6"))
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |adj AS MATERIALIZED (SELECT pa AS a, pb AS b FROM e0
          |                     UNION ALL SELECT pb, pa FROM e0),
          |closed AS (SELECT DISTINCT w1.a AS pa, w2.b AS pb
          |           FROM adj w1 JOIN adj w2 ON w2.a = w1.b
          |           WHERE w1.a < w2.b),
          |cl AS (SELECT e0.pa, e0.pb,
          |         EXISTS (SELECT 1 FROM closed c
          |                 WHERE c.pa = e0.pa AND c.pb = e0.pb) AS has_cn
          |       FROM e0)
          |SELECT count(*) AS n_edges,
          |  CAST(sum(CASE WHEN has_cn THEN 0 ELSE 1 END) AS BIGINT) AS n_bridges,
          |  CAST(sum(CASE WHEN has_cn THEN 0 ELSE 1 END) * 1000000 // count(*)
          |    AS BIGINT) AS bridge_x1e6
          |FROM cl""".stripMargin)),

    // Inter-arrival-time distribution per event type — the
    // point-process diagnostic behind rate limiting and session-gap
    // tuning: per-user consecutive gaps (user-partitioned window, ties
    // broken on event_id), bucketed by FIXED integer thresholds
    // (<1m/<10m/<1h/<6h/<1d/≥1d — no float log in the gate). Type is
    // the LATER event's.
    "events_inter_arrival" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("gap_s", expr(
            "(unix_micros(ts) - unix_micros(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) div 1000000"))
          .filter(col("gap_s").isNotNull)
          .groupBy(col("event_type"),
            when(col("gap_s") < 60, "0_lt_1m").when(col("gap_s") < 600, "1_lt_10m")
              .when(col("gap_s") < 3600, "2_lt_1h")
              .when(col("gap_s") < 21600, "3_lt_6h")
              .when(col("gap_s") < 86400, "4_lt_1d").otherwise("5_ge_1d")
              .as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bucket")
      },
      Some(
        """WITH g AS (SELECT event_type,
          |    CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) AS BIGINT) // 1000000 AS gap_s
          |  FROM events),
          |b AS (SELECT event_type,
          |    CASE WHEN gap_s < 60 THEN '0_lt_1m' WHEN gap_s < 600 THEN '1_lt_10m'
          |         WHEN gap_s < 3600 THEN '2_lt_1h' WHEN gap_s < 21600 THEN '3_lt_6h'
          |         WHEN gap_s < 86400 THEN '4_lt_1d' ELSE '5_ge_1d' END AS bucket
          |  FROM g WHERE gap_s IS NOT NULL)
          |SELECT event_type, bucket, count(*) AS n
          |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Embedding-quality AUC: cosine similarity as a same-label
    // classifier over a DETERMINISTIC pair sample (offsets +1/+7/+41
    // on the vector id — linear pair volume, keyed joins), scored by
    // the exact Mann–Whitney rank statistic. Ranking is strict
    // (cos, pair-key) order — midrank tie handling would need float
    // averaging; with 6-dp cosines ties are rare and the strict rank
    // is engine-invariant. Ranks from the two-phase bucketedRank (no
    // corpus-sized window; scores shift +1e6 so range bucketing stays
    // order-preserving across negatives).
    "emb_cosine_auc" -> Q(
      (s, d) => {
        val v = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("e"))
        val offs = v.select(col("vec_id").as("ia"), col("label").as("la"),
            col("e").as("ea"), explode(expr("array(1L, 7L, 41L)")).as("off"))
          .withColumn("ib", col("ia") + col("off"))
        val pairs = offs.join(v.select(col("vec_id").as("ib"),
            col("label").as("lb"), col("e").as("eb")), "ib")
          .withColumn("c6", floor(round(graft.ops.Similarity.cosine(
            col("ea"), col("eb")), 6) * 1000000).cast("long"))
          .select((col("la") === col("lb")).as("same"),
            (col("c6") + 1000000L).as("c6s"),
            (col("ia") * 100L + col("off")).as("tk"))
        val ranked = graft.ops.Stats.bucketedRank(pairs, "c6s", "tk",
          bucketWidth = 4096L)
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        ranked.agg(count(lit(1)).as("n"),
            sum(when(col("same"), 1L).otherwise(0L)).as("np"),
            sum(when(col("same"), col("rank"))).as("u"))
          .select(col("n").cast("long").as("n_pairs"),
            col("np").cast("long").as("n_same"),
            (col("n") - col("np")).cast("long").as("n_diff"),
            // (u − np(np+1)/2)/(np·nn) doubled on both sides keeps the
            // arithmetic division-free until the one integral divide
            graft.functions.GraftFunctions.longDiv(
              (dec(lit(2L)) * dec(col("u")) -
                dec(col("np")) * (dec(col("np")) + dec(lit(1L)))) * dec(lit(1000000L)),
              dec(lit(2L)) * dec(col("np")) * (dec(col("n")) - dec(col("np"))))
              .cast("long").as("auc_x1e6"))
      },
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |p AS (SELECT a.vec_id AS ia, o.off, a.label = b.label AS same,
          |    CAST(floor(round(list_dot_product(a.e, b.e)
          |      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
          |      * 1000000) AS BIGINT) AS c6
          |  FROM v a
          |  CROSS JOIN (SELECT unnest([1, 7, 41]) AS off) o
          |  JOIN v b ON b.vec_id = a.vec_id + o.off),
          |r AS (SELECT same, row_number() OVER (ORDER BY c6, ia * 100 + off) AS rnk
          |      FROM p),
          |s AS (SELECT CAST(count(*) AS HUGEINT) AS np, CAST(sum(rnk) AS HUGEINT) AS u
          |      FROM r WHERE same),
          |t AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM r)
          |SELECT CAST(n AS BIGINT) AS n_pairs, CAST(np AS BIGINT) AS n_same,
          |  CAST(n - np AS BIGINT) AS n_diff,
          |  CAST((u - np * (np + 1) // 2) * 1000000 // (np * (n - np)) AS BIGINT)
          |    AS auc_x1e6
          |FROM s CROSS JOIN t""".stripMargin)),

    // Day-over-day top revenue movers per nation — the anomaly feed of
    // every revenue dashboard. Change ratio is SIGN-FACTORED
    // (±|Δ|·1e6 div prev): DuckDB's // floors while Spark's div
    // truncates, so signed division would drift by one on every
    // negative change (the round-6 integral-division guard). Windows
    // partition per nation over its day frame.
    "date_top_movers" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nd = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
            col("c_nationkey")), "o_custkey")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            "c_nationkey")
          .groupBy(col("n_name"), to_date(col("o_orderdate")).as("d"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("rev"))
        val w = Window.partitionBy("n_name").orderBy("d")
        nd.withColumn("prev", lag("rev", 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("change_x1e6",
            when(col("rev") >= col("prev"),
              expr("(rev - prev) * 1000000L div prev"))
              .otherwise(-expr("(prev - rev) * 1000000L div prev")).cast("long"))
          .select(col("n_name").as("nation"),
            date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("rev").cast("long").as("rev_c"),
            col("prev").cast("long").as("prev_c"), col("change_x1e6"))
          .orderBy(abs(col("change_x1e6")).desc, col("nation"), col("day"))
          .limit(10)
      },
      Some(
        """WITH nd AS (SELECT n_name, CAST(o_orderdate AS DATE) AS d,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  JOIN nation ON n_nationkey = c_nationkey
          |  GROUP BY 1, 2),
          |l AS (SELECT n_name, d, rev,
          |    lag(rev) OVER (PARTITION BY n_name ORDER BY d) AS prev FROM nd),
          |c AS (SELECT n_name, d, rev, prev,
          |    CAST(CASE WHEN rev >= prev THEN (rev - prev) * 1000000 // prev
          |         ELSE -((prev - rev) * 1000000 // prev) END AS BIGINT) AS change_x1e6
          |  FROM l WHERE prev IS NOT NULL)
          |SELECT n_name AS nation, strftime(d, '%Y-%m-%d') AS day,
          |  CAST(rev AS BIGINT) AS rev_c, CAST(prev AS BIGINT) AS prev_c, change_x1e6
          |FROM c ORDER BY abs(change_x1e6) DESC, nation, day LIMIT 10""".stripMargin)),

    // Exact median and mode per event type — the order statistics the
    // reference's COUNT-only aggregate surface lacked entirely. Both
    // come from the per-type distinct-VALUE frame (the KS discipline:
    // the value domain is bounded, so the cumulative window runs over
    // ≤10k rows per type, never the corpus): lower median = first
    // value with 2·cum ≥ n+1 in pure integers, mode = (count DESC,
    // value) head.
    "agg_median_mode" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dc = Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
          .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        val tot = dc.groupBy("event_type").agg(sum("cnt").as("n"))
        val cum = dc.withColumn("cum",
          sum("cnt").over(Window.partitionBy("event_type").orderBy("c")))
        val med = cum.join(broadcast(tot), "event_type")
          .filter(col("cum") * 2 >= col("n") + 1)
          .groupBy("event_type").agg(min("c").as("median_c"))
        val mode = dc.withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy(desc("cnt"), asc("c"))))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("c").as("mode_c"), col("cnt").as("mode_n"))
        tot.join(broadcast(med), "event_type").join(broadcast(mode), "event_type")
          .select(col("event_type"), col("n").cast("long").as("n"),
            col("median_c").cast("long").as("median_c"),
            col("mode_c").cast("long").as("mode_c"),
            col("mode_n").cast("long").as("mode_n"))
          .orderBy("event_type")
      },
      Some(
        """WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
          |  FROM events),
          |dc AS (SELECT event_type, c, count(*) AS cnt FROM v GROUP BY 1, 2),
          |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM dc GROUP BY 1),
          |cum AS (SELECT event_type, c, cnt,
          |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
          |  FROM dc),
          |med AS (SELECT event_type, min(c) AS median_c
          |        FROM cum JOIN tot USING (event_type)
          |        WHERE cum * 2 >= n + 1 GROUP BY 1),
          |mode AS (SELECT event_type, c AS mode_c, cnt AS mode_n FROM (
          |    SELECT event_type, c, cnt,
          |      row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, c) AS rn
          |    FROM dc) WHERE rn = 1)
          |SELECT event_type, n, median_c, mode_c, CAST(mode_n AS BIGINT) AS mode_n
          |FROM tot JOIN med USING (event_type) JOIN mode USING (event_type)
          |ORDER BY event_type""".stripMargin)),

    // Calendar-month seasonality index of order revenue: per-month
    // average order value vs the overall average, cross-multiplied
    // into one exact integral division — the 12-row deseasonalization
    // table every forecast pipeline starts from.
    "date_seasonality_index" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val m = Tables.orders(s, d)
          .groupBy(month(col("o_orderdate")).cast("long").as("mo"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("s"),
            count(lit(1)).as("c"))
        val t = m.agg(sum("s").as("st"), sum("c").as("ct"))
        m.crossJoin(broadcast(t))
          .select(col("mo"), col("c").cast("long").as("n_orders"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("s")) * dec(col("ct")) * dec(lit(1000000L)),
              dec(col("c")) * dec(col("st"))).cast("long").as("index_x1e6"))
          .orderBy("mo")
      },
      Some(
        """WITH m AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS mo,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
          |    count(*) AS c
          |  FROM orders GROUP BY 1),
          |t AS (SELECT CAST(sum(s) AS HUGEINT) AS st, CAST(sum(c) AS HUGEINT) AS ct FROM m)
          |SELECT mo, CAST(c AS BIGINT) AS n_orders,
          |  CAST(CAST(s AS HUGEINT) * ct * 1000000 // (CAST(c AS HUGEINT) * st)
          |    AS BIGINT) AS index_x1e6
          |FROM m CROSS JOIN t ORDER BY mo""".stripMargin)),

    // Flesch reading-ease per source (×1e3 fixed point): words and
    // vowel-group syllable proxies from regexp_extract_all counts,
    // sentences from terminal-punctuation runs — the classic
    // 206.835 − 1.015·(W/S) − 84.6·(Y/W) with each ratio term
    // TRUNCATED to an integer before the sum (documented quantization;
    // both engines truncate identically on non-negative operands). One
    // codegen scan; the readability member of the text-QA suite.
    "text_readability_flesch" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          greatest(expr(
            "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)"),
            lit(1L)).as("w"),
          greatest(expr(
            "CAST(size(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT)"),
            lit(1L)).as("sn"),
          greatest(expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)"),
            lit(1L)).as("y"))
        .withColumn("fx", lit(206835L) - expr("(1015L * w) div sn") -
          expr("(84600L * y) div w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          // sign-factored mean: fx can go negative on vowel-heavy text
          // and floor (DuckDB //) vs truncate (Spark div) differ there
          when(sum("fx") >= 0, expr("sum(fx) div count(*)"))
            .otherwise(-expr("(-sum(fx)) div count(*)"))
            .cast("long").as("mean_flesch_x1e3"))
        .orderBy("source"),
      Some(
        """WITH f AS (SELECT source,
          |    greatest(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT), 1) AS w,
          |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS sn,
          |    greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT), 1) AS y
          |  FROM documents),
          |sc AS (SELECT source,
          |    206835 - (1015 * w) // sn - (84600 * y) // w AS fx
          |  FROM f)
          |SELECT source, count(*) AS n_docs,
          |  CAST(CASE WHEN sum(fx) >= 0 THEN sum(fx) // count(*)
          |       ELSE -((-sum(fx)) // count(*)) END AS BIGINT) AS mean_flesch_x1e3
          |FROM sc GROUP BY 1 ORDER BY source""".stripMargin)),

    // Gopher-style quality-filter rule table (Rae et al. 2112.11446
    // §A1.1): per rule, how many docs it would remove — word-count
    // bounds, mean-word-length bounds, alphanumeric-symbol ratio,
    // stopword coverage — plus the pass-all row. Every predicate is an
    // exact integer cross-multiplication; ONE codegen scan computes all
    // five counters (conditional sums), unpivoted with stack() on the
    // 1-row aggregate — never a pass per rule.
    "pipeline_gopher_rules" -> Q(
      (s, d) => {
        val f = Tables.documents(s, d).select(
          expr("CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)").as("w"),
          expr("CAST(size(regexp_extract_all(lower(text), '[a-z0-9]', 0)) AS BIGINT)").as("alnum"),
          expr("CAST(length(text) AS BIGINT)").as("chars"),
          expr("CAST(size(regexp_extract_all(lower(text), '\\\\b(the|and|of|to|a|in|is|that|it|for)\\\\b', 0)) AS BIGINT)").as("sw"))
        val r = f.select(
          (col("w") < 50 || col("w") > 100000).as("r1"),
          (col("w") === 0 || col("chars") * 10 < col("w") * 30 ||
            col("chars") * 10 > col("w") * 100).as("r2"),
          (col("alnum") * 10 < col("chars") * 7).as("r3"),
          (col("sw") * 100 < col("w") * 2).as("r4"))
        r.agg(sum(when(col("r1"), 1L).otherwise(0L)).as("c1"),
            sum(when(col("r2"), 1L).otherwise(0L)).as("c2"),
            sum(when(col("r3"), 1L).otherwise(0L)).as("c3"),
            sum(when(col("r4"), 1L).otherwise(0L)).as("c4"),
            sum(when(!(col("r1") || col("r2") || col("r3") || col("r4")), 1L)
              .otherwise(0L)).as("c5"))
          .select(expr(
            """stack(5, '1_word_count', c1, '2_mean_word_len', c2,
              |'3_symbol_ratio', c3, '4_stopword_ratio', c4,
              |'5_pass_all', c5) AS (rule, n_violations)""".stripMargin))
          .select(col("rule"), col("n_violations").cast("long").as("n_violations"))
          .orderBy("rule")
      },
      Some(
        """WITH f AS (SELECT doc_id,
          |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS w,
          |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]')) AS BIGINT) AS alnum,
          |    CAST(length(text) AS BIGINT) AS chars,
          |    CAST(len(regexp_extract_all(lower(text),
          |      '\b(the|and|of|to|a|in|is|that|it|for)\b')) AS BIGINT) AS sw
          |  FROM documents),
          |r AS (SELECT doc_id,
          |    w < 50 OR w > 100000 AS r1,
          |    w = 0 OR (chars * 10 < w * 30) OR (chars * 10 > w * 100) AS r2,
          |    alnum * 10 < chars * 7 AS r3,
          |    sw * 100 < w * 2 AS r4
          |  FROM f)
          |SELECT * FROM (
          |  SELECT '1_word_count' AS rule,
          |    CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations FROM r
          |  UNION ALL SELECT '2_mean_word_len',
          |    CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) FROM r
          |  UNION ALL SELECT '3_symbol_ratio',
          |    CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) FROM r
          |  UNION ALL SELECT '4_stopword_ratio',
          |    CAST(sum(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) FROM r
          |  UNION ALL SELECT '5_pass_all',
          |    CAST(sum(CASE WHEN NOT (r1 OR r2 OR r3 OR r4) THEN 1 ELSE 0 END)
          |      AS BIGINT) FROM r)
          |ORDER BY rule""".stripMargin)),

    // Fano factor (variance-to-mean ratio) of hourly volume per event
    // type — the burstiness scalar: 1 = Poisson, <1 regular, >1 bursty.
    // Exact: Fano·1e6 = (n·Σx² − (Σx)²)·1e6 div (n·Σx), all integer.
    // Complements the runs test (sign sequence) with a magnitude view.
    "stats_fano_factor" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
          .agg(count(lit(1)).as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_hours"),
            sum("x").cast("long").as("n_events"),
            graft.functions.GraftFunctions.longDiv(
              (dec(count(lit(1))) * sum(dec(col("x")) * dec(col("x"))) -
                dec(sum("x")) * dec(sum("x"))) * dec(lit(1000000L)),
              dec(count(lit(1))) * dec(sum("x"))).cast("long").as("fano_x1e6"))
          .orderBy("event_type")
      },
      Some(
        """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
          |    CAST(sum(x) AS HUGEINT) AS s, CAST(sum(x * x) AS HUGEINT) AS s2
          |  FROM h GROUP BY 1)
          |SELECT event_type, CAST(n AS BIGINT) AS n_hours, CAST(s AS BIGINT) AS n_events,
          |  CAST((n * s2 - s * s) * 1000000 // (n * s) AS BIGINT) AS fano_x1e6
          |FROM a ORDER BY event_type""".stripMargin)),

    // Basket-size distribution — lines per order histogram, the
    // one-glance profile behind every join-fanout and pair-explosion
    // cost model in this engine (the co-order pair volume is
    // Σ C(size,2) of exactly this table).
    "orders_basket_size_dist" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").cast("long").as("basket_size"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("basket_size"),
      Some(
        """WITH b AS (SELECT l_orderkey, count(*) AS sz FROM lineitem GROUP BY 1)
          |SELECT CAST(sz AS BIGINT) AS basket_size, count(*) AS n_orders
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Spearman rank correlation per nation between customer account
    // balance and lifetime order spend. Ranks are ROW_NUMBER over a
    // deterministic total order (value, custkey) — tie-FREE by
    // construction, so the no-tie identity rho = 1 − 6·Σd²/(n(n²−1))
    // is exact and engine-invariant (an avg-rank tie treatment would
    // need Pearson-on-ranks with a sqrt — not integer-exact). One
    // shuffle on nationkey serves both rank windows; the spend frame
    // is a keyed pre-aggregation (customer-cardinality, not orders).
    "stats_spearman_rho" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val spend = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("spend_c"))
        val base = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_nationkey"), col("c_custkey"),
            expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal_c"),
            coalesce(col("spend_c"), lit(0L)).as("sp_c"))
        val wx = Window.partitionBy("c_nationkey").orderBy(col("bal_c"), col("c_custkey"))
        val wy = Window.partitionBy("c_nationkey").orderBy(col("sp_c"), col("c_custkey"))
        base
          .withColumn("dd", (row_number().over(wx).cast("long") -
            row_number().over(wy).cast("long")))
          .groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(col("dd") * col("dd")).cast("long").as("sum_d2"))
          .filter(col("n") >= 2)
          .withColumn("den",
            dec(col("n")) * (dec(col("n")) * dec(col("n")) - lit(1L).cast("decimal(38,0)")))
          .withColumn("num", col("den") - lit(6L).cast("decimal(38,0)") * dec(col("sum_d2")))
          .select(col("nationkey"), col("n"), col("sum_d2"),
            when(col("num") >= 0,
              graft.functions.GraftFunctions.longDiv(
                col("num") * lit(1000000L).cast("decimal(38,0)"), col("den")))
              .otherwise(-graft.functions.GraftFunctions.longDiv(
                (-col("num")) * lit(1000000L).cast("decimal(38,0)"), col("den")))
              .cast("long").as("rho_x1e6"))
          .orderBy("nationkey")
      },
      Some(
        """WITH sp AS (SELECT o_custkey,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sp_c
          |  FROM orders GROUP BY 1),
          |b AS (SELECT c_nationkey, c_custkey,
          |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
          |    coalesce(sp.sp_c, 0) AS sp_c
          |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
          |r AS (SELECT c_nationkey,
          |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY bal_c, c_custkey) AS BIGINT)
          |      - CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY sp_c, c_custkey) AS BIGINT)
          |      AS dd
          |  FROM b),
          |a AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
          |    CAST(count(*) AS HUGEINT) AS n, CAST(sum(dd * dd) AS HUGEINT) AS s2
          |  FROM r GROUP BY 1 HAVING count(*) >= 2)
          |SELECT nationkey, CAST(n AS BIGINT) AS n, CAST(s2 AS BIGINT) AS sum_d2,
          |  CAST(CASE WHEN n * (n * n - 1) - 6 * s2 >= 0
          |    THEN (n * (n * n - 1) - 6 * s2) * 1000000 // (n * (n * n - 1))
          |    ELSE -((-(n * (n * n - 1) - 6 * s2)) * 1000000 // (n * (n * n - 1)))
          |    END AS BIGINT) AS rho_x1e6
          |FROM a ORDER BY nationkey""".stripMargin)),

    // Mann–Kendall trend statistic on the daily revenue series per
    // order priority: S = Σ_{i<j} sign(x_j − x_i), plus exact Kendall
    // tau-a ×1e6 = S div C(n,2). The pair join runs on the
    // DAY-AGGREGATED frame — its volume is (date-span)², bounded by the
    // calendar and CORPUS-SIZE INDEPENDENT (the corpus scan is one
    // keyed aggregation); the complement to Theil–Sen (slope) and CUSUM
    // (changepoint location): a distribution-free monotone-trend test.
    "stats_mann_kendall" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"), col("o_orderdate"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("rev_c"))
        val a = day.select(col("o_orderpriority").as("pri"),
          col("o_orderdate").as("d1"), col("rev_c").as("x1"))
        val b = day.select(col("o_orderpriority").as("pri2"),
          col("o_orderdate").as("d2"), col("rev_c").as("x2"))
        a.join(b, col("pri") === col("pri2") && col("d1") < col("d2"))
          .groupBy(col("pri").as("o_orderpriority"))
          .agg(
            (countDistinct(col("d1")) + lit(1L)).cast("long").as("n_days"),
            sum(when(col("x2") > col("x1"), 1L)
              .when(col("x2") < col("x1"), -1L).otherwise(0L))
              .cast("long").as("s_stat"))
          // tau = S / C(n,2); computed as 2·S·1e6 div (n(n−1)) — the
          // doubled form keeps every operand integral (no decimal
          // division scale), mathematically identical since n(n−1) is
          // even.
          .withColumn("den",
            dec(col("n_days")) * (dec(col("n_days")) - lit(1L).cast("decimal(38,0)")))
          .select(col("o_orderpriority"), col("n_days"), col("s_stat"),
            when(col("s_stat") >= 0,
              graft.functions.GraftFunctions.longDiv(
                dec(col("s_stat")) * lit(2000000L).cast("decimal(38,0)"), col("den")))
              .otherwise(-graft.functions.GraftFunctions.longDiv(
                (-dec(col("s_stat"))) * lit(2000000L).cast("decimal(38,0)"), col("den")))
              .cast("long").as("tau_x1e6"))
          .orderBy("o_orderpriority")
      },
      Some(
        """WITH day AS (SELECT o_orderpriority AS pri, o_orderdate AS dd,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
          |  FROM orders GROUP BY 1, 2),
          |p AS (SELECT a.pri,
          |    CAST(count(DISTINCT a.dd) + 1 AS HUGEINT) AS n_days,
          |    CAST(sum(CASE WHEN b.rev_c > a.rev_c THEN 1
          |        WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END) AS HUGEINT) AS s_stat
          |  FROM day a JOIN day b ON a.pri = b.pri AND a.dd < b.dd
          |  GROUP BY 1)
          |SELECT pri AS o_orderpriority, CAST(n_days AS BIGINT) AS n_days,
          |  CAST(s_stat AS BIGINT) AS s_stat,
          |  CAST(CASE WHEN s_stat >= 0
          |    THEN s_stat * 2000000 // (n_days * (n_days - 1))
          |    ELSE -((-s_stat) * 2000000 // (n_days * (n_days - 1)))
          |    END AS BIGINT) AS tau_x1e6
          |FROM p ORDER BY o_orderpriority""".stripMargin)),

    // Open-order backlog depth: how many orders are placed but not yet
    // fully shipped, tracked as a DIFFERENCE ARRAY (+1 at order date,
    // −1 at last ship date) cumulated over the day axis — the interval
    // stabbing count WITHOUT an interval join (the r9 interval-overlap
    // join materializes pairs; this is the O(days) aggregate twin a
    // 100 TB warehouse uses for queue-depth dashboards). The global
    // cumulative window runs on the day-delta frame only (≤ date-span
    // rows — the pipeline_shard_budget SinglePartition discipline).
    // Depth is piecewise constant between change days; the monthly peak
    // reads the post-change value on change days in that month
    // (documented: a month with no state change does not emit a row).
    "orders_open_backlog" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val close = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("close_d"))
        val iv = Tables.orders(s, d)
          .join(close, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderdate").as("open_d"), col("close_d"))
          .filter(col("close_d") > col("open_d"))
        val deltas = iv.select(col("open_d").as("day"), lit(1L).as("delta"))
          .unionByName(iv.select(col("close_d").as("day"), lit(-1L).as("delta")))
          .groupBy("day").agg(sum("delta").cast("long").as("delta"))
        deltas
          .withColumn("open_cnt",
            sum("delta").over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
          .groupBy(date_format(col("day"), "yyyy-MM").as("month"))
          .agg(max("open_cnt").cast("long").as("peak_open"),
            count(lit(1)).cast("long").as("n_change_days"))
          .orderBy("month")
      },
      Some(
        """WITH cl AS (SELECT l_orderkey, max(l_shipdate) AS close_d
          |  FROM lineitem GROUP BY 1),
          |iv AS (SELECT o_orderdate AS open_d, cl.close_d
          |  FROM orders JOIN cl ON o_orderkey = l_orderkey
          |  WHERE cl.close_d > o_orderdate),
          |dl AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM (
          |    SELECT open_d AS day, 1 AS delta FROM iv
          |    UNION ALL SELECT close_d, -1 FROM iv)
          |  GROUP BY 1),
          |c AS (SELECT day,
          |    CAST(sum(delta) OVER (ORDER BY day
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_cnt
          |  FROM dl)
          |SELECT strftime(day, '%Y-%m') AS month,
          |  CAST(max(open_cnt) AS BIGINT) AS peak_open,
          |  count(*) AS n_change_days
          |FROM c GROUP BY 1 ORDER BY month""".stripMargin)),

    // Lorenz curve / Pareto table of customer lifetime revenue: rank
    // every ordering customer by exact cents (ties broken by custkey),
    // cut into 10 explicit-arithmetic deciles
    // (decile = (rank−1)·10 div n + 1 — NOT the engines' NTILE, whose
    // remainder placement is convention), and read off each decile's
    // revenue share and cumulative share ×1e6. Ranking is
    // ops/Stats.bucketedRank — range-bucket + partitioned window +
    // tiny-offsets frame, the stats_gini_customers discipline, so no
    // corpus-sized SinglePartition sort; the only global window runs
    // on the 10-row decile frame. The "top decile owns X% of revenue"
    // readout that complements gini (one number) with the full curve.
    "stats_lorenz_deciles" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val rev = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("cust"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long").as("rev"))
        val ranked = graft.ops.Stats.bucketedRank(rev, "rev", "cust",
          bucketWidth = 1L << 22)
        val tot = ranked.agg(count(lit(1)).as("n"), sum("rev").as("total"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr("(rank - 1) * 10 div n + 1"))
          .groupBy(col("decile").cast("long").as("decile"))
          .agg(count(lit(1)).as("n_customers"),
            sum("rev").cast("long").as("rev_cents"),
            max("total").as("total"))
          .withColumn("cum_cents",
            sum("rev_cents").over(Window.orderBy("decile")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("decile"), col("n_customers"), col("rev_cents"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("rev_cents")) * dec(lit(1000000L)), dec(col("total")))
              .cast("long").as("share_x1e6"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("cum_cents")) * dec(lit(1000000L)), dec(col("total")))
              .cast("long").as("cum_share_x1e6"))
          .orderBy("decile")
      },
      Some(
        """WITH r AS (SELECT o_custkey AS cust,
          |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          |  FROM orders GROUP BY 1),
          |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
          |    CAST(sum(rev) AS HUGEINT) AS total FROM r),
          |rk AS (SELECT rev, row_number() OVER (ORDER BY rev, cust) AS rnk FROM r),
          |dd AS (SELECT (rnk - 1) * 10 // n + 1 AS decile, rev FROM rk CROSS JOIN t),
          |g AS (SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_customers,
          |    CAST(sum(rev) AS BIGINT) AS rev_cents FROM dd GROUP BY 1),
          |c AS (SELECT decile, n_customers, rev_cents,
          |    CAST(sum(rev_cents) OVER (ORDER BY decile) AS HUGEINT) AS cum FROM g)
          |SELECT decile, n_customers, rev_cents,
          |  CAST(CAST(rev_cents AS HUGEINT) * 1000000 // total AS BIGINT) AS share_x1e6,
          |  CAST(cum * 1000000 // total AS BIGINT) AS cum_share_x1e6
          |FROM c CROSS JOIN t ORDER BY decile""".stripMargin)),

    // Tukey-fence outlier census per event type, in exact integer
    // cents: Q1/Q3 are the values at ranks ceil(n/4) / ceil(3n/4)
    // (cum·4 ≥ n ⟺ cum ≥ ceil(n/4) for integers — no division
    // convention in the gate at all), read off the DISTINCT-value
    // cumulative frame (domain-bounded, the agg_median_mode
    // discipline); the 1.5·IQR fences are applied DOUBLED
    // (2v < 5·Q1 − 3·Q3 / 2v > 5·Q3 − 3·Q1) so the half-cent fence
    // positions never materialize as rationals. One corpus scan to the
    // distinct-value frame, every window partitioned by type.
    "stats_tukey_outliers" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dc = Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
          .groupBy("event_type", "c").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        val tot = dc.groupBy("event_type").agg(sum("cnt").as("n"))
        val cum = dc.withColumn("cum",
          sum("cnt").over(Window.partitionBy("event_type").orderBy("c")))
          .join(broadcast(tot), "event_type")
        val q1 = cum.filter(col("cum") * 4 >= col("n"))
          .groupBy("event_type").agg(min("c").as("q1_c"))
        val q3 = cum.filter(col("cum") * 4 >= col("n") * 3)
          .groupBy("event_type").agg(min("c").as("q3_c"))
        val fences = q1.join(q3, "event_type")
        dc.join(broadcast(fences), "event_type")
          .groupBy("event_type")
          .agg(sum("cnt").cast("long").as("n"),
            max("q1_c").cast("long").as("q1_c"),
            max("q3_c").cast("long").as("q3_c"),
            sum(when(col("c") * 2 < col("q1_c") * 5 - col("q3_c") * 3,
              col("cnt")).otherwise(0L)).cast("long").as("n_low"),
            sum(when(col("c") * 2 > col("q3_c") * 5 - col("q1_c") * 3,
              col("cnt")).otherwise(0L)).cast("long").as("n_high"))
          .orderBy("event_type")
      },
      Some(
        """WITH v AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
          |  FROM events),
          |dc AS (SELECT event_type, c, count(*) AS cnt FROM v GROUP BY 1, 2),
          |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM dc GROUP BY 1),
          |cum AS (SELECT event_type, c, cnt,
          |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
          |  FROM dc),
          |q1 AS (SELECT event_type, min(c) AS q1_c
          |       FROM cum JOIN tot USING (event_type)
          |       WHERE cum * 4 >= n GROUP BY 1),
          |q3 AS (SELECT event_type, min(c) AS q3_c
          |       FROM cum JOIN tot USING (event_type)
          |       WHERE cum * 4 >= n * 3 GROUP BY 1)
          |SELECT dc.event_type, CAST(sum(cnt) AS BIGINT) AS n,
          |  max(q1_c) AS q1_c, max(q3_c) AS q3_c,
          |  CAST(sum(CASE WHEN c * 2 < q1_c * 5 - q3_c * 3 THEN cnt ELSE 0 END)
          |    AS BIGINT) AS n_low,
          |  CAST(sum(CASE WHEN c * 2 > q3_c * 5 - q1_c * 3 THEN cnt ELSE 0 END)
          |    AS BIGINT) AS n_high
          |FROM dc JOIN q1 USING (event_type) JOIN q3 USING (event_type)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // k-truss census of the support-pruned co-order graph: edges in
    // ≥ k−2 triangles, support re-derived on survivors for 5 declared
    // peeling passes (ops/Basket.kTruss — the edge-grain sibling of
    // graph_kcore; the spec asserts the corpus fixpoint lands within
    // them, and proves the multi-round cascade on a crafted strip at
    // k=4). k=3 here — the triangle-connected backbone — because the
    // 4-truss of this corpus is empty past sf0.001 (measured), which
    // would gate nothing. The oracle unrolls the identical rounds with
    // MATERIALIZED CTEs (the graph_kcore discipline).
    "graph_k_truss" -> Q(
      (s, d) => graft.ops.Basket.kTruss(Tables.lineitem(s, d), k = kTrussK,
        rounds = 5, minSupport = 2),
      Some {
        val base =
          """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
            |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
            |      GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin
        val rounds = (1 to 5).map { i =>
          s"""w$i AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
             |  FROM e${i - 1} e1 JOIN e${i - 1} e2 ON e2.pa = e1.pb),
             |t$i AS MATERIALIZED (SELECT a, b, c FROM w$i WHERE EXISTS
             |  (SELECT 1 FROM e${i - 1} e WHERE e.pa = w$i.a AND e.pb = w$i.c)),
             |s$i AS (SELECT pa, pb FROM (
             |    SELECT pa, pb, count(*) AS sup FROM (
             |      SELECT a AS pa, b AS pb FROM t$i
             |      UNION ALL SELECT b, c FROM t$i
             |      UNION ALL SELECT a, c FROM t$i)
             |    GROUP BY 1, 2) WHERE sup >= ${kTrussK - 2}),
             |e$i AS MATERIALIZED (SELECT e.pa, e.pb FROM e${i - 1} e
             |  JOIN s$i s ON s.pa = e.pa AND s.pb = e.pb)""".stripMargin
        }.mkString(",\n")
        s"""$base,
           |$rounds
           |SELECT (SELECT count(*) FROM
           |    (SELECT pa AS n FROM e5 UNION SELECT pb FROM e5)) AS n_truss_nodes,
           |  (SELECT count(*) FROM e5) AS n_truss_edges""".stripMargin
      }),

    // Cramér's V² between part brand and lineitem return flag — the
    // normalized effect size stats_chi2_segments lacks (chi2 grows
    // with n; V² = chi2 / (n·min(r−1, c−1)) ∈ [0,1] is comparable
    // across corpus sizes, the screen a feature-selection pass ranks
    // by). Same exact-integer cell arithmetic as the chi2 query;
    // V²×1e9 derives from the FLOORED chi2_x1e6 (documented
    // quantization — both engines floor identically on non-negative
    // operands). ONE fact-table pass: the corpus is scanned once into
    // the tiny contingency frame obs (≤ brands × flags rows); the
    // margins rn/cn/tn are re-aggregations of obs, not re-scans — at
    // 100 TB the join+groupBy runs once and everything downstream is
    // driver-sized. V kept squared so no sqrt enters the gate.
    "stats_cramers_v" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        // no broadcast hint on part: the dim scales with the corpus (the
        // graph_modularity_brands discipline — at 100 TB part is the big
        // side); AQE picks broadcast at test SFs on its own
        val j = Tables.lineitem(s, d)
          .join(Tables.part(s, d)
            .select(col("p_partkey").as("l_partkey"), col("p_brand").as("brand")),
            "l_partkey")
          .select(col("brand"), col("l_returnflag").as("flag"))
        val obs = j.groupBy("brand", "flag").agg(count(lit(1)).as("obs0"))
          .localCheckpoint(true)
        val rn = obs.groupBy("brand").agg(sum("obs0").as("rn"))
        val cn = obs.groupBy("flag").agg(sum("obs0").as("cn"))
        val tn = obs.agg(sum("obs0").as("tn"))
        // cell basis = rows × columns (cross of the two TINY margin
        // frames), not the observed combos — a zero cell still
        // contributes rn·cn/tn to chi2 (a crafted perfect-association
        // fixture reads V² = 1 only with zero cells counted). The
        // broadcast hint is the CartesianGuard opt-in: margin frames
        // are domain-bounded (distinct brands × flags), never corpus
        val cells = rn.crossJoin(broadcast(cn))
          .join(obs, Seq("brand", "flag"), "left")
          .withColumn("obs", coalesce(col("obs0"), lit(0L)))
          .crossJoin(broadcast(tn))
          .withColumn("term_x1e6", graft.functions.GraftFunctions.longDiv(
            (dec(col("obs")) * dec(col("tn")) - dec(col("rn")) * dec(col("cn")))
              * (dec(col("obs")) * dec(col("tn")) - dec(col("rn")) * dec(col("cn")))
              * dec(lit(1000000L)),
            dec(col("rn")) * dec(col("cn")) * dec(col("tn"))).cast("long"))
        cells.agg(
            countDistinct(col("brand")).as("n_r"),
            countDistinct(col("flag")).as("n_c"),
            max(col("tn")).as("n"),
            sum("term_x1e6").as("chi2_x1e6"))
          .select(col("n").cast("long").as("n"),
            col("n_r").cast("long").as("n_r"),
            col("n_c").cast("long").as("n_c"),
            col("chi2_x1e6").cast("long").as("chi2_x1e6"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("chi2_x1e6")) * dec(lit(1000L)),
              dec(col("n")) * dec(least(col("n_r") - 1, col("n_c") - 1)))
              .cast("long").as("v2_x1e9"))
      },
      Some(
        """WITH j AS (SELECT p.p_brand AS brand, l.l_returnflag AS flag
          |           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
          |obs AS (SELECT brand, flag, count(*) AS obs FROM j GROUP BY 1, 2),
          |r AS (SELECT brand, count(*) AS rn FROM j GROUP BY 1),
          |c AS (SELECT flag, count(*) AS cn FROM j GROUP BY 1),
          |t AS (SELECT count(*) AS tn FROM j),
          |basis AS (SELECT r.brand, c.flag, r.rn, c.cn,
          |    coalesce(obs.obs, 0) AS obs
          |  FROM r CROSS JOIN c
          |  LEFT JOIN obs ON obs.brand = r.brand AND obs.flag = c.flag),
          |cells AS (SELECT
          |    CAST((CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
          |         * (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
          |         * 1000000
          |         // (CAST(rn AS HUGEINT) * cn * tn) AS BIGINT) AS term_x1e6,
          |    basis.brand, basis.flag, tn
          |  FROM basis CROSS JOIN t)
          |SELECT CAST(max(tn) AS BIGINT) AS n,
          |  count(DISTINCT brand) AS n_r,
          |  count(DISTINCT flag) AS n_c,
          |  CAST(sum(term_x1e6) AS BIGINT) AS chi2_x1e6,
          |  CAST(CAST(sum(term_x1e6) AS HUGEINT) * 1000
          |    // (CAST(max(tn) AS HUGEINT)
          |        * least(count(DISTINCT brand) - 1, count(DISTINCT flag) - 1))
          |    AS BIGINT) AS v2_x1e9
          |FROM cells""".stripMargin)),

    // PMI-ranked collocations: top bigrams by pointwise mutual
    // information, NOT raw count (text_bigram_topk) — PMI surfaces
    // pairs that co-occur far above chance even at modest counts, the
    // phrase-mining signal (Church & Hanks 1990). log is monotone, so
    // ranking by the exact rational p(xy)/(p(x)p(y)) =
    // c_xy·Nu²/(Nb·c_x·c_y) IS the PMI order — ×1e6 floored, ties
    // broken (w1, w2), no float log in the gate. Count floor ≥ 20
    // keeps the rare-pair PMI explosion out. One bigram explode scan;
    // unigram/bigram LM frames are vocab-sized keyed joins (the
    // text_bigram_surprisal shape).
    "text_bigram_pmi" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val toks = Tables.documents(s, d)
          .select(expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
        // uni appears in THREE consumers (nu + the c1/c2 joins) and bi
        // in two (nb + the ranking) — all as IDENTICAL subplans, so
        // Catalyst's ReusedExchange computes each groupBy exchange once
        // (verified: an eager localCheckpoint here measured SLOWER at
        // 30× because it blocks that reuse and forces a materialization)
        val uni = toks.select(explode(col("tk")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val nu = uni.agg(sum("cw").as("nu"))
        val biAll = toks.filter(size(col("tk")) >= 2)
          .select(explode(expr(
            "transform(slice(tk, 1, size(tk) - 1), (w, i) -> struct(w AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
        // nb = total bigram mass BEFORE the count floor (ADVICE r9): the
        // ratio is PMI against the full bigram distribution, not the
        // filtered subset — the floor only limits which pairs are RANKED
        val nb = biAll.agg(sum("n").as("nb"))
        val bi = biAll.filter(col("n") >= 20)
        bi
          .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
          .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
          .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
          .select(col("w1"), col("w2"), col("n").cast("long").as("n"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("n")) * dec(col("nu")) * dec(col("nu")) * dec(lit(1000000L)),
              dec(col("nb")) * dec(col("c1")) * dec(col("c2")))
              .cast("long").as("pmi_ratio_x1e6"))
          .orderBy(desc("pmi_ratio_x1e6"), asc("w1"), asc("w2")).limit(50)
      },
      Some(
        """WITH t AS (SELECT list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |uni AS (SELECT w, count(*) AS cw FROM (SELECT unnest(tk) AS w FROM t)
          |        GROUP BY 1),
          |nu AS (SELECT CAST(sum(cw) AS HUGEINT) AS nu FROM uni),
          |u AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
          |      FROM t WHERE len(tk) >= 2),
          |bi_all AS (SELECT tk[i] AS w1, tk[i + 1] AS w2, count(*) AS n
          |    FROM u GROUP BY 1, 2),
          |nb AS (SELECT CAST(sum(n) AS HUGEINT) AS nb FROM bi_all),
          |bi AS (SELECT w1, w2, n FROM bi_all WHERE n >= 20)
          |SELECT w1, w2, CAST(n AS BIGINT) AS n,
          |  CAST(CAST(n AS HUGEINT) * nu * nu * 1000000
          |    // (nb * CAST(c1.cw AS HUGEINT) * c2.cw) AS BIGINT) AS pmi_ratio_x1e6
          |FROM bi JOIN uni c1 ON c1.w = bi.w1 JOIN uni c2 ON c2.w = bi.w2
          |CROSS JOIN nu CROSS JOIN nb
          |ORDER BY pmi_ratio_x1e6 DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Code-vs-prose detector — the pre-tokenization routing split every
    // LLM data pipeline runs (code to a code tokenizer/mix weight,
    // prose to the text pipeline). Symbol-density heuristic: a doc is
    // "code" when 10 × count of [{}();=] chars > its whitespace token
    // count — braces/semicolons/assignments are ~absent from prose and
    // dense in every bracketed language. The corpus is pure prose, so
    // deterministic code-shaped variants of docs 0-39 are planted
    // in-query under doc_id+400000 (the dedup_canonical discipline):
    // the per-source census proves both sides of the split. ONE
    // codegen scan (regexp strip + lengths), no joins, no UDF.
    "text_code_detect" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 400000)
          .withColumn("text", concat(
            lit("func f"), col("doc_id"), lit("(x) { return x + "),
            col("doc_id"), lit("; } let y = f("), col("doc_id"),
            lit("); // "), substring(col("text"), 1, 40)))
        base.unionByName(plants)
          .select(col("source"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[{}();=]", ""))).as("sym"),
            size(expr("filter(split(text, '\\\\s+'), t -> t != '')")).as("toks"))
          .withColumn("is_code",
            when(col("sym") * 10 > col("toks"), 1L).otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("is_code").cast("long").as("n_code"))
          .withColumn("code_rate_x1e6",
            expr("n_code * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source,
          |    'func f' || (doc_id + 400000) || '(x) { return x + '
          |      || (doc_id + 400000) || '; } let y = f(' || (doc_id + 400000)
          |      || '); // ' || substring(text, 1, 40) AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(text) - length(regexp_replace(text, '[{}();=]', '', 'g')) AS sym,
          |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS toks
          |  FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN sym * 10 > toks THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
          |  CAST(sum(CASE WHEN sym * 10 > toks THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS code_rate_x1e6
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // One-way ANOVA F statistic of order value across the five order
    // priorities — the "does this segmentation explain any variance"
    // screen behind every mix/stratification decision upstream of it
    // (complements stats_chi2_segments, which tests categorical
    // association; this tests a numeric response). Sum decomposition
    // in exact integers over whole DOLLARS (per-order floor — cents²
    // sums would push the per-group s_g²/n_g terms past BIGINT at 30×;
    // dollar² keeps every column long-safe past 100×): per-group
    // Σx/Σx² collapse in ONE corpus scan to a k-row frame, every later
    // term derived from that frame (the stats_cramers_v discipline).
    // The only quantizations are the per-group unit floors (identical
    // both engines, non-negative operands throughout — greatest(0,·)
    // absorbs the ≤k-ULP floor residue so SSB/SSW never go negative).
    "stats_anova_f" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val g = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice) AS BIGINT)").as("x"),
            col("o_orderpriority").as("grp"))
          .groupBy("grp")
          .agg(count(lit(1)).as("ng"), sum(dec(col("x"))).as("sg"),
            sum(dec(col("x")) * dec(col("x"))).as("qg"))
          .withColumn("bg", graft.functions.GraftFunctions.longDiv(
            col("sg") * col("sg"), dec(col("ng"))))
        g.agg(count(lit(1)).as("k"), sum(dec(col("ng"))).as("n"),
            sum(col("sg")).as("s"), sum(col("qg")).as("q"),
            sum(dec(col("bg"))).as("bgs"))
          .select(col("k"), col("n"),
            greatest(dec(lit(0L)), col("bgs") -
              graft.functions.GraftFunctions.longDiv(
                col("s") * col("s"), col("n")).cast("decimal(38,0)")).as("ssb"),
            greatest(dec(lit(0L)), col("q") - col("bgs")).as("ssw"))
          .select(col("k").cast("long").as("k"), col("n").cast("long").as("n"),
            col("ssb").cast("long").as("ssb"),
            col("ssw").cast("long").as("ssw"),
            graft.functions.GraftFunctions.longDiv(
              col("ssb") * (col("n") - col("k")).cast("decimal(38,0)")
                * dec(lit(1000000L)),
              nullif(col("ssw") * (col("k") - 1).cast("decimal(38,0)"),
                dec(lit(0L)))).cast("long").as("f_x1e6"))
      },
      Some(
        """WITH g AS (SELECT o_orderpriority AS grp, count(*) AS ng,
          |    sum(CAST(CAST(floor(o_totalprice) AS BIGINT) AS HUGEINT)) AS sg,
          |    sum(CAST(CAST(floor(o_totalprice) AS BIGINT) AS HUGEINT)
          |        * CAST(floor(o_totalprice) AS BIGINT)) AS qg
          |  FROM orders GROUP BY 1),
          |b AS (SELECT grp, ng, sg, qg, sg * sg // ng AS bg FROM g),
          |t AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s, sum(qg) AS q,
          |    sum(bg) AS bgs FROM b),
          |f AS (SELECT k, n,
          |    greatest(0, bgs - s * s // n) AS ssb,
          |    greatest(0, q - bgs) AS ssw FROM t)
          |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
          |  CAST(ssb AS BIGINT) AS ssb, CAST(ssw AS BIGINT) AS ssw,
          |  CAST(ssb * (n - k) * 1000000 // nullif(ssw * (k - 1), 0) AS BIGINT)
          |    AS f_x1e6
          |FROM f""".stripMargin)),

    // Newman modularity of the brand partition over the co-purchase
    // graph — "are brands real communities in purchasing behavior?",
    // the quality score that adjudicates any community detection
    // (graph_label_propagation emits communities; this scores a
    // partition). Q = Σ_c (e_c/m − (d_c/2m)²) over the same
    // support-pruned co-order edge set as graph_local_bridges /
    // clustering_coeff; per-community terms emitted with the common
    // denominator 4m² so Q = Σ q_term exactly, sign-factored ×1e9
    // (a cross-heavy brand has d_c² > 4m·e_c ⇒ negative term; DuckDB
    // // floors where Java div truncates, so |·| first). Everything
    // past the one edge derivation runs on edge-count-sized frames;
    // the brand map is a broadcast dim.
    "graph_modularity_brands" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb").localCheckpoint(true)
        val m = e0.agg(count(lit(1)).as("m"))
        val deg = e0.select(col("pa").as("v"))
          .unionByName(e0.select(col("pb").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        // node→brand map: ONE part scan probed by the broadcast
        // graph-node frame (support-pruned, edge-bounded) — never the
        // reverse: force-broadcasting the part DIM would collect the
        // full dimension on the driver three times (measured 3× slower
        // at 10×); at 100 TB the dim is the big side here
        val nb = Tables.part(s, d)
          .select(col("p_partkey").as("v"), col("p_brand"))
          .join(broadcast(deg), "v")
          .localCheckpoint(true)
        val dc = nb.groupBy(col("p_brand").as("brand"))
          .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_sum"))
        val ec = e0
          .join(broadcast(nb.select(col("v").as("pa"), col("p_brand").as("ba"))),
            "pa")
          .join(broadcast(nb.select(col("v").as("pb"), col("p_brand").as("bb"))),
            "pb")
          .filter(col("ba") === col("bb"))
          .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("in_edges0"))
        dc.join(ec, Seq("brand"), "left")
          .withColumn("in_edges", coalesce(col("in_edges0"), lit(0L)))
          .crossJoin(broadcast(m))
          .withColumn("num", dec(lit(4L)) * dec(col("m")) * dec(col("in_edges"))
            - dec(col("deg_sum")) * dec(col("deg_sum")))
          .withColumn("den", dec(lit(4L)) * dec(col("m")) * dec(col("m")))
          .select(col("brand"), col("n_nodes").cast("long").as("n_nodes"),
            col("deg_sum").cast("long").as("deg_sum"),
            col("in_edges").cast("long").as("in_edges"),
            when(col("num") >= 0, graft.functions.GraftFunctions.longDiv(
                col("num") * dec(lit(1000000000L)), col("den")))
              .otherwise(-graft.functions.GraftFunctions.longDiv(
                -col("num") * dec(lit(1000000000L)), col("den")))
              .cast("long").as("q_term_x1e9"))
          .orderBy("brand")
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e0),
          |deg AS (SELECT v, count(*) AS deg FROM
          |        (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY 1),
          |dc AS (SELECT p_brand AS brand, count(*) AS n_nodes,
          |         CAST(sum(deg) AS HUGEINT) AS deg_sum
          |       FROM deg JOIN part ON p_partkey = v GROUP BY 1),
          |ec AS (SELECT pab.p_brand AS brand, count(*) AS in_edges
          |       FROM e0 JOIN part pab ON pab.p_partkey = e0.pa
          |                JOIN part pbb ON pbb.p_partkey = e0.pb
          |       WHERE pab.p_brand = pbb.p_brand GROUP BY 1),
          |j AS (SELECT dc.brand, dc.n_nodes, dc.deg_sum,
          |        CAST(coalesce(ec.in_edges, 0) AS HUGEINT) AS in_edges
          |      FROM dc LEFT JOIN ec ON ec.brand = dc.brand),
          |q AS (SELECT brand, n_nodes, deg_sum, in_edges,
          |    4 * m * in_edges - deg_sum * deg_sum AS num,
          |    4 * m * m AS den
          |  FROM j CROSS JOIN m)
          |SELECT brand, CAST(n_nodes AS BIGINT) AS n_nodes,
          |  CAST(deg_sum AS BIGINT) AS deg_sum, CAST(in_edges AS BIGINT) AS in_edges,
          |  CAST(CASE WHEN num >= 0 THEN num * 1000000000 // den
          |       ELSE -((-num) * 1000000000 // den) END AS BIGINT) AS q_term_x1e9
          |FROM q ORDER BY brand""".stripMargin)),

    // OLS goodness-of-fit per nation: R² (and the slope) of WEEKLY
    // revenue against the week index, in EXACT integers — the
    // "is this trend real" companion to events_trend_slope (slope
    // only, float) and stats_mann_kendall (distribution-free, no
    // magnitude). R²·1e6 = (kΣxy−ΣxΣy)²·1e6 / ((kΣx²−(Σx)²)(kΣy²−(Σy)²))
    // — num² ≤ dxx·dyy by Cauchy–Schwarz so the ratio is ≤1e6 always.
    // Week granularity + whole-dollar y are the overflow schedule:
    // num²·1e6 ≤ k²·Σx²·Σy²·1e6 stays under DECIMAL(38,0)/HUGEINT
    // past 100× (daily cents would cross 1e38 at 30×). Slope is
    // sign-factored; a zero-variance nation (dyy=0) reads NULL R² via
    // nullif on both engines (DuckDB // by zero would error, Spark div
    // would null — nullif makes them agree). Corpus pays one keyed
    // join + one (nation, week) collapse; the regression runs on the
    // calendar-bounded week frame.
    "stats_ols_r2" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val ord = Tables.orders(s, d)
        val mn = ord.agg(min(to_date(col("o_orderdate"))).as("mnd"))
        ord
          .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
            col("c_nationkey")), "o_custkey")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            "c_nationkey")
          .crossJoin(broadcast(mn))
          .groupBy(col("n_name").as("nation"),
            expr("CAST(datediff(to_date(o_orderdate), mnd) AS BIGINT) div 7")
              .as("x"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("y"))
          .groupBy("nation")
          .agg(count(lit(1)).as("kk"),
            sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
            sum(dec(col("x")) * dec(col("y"))).as("sxy"),
            sum(dec(col("x")) * dec(col("x"))).as("sxx"),
            sum(dec(col("y")) * dec(col("y"))).as("syy"))
          .withColumn("num", dec(col("kk")) * col("sxy") - col("sx") * col("sy"))
          .withColumn("dxx", dec(col("kk")) * col("sxx") - col("sx") * col("sx"))
          .withColumn("dyy", dec(col("kk")) * col("syy") - col("sy") * col("sy"))
          .select(col("nation"), col("kk").cast("long").as("n_weeks"),
            graft.functions.GraftFunctions.longDiv(
              col("num") * col("num") * dec(lit(1000000L)),
              nullif(col("dxx") * col("dyy"), dec(lit(0L))))
              .cast("long").as("r2_x1e6"),
            when(col("num") >= 0, graft.functions.GraftFunctions.longDiv(
                col("num") * dec(lit(1000000L)), nullif(col("dxx"), dec(lit(0L)))))
              .otherwise(-graft.functions.GraftFunctions.longDiv(
                -col("num") * dec(lit(1000000L)), nullif(col("dxx"), dec(lit(0L)))))
              .cast("long").as("slope_x1e6"))
          .orderBy("nation")
      },
      Some(
        """WITH mn AS (SELECT min(CAST(o_orderdate AS DATE)) AS mnd FROM orders),
          |nw AS (SELECT n_name AS nation,
          |    CAST(CAST(datediff('day', mnd, CAST(o_orderdate AS DATE)) AS BIGINT)
          |      // 7 AS HUGEINT) AS x,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS HUGEINT) AS y
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  JOIN nation ON n_nationkey = c_nationkey
          |  CROSS JOIN mn
          |  GROUP BY 1, 2),
          |s AS (SELECT nation, count(*) AS kk, sum(x) AS sx, sum(y) AS sy,
          |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
          |  FROM nw GROUP BY 1),
          |t AS (SELECT nation, kk,
          |    kk * sxy - sx * sy AS num,
          |    kk * sxx - sx * sx AS dxx,
          |    kk * syy - sy * sy AS dyy
          |  FROM s)
          |SELECT nation, CAST(kk AS BIGINT) AS n_weeks,
          |  CAST(num * num * 1000000 // nullif(dxx * dyy, 0) AS BIGINT) AS r2_x1e6,
          |  CAST(CASE WHEN num >= 0 THEN num * 1000000 // nullif(dxx, 0)
          |       ELSE -((-num) * 1000000 // nullif(dxx, 0)) END AS BIGINT)
          |    AS slope_x1e6
          |FROM t ORDER BY nation""".stripMargin)),

    // Tokenizer fertility per source — BPE tokens emitted per word
    // under the merge table trained on the WHOLE corpus: the
    // pre-training diagnostic that decides whether a source needs its
    // own tokenizer or a higher mix weight to compensate (fertility
    // directly scales its effective token budget). Training is the
    // shared 5-round integer-gated loop (text_bpe_merges); the corpus
    // pays that plus ONE per-(source, word) collapse — the
    // segmentation regex runs over the vocab-sized frame, never the
    // corpus.
    "text_bpe_fertility" -> Q(
      (s, d) => graft.ops.TextOps.bpeFertility(Tables.documents(s, d), rounds = 5),
      Some(TextSql.bpeFertility(rounds = 5))),

    // Boilerplate/HTML stripping census — the first stage of every
    // web-crawl pipeline (C4/CCNet strip markup before any quality
    // gate). Tag chars counted by the same regex both engines run
    // (<[^>]*>); the corpus is markup-free, so HTML-wrapped variants
    // of docs 0-39 are planted in-query under doc_id+500000 (the
    // text_code_detect discipline) — the census proves both the
    // detection and the removal accounting. ONE codegen scan, no joins.
    "text_html_strip" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 500000)
          .withColumn("text", concat(
            lit("<html><head><title>t"), col("doc_id"),
            lit("</title></head><body><p>"), substring(col("text"), 1, 60),
            lit("</p><div class=\"nav\">menu</div></body></html>")))
        base.unionByName(plants)
          .select(col("source"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "<[^>]*>", ""))).as("tag_chars"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("tag_chars") > 0, 1L).otherwise(0L)).cast("long")
              .as("n_html"),
            sum("tag_chars").cast("long").as("tag_chars"))
          .withColumn("html_rate_x1e6", expr("n_html * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source,
          |    '<html><head><title>t' || (doc_id + 500000)
          |      || '</title></head><body><p>' || substring(text, 1, 60)
          |      || '</p><div class="nav">menu</div></body></html>' AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(text) - length(regexp_replace(text, '<[^>]*>', '', 'g'))
          |      AS tag_chars
          |  FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN tag_chars > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_html,
          |  CAST(sum(tag_chars) AS BIGINT) AS tag_chars,
          |  CAST(sum(CASE WHEN tag_chars > 0 THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS html_rate_x1e6
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Time-weighted average value per event type — the correct
    // "average state" when observations arrive irregularly (a plain
    // mean over-weights bursty periods; TWA weights each value by how
    // long it HELD: until the user's next event). Per-user lead window
    // (ts, event_id tie-break — the sessionize discipline), last event
    // carries no weight; value in cents × gap seconds summed in
    // DECIMAL, one integral division at the end. One user-keyed
    // shuffle, linear.
    "events_twa" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        Tables.events(s, d)
          .withColumn("gap_s", expr(
            "(unix_micros(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - unix_micros(ts)) div 1000000"))
          .filter(col("gap_s").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"),
            col("gap_s"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_intervals"),
            sum(col("gap_s")).cast("long").as("held_s"),
            sum(dec(col("c")) * dec(col("gap_s"))).as("cw"))
          .select(col("event_type"), col("n_intervals"), col("held_s"),
            graft.functions.GraftFunctions.longDiv(
              col("cw") * dec(lit(1000L)),
              nullif(col("held_s").cast("decimal(38,0)"), dec(lit(0L))))
              .cast("long").as("twa_c_x1e3"))
          .orderBy("event_type")
      },
      Some(
        """WITH g AS (SELECT event_type,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
          |    CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) - epoch_us(ts) AS BIGINT) // 1000000 AS gap_s
          |  FROM events)
          |SELECT event_type, count(*) AS n_intervals,
          |  CAST(sum(gap_s) AS BIGINT) AS held_s,
          |  CAST(sum(CAST(c AS HUGEINT) * gap_s) * 1000
          |    // nullif(CAST(sum(gap_s) AS HUGEINT), 0) AS BIGINT) AS twa_c_x1e3
          |FROM g WHERE gap_s IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Cross-source n-gram novelty — what fraction of a source's
    // distinct 3-grams appear in NO other source: the
    // memorization/contribution profile that decides whether a source
    // adds anything the mix doesn't already have (the set-level
    // complement of text_source_divergence's distributional view).
    // Two keyed shuffles: (source, gram) distinct collapse, then a
    // gram-keyed source-count re-aggregation joined back; novel ⇔
    // exactly one source holds the gram. Gram frames are
    // vocab³-bounded, never corpus-row-sized.
    "text_ngram_novelty" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
        // ONE gram-keyed exchange serves all three stages: the
        // (g, source) distinct, the per-gram source count, and the
        // join — HashPartitioning(g) satisfies the composite
        // clustering, so neither aggregation nor the join re-shuffles
        // (three string shuffles measured 5× cost for 3× rows at 30×)
        val sg = toks.filter(size(col("tk")) >= 3)
          .select(col("source"), explode(expr(
            "transform(slice(tk, 1, size(tk) - 2), (w, i) -> concat_ws(' ', w, tk[i + 1], tk[i + 2]))")).as("g"))
          .repartition(col("g"))
          .groupBy("g", "source").agg(count(lit(1)).as("occ"))
        val df = sg.groupBy("g").agg(count(lit(1)).as("nsrc"))
        sg.join(df, "g")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_grams"),
            sum(when(col("nsrc") === 1, 1L).otherwise(0L)).cast("long")
              .as("n_novel"))
          .withColumn("novelty_x1e6", expr("n_novel * 1000000L div n_grams"))
          .orderBy("source")
      },
      Some(
        """WITH t AS (SELECT source, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT source, tk, unnest(generate_series(1, len(tk) - 2)) AS i
          |      FROM t WHERE len(tk) >= 3),
          |sg AS (SELECT source, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS g
          |       FROM u GROUP BY 1, 2),
          |df AS (SELECT g, count(*) AS nsrc FROM sg GROUP BY 1)
          |SELECT source, count(*) AS n_grams,
          |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
          |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS novelty_x1e6
          |FROM sg JOIN df USING (g) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Customer-cohort LTV triangle — cumulative revenue per customer by
    // cohort (first-order month) × order age in months: THE retention
    // economics table (the revenue twin of events_cohort_matrix's
    // activity counts). Corpus pays one customer-keyed first-order
    // collapse + one keyed join back; the triangle itself is
    // calendar²-bounded, so its cumulative window and the cohort-size
    // join run on a tiny frame. Whole-dollar revenue (the ANOVA unit
    // discipline), ltv = cumulative dollars ×1e3 per cohort customer.
    "orders_cohort_ltv" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), to_date(col("o_orderdate")).as("od"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("rev"))
        val first = o.groupBy("ck").agg(min("od").as("fd"))
        val cs = first
          .groupBy(date_format(col("fd"), "yyyy-MM").as("cohort"))
          .agg(count(lit(1)).as("n_custs"))
        val tri = o.join(first, "ck")
          .groupBy(date_format(col("fd"), "yyyy-MM").as("cohort"),
            ((year(col("od")) - year(col("fd"))) * 12
              + (month(col("od")) - month(col("fd")))).cast("long").as("age_m"))
          .agg(sum("rev").cast("long").as("rev"))
        val w = Window.partitionBy("cohort").orderBy("age_m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tri.withColumn("cum_rev", sum("rev").over(w).cast("long"))
          .join(broadcast(cs), "cohort")
          .select(col("cohort"), col("age_m"), col("n_custs").cast("long").as("n_custs"),
            col("rev"), col("cum_rev"),
            expr("cum_rev * 1000L div n_custs").as("ltv_x1e3"))
          .orderBy("cohort", "age_m")
      },
      Some(
        """WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
          |    CAST(floor(o_totalprice) AS BIGINT) AS rev FROM orders),
          |f AS (SELECT ck, min(od) AS fd FROM o GROUP BY 1),
          |cs AS (SELECT strftime(fd, '%Y-%m') AS cohort, count(*) AS n_custs
          |       FROM f GROUP BY 1),
          |tri AS (SELECT strftime(fd, '%Y-%m') AS cohort,
          |    CAST((year(od) - year(fd)) * 12 + (month(od) - month(fd)) AS BIGINT)
          |      AS age_m,
          |    CAST(sum(rev) AS BIGINT) AS rev
          |  FROM o JOIN f USING (ck) GROUP BY 1, 2),
          |c AS (SELECT cohort, age_m, rev,
          |    CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age_m
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS cum_rev
          |  FROM tri)
          |SELECT cohort, age_m, CAST(n_custs AS BIGINT) AS n_custs, rev, cum_rev,
          |  CAST(cum_rev * 1000 // n_custs AS BIGINT) AS ltv_x1e3
          |FROM c JOIN cs USING (cohort) ORDER BY cohort, age_m""".stripMargin)),

    // Compaction planning — the lakehouse maintenance pass that fixes
    // the small-file problem: greedy sequential bin-packing of a file
    // manifest into ~256 KB rewrite groups (group = exclusive-prefix
    // size // target, so a group overflows by at most one file — the
    // classic streaming first-fit). The manifest here derives from the
    // documents table (100-doc buckets as pseudo-files, documented); in
    // production the input is the table's real file listing. THE scale
    // point: planning runs entirely on the MANIFEST (corpus-size/100
    // rows), the corpus pays one collapse — per-source windows, no
    // global sort.
    "lakehouse_compaction_plan" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val target = 262144L
        val files = Tables.documents(s, d)
          .groupBy(col("source"), expr("doc_id div 100").as("bucket"))
          .agg(sum("n_chars").cast("long").as("sz"))
        val w = Window.partitionBy("source").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val planned = files
          .withColumn("cum0", coalesce(sum("sz").over(w), lit(0L)))
          .withColumn("grp", expr(s"cum0 div ${target}L"))
        val groups = planned.groupBy("source", "grp")
          .agg(sum("sz").as("gsz"))
        planned.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_files"),
            sum("sz").cast("long").as("total_chars"))
          .join(groups.groupBy("source")
            .agg(count(lit(1)).cast("long").as("n_groups"),
              max("gsz").cast("long").as("max_group_chars")), "source")
          .withColumn("fill_x1e6",
            expr(s"total_chars * 1000000L div (n_groups * ${target}L)"))
          .orderBy("source")
      },
      Some(
        """WITH files AS (SELECT source, doc_id // 100 AS bucket,
          |    CAST(sum(n_chars) AS BIGINT) AS sz
          |  FROM documents GROUP BY 1, 2),
          |p AS (SELECT source, sz,
          |    CAST(coalesce(sum(sz) OVER (PARTITION BY source ORDER BY bucket
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |      // 262144 AS grp
          |  FROM files),
          |g AS (SELECT source, grp, CAST(sum(sz) AS BIGINT) AS gsz
          |      FROM p GROUP BY 1, 2),
          |s AS (SELECT source, count(*) AS n_files,
          |    CAST(sum(sz) AS BIGINT) AS total_chars FROM p GROUP BY 1),
          |t AS (SELECT source, count(*) AS n_groups,
          |    CAST(max(gsz) AS BIGINT) AS max_group_chars FROM g GROUP BY 1)
          |SELECT source, n_files, total_chars, n_groups, max_group_chars,
          |  CAST(total_chars * 1000000 // (n_groups * 262144) AS BIGINT)
          |    AS fill_x1e6
          |FROM s JOIN t USING (source) ORDER BY source""".stripMargin)),

    // Differential-privacy sensitivity audit — before adding DP noise
    // to any per-type aggregate you must know the max single-user
    // contribution (the L1 sensitivity scale) and how many users
    // exceed a clipping candidate: per (type, user) collapse, then a
    // type-level re-aggregation of that user-grain frame (two keyed
    // shuffles, second over the user-count-sized frame). Exact cents;
    // shares via nullif-guarded integral division.
    "privacy_sensitivity_audit" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
          .groupBy("event_type", "user_id").agg(sum("c").as("uc"))
        val t = u.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum("uc").cast("long").as("total_c"),
            max("uc").cast("long").as("max_user_c"))
        u.join(broadcast(t), "event_type")
          .groupBy("event_type")
          .agg(max("n_users").as("n_users"), max("total_c").as("total_c"),
            max("max_user_c").as("max_user_c"),
            sum(when(col("uc") * 100 > col("total_c"), 1L).otherwise(0L))
              .cast("long").as("n_over_1pct"))
          .withColumn("max_share_x1e6", expr(
            "CAST(CAST(max_user_c AS DECIMAL(38,0)) * 1000000 div nullif(CAST(total_c AS DECIMAL(38,0)), 0) AS BIGINT)"))
          .orderBy("event_type")
      },
      Some(
        """WITH u AS (SELECT event_type, user_id,
          |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS uc
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT event_type, count(*) AS n_users,
          |    CAST(sum(uc) AS BIGINT) AS total_c,
          |    CAST(max(uc) AS BIGINT) AS max_user_c
          |  FROM u GROUP BY 1)
          |SELECT t.event_type, n_users, total_c, max_user_c,
          |  CAST(sum(CASE WHEN u.uc * 100 > t.total_c THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_over_1pct,
          |  CAST(CAST(max_user_c AS HUGEINT) * 1000000
          |    // nullif(CAST(total_c AS HUGEINT), 0) AS BIGINT) AS max_share_x1e6
          |FROM u JOIN t ON t.event_type = u.event_type
          |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin)),

    // Per-label centroid representatives — the herding/coreset
    // selection every "pick k canonical examples per class" pipeline
    // runs (distillation seeds, eval anchors, label auditing): the 3
    // vectors closest to their label centroid in exact fixed-point
    // arithmetic. dist²·n² = Σ_dim (n·q − s)² needs no division until
    // the final per-vector readout (// n², floored identically both
    // engines); ranking on the floored value + vec_id is
    // engine-invariant. Corpus pays the explode collapse + one
    // broadcast join of the labels×64 centroid frame; top-3 via a
    // per-label window.
    "emb_centroid_representatives" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val cent = q.groupBy("label", "dim")
          .agg(sum("q").as("s"), count(lit(1)).as("n"))
        val dist = q.join(broadcast(cent), Seq("label", "dim"))
          .withColumn("t", dec(col("n")) * dec(col("q")) - dec(col("s")))
          .groupBy("label", "vec_id")
          .agg(graft.functions.GraftFunctions.longDiv(
            sum(col("t") * col("t")),
            dec(max("n")) * dec(max("n"))).as("dist_q"))
        val w = Window.partitionBy("label").orderBy(col("dist_q"), col("vec_id"))
        dist.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("label").cast("long").as("label"),
            col("rk").cast("long").as("rk"),
            col("vec_id").cast("long").as("vec_id"),
            col("dist_q").cast("long").as("dist_q"))
          .orderBy("label", "rk")
      },
      Some(
        """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT label, vec_id, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |cent AS (SELECT label, dim, CAST(sum(q) AS HUGEINT) AS s,
          |    CAST(count(*) AS HUGEINT) AS n
          |  FROM q GROUP BY 1, 2),
          |dist AS (SELECT q.label, vec_id,
          |    CAST(sum((n * q - s) * (n * q - s)) // (max(n) * max(n)) AS BIGINT)
          |      AS dist_q
          |  FROM q JOIN cent ON cent.label = q.label AND cent.dim = q.dim
          |  GROUP BY 1, 2),
          |r AS (SELECT label, vec_id, dist_q,
          |    row_number() OVER (PARTITION BY label ORDER BY dist_q, vec_id) AS rk
          |  FROM dist)
          |SELECT CAST(label AS BIGINT) AS label, CAST(rk AS BIGINT) AS rk,
          |  CAST(vec_id AS BIGINT) AS vec_id, dist_q
          |FROM r WHERE rk <= 3 ORDER BY label, rk""".stripMargin)),

    // Late-interaction (MaxSim) retrieval over label groups — the
    // ColBERT-style scoring where a group's relevance is the MAX inner
    // product of any member, not the centroid (multi-vector documents;
    // labels stand in as the vector groups): for 5 deterministic query
    // vectors (vec_id 0-4 — their own labels score a perfect
    // self-match, documented), rank labels by max fixed-point dot and
    // keep the top 3. ONE corpus scan fanned ×5 by the broadcast
    // query-dim frame; dots summed exactly (q ≤ 1e6 ⇒ products ≤
    // 6.4e13·64, DECIMAL-safe), final window on the 5×labels frame.
    "sim_maxsim_label" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val qs = q.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("dim"), col("q").as("qq"))
        val dots = q.join(broadcast(qs), "dim")
          .groupBy("qid", "label", "vec_id")
          .agg(sum(dec(col("q")) * dec(col("qq"))).as("dot"))
        val best = dots.groupBy("qid", "label")
          .agg(max("dot").as("maxdot"))
        val w = Window.partitionBy("qid").orderBy(desc("maxdot"), col("label"))
        best.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("qid").cast("long").as("qid"),
            col("rk").cast("long").as("rk"),
            col("label").cast("long").as("label"),
            col("maxdot").cast("long").as("maxdot_q"))
          .orderBy("qid", "rk")
      },
      Some(
        """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT label, vec_id, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |qs AS (SELECT vec_id AS qid, dim, q AS qq FROM q WHERE vec_id < 5),
          |dots AS (SELECT qid, q.label, q.vec_id,
          |    CAST(sum(CAST(q.q AS HUGEINT) * qs.qq) AS HUGEINT) AS dot
          |  FROM q JOIN qs ON qs.dim = q.dim
          |  GROUP BY 1, 2, 3),
          |best AS (SELECT qid, label, max(dot) AS maxdot FROM dots GROUP BY 1, 2),
          |r AS (SELECT qid, label, maxdot,
          |    row_number() OVER (PARTITION BY qid ORDER BY maxdot DESC, label) AS rk
          |  FROM best)
          |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
          |  CAST(label AS BIGINT) AS label, CAST(maxdot AS BIGINT) AS maxdot_q
          |FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin)),

    // Positional (U-shaped) multi-touch attribution — the 40/20/40
    // credit model between the asof_last_click (100% last) and
    // range_attribution (window) extremes: each purchase closes a
    // journey of the user's touches since the previous purchase;
    // first and last touch get 4000 bp, middles split 2000 bp evenly
    // (floor, remainder dropped — deterministic), singleton 10000,
    // pair 5000/5000. ONE user-keyed shuffle: the journey id (running
    // purchase count), the per-user purchase total, and the
    // (user, journey) position/size windows all reuse the user
    // partitioning (subset clustering). Credit census per channel.
    "events_attribution_positional" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wAll = Window.partitionBy("user_id")
        val wRun = wAll.orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .withColumn("is_p", when(col("event_type") === "purchase", 1L)
            .otherwise(0L))
          .withColumn("rc", sum("is_p").over(wRun))
          .withColumn("tp", sum("is_p").over(wAll))
        val touches = ev.filter(col("is_p") === 0)
          .withColumn("journey", col("rc") + 1)
          .filter(col("journey") <= col("tp"))
        val wj = Window.partitionBy("user_id", "journey")
        val wjo = wj.orderBy("ts", "event_id")
        touches
          .withColumn("pos", row_number().over(wjo))
          .withColumn("m", count(lit(1)).over(wj))
          .withColumn("credit_bp",
            when(col("m") === 1, 10000L)
              .when(col("m") === 2, 5000L)
              .when(col("pos") === 1 || col("pos") === col("m"), 4000L)
              .otherwise(expr("2000L div (m - 2)")))
          .groupBy(col("event_type").as("channel"))
          .agg(count(lit(1)).cast("long").as("n_touches"),
            sum("credit_bp").cast("long").as("credit_bp"))
          .orderBy("channel")
      },
      Some(
        """WITH ev AS (SELECT event_type, user_id, ts, event_id,
          |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
          |  FROM events),
          |r AS (SELECT event_type, user_id, ts, event_id, is_p,
          |    sum(is_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc,
          |    sum(is_p) OVER (PARTITION BY user_id) AS tp
          |  FROM ev),
          |t AS (SELECT event_type, user_id, ts, event_id, rc + 1 AS journey
          |      FROM r WHERE is_p = 0 AND rc + 1 <= tp),
          |p AS (SELECT event_type,
          |    row_number() OVER (PARTITION BY user_id, journey
          |      ORDER BY ts, event_id) AS pos,
          |    count(*) OVER (PARTITION BY user_id, journey) AS m
          |  FROM t),
          |c AS (SELECT event_type,
          |    CASE WHEN m = 1 THEN 10000
          |         WHEN m = 2 THEN 5000
          |         WHEN pos = 1 OR pos = m THEN 4000
          |         ELSE 2000 // (m - 2) END AS credit_bp
          |  FROM p)
          |SELECT event_type AS channel, count(*) AS n_touches,
          |  CAST(sum(credit_bp) AS BIGINT) AS credit_bp
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Label-confusion matrix from centroid geometry — which classes
    // the embedding space entangles: every vector scored against ALL
    // label centroids (the corpus frame fans ×L by the broadcast
    // labels×64 centroid frame — L-bounded, not a pair join), nearest
    // OTHER label by engine-invariant (floored dist, label) rank;
    // a vector is confused when that rival sits strictly closer than
    // its own centroid. Census per (label, nearest_other).
    "emb_label_confusion" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label").as("own"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val cent = q.groupBy(col("own").as("c"), col("dim"))
          .agg(sum("q").as("s"), count(lit(1)).as("n"))
        val dists = q.join(broadcast(cent), "dim")
          .withColumn("t", dec(col("n")) * dec(col("q")) - dec(col("s")))
          .groupBy("own", "vec_id", "c")
          .agg(graft.functions.GraftFunctions.longDiv(
            sum(col("t") * col("t")), dec(max("n")) * dec(max("n")))
            .as("dist_q"))
        val ownD = dists.filter(col("c") === col("own"))
          .select(col("vec_id"), col("dist_q").as("own_dist"))
        val wr = Window.partitionBy("vec_id").orderBy(col("dist_q"), col("c"))
        val rival = dists.filter(col("c") =!= col("own"))
          .withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
          .select(col("own"), col("vec_id"), col("c").as("nearest_other"),
            col("dist_q").as("other_dist"))
        rival.join(ownD, "vec_id")
          .groupBy(col("own").cast("long").as("label"),
            col("nearest_other").cast("long").as("nearest_other"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("other_dist") < col("own_dist"), 1L).otherwise(0L))
              .cast("long").as("n_confused"))
          .orderBy("label", "nearest_other")
      },
      Some(
        """WITH v AS (SELECT label AS own, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT own, vec_id, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |cent AS (SELECT own AS c, dim, CAST(sum(q) AS HUGEINT) AS s,
          |    CAST(count(*) AS HUGEINT) AS n
          |  FROM q GROUP BY 1, 2),
          |dists AS (SELECT q.own, q.vec_id, cent.c,
          |    CAST(sum((n * q - s) * (n * q - s)) // (max(n) * max(n)) AS BIGINT)
          |      AS dist_q
          |  FROM q JOIN cent ON cent.dim = q.dim
          |  GROUP BY 1, 2, 3),
          |own_d AS (SELECT vec_id, dist_q AS own_dist FROM dists WHERE c = own),
          |rv AS (SELECT own, vec_id, c AS nearest_other, dist_q AS other_dist,
          |    row_number() OVER (PARTITION BY vec_id ORDER BY dist_q, c) AS rk
          |  FROM dists WHERE c <> own)
          |SELECT CAST(own AS BIGINT) AS label,
          |  CAST(nearest_other AS BIGINT) AS nearest_other,
          |  count(*) AS n,
          |  CAST(sum(CASE WHEN other_dist < own_dist THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_confused
          |FROM rv JOIN own_d USING (vec_id)
          |WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Customer dormancy census — recency segmentation off the corpus
    // max order date (active <90 d, lapsing <365 d, else dormant):
    // the churn-risk panel every retention program starts from. One
    // customer-keyed last-order collapse + broadcast nation dim +
    // 1-row anchor; exact day arithmetic.
    "orders_dormancy" -> Q(
      (s, d) => {
        val last = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("ck"))
          .agg(max(to_date(col("o_orderdate"))).as("ld"))
        val anchor = Tables.orders(s, d)
          .agg(max(to_date(col("o_orderdate"))).as("mx"))
        last
          .join(Tables.customer(s, d).select(col("c_custkey").as("ck"),
            col("c_nationkey")), "ck")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            "c_nationkey")
          .crossJoin(broadcast(anchor))
          .withColumn("rec_d", datediff(col("mx"), col("ld")).cast("long"))
          .withColumn("bucket",
            when(col("rec_d") < 90, "0_active")
              .when(col("rec_d") < 365, "1_lapsing").otherwise("2_dormant"))
          .groupBy(col("n_name").as("nation"), col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_custs"),
            max("rec_d").cast("long").as("max_recency_d"))
          .orderBy("nation", "bucket")
      },
      Some(
        """WITH l AS (SELECT o_custkey AS ck, max(CAST(o_orderdate AS DATE)) AS ld
          |           FROM orders GROUP BY 1),
          |mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
          |b AS (SELECT n_name AS nation,
          |    CAST(datediff('day', ld, mx) AS BIGINT) AS rec_d
          |  FROM l JOIN customer ON c_custkey = ck
          |  JOIN nation ON n_nationkey = c_nationkey
          |  CROSS JOIN mx)
          |SELECT nation,
          |  CASE WHEN rec_d < 90 THEN '0_active'
          |       WHEN rec_d < 365 THEN '1_lapsing' ELSE '2_dormant' END AS bucket,
          |  count(*) AS n_custs, CAST(max(rec_d) AS BIGINT) AS max_recency_d
          |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Time-to-convert distribution — how long a purchase journey runs
    // from its FIRST touch to the purchase that closes it (the latency
    // complement of events_attribution_positional's credit view; same
    // journey algebra). Purchases numbered by the running count,
    // touches assigned journey rc+1, first-touch collapse and the
    // purchase join both reuse the user partitioning — ONE corpus
    // shuffle. Zero-touch journeys (back-to-back purchases) have no
    // latency and drop out of the inner join, documented. Fixed
    // integer buckets (<1m/<1h/<1d/≥1d — no float log).
    "events_time_to_convert" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .withColumn("is_p", when(col("event_type") === "purchase", 1L)
            .otherwise(0L))
          .withColumn("rc", sum("is_p").over(wRun))
        val firstTouch = ev.filter(col("is_p") === 0)
          .groupBy(col("user_id"), (col("rc") + 1).as("journey"))
          .agg(min("ts").as("fts"))
        val purch = ev.filter(col("is_p") === 1)
          .select(col("user_id"), col("rc").as("journey"), col("ts").as("pts"))
        firstTouch.join(purch, Seq("user_id", "journey"))
          .withColumn("gap_s",
            expr("(unix_micros(pts) - unix_micros(fts)) div 1000000"))
          .groupBy(
            when(col("gap_s") < 60, "0_lt_1m").when(col("gap_s") < 3600, "1_lt_1h")
              .when(col("gap_s") < 86400, "2_lt_1d").otherwise("3_ge_1d")
              .as("bucket"))
          .agg(count(lit(1)).cast("long").as("n_journeys"),
            sum("gap_s").cast("long").as("total_s"))
          .orderBy("bucket")
      },
      Some(
        """WITH r AS (SELECT user_id, ts, event_id, event_type,
          |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
          |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc
          |  FROM events),
          |ft AS (SELECT user_id, rc + 1 AS journey, min(ts) AS fts
          |       FROM r WHERE is_p = 0 GROUP BY 1, 2),
          |p AS (SELECT user_id, rc AS journey, ts AS pts FROM r WHERE is_p = 1),
          |g AS (SELECT CAST(epoch_us(pts) - epoch_us(fts) AS BIGINT) // 1000000
          |        AS gap_s
          |      FROM ft JOIN p USING (user_id, journey))
          |SELECT CASE WHEN gap_s < 60 THEN '0_lt_1m'
          |    WHEN gap_s < 3600 THEN '1_lt_1h'
          |    WHEN gap_s < 86400 THEN '2_lt_1d' ELSE '3_ge_1d' END AS bucket,
          |  count(*) AS n_journeys, CAST(sum(gap_s) AS BIGINT) AS total_s
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Process-conformance census — which observed event transitions
    // violate the declared lifecycle model (process mining's
    // conformance checking, the data-quality twin of
    // events_markov_transitions' descriptive matrix). The allowed set
    // is an explicit shared whitelist (signup opens, view/click
    // browse, purchase closes and restarts; error is never legal);
    // per-user lag window, transition census with the violation flag.
    // One user-keyed shuffle, linear.
    "events_conformance" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val allowed = Seq(
          "signup>view", "signup>click", "view>view", "view>click",
          "view>purchase", "click>click", "click>view", "click>purchase",
          "purchase>view", "purchase>signup")
        Tables.events(s, d)
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("ok",
            when(concat(col("prev"), lit(">"), col("event_type"))
              .isin(allowed: _*), 1L).otherwise(0L))
          .groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).cast("long").as("n"),
            max(lit(1L) - col("ok")).cast("long").as("is_violation"))
          .orderBy("prev", "cur")
      },
      Some(
        """WITH t AS (SELECT event_type AS cur,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS prev
          |  FROM events),
          |f AS (SELECT prev, cur,
          |    CASE WHEN prev || '>' || cur IN ('signup>view', 'signup>click',
          |      'view>view', 'view>click', 'view>purchase', 'click>click',
          |      'click>view', 'click>purchase', 'purchase>view',
          |      'purchase>signup') THEN 0 ELSE 1 END AS viol
          |  FROM t WHERE prev IS NOT NULL)
          |SELECT prev, cur, count(*) AS n,
          |  CAST(max(viol) AS BIGINT) AS is_violation
          |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Mean segmental type-token ratio (MSTTR) per source — the
    // length-robust lexical-diversity standard (plain TTR collapses as
    // docs grow; fixed 10-token segments make sources comparable):
    // distinct types per full 10-token chunk, remainder dropped,
    // mean ×1e6 in exact integers. One explode + a (doc, chunk)
    // distinct collapse; chunk frames are corpus-token-bounded.
    "text_msttr" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
        toks.select(col("doc_id"), col("source"),
            expr("size(tk) div 10").as("full_chunks"),
            posexplode(col("tk")).as(Seq("pos", "w")))
          .withColumn("chunk", expr("pos div 10"))
          .filter(col("chunk") < col("full_chunks"))
          .groupBy("source", "doc_id", "chunk")
          .agg(countDistinct("w").as("types"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_chunks"),
            sum("types").cast("long").as("n_types"))
          .withColumn("msttr_x1e6",
            expr("n_types * 1000000L div (n_chunks * 10L)"))
          .orderBy("source")
      },
      Some(
        """WITH t AS (SELECT doc_id, source, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT doc_id, source, len(tk) // 10 AS full_chunks,
          |    (g.i - 1) // 10 AS chunk, tk[g.i] AS w
          |  FROM t CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(tk))) AS i) g),
          |c AS (SELECT source, doc_id, chunk, count(DISTINCT w) AS types
          |      FROM u WHERE chunk < full_chunks GROUP BY 1, 2, 3)
          |SELECT source, count(*) AS n_chunks,
          |  CAST(sum(types) AS BIGINT) AS n_types,
          |  CAST(sum(types) * 1000000 // (count(*) * 10) AS BIGINT) AS msttr_x1e6
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Pareto coverage points — the "how many customers make p% of
    // revenue" scalars behind the 80/20 rule (the crossing-point
    // readout of stats_lorenz_deciles' full curve). Descending
    // cumulative revenue WITHOUT a corpus-sized sort: the two-phase
    // bucketedPrefixSum gives the ascending inclusive prefix, and
    // cum_desc = T − prefix + rev converts it (tie order ck ASC maps
    // to the oracle's rev DESC, ck DESC — stated there). A customer is
    // needed for threshold p while the revenue ABOVE it (exclusive)
    // still sits under p·T/100 — strict integer compare, no division.
    "orders_pareto_coverage" -> Q(
      (s, d) => {
        val cust = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("rev"))
        val ranked = graft.ops.Stats.bucketedPrefixSum(cust, "rev", "ck", 1000L)
        val tot = cust.agg(sum("rev").as("t"), count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("above_excl", col("t") - col("prefix"))
          .select(col("above_excl"), col("t"), col("n"),
            explode(expr("array(50L, 80L, 90L)")).as("p"))
          .groupBy("p")
          .agg(max("n").cast("long").as("n_custs"),
            sum(when(col("above_excl") * 100 < col("p") * col("t"), 1L)
              .otherwise(0L)).cast("long").as("n_top"))
          .withColumn("cust_share_x1e6", expr("n_top * 1000000L div n_custs"))
          .orderBy("p")
      },
      Some(
        """WITH cust AS (SELECT o_custkey AS ck,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
          |  FROM orders GROUP BY 1),
          |r AS (SELECT rev,
          |    CAST(sum(rev) OVER (ORDER BY rev DESC, ck DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS cum_desc
          |  FROM cust),
          |t AS (SELECT CAST(sum(rev) AS BIGINT) AS t, count(*) AS n FROM cust),
          |e AS (SELECT cum_desc - rev AS above_excl, t, n, p
          |      FROM r CROSS JOIN t CROSS JOIN (SELECT unnest([50, 80, 90]) AS p))
          |SELECT CAST(p AS BIGINT) AS p, CAST(max(n) AS BIGINT) AS n_custs,
          |  CAST(sum(CASE WHEN above_excl * 100 < p * t THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_top,
          |  CAST(sum(CASE WHEN above_excl * 100 < p * t THEN 1 ELSE 0 END)
          |    * 1000000 // max(n) AS BIGINT) AS cust_share_x1e6
          |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 4-4-5 fiscal calendar rollup — retail's week-aligned reporting
    // calendar (periods of 4, 4, 5 weeks per quarter; comparable
    // same-weekday periods, unlike Gregorian months). Fiscal epoch =
    // the corpus min order date (broadcast 1-row anchor, documented);
    // everything is exact integer week arithmetic off the day diff —
    // no engine date-convention in the gate. One collapse shuffle.
    "date_fiscal_445" -> Q(
      (s, d) => {
        val mn = Tables.orders(s, d)
          .agg(min(to_date(col("o_orderdate"))).as("mnd"))
        Tables.orders(s, d)
          .crossJoin(broadcast(mn))
          .withColumn("wk",
            expr("CAST(datediff(to_date(o_orderdate), mnd) AS BIGINT) div 7"))
          .withColumn("fy", expr("wk div 52"))
          .withColumn("wiy", expr("wk % 52"))
          .withColumn("fq", expr("wiy div 13 + 1"))
          .withColumn("wiq", expr("wiy % 13"))
          .withColumn("period",
            when(col("wiq") < 4, 1L).when(col("wiq") < 8, 2L).otherwise(3L))
          .groupBy("fy", "fq", "period")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).cast("long")
              .as("rev"))
          .orderBy("fy", "fq", "period")
      },
      Some(
        """WITH mn AS (SELECT min(CAST(o_orderdate AS DATE)) AS mnd FROM orders),
          |w AS (SELECT CAST(datediff('day', mnd, CAST(o_orderdate AS DATE))
          |        AS BIGINT) // 7 AS wk,
          |    CAST(floor(o_totalprice) AS BIGINT) AS rev
          |  FROM orders CROSS JOIN mn),
          |f AS (SELECT wk // 52 AS fy, (wk % 52) // 13 + 1 AS fq,
          |    CASE WHEN wk % 52 % 13 < 4 THEN 1
          |         WHEN wk % 52 % 13 < 8 THEN 2 ELSE 3 END AS period, rev
          |  FROM w)
          |SELECT fy, fq, CAST(period AS BIGINT) AS period,
          |  count(*) AS n_orders, CAST(sum(rev) AS BIGINT) AS rev
          |FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Error-budget burn — the SRE readout over the event log: daily
    // error rate against a 1% budget (strict integer compare), with
    // the running count of budget-violating days. The corpus collapses
    // to the calendar-bounded day frame first; the only global window
    // runs on that tiny frame (the stats_max_drawdown discipline).
    "events_error_budget" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("dy"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_err"))
          .withColumn("over", when(col("n_err") * 100 > col("n"), 1L)
            .otherwise(0L))
        val w = Window.orderBy("dy")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        day.withColumn("burn_days", sum("over").over(w).cast("long"))
          .select(date_format(col("dy"), "yyyy-MM-dd").as("day"),
            col("n").cast("long").as("n"),
            col("n_err").cast("long").as("n_err"),
            expr("n_err * 1000000L div n").as("err_rate_x1e6"),
            col("over").cast("long").as("over_budget"), col("burn_days"))
          .orderBy("day")
      },
      Some(
        """WITH d AS (SELECT CAST(ts AS DATE) AS dy, count(*) AS n,
          |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_err
          |  FROM events GROUP BY 1),
          |o AS (SELECT dy, n, n_err,
          |    CASE WHEN n_err * 100 > n THEN 1 ELSE 0 END AS over FROM d)
          |SELECT strftime(dy, '%Y-%m-%d') AS day, n, n_err,
          |  CAST(n_err * 1000000 // n AS BIGINT) AS err_rate_x1e6,
          |  CAST(over AS BIGINT) AS over_budget,
          |  CAST(sum(over) OVER (ORDER BY dy
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS burn_days
          |FROM o ORDER BY day""".stripMargin)),

    // Classical additive seasonal decomposition (STL-lite): the
    // centered 7-day moving sum is the trend (×7 so no division enters
    // the frame), detrended = 7·y − trend_sum, and the day-of-week
    // seasonal component is the mean detrended value per dow —
    // sign-factored ×1e3 floors only at the final readout. dow from
    // (epochDays+4) mod 7 (the heatmap discipline — engine date
    // conventions never enter the gate); complete 7-day windows only.
    // The corpus collapses to the calendar-bounded day frame first; the
    // centered window runs on that tiny frame.
    "date_seasonal_decompose" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("dy"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("y"))
        val w = Window.orderBy("dy").rowsBetween(-3, 3)
        day
          .withColumn("tsum", sum("y").over(w))
          .withColumn("wn", count(lit(1)).over(w))
          .filter(col("wn") === 7)
          .withColumn("detr7", col("y") * 7 - col("tsum"))
          .groupBy(expr(
            "(datediff(dy, to_date('1970-01-01')) + 4) % 7").cast("long")
            .as("dow"))
          .agg(count(lit(1)).cast("long").as("n_days"),
            sum("detr7").cast("long").as("detr7_sum"))
          .withColumn("seasonal_x1e3",
            when(col("detr7_sum") >= 0,
              expr("detr7_sum * 1000L div (7L * n_days)"))
              .otherwise(-expr("(-detr7_sum) * 1000L div (7L * n_days)"))
              .cast("long"))
          .orderBy("dow")
      },
      Some(
        """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS dy,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
          |  FROM orders GROUP BY 1),
          |t AS (SELECT dy, y,
          |    CAST(sum(y) OVER (ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3
          |      FOLLOWING) AS BIGINT) AS tsum,
          |    count(*) OVER (ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3
          |      FOLLOWING) AS wn
          |  FROM day),
          |dt AS (SELECT (datediff('day', DATE '1970-01-01', dy) + 4) % 7 AS dow,
          |    y * 7 - tsum AS detr7
          |  FROM t WHERE wn = 7)
          |SELECT CAST(dow AS BIGINT) AS dow, count(*) AS n_days,
          |  CAST(sum(detr7) AS BIGINT) AS detr7_sum,
          |  CAST(CASE WHEN sum(detr7) >= 0
          |    THEN sum(detr7) * 1000 // (7 * count(*))
          |    ELSE -((-sum(detr7)) * 1000 // (7 * count(*))) END AS BIGINT)
          |    AS seasonal_x1e3
          |FROM dt GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Quality×duplication interaction — "are duplicates lower-quality
    // documents?", the 2×2 census that decides whether dedup and
    // quality filtering are redundant or complementary gates (if dups
    // were uniformly low quality, the quality gate would subsume
    // dedup). Shares the exact-plant corpus and the SAME quality /
    // fingerprint fragments as the dedup and curation oracles; odds
    // ratio cross-multiplied, nullif-guarded. One scan + one fp-keyed
    // family join.
    "pipeline_quality_dup_matrix" -> Q(
      (s, d) => {
        val sf = graft.ops.TextOps.scoreFrame(plantedDocs(s, d, exact = true))
        val t = sf.select(col("doc_id"),
          graft.ops.TextOps.qualityFromCounts(col("n_tokens"), col("n_punct"),
            col("s_en")).as("quality"),
          col("fp"))
        val fam = t.groupBy("fp").agg(count(lit(1)).as("fn"))
        t.join(fam, "fp")
          .select(when(col("quality") >= 7000, 1L).otherwise(0L).as("hq"),
            when(col("fn") > 1, 1L).otherwise(0L).as("dup"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("hq") === 1 && col("dup") === 0, 1L).otherwise(0L))
              .cast("long").as("hq_clean"),
            sum(when(col("hq") === 1 && col("dup") === 1, 1L).otherwise(0L))
              .cast("long").as("hq_dup"),
            sum(when(col("hq") === 0 && col("dup") === 0, 1L).otherwise(0L))
              .cast("long").as("lq_clean"),
            sum(when(col("hq") === 0 && col("dup") === 1, 1L).otherwise(0L))
              .cast("long").as("lq_dup"))
          .withColumn("odds_x1e6", expr(
            "CAST(CAST(hq_dup AS DECIMAL(38,0)) * lq_clean * 1000000 div nullif(CAST(hq_clean AS DECIMAL(38,0)) * lq_dup, 0) AS BIGINT)"))
      },
      Some(TextSql.qualityDupMatrix(minQuality = 7000))),

    // Rich-club coefficient — do the highest-degree parts also
    // co-occur with EACH OTHER (φ = realized fraction of possible
    // rich-rich edges)? The hub-interconnection scalar complementing
    // graph_assortativity's global correlation. Rich set = degree ≥ 8
    // on the support-pruned co-order graph (fixed documented
    // threshold); everything past the shared e0 derivation runs on
    // edge-count-sized frames with the rich set broadcast.
    "graph_rich_club" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb").localCheckpoint(true)
        val deg = e0.select(col("pa").as("v"))
          .unionByName(e0.select(col("pb").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val rich = deg.filter(col("deg") >= 8).select("v")
        val eRich = e0
          .join(broadcast(rich.withColumnRenamed("v", "pa")), Seq("pa"), "left_semi")
          .join(broadcast(rich.withColumnRenamed("v", "pb")), Seq("pb"), "left_semi")
          .agg(count(lit(1)).as("e_rich"))
        val tot = e0.agg(count(lit(1)).as("n_edges"))
        val nodes = deg.agg(count(lit(1)).as("n_nodes"))
        val nRich = rich.agg(count(lit(1)).as("n_rich"))
        nodes.crossJoin(broadcast(tot)).crossJoin(broadcast(nRich))
          .crossJoin(broadcast(eRich))
          .select(col("n_nodes").cast("long").as("n_nodes"),
            col("n_edges").cast("long").as("n_edges"),
            col("n_rich").cast("long").as("n_rich"),
            col("e_rich").cast("long").as("e_rich"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("e_rich")) * dec(lit(2000000L)),
              nullif(dec(col("n_rich")) * (dec(col("n_rich")) - 1),
                dec(lit(0L)))).cast("long").as("phi_x1e6"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("n_edges")) * dec(lit(2000000L)),
              nullif(dec(col("n_nodes")) * (dec(col("n_nodes")) - 1),
                dec(lit(0L)))).cast("long").as("density_x1e6"))
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |deg AS (SELECT v, count(*) AS deg FROM
          |        (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY 1),
          |rich AS (SELECT v FROM deg WHERE deg >= 8),
          |er AS (SELECT count(*) AS e_rich FROM e0
          |       WHERE pa IN (SELECT v FROM rich) AND pb IN (SELECT v FROM rich)),
          |c AS (SELECT (SELECT count(*) FROM deg) AS n_nodes,
          |    (SELECT count(*) FROM e0) AS n_edges,
          |    (SELECT count(*) FROM rich) AS n_rich,
          |    (SELECT e_rich FROM er) AS e_rich)
          |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
          |  CAST(n_edges AS BIGINT) AS n_edges,
          |  CAST(n_rich AS BIGINT) AS n_rich, CAST(e_rich AS BIGINT) AS e_rich,
          |  CAST(CAST(e_rich AS HUGEINT) * 2000000
          |    // nullif(CAST(n_rich AS HUGEINT) * (n_rich - 1), 0) AS BIGINT)
          |    AS phi_x1e6,
          |  CAST(CAST(n_edges AS HUGEINT) * 2000000
          |    // nullif(CAST(n_nodes AS HUGEINT) * (n_nodes - 1), 0) AS BIGINT)
          |    AS density_x1e6
          |FROM c""".stripMargin)),

    // Unicode NFC normalization audit — the canonical-composition pass
    // every tokenizer runs first (decomposed "e"+U+0301 and precomposed
    // "é" must not become two vocab entries). Normalization via the
    // codegen NfcNormalizeExpr (UAX #15, mirroring DuckDB's
    // nfc_normalize exactly); the corpus is ASCII so decomposed-accent
    // variants of docs 0-39 are planted under doc_id+600000 (the plant
    // discipline). Census: denormalized docs + code points saved per
    // source. ONE codegen scan.
    "text_unicode_nfc_audit" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 600000)
          .withColumn("text", concat(lit("re\u0301sume\u0301 nai\u0308ve "),
            substring(col("text"), 1, 40)))
        base.unionByName(plants)
          .select(col("source"), col("text"),
            graft.functions.NfcNormalizeExpr(col("text")).as("nfc"))
          .select(col("source"),
            when(col("text") =!= col("nfc"), 1L).otherwise(0L).as("denorm"),
            (length(col("text")) - length(col("nfc"))).cast("long").as("saved"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("denorm").cast("long").as("n_denorm"),
            sum("saved").cast("long").as("cp_saved"))
          .withColumn("denorm_rate_x1e6", expr("n_denorm * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source, 're' || chr(769) || 'sume' || chr(769) || ' nai'
          |      || chr(776) || 've ' || substring(text, 1, 40) AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source, text, nfc_normalize(text) AS nfc FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN text <> nfc THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_denorm,
          |  CAST(sum(length(text) - length(nfc)) AS BIGINT) AS cp_saved,
          |  CAST(sum(CASE WHEN text <> nfc THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS denorm_rate_x1e6
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Two-proportion A/B z² — THE experimentation statistic: purchase
    // conversion of the even-user cohort vs the odd (deterministic
    // assignment stands in for the experiment flag). z² =
    // (a·n₂ − b·n₁)²·N / (n₁·n₂·T·(N−T)) keeps every operand integral
    // (pooled-variance z-test, z² ~ χ²(1) so significance reads off
    // the same table as stats_chi2_segments). One user-grain collapse
    // then a 2-row frame.
    "stats_ab_test" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val u = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
          .withColumn("grp", (col("user_id") % 2 === 0).cast("int"))
        val g = u.groupBy("grp")
          .agg(count(lit(1)).as("n"), sum("conv").as("a"))
        g.agg(
            max(when(col("grp") === 1, col("n"))).as("n1"),
            max(when(col("grp") === 1, col("a"))).as("a1"),
            max(when(col("grp") === 0, col("n"))).as("n2"),
            max(when(col("grp") === 0, col("a"))).as("a2"))
          .select(col("n1").cast("long").as("n_even"),
            col("a1").cast("long").as("conv_even"),
            col("n2").cast("long").as("n_odd"),
            col("a2").cast("long").as("conv_odd"),
            graft.functions.GraftFunctions.longDiv(
              (dec(col("a1")) * dec(col("n2")) - dec(col("a2")) * dec(col("n1")))
                * (dec(col("a1")) * dec(col("n2")) - dec(col("a2")) * dec(col("n1")))
                * (dec(col("n1")) + dec(col("n2"))) * dec(lit(1000000L)),
              nullif(dec(col("n1")) * dec(col("n2"))
                * (dec(col("a1")) + dec(col("a2")))
                * (dec(col("n1")) + dec(col("n2")) - dec(col("a1")) - dec(col("a2"))),
                dec(lit(0L)))).cast("long").as("z2_x1e6"))
      },
      Some(
        """WITH u AS (SELECT user_id,
          |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          |  FROM events GROUP BY 1),
          |g AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS grp,
          |    count(*) AS n, CAST(sum(conv) AS HUGEINT) AS a
          |  FROM u GROUP BY 1),
          |c AS (SELECT
          |    max(CASE WHEN grp = 1 THEN n END) AS n1,
          |    max(CASE WHEN grp = 1 THEN a END) AS a1,
          |    max(CASE WHEN grp = 0 THEN n END) AS n2,
          |    max(CASE WHEN grp = 0 THEN a END) AS a2
          |  FROM g)
          |SELECT CAST(n1 AS BIGINT) AS n_even, CAST(a1 AS BIGINT) AS conv_even,
          |  CAST(n2 AS BIGINT) AS n_odd, CAST(a2 AS BIGINT) AS conv_odd,
          |  CAST((a1 * n2 - a2 * n1) * (a1 * n2 - a2 * n1)
          |      * (CAST(n1 AS HUGEINT) + n2) * 1000000
          |    // nullif(CAST(n1 AS HUGEINT) * n2 * (a1 + a2)
          |      * (n1 + n2 - a1 - a2), 0) AS BIGINT) AS z2_x1e6
          |FROM c""".stripMargin)),

    // Charset/ingest-artifact audit — control characters, replacement
    // characters (U+FFFD, the mojibake tombstone), and non-ASCII share
    // per source: the first OCR/encoding triage every crawl ingest
    // runs. Planted artifacts under doc_id+700000 prove the counters.
    // ONE codegen scan (regexp strips + lengths).
    "text_charset_audit" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 700000)
          .withColumn("text", concat(lit("bad\u0001ctl \ufffd\ufffd "),
            substring(col("text"), 1, 40)))
        base.unionByName(plants)
          .select(col("source"),
            (length(col("text")) - length(regexp_replace(col("text"),
              "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))).as("n_ctl"),
            (length(col("text")) - length(regexp_replace(col("text"),
              "\uFFFD", ""))).as("n_repl"),
            (length(col("text")) - length(regexp_replace(col("text"),
              "[^\\x00-\\x7f]", ""))).as("n_nonascii"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("n_ctl") > 0 || col("n_repl") > 0, 1L).otherwise(0L))
              .cast("long").as("n_artifact_docs"),
            sum("n_ctl").cast("long").as("ctl_chars"),
            sum("n_repl").cast("long").as("repl_chars"),
            sum("n_nonascii").cast("long").as("nonascii_chars"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source, 'bad' || chr(1) || 'ctl ' || chr(65533) || chr(65533)
          |      || ' ' || substring(text, 1, 40) AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(text) - length(regexp_replace(text,
          |      '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS n_ctl,
          |    length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
          |      AS n_repl,
          |    length(text) - length(regexp_replace(text, '[^\x00-\x7f]', '', 'g'))
          |      AS n_nonascii
          |  FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN n_ctl > 0 OR n_repl > 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_artifact_docs,
          |  CAST(sum(n_ctl) AS BIGINT) AS ctl_chars,
          |  CAST(sum(n_repl) AS BIGINT) AS repl_chars,
          |  CAST(sum(n_nonascii) AS BIGINT) AS nonascii_chars
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bot-user detection census — the traffic-cleaning rule pair every
    // event pipeline runs before analytics: single-hour burst (≥ 20
    // events in one clock hour) OR type dominance (one event type ≥
    // 90% of an n ≥ 10 user's events). The organic corpus is
    // bot-free, so a deterministic 300-clicks-in-one-hour bot is
    // planted as user 9000001 (epoch-micro arithmetic both engines).
    // Three user-prefixed collapses, exact integer rules.
    "events_bot_users" -> Q(
      (s, d) => {
        val planted = s.range(300).select(
          (col("id") + 5000000L).as("event_id"),
          expr("timestamp_micros(1704067200000000L + id * 1000000L)").as("ts"),
          lit(9000001L).as("user_id"),
          lit("click").as("event_type"))
        val ev = Tables.events(s, d)
          .select("event_id", "ts", "user_id", "event_type")
          .unionByName(planted)
        val burst = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")))
          .agg(count(lit(1)).as("hn"))
          .groupBy("user_id").agg(max("hn").as("burst"))
        val dom = ev.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("tn"))
          .groupBy("user_id")
          .agg(sum("tn").as("n"), max("tn").as("mx"))
        dom.join(burst, "user_id")
          .select(
            when(col("burst") >= 20, 1L).otherwise(0L).as("b_rule"),
            when(col("n") >= 10 && col("mx") * 10 >= col("n") * 9, 1L)
              .otherwise(0L).as("d_rule"))
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum(when(col("b_rule") + col("d_rule") > 0, 1L).otherwise(0L))
              .cast("long").as("n_bots"),
            sum(when(col("b_rule") === 1 && col("d_rule") === 0, 1L)
              .otherwise(0L)).cast("long").as("burst_only"),
            sum(when(col("b_rule") === 0 && col("d_rule") === 1, 1L)
              .otherwise(0L)).cast("long").as("dom_only"),
            sum(when(col("b_rule") === 1 && col("d_rule") === 1, 1L)
              .otherwise(0L)).cast("long").as("both_rules"))
      },
      Some(
        """WITH ev AS (
          |  SELECT event_id, ts, user_id, event_type FROM events
          |  UNION ALL
          |  SELECT 5000000 + i, make_timestamp(1704067200000000 + i * 1000000),
          |    9000001, 'click'
          |  FROM (SELECT unnest(generate_series(0, 299)) AS i)),
          |b AS (SELECT user_id, max(hn) AS burst FROM (
          |    SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS hn
          |    FROM ev GROUP BY 1, 2) GROUP BY 1),
          |t AS (SELECT user_id, CAST(sum(tn) AS BIGINT) AS n,
          |    CAST(max(tn) AS BIGINT) AS mx FROM (
          |    SELECT user_id, event_type, count(*) AS tn FROM ev GROUP BY 1, 2)
          |  GROUP BY 1),
          |r AS (SELECT
          |    CASE WHEN burst >= 20 THEN 1 ELSE 0 END AS b_rule,
          |    CASE WHEN n >= 10 AND mx * 10 >= n * 9 THEN 1 ELSE 0 END AS d_rule
          |  FROM t JOIN b USING (user_id))
          |SELECT count(*) AS n_users,
          |  CAST(sum(CASE WHEN b_rule + d_rule > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_bots,
          |  CAST(sum(CASE WHEN b_rule = 1 AND d_rule = 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS burst_only,
          |  CAST(sum(CASE WHEN b_rule = 0 AND d_rule = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS dom_only,
          |  CAST(sum(CASE WHEN b_rule = 1 AND d_rule = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS both_rules
          |FROM r""".stripMargin)),

    // Supplier scorecard — the procurement panel: per-supplier revenue,
    // line volume, and 30-day on-time-ship rate, ranked within nation
    // (top 3 per nation). One fact-fact keyed join (lineitem ⋈ orders
    // on orderkey) + a supplier-grain collapse; the ranking window runs
    // on the supplier-sized frame partitioned by nation.
    "supplier_scorecard" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            to_date(col("o_orderdate")).as("od")), "l_orderkey")
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("n_lines"),
            sum(expr("CAST(floor(l_extendedprice) AS BIGINT)")).as("rev"),
            sum(when(datediff(to_date(col("l_shipdate")), col("od")) <= 30, 1L)
              .otherwise(0L)).as("on_time"))
        val sc = li.join(Tables.supplier(s, d)
            .select(col("s_suppkey").as("suppkey"), col("s_nationkey")), "suppkey")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
            "s_nationkey")
        val w = Window.partitionBy("n_name").orderBy(desc("rev"), col("suppkey"))
        sc.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("n_name").as("nation"), col("rk").cast("long").as("rk"),
            col("suppkey").cast("long").as("suppkey"),
            col("n_lines").cast("long").as("n_lines"),
            col("rev").cast("long").as("rev"),
            expr("on_time * 1000000L div n_lines").as("ontime_x1e6"))
          .orderBy("nation", "rk")
      },
      Some(
        """WITH li AS (SELECT l_suppkey AS suppkey, count(*) AS n_lines,
          |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS rev,
          |    CAST(sum(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
          |        CAST(l_shipdate AS DATE)) <= 30 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS on_time
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |  GROUP BY 1),
          |sc AS (SELECT n_name, suppkey, n_lines, rev, on_time,
          |    row_number() OVER (PARTITION BY n_name ORDER BY rev DESC, suppkey)
          |      AS rk
          |  FROM li JOIN supplier ON s_suppkey = suppkey
          |  JOIN nation ON n_nationkey = s_nationkey)
          |SELECT n_name AS nation, CAST(rk AS BIGINT) AS rk,
          |  CAST(suppkey AS BIGINT) AS suppkey, n_lines, rev,
          |  CAST(on_time * 1000000 // n_lines AS BIGINT) AS ontime_x1e6
          |FROM sc WHERE rk <= 3 ORDER BY nation, rk""".stripMargin)),

    // Capture–recapture vocabulary estimate (Chapman's Lincoln–Petersen)
    // — the mark-recapture estimator applied to corpus vocabulary: the
    // even-doc vocab "marks" words, the odd-doc vocab "recaptures"
    // them, N̂ = (n₁+1)(n₂+1)/(m+1) − 1. At 100 TB this is how you
    // estimate total distinct count from two partitions WITHOUT a
    // global distinct — the estimator itself is the scale story; the
    // exact corpus-wide count rides along here (testable at these SFs)
    // to expose the estimator's bias. ONE explode + a word collapse.
    "text_capture_recapture" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val w = Tables.documents(s, d)
          .select((col("doc_id") % 2 === 0).as("even"),
            explode(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')"))
              .as("w"))
          .groupBy("w")
          .agg(max(when(col("even"), 1L).otherwise(0L)).as("in_even"),
            max(when(!col("even"), 1L).otherwise(0L)).as("in_odd"))
        w.agg(sum("in_even").as("n1"), sum("in_odd").as("n2"),
            sum(col("in_even") * col("in_odd")).as("m"),
            count(lit(1)).as("actual"))
          .select(col("n1").cast("long").as("n1"),
            col("n2").cast("long").as("n2"),
            col("m").cast("long").as("m"),
            col("actual").cast("long").as("actual_vocab"),
            (graft.functions.GraftFunctions.longDiv(
              (dec(col("n1")) + 1) * (dec(col("n2")) + 1),
              dec(col("m")) + 1) - 1).cast("long").as("chapman_est"))
      },
      Some(
        """WITH w AS (SELECT w,
          |    max(CASE WHEN even THEN 1 ELSE 0 END) AS in_even,
          |    max(CASE WHEN even THEN 0 ELSE 1 END) AS in_odd
          |  FROM (SELECT doc_id % 2 = 0 AS even,
          |      unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
          |        x -> x <> '')) AS w
          |    FROM documents)
          |  GROUP BY 1)
          |SELECT CAST(sum(in_even) AS BIGINT) AS n1,
          |  CAST(sum(in_odd) AS BIGINT) AS n2,
          |  CAST(sum(in_even * in_odd) AS BIGINT) AS m,
          |  count(*) AS actual_vocab,
          |  CAST((CAST(sum(in_even) AS HUGEINT) + 1) * (sum(in_odd) + 1)
          |    // (sum(in_even * in_odd) + 1) - 1 AS BIGINT) AS chapman_est
          |FROM w""".stripMargin)),

    // Rolling-median (median filter) of daily revenue — the robust
    // smoother that kills single-day spikes a moving average smears
    // (the windowed twin of stats_max_drawdown's running extremes):
    // exact 7-day median = 4th smallest of the complete window,
    // engine-invariant (both sides sort the same 7 integers). The
    // corpus collapses to the day frame first; the window runs there.
    "date_rolling_median" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("dy"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("y"))
        val w = Window.orderBy("dy").rowsBetween(-3, 3)
        day
          .withColumn("arr", collect_list("y").over(w))
          .filter(size(col("arr")) === 7)
          .select(date_format(col("dy"), "yyyy-MM-dd").as("day"),
            col("y").cast("long").as("y"),
            element_at(sort_array(col("arr")), 4).cast("long").as("med7"))
          .withColumn("dev", (col("y") - col("med7")).cast("long"))
          .orderBy("day")
      },
      Some(
        """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS dy,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
          |  FROM orders GROUP BY 1),
          |t AS (SELECT dy, y,
          |    array_agg(y) OVER (ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3
          |      FOLLOWING) AS arr
          |  FROM day)
          |SELECT strftime(dy, '%Y-%m-%d') AS day, y,
          |  CAST(list_sort(arr)[4] AS BIGINT) AS med7,
          |  CAST(y - list_sort(arr)[4] AS BIGINT) AS dev
          |FROM t WHERE len(arr) = 7 ORDER BY day""".stripMargin)),

    // Top purchase paths — the 3-step sequence census behind "how do
    // users actually reach checkout" (the path-mining readout one level
    // deeper than events_markov_transitions' single-step matrix): for
    // every purchase with two preceding same-user events, the
    // (prev2 > prev1 > purchase) path string, top 10 by count. One
    // user-keyed window shuffle.
    "events_top_paths" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("p1", lag("event_type", 1).over(w))
          .withColumn("p2", lag("event_type", 2).over(w))
          .filter(col("event_type") === "purchase"
            && col("p1").isNotNull && col("p2").isNotNull)
          .groupBy(concat(col("p2"), lit(">"), col("p1"), lit(">purchase"))
            .as("path"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy(desc("n"), asc("path")).limit(10)
      },
      Some(
        """WITH t AS (SELECT event_type,
          |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS p1,
          |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS p2
          |  FROM events)
          |SELECT p2 || '>' || p1 || '>purchase' AS path, count(*) AS n
          |FROM t
          |WHERE event_type = 'purchase' AND p1 IS NOT NULL AND p2 IS NOT NULL
          |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // Aspect-ratio bucketing — the SDXL-style batching assignment for
    // image training (variable-aspect images batch only within a
    // bucket; assignment quality decides crop waste): each asset goes
    // to the bucket minimizing the exact cross-multiplied aspect error
    // |w·bh − h·bw|·1e6/(w·bh), ties by bucket order. The bucket set is
    // a broadcast 5-row frame; the per-asset argmin is a window over
    // the ×5 fan-out. Census per bucket with mean relative error.
    "multimodal_aspect_buckets" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val assets = graft.ops.Multimodal
          .assetsFromDocuments(Tables.documents(s, d)).toDF()
          .select(col("asset_id"), col("meta.width").as("w"),
            col("meta.height").as("h"))
        val buckets = s.createDataFrame(Seq(
          (0L, "1:1", 1L, 1L), (1L, "4:3", 4L, 3L), (2L, "3:4", 3L, 4L),
          (3L, "16:9", 16L, 9L), (4L, "9:16", 9L, 16L)))
          .toDF("bidx", "bucket", "bw", "bh")
        val wr = Window.partitionBy("asset_id")
          .orderBy(col("err_x1e6"), col("bidx"))
        assets.crossJoin(broadcast(buckets))
          .withColumn("err_x1e6", graft.functions.GraftFunctions.longDiv(
            abs(dec(col("w")) * dec(col("bh")) - dec(col("h")) * dec(col("bw")))
              * dec(lit(1000000L)),
            dec(col("w")) * dec(col("bh"))).cast("long"))
          .withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n_assets"),
            sum("err_x1e6").cast("long").as("err_sum_x1e6"))
          .withColumn("mean_err_x1e6", expr("err_sum_x1e6 div n_assets"))
          .orderBy("bucket")
      },
      Some(
        """WITH a AS (SELECT doc_id AS asset_id,
          |    CAST(doc_id % 640 + 16 AS BIGINT) AS w,
          |    CAST(doc_id % 480 + 16 AS BIGINT) AS h
          |  FROM documents),
          |b AS (SELECT * FROM (VALUES (0, '1:1', 1, 1), (1, '4:3', 4, 3),
          |    (2, '3:4', 3, 4), (3, '16:9', 16, 9), (4, '9:16', 9, 16))
          |  AS t(bidx, bucket, bw, bh)),
          |e AS (SELECT asset_id, bucket, bidx,
          |    CAST(abs(CAST(w AS HUGEINT) * bh - CAST(h AS HUGEINT) * bw)
          |      * 1000000 // (CAST(w AS HUGEINT) * bh) AS BIGINT) AS err_x1e6
          |  FROM a CROSS JOIN b),
          |r AS (SELECT bucket, err_x1e6,
          |    row_number() OVER (PARTITION BY asset_id
          |      ORDER BY err_x1e6, bidx) AS rk
          |  FROM e)
          |SELECT bucket, count(*) AS n_assets,
          |  CAST(sum(err_x1e6) AS BIGINT) AS err_sum_x1e6,
          |  CAST(sum(err_x1e6) // count(*) AS BIGINT) AS mean_err_x1e6
          |FROM r WHERE rk = 1 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gibberish / keyboard-mash detector — the quality rule family
    // neither Gopher's length/stopword rules nor langid covers: a doc
    // with ≥20 letters is gibberish when vowels are under 20% of
    // letters (vowels·5 < letters, strict integer) OR a 6+ consonant
    // run appears. Mash plants under doc_id+900000 prove the census.
    // ONE codegen scan (regex strips + lengths).
    "text_gibberish_detect" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 900000)
          .withColumn("text", lit("zxqwv bnmkl pfftj rrghw dszxc qwrtp"))
        base.unionByName(plants)
          .select(col("source"),
            length(regexp_replace(lower(col("text")), "[^a-z]", ""))
              .as("letters"),
            length(regexp_replace(lower(col("text")), "[^aeiou]", ""))
              .as("vowels"),
            when(lower(col("text"))
              .rlike("[bcdfghjklmnpqrstvwxz]{6,}"), 1L).otherwise(0L)
              .as("has_run"))
          .withColumn("gib",
            when(col("letters") >= 20 &&
              (col("vowels") * 5 < col("letters") || col("has_run") === 1), 1L)
              .otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("gib").cast("long").as("n_gibberish"))
          .withColumn("gib_rate_x1e6", expr("n_gibberish * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source, 'zxqwv bnmkl pfftj rrghw dszxc qwrtp' AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS letters,
          |    length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS vowels,
          |    CASE WHEN regexp_matches(lower(text), '[bcdfghjklmnpqrstvwxz]{6,}')
          |      THEN 1 ELSE 0 END AS has_run
          |  FROM docs),
          |g AS (SELECT source,
          |    CASE WHEN letters >= 20 AND (vowels * 5 < letters OR has_run = 1)
          |      THEN 1 ELSE 0 END AS gib
          |  FROM f)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(gib) AS BIGINT) AS n_gibberish,
          |  CAST(sum(gib) * 1000000 // count(*) AS BIGINT) AS gib_rate_x1e6
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Simpson's-paradox audit — does the even-vs-odd customer cohort
    // comparison of mean order value REVERSE inside priority strata vs
    // the aggregate? The classic aggregation trap every metrics
    // platform must surface before anyone trusts a topline delta. Mean
    // comparison by exact cross-multiplication (sign(sA·nB − sB·nA) —
    // no division anywhere); per-stratum rows plus the __ALL__
    // aggregate row from one grouping-sets-style union of the SAME
    // collapsed frame.
    "stats_simpson_check" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val o = Tables.orders(s, d)
          .select(col("o_orderpriority").as("stratum"),
            (col("o_custkey") % 2 === 0).as("ea"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("x"))
        val g = o.groupBy("stratum")
          .agg(sum(when(col("ea"), 1L).otherwise(0L)).as("n_even"),
            sum(when(col("ea"), col("x")).otherwise(0L)).as("s_even"),
            sum(when(!col("ea"), 1L).otherwise(0L)).as("n_odd"),
            sum(when(!col("ea"), col("x")).otherwise(0L)).as("s_odd"))
          .localCheckpoint(true)
        val all = g.agg(sum("n_even").as("n_even"), sum("s_even").as("s_even"),
            sum("n_odd").as("n_odd"), sum("s_odd").as("s_odd"))
          .withColumn("stratum", lit("__ALL__"))
          .select("stratum", "n_even", "s_even", "n_odd", "s_odd")
        g.select("stratum", "n_even", "s_even", "n_odd", "s_odd")
          .unionByName(all)
          .withColumn("sign_diff",
            signum((dec(col("s_even")) * dec(col("n_odd"))
              - dec(col("s_odd")) * dec(col("n_even"))).cast("double"))
              .cast("long"))
          .select(col("stratum"), col("n_even").cast("long").as("n_even"),
            col("s_even").cast("long").as("s_even"),
            col("n_odd").cast("long").as("n_odd"),
            col("s_odd").cast("long").as("s_odd"), col("sign_diff"))
          .orderBy("stratum")
      },
      Some(
        """WITH o AS (SELECT o_orderpriority AS stratum,
          |    o_custkey % 2 = 0 AS ea,
          |    CAST(floor(o_totalprice) AS BIGINT) AS x
          |  FROM orders),
          |g AS (SELECT stratum,
          |    CAST(sum(CASE WHEN ea THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
          |    CAST(sum(CASE WHEN ea THEN x ELSE 0 END) AS BIGINT) AS s_even,
          |    CAST(sum(CASE WHEN ea THEN 0 ELSE 1 END) AS BIGINT) AS n_odd,
          |    CAST(sum(CASE WHEN ea THEN 0 ELSE x END) AS BIGINT) AS s_odd
          |  FROM o GROUP BY 1),
          |u AS (SELECT * FROM g
          |      UNION ALL
          |      SELECT '__ALL__', CAST(sum(n_even) AS BIGINT),
          |        CAST(sum(s_even) AS BIGINT), CAST(sum(n_odd) AS BIGINT),
          |        CAST(sum(s_odd) AS BIGINT) FROM g)
          |SELECT stratum, n_even, s_even, n_odd, s_odd,
          |  CAST(sign(CAST(s_even AS HUGEINT) * n_odd
          |    - CAST(s_odd AS HUGEINT) * n_even) AS BIGINT) AS sign_diff
          |FROM u ORDER BY stratum""".stripMargin)),

    // Pseudo-relevance-feedback term expansion (Rocchio-style PRF) —
    // the classic retrieval loop: run BM25, mine the top-10 documents
    // for terms over-represented vs the corpus, expand the query. The
    // BM25 stage is the shared hash-green machinery; the expansion is
    // EXACT integers (lift = (df_top/10)/(df_corpus/N) ×1e6, df_top ≥ 3
    // floor, query terms excluded). Top-10 ids broadcast back into one
    // token scan; candidate frame is vocab-of-10-docs-sized.
    "search_prf_terms" -> Q(
      (s, d) => {
        val terms = Seq("spark", "join", "vector")
        val docs = Tables.documents(s, d)
        val top10 = graft.ops.TextOps.bm25TopK(docs, terms, k = 10)
          .select("doc_id")
        val toks = docs
          .select(col("doc_id"),
            explode(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')"))
              .as("w"))
        // n_docs from the TOKENIZED frame (docs with >= 1 token), the
        // same basis the oracle's corpus CTE and bm25TopK use (ADVICE
        // r9): docs.count() diverges if any document tokenizes to zero
        val n = toks.agg(countDistinct("doc_id").as("n_docs"))
        val cdf = toks.groupBy("w").agg(countDistinct("doc_id").as("dfc"))
        val tdf = toks.join(broadcast(top10), "doc_id")
          .filter(!col("w").isin(terms: _*))
          .groupBy("w").agg(countDistinct("doc_id").as("dft"))
          .filter(col("dft") >= 3)
        tdf.join(cdf, "w")
          .crossJoin(broadcast(n))
          .select(col("w").as("term"), col("dft").cast("long").as("df_top"),
            col("dfc").cast("long").as("df_corpus"),
            expr("dft * n_docs * 1000000L div (10L * dfc)").as("lift_x1e6"))
          .orderBy(desc("lift_x1e6"), asc("term")).limit(5)
      },
      Some(TextSql.prfTerms(Seq("spark", "join", "vector")))),

    // Freeman degree centralization — how star-like the co-order graph
    // is as ONE number (1 = perfect star, 0 = regular): Σ(dmax − d_i)
    // normalized by the star's maximum, (n−1)(n−2). Complements
    // graph_assortativity (correlation) and graph_rich_club (hub
    // interconnection) with the network-level concentration scalar.
    // Everything past the shared e0 derivation is one tiny aggregate.
    "graph_centralization" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb")
        val deg = e0.select(col("pa").as("v"))
          .unionByName(e0.select(col("pb").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        deg.agg(count(lit(1)).as("n"), max("deg").as("dmax"),
            sum("deg").as("dsum"))
          .select(col("n").cast("long").as("n_nodes"),
            col("dmax").cast("long").as("max_degree"),
            (col("dsum") / 2).cast("long").as("n_edges"),
            graft.functions.GraftFunctions.longDiv(
              (dec(col("n")) * dec(col("dmax")) - dec(col("dsum")))
                * dec(lit(1000000L)),
              nullif((dec(col("n")) - 1) * (dec(col("n")) - 2), dec(lit(0L))))
              .cast("long").as("centralization_x1e6"))
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |deg AS (SELECT v, count(*) AS deg FROM
          |        (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY 1),
          |c AS (SELECT CAST(count(*) AS HUGEINT) AS n,
          |    CAST(max(deg) AS HUGEINT) AS dmax,
          |    CAST(sum(deg) AS HUGEINT) AS dsum FROM deg)
          |SELECT CAST(n AS BIGINT) AS n_nodes, CAST(dmax AS BIGINT) AS max_degree,
          |  CAST(dsum // 2 AS BIGINT) AS n_edges,
          |  CAST((n * dmax - dsum) * 1000000
          |    // nullif((n - 1) * (n - 2), 0) AS BIGINT) AS centralization_x1e6
          |FROM c""".stripMargin)),

    // Business-day shipping lag — calendar arithmetic the engine must
    // own (finance and logistics SLAs count working days): lag_bd =
    // g(ship) − g(order) where g(d) = business days before d since a
    // Monday anchor, in PURE integer arithmetic ((days div 7)·5 +
    // least(days mod 7, 5) — no engine weekday convention in the
    // gate). Per-priority histogram + exact mean ×1e3 from one
    // fact-fact keyed join.
    "date_business_days" -> Q(
      (s, d) => {
        val j = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("od")), "l_orderkey")
          .withColumn("d1",
            expr("CAST(datediff(od, to_date('1970-01-05')) AS BIGINT)"))
          .withColumn("d2",
            expr("CAST(datediff(to_date(l_shipdate), to_date('1970-01-05')) AS BIGINT)"))
          .withColumn("bd", expr(
            "(d2 div 7) * 5 + least(d2 % 7, 5) - ((d1 div 7) * 5 + least(d1 % 7, 5))"))
        j.groupBy("prio")
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum("bd").cast("long").as("bd_sum"),
            sum(when(col("bd") <= 5, 1L).otherwise(0L)).cast("long")
              .as("n_le_5"),
            sum(when(col("bd") > 5 && col("bd") <= 20, 1L).otherwise(0L))
              .cast("long").as("n_6_20"),
            sum(when(col("bd") > 20, 1L).otherwise(0L)).cast("long")
              .as("n_gt_20"))
          .withColumn("mean_bd_x1e3", expr("bd_sum * 1000L div n_lines"))
          .orderBy("prio")
      },
      Some(
        """WITH j AS (SELECT o_orderpriority AS prio,
          |    CAST(datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
          |      AS BIGINT) AS d1,
          |    CAST(datediff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE))
          |      AS BIGINT) AS d2
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
          |b AS (SELECT prio,
          |    (d2 // 7) * 5 + least(d2 % 7, 5)
          |      - ((d1 // 7) * 5 + least(d1 % 7, 5)) AS bd
          |  FROM j)
          |SELECT prio, count(*) AS n_lines,
          |  CAST(sum(bd) AS BIGINT) AS bd_sum,
          |  CAST(sum(CASE WHEN bd <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_le_5,
          |  CAST(sum(CASE WHEN bd > 5 AND bd <= 20 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_6_20,
          |  CAST(sum(CASE WHEN bd > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_20,
          |  CAST(sum(bd) * 1000 // count(*) AS BIGINT) AS mean_bd_x1e3
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Difference-in-differences — the workhorse causal panel estimator:
    // treatment = even customers, cutoff = the corpus midpoint date
    // (broadcast 1-row anchor), effect = (T_post − T_pre) −
    // (C_post − C_pre) over mean order value. Each cell mean is
    // floored ×1e3 (dollars are non-negative so floor = truncate both
    // engines, documented quantization); the DiD combines the four
    // FLOORED means so both engines agree bit-for-bit. One collapse to
    // a 4-cell frame.
    "stats_did_estimator" -> Q(
      (s, d) => {
        val mid = Tables.orders(s, d)
          .agg(expr("CAST(min(to_date(o_orderdate)) AS DATE)").as("mn"),
            expr("CAST(max(to_date(o_orderdate)) AS DATE)").as("mx"))
          .select(expr("date_add(mn, CAST(datediff(mx, mn) div 2 AS INT))")
            .as("cut"))
        val cell = Tables.orders(s, d)
          .crossJoin(broadcast(mid))
          .groupBy((col("o_custkey") % 2 === 0).as("treat"),
            (to_date(col("o_orderdate")) >= col("cut")).as("post"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("sx"))
          .withColumn("mean_x1e3", expr("sx * 1000L div n"))
        cell.agg(
            max(when(col("treat") && col("post"), col("mean_x1e3"))).as("tp"),
            max(when(col("treat") && !col("post"), col("mean_x1e3"))).as("tr"),
            max(when(!col("treat") && col("post"), col("mean_x1e3"))).as("cp"),
            max(when(!col("treat") && !col("post"), col("mean_x1e3"))).as("cr"),
            sum("n").as("n_orders"))
          .select(col("n_orders").cast("long").as("n_orders"),
            col("tp").cast("long").as("treat_post_x1e3"),
            col("tr").cast("long").as("treat_pre_x1e3"),
            col("cp").cast("long").as("ctrl_post_x1e3"),
            col("cr").cast("long").as("ctrl_pre_x1e3"),
            ((col("tp") - col("tr")) - (col("cp") - col("cr"))).cast("long")
              .as("did_x1e3"))
      },
      Some(
        """WITH mid AS (SELECT date_add(min(CAST(o_orderdate AS DATE)),
          |    CAST(datediff('day', min(CAST(o_orderdate AS DATE)),
          |      max(CAST(o_orderdate AS DATE))) // 2 AS INT)) AS cut
          |  FROM orders),
          |cell AS (SELECT o_custkey % 2 = 0 AS treat,
          |    CAST(o_orderdate AS DATE) >= cut AS post,
          |    count(*) AS n,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sx
          |  FROM orders CROSS JOIN mid GROUP BY 1, 2),
          |m AS (SELECT treat, post, n, sx * 1000 // n AS mean_x1e3 FROM cell),
          |c AS (SELECT
          |    max(CASE WHEN treat AND post THEN mean_x1e3 END) AS tp,
          |    max(CASE WHEN treat AND NOT post THEN mean_x1e3 END) AS tr,
          |    max(CASE WHEN NOT treat AND post THEN mean_x1e3 END) AS cp,
          |    max(CASE WHEN NOT treat AND NOT post THEN mean_x1e3 END) AS cr,
          |    CAST(sum(n) AS BIGINT) AS n_orders
          |  FROM m)
          |SELECT n_orders, CAST(tp AS BIGINT) AS treat_post_x1e3,
          |  CAST(tr AS BIGINT) AS treat_pre_x1e3,
          |  CAST(cp AS BIGINT) AS ctrl_post_x1e3,
          |  CAST(cr AS BIGINT) AS ctrl_pre_x1e3,
          |  CAST((tp - tr) - (cp - cr) AS BIGINT) AS did_x1e3
          |FROM c""".stripMargin)),

    // New-vs-returning revenue split per month — the growth-accounting
    // panel every subscription/commerce report leads with: an order is
    // "new" when it falls in its customer's first-order month. Reuses
    // the cohort algebra (customer-keyed first-order collapse + one
    // keyed join back); the month frame is calendar-bounded.
    "date_new_vs_returning" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), to_date(col("o_orderdate")).as("od"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("rev"))
        val first = o.groupBy("ck").agg(min("od").as("fd"))
        o.join(first, "ck")
          .withColumn("is_new",
            when(date_format(col("od"), "yyyy-MM")
              === date_format(col("fd"), "yyyy-MM"), 1L).otherwise(0L))
          .groupBy(date_format(col("od"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(when(col("is_new") === 1, col("rev")).otherwise(0L))
              .cast("long").as("new_rev"),
            sum(when(col("is_new") === 0, col("rev")).otherwise(0L))
              .cast("long").as("returning_rev"))
          .withColumn("new_share_x1e6", expr(
            "new_rev * 1000000L div nullif(new_rev + returning_rev, 0L)"))
          .orderBy("month")
      },
      Some(
        """WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
          |    CAST(floor(o_totalprice) AS BIGINT) AS rev FROM orders),
          |f AS (SELECT ck, min(od) AS fd FROM o GROUP BY 1),
          |j AS (SELECT strftime(od, '%Y-%m') AS month,
          |    CASE WHEN strftime(od, '%Y-%m') = strftime(fd, '%Y-%m')
          |      THEN 1 ELSE 0 END AS is_new, rev
          |  FROM o JOIN f USING (ck))
          |SELECT month, count(*) AS n_orders,
          |  CAST(sum(CASE WHEN is_new = 1 THEN rev ELSE 0 END) AS BIGINT)
          |    AS new_rev,
          |  CAST(sum(CASE WHEN is_new = 0 THEN rev ELSE 0 END) AS BIGINT)
          |    AS returning_rev,
          |  CAST(sum(CASE WHEN is_new = 1 THEN rev ELSE 0 END) * 1000000
          |    // nullif(sum(rev), 0) AS BIGINT) AS new_share_x1e6
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Power analysis — how many observations per arm to detect a 5%
    // lift in mean event value at α=0.05 / power 0.80 (two-sided
    // z-test): n = 2σ²(z_α/2+z_β)²/δ² with δ = μ/20 collapses to the
    // PURE INTEGER form n = 6272·(nΣx²−S²) div S² + 1 (the constant
    // 2·(1.96+0.84)²·400 rounds to the shared integer 6272 — both
    // engines use the literal, so no float enters the gate; +1 after
    // the floor stands in for the ceil). The experiment-design
    // complement of stats_ab_test. One collapse to a k-row frame.
    "stats_power_analysis" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"),
            sum(dec(col("x")) * dec(col("x"))).as("qx"))
          .select(col("event_type"), col("n").cast("long").as("n_obs"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("sx")) * dec(lit(100L)), dec(col("n")))
              .cast("long").as("mean_c_x100"),
            (graft.functions.GraftFunctions.longDiv(
              dec(lit(6272L)) * (dec(col("n")) * col("qx") - col("sx") * col("sx")),
              nullif(col("sx") * col("sx"), dec(lit(0L))))
              .cast("long") + 1).as("n_per_arm"))
          .orderBy("event_type")
      },
      Some(
        """WITH g AS (SELECT event_type, count(*) AS n,
          |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
          |      AS sx,
          |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
          |        * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS qx
          |  FROM events GROUP BY 1)
          |SELECT event_type, CAST(n AS BIGINT) AS n_obs,
          |  CAST(sx * 100 // n AS BIGINT) AS mean_c_x100,
          |  CAST(6272 * (n * qx - sx * sx) // nullif(sx * sx, 0) + 1
          |    AS BIGINT) AS n_per_arm
          |FROM g ORDER BY 1""".stripMargin)),

    // ===== Extension wave 23: replayable sketches, ranking eval, =====
    // ===== conformal calibration, LM retrieval                   =====

    // Deterministic mergeable HyperLogLog — unlike approx_count_distinct
    // (HLL++ registers not replayable in SQL; since round 11
    // agg_approx_stats uses THIS chain and hash-gates too), every bit
    // here is engine-exact, so the sketch itself
    // HASH-GATES: register index/rank from the shared md5-60 hash via
    // minimal-binary-string length (no float log2), raw estimate in
    // exact integer arithmetic off ONE shared alpha literal, and the
    // linear-counting small-range term as a floored ln (margin-audited
    // in FloatGateSpec). Exact countDistinct rides along as the
    // accuracy readout; merge across shards/batches is per-register max
    // (the streaming twin's identity). See ops/Hll.scala for the scale
    // notes.
    "agg_hll_distinct" -> Q(
      (s, d) => graft.ops.Hll.distinctSketch(
        Tables.events(s, d), "event_type", col("event_id")),
      Some(graft.ops.Hll.oracleSql)),

    // nDCG@10 of the BM25 ranking against term-overlap graded relevance
    // — the ranking-quality evaluation closing the retrieval loop
    // (rank → judge). The ideal is the TRUE corpus-wide top-k (a missed
    // relevant doc costs the ranker), taken via distributed sort-limit;
    // the position-discount vector is k precomputed ×1e9 literals
    // shared with the oracle, so the whole readout is exact BIGINT.
    "search_ndcg_eval" -> Q(
      (s, d) => graft.ops.TextOps.ndcgEval(
        Tables.documents(s, d), terms = Seq("spark", "join", "vector"), k = 10),
      Some(TextSql.searchNdcgEval(Seq("spark", "join", "vector"), k = 10))),

    // Recall@k / MRR of the BM25 list against binary term-overlap
    // relevance — the set-based IR evaluation next to search_ndcg_eval's
    // graded one; exact integer rationals, no floats beyond the ranking
    // itself.
    "search_recall_mrr" -> Q(
      (s, d) => graft.ops.TextOps.recallMrrEval(
        Tables.documents(s, d), terms = Seq("spark", "join", "vector"),
        k = 20, minRel = 2),
      Some(TextSql.searchRecallMrr(Seq("spark", "join", "vector"), k = 20, minRel = 2))),

    // Dirichlet-smoothed query likelihood (Zhai & Lafferty SIGIR'01) —
    // the language-model retrieval scorer next to BM25: every doc
    // scores on every query term (absent terms contribute the smoothed
    // background mass). Per-term floor(ln(int/int)·1e6) before the
    // integer sum — the PSI discipline, margin-audited in FloatGateSpec.
    "search_ql_dirichlet" -> Q(
      (s, d) => graft.ops.TextOps.qlDirichletTopK(
        Tables.documents(s, d), terms = Seq("spark", "join", "vector"),
        mu = 2000L, k = 20),
      Some(TextSql.searchQlDirichlet(Seq("spark", "join", "vector"),
        mu = 2000L, k = 20))),

    // Split-conformal calibration (Vovk et al.; the distribution-free
    // coverage machinery behind selective curation): a deterministic
    // 20% hash split calibrates the n_chars score, the threshold is the
    // ceil((n+1)(1−α))-th smallest calibration score — an EXPLICIT rank
    // selected via Stats.bucketedRank (two-phase, no corpus-sized
    // SinglePartition window), all arithmetic exact integers — and the
    // held-out coverage ×1e6 rides along per alpha.
    "stats_conformal_threshold" -> Q(
      (s, d) => {
        import s.implicits._
        val md5 = graft.functions.GraftFunctions.md5Hash60 _
        val docs = Tables.documents(s, d)
        val cal = docs.filter(pmod(md5(col("doc_id")), lit(5L)) === 0)
          .select(col("doc_id"), col("n_chars").cast("long").as("score"))
        val test = docs.filter(pmod(md5(col("doc_id")), lit(5L)) =!= 0)
          .select(col("n_chars").cast("long").as("score"))
        val ranked = graft.ops.Stats.bucketedRank(cal, "score", "doc_id", 256L)
        val nCal = cal.agg(count(lit(1)).as("n_cal"))
        val thr = Seq(10L, 5L, 1L).toDF("alpha_pct")
          .crossJoin(broadcast(nCal))
          .withColumn("cal_rank",
            expr("((n_cal + 1) * (100 - alpha_pct) + 99) div 100"))
          // keyed join, 3-row probe side — the CALIBRATION frame scales
          // with the corpus, so it must never be the broadcast side.
          // rank > n_cal (alpha too small for the calibration size)
          // means the conformal set is the whole space: threshold = +inf,
          // encoded as Long.MaxValue so both engines stay integer
          // (a NULL would also go float64 through the pandas compare)
          .join(ranked.select(col("rank").as("cal_rank"),
            col("score").as("threshold")), Seq("cal_rank"), "left")
          .withColumn("threshold",
            coalesce(col("threshold"), lit(Long.MaxValue)))
        val nTest = test.agg(count(lit(1)).as("n_test"))
        val cov = test
          .crossJoin(broadcast(thr.select("alpha_pct", "threshold")))
          .groupBy("alpha_pct")
          .agg(sum(when(col("score") <= col("threshold"), 1L).otherwise(0L))
            .as("n_cov"))
        thr.join(cov, "alpha_pct").crossJoin(broadcast(nTest))
          .select(col("alpha_pct").cast("long").as("alpha_pct"),
            col("n_cal").cast("long").as("n_cal"),
            col("cal_rank").cast("long").as("cal_rank"),
            col("threshold").cast("long").as("threshold"),
            col("n_test").cast("long").as("n_test"),
            expr("n_cov * 1000000L div n_test").cast("long").as("coverage_x1e6"))
          .orderBy("alpha_pct")
      },
      Some(
        s"""WITH cal AS (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS score FROM documents
           |  WHERE ${GraphSql.md5Hash60("CAST(doc_id AS VARCHAR)")} % 5 = 0),
           |tst AS (
           |  SELECT CAST(n_chars AS BIGINT) AS score FROM documents
           |  WHERE ${GraphSql.md5Hash60("CAST(doc_id AS VARCHAR)")} % 5 <> 0),
           |rk AS (SELECT score,
           |    row_number() OVER (ORDER BY score, doc_id) AS cal_rank FROM cal),
           |nc AS (SELECT count(*) AS n_cal FROM cal),
           |nt AS (SELECT count(*) AS n_test FROM tst),
           |a AS (SELECT unnest([10, 5, 1]) AS alpha_pct),
           |th AS (
           |  SELECT alpha_pct, n_cal,
           |    ((n_cal + 1) * (100 - alpha_pct) + 99) // 100 AS cal_rank
           |  FROM a CROSS JOIN nc),
           |j AS (SELECT th.alpha_pct, th.n_cal, th.cal_rank,
           |        coalesce(rk.score, 9223372036854775807) AS threshold
           |      FROM th LEFT JOIN rk ON rk.cal_rank = th.cal_rank),
           |cov AS (
           |  SELECT j.alpha_pct,
           |    sum(CASE WHEN t.score <= j.threshold THEN 1 ELSE 0 END) AS n_cov
           |  FROM j CROSS JOIN tst t GROUP BY 1)
           |SELECT CAST(j.alpha_pct AS BIGINT) AS alpha_pct,
           |  CAST(n_cal AS BIGINT) AS n_cal, CAST(cal_rank AS BIGINT) AS cal_rank,
           |  threshold, CAST(n_test AS BIGINT) AS n_test,
           |  CAST(n_cov * 1000000 // n_test AS BIGINT) AS coverage_x1e6
           |FROM j JOIN cov ON cov.alpha_pct = j.alpha_pct CROSS JOIN nt
           |ORDER BY alpha_pct""".stripMargin)),

    // Sparse TF-IDF cosine similarity pairs — the LEXICAL sibling of
    // the embedding-cosine detectors: inverted-index candidates (only
    // docs sharing a kept term pair; stop-term df cap at the corpus
    // schedule, replayed by the oracle), exact-integer cosine² verify
    // (floored ×1e3 weights — margins in FloatGateSpec — then
    // DECIMAL(38,0) dot/norm sums; cos²·1e6 is a rational, no float
    // sqrt). Role: discriminative-term similar-pair discovery, NOT
    // near-dup recall — on the vocab-saturated corpus the df cap drops
    // the common tokens, so tail-perturbed plants mostly fall below
    // the threshold (measured 1/50; the shingle detectors own that
    // signal), while exact-vector pairs score exactly 1e6 (Wave23Spec).
    // BIGINT/DECIMAL headroom: num² ≤ ‖a‖²·‖b‖² < 10³⁸ up to ~10¹⁶
    // weight-mass per doc (tf·ln ≈ 3·10⁸ per term) — the
    // temperature_mix DECIMAL wall, far past any real document.
    "sim_tfidf_sparse" -> Q(
      (s, d) => {
        val p = plantedDocs(s, d, exact = false)
        graft.ops.TextOps.tfidfCosinePairs(p, threshold2X1e6 = 640000L,
          maxTermDf = graft.ops.Dedup.containmentSchedule(p.count()))
      },
      Some(TextSql.simTfidfSparse())),

    // Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
    // ADDITIVE mergeable sketch completing the shelf next to the
    // replayable HLL (max-merge) and Misra-Gries (counter-merge):
    // per-cell sums, never-undercount point estimates, and — like the
    // HLL — every bit engine-replayable (md5("j:key") row hashes), so
    // the 4×1024 counter table itself hash-gates against DuckDB. One
    // map-side-combined aggregation into 4096 cells; probes are k·D
    // rows. See ops/CountMin.scala.
    "agg_countmin_users" -> Q(
      (s, d) => graft.ops.CountMin.pointEstimates(
        Tables.events(s, d), col("user_id"), topK = 10),
      Some(graft.ops.CountMin.oracleSql(topK = 10))),

    // t-closeness (Li et al., ICDE'07) — the distributional member of
    // the privacy battery next to privacy_k_anonymity's k/l counts: per
    // quasi-identifier group (nation, segment), the total-variation
    // distance between the group's sensitive-value (acctbal band)
    // distribution and the GLOBAL band distribution, as an exact
    // rational ×1e6 (TVD = Σ|c_gv·N − c_v·N_g| over 2·N_g·N — the
    // stats_psi_sources tvd discipline, DECIMAL(38,0) products). A
    // group whose band mix mirrors the corpus leaks nothing even at
    // small k; one at t > 0.3 reveals its members' balance band. One
    // corpus groupBy to the (group × 3-band) frame; the global band
    // frame broadcasts.
    "privacy_t_closeness" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val band = when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 4500, "mid").otherwise("high")
        val cust = Tables.customer(s, d)
          .select(col("c_nationkey").cast("long").as("nation"),
            col("c_mktsegment").as("segment"), band.as("band"))
        val cell = cust.groupBy("nation", "segment", "band")
          .agg(count(lit(1)).as("cgv"))
        val grp = cust.groupBy("nation", "segment").agg(count(lit(1)).as("ng"))
        val glob = cust.groupBy("band").agg(count(lit(1)).as("cv"))
        val n = cust.agg(count(lit(1)).as("nn"))
        grp.crossJoin(broadcast(glob)).crossJoin(broadcast(n))
          .join(cell, Seq("nation", "segment", "band"), "left")
          .withColumn("cgv", coalesce(col("cgv"), lit(0L)))
          .withColumn("num", abs(dec(col("cgv")) * dec(col("nn")) -
            dec(col("cv")) * dec(col("ng"))))
          .groupBy("nation", "segment")
          .agg(max("ng").cast("long").as("n"),
            expr("CAST(sum(num) * 1000000 div (2 * CAST(max(ng) AS DECIMAL(38,0)) * max(nn)) AS BIGINT)")
              .as("tvd_x1e6"))
          .withColumn("t_risk", when(col("tvd_x1e6") > 300000L, 1L).otherwise(0L))
          .orderBy("nation", "segment")
      },
      Some(
        """WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
          |    c_mktsegment AS segment,
          |    CASE WHEN c_acctbal < 0 THEN 'neg'
          |         WHEN c_acctbal < 4500 THEN 'mid' ELSE 'high' END AS band
          |  FROM customer),
          |cell AS (SELECT nation, segment, band, count(*) AS cgv
          |         FROM cust GROUP BY 1, 2, 3),
          |grp AS (SELECT nation, segment, count(*) AS ng FROM cust GROUP BY 1, 2),
          |gband AS (SELECT band, count(*) AS cv FROM cust GROUP BY 1),
          |n AS (SELECT count(*) AS nn FROM cust),
          |t AS (SELECT g.nation, g.segment, g.ng, n.nn,
          |    abs(CAST(coalesce(c.cgv, 0) AS HUGEINT) * n.nn
          |        - CAST(gl.cv AS HUGEINT) * g.ng) AS num
          |  FROM grp g CROSS JOIN gband gl CROSS JOIN n
          |  LEFT JOIN cell c ON c.nation = g.nation AND c.segment = g.segment
          |    AND c.band = gl.band)
          |SELECT nation, segment, CAST(max(ng) AS BIGINT) AS n,
          |  CAST(sum(num) * 1000000 // (2 * CAST(max(ng) AS HUGEINT) * max(nn))
          |    AS BIGINT) AS tvd_x1e6,
          |  CASE WHEN sum(num) * 1000000
          |         // (2 * CAST(max(ng) AS HUGEINT) * max(nn)) > 300000
          |    THEN 1 ELSE 0 END AS t_risk
          |FROM t GROUP BY 1, 2 ORDER BY nation, segment""".stripMargin)),

    // Leave-one-source-out data valuation: the cheapest member of the
    // influence family — for each source, how the corpus-level length
    // and quality-proxy means move when that source is removed, purely
    // algebraic from per-source totals (LOO mean = (T − T_s)/(N − N_s)
    // — NO second corpus pass, no per-source re-aggregation; the whole
    // readout derives from ONE groupBy). Exact integers: means ×100
    // by integral division, deltas in the same fixed-point. The screen
    // a curation pass runs before dropping or upweighting a source.
    "stats_loo_source_impact" -> Q(
      (s, d) => {
        val per = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("ns"), sum("n_chars").as("ts"))
        val tot = per.agg(sum("ns").as("n"), sum("ts").as("t"))
        per.crossJoin(broadcast(tot))
          .withColumn("mean_all_x100", expr("t * 100 div n"))
          .withColumn("mean_loo_x100",
            expr("(t - ts) * 100 div (n - ns)"))
          .select(col("source"), col("ns").cast("long").as("n_docs"),
            col("mean_all_x100").cast("long").as("mean_all_x100"),
            col("mean_loo_x100").cast("long").as("mean_loo_x100"),
            (col("mean_loo_x100") - col("mean_all_x100")).cast("long")
              .as("loo_delta_x100"))
          .orderBy("source")
      },
      Some(
        """WITH per AS (SELECT source, count(*) AS ns,
          |    CAST(sum(n_chars) AS BIGINT) AS ts
          |  FROM documents GROUP BY 1),
          |tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n,
          |    CAST(sum(ts) AS BIGINT) AS t FROM per)
          |SELECT source, CAST(ns AS BIGINT) AS n_docs,
          |  CAST(t * 100 // n AS BIGINT) AS mean_all_x100,
          |  CAST((t - ts) * 100 // (n - ns) AS BIGINT) AS mean_loo_x100,
          |  CAST((t - ts) * 100 // (n - ns) - t * 100 // n AS BIGINT)
          |    AS loo_delta_x100
          |FROM per CROSS JOIN tot ORDER BY source""".stripMargin))
  )

  /** Planted near-duplicates: docs with doc_id < 50 re-appended under
    * doc_id+100000 (exact copies, or tail-perturbed for the near-dup
    * detectors). The synthetic corpus has no natural dups, so detectors
    * would otherwise be vacuous; the same construction lives in the SQL
    * oracle (TextSql.plantCte).
    */
  private def plantedDocs(s: SparkSession, d: String, exact: Boolean): DataFrame = {
    val base = Tables.documents(s, d)
    val p0 = base.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 100000)
    val plants = if (exact) p0
      else p0.withColumn("text", concat(col("text"), lit(" planted dup tail")))
    base.unionByName(plants)
  }

  /** Contained-quote plants for the containment detector: docs with
    * doc_id < 20 re-appended under doc_id+200000 with text = their first
    * 40 whitespace tokens — fully embedded in the parent (containment
    * 1.0) yet near-invisible to Jaccard (≈ 38/|parent shingles|). Same
    * construction in the SQL oracle (TextSql.plantQuoteCte).
    */
  private def plantedQuoteDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    val quotes = base.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 40)))
    base.unionByName(quotes)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }

}
