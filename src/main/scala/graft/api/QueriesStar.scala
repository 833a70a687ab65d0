package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import QueriesShared._

/** Star-schema analytics over the TPC-H-ish tables.
  *
  * One contiguous, ORDER-PRESERVING slice of the declared query
  * surface; [[Queries.registry]] concatenates the slices in the
  * original declaration order. Entries are (name -> Q) pairs exactly
  * as they appeared in the pre-split Queries.scala.
  */
private[api] object QueriesStar {
  val entries: Seq[(String, Q)] = Seq(
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
    // MAD are EXACT integer rank selections in cents; see
    // ops/Stats.madReport for the two byte-equal plans (raw row_number
    // windows vs the per-type value histogram whose cumulative count
    // reaches the rank) and the measured crossover behind the
    // corpus-size schedule (raw windows win under ~1M events on
    // per-stage constants; the histogram form is 5.8× at the 100×
    // corpus because nothing row-sized is sorted or re-scanned). The
    // row count comes from the parquet FOOTERS (driver-side, no Spark
    // job — a count() action measured ~0.3 s of pure schedule overhead
    // at sf0.1, most of what the schedule was saving).
    "events_anomaly_mad" -> Q(
      (s, d) => {
        val v = Tables.events(s, d)
          .select(col("event_type"), floor(col("value") * 100).cast("long").as("vc"))
        val n = Tables.layoutOf(s, s"$d/events.parquet").rows
        graft.ops.Stats.madReport(v,
          useHistogram = n >= graft.ops.Stats.MadHistogramMinRows)
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
      Some(GraphSql.shardDistribution(buckets = 8)))

  )
}
