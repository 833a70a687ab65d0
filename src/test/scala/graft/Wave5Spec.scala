package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 seventeenth wave on CRAFTED
  * fixtures with hand-computed expectations (the oracle gate proves
  * engine agreement; these prove the statistic itself). Same
  * discipline as Wave3/Wave4Spec: registry queries run unchanged on a
  * minimal parquet corpus written under a temp dir.
  */
class Wave5Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeOrders(dir: String,
      rows: Seq[(Long, Long, String, Double, String, String)]): Unit =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate_s", "o_orderpriority")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

  test("spearman rho: crafted permutation gives rho = -0.5 exactly") {
    // Nation 7, three customers. Balance order: c1 < c2 < c3 (ranks
    // 1,2,3). Spend order: c2 (100) < c3 (200) < c1 (300) (ranks
    // 3,1,2 per customer). d = (1-3, 2-1, 3-2) => sum d^2 = 6;
    // rho = 1 - 6*6/(3*8) = -0.5 => rho_x1e6 = -500000 (sign-factored
    // truncation exact here).
    val dir = tmpDir("w5-spearman")
    Seq((1L, 7L, 1.00), (2L, 7L, 2.00), (3L, 7L, 3.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("SEG"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    writeOrders(dir, Seq(
      (10L, 1L, "O", 3.00, "2024-03-01", "1-URGENT"),
      (11L, 2L, "O", 1.00, "2024-03-01", "1-URGENT"),
      (12L, 3L, "O", 2.00, "2024-03-01", "1-URGENT")))
    val out = Queries.registry("stats_spearman_rho").fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("nationkey") == 7L)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("sum_d2") == 6L)
    assert(r.getAs[Long]("rho_x1e6") == -500000L)
  }

  test("spearman rho: customers without orders rank at spend 0") {
    // c1 bal 1.00 spends 0 (no orders), c2 bal 2.00 spends 1.00:
    // identical rank vectors => rho = 1.
    val dir = tmpDir("w5-spearman0")
    Seq((1L, 3L, 1.00), (2L, 3L, 2.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("SEG"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    writeOrders(dir, Seq((10L, 2L, "O", 1.00, "2024-03-01", "1-URGENT")))
    val out = Queries.registry("stats_spearman_rho").fn(spark, dir).collect()
    assert(out.length == 1 && out.head.getAs[Long]("rho_x1e6") == 1000000L)
  }

  test("mann-kendall: daily series [1,3,2,4] gives S=4, tau=2/3") {
    // Pairs (i<j) signs: +1 +1 +1 -1 +1 +1 => S = 4; n = 4 days;
    // tau = 4 / C(4,2) = 2/3 => 2*4*1e6 div 12 = 666666.
    val dir = tmpDir("w5-mk")
    writeOrders(dir, Seq(
      (1L, 1L, "O", 0.01, "2024-03-01", "1-URGENT"),
      (2L, 1L, "O", 0.03, "2024-03-02", "1-URGENT"),
      (3L, 1L, "O", 0.02, "2024-03-03", "1-URGENT"),
      (4L, 1L, "O", 0.04, "2024-03-04", "1-URGENT")))
    val out = Queries.registry("stats_mann_kendall").fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("s_stat") == 4L)
    assert(r.getAs[Long]("tau_x1e6") == 666666L)
  }

  test("mann-kendall: strictly decreasing series gives tau = -1") {
    val dir = tmpDir("w5-mkdec")
    writeOrders(dir, Seq(
      (1L, 1L, "O", 0.03, "2024-03-01", "2-HIGH"),
      (2L, 1L, "O", 0.02, "2024-03-02", "2-HIGH"),
      (3L, 1L, "O", 0.01, "2024-03-03", "2-HIGH")))
    val out = Queries.registry("stats_mann_kendall").fn(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("s_stat") == -3L)
    assert(out.head.getAs[Long]("tau_x1e6") == -1000000L)
  }

  test("open backlog: crafted intervals track +1/-1 depth, zero-length dropped") {
    // o1 [Mar1, Mar3), o2 [Mar2, Apr2), o3 zero-length (ship == order
    // date, excluded by close > open). Change days: Mar1 +1 (depth 1),
    // Mar2 +1 (2), Mar3 -1 (1), Apr2 -1 (0). Months: 2024-03 peak 2
    // over 3 change days; 2024-04 peak 0 over 1 change day.
    val dir = tmpDir("w5-backlog")
    writeOrders(dir, Seq(
      (1L, 1L, "O", 1.00, "2024-03-01", "1-URGENT"),
      (2L, 1L, "O", 1.00, "2024-03-02", "1-URGENT"),
      (3L, 1L, "O", 1.00, "2024-03-05", "1-URGENT")))
    Seq((1L, "2024-03-02"), (1L, "2024-03-03"),
        (2L, "2024-04-02"), (3L, "2024-03-05"))
      .toDF("l_orderkey", "ship_s")
      .withColumn("l_shipdate", to_date(col("ship_s")))
      .drop("ship_s")
      .withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(1L))
      .withColumn("l_linenumber", lit(1L)).withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(1.0)).withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0)).withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Queries.registry("orders_open_backlog").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("month"), r.getAs[Long]("peak_open"),
        r.getAs[Long]("n_change_days")))
    assert(out.toSeq == Seq(("2024-03", 2L, 3L), ("2024-04", 0L, 1L)))
  }
}
