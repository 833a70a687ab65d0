package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twentieth wave on crafted fixtures
  * with hand-computed expectations: one-way ANOVA F decomposition,
  * Newman modularity terms (including a negative cross-heavy term),
  * and OLS R²/slope including the zero-variance NULL path.
  */
class Wave8Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeOrders(dir: String,
      rows: Seq[(Long, Long, Double, String, String)]): Unit =
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s",
        "o_orderpriority")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

  test("anova f: two groups of two, SSB=16 SSW=4 F=8 exactly") {
    // 1-URGENT: 1, 3 dollars (mean 2); 2-HIGH: 5, 7 (mean 6); grand 4.
    // SSB = 2·(2−4)² + 2·(6−4)² = 16; SSW = 4·1 = 4;
    // F = (16/1)/(4/2) = 8 ⇒ f_x1e6 = 8_000_000.
    val dir = tmpDir("w8-anova")
    writeOrders(dir, Seq(
      (10L, 1L, 1.00, "2024-03-01", "1-URGENT"),
      (11L, 1L, 3.00, "2024-03-02", "1-URGENT"),
      (12L, 1L, 5.00, "2024-03-03", "2-HIGH"),
      (13L, 1L, 7.00, "2024-03-04", "2-HIGH")))
    val r = Queries.registry("stats_anova_f").fn(spark, dir).collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("ssb") == 16L && r.getAs[Long]("ssw") == 4L)
    assert(r.getAs[Long]("f_x1e6") == 8000000L)
  }

  test("modularity: per-brand terms sum to Q, cross-heavy brand goes negative") {
    // Co-order edges (minSupport 2): (p1,p2), (p3,p4), (p2,p3), (p2,p5)
    // ⇒ m = 4, degrees 1:1 2:3 3:2 4:1 5:1. Brands A={1,2}, B={3,4},
    // C={5}: d_A=4 e_A=1 ⇒ term (16·1−16)/64 = 0; d_B=3 e_B=1 ⇒
    // (16−9)·1e9//64 = 109_375_000; d_C=1 e_C=0 ⇒ −(1·1e9//64) =
    // −15_625_000 (the sign-factored path).
    val dir = tmpDir("w8-mod")
    val orders = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L),
      (5L, 2L), (5L, 3L), (6L, 2L), (6L, 3L),
      (7L, 2L), (7L, 5L), (8L, 2L), (8L, 5L))
    orders.toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", to_date(lit("2024-03-01")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "Brand#A"), (2L, "Brand#A"), (3L, "Brand#B"), (4L, "Brand#B"),
        (5L, "Brand#C"))
      .toDF("p_partkey", "p_brand")
      .withColumn("p_name", lit("p")).withColumn("p_type", lit("t"))
      .withColumn("p_size", lit(1L)).withColumn("p_container", lit("BOX"))
      .withColumn("p_retailprice", lit(1.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = Queries.registry("graph_modularity_brands").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("brand"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("deg_sum"), r.getAs[Long]("in_edges"),
        r.getAs[Long]("q_term_x1e9"))).toSeq
    assert(out == Seq(
      ("Brand#A", 2L, 4L, 1L, 0L),
      ("Brand#B", 2L, 3L, 1L, 109375000L),
      ("Brand#C", 1L, 1L, 0L, -15625000L)))
  }

  test("ols r2: perfect line reads 1e6, constant series reads NULL, negative slope sign-factored") {
    // ALPHA weeks 0,1,2 revenue 1,2,3 ⇒ R²=1e6, slope=+1e6/week.
    // BETA constant 5,5 ⇒ dyy=0 ⇒ R² NULL, slope 0.
    // GAMMA weeks 0,1 revenue 3,1 ⇒ R²=1e6, slope=−2e6.
    val dir = tmpDir("w8-ols")
    Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("c_custkey", "c_nationkey")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("SEG")).withColumn("c_acctbal", lit(1.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, "ALPHA"), (20L, "BETA"), (30L, "GAMMA"))
      .toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    writeOrders(dir, Seq(
      (10L, 1L, 1.00, "2024-01-01", "1-URGENT"),
      (11L, 1L, 2.00, "2024-01-08", "1-URGENT"),
      (12L, 1L, 3.00, "2024-01-15", "1-URGENT"),
      (13L, 2L, 5.00, "2024-01-01", "1-URGENT"),
      (14L, 2L, 5.00, "2024-01-08", "1-URGENT"),
      (15L, 3L, 3.00, "2024-01-01", "1-URGENT"),
      (16L, 3L, 1.00, "2024-01-08", "1-URGENT")))
    val out = Queries.registry("stats_ols_r2").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("n_weeks"),
        Option(r.getAs[java.lang.Long]("r2_x1e6")).map(_.longValue),
        r.getAs[Long]("slope_x1e6"))).toSeq
    assert(out == Seq(
      ("ALPHA", 3L, Some(1000000L), 1000000L),
      ("BETA", 2L, None, 0L),
      ("GAMMA", 2L, Some(1000000L), -2000000L)))
  }
}
