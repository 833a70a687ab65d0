package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-sixth wave on crafted
  * fixtures: Pareto coverage crossing points (exact-80% boundary
  * included), 4-4-5 fiscal period boundaries at weeks 4/8/13/52, and
  * the strict 1% error-budget threshold with cumulative burn.
  */
class Wave14Spec extends SparkSpecBase {
  import spark.implicits._

  test("pareto coverage: exact-80% single customer, 90% needs two") {
    // Revenues 80, 10, 6, 4 (T=100): top-1 = exactly 80% (needed set
    // for p=80 stays 1 — the strict exclusive-above test), p=90 ⇒ 2.
    val dir = tmpDir("w14-pareto")
    Seq((10L, 1L, 80.00), (11L, 2L, 10.00), (12L, 3L, 6.00), (13L, 4L, 4.00))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderdate", to_date(lit("2024-01-01")))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("orders_pareto_coverage").fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("p"), r.getAs[Long]("n_custs"),
        r.getAs[Long]("n_top"), r.getAs[Long]("cust_share_x1e6"))).toSeq
    assert(out == Seq(
      (50L, 4L, 1L, 250000L),
      (80L, 4L, 1L, 250000L),
      (90L, 4L, 2L, 500000L)))
  }

  test("fiscal 445: period boundaries at weeks 4, 8, 13, 52") {
    val dir = tmpDir("w14-fiscal")
    Seq(
      (10L, 1L, 1.00, "2024-01-01"), // wk 0  -> FY0 Q1 P1
      (11L, 1L, 1.00, "2024-01-29"), // wk 4  -> FY0 Q1 P2
      (12L, 1L, 1.00, "2024-02-26"), // wk 8  -> FY0 Q1 P3
      (13L, 1L, 1.00, "2024-04-01"), // wk 13 -> FY0 Q2 P1
      (14L, 1L, 1.00, "2024-12-30")) // wk 52 -> FY1 Q1 P1
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("date_fiscal_445").fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("fy"), r.getAs[Long]("fq"),
        r.getAs[Long]("period"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("rev"))).toSeq
    assert(out == Seq(
      (0L, 1L, 1L, 1L, 1L),
      (0L, 1L, 2L, 1L, 1L),
      (0L, 1L, 3L, 1L, 1L),
      (0L, 2L, 1L, 1L, 1L),
      (1L, 1L, 1L, 1L, 1L)))
  }

  test("error budget: 1% is strict, burn accumulates") {
    // day 1: 1/100 errors — exactly 1%, NOT over (strict >).
    // day 2: 2/100 — over; burn reads 0 then 1.
    val dir = tmpDir("w14-budget")
    val d1 = (1 to 100).map(i => (i.toLong, "2024-03-01 10:00:00", i.toLong,
      if (i == 1) "error" else "view"))
    val d2 = (1 to 100).map(i => (100L + i, "2024-03-02 10:00:00", i.toLong,
      if (i <= 2) "error" else "view"))
    (d1 ++ d2).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.registry("events_error_budget").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("n"),
        r.getAs[Long]("n_err"), r.getAs[Long]("err_rate_x1e6"),
        r.getAs[Long]("over_budget"), r.getAs[Long]("burn_days"))).toSeq
    assert(out == Seq(
      ("2024-03-01", 100L, 1L, 10000L, 0L, 0L),
      ("2024-03-02", 100L, 2L, 20000L, 1L, 1L)))
  }
}
