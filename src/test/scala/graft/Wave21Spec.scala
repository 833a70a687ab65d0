package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 thirty-third wave on crafted
  * fixtures: a planted DiD effect with parallel-trend controls, the
  * new/returning month split, and the power-analysis closed form.
  */
class Wave21Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeOrders(dir: String,
      rows: Seq[(Long, Long, Double, String)]): Unit =
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

  test("did: planted +5 treatment lift on parallel trends reads exactly 5000") {
    // Span 2024-01-01..2024-01-11, cutoff = day 5 offset ⇒ 01-06.
    // Control (odd cust 1): pre 10, post 12 (+2 trend).
    // Treatment (even cust 2): pre 20, post 27 (+2 trend +5 effect).
    val dir = tmpDir("w21-did")
    writeOrders(dir, Seq(
      (10L, 1L, 10.00, "2024-01-01"),
      (11L, 1L, 12.00, "2024-01-11"),
      (12L, 2L, 20.00, "2024-01-02"),
      (13L, 2L, 27.00, "2024-01-10")))
    val r = Queries.registry("stats_did_estimator").fn(spark, dir).collect().head
    assert(r.getAs[Long]("treat_pre_x1e3") == 20000L)
    assert(r.getAs[Long]("treat_post_x1e3") == 27000L)
    assert(r.getAs[Long]("ctrl_pre_x1e3") == 10000L)
    assert(r.getAs[Long]("ctrl_post_x1e3") == 12000L)
    assert(r.getAs[Long]("did_x1e3") == 5000L)
  }

  test("new vs returning: first-order month is new, later months returning") {
    // cust 1: Jan order (new, 10), Feb order (returning, 40).
    // cust 2: Feb order (new, 50). Feb: new 50 / total 90.
    val dir = tmpDir("w21-nvr")
    writeOrders(dir, Seq(
      (10L, 1L, 10.00, "2024-01-05"),
      (11L, 1L, 40.00, "2024-02-03"),
      (12L, 2L, 50.00, "2024-02-10")))
    val out = Queries.registry("date_new_vs_returning").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("month"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("new_rev"), r.getAs[Long]("returning_rev"),
        r.getAs[Long]("new_share_x1e6"))).toSeq
    assert(out == Seq(
      ("2024-01", 1L, 10L, 0L, 1000000L),
      ("2024-02", 2L, 50L, 40L, 555555L)))
  }

  test("power analysis: hand-computed closed form") {
    // type 'view': values 1.00, 3.00 (cents 100, 300): n=2, S=400,
    // Q=100000 ⇒ nQ−S² = 40000, S² = 160000 ⇒
    // 6272·40000 // 160000 + 1 = 1568 + 1 = 1569 per arm.
    val dir = tmpDir("w21-power")
    Seq((1L, "2024-03-01 00:00:01", 1L, "view", 1.00, "{}"),
        (2L, "2024-03-01 00:00:02", 2L, "view", 3.00, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.registry("stats_power_analysis").fn(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_obs") == 2L)
    assert(r.getAs[Long]("mean_c_x100") == 20000L)
    assert(r.getAs[Long]("n_per_arm") == 1569L)
  }
}
