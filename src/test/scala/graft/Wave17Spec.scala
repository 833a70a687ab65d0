package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-ninth wave on crafted
  * fixtures: both bot rules including the planted burst bot, scorecard
  * on-time arithmetic with the 30-day boundary, and Chapman's
  * capture-recapture estimator on a hand-computed overlap.
  */
class Wave17Spec extends SparkSpecBase {
  import spark.implicits._

  test("bot users: burst and dominance rules fire independently; plant always bursts") {
    // user 1: 25 'view' events in one hour ⇒ burst AND dominance
    // (n=25 ≥ 10, 100% one type). user 2: 12 events across hours,
    // 11 'click' + 1 'view' ⇒ dominance only (11·10 ≥ 12·9). user 3:
    // 2 events ⇒ clean. Plus the planted user 9000001 (burst+dom).
    val dir = tmpDir("w17-bot")
    val u1 = (1 to 25).map(i => (i.toLong, "2024-03-01 10:00:%02d".format(i % 60), 1L, "view"))
    val u2 = (1 to 12).map(i => (100L + i, "2024-03-0%d 0%d:00:00".format(i % 5 + 1, i % 8), 2L,
      if (i <= 11) "click" else "view"))
    val u3 = Seq((200L, "2024-03-01 10:00:00", 3L, "view"),
      (201L, "2024-03-02 11:00:00", 3L, "click"))
    (u1 ++ u2 ++ u3).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.registry("events_bot_users").fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == 4L) // 3 organic + plant
    assert(r.getAs[Long]("n_bots") == 3L)
    assert(r.getAs[Long]("burst_only") == 0L)
    assert(r.getAs[Long]("dom_only") == 1L)   // user 2
    assert(r.getAs[Long]("both_rules") == 2L) // user 1 + plant
  }

  test("scorecard: 30-day boundary inclusive, rank by revenue desc") {
    val dir = tmpDir("w17-score")
    // supplier 1: two lines, one ships day+30 (on time), one day+31
    // (late) ⇒ ontime 500000; revenue 10+20=30. supplier 2: one line,
    // rev 100, on time ⇒ rank 1.
    Seq(
      (1L, 1L, 10.00, "2024-01-31"),
      (1L, 1L, 20.00, "2024-02-01"),
      (2L, 2L, 100.00, "2024-01-15"))
      .zipWithIndex.map { case ((ok, sk, px, ship), i) =>
        (ok, 50L + i, sk, i.toLong + 1, px, ship) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_extendedprice", "l_shipdate_s")
      .withColumn("l_shipdate", to_date(col("l_shipdate_s")))
      .drop("l_shipdate_s")
      .withColumn("l_quantity", lit(1.0)).withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0)).withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 9L, 1.00, "2024-01-01"), (2L, 9L, 1.00, "2024-01-01"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 7L), (2L, 7L)).toDF("s_suppkey", "s_nationkey")
      .withColumn("s_name", concat(lit("s"), col("s_suppkey")))
      .withColumn("s_acctbal", lit(1.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((7L, "NATION7")).toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val out = Queries.registry("supplier_scorecard").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("rk"),
        r.getAs[Long]("suppkey"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("rev"), r.getAs[Long]("ontime_x1e6"))).toSeq
    assert(out == Seq(
      ("NATION7", 1L, 2L, 1L, 100L, 1000000L),
      ("NATION7", 2L, 1L, 2L, 30L, 500000L)))
  }

  test("capture recapture: chapman estimator on a hand-computed overlap") {
    // even docs vocab {a,b,c} (n1=3), odd docs vocab {b,c,d,e} (n2=4),
    // overlap m=2 ⇒ Chapman = 4·5/3 − 1 = 5 (floor 6.67−1);
    // actual = 5. Perfect recovery here by construction.
    val dir = tmpDir("w17-cap")
    Seq(
      (2L, "s", "a b c"),
      (3L, "s", "b c d e"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.registry("text_capture_recapture").fn(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Long]("m") == 2L)
    assert(r.getAs[Long]("actual_vocab") == 5L)
    assert(r.getAs[Long]("chapman_est") == 5L)
  }
}
