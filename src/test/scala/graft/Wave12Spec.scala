package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-fourth wave on crafted
  * fixtures: U-shaped attribution credit across singleton/pair/middle
  * journeys and dangling touches, centroid label confusion with one
  * planted off-class vector, and the dormancy recency boundaries.
  */
class Wave12Spec extends SparkSpecBase {
  import spark.implicits._

  test("positional attribution: 40/20/40 split, singleton 100%, pair 50/50, dangling dropped") {
    // user 1: view,click,view → purchase; trailing click dangles.
    //   credits view 4000+4000, click 2000.
    // user 2: click → purchase (singleton 10000).
    // user 3: view,click → purchase (5000 each).
    // user 4: error×5 → purchase (4000 + 3×666 + 4000 = 9998).
    val dir = tmpDir("w12-attr")
    val rows = Seq(
      (1L, "2024-03-01 00:00:01", 1L, "view"),
      (2L, "2024-03-01 00:00:02", 1L, "click"),
      (3L, "2024-03-01 00:00:03", 1L, "view"),
      (4L, "2024-03-01 00:00:04", 1L, "purchase"),
      (5L, "2024-03-01 00:00:05", 1L, "click"),
      (6L, "2024-03-01 00:00:01", 2L, "click"),
      (7L, "2024-03-01 00:00:02", 2L, "purchase"),
      (8L, "2024-03-01 00:00:01", 3L, "view"),
      (9L, "2024-03-01 00:00:02", 3L, "click"),
      (10L, "2024-03-01 00:00:03", 3L, "purchase"),
      (11L, "2024-03-01 00:00:01", 4L, "error"),
      (12L, "2024-03-01 00:00:02", 4L, "error"),
      (13L, "2024-03-01 00:00:03", 4L, "error"),
      (14L, "2024-03-01 00:00:04", 4L, "error"),
      (15L, "2024-03-01 00:00:05", 4L, "error"),
      (16L, "2024-03-01 00:00:06", 4L, "purchase"))
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.registry("events_attribution_positional").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("channel"),
        r.getAs[Long]("n_touches"), r.getAs[Long]("credit_bp"))).toSeq
    assert(out == Seq(
      ("click", 3L, 17000L),
      ("error", 5L, 9998L),
      ("view", 3L, 13000L)))
  }

  test("label confusion: planted off-class vector confused, natives not") {
    // label 0 = {0.0, 0.4, 1.05} (centroid 29/60), label 1 = {1.0, 1.2}
    // (centroid 1.1). Only the 1.05 plant sits closer to centroid 1.
    val dir = tmpDir("w12-conf")
    Seq((1L, Seq(0.0f), 0), (2L, Seq(0.4f), 0), (5L, Seq(1.05f), 0),
        (3L, Seq(1.0f), 1), (4L, Seq(1.2f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Queries.registry("emb_label_confusion").fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("label"),
        r.getAs[Long]("nearest_other"), r.getAs[Long]("n"),
        r.getAs[Long]("n_confused"))).toSeq
    assert(out == Seq((0L, 1L, 3L, 1L), (1L, 0L, 2L, 0L)))
  }

  test("dormancy: recency boundaries at 90 and 365 days") {
    val dir = tmpDir("w12-dorm")
    Seq((1L, 7L), (2L, 7L), (3L, 7L))
      .toDF("c_custkey", "c_nationkey")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("SEG")).withColumn("c_acctbal", lit(1.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((7L, "NATION7")).toDF("n_nationkey", "n_name")
      .withColumn("n_regionkey", lit(0L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq(
      (10L, 1L, 1.00, "2024-12-31"),
      (11L, 2L, 1.00, "2024-09-22"),
      (12L, 3L, 1.00, "2023-11-27"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("orders_dormancy").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("nation"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_custs"), r.getAs[Long]("max_recency_d"))).toSeq
    assert(out == Seq(
      ("NATION7", "0_active", 1L, 0L),
      ("NATION7", "1_lapsing", 1L, 100L),
      ("NATION7", "2_dormant", 1L, 400L)))
  }
}
