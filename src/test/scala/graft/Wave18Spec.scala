package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 thirtieth wave on crafted fixtures:
  * the median filter absorbing a spike the mean would smear, 3-step
  * path census ordering, and aspect-bucket argmin with hand-computed
  * cross-multiplied errors.
  */
class Wave18Spec extends SparkSpecBase {
  import spark.implicits._

  test("rolling median: single complete window reads med 10 against the spike") {
    // Days 1..7 revenue 10,10,10,100,10,10,10: only day 4 has a
    // complete ±3 window; its 7-day median is 10, deviation +90 —
    // a moving AVERAGE would read ~22.9 and smear the spike.
    val dir = tmpDir("w18-med")
    (0 until 7).map { i =>
      (100L + i, 1L, if (i == 3) 100.00 else 10.00,
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("date_rolling_median").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("y"),
        r.getAs[Long]("med7"), r.getAs[Long]("dev"))).toSeq
    assert(out == Seq(("2024-01-04", 100L, 10L, 90L)))
  }

  test("top paths: repeated path counted twice, ordered above the singleton") {
    val dir = tmpDir("w18-paths")
    Seq(
      (1L, "2024-03-01 00:00:01", 1L, "view"),
      (2L, "2024-03-01 00:00:02", 1L, "click"),
      (3L, "2024-03-01 00:00:03", 1L, "purchase"),
      (4L, "2024-03-01 00:00:04", 1L, "view"),
      (5L, "2024-03-01 00:00:05", 1L, "click"),
      (6L, "2024-03-01 00:00:06", 1L, "purchase"),
      (7L, "2024-03-01 00:00:01", 2L, "signup"),
      (8L, "2024-03-01 00:00:02", 2L, "view"),
      (9L, "2024-03-01 00:00:03", 2L, "purchase"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.registry("events_top_paths").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n"))).toSeq
    assert(out == Seq(
      ("view>click>purchase", 2L),
      ("signup>view>purchase", 1L)))
  }

  test("aspect buckets: argmin by exact cross-multiplied error, square lands 1:1 at zero") {
    // doc 0 → 16×16 (1:1, err 0); doc 496 → 512×32 (16:9 wins at
    // 888_888 ppm); doc 700 → 76×236 (9:16 wins at 746_710 ppm).
    val dir = tmpDir("w18-aspect")
    Seq((0L, "s", "x"), (496L, "s", "y"), (700L, "s", "z"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.registry("multimodal_aspect_buckets").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("bucket"), r.getAs[Long]("n_assets"),
        r.getAs[Long]("mean_err_x1e6"))).toSeq
    assert(out == Seq(
      ("16:9", 1L, 888888L),
      ("1:1", 1L, 0L),
      ("9:16", 1L, 746710L)))
  }
}
