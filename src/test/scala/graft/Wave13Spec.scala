package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-fifth wave on crafted
  * fixtures: journey latency including the dropped zero-touch journey,
  * conformance whitelist boundaries, and MSTTR's remainder-chunk drop.
  */
class Wave13Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, String, Long, String)]): Unit =
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("time to convert: first-touch latency per journey, zero-touch journey dropped") {
    // user 1: view at :00, click at :30, purchase at :50 ⇒ 50 s
    // (0_lt_1m); a second purchase at :55 closes a ZERO-touch journey
    // ⇒ dropped. user 2: view at 0:00, purchase 2:00:00 later ⇒ 7200 s
    // (2_lt_1d).
    val dir = tmpDir("w13-ttc")
    writeEvents(dir, Seq(
      (1L, "2024-03-01 00:00:00", 1L, "view"),
      (2L, "2024-03-01 00:00:30", 1L, "click"),
      (3L, "2024-03-01 00:00:50", 1L, "purchase"),
      (4L, "2024-03-01 00:00:55", 1L, "purchase"),
      (5L, "2024-03-01 00:00:00", 2L, "view"),
      (6L, "2024-03-01 02:00:00", 2L, "purchase")))
    val out = Queries.registry("events_time_to_convert").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("bucket"),
        r.getAs[Long]("n_journeys"), r.getAs[Long]("total_s"))).toSeq
    assert(out == Seq(("0_lt_1m", 1L, 50L), ("2_lt_1d", 1L, 7200L)))
  }

  test("conformance: whitelisted transitions clean, error and self-loops flagged") {
    // user 1: signup→view (ok), view→error (VIOLATION),
    // error→view (VIOLATION), view→purchase (ok),
    // purchase→purchase (VIOLATION).
    val dir = tmpDir("w13-conf")
    writeEvents(dir, Seq(
      (1L, "2024-03-01 00:00:01", 1L, "signup"),
      (2L, "2024-03-01 00:00:02", 1L, "view"),
      (3L, "2024-03-01 00:00:03", 1L, "error"),
      (4L, "2024-03-01 00:00:04", 1L, "view"),
      (5L, "2024-03-01 00:00:05", 1L, "purchase"),
      (6L, "2024-03-01 00:00:06", 1L, "purchase")))
    val out = Queries.registry("events_conformance").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("prev"), r.getAs[String]("cur"),
        r.getAs[Long]("n"), r.getAs[Long]("is_violation"))).toSeq
    assert(out == Seq(
      ("error", "view", 1L, 1L),
      ("purchase", "purchase", 1L, 1L),
      ("signup", "view", 1L, 0L),
      ("view", "error", 1L, 1L),
      ("view", "purchase", 1L, 0L)))
  }

  test("msttr: full chunks only, distinct types per segment averaged") {
    // doc 1 (source a): 10 tokens 'a b c d e a b c d e' ⇒ 1 chunk,
    // 5 types; 3 trailing tokens would be dropped — doc 2 has exactly
    // 13 tokens: chunk 1 = 'x x x x x x x x x x' ⇒ 1 type, 'y z w'
    // dropped. a: 2 chunks, 6 types ⇒ msttr = 6·1e6/(2·10) = 300000.
    val dir = tmpDir("w13-msttr")
    Seq(
      (1L, "a", "a b c d e a b c d e"),
      (2L, "a", "x x x x x x x x x x y z w"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.registry("text_msttr").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_types"), r.getAs[Long]("msttr_x1e6"))).toSeq
    assert(out == Seq(("a", 2L, 6L, 300000L)))
  }
}
