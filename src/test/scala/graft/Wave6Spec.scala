package graft

import org.apache.spark.sql.functions._

import graft.ops.Basket

/** Semantics gates for the round-9 eighteenth wave on crafted fixtures
  * with hand-computed expectations (oracle gate = engine agreement;
  * these prove the statistic itself): k-truss peeling, Lorenz deciles,
  * Tukey fences.
  */
class Wave6Spec extends SparkSpecBase {
  import spark.implicits._

  // K4 on parts 1-4 (two orders holding all four parts → every pair
  // support 2, every edge in 2 triangles) + a two-triangle strip
  // 20-21-22-23 (orders {20,21,22}×2, {21,22,23}×2: the four outer
  // edges sit in 1 triangle each, the shared edge 21-22 in 2).
  private def trussFixture = {
    val k4 = for (o <- Seq(1L, 2L); p <- Seq(1L, 2L, 3L, 4L)) yield (o, p)
    val strip = Seq(
      (10L, 20L), (10L, 21L), (10L, 22L),
      (11L, 20L), (11L, 21L), (11L, 22L),
      (12L, 21L), (12L, 22L), (12L, 23L),
      (13L, 21L), (13L, 22L), (13L, 23L))
    (k4 ++ strip).toDF("l_orderkey", "l_partkey")
  }

  test("k-truss: strip peels over TWO rounds (outer edges, then the bare shared edge), K4 survives") {
    // Round 1 kills the strip's outer edges (support 1 < k−2 = 2) but
    // NOT 21-22 (2 triangles); round 2 kills 21-22 (its triangles are
    // gone). The cascade is invisible to single-pass support filtering.
    val after1 = Basket.kTruss(trussFixture, k = 4, rounds = 1).collect().head
    assert(after1.getAs[Long]("n_truss_edges") == 7L,
      s"round 1 should leave K4 + the shared strip edge: $after1")
    val r = Basket.kTruss(trussFixture, k = 4, rounds = 3).collect().head
    assert(r.getAs[Long]("n_truss_nodes") == 4L)
    assert(r.getAs[Long]("n_truss_edges") == 6L)
  }

  test("k-truss reaches its fixpoint within the declared rounds on the corpus") {
    // the declared registry knobs: k=3, 5 rounds (the 4-truss of this
    // corpus is empty past sf0.001 — measured — so k=3 is the graded
    // surface; the crafted-fixture test above still exercises k=4)
    val li = graft.api.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val at5 = Basket.kTruss(li, k = 3, rounds = 5).collect().head
    val at6 = Basket.kTruss(li, k = 3, rounds = 6).collect().head
    assert(at5 == at6, s"one more peel changed the truss: $at5 vs $at6")
  }

  test("lorenz deciles: revenues 1..10 give decile i share i/55, exact cum to 1e6") {
    val dir = tmpDir("w6-lorenz")
    (1 to 10).map(i => (100L + i, i / 100.0))
      .toDF("o_custkey", "o_totalprice")
      .withColumn("o_orderkey", col("o_custkey") * 10)
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderdate", to_date(lit("2024-03-01")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.api.Queries.registry("stats_lorenz_deciles")
      .fn(spark, dir).collect()
    assert(out.length == 10)
    val d1 = out.head
    assert(d1.getAs[Long]("decile") == 1L && d1.getAs[Long]("n_customers") == 1L
      && d1.getAs[Long]("rev_cents") == 1L)
    assert(d1.getAs[Long]("share_x1e6") == 18181L)
    val d10 = out.last
    assert(d10.getAs[Long]("rev_cents") == 10L)
    assert(d10.getAs[Long]("share_x1e6") == 181818L)
    assert(d10.getAs[Long]("cum_share_x1e6") == 1000000L)
  }

  private def writeEvents(dir: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.map { case (id, tpe, v) => (id, "2024-03-01 00:00:00", id, tpe, v, "{}") }
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("tukey fences: hand-computed quartiles and one planted outlier per side") {
    // type hi: cents [1..7, 1000] → n=8, Q1 = rank-2 value = 2,
    // Q3 = rank-6 value = 6; high fence (doubled) 2v > 5·6 − 3·2 = 24
    // ⇒ only 1000; low fence 2v < 10 − 18 < 0 ⇒ none.
    // type lo: cents [1, 100..103] → Q1 = 100 (cum·4 ≥ 5 at rank 2),
    // Q3 = 102 (cum·4 ≥ 15 ⇒ rank 4); low: 2v < 500 − 306 = 194 ⇒
    // v ≤ 96 ⇒ only 1; high: 2v > 510 − 300 = 210 ⇒ v ≥ 106 ⇒ none.
    val dir = tmpDir("w6-tukey")
    val hi = (1 to 7).map(i => (i.toLong, "hi", i / 100.0)) :+ (8L, "hi", 10.00)
    val lo = Seq((10L, "lo", 0.01), (11L, "lo", 1.00), (12L, "lo", 1.01),
      (13L, "lo", 1.02), (14L, "lo", 1.03))
    writeEvents(dir, hi ++ lo)
    val out = graft.api.Queries.registry("stats_tukey_outliers")
      .fn(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("q1_c"), r.getAs[Long]("q3_c"),
        r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))).toSeq
    assert(out == Seq(("hi", 8L, 2L, 6L, 0L, 1L), ("lo", 5L, 100L, 102L, 1L, 0L)))
  }
}
