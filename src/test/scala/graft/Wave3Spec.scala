package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 third wave, on CRAFTED fixtures with
  * hand-computed expectations (the oracle gate proves engine agreement;
  * these prove the statistic itself). Registry fns read tables from a
  * directory, so each fixture writes a minimal parquet corpus to a tmp
  * dir and runs the declared query on it unchanged.
  */
class Wave3Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val dir = tmpDir("w3-events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("CUSUM changepoint lands on a planted level shift, exact xn scale") {
    // type "a": 10 events/hour for hours 0-23, then 30/hour for 24-47.
    // mean = 20 ⇒ S_i = prefix - 20i bottoms at i=24 (|S| = 240);
    // s_xn = n·prefix - i·total = 48·S_i ⇒ max |s_xn| = 48·240 = 11520,
    // at the 24th hour (0-based hour 23).
    var id = 0L
    val rows = (0 until 48).flatMap { h =>
      val n = if (h < 24) 10 else 30
      val day = if (h < 24) "2024-03-01" else "2024-03-02"
      (0 until n).map { j =>
        id += 1
        (id, f"$day ${h % 24}%02d:$j%02d:00", 1L, "a", 0.0, "{}")
      }
    }
    val dir = writeEvents(rows)
    val out = Queries.registry("events_changepoint_cusum").fn(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_hours") == 48)
    assert(r.getAs[Long]("total") == 960)
    assert(r.getAs[String]("cp_hour") == "2024-03-01 23:00:00",
      s"changepoint at ${r.getAs[String]("cp_hour")}")
    assert(r.getAs[Long]("s_abs_max_xn") == 11520L)
  }

  test("Theil-Sen slope ignores a planted outlier hour that would drag OLS") {
    // n_t = 5 + 2t for t = 0..20 except t=10 planted at 500 events.
    // 190 of 210 pairwise slopes are exactly 2.0; the 20 outlier pairs
    // split 10 below / 10 above, so the median stays 2.0.
    var id = 0L
    val rows = (0 until 21).flatMap { t =>
      val n = if (t == 10) 500 else 5 + 2 * t
      (0 until n).map { j =>
        id += 1
        (id, f"2024-03-01 ${t}%02d:${j % 60}%02d:${j / 60}%02d", 1L, "a", 0.0, "{}")
      }
    }
    val dir = writeEvents(rows)
    val out = Queries.registry("events_theilsen_slope").fn(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_pairs") == 210L)
    assert(out.head.getAs[Double]("theilsen_slope") == 2.0)
  }

  test("skyline is dominance-free and dominates every excluded part") {
    val parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").cast("long"), col("p_size").cast("long").as("size"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("pc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sky = Queries.registry("skyline_parts").fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("size"),
        r.getAs[Long]("price_c")))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._3 <= b._3 && a._2 >= b._2 && (a._3 < b._3 || a._2 > b._2)
    val skySet = sky.map(_._1).toSet
    // frontier is internally dominance-free
    for (a <- sky; b <- sky)
      assert(!dominates(a, b), s"$a dominates frontier member $b")
    // every excluded part is dominated by some frontier member (2-D
    // skyline maximality)
    for (p <- parts if !skySet(p._1))
      assert(sky.exists(s => dominates(s, p)), s"excluded $p undominated")
  }

  test("table fingerprint is invariant under row order and layout") {
    val src = "/root/testdata/sf0.001"
    val dir = tmpDir("w3-fp")
    spark.read.parquet(s"$src/orders.parquet")
      .repartition(7, col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def fps(d: String): Map[Long, (Long, Long)] =
      Queries.registry("lakehouse_table_fingerprint").fn(spark, d).collect()
        .map(r => r.getAs[Long]("bucket") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("fingerprint"))).toMap
    assert(fps(src) == fps(dir), "fingerprint changed under repartition")
  }

  test("interval-overlap join: crafted intervals yield exact overlap") {
    // u1: A@00:00 then B@02:00; u2: C@00:30 then C@03:00 (collapsed —
    // same state), corpus max ts 03:00. Intervals: A [0:00,2:00),
    // B [2:00,3:00), C [0:30,3:00). Hours with events (all peaks):
    // 00, 02, 03. Overlaps: A∩00h=3600s; B∩02h=3600s; C∩00h=1800s,
    // C∩02h=3600s. Zero-length and touching pairs are excluded.
    val dir = writeEvents(Seq(
      (1L, "2024-03-01 00:00:00", 1L, "A", 0.0, "{}"),
      (2L, "2024-03-01 02:00:00", 1L, "B", 0.0, "{}"),
      (3L, "2024-03-01 00:30:00", 2L, "C", 0.0, "{}"),
      (4L, "2024-03-01 03:00:00", 2L, "C", 0.0, "{}")))
    val out = Queries.registry("join_interval_overlap").fn(spark, dir).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("overlap_us"))).toMap
    assert(out == Map(
      "A" -> ((1L, 3600L * 1000000)),
      "B" -> ((1L, 3600L * 1000000)),
      "C" -> ((2L, 5400L * 1000000))), s"got $out")
  }

  test("clustering coefficient: triangle + pendant fixture") {
    // co-order graph: {1,2,3} a triangle (support 2), edge (1,4)
    // (support 2). deg: 1→3, 2→2, 3→2, 4→1 (dropped, deg<2).
    // cc(1) = 2/(3·2) → 333333 (bucket 3); cc(2)=cc(3)=1.0 → bucket 10.
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 4L),
      (4L, 1L), (4L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Basket.clusteringCoeff(li, minSupport = 2).collect()
      .map(r => r.getAs[Long]("cc_bucket") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_cc_x1e6"))).toMap
    assert(out == Map(3L -> ((1L, 333333L)), 10L -> ((2L, 2000000L))), s"got $out")
  }

  test("PSI is zero for an identical distribution and positive under drift") {
    val out = Queries.registry("stats_psi_sources").fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    // every source's PSI and TVD are non-negative; PSI=0 only if the
    // source's bucket distribution equals the corpus's (impossible to
    // plant here, but the sign and the TVD-PSI co-monotonicity are the
    // semantics worth pinning: a bigger TVD should not come with a
    // *much* smaller PSI)
    out.foreach { r =>
      assert(r.getAs[Long]("psi_x1e9") >= -20L,  // per-term floors can lose ≤1e-9 each
        s"negative PSI for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("tvd_x1e6") >= 0L)
    }
  }
}
