package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-seventh wave on crafted
  * fixtures: additive seasonal decomposition summing to zero across the
  * week, the quality×dup odds ratio on a planted 2×2, and the rich-club
  * density of two interconnected hubs.
  */
class Wave15Spec extends SparkSpecBase {
  import spark.implicits._

  test("seasonal decompose: weekly spike reads +6000, flat days -1000, components sum to zero") {
    // 14 days from Mon 2024-01-01, y=10 except Mondays y=17. Every
    // complete centered window sums to 77 ⇒ detr7 = 42 on the Monday
    // inside the complete range (Jan 8), −7 elsewhere ⇒ seasonal
    // +6000 / −1000, Σ over dows = 0 (additive decomposition).
    val dir = tmpDir("w15-seas")
    val days = (0 until 14).map { i =>
      val dt = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (100L + i, 1L, if (dt.getDayOfWeek.getValue == 1) 17.00 else 10.00,
        dt.toString)
    }
    days.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("date_seasonal_decompose").fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("dow"), r.getAs[Long]("n_days"),
        r.getAs[Long]("seasonal_x1e3"))).toSeq
    assert(out.map(_._3).sum == 0L)
    assert(out.count(_._3 == 6000L) == 1)
    assert(out.count(_._3 == -1000L) == 6)
    assert(out.map(_._2).sum == 8L) // 8 complete-window days
  }

  test("quality dup matrix: planted 2x2 gives odds ratio exactly 1e6") {
    // doc 1 (HQ, planted dup), doc 60 (HQ clean), doc 2 (LQ, planted
    // dup), doc 61 (LQ clean) ⇒ cells 1/2/1/2, OR = (2·1)/(1·2) = 1.
    val dir = tmpDir("w15-qdm")
    val hq = Seq.fill(50)("the").mkString(" ")
    Seq(
      (1L, "a", hq),
      (60L, "a", hq + " extra"),
      (2L, "a", "qq ww"),
      (61L, "a", "zz"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.registry("pipeline_quality_dup_matrix").fn(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("hq_clean") == 1L && r.getAs[Long]("hq_dup") == 2L)
    assert(r.getAs[Long]("lq_clean") == 1L && r.getAs[Long]("lq_dup") == 2L)
    assert(r.getAs[Long]("odds_x1e6") == 1000000L)
  }

  test("rich club: two degree-9 hubs share their only rich-rich edge, phi = 1e6") {
    // Hubs 1 and 2 each link to 3..10 plus each other: deg 9 vs 2 for
    // leaves ⇒ rich = {1, 2}, e_rich = 1, φ = 2·1/(2·1) = 1e6;
    // 17 edges / 10 nodes ⇒ density = 17·2e6/90 = 377_777.
    val dir = tmpDir("w15-rich")
    val edges = (3L to 10L).flatMap(k => Seq((1L, k), (2L, k))) :+ ((1L, 2L))
    val rows = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i, b), (2L * i + 1, a), (2L * i + 1, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", to_date(lit("2024-03-01")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.registry("graph_rich_club").fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_nodes") == 10L && r.getAs[Long]("n_edges") == 17L)
    assert(r.getAs[Long]("n_rich") == 2L && r.getAs[Long]("e_rich") == 1L)
    assert(r.getAs[Long]("phi_x1e6") == 1000000L)
    assert(r.getAs[Long]("density_x1e6") == 377777L)
  }
}
