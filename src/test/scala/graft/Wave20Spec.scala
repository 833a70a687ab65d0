package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 thirty-second wave on crafted
  * fixtures: PRF lift arithmetic and query-term exclusion, perfect-star
  * centralization = 1, and weekend-collapsing business-day lags.
  */
class Wave20Spec extends SparkSpecBase {
  import spark.implicits._

  test("prf terms: co-occurring terms lifted, query terms excluded, rare terms floored out") {
    // Docs 1-10 'spark tuning shuffle' are the BM25 top-10; 'shuffle'
    // (df_top 10 / df_corpus 10) lifts above 'tuning' (10/12);
    // 'spark' excluded as a query term; 'plain' fails the df_top ≥ 3
    // floor. N = 14.
    val dir = tmpDir("w20-prf")
    val rows = (1 to 10).map(i => (i.toLong, "s", "spark tuning shuffle")) ++
      Seq((11L, "s", "plain text tuning"), (12L, "s", "plain text tuning"),
        (13L, "s", "plain text words"), (14L, "s", "plain text words"))
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.registry("search_prf_terms").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("df_top"),
        r.getAs[Long]("df_corpus"), r.getAs[Long]("lift_x1e6"))).toSeq
    assert(out == Seq(
      ("shuffle", 10L, 10L, 1400000L),
      ("tuning", 10L, 12L, 1166666L)))
  }

  test("centralization: perfect star reads exactly 1e6") {
    // Hub 1 → leaves 2..5: n=5, dmax=4, Σdeg=8 ⇒
    // (5·4 − 8)·1e6 / (4·3) = 1e6.
    val dir = tmpDir("w20-central")
    val rows = (2L to 5L).zipWithIndex.flatMap { case (k, i) =>
      Seq((2L * i, 1L), (2L * i, k), (2L * i + 1, 1L), (2L * i + 1, k))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", to_date(lit("2024-03-01")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Queries.registry("graph_centralization").fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("max_degree") == 4L && r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("centralization_x1e6") == 1000000L)
  }

  test("business days: weekends collapse, full week = 5") {
    // Order Mon 2024-01-01. Ships: Wed 01-03 ⇒ 2 bd; Sun 01-07 ⇒ 5 bd
    // (weekend collapses to Friday); next Mon 01-08 ⇒ 5 bd.
    val dir = tmpDir("w20-bd")
    Seq((1L, "2024-01-03"), (1L, "2024-01-07"), (1L, "2024-01-08"))
      .zipWithIndex.map { case ((ok, ship), i) => (ok, 10L + i, ship) }
      .toDF("l_orderkey", "l_partkey", "l_shipdate_s")
      .withColumn("l_shipdate", to_date(col("l_shipdate_s")))
      .drop("l_shipdate_s")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 9L, 1.00, "2024-01-01"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Queries.registry("date_business_days").fn(spark, dir).collect().head
    assert(r.getAs[String]("prio") == "1-URGENT")
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("bd_sum") == 12L)
    assert(r.getAs[Long]("n_le_5") == 3L)
    assert(r.getAs[Long]("mean_bd_x1e3") == 4000L)
  }
}
