package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-second wave on crafted
  * fixtures with hand-computed expectations: cross-source 3-gram
  * novelty, the cohort LTV triangle's cumulative arithmetic, and the
  * greedy compaction bin-packer's group boundaries.
  */
class Wave10Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("ngram novelty: shared gram excluded, unique gram counted, both sources at 1/2") {
    // s1 'a b c d' ⇒ grams {a b c, b c d}; s2 'a b c e' ⇒ {a b c,
    // b c e}. 'a b c' lives in both (nsrc=2); each source keeps one
    // novel gram of two ⇒ 500000.
    val dir = tmpDir("w10-novel")
    writeDocs(dir, Seq(
      (100L, "s1", "a b c d"),
      (101L, "s2", "a b c e")))
    val out = Queries.registry("text_ngram_novelty").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_x1e6"))).toSeq
    assert(out == Seq(("s1", 2L, 1L, 500000L), ("s2", 2L, 1L, 500000L)))
  }

  test("cohort ltv: cumulative revenue per cohort customer across ages") {
    // Cohort 2024-01: custs 1, 2 (first orders in Jan). Age 0 revenue
    // 10+20=30; age 1 (Feb order, cust 1) 40 ⇒ cum 70 ⇒ ltv 35_000.
    // Cohort 2024-02: cust 3, age 0 revenue 5 ⇒ ltv 5_000.
    val dir = tmpDir("w10-ltv")
    Seq(
      (10L, 1L, 10.00, "2024-01-05"),
      (11L, 2L, 20.00, "2024-01-20"),
      (12L, 1L, 40.00, "2024-02-03"),
      (13L, 3L, 5.00, "2024-02-10"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate_s")
      .withColumn("o_orderdate", to_date(col("o_orderdate_s")))
      .drop("o_orderdate_s")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("orders_cohort_ltv").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("cohort"), r.getAs[Long]("age_m"),
        r.getAs[Long]("n_custs"), r.getAs[Long]("rev"),
        r.getAs[Long]("cum_rev"), r.getAs[Long]("ltv_x1e3"))).toSeq
    assert(out == Seq(
      ("2024-01", 0L, 2L, 30L, 30L, 15000L),
      ("2024-01", 1L, 2L, 40L, 70L, 35000L),
      ("2024-02", 0L, 1L, 5L, 5L, 5000L)))
  }

  test("compaction plan: exclusive-prefix grouping splits four half-target files into two groups") {
    // Four 131072-char pseudo-files (one per 100-id bucket) ⇒
    // exclusive prefix 0, 131072, 262144, 393216 ⇒ groups 0,0,1,1:
    // 2 groups of exactly the 262144 target ⇒ fill = 1e6.
    val dir = tmpDir("w10-compact")
    val big = "x" * 131072
    writeDocs(dir, Seq(
      (0L, "a", big), (100L, "a", big), (200L, "a", big), (300L, "a", big)))
    val out = Queries.registry("lakehouse_compaction_plan").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_files"),
        r.getAs[Long]("total_chars"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("max_group_chars"), r.getAs[Long]("fill_x1e6"))).toSeq
    assert(out == Seq(("a", 4L, 524288L, 2L, 262144L, 1000000L)))
  }
}
