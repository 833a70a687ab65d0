package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 nineteenth wave on crafted fixtures
  * with hand-computed expectations: Cramér's V² (perfect association ⇒
  * exactly 1, zero cells counted), PMI collocation ranking, and the
  * code-vs-prose symbol-density split.
  */
class Wave7Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("cramers v: perfect 2x2 association reads exactly 1, zero cells counted") {
    // brand A only ships flag R, brand B only flag N (2 lines each):
    // every cell term (diagonal AND the two zero cells) is
    // (obs·tn − rn·cn)²·1e6/(rn·cn·tn) = (±4)²·1e6/16 = 1e6 ⇒
    // chi2 = 4e6 = n·min(r−1,c−1)·1e6 ⇒ v2_x1e9 = 1e9. Without the
    // zero cells the statistic would read half its true value.
    val dir = tmpDir("w7-cramers")
    Seq((1L, 10L, "R"), (2L, 10L, "R"), (3L, 20L, "N"), (4L, 20L, "N"))
      .toDF("l_orderkey", "l_partkey", "l_returnflag")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1L))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", to_date(lit("2024-03-01")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "Brand#A"), (20L, "Brand#B"))
      .toDF("p_partkey", "p_brand")
      .withColumn("p_name", lit("p")).withColumn("p_type", lit("t"))
      .withColumn("p_size", lit(1L)).withColumn("p_container", lit("BOX"))
      .withColumn("p_retailprice", lit(1.0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Queries.registry("stats_cramers_v").fn(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_r") == 2L && r.getAs[Long]("n_c") == 2L)
    assert(r.getAs[Long]("chi2_x1e6") == 4000000L)
    assert(r.getAs[Long]("v2_x1e9") == 1000000000L)
  }

  test("bigram pmi: hand-computed ratios rank (x,y) above (y,x)") {
    // 10 docs of "x y x y x y": bigrams 3·(x,y) + 2·(y,x) per doc ⇒
    // n(x,y)=30, n(y,x)=20; uni x=30, y=30, Nu=60, Nb=50.
    // ratio(x,y) = 30·60²·1e6/(50·30·30) = 2_400_000;
    // ratio(y,x) = 20·60²·1e6/(50·30·30) = 1_600_000.
    val dir = tmpDir("w7-pmi")
    writeDocs(dir, (1 to 10).map(i => (100L + i, "s", "x y x y x y")))
    val out = Queries.registry("text_bigram_pmi").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n"), r.getAs[Long]("pmi_ratio_x1e6"))).toSeq
    assert(out == Seq(("x", "y", 30L, 2400000L), ("y", "x", 20L, 1600000L)))
  }

  test("code detect: symbol-dense doc flags as code, prose does not; plants add 40") {
    // doc 100 (source a): "f(x) { return x; }" — 5 symbol chars
    // ({};()) + ';'-counted, 5 tokens ⇒ 50 > 5 ⇒ code. doc 101
    // (source a): prose, 0 symbols ⇒ not code. doc 102 (source b):
    // prose. doc_ids ≥ 40 ⇒ the in-query plants add nothing here.
    val dir = tmpDir("w7-code")
    writeDocs(dir, Seq(
      (100L, "a", "f(x) { return x; }"),
      (101L, "a", "just plain prose words"),
      (102L, "b", "more plain words here")))
    val out = Queries.registry("text_code_detect").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_code"), r.getAs[Long]("code_rate_x1e6"))).toSeq
    assert(out == Seq(("a", 2L, 1L, 500000L), ("b", 1L, 0L, 0L)))

    // with a doc_id < 40 doc, its code-shaped plant appears under the
    // same source and flags as code
    val dir2 = tmpDir("w7-code2")
    writeDocs(dir2, Seq((5L, "a", "plain prose only")))
    val out2 = Queries.registry("text_code_detect").fn(spark, dir2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_code"))).toSeq
    assert(out2 == Seq(("a", 2L, 1L)))
  }
}
