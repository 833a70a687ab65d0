package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 thirty-first wave on crafted
  * fixtures: both gibberish rules and the 20-letter floor, and a
  * PLANTED Simpson reversal (strata favor even, aggregate favors odd).
  */
class Wave19Spec extends SparkSpecBase {
  import spark.implicits._

  test("gibberish: vowel-poor and consonant-run docs flagged, short docs exempt") {
    // doc 100: 6-consonant run, vowels fine ⇒ flagged (run rule).
    // doc 101: 24 letters, 4 vowels (<20%) no 6-run ⇒ flagged (vowel
    // rule). doc 102: healthy prose ⇒ clean. doc 103: mash but only
    // 10 letters ⇒ exempt (floor).
    val dir = tmpDir("w19-gib")
    Seq(
      (100L, "a", "the strngths of the method are well read over time"),
      (101L, "a", "blck crft dwns mrks lfts pzzl"),
      (102L, "a", "a reasonable sentence with normal vowel balance here"),
      (103L, "a", "zxcvb qwrtz"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Queries.registry("text_gibberish_detect").fn(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_gibberish") == 2L)
    assert(r.getAs[Long]("gib_rate_x1e6") == 500000L)
  }

  test("simpson: strata favor even cohort while the aggregate reverses") {
    // Classic construction: stratum H (high values) is mostly ODD
    // customers, stratum L mostly EVEN — within EACH stratum even
    // means are higher, but odd's weight in H flips the aggregate.
    //   H: even cust 2 → 100 (n=1); odd cust 1 → 90, 90, 90 (n=3)
    //   L: even cust 4 → 10, 10, 10 (n=3); odd cust 3 → 5 (n=1)
    // H: 100·3 − 270·1 = +30 ⇒ +1. L: 30·1 − 5·3 = +15 ⇒ +1.
    // ALL: even (130, n=4) vs odd (275, n=4): 130·4 − 275·4 < 0 ⇒ −1.
    val dir = tmpDir("w19-simpson")
    Seq(
      (10L, 2L, 100.00, "1-URGENT"),
      (11L, 1L, 90.00, "1-URGENT"),
      (12L, 1L, 90.00, "1-URGENT"),
      (13L, 1L, 90.00, "1-URGENT"),
      (14L, 4L, 10.00, "5-LOW"),
      (15L, 4L, 10.00, "5-LOW"),
      (16L, 4L, 10.00, "5-LOW"),
      (17L, 3L, 5.00, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .withColumn("o_orderdate", to_date(lit("2024-01-01")))
      .withColumn("o_orderstatus", lit("O"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Queries.registry("stats_simpson_check").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("sign_diff"))).toSeq
    assert(out == Seq(
      ("1-URGENT", 1L), ("5-LOW", 1L), ("__ALL__", -1L)))
  }
}
