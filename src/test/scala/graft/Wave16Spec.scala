package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-eighth wave on crafted
  * fixtures: NFC composition savings, the two-proportion z² on a
  * perfectly separated A/B, and the charset artifact counters.
  */
class Wave16Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("nfc audit: decomposed accent detected and composed, plants add three savings") {
    val dir = tmpDir("w16-nfc")
    writeDocs(dir, Seq(
      (100L, "a", "cafe\u0301 time"), // NFC composes -> 1 cp saved
      (101L, "a", "plain text")))
    val out = Queries.registry("text_unicode_nfc_audit").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_denorm"), r.getAs[Long]("cp_saved"),
        r.getAs[Long]("denorm_rate_x1e6"))).toSeq
    assert(out == Seq(("a", 2L, 1L, 1L, 500000L)))

    // a doc_id < 40 doc grows a decomposed plant: resume+2 accents and
    // naive+1 diaeresis compose away 3 code points
    val dir2 = tmpDir("w16-nfc2")
    writeDocs(dir2, Seq((5L, "a", "plain prose")))
    val out2 = Queries.registry("text_unicode_nfc_audit").fn(spark, dir2)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_denorm"), r.getAs[Long]("cp_saved"))).toSeq
    assert(out2 == Seq(("a", 2L, 1L, 3L)))
  }

  test("ab test: perfectly separated cohorts read z2 = 4 exactly") {
    // even users (2, 4) both purchase; odd users (1, 3) never ⇒
    // z² = 1 / (0.5·0.5·(1/2+1/2)) = 4 ⇒ 4_000_000.
    val dir = tmpDir("w16-ab")
    Seq(
      (1L, "2024-03-01 00:00:01", 1L, "view"),
      (2L, "2024-03-01 00:00:01", 2L, "purchase"),
      (3L, "2024-03-01 00:00:01", 3L, "click"),
      (4L, "2024-03-01 00:00:01", 4L, "purchase"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.registry("stats_ab_test").fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_even") == 2L && r.getAs[Long]("conv_even") == 2L)
    assert(r.getAs[Long]("n_odd") == 2L && r.getAs[Long]("conv_odd") == 0L)
    assert(r.getAs[Long]("z2_x1e6") == 4000000L)
  }

  test("charset audit: control, replacement, and non-ascii counted separately") {
    val dir = tmpDir("w16-charset")
    writeDocs(dir, Seq(
      (100L, "a", "a\u0001b"),
      (101L, "a", "x\ufffdy"),
      (102L, "a", "clean text")))
    val r = Queries.registry("text_charset_audit").fn(spark, dir).collect().head
    assert(r.getAs[String]("source") == "a")
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_artifact_docs") == 2L)
    assert(r.getAs[Long]("ctl_chars") == 1L)
    assert(r.getAs[Long]("repl_chars") == 1L)
    assert(r.getAs[Long]("nonascii_chars") == 1L)
  }
}
