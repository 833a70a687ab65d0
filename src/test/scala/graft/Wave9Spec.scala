package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-first wave on crafted
  * fixtures with hand-computed expectations: BPE fertility under a
  * fully-predicted 5-round merge table, the HTML-strip census on both
  * natural and planted markup, and the time-weighted average including
  * the zero-weight last event.
  */
class Wave9Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("bpe fertility: shared tokenizer segments the off-vocab source at 2 tokens/word") {
    // Corpus vocab {aaaa, bbbb, ffff} each f=5. Hand-run of the 5
    // training rounds (cnt DESC, pair ASC ties): aa(15), bb(15),
    // ff(15), aaaa(5), bbbb(5). Final longest-first alternation
    // aaaa|bbbb|aa|bb|ff|. segments aaaa→1, bbbb→1, ffff→2.
    // s1 = {aaaa, bbbb}·5 ⇒ 10 words, 10 tokens ⇒ 1e6;
    // s2 = {ffff}·5 ⇒ 5 words, 10 tokens ⇒ 2e6.
    val dir = tmpDir("w9-fert")
    writeDocs(dir,
      (1 to 5).map(i => (100L + i, "s1", "aaaa bbbb")) ++
        (1 to 5).map(i => (200L + i, "s2", "ffff")))
    val out = Queries.registry("text_bpe_fertility").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("fertility_x1e6"))).toSeq
    assert(out == Seq(("s1", 10L, 10L, 1000000L), ("s2", 5L, 10L, 2000000L)))
  }

  test("html strip: tag chars counted, plain docs untouched, plants add markup") {
    // doc 100: '<b>hi</b> x' — 7 tag chars; doc 101/102 plain.
    val dir = tmpDir("w9-html")
    writeDocs(dir, Seq(
      (100L, "a", "<b>hi</b> x"),
      (101L, "a", "plain words"),
      (102L, "b", "no tags here")))
    val out = Queries.registry("text_html_strip").fn(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_html"), r.getAs[Long]("tag_chars"),
        r.getAs[Long]("html_rate_x1e6"))).toSeq
    assert(out == Seq(("a", 2L, 1L, 7L, 500000L), ("b", 1L, 0L, 0L, 0L)))

    // a doc_id < 40 doc gets an HTML-wrapped plant under the same
    // source: wrapper is 81 tag chars across 8 tags
    val dir2 = tmpDir("w9-html2")
    writeDocs(dir2, Seq((5L, "a", "plain prose only")))
    val out2 = Queries.registry("text_html_strip").fn(spark, dir2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_html"))).toSeq
    assert(out2 == Seq(("a", 2L, 1L)))
  }

  test("twa: values weighted by holding time, last event weightless") {
    // user 1, type 'view': value 1.00 held 10 s, 2.00 held 30 s, 9.99
    // never held ⇒ TWA = (100·10 + 200·30)/40 = 175 cents ⇒ 175000.
    val dir = tmpDir("w9-twa")
    Seq(
      (1L, "2024-03-01 00:00:00", 1L, "view", 1.00, "{}"),
      (2L, "2024-03-01 00:00:10", 1L, "view", 2.00, "{}"),
      (3L, "2024-03-01 00:00:40", 1L, "view", 9.99, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.registry("events_twa").fn(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("event_type") == "view")
    assert(r.head.getAs[Long]("n_intervals") == 2L)
    assert(r.head.getAs[Long]("held_s") == 40L)
    assert(r.head.getAs[Long]("twa_c_x1e3") == 175000L)
  }
}
