package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-10 wave: exact duplicated-substring
  * runs (Lee et al. 2021 ExactSubstr family as shingle-diagonal
  * merging) — maximality of the merged run, the split-copy
  * configuration where the near-dup family under-reports, and the
  * stop-shingle cap's documented run-split behavior.
  */
class Wave22Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("exact substring: one maximal run, exact boundaries, shorter run excluded") {
    // doc 1 = t1..t30; doc 2 = x1 x2 x3 t6..t25 y1 y2 — the shared run
    // is exactly t6..t25 (20 tokens), sitting at pos 6 in doc 1 and
    // pos 4 in doc 2. A second pair (docs 3, 4) shares only 10 tokens
    // — below the 15 floor, must not appear.
    val t = toks("t", 30)
    val docs = Seq(
      (1L, t.mkString(" ")),
      (2L, (toks("x", 3) ++ t.slice(5, 25) ++ toks("y", 2)).mkString(" ")),
      (3L, (toks("p", 10) ++ toks("s", 10)).mkString(" ")),
      (4L, (toks("q", 10) ++ toks("s", 10)).mkString(" "))
    ).toDF("doc_id", "text")
    val runs = graft.ops.Dedup.exactSubstringRuns(docs, n = 5, minRunTokens = 15)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
        r.getAs[Long]("run_tokens"))).toSeq
    assert(runs == Seq((1L, 2L, 6L, 4L, 20L)))
  }

  test("exact substring reports the split-copy the Jaccard family misses") {
    // Planted split-copy: composite = all 20 tokens of A ++ all 20 of
    // B. Exact 3-gram Jaccard composite-vs-A = 18 shared / 38
    // composite shingles = 0.4736 < the declared 0.5 threshold — the
    // EXACT near-dup verdict (not just MinHash recall) misses it —
    // while the substring census reports a 20-token verbatim run to
    // EACH parent.
    val a = toks("a", 20)
    val b = toks("b", 20)
    val docs = Seq(
      (1L, a.mkString(" ")),
      (2L, b.mkString(" ")),
      (3L, (a ++ b).mkString(" "))
    ).toDF("doc_id", "text")
    val near = graft.ops.Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
    assert(near.isEmpty, "exact Jaccard >= 0.5 should propose nothing here")
    val runs = graft.ops.Dedup.exactSubstringRuns(docs, n = 5, minRunTokens = 15)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
        r.getAs[Long]("run_tokens"))).toSet
    assert(runs == Set((1L, 3L, 1L, 1L, 20L), (2L, 3L, 1L, 21L, 20L)))
  }

  test("exact substring: stop-shingle cap splits a run crossing a hot shingle") {
    // Docs 1, 2 share t1..t20. Doc 3 contains exactly t8..t12, making
    // that one 5-gram df = 3 > cap = 2 — it is dropped, splitting the
    // (1, 2) run into pa 1..7 (11 tokens) and pa 9..16 (12 tokens);
    // doc 3's only shared shingle is the dropped one, so it pairs with
    // nothing. The documented capped-index trade, pinned.
    val t = toks("t", 20)
    val docs = Seq(
      (1L, t.mkString(" ")),
      (2L, t.mkString(" ")),
      (3L, t.slice(7, 12).mkString(" "))
    ).toDF("doc_id", "text")
    val runs = graft.ops.Dedup.exactSubstringRuns(docs, n = 5, minRunTokens = 10,
        maxShingleDf = 2)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
        r.getAs[Long]("run_tokens"))).toSet
    assert(runs == Set((1L, 2L, 1L, 1L, 11L), (1L, 2L, 9L, 9L, 12L)))
  }

  test("dedup_exact_substring query: planted split-copy rollup per source") {
    // 24 parent docs of 20 unique tokens each, all source 's'. The
    // query plants 12 composites (first-40(id) ++ first-40(id+12),
    // source 'planted') — each shares one 20-token run with each
    // parent: planted row = 12 docs x 2 runs x 20 tokens; parent row
    // = 24 docs x 1 run each.
    val dir = tmpDir("w22-xsub")
    writeDocs(dir, (0L until 24L).map(i =>
      (i, "s", toks(s"d${i}w", 20).mkString(" "))))
    val out = Queries.registry("dedup_exact_substring").fn(spark, dir)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs_dup"), r.getAs[Long]("n_doc_runs"),
        r.getAs[Long]("max_run_tokens"), r.getAs[Long]("dup_tokens"))).toSeq
    assert(out == Seq(
      ("planted", 12L, 24L, 20L, 480L),
      ("s", 24L, 24L, 20L, 480L)))
  }
}
