package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{Queries, Tables}
import graft.ops.{Hll, TextOps}

/** Wave 23 semantics: replayable HLL, nDCG ranking eval, conformal
  * calibration, Dirichlet query likelihood. */
class Wave23Spec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hll: corrected estimate within 10% of exact at two SFs") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Hll.distinctSketch(Tables.events(spark, d),
        "event_type", col("event_id")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val est = r.getAs[Long]("est_x1e3")
        val exact = r.getAs[Long]("exact")
        // the standard regime rule: linear counting below 2.5m (est and
        // the cutoff both ×1e3)
        val corrected =
          if (est < 2500L * Hll.M && !r.isNullAt(r.fieldIndex("lc_x1e3")))
            r.getAs[Long]("lc_x1e3")
          else est
        val relErr = math.abs(corrected / 1000.0 - exact) / exact.toDouble
        assert(relErr < 0.10,
          s"$d ${r.getString(0)}: corrected $corrected vs exact $exact (err $relErr)")
      }
    }
  }

  test("hll: split registers merge by max to the full state; replay is a no-op") {
    val ev = Tables.events(spark, dir)
    def regs(df: DataFrame): Map[(String, Long), Long] =
      Hll.registers(df, "event_type", col("event_id")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("idx")) ->
          r.getAs[Long]("rho")).toMap
    val full = regs(ev)
    val s1 = regs(ev.filter(col("event_id") % 2 === 1))
    val s2 = regs(ev.filter(col("event_id") % 2 === 0))
    val merged = (s1.keySet ++ s2.keySet).map { k =>
      k -> math.max(s1.getOrElse(k, 0L), s2.getOrElse(k, 0L))
    }.toMap
    assert(merged == full, "per-register max merge diverged from full-corpus registers")
    // idempotence: replaying the whole corpus on top of itself changes
    // nothing — the dup-redelivery immunity counting sketches lack
    assert(regs(ev.unionByName(ev)) == full)
  }

  test("ndcg: perfect single-relevant ranking scores exactly 1e6; corpus value bounded") {
    val docs = Seq((1L, "spark join vector"), (2L, "aa bb aa"), (3L, "cc dd"))
      .toDF("doc_id", "text")
    val perfect = TextOps.ndcgEval(docs, Seq("spark", "join", "vector"), k = 10).head
    assert(perfect.getAs[Long]("ndcg_x1e6") == 1000000L)
    assert(perfect.getAs[Long]("n_ideal") == 1L)
    val c = TextOps.ndcgEval(Tables.documents(spark, dir),
      Seq("spark", "join", "vector"), k = 10).head
    val v = c.getAs[Long]("ndcg_x1e6")
    assert(v > 0 && v <= 1000000L, s"corpus ndcg_x1e6 $v out of (0, 1e6]")
    // discount vector: position 1 is exactly 1e9 (log2(2) = 1), strictly
    // decreasing after
    val disc = TextOps.ndcgDiscX1e9(10)
    assert(disc.head == 1000000000L)
    assert(disc.sliding(2).forall(p => p(0) > p(1)))
  }

  test("conformal: thresholds/coverage monotone in alpha, coverage near target") {
    val rows = Queries.registry("stats_conformal_threshold")
      .fn(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[Long]("alpha_pct"), r.getAs[Long]("threshold"),
        r.getAs[Long]("coverage_x1e6"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L))
    // smaller alpha → higher rank → higher (or equal) threshold → more
    // coverage
    assert(rows.sliding(2).forall(p => p(0)._2 >= p(1)._2))
    assert(rows.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    // the distribution-free guarantee is on-average 1−α; allow 10pp of
    // finite-sample slack on the held-out measurement
    rows.foreach { case (a, _, cov) =>
      assert(cov >= (100 - a) * 10000L - 100000L && cov <= 1000000L,
        s"alpha $a%: coverage_x1e6 $cov far from ${(100 - a) * 10000L}")
    }
  }

  test("t-closeness: valid TVD range and risk flag; groups mirroring the global mix score 0") {
    val rows = Queries.registry("privacy_t_closeness").fn(spark, dir).collect()
    assert(rows.nonEmpty)
    // every tvd is a valid TVD: in [0, 1e6], and risk flag == (> 0.3)
    rows.foreach { r =>
      val t = r.getAs[Long]("tvd_x1e6")
      assert(t >= 0 && t <= 1000000L)
      assert(r.getAs[Long]("t_risk") == (if (t > 300000L) 1L else 0L))
    }
    // planted fixture: both groups carry the exact global 1/3-1/3-1/3
    // band mix, so both TVDs must be exactly 0
    val fix = Seq(
      (0L, "A", -10.0), (1L, "A", -20.0), (2L, "A", 100.0), (3L, "A", 200.0),
      (4L, "A", 9000.0), (5L, "A", 9100.0),
      (6L, "B", -1.0), (7L, "B", -2.0), (8L, "B", 50.0), (9L, "B", 60.0),
      (10L, "B", 9200.0), (11L, "B", 9300.0)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .withColumn("c_nationkey", lit(7L))
    // both groups have the SAME 1/3-1/3-1/3 mix == global → tvd 0 for both
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val band = when(col("c_acctbal") < 0, "neg")
      .when(col("c_acctbal") < 4500, "mid").otherwise("high")
    val cust = fix.select(col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"), band.as("band"))
    val cell = cust.groupBy("nation", "segment", "band").agg(count(lit(1)).as("cgv"))
    val grp = cust.groupBy("nation", "segment").agg(count(lit(1)).as("ng"))
    val g = cust.groupBy("band").agg(count(lit(1)).as("cv"))
    val n = cust.agg(count(lit(1)).as("nn"))
    val tv = grp.crossJoin(broadcast(g)).crossJoin(broadcast(n))
      .join(cell, Seq("nation", "segment", "band"), "left")
      .withColumn("cgv", coalesce(col("cgv"), lit(0L)))
      .withColumn("num", abs(dec(col("cgv")) * dec(col("nn")) -
        dec(col("cv")) * dec(col("ng"))))
      .groupBy("segment")
      .agg(expr("CAST(sum(num) * 1000000 div (2 * CAST(max(ng) AS DECIMAL(38,0)) * max(nn)) AS BIGINT)")
        .as("tvd_x1e6"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tv("A") == 0L && tv("B") == 0L)
  }

  test("loo source impact: removing a source reproduces the direct mean over the rest") {
    val docs = Tables.documents(spark, dir)
    val out = Queries.registry("stats_loo_source_impact").fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("mean_loo_x100"), r.getAs[Long]("loo_delta_x100"))).toMap
    val some = out.keySet.take(3)
    some.foreach { src =>
      val rest = docs.filter(col("source") =!= src)
        .agg((sum("n_chars") * 100).cast("long").as("t"), count(lit(1)).as("n")).head
      val direct = rest.getLong(0) / rest.getLong(1)
      assert(out(src)._1 == direct, s"$src: LOO algebra ${out(src)._1} != direct $direct")
    }
    // deltas sum-check: a source with above-average docs must have a
    // negative-or-zero... (sign consistency): delta sign == sign(mean_all − source mean)
    val full = docs.agg((sum("n_chars") * 100).cast("long"), count(lit(1))).head
    val meanAll = full.getLong(0) / full.getLong(1)
    out.foreach { case (_, (loo, delta)) => assert(delta == loo - meanAll) }
  }

  test("recall/mrr: known relevance fixture recovers exact ranks and rationals") {
    val docs = Seq(
      (1L, "spark join vector extra words"),
      (2L, "spark join other words"),
      (3L, "spark alone here"),
      (4L, "nothing matching at all")
    ).toDF("doc_id", "text")
    val r = TextOps.recallMrrEval(docs, Seq("spark", "join", "vector"),
      k = 20, minRel = 2).head
    // docs 1 and 2 are relevant (≥2 distinct terms); both rank in the
    // list, first at position 1
    assert(r.getAs[Long]("n_relevant") == 2L)
    assert(r.getAs[Long]("first_rel_rank") == 1L)
    assert(r.getAs[Long]("mrr_x1e6") == 1000000L)
    assert(r.getAs[Long]("recall20_x1e6") == 1000000L)
    // corpus invariants: recall monotone in k, bounded by 1e6
    val c = Queries.registry("search_recall_mrr").fn(spark, dir).head
    val (r5, r10, r20) = (c.getAs[Long]("recall5_x1e6"),
      c.getAs[Long]("recall10_x1e6"), c.getAs[Long]("recall20_x1e6"))
    assert(r5 <= r10 && r10 <= r20 && r20 <= 1000000L)
    assert(c.getAs[Long]("mrr_x1e6") <= 1000000L)
  }

  test("tfidf sparse cosine: exact copies score exactly 1e6, disjoint docs never pair") {
    import graft.ops.TextOps
    // an identical-token pair (cos² exactly 1 — the integer rational is
    // (Σw²)²/(Σw²·Σw²)), one disjoint doc, plus filler establishing df
    // — and a pair sharing NO kept term cannot appear at all (inverted
    // index, not all-pairs). A single extra RARE token is enough to
    // deflate cosine hard (its idf weight dominates), which is correct
    // TF-IDF behavior — hence the exact-copy fixture here.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "omega psi chi phi"),
      (4L, "alpha omega beta psi"),
      (5L, "filler tokens here nothing shared")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfCosinePairs(docs, threshold2X1e6 = 0L, maxTermDf = 128)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("cos2_x1e6")).toMap
    assert(out((1L, 2L)) == 1000000L, s"identical pair scored ${out.get((1L, 2L))}")
    assert(!out.contains((1L, 3L)) && !out.contains((3L, 5L)),
      "term-disjoint docs must not pair")
    // cos² is a valid squared cosine: bounded by 1e6 (Cauchy-Schwarz on
    // the integer weights)
    out.values.foreach(v => assert(v >= 0 && v <= 1000000L))
    // corpus with EXACT copies: an identical token vector gives cos² =
    // 1e6 exactly, so every (i, i+100000) pair the operator reports
    // must sit at exactly 1e6 — and at least some must appear (docs
    // whose kept-term set is nonempty). Perturbed plants are NOT
    // asserted: on the vocab-saturated corpus the df cap drops the
    // common tokens, so 3 extra kept-tail tokens deflate cosine below
    // 0.64 for most pairs (measured 1/50) — near-dup recall there is
    // the shingle detectors' job; this operator's role is
    // discriminative-term similarity.
    val base = Tables.documents(spark, dir)
    val exactPlants = base.unionByName(base.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 100000))
    val cp = TextOps.tfidfCosinePairs(exactPlants, threshold2X1e6 = 640000L,
      maxTermDf = graft.ops.Dedup.containmentSchedule(exactPlants.count()))
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("cos2_x1e6")).toMap
    val plantPairs = cp.filter { case ((a, b), _) => b == a + 100000L && a < 50L }
    assert(plantPairs.nonEmpty)
    plantPairs.foreach { case (p, v) =>
      assert(v == 1000000L, s"exact copy $p scored $v != 1e6")
    }
  }

  test("count-min: never undercounts, exact without collisions, additive merge") {
    import graft.ops.CountMin
    // corpus: 150 users over 4096 cells — collision-free, so every
    // estimate must be EXACT
    val ev = Tables.events(spark, dir)
    val out = CountMin.pointEstimates(ev, col("user_id"), topK = 10).collect()
    assert(out.length == 10)
    out.foreach(r => assert(r.getAs[Long]("overcount") == 0L,
      s"collision at 150 keys/4096 cells: $r"))
    // forced collisions: 5000 distinct keys >> 1024 cells per row — the
    // guarantee degrades to est >= exact, never below
    val many = spark.range(0, 20000).selectExpr("id % 5000 AS user_id")
    val est = CountMin.pointEstimates(many, col("user_id"), topK = 20).collect()
    est.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact"),
        s"CM undercounted: $r")
    }
    // additive merge: counters over a parity split sum cell-wise to the
    // full table
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      CountMin.counters(df, col("user_id")).collect()
        .map(r => (r.getAs[Int]("j"), r.getAs[Long]("cell")) -> r.getAs[Long]("c")).toMap
    val full = cells(ev)
    val a = cells(ev.filter(col("event_id") % 2 === 1))
    val b = cells(ev.filter(col("event_id") % 2 === 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == full)
  }

  test("ql dirichlet: matching term raises score at equal length; smoothing scores term-free docs") {
    val docs = Seq((1L, "spark xx"), (2L, "yy xx"), (3L, "yy")).toDF("doc_id", "text")
    val out = TextOps.qlDirichletTopK(docs, Seq("spark"), mu = 2000L, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("ql_x1e6")).toMap
    // every doc scores (the smoothed background mass covers docs 2 and 3)
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) > out(2L), "tf presence must beat pure background at equal dl")
    assert(out(3L) > out(2L), "shorter doc must beat longer at equal tf=0 (length normalization)")
  }
}
