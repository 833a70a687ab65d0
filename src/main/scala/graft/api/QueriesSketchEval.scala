package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import QueriesShared._

/** Wave 23: replayable sketches, ranking eval, conformal calibration, LM retrieval.
  *
  * One contiguous, ORDER-PRESERVING slice of the declared query
  * surface; [[Queries.registry]] concatenates the slices in the
  * original declaration order. Entries are (name -> Q) pairs exactly
  * as they appeared in the pre-split Queries.scala.
  */
private[api] object QueriesSketchEval {
  val entries: Seq[(String, Q)] = Seq(
    // ===== Extension wave 23: replayable sketches, ranking eval, =====
    // ===== conformal calibration, LM retrieval                   =====

    // Deterministic mergeable HyperLogLog — unlike approx_count_distinct
    // (HLL++ registers not replayable in SQL; since round 11
    // agg_approx_stats uses THIS chain and hash-gates too), every bit
    // here is engine-exact, so the sketch itself
    // HASH-GATES: register index/rank from the shared md5-60 hash via
    // minimal-binary-string length (no float log2), raw estimate in
    // exact integer arithmetic off ONE shared alpha literal, and the
    // linear-counting small-range term as a floored ln (margin-audited
    // in FloatGateSpec). Exact countDistinct rides along as the
    // accuracy readout; merge across shards/batches is per-register max
    // (the streaming twin's identity). See ops/Hll.scala for the scale
    // notes.
    "agg_hll_distinct" -> Q(
      (s, d) => graft.ops.Hll.distinctSketch(
        Tables.events(s, d), "event_type", col("event_id")),
      Some(graft.ops.Hll.oracleSql)),

    // nDCG@10 of the BM25 ranking against term-overlap graded relevance
    // — the ranking-quality evaluation closing the retrieval loop
    // (rank → judge). The ideal is the TRUE corpus-wide top-k (a missed
    // relevant doc costs the ranker), taken via distributed sort-limit;
    // the position-discount vector is k precomputed ×1e9 literals
    // shared with the oracle, so the whole readout is exact BIGINT.
    "search_ndcg_eval" -> Q(
      (s, d) => graft.ops.TextOps.ndcgEval(
        Tables.documents(s, d), terms = Seq("spark", "join", "vector"), k = 10),
      Some(TextSql.searchNdcgEval(Seq("spark", "join", "vector"), k = 10))),

    // Recall@k / MRR of the BM25 list against binary term-overlap
    // relevance — the set-based IR evaluation next to search_ndcg_eval's
    // graded one; exact integer rationals, no floats beyond the ranking
    // itself.
    "search_recall_mrr" -> Q(
      (s, d) => graft.ops.TextOps.recallMrrEval(
        Tables.documents(s, d), terms = Seq("spark", "join", "vector"),
        k = 20, minRel = 2),
      Some(TextSql.searchRecallMrr(Seq("spark", "join", "vector"), k = 20, minRel = 2))),

    // Dirichlet-smoothed query likelihood (Zhai & Lafferty SIGIR'01) —
    // the language-model retrieval scorer next to BM25: every doc
    // scores on every query term (absent terms contribute the smoothed
    // background mass). Per-term floor(ln(int/int)·1e6) before the
    // integer sum — the PSI discipline, margin-audited in FloatGateSpec.
    "search_ql_dirichlet" -> Q(
      (s, d) => graft.ops.TextOps.qlDirichletTopK(
        Tables.documents(s, d), terms = Seq("spark", "join", "vector"),
        mu = 2000L, k = 20),
      Some(TextSql.searchQlDirichlet(Seq("spark", "join", "vector"),
        mu = 2000L, k = 20))),

    // Split-conformal calibration (Vovk et al.; the distribution-free
    // coverage machinery behind selective curation): a deterministic
    // 20% hash split calibrates the n_chars score, the threshold is the
    // ceil((n+1)(1−α))-th smallest calibration score — an EXPLICIT rank
    // selected via Stats.bucketedRank (two-phase, no corpus-sized
    // SinglePartition window), all arithmetic exact integers — and the
    // held-out coverage ×1e6 rides along per alpha.
    "stats_conformal_threshold" -> Q(
      (s, d) => {
        import s.implicits._
        val md5 = graft.functions.GraftFunctions.md5Hash60 _
        val docs = Tables.documents(s, d)
        val cal = docs.filter(pmod(md5(col("doc_id")), lit(5L)) === 0)
          .select(col("doc_id"), col("n_chars").cast("long").as("score"))
        val test = docs.filter(pmod(md5(col("doc_id")), lit(5L)) =!= 0)
          .select(col("n_chars").cast("long").as("score"))
        val ranked = graft.ops.Stats.bucketedRank(cal, "score", "doc_id", 256L)
        val nCal = cal.agg(count(lit(1)).as("n_cal"))
        val thr = Seq(10L, 5L, 1L).toDF("alpha_pct")
          .crossJoin(broadcast(nCal))
          .withColumn("cal_rank",
            expr("((n_cal + 1) * (100 - alpha_pct) + 99) div 100"))
          // keyed join, 3-row probe side — the CALIBRATION frame scales
          // with the corpus, so it must never be the broadcast side.
          // rank > n_cal (alpha too small for the calibration size)
          // means the conformal set is the whole space: threshold = +inf,
          // encoded as Long.MaxValue so both engines stay integer
          // (a NULL would also go float64 through the pandas compare)
          .join(ranked.select(col("rank").as("cal_rank"),
            col("score").as("threshold")), Seq("cal_rank"), "left")
          .withColumn("threshold",
            coalesce(col("threshold"), lit(Long.MaxValue)))
        val nTest = test.agg(count(lit(1)).as("n_test"))
        val cov = test
          .crossJoin(broadcast(thr.select("alpha_pct", "threshold")))
          .groupBy("alpha_pct")
          .agg(sum(when(col("score") <= col("threshold"), 1L).otherwise(0L))
            .as("n_cov"))
        thr.join(cov, "alpha_pct").crossJoin(broadcast(nTest))
          .select(col("alpha_pct").cast("long").as("alpha_pct"),
            col("n_cal").cast("long").as("n_cal"),
            col("cal_rank").cast("long").as("cal_rank"),
            col("threshold").cast("long").as("threshold"),
            col("n_test").cast("long").as("n_test"),
            expr("n_cov * 1000000L div n_test").cast("long").as("coverage_x1e6"))
          .orderBy("alpha_pct")
      },
      Some(
        s"""WITH cal AS (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS score FROM documents
           |  WHERE ${GraphSql.md5Hash60("CAST(doc_id AS VARCHAR)")} % 5 = 0),
           |tst AS (
           |  SELECT CAST(n_chars AS BIGINT) AS score FROM documents
           |  WHERE ${GraphSql.md5Hash60("CAST(doc_id AS VARCHAR)")} % 5 <> 0),
           |rk AS (SELECT score,
           |    row_number() OVER (ORDER BY score, doc_id) AS cal_rank FROM cal),
           |nc AS (SELECT count(*) AS n_cal FROM cal),
           |nt AS (SELECT count(*) AS n_test FROM tst),
           |a AS (SELECT unnest([10, 5, 1]) AS alpha_pct),
           |th AS (
           |  SELECT alpha_pct, n_cal,
           |    ((n_cal + 1) * (100 - alpha_pct) + 99) // 100 AS cal_rank
           |  FROM a CROSS JOIN nc),
           |j AS (SELECT th.alpha_pct, th.n_cal, th.cal_rank,
           |        coalesce(rk.score, 9223372036854775807) AS threshold
           |      FROM th LEFT JOIN rk ON rk.cal_rank = th.cal_rank),
           |cov AS (
           |  SELECT j.alpha_pct,
           |    sum(CASE WHEN t.score <= j.threshold THEN 1 ELSE 0 END) AS n_cov
           |  FROM j CROSS JOIN tst t GROUP BY 1)
           |SELECT CAST(j.alpha_pct AS BIGINT) AS alpha_pct,
           |  CAST(n_cal AS BIGINT) AS n_cal, CAST(cal_rank AS BIGINT) AS cal_rank,
           |  threshold, CAST(n_test AS BIGINT) AS n_test,
           |  CAST(n_cov * 1000000 // n_test AS BIGINT) AS coverage_x1e6
           |FROM j JOIN cov ON cov.alpha_pct = j.alpha_pct CROSS JOIN nt
           |ORDER BY alpha_pct""".stripMargin)),

    // Sparse TF-IDF cosine similarity pairs — the LEXICAL sibling of
    // the embedding-cosine detectors: inverted-index candidates (only
    // docs sharing a kept term pair; stop-term df cap at the corpus
    // schedule, replayed by the oracle), exact-integer cosine² verify
    // (floored ×1e3 weights — margins in FloatGateSpec — then
    // DECIMAL(38,0) dot/norm sums; cos²·1e6 is a rational, no float
    // sqrt). Role: discriminative-term similar-pair discovery, NOT
    // near-dup recall — on the vocab-saturated corpus the df cap drops
    // the common tokens, so tail-perturbed plants mostly fall below
    // the threshold (measured 1/50; the shingle detectors own that
    // signal), while exact-vector pairs score exactly 1e6 (Wave23Spec).
    // BIGINT/DECIMAL headroom: num² ≤ ‖a‖²·‖b‖² < 10³⁸ up to ~10¹⁶
    // weight-mass per doc (tf·ln ≈ 3·10⁸ per term) — the
    // temperature_mix DECIMAL wall, far past any real document.
    "sim_tfidf_sparse" -> Q(
      (s, d) => {
        val p = plantedDocs(s, d, exact = false)
        graft.ops.TextOps.tfidfCosinePairs(p, threshold2X1e6 = 640000L,
          maxTermDf = graft.ops.Dedup.containmentSchedule(p.count()))
      },
      Some(TextSql.simTfidfSparse())),

    // Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
    // ADDITIVE mergeable sketch completing the shelf next to the
    // replayable HLL (max-merge) and Misra-Gries (counter-merge):
    // per-cell sums, never-undercount point estimates, and — like the
    // HLL — every bit engine-replayable (md5("j:key") row hashes), so
    // the 4×1024 counter table itself hash-gates against DuckDB. One
    // map-side-combined aggregation into 4096 cells; probes are k·D
    // rows. See ops/CountMin.scala.
    "agg_countmin_users" -> Q(
      (s, d) => graft.ops.CountMin.pointEstimates(
        Tables.events(s, d), col("user_id"), topK = 10),
      Some(graft.ops.CountMin.oracleSql(topK = 10))),

    // t-closeness (Li et al., ICDE'07) — the distributional member of
    // the privacy battery next to privacy_k_anonymity's k/l counts: per
    // quasi-identifier group (nation, segment), the total-variation
    // distance between the group's sensitive-value (acctbal band)
    // distribution and the GLOBAL band distribution, as an exact
    // rational ×1e6 (TVD = Σ|c_gv·N − c_v·N_g| over 2·N_g·N — the
    // stats_psi_sources tvd discipline, DECIMAL(38,0) products). A
    // group whose band mix mirrors the corpus leaks nothing even at
    // small k; one at t > 0.3 reveals its members' balance band. One
    // corpus groupBy to the (group × 3-band) frame; the global band
    // frame broadcasts.
    "privacy_t_closeness" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val band = when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 4500, "mid").otherwise("high")
        val cust = Tables.customer(s, d)
          .select(col("c_nationkey").cast("long").as("nation"),
            col("c_mktsegment").as("segment"), band.as("band"))
        val cell = cust.groupBy("nation", "segment", "band")
          .agg(count(lit(1)).as("cgv"))
        val grp = cust.groupBy("nation", "segment").agg(count(lit(1)).as("ng"))
        val glob = cust.groupBy("band").agg(count(lit(1)).as("cv"))
        val n = cust.agg(count(lit(1)).as("nn"))
        grp.crossJoin(broadcast(glob)).crossJoin(broadcast(n))
          .join(cell, Seq("nation", "segment", "band"), "left")
          .withColumn("cgv", coalesce(col("cgv"), lit(0L)))
          .withColumn("num", abs(dec(col("cgv")) * dec(col("nn")) -
            dec(col("cv")) * dec(col("ng"))))
          .groupBy("nation", "segment")
          .agg(max("ng").cast("long").as("n"),
            expr("CAST(sum(num) * 1000000 div (2 * CAST(max(ng) AS DECIMAL(38,0)) * max(nn)) AS BIGINT)")
              .as("tvd_x1e6"))
          .withColumn("t_risk", when(col("tvd_x1e6") > 300000L, 1L).otherwise(0L))
          .orderBy("nation", "segment")
      },
      Some(
        """WITH cust AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
          |    c_mktsegment AS segment,
          |    CASE WHEN c_acctbal < 0 THEN 'neg'
          |         WHEN c_acctbal < 4500 THEN 'mid' ELSE 'high' END AS band
          |  FROM customer),
          |cell AS (SELECT nation, segment, band, count(*) AS cgv
          |         FROM cust GROUP BY 1, 2, 3),
          |grp AS (SELECT nation, segment, count(*) AS ng FROM cust GROUP BY 1, 2),
          |gband AS (SELECT band, count(*) AS cv FROM cust GROUP BY 1),
          |n AS (SELECT count(*) AS nn FROM cust),
          |t AS (SELECT g.nation, g.segment, g.ng, n.nn,
          |    abs(CAST(coalesce(c.cgv, 0) AS HUGEINT) * n.nn
          |        - CAST(gl.cv AS HUGEINT) * g.ng) AS num
          |  FROM grp g CROSS JOIN gband gl CROSS JOIN n
          |  LEFT JOIN cell c ON c.nation = g.nation AND c.segment = g.segment
          |    AND c.band = gl.band)
          |SELECT nation, segment, CAST(max(ng) AS BIGINT) AS n,
          |  CAST(sum(num) * 1000000 // (2 * CAST(max(ng) AS HUGEINT) * max(nn))
          |    AS BIGINT) AS tvd_x1e6,
          |  CASE WHEN sum(num) * 1000000
          |         // (2 * CAST(max(ng) AS HUGEINT) * max(nn)) > 300000
          |    THEN 1 ELSE 0 END AS t_risk
          |FROM t GROUP BY 1, 2 ORDER BY nation, segment""".stripMargin)),

    // Leave-one-source-out data valuation: the cheapest member of the
    // influence family — for each source, how the corpus-level length
    // and quality-proxy means move when that source is removed, purely
    // algebraic from per-source totals (LOO mean = (T − T_s)/(N − N_s)
    // — NO second corpus pass, no per-source re-aggregation; the whole
    // readout derives from ONE groupBy). Exact integers: means ×100
    // by integral division, deltas in the same fixed-point. The screen
    // a curation pass runs before dropping or upweighting a source.
    "stats_loo_source_impact" -> Q(
      (s, d) => {
        val per = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("ns"), sum("n_chars").as("ts"))
        val tot = per.agg(sum("ns").as("n"), sum("ts").as("t"))
        per.crossJoin(broadcast(tot))
          .withColumn("mean_all_x100", expr("t * 100 div n"))
          .withColumn("mean_loo_x100",
            expr("(t - ts) * 100 div (n - ns)"))
          .select(col("source"), col("ns").cast("long").as("n_docs"),
            col("mean_all_x100").cast("long").as("mean_all_x100"),
            col("mean_loo_x100").cast("long").as("mean_loo_x100"),
            (col("mean_loo_x100") - col("mean_all_x100")).cast("long")
              .as("loo_delta_x100"))
          .orderBy("source")
      },
      Some(
        """WITH per AS (SELECT source, count(*) AS ns,
          |    CAST(sum(n_chars) AS BIGINT) AS ts
          |  FROM documents GROUP BY 1),
          |tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n,
          |    CAST(sum(ts) AS BIGINT) AS t FROM per)
          |SELECT source, CAST(ns AS BIGINT) AS n_docs,
          |  CAST(t * 100 // n AS BIGINT) AS mean_all_x100,
          |  CAST((t - ts) * 100 // (n - ns) AS BIGINT) AS mean_loo_x100,
          |  CAST((t - ts) * 100 // (n - ns) - t * 100 // n AS BIGINT)
          |    AS loo_delta_x100
          |FROM per CROSS JOIN tot ORDER BY source""".stripMargin))
  )
}
