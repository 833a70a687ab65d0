package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import QueriesShared._

/** LLM-pipeline: text analysis.
  *
  * One contiguous, ORDER-PRESERVING slice of the declared query
  * surface; [[Queries.registry]] concatenates the slices in the
  * original declaration order. Entries are (name -> Q) pairs exactly
  * as they appeared in the pre-split Queries.scala.
  */
private[api] object QueriesText {
  val entries: Seq[(String, Q)] = Seq(
    // ===== Extension: LLM-pipeline — text analysis =====
    "text_stats" -> Q(
      (s, d) => graft.ops.TextOps.stats(Tables.documents(s, d)).orderBy("doc_id"),
      Some(TextSql.stats)),

    "text_langid_eval" -> Q(
      (s, d) => {
        val t = graft.ops.TextOps
        // scores projected once, argmax over the references (see
        // TextOps.langIdFromScores for why this is two selects)
        Tables.documents(s, d)
          .select(col("lang") +:
            t.stopwords.map { case (l, _) => t.langScore(col("text"), l).as(s"s_$l") }: _*)
          .select(col("lang"),
            t.langIdFromScores(t.stopwords.map { case (l, _) => l -> col(s"s_$l") })
              .as("lang_pred"))
          .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
          .orderBy("lang", "lang_pred")
      },
      Some(TextSql.langidEval)),

    // In-engine model training: a 4-feature linear language probe fit
    // by full-batch gradient descent in INTEGER fixed-point — each step
    // is one map-side-combinable aggregation (order-free DECIMAL(38,0)
    // gradient sums → a 6-value driver row), so the training run is
    // bit-identical on any engine/partitioning, unlike MLlib's float
    // reductions. The output is the training curve (pre-step MSE +
    // post-step weights per iteration) — the data-quality probe
    // artifact. Truncating division throughout (Spark `div` ≡ DuckDB
    // `//` on signed operands).
    "text_linear_probe" -> Q(
      (s, d) => graft.ops.TextOps.linearProbe(Tables.documents(s, d), iters = 3)
        .orderBy("iter"),
      Some(TextSql.linearProbe(iters = 3))),

    // The eval half of the probe: score the corpus with the trained
    // weights and report the reliability table (prediction bucket →
    // volume, actual positives, mean prediction) — what decides if the
    // probe's scores can gate a curation pipeline. Trains 20 steps
    // (the curve query stops at 3 — here the scores must SPREAD before
    // bucketing means anything) through the same fit/CTE text as
    // text_linear_probe; scoring is one more scan into an 11-row agg.
    "text_probe_calibration" -> Q(
      (s, d) => graft.ops.TextOps.probeCalibration(Tables.documents(s, d), iters = 20),
      Some(TextSql.probeCalibration(iters = 20))),

    // Composed curation pipeline — what the text/dedup operators exist
    // for: language + quality gates, then exact-dedup keeping the
    // canonical (smallest) doc per fingerprint. One narrow scoring pass,
    // one shuffle on the fingerprint.
    "pipeline_curation" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("fp").orderBy("doc_id")
        graft.ops.TextOps.stats(Tables.documents(s, d))
          .filter(col("lang_pred") === "en" && col("quality") >= 7000)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "quality")
          .orderBy("doc_id")
      },
      Some(TextSql.curation(minQuality = 7000))),

    // Deterministic epoch shuffle: each doc's position comes from
    // md5(seed ‖ doc_id) — stateless, so ANY executor layout reproduces
    // the same epoch order, and changing the seed re-shuffles. At scale
    // this is the standard total-sort-on-random-key training shuffle;
    // the top-100 form here is a TakeOrdered (no global sort
    // materializes for a bounded preview).
    "pipeline_epoch_shuffle" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          substring(md5(concat(lit("epoch7:"), col("doc_id"))), 1, 15).as("rkey"))
        .orderBy("rkey", "doc_id")
        .limit(100),
      Some(
        """SELECT doc_id, substr(md5('epoch7:' || doc_id), 1, 15) AS rkey
          |FROM documents ORDER BY rkey, doc_id LIMIT 100""".stripMargin)),

    // Compression-ratio quality signal (deflate bytes / raw bytes,
    // fixed-point): the web-curation heuristic — template/boilerplate
    // text compresses far below natural prose, near-random payloads
    // barely compress. The per-row deflate runs as a native codegen'd
    // expression (DeflateSizeExpr) with a thread-reused zlib stream;
    // the aggregate is one map-side-combining scan. Rows-only: no
    // cross-engine deflate exists, so the ordering properties
    // (repetitive < natural < high-entropy) gate in OpsSpec instead.
    "text_compression_ratio" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          graft.functions.DeflateSizeExpr(col("text")).as("csz"),
          octet_length(col("text")).cast("long").as("osz"))
        .filter(col("osz") > 0)
        .withColumn("ratio_x1e6", expr("csz * 1000000 div osz"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(ratio_x1e6) div count(*)").as("mean_ratio_x1e6"),
          min("ratio_x1e6").as("min_ratio_x1e6"),
          max("ratio_x1e6").as("max_ratio_x1e6"))
        .orderBy("source"),
      None),

    // Cross-engine-gated twin of the deflate signal above (DuckDB has
    // no deflate, so text_compression_ratio is rows-only): within-doc
    // distinct/total word-trigram ratio — the same redundancy a
    // dictionary coder exploits (repeated trigrams → low distinct ratio
    // → low deflate ratio), deterministic in both engines. Same scan
    // shape as the deflate form: one per-doc scalar (pure column
    // expressions, no explode/shuffle until the final per-source
    // aggregate), integer micro-unit arithmetic. This hash-gates the
    // family's plumbing; OpsSpec gates the deflate expression itself
    // (ordering + codegen/interpreted parity).
    "text_compressibility_proxy" -> Q(
      (s, d) => {
        // O(tokens) guard: the token array and the shingle array are
        // bound as LAMBDA VARIABLES (transform over a singleton array),
        // never as projection aliases. An alias referenced several times
        // inside a lambda body gets re-inlined by CollapseProject — and
        // lambda bodies get no CSE — so the round-6 projection-alias form
        // re-ran the split per element: O(tokens²) splits per doc, 12 s
        // vs <1 s at sf0.1. A lambda variable CANNOT be re-inlined, so
        // the split provably runs once per doc; PlanSpec pins this by
        // counting `split(` occurrences in the optimizedPlan (== 1).
        // The whole per-doc ratio collapses to ONE scalar here so no
        // multi-referenced alias survives for the optimizer to inline;
        // docs with <3 tokens yield a null ratio (counted out by
        // count(uniq_x1e6) — same set as the oracle's len(shs)>0).
        val perDoc = element_at(
          transform(array(graft.ops.TextOps.tokens(col("text"))), tk =>
            element_at(
              transform(
                array(when(size(tk) >= 3,
                  transform(sequence(lit(0), size(tk) - 3),
                    i => concat_ws(" ", element_at(tk, i + 1),
                      element_at(tk, i + 2), element_at(tk, i + 3))))
                  .otherwise(array())),
                shs => graft.functions.GraftFunctions.longDiv(
                  size(array_distinct(shs)).cast("long") * lit(1000000L),
                  nullif(size(shs).cast("long"), lit(0L)))), 1)), 1)
        Tables.documents(s, d)
          .select(col("source"), perDoc.as("uniq_x1e6"))
          .groupBy("source")
          .agg(count(col("uniq_x1e6")).as("n_docs"),
            expr("sum(uniq_x1e6) div count(uniq_x1e6)").as("mean_uniq_x1e6"),
            min("uniq_x1e6").as("min_uniq_x1e6"),
            max("uniq_x1e6").as("max_uniq_x1e6"))
          .filter(col("n_docs") > 0)
          .orderBy("source")
      },
      Some(TextSql.compressibilityProxy)),

    // Exact token-budget sharding: assign docs (in a seeded-hash global
    // order) to 8 shards of ~equal TOKEN mass — the file-level shard
    // manifest distributed training reads. Unlike pack_sequences'
    // shard-LOCAL cumsum, the assignment needs a globally exact running
    // total, built scale-correctly in two phases: a per-bucket cumsum
    // (bucket = top 10 bits of the 60-bit order key, so bucket order IS
    // key order) plus a 1024-row bucket-prefix frame that broadcasts
    // back — no corpus-sized window partition anywhere; the only
    // single-partition window runs over 1024 bucket totals. The oracle
    // computes the same assignment with one flat window, gating the
    // distributed prefix-sum decomposition bit-exactly.
    "pipeline_shard_budget" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nShards = 8L
        val t = Tables.documents(s, d).select(
            col("doc_id"),
            graft.ops.TextOps.tokenCount(col("text")).cast("long").as("tok"),
            graft.functions.GraftFunctions.md5Hash60(
              concat(lit("shard1:"), col("doc_id").cast("string"))).as("key"))
          .withColumn("bucket", expr(s"key div ${1L << 50}"))
        val wb = Window.partitionBy("bucket").orderBy("key", "doc_id")
        val within = t.withColumn("cum_in", sum("tok").over(wb) - col("tok"))
        val btot = t.groupBy("bucket").agg(sum("tok").as("btok"))
        val wp = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val boff = btot
          .withColumn("off", coalesce(sum("btok").over(wp), lit(0L)))
          .withColumn("total", sum("btok").over(
            Window.partitionBy().rowsBetween(
              Window.unboundedPreceding, Window.unboundedFollowing)))
          .select("bucket", "off", "total")
        within.join(broadcast(boff), "bucket")
          .withColumn("shard",
            expr(s"(off + cum_in) div ((total + ${nShards - 1}) div $nShards)"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
          .orderBy("shard")
      },
      Some(
        s"""WITH t AS (SELECT doc_id,
           |        CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tok,
           |        ${GraphSql.md5Hash60("'shard1:' || CAST(doc_id AS VARCHAR)")} AS key
           |      FROM documents),
           |c AS (SELECT tok,
           |        sum(tok) OVER (ORDER BY key, doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cb,
           |        sum(tok) OVER () AS total
           |      FROM t)
           |SELECT CAST(COALESCE(cb, 0) // ((total + 7) // 8) AS BIGINT) AS shard,
           |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
           |FROM c GROUP BY shard ORDER BY shard""".stripMargin)),

    // Curation observability: survivor counts at each pipeline stage
    // (all → langid → quality gate → exact dedup). Stages 0-2 come from
    // ONE aggregate over the scoring pass (stack() pivots the row to
    // stage rows); only the dedup stage needs its fingerprint window.
    // Two jobs total at any corpus size.
    "pipeline_filter_funnel" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps.stats(Tables.documents(s, d))
        val flat = t.agg(
            count(lit(1)).as("n_all"),
            sum((col("lang_pred") === "en").cast("long")).as("n_lang"),
            sum((col("lang_pred") === "en" && col("quality") >= 7000)
              .cast("long")).as("n_q"))
          .selectExpr(
            "stack(3, '0_all', n_all, '1_lang_en', n_lang, '2_quality', n_q) AS (stage, n_docs)")
        val kept = t.filter(col("lang_pred") === "en" && col("quality") >= 7000)
          .withColumn("rn",
            row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("rn") === 1)
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("stage", lit("3_dedup"))
          .select("stage", "n_docs")
        flat.unionByName(kept).orderBy("stage")
      },
      Some(TextSql.curationFunnel(minQuality = 7000))),

    // Mixture-shaping quota: per predicted language keep the top-5 docs
    // by quality (tie → smallest doc_id) — the selection step after
    // scoring. One narrow scoring pass, one shuffle on lang_pred; with
    // small quotas over many groups the bounded TopKAggregator form
    // (window_topk_per_customer_agg) substitutes unchanged — ≤k rows
    // per group through the shuffle instead of a full sort window.
    "pipeline_quota_sample" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang_pred").orderBy(desc("quality"), asc("doc_id"))
        graft.ops.TextOps.stats(Tables.documents(s, d))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("lang_pred", "doc_id", "quality")
          .orderBy("lang_pred", "doc_id")
      },
      Some(TextSql.quotaSample(perLang = 5))),

    // Weight-proportional sampling without replacement — priority
    // sampling (Duffield–Lund–Thorup, JACM'07): each doc draws a
    // deterministic uniform u from the portable 60-bit md5 family and
    // gets priority u/weight; the k smallest priorities are the sample,
    // so a doc's inclusion odds scale with its weight (here n_chars —
    // sample "by token mass", the mixture a training run actually
    // consumes, not "by doc count"). All integer: pri =
    // (h+1) div w on BIGINTs — both engines floor the same quotient, and
    // (pri, doc_id) ordering resolves floor collisions deterministically,
    // so the gate is exact with no float u anywhere. Stateless like the
    // other samplers (membership is a pure function of doc_id — same
    // sample on any executor layout, reseedable via the salt), and the
    // top-k is a TakeOrdered: no corpus-wide sort, no corpus-sized
    // window — the rank window runs over the 50 selected rows only.
    "pipeline_weighted_sample" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pri = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").as("w"),
            graft.functions.GraftFunctions.md5Hash60(
              concat(lit("wsamp:"), col("doc_id").cast("string"))).as("h"))
          .withColumn("pri", expr("(h + 1) div w"))
        pri.orderBy(asc("pri"), asc("doc_id")).limit(50)
          .withColumn("rnk", row_number().over(
            Window.orderBy(asc("pri"), asc("doc_id"))).cast("long"))
          .select("rnk", "doc_id", "source", "w", "pri")
          .orderBy("rnk")
      },
      Some(
        s"""WITH p AS (SELECT doc_id, source, n_chars AS w,
           |    (${GraphSql.md5Hash60("'wsamp:' || CAST(doc_id AS VARCHAR)")} + 1)
           |      // n_chars AS pri
           |  FROM documents),
           |r AS (SELECT doc_id, source, w, pri,
           |        row_number() OVER (ORDER BY pri, doc_id) AS rnk
           |      FROM p)
           |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, source, w, pri
           |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin))

  )
}
