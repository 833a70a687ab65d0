package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import QueriesShared._

/** LLM-pipeline: similarity search / embeddings.
  *
  * One contiguous, ORDER-PRESERVING slice of the declared query
  * surface; [[Queries.registry]] concatenates the slices in the
  * original declaration order. Entries are (name -> Q) pairs exactly
  * as they appeared in the pre-split Queries.scala.
  */
private[api] object QueriesSimilarity {
  val entries: Seq[(String, Q)] = Seq(
    // ===== Extension: LLM-pipeline — similarity search =====
    "sim_cosine_topk" -> Q(
      (s, d) => graft.ops.Similarity.bruteForceTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simCosineTopk)),

    "text_token_estimate" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextOps.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_words"))
        .withColumn("pieces_per_word_pct",
          floor(col("n_bpe") * 100.0 / greatest(col("n_words"), lit(1L))).cast("long"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id, n_bpe, n_words,
          |  CAST(floor(n_bpe * 100.0 / greatest(n_words, 1)) AS BIGINT) AS pieces_per_word_pct
          |FROM (SELECT doc_id,
          |        CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
          |        CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin)),

    "text_rolling_fingerprint" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextOps.rollingHash(col("text")).as("rh"))
        .orderBy("doc_id"),
      Some(
        """SELECT doc_id,
          |  list_reduce(
          |    list_prepend(CAST(0 AS BIGINT),
          |      list_transform(
          |        string_split(regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^\x00-\x7f]', '?', 'g'), ''),
          |        c -> CAST(unicode(c) AS BIGINT))),
          |    (a, b) -> (a * 31 + b) % 1099511627776) AS rh
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // BM25 keyword retrieval over the documents corpus — tf shuffle is
    // filtered to the query terms BEFORE aggregation, df and corpus
    // stats broadcast, per-term scores summed in fixed term order (see
    // TextOps.bm25TopK for the scale/determinism notes).
    "text_bm25_topk" -> Q(
      (s, d) => graft.ops.TextOps.bm25TopK(
          Tables.documents(s, d), terms = Seq("spark", "join", "vector"), k = 20)
        .orderBy(desc("bm25"), asc("doc_id")),
      Some(TextSql.bm25Topk(Seq("spark", "join", "vector"), k = 20))),

    // Top-3 TF-IDF terms per doc (df over the FULL corpus, ranked within
    // a target doc slice).
    "text_tfidf_topterms" -> Q(
      (s, d) => graft.ops.TextOps.tfidfTopTerms(
          Tables.documents(s, d), maxDocId = 30L, perDoc = 3)
        .orderBy("doc_id", "rnk"),
      Some(TextSql.tfidfTopTerms(maxDocId = 30, perDoc = 3))),

    // Intra-document repetition: duplicate 3-gram ratio in basis points
    // — the "looping/boilerplate text" quality signal (high ratio =
    // degenerate text). One codegen'd projection per doc, no shuffle
    // before the presentation sort.
    "text_repetition" -> Q(
      (s, d) => {
        val t = graft.ops.TextOps
        val grams = Tables.documents(s, d).select(col("doc_id"),
          t.tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            when(size(col("toks")) >= 3,
              transform(sequence(lit(0), size(col("toks")) - 3),
                i => concat_ws(" ", col("toks")(i), col("toks")(i + 1), col("toks")(i + 2))))
              .otherwise(array()).as("g"))
        grams.select(col("doc_id"),
            size(col("g")).cast("long").as("n_grams"),
            size(array_distinct(col("g"))).cast("long").as("n_distinct"))
          .withColumn("dup_pct_bp",
            floor((col("n_grams") - col("n_distinct")) * lit(10000.0) /
              greatest(col("n_grams"), lit(1L))).cast("long"))
          .orderBy("doc_id")
      },
      Some(TextSql.repetition)),

    // PII audit + redaction: detect emails / IPs / phone numbers and
    // fingerprint the redacted text. The synthetic corpus carries no
    // PII, so docs with doc_id < 25 get a deterministic PII tail
    // planted (same construction in the oracle) — the detector must
    // count exactly those and the clean docs must pass through with
    // fingerprints unchanged by redaction. Pure codegen'd regex
    // projection: one scan, no shuffle before the presentation sort.
    "text_pii_scrub" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select("doc_id", "text")
        val planted = base.filter(col("doc_id") < 25).select(
          (col("doc_id") + 200000).as("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com or +1 555-123-4567 host 10.0."),
            col("doc_id") % 256, lit(".1")).as("text"))
        graft.ops.TextOps.piiScrub(base.unionByName(planted))
          .orderBy("doc_id")
      },
      Some(TextSql.piiScrub(plantMax = 25))),

    // Source-mixture weights: per-language keep probability that
    // equalizes the mixture to the rarest language (the "how much do I
    // downsample each stratum" companion to sample_stratified). Pure
    // arithmetic on a 5-row aggregate — the global window runs on the
    // aggregated frame, never the corpus.
    "pipeline_mix_weights" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .groupBy("lang").agg(count(lit(1)).as("n"))
          .withColumn("keep_pct",
            floor(min("n").over(Window.partitionBy()) * lit(10000.0) / col("n"))
              .cast("long"))
          .orderBy("lang")
      },
      Some(TextSql.mixWeights)),

    // Temperature-scaled source mixing (τ = 0.5, the multilingual-LM
    // rebalancing standard): sampling weight w_i ∝ n_tokens_i^τ —
    // up-weights small sources relative to proportional sampling
    // without flattening to uniform. τ = 0.5 makes the power a sqrt,
    // which IEEE requires correctly rounded, so both engines compute
    // bit-identical s_i; each s_i is floored to fixed-point BEFORE
    // totalling so the denominator is an order-free integer sum (a
    // double Σ√n would depend on aggregation order), and the final
    // ratio is exact DECIMAL(38,0) integral division (Long would
    // overflow at ~10¹³ source tokens). One scan + a |sources|-row
    // aggregate.
    // Epoch repeat-upsampling plan ("repeat good data" multi-epoch
    // scheduling): each source earns a repeat factor from its mean
    // quality (≥8000→4, ≥7000→3, ≥6000→2, else 1 — high-quality
    // sources are seen in more epochs), and the output is the
    // per-epoch (sources, tokens, cumulative tokens) training plan.
    // One corpus scan aggregates to a |sources|-row frame; the epoch
    // explosion and the running total run on that tiny frame only.
    "pipeline_epoch_plan" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps
        val src = Tables.documents(s, d)
          .select(col("source"),
            t.tokenCount(col("text")).cast("long").as("tok"),
            t.qualityScore(col("text")).as("qual"))
          .groupBy("source")
          .agg(sum("tok").as("n_tokens"),
            expr("sum(qual) div count(*)").as("mq"))
          .withColumn("rep",
            when(col("mq") >= 8000, 4L).when(col("mq") >= 7000, 3L)
              .when(col("mq") >= 6000, 2L).otherwise(1L))
        src.select(col("n_tokens"),
            explode(sequence(lit(1L), col("rep"))).as("epoch"))
          .groupBy("epoch")
          .agg(count(lit(1)).as("n_sources"), sum("n_tokens").as("epoch_tokens"))
          .withColumn("cum_tokens", sum("epoch_tokens").over(Window.orderBy("epoch")))
          .orderBy("epoch")
      },
      Some(TextSql.epochPlan)),

    "pipeline_temperature_mix" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .groupBy("source")
          .agg(sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
          .withColumn("s_i",
            floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
          .withColumn("total", sum("s_i").over(Window.partitionBy()))
          .withColumn("w_x1e6", expr(
            "CAST((CAST(s_i AS DECIMAL(38,0)) * 1000000) div CAST(total AS DECIMAL(38,0)) AS BIGINT)"))
          .select("source", "n_tokens", "w_x1e6")
          .orderBy("source")
      },
      Some(TextSql.temperatureMix)),

    // Deterministic stratified train/val/test split (90/5/5 by a seeded
    // 60-bit md5 of doc_id) with per-source doc AND token accounting —
    // the split manifest a training run records. Membership is a pure
    // per-row hash (layout-invariant, reseedable via the salt, same
    // discipline as the sampling family); one aggregate, no shuffle
    // beyond the groupBy. The token sums audit that stratification
    // holds by mass, not just by count.
    "pipeline_split_assign" -> Q(
      (s, d) => Tables.documents(s, d)
        .withColumn("h", pmod(graft.functions.GraftFunctions.md5Hash60(
          concat(lit("split1:"), col("doc_id").cast("string"))), lit(100L)))
        .withColumn("split",
          when(col("h") < 90, "train").when(col("h") < 95, "val")
            .otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
            .as("n_tokens"))
        .orderBy("source", "split"),
      Some(
        s"""SELECT source, split, count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
           |FROM (SELECT source,
           |        CASE WHEN h < 90 THEN 'train'
           |             WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
           |        n_tok
           |      FROM (SELECT source,
           |              ${GraphSql.md5Hash60("'split1:' || CAST(doc_id AS VARCHAR)")} % 100 AS h,
           |              CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
           |            FROM documents))
           |GROUP BY source, split ORDER BY source, split""".stripMargin)),

    // Curriculum schedule: per-source quality quartiles → 4 training
    // stages (easy→hard ordering is the curriculum-learning standard;
    // per-SOURCE boundaries because quality distributions differ by
    // source, and because that keeps the rank-selection windows
    // partitioned). Boundaries are EXACT integer rank selection at
    // ceil(n·k/4) — the winsorize discipline: an actual data value via
    // integer arithmetic, never an interpolated percentile (which the
    // two engines round differently). Output is the per-(source, stage)
    // doc/token manifest a staged training run consumes. At 100 TB the
    // per-source sort window is the cost; the winsorize_fast KLL-sketch
    // path is the documented swap (same thresholds-within-rank-tolerance
    // contract), with stage ASSIGNMENT unchanged — a broadcast join
    // against a |sources|·3 boundary frame.
    "pipeline_curriculum" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = graft.ops.TextOps
        val q = Tables.documents(s, d).select(col("source"), col("doc_id"),
          t.tokenCount(col("text")).cast("long").as("tok"),
          t.qualityScore(col("text")).as("qual"))
        val ranked = q
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy("qual", "doc_id")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
        val thr = ranked.groupBy("source").agg(
          min(when(col("rn") === expr("(n + 3) div 4"), col("qual"))).as("q1"),
          min(when(col("rn") === expr("(n * 2 + 3) div 4"), col("qual"))).as("q2"),
          min(when(col("rn") === expr("(n * 3 + 3) div 4"), col("qual"))).as("q3"))
        q.join(broadcast(thr), "source")
          .withColumn("stage",
            when(col("qual") <= col("q1"), 0L).when(col("qual") <= col("q2"), 1L)
              .when(col("qual") <= col("q3"), 2L).otherwise(3L))
          .groupBy("source", "stage")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
            min("qual").as("min_q"), max("qual").as("max_q"))
          .orderBy("source", "stage")
      },
      Some(TextSql.curriculum())),

    // Decontamination: flag corpus docs sharing any 4-gram shingle with
    // the benchmark set (here: doc_id < 10 stands in for an eval set).
    // The benchmark shingle set is tiny → broadcast; the probe join is
    // keyed on the shingle, so cost is one corpus scan + a map-side
    // hash probe — no shuffle of the corpus at all.
    "pipeline_decontaminate" -> Q(
      (s, d) => {
        val sh = graft.ops.Dedup.shingleRows(Tables.documents(s, d), n = 4)
        val bench = sh.filter(col("doc_id") < 10).select("sh").distinct()
        sh.filter(col("doc_id") >= 10)
          .join(broadcast(bench), "sh")
          .select("doc_id").distinct()
          .orderBy("doc_id")
      },
      Some(TextSql.decontaminate(n = 4, benchMax = 10))),

    // Fuzzy decontamination: the near-dup complement of the exact probe
    // above — MinHash band collisions between corpus and benchmark catch
    // paraphrased/perturbed contamination exact 4-gram overlap misses
    // (the planted 'paraphrased tail' copies of the benchmark docs MUST
    // surface here and do not in the exact probe's planted-free form).
    // The benchmark band frame broadcasts; the per-corpus-doc verdict
    // (n_bench_hits, first_bench) is what a curation run routes on.
    "pipeline_decontaminate_fuzzy" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 10)
          .withColumn("doc_id", col("doc_id") + 300000)
          .withColumn("text", concat(col("text"), lit(" paraphrased tail")))
        val corpus = base.filter(col("doc_id") >= 10).unionByName(plants)
        val bench = base.filter(col("doc_id") < 10)
        graft.ops.Dedup.contaminatedDocs(corpus, bench)
          .orderBy("corpus_id")
      },
      Some(TextSql.decontaminateFuzzy)),

    // Deterministic sequence packing: assign docs to fixed token-budget
    // training sequences by greedy cumulative fill. The cumsum window
    // partitions by (lang, shard) — shard is a stateless hash of the
    // doc id — so no partition is ever corpus-sized and the pack is
    // reproducible on any executor layout (a single global cumsum would
    // serialize the corpus through one reducer). Docs straddling a
    // boundary belong to the sequence their PREVIOUS cumulative total
    // falls in (start-offset packing).
    "pipeline_pack_sequences" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 4096L
        val docs = Tables.documents(s, d).select(
          col("lang"), col("doc_id"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          pmod(graft.functions.GraftFunctions.md5Hash60(
            concat(lit("pack:"), col("doc_id").cast("string"))), lit(8L)).as("shard"))
        val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        docs.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id",
            floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
          .groupBy("lang", "shard", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
          .orderBy("lang", "shard", "seq_id")
      },
      Some(TextSql.packSequences(budget = 4096, shards = 8))),

    // Packing-efficiency readout: fill-rate histogram of the packed
    // sequences (bucket = floor(seq_tokens·10/budget); bucket 10+ =
    // overfilled packs, whose last doc straddles the budget). Derives
    // from the same shard-local cumsum as pipeline_pack_sequences —
    // the histogram adds one tiny aggregate.
    "pipeline_pack_efficiency" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 4096L
        val docs = Tables.documents(s, d).select(
          col("lang"), col("doc_id"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          pmod(graft.functions.GraftFunctions.md5Hash60(
            concat(lit("pack:"), col("doc_id").cast("string"))), lit(8L)).as("shard"))
        val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
        docs.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id",
            floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
          .groupBy("lang", "shard", "seq_id")
          .agg(sum("n_tokens").as("seq_tokens"))
          .withColumn("fill_bucket",
            floor(col("seq_tokens") * 10 / budget).cast("long"))
          .groupBy("fill_bucket")
          .agg(count(lit(1)).as("n_seqs"),
            floor(sum("seq_tokens").cast("double") / count(lit(1))).cast("long")
              .as("mean_tokens"))
          .orderBy("fill_bucket")
      },
      Some(
        s"""WITH d AS (
           |  SELECT lang, doc_id,
           |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
           |    ${GraphSql.md5Hash60("'pack:' || CAST(doc_id AS VARCHAR)")} % 8 AS shard
           |  FROM documents),
           |c AS (
           |  SELECT lang, shard, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM d),
           |p AS (
           |  SELECT lang, shard,
           |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS seq_id,
           |    CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
           |  FROM c GROUP BY lang, shard, seq_id)
           |SELECT CAST(floor(seq_tokens * 10 / 4096) AS BIGINT) AS fill_bucket,
           |  count(*) AS n_seqs,
           |  CAST(floor(CAST(sum(seq_tokens) AS DOUBLE) / count(*)) AS BIGINT) AS mean_tokens
           |FROM p GROUP BY fill_bucket ORDER BY fill_bucket""".stripMargin)),

    // Token-length histogram per language in power-of-two buckets — the
    // packing/truncation planning input (which budget wastes how much).
    // Bucket boundaries are integer COMPARES (no float log2, whose
    // engine-specific ulp at exact powers of two would flip boundary
    // docs); one map-side-combining aggregate plus a |langs×buckets|
    // window for the share.
    "pipeline_length_histogram" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n"))
        .withColumn("bucket",
          when(col("n") < 16, 0L).when(col("n") < 32, 16L)
            .when(col("n") < 64, 32L).when(col("n") < 128, 64L)
            .when(col("n") < 256, 128L).when(col("n") < 512, 256L)
            .otherwise(512L))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("tokens"))
        .withColumn("share_x1e6",
          expr("n_docs * 1000000 div sum(n_docs) OVER (PARTITION BY lang)"))
        .orderBy("lang", "bucket"),
      Some(
        """WITH d AS (
          |  SELECT lang,
          |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
          |  FROM documents),
          |b AS (
          |  SELECT lang,
          |    CASE WHEN n < 16 THEN 0 WHEN n < 32 THEN 16 WHEN n < 64 THEN 32
          |         WHEN n < 128 THEN 64 WHEN n < 256 THEN 128
          |         WHEN n < 512 THEN 256 ELSE 512 END AS bucket,
          |    n
          |  FROM d),
          |g AS (
          |  SELECT lang, CAST(bucket AS BIGINT) AS bucket,
          |    count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tokens
          |  FROM b GROUP BY 1, 2)
          |SELECT lang, bucket, n_docs, tokens,
          |  CAST(n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
          |    AS share_x1e6
          |FROM g ORDER BY lang, bucket""".stripMargin)),

    // Per-language document-length percentiles (exact interpolated
    // percentiles — the corpus-QA readout before choosing truncation /
    // packing lengths). Same cross-engine percentile↔quantile_cont
    // pairing as percentile_order_value.
    "text_length_percentiles" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .groupBy("lang")
        .agg(
          expr("percentile(n_tokens, 0.25)").as("p25"),
          expr("percentile(n_tokens, 0.5)").as("p50"),
          expr("percentile(n_tokens, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("lang"),
      Some(TextSql.lengthPercentiles)),

    // Corpus vocabulary profile: vocabulary size, hapax count (terms in
    // exactly one doc), hottest document frequency — the one-row corpus
    // health readout. One (doc, term) distinct + one term agg, both
    // partial-agg'd.
    "text_vocab_stats" -> Q(
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("df"))
        tf.agg(
          count(lit(1)).as("vocab"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("hapax"),
          max("df").as("max_df"))
      },
      Some(TextSql.vocabStats)),

    // Stopword-coverage readout: what fraction of all corpus tokens the
    // top-k document-frequency terms account for (the payoff curve of a
    // stopword list). One token scan into a term aggregate; the top-k
    // and the totals both derive from it.
    "text_stopword_coverage" -> Q(
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("tf"))
        val top = tf.orderBy(desc("tf"), asc("w")).limit(15)
          .agg(sum("tf").as("top_tf"), count(lit(1)).as("k"))
        val tot = tf.agg(sum("tf").as("total_tf"))
        top.crossJoin(broadcast(tot))
          .select(col("k"),
            col("top_tf"), col("total_tf"),
            floor(col("top_tf") * lit(1000000L) / col("total_tf")).cast("long")
              .as("coverage_x1e6"))
      },
      Some(
        """WITH tf AS (
          |  SELECT w, count(*) AS tf FROM (
          |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |    FROM documents)
          |  WHERE w <> '' GROUP BY w),
          |top AS (SELECT CAST(sum(tf) AS BIGINT) AS top_tf, count(*) AS k FROM (
          |          SELECT tf FROM tf ORDER BY tf DESC, w LIMIT 15)),
          |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total_tf FROM tf)
          |SELECT k, top_tf, total_tf,
          |  CAST(floor(top_tf * 1000000 / total_tf) AS BIGINT) AS coverage_x1e6
          |FROM top CROSS JOIN tot""".stripMargin)),

    // Heaps-law vocabulary growth: new terms and cumulative vocabulary
    // per log2 doc-id bucket, via each term's FIRST document — one
    // aggregate on the term key (min doc_id), then a ~log(n)-row
    // histogram + running sum. The naive form (distinct-count per
    // growing prefix) rescans the corpus once per point; the
    // first-occurrence trick gets the whole curve from one scan + one
    // term-keyed shuffle, at any corpus size. Buckets are log-spaced
    // because vocabulary growth concentrates early (the synthetic
    // corpus saturates its fixed token set within the first docs —
    // linear deciles collapse to one row); the bucket index is the
    // BINARY-STRING length of first_doc+1, exact integer semantics in
    // both engines (no float log2 at power-of-two boundaries).
    "text_vocab_growth" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(min("doc_id").as("first_doc"))
          .withColumn("log2_bucket",
            (length(bin(col("first_doc") + 1)) - 1).cast("long"))
          .groupBy("log2_bucket").agg(count(lit(1)).as("new_terms"))
          .withColumn("cum_vocab",
            sum("new_terms").over(Window.orderBy("log2_bucket")
              .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
          .orderBy("log2_bucket")
      },
      Some(
        """WITH fd AS (
          |  SELECT w, min(doc_id) AS first_doc FROM (
          |    SELECT DISTINCT doc_id, w FROM (
          |      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |      FROM documents)
          |    WHERE w <> '') GROUP BY w),
          |h AS (SELECT CAST(length(bin(first_doc + 1)) - 1 AS BIGINT) AS log2_bucket,
          |        count(*) AS new_terms
          |      FROM fd GROUP BY 1)
          |SELECT log2_bucket, new_terms,
          |  CAST(sum(new_terms) OVER (ORDER BY log2_bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
          |FROM h ORDER BY log2_bucket""".stripMargin)),

    // Source-drift observability: each source's most over-represented
    // term vs the corpus (frequency ratio in exact fixed-point integer
    // arithmetic — floor(tf_s·total_c·10⁶ / (total_s·tf_c))). ONE
    // (source, term) shuffle produces the base aggregate; the source
    // totals, corpus dfs and corpus total all derive from it by further
    // (small) aggregation, so the corpus is scanned exactly once. Terms
    // with corpus tf < 5 are dropped (hapax ratios are noise).
    "text_source_divergence" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bySrc = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w").agg(count(lit(1)).as("tf_s"))
        val srcTot = bySrc.groupBy("source").agg(sum("tf_s").as("total_s"))
        val byCorp = bySrc.groupBy("w").agg(sum("tf_s").as("tf_c"))
          .filter(col("tf_c") >= 5)
        val corpTot = srcTot.agg(sum("total_s").as("total_c"))
        bySrc.join(byCorp, "w").join(srcTot, "source")
          .crossJoin(broadcast(corpTot))
          .withColumn("ratio_x1e6",
            floor(col("tf_s") * col("total_c") * lit(1000000L) /
              (col("total_s") * col("tf_c"))).cast("long"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source").orderBy(desc("ratio_x1e6"), asc("w"))))
          .filter(col("rn") === 1)
          .select(col("source"), col("w").as("top_term"), col("ratio_x1e6"))
          .orderBy("source")
      },
      Some(
        """WITH tok AS (
          |  SELECT source, w FROM (
          |    SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
          |    FROM documents)
          |  WHERE w <> ''),
          |by_src AS (SELECT source, w, count(*) AS tf_s FROM tok GROUP BY 1, 2),
          |src_tot AS (SELECT source, CAST(sum(tf_s) AS BIGINT) AS total_s
          |            FROM by_src GROUP BY 1),
          |by_corp AS (SELECT w, CAST(sum(tf_s) AS BIGINT) AS tf_c
          |            FROM by_src GROUP BY 1 HAVING sum(tf_s) >= 5),
          |corp_tot AS (SELECT CAST(sum(total_s) AS BIGINT) AS total_c FROM src_tot),
          |scored AS (
          |  SELECT b.source, b.w,
          |    CAST(floor(b.tf_s * t.total_c * 1000000 / (s.total_s * c.tf_c)) AS BIGINT) AS ratio_x1e6
          |  FROM by_src b
          |  JOIN by_corp c ON c.w = b.w
          |  JOIN src_tot s ON s.source = b.source
          |  CROSS JOIN corp_tot t),
          |r AS (SELECT source, w, ratio_x1e6,
          |        row_number() OVER (PARTITION BY source
          |          ORDER BY ratio_x1e6 DESC, w) AS rn
          |      FROM scored)
          |SELECT source, w AS top_term, ratio_x1e6 FROM r WHERE rn = 1
          |ORDER BY source""".stripMargin)),

    // Highest-document-frequency terms (stopword discovery).
    "text_top_df_terms" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), asc("w")).limit(15),
      Some(TextSql.topDfTerms(15))),

    // Training-prep chunking: fixed token windows (size 32, stride 24,
    // i.e. 8-token overlap) per document — the context-window slicing a
    // pretokenization pipeline runs before packing. (Window sized to the
    // 10–100-token synthetic docs so multi-chunk splitting is actually
    // exercised; a production corpus would use 1024/768 — the plan is
    // size-independent.) Only the token COUNT enters the plan (window
    // boundaries are arithmetic over it), so this is a codegen
    // projection + explode: no token arrays materialize, no shuffle
    // before the output sort.
    "text_chunk_windows" -> Q(
      (s, d) => {
        val size = 32L; val stride = 24L
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
          .withColumn("n_chunks",
            when(col("n_tok") <= size, lit(1L))
              .otherwise(lit(1L) +
                ceil((col("n_tok") - size).cast("double") / stride).cast("long")))
          .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
          .select(col("doc_id"), col("chunk_idx"),
            least(lit(size), col("n_tok") - col("chunk_idx") * stride).as("chunk_tokens"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(
        """WITH d AS (SELECT doc_id,
          |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
          |  FROM documents),
          |c AS (SELECT doc_id, n_tok,
          |    CASE WHEN n_tok <= 32 THEN 1
          |         ELSE 1 + CAST(ceil((n_tok - 32) / 24.0) AS BIGINT) END AS n_chunks
          |  FROM d),
          |u AS (SELECT doc_id, n_tok,
          |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c)
          |SELECT doc_id, chunk_idx,
          |  CAST(least(32, n_tok - chunk_idx * 24) AS BIGINT) AS chunk_tokens
          |FROM u ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Bigram language-model statistics: adjacent-token pair counts with
    // a fixed-point conditional probability p(w2|w1), top 50 by count.
    // The bigram explode is corpus-linear (tokens − docs rows); the
    // count aggregate map-side combines on (w1,w2); the top-50 is a
    // TakeOrdered, never a full sort.
    // BPE merge training over the vocab table: 5 byte-pair merges with
    // greedy longest-first re-segmentation per round — the tokenizer-
    // construction primitive (subword level, distinct from the
    // token-level bigram query below). One corpus scan builds the
    // word-frequency table; every merge round aggregates the CACHED
    // Heaps-sized vocab (~√corpus), and the only driver traffic is the
    // 1-row argmax per round (the IVF-centroid collect discipline).
    "text_bpe_merges" -> Q(
      (s, d) => graft.ops.TextOps.bpeMerges(Tables.documents(s, d), rounds = 5)
        .orderBy("round"),
      Some(TextSql.bpeMerges(rounds = 5))),

    // Apply-side complement of the merge trainer: segment the vocab
    // with the final longest-first alternation and report each learned
    // symbol's frequency-weighted usage — whether the tokenizer's
    // inventory is actually used (usage ≠ training-round counts, since
    // all merges apply simultaneously at apply time). Shares bpeFit /
    // the oracle CTEs with text_bpe_merges.
    "text_bpe_apply" -> Q(
      (s, d) => graft.ops.TextOps.bpeApply(Tables.documents(s, d), rounds = 5, k = 10)
        .orderBy(desc("cnt"), asc("sym")),
      Some(TextSql.bpeApply(rounds = 5, k = 10))),

    "text_bigram_topk" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pairs = Tables.documents(s, d)
          .select(expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(explode(expr(
            "transform(slice(tk, 1, size(tk) - 1), (w, i) -> struct(w AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
        pairs
          .withColumn("p_x1e6",
            floor(col("n") * lit(1000000L) /
              sum("n").over(Window.partitionBy("w1"))).cast("long"))
          .orderBy(desc("n"), asc("w1"), asc("w2")).limit(50)
      },
      Some(
        """WITH t AS (SELECT list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
          |      FROM t WHERE len(tk) >= 2),
          |c AS (SELECT tk[i] AS w1, tk[i + 1] AS w2, count(*) AS n
          |      FROM u GROUP BY 1, 2)
          |SELECT w1, w2, n,
          |  CAST(floor(n * 1000000 / sum(n) OVER (PARTITION BY w1)) AS BIGINT) AS p_x1e6
          |FROM c ORDER BY n DESC, w1, w2 LIMIT 50""".stripMargin)),

    // Corpus-LM surprisal scoring (the CCNet / Wenzek et al. quality
    // signal, arXiv:1911.00359: score each document by how improbable
    // its text is under a language model trained on the corpus itself;
    // high-surprisal docs are the OOD/noise tail a curation run reviews
    // or drops). The LM is the corpus bigram table; a doc's score is the
    // mean INVERSE conditional probability of its bigrams — the exact
    // rational n(w1)/n(w1,w2) in floor fixed-point (mean perplexity
    // without the float log/exp that would break the cross-engine hash
    // gate; the ordering it induces is the same "how surprising" order).
    // Plan shape: the bigram explode is corpus-linear, the LM build is
    // one (w1,w2) map-side-combining aggregate, the context totals
    // derive from the LM frame (vocab-sized, NOT another corpus pass),
    // and the per-doc score joins bigram rows to the LM keyed on
    // (w1,w2) — a vocab-sized build side that stays a hash join at any
    // corpus scale. BIGINT headroom: nu·10⁶ < 2⁶³ up to ~9·10¹²
    // context occurrences — a 100 TB corpus fits; first overflow wall
    // is DECIMAL(38,0), the pipeline_temperature_mix pattern.
    "text_bigram_surprisal" -> Q(
      (s, d) => {
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), col("lang"), explode(expr(
            "transform(slice(tk, 1, size(tk) - 1), (w, i) -> struct(w AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("doc_id"), col("lang"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
        val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nb"))
        val ctx = lm.groupBy("w1").agg(sum("nb").as("nu"))
        bg.join(lm, Seq("w1", "w2")).join(ctx, Seq("w1"))
          .withColumn("inv_p_x1e6", expr("nu * 1000000L div nb"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_bigrams"),
            expr("sum(inv_p_x1e6) div count(*)").as("mean_inv_p_x1e6"))
          .orderBy(desc("mean_inv_p_x1e6"), asc("doc_id")).limit(20)
      },
      Some(
        """WITH t AS (SELECT doc_id, lang, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT doc_id, lang, tk, unnest(generate_series(1, len(tk) - 1)) AS i
          |      FROM t WHERE len(tk) >= 2),
          |bg AS (SELECT doc_id, lang, tk[i] AS w1, tk[i + 1] AS w2 FROM u),
          |lm AS (SELECT w1, w2, count(*) AS nb FROM bg GROUP BY 1, 2),
          |ctx AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS nu FROM lm GROUP BY 1),
          |sc AS (SELECT bg.doc_id, bg.lang, nu * 1000000 // nb AS ip
          |       FROM bg JOIN lm USING (w1, w2) JOIN ctx USING (w1))
          |SELECT doc_id, lang, count(*) AS n_bigrams,
          |  CAST(sum(ip) // count(*) AS BIGINT) AS mean_inv_p_x1e6
          |FROM sc GROUP BY doc_id, lang
          |ORDER BY mean_inv_p_x1e6 DESC, doc_id LIMIT 20""".stripMargin)),

    // Per-dimension embedding stats in fixed-point (floor(x·10⁶) —
    // integer min/max/mean are order-free, so the parallel aggregation
    // is bit-reproducible; a double SUM would be ulp-order-dependent).
    // The embedding-QA readout: dead dims, range drift, centering.
    "emb_dim_stats" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
        .select(col("dim").cast("long").as("dim"),
          floor(col("x") * 1000000).cast("long").as("q"))
        .groupBy("dim")
        .agg(
          count(lit(1)).as("n"),
          floor(sum("q").cast("double") / count(lit(1))).cast("long").as("mean_x1e6"),
          min("q").as("min_x1e6"),
          max("q").as("max_x1e6"))
        .orderBy("dim"),
      Some(TextSql.embDimStats)),

    // Cluster-tightness QA: per-label mean L1 distance from the label's
    // fixed-point centroid — the readout that says whether labels are
    // coherent enough to drive kNN labeling / stratified sampling.
    // Centroids are floor(mean) of floor(x·10⁶) integers (order-free on
    // both engines); the centroid frame is |labels|·dims rows and
    // BROADCASTS back onto the exploded vectors.
    "emb_cluster_tightness" -> Q(
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .select(col("vec_id"), col("label"), col("dim"),
            floor(col("x") * 1000000).cast("long").as("xq"))
        val cent = q.groupBy("label", "dim")
          .agg(floor(sum("xq").cast("double") / count(lit(1))).cast("long").as("cq"))
        q.join(broadcast(cent), Seq("label", "dim"))
          .groupBy("label", "vec_id")
          .agg(sum(abs(col("xq") - col("cq"))).as("l1"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            floor(sum("l1").cast("double") / count(lit(1))).cast("long")
              .as("mean_l1_x1e6"))
          .orderBy("label")
      },
      Some(
        """WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          |             CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |q AS (SELECT vec_id, label, g.i - 1 AS dim,
          |        CAST(floor(e[g.i] * 1000000) AS BIGINT) AS xq
          |      FROM v CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |c AS (SELECT label, dim,
          |        CAST(floor(CAST(sum(xq) AS DOUBLE) / count(*)) AS BIGINT) AS cq
          |      FROM q GROUP BY 1, 2),
          |l AS (SELECT q.label, q.vec_id, sum(abs(q.xq - c.cq)) AS l1
          |      FROM q JOIN c ON c.label = q.label AND c.dim = q.dim
          |      GROUP BY 1, 2)
          |SELECT label, count(*) AS n_vecs,
          |  CAST(floor(CAST(sum(l1) AS DOUBLE) / count(*)) AS BIGINT) AS mean_l1_x1e6
          |FROM l GROUP BY label ORDER BY label""".stripMargin)),

    // Embedding-quantization QA: per-label mean reconstruction error of
    // symmetric int8 quantization (q = floor(x·127/max|x|), recon =
    // q·max|x|/127) — the report a pipeline runs before shipping
    // quantized vectors to an ANN index. All math happens in
    // floor(x·10⁶) fixed-point so both engines aggregate exact BIGINTs
    // (the two interior divisions are IEEE-double quotients of exact
    // integers — bit-identical cross-engine); the whole query is one
    // codegen projection over the vectors plus a map-side-combining
    // aggregate on the tiny label key space.
    // Product-quantization reconstruction error (Jégou et al. TPAMI'11
    // — the PQ of FAISS's IVFPQ): 4 subspaces × 8-centroid codebooks
    // via the SHARED fixed-point Lloyd trainer (bit-identical to
    // sim_ann_ivf_exact's, so the whole path is oracle-expressible),
    // reporting per-subspace mean/max abs reconstruction error — the
    // (m, ksub) tuning readout, and the complement of the scalar
    // int8 readout below. Assignment is a codegen'd argmin over 8
    // literal centroids per subspace; no shuffle before the 4-row agg.
    "emb_pq_error" -> Q(
      (s, d) => graft.ops.Similarity.pqError(Tables.embeddings(s, d),
        m = 4, ksub = 8, iters = 2),
      Some(TextSql.pqError(m = 4, ksub = 8, iters = 2))),

    "emb_quantize_error" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000) as bigint))").as("q"))
        .withColumn("smax",
          expr("aggregate(q, cast(0 as bigint), (a, x) -> greatest(a, abs(x)))"))
        .filter(col("smax") > 0)
        .withColumn("err", expr(
          """aggregate(q, cast(0 as bigint), (a, x) -> a + abs(x -
            |cast(floor(cast(floor(x * 127.0 / smax) as bigint) * smax / 127.0) as bigint)))""".stripMargin))
        .withColumn("dims", size(col("q")).cast("long"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          floor(sum(col("err")).cast("double") / sum(col("dims"))).cast("long")
            .as("mean_abs_err_x1e6"))
        .orderBy("label"),
      Some(
        """WITH v AS (SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
          |    x -> CAST(floor(x * 1000000) AS BIGINT)) AS q FROM embeddings),
          |m AS (SELECT label, q, list_reduce(
          |    list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> abs(x))),
          |    (a, b) -> greatest(a, b)) AS smax FROM v),
          |e AS (SELECT label, len(q) AS dims, list_reduce(
          |    list_prepend(CAST(0 AS BIGINT), list_transform(q,
          |      x -> abs(x - CAST(floor(CAST(floor(x * 127.0 / smax) AS BIGINT) * smax / 127.0) AS BIGINT)))),
          |    (a, b) -> a + b) AS err
          |  FROM m WHERE smax > 0)
          |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
          |  CAST(floor(CAST(sum(err) AS DOUBLE) / CAST(sum(dims) AS DOUBLE)) AS BIGINT) AS mean_abs_err_x1e6
          |FROM e GROUP BY label ORDER BY label""".stripMargin)),

    // Float-kmeans IVF (rows-only: parallel float means are only
    // reproducible to ulps); the fixed-point twin below is oracle-gated.
    "sim_ann_ivf" -> Q(
      (s, d) => graft.ops.Similarity.ivfTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      None),

    // IVF with integer-arithmetic training — the whole pipeline (scaled
    // vectors → Lloyd rounds → probing → cosine rank) has a DuckDB
    // mirror.
    "sim_ann_ivf_exact" -> Q(
      (s, d) => graft.ops.Similarity.ivfFixedPointTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnIvfExact())),

    // IVFPQ ANN (FAISS IndexIVFPQ shape): coarse cells route each
    // query to nprobe cells, candidates rank by the integer ADC
    // distance — the query's exact subvectors vs each candidate's PQ
    // codewords through a per-QUERY lookup table broadcast with the
    // probes (m lookups + adds per candidate, |Q|-independent plan).
    // Coarse quantizer and codebooks are the shared fixed-point
    // trainers (bit-identical to sim_ann_ivf_exact / emb_pq_error), so
    // the whole approximate-search path is hash-gated — no float ANN
    // nondeterminism.
    "sim_ann_ivfpq" -> Q(
      (s, d) => graft.ops.Similarity.ivfPqTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnIvfPq())),

    // Sign-LSH ANN with md5-nibble hyperplanes — the full pipeline
    // (planes → buckets → candidate join → rank) has a DuckDB mirror.
    "sim_ann_lsh" -> Q(
      (s, d) => graft.ops.Similarity.lshTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnLsh)),

    // Multi-probe sign-LSH top-k at HALF the tables (4 vs sim_ann_lsh's
    // 8): each query also probes the buckets across its 2 nearest
    // hyperplanes (smallest |margin| — the neighbor buckets most likely
    // to hold near vectors). At 100 TB the tables are the cost — each is
    // a full bucketed copy of the corpus in index memory, scan, and
    // shuffle — while extra probes only multiply the broadcast query
    // side, so this is the recall-per-byte knob. Margin ordering ties
    // break on plane index, making the probe set (and the oracle)
    // deterministic.
    "sim_ann_multiprobe" -> Q(
      (s, d) => graft.ops.Similarity.lshMultiProbeTopK(
          Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L), k = 10,
          tables = 4, extraProbes = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk"),
      Some(TextSql.simAnnMultiprobe)),

    // Recall@10 of the ANN path vs the brute-force baseline, in-engine —
    // the measurement every ANN deployment needs as a standing health
    // check (run it on a sampled query set at scale). Left join on the
    // exact top-k so misses count as 0; both sides' own oracles compose
    // into this one's.
    "sim_ann_recall" -> Q(
      (s, d) => {
        val sim = graft.ops.Similarity
        val exact = sim.bruteForceTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L), k = 10)
          .select(col("query_id"), col("vec_id"))
        val ann = sim.lshTopK(Tables.embeddings(s, d), Seq(0L, 1L, 2L), k = 10)
          .select(col("query_id").as("aq"), col("vec_id").as("av"))
        exact.join(ann,
            col("query_id") === col("aq") && col("vec_id") === col("av"), "left")
          .groupBy("query_id")
          .agg(count(col("av")).as("hits"),
            (count(col("av")) * 10).as("recall_pct"))
          .orderBy("query_id")
      },
      Some(TextSql.simAnnRecall)),

    // kNN label classification: majority vote over the 10 exact cosine
    // neighbors of each of the first 10 vectors (ties to the smallest
    // label) — the weak-supervision / label-propagation building block.
    // The neighbor list is tiny (|Q|·k rows), so it BROADCASTS into the
    // label join; the vote argmax windows over |Q|·|labels| rows. At
    // scale the expensive half is the neighbor search itself, which is
    // the already-benched brute-force/LSH/IVF family — classification
    // adds one broadcast join + one window over a vanishing row count.
    "sim_knn_classify" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nn = graft.ops.Similarity.bruteForceTopK(
            Tables.embeddings(s, d), queryIds = (0L until 10L), k = 10)
          .select(col("query_id"), col("vec_id"))
        val labels = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("nbr_label"))
        val votes = labels.join(broadcast(nn), "vec_id")
          .groupBy("query_id", "nbr_label").agg(count(lit(1)).as("votes"))
        votes
          .withColumn("rn", row_number().over(
            Window.partitionBy("query_id").orderBy(desc("votes"), asc("nbr_label"))))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("nbr_label").as("pred_label"), col("votes"))
          .orderBy("query_id")
      },
      Some(
        """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
          |scored AS (
          |  SELECT query_id, vec_id,
          |    round(list_dot_product(e, qe)
          |      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))), 6) AS cos
          |  FROM v CROSS JOIN q WHERE vec_id <> query_id),
          |r AS (SELECT query_id, vec_id,
          |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
          |      FROM scored),
          |nn AS (SELECT query_id, vec_id FROM r WHERE rnk <= 10),
          |votes AS (SELECT nn.query_id, CAST(v.label AS BIGINT) AS nbr_label, count(*) AS votes
          |          FROM nn JOIN v ON v.vec_id = nn.vec_id GROUP BY 1, 2),
          |w AS (SELECT query_id, nbr_label, votes,
          |        row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nbr_label) AS rn
          |      FROM votes)
          |SELECT query_id, nbr_label AS pred_label, votes FROM w WHERE rn = 1
          |ORDER BY query_id""".stripMargin))

  )
}
