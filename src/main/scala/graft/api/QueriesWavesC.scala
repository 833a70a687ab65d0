package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import QueriesShared._

/** Extension waves (rounds 9+): BPE, events, privacy, stats (part 3 of 3, original declaration order).
  *
  * One contiguous, ORDER-PRESERVING slice of the declared query
  * surface; [[Queries.registry]] concatenates the slices in the
  * original declaration order. Entries are (name -> Q) pairs exactly
  * as they appeared in the pre-split Queries.scala.
  */
private[api] object QueriesWavesC {
  val entries: Seq[(String, Q)] = Seq(
    // Tokenizer fertility per source — BPE tokens emitted per word
    // under the merge table trained on the WHOLE corpus: the
    // pre-training diagnostic that decides whether a source needs its
    // own tokenizer or a higher mix weight to compensate (fertility
    // directly scales its effective token budget). Training is the
    // shared 5-round integer-gated loop (text_bpe_merges); the corpus
    // pays that plus ONE per-(source, word) collapse — the
    // segmentation regex runs over the vocab-sized frame, never the
    // corpus.
    "text_bpe_fertility" -> Q(
      (s, d) => graft.ops.TextOps.bpeFertility(Tables.documents(s, d), rounds = 5),
      Some(TextSql.bpeFertility(rounds = 5))),

    // Boilerplate/HTML stripping census — the first stage of every
    // web-crawl pipeline (C4/CCNet strip markup before any quality
    // gate). Tag chars counted by the same regex both engines run
    // (<[^>]*>); the corpus is markup-free, so HTML-wrapped variants
    // of docs 0-39 are planted in-query under doc_id+500000 (the
    // text_code_detect discipline) — the census proves both the
    // detection and the removal accounting. ONE codegen scan, no joins.
    "text_html_strip" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 500000)
          .withColumn("text", concat(
            lit("<html><head><title>t"), col("doc_id"),
            lit("</title></head><body><p>"), substring(col("text"), 1, 60),
            lit("</p><div class=\"nav\">menu</div></body></html>")))
        base.unionByName(plants)
          .select(col("source"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "<[^>]*>", ""))).as("tag_chars"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("tag_chars") > 0, 1L).otherwise(0L)).cast("long")
              .as("n_html"),
            sum("tag_chars").cast("long").as("tag_chars"))
          .withColumn("html_rate_x1e6", expr("n_html * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source,
          |    '<html><head><title>t' || (doc_id + 500000)
          |      || '</title></head><body><p>' || substring(text, 1, 60)
          |      || '</p><div class="nav">menu</div></body></html>' AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(text) - length(regexp_replace(text, '<[^>]*>', '', 'g'))
          |      AS tag_chars
          |  FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN tag_chars > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_html,
          |  CAST(sum(tag_chars) AS BIGINT) AS tag_chars,
          |  CAST(sum(CASE WHEN tag_chars > 0 THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS html_rate_x1e6
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Time-weighted average value per event type — the correct
    // "average state" when observations arrive irregularly (a plain
    // mean over-weights bursty periods; TWA weights each value by how
    // long it HELD: until the user's next event). Per-user lead window
    // (ts, event_id tie-break — the sessionize discipline), last event
    // carries no weight; value in cents × gap seconds summed in
    // DECIMAL, one integral division at the end. One user-keyed
    // shuffle, linear.
    "events_twa" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        Tables.events(s, d)
          .withColumn("gap_s", expr(
            "(unix_micros(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - unix_micros(ts)) div 1000000"))
          .filter(col("gap_s").isNotNull)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"),
            col("gap_s"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_intervals"),
            sum(col("gap_s")).cast("long").as("held_s"),
            sum(dec(col("c")) * dec(col("gap_s"))).as("cw"))
          .select(col("event_type"), col("n_intervals"), col("held_s"),
            graft.functions.GraftFunctions.longDiv(
              col("cw") * dec(lit(1000L)),
              nullif(col("held_s").cast("decimal(38,0)"), dec(lit(0L))))
              .cast("long").as("twa_c_x1e3"))
          .orderBy("event_type")
      },
      Some(
        """WITH g AS (SELECT event_type,
          |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
          |    CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) - epoch_us(ts) AS BIGINT) // 1000000 AS gap_s
          |  FROM events)
          |SELECT event_type, count(*) AS n_intervals,
          |  CAST(sum(gap_s) AS BIGINT) AS held_s,
          |  CAST(sum(CAST(c AS HUGEINT) * gap_s) * 1000
          |    // nullif(CAST(sum(gap_s) AS HUGEINT), 0) AS BIGINT) AS twa_c_x1e3
          |FROM g WHERE gap_s IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Cross-source n-gram novelty — what fraction of a source's
    // distinct 3-grams appear in NO other source: the
    // memorization/contribution profile that decides whether a source
    // adds anything the mix doesn't already have (the set-level
    // complement of text_source_divergence's distributional view).
    // Two keyed shuffles: (source, gram) distinct collapse, then a
    // gram-keyed source-count re-aggregation joined back; novel ⇔
    // exactly one source holds the gram. Gram frames are
    // vocab³-bounded, never corpus-row-sized.
    "text_ngram_novelty" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
        // ONE gram-keyed exchange serves all three stages: the
        // (g, source) distinct, the per-gram source count, and the
        // join — HashPartitioning(g) satisfies the composite
        // clustering, so neither aggregation nor the join re-shuffles
        // (three string shuffles measured 5× cost for 3× rows at 30×)
        val sg = toks.filter(size(col("tk")) >= 3)
          .select(col("source"), explode(expr(
            "transform(slice(tk, 1, size(tk) - 2), (w, i) -> concat_ws(' ', w, tk[i + 1], tk[i + 2]))")).as("g"))
          .repartition(col("g"))
          .groupBy("g", "source").agg(count(lit(1)).as("occ"))
        val df = sg.groupBy("g").agg(count(lit(1)).as("nsrc"))
        sg.join(df, "g")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_grams"),
            sum(when(col("nsrc") === 1, 1L).otherwise(0L)).cast("long")
              .as("n_novel"))
          .withColumn("novelty_x1e6", expr("n_novel * 1000000L div n_grams"))
          .orderBy("source")
      },
      Some(
        """WITH t AS (SELECT source, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT source, tk, unnest(generate_series(1, len(tk) - 2)) AS i
          |      FROM t WHERE len(tk) >= 3),
          |sg AS (SELECT source, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS g
          |       FROM u GROUP BY 1, 2),
          |df AS (SELECT g, count(*) AS nsrc FROM sg GROUP BY 1)
          |SELECT source, count(*) AS n_grams,
          |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
          |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS novelty_x1e6
          |FROM sg JOIN df USING (g) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Customer-cohort LTV triangle — cumulative revenue per customer by
    // cohort (first-order month) × order age in months: THE retention
    // economics table (the revenue twin of events_cohort_matrix's
    // activity counts). Corpus pays one customer-keyed first-order
    // collapse + one keyed join back; the triangle itself is
    // calendar²-bounded, so its cumulative window and the cohort-size
    // join run on a tiny frame. Whole-dollar revenue (the ANOVA unit
    // discipline), ltv = cumulative dollars ×1e3 per cohort customer.
    "orders_cohort_ltv" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), to_date(col("o_orderdate")).as("od"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("rev"))
        val first = o.groupBy("ck").agg(min("od").as("fd"))
        val cs = first
          .groupBy(date_format(col("fd"), "yyyy-MM").as("cohort"))
          .agg(count(lit(1)).as("n_custs"))
        val tri = o.join(first, "ck")
          .groupBy(date_format(col("fd"), "yyyy-MM").as("cohort"),
            ((year(col("od")) - year(col("fd"))) * 12
              + (month(col("od")) - month(col("fd")))).cast("long").as("age_m"))
          .agg(sum("rev").cast("long").as("rev"))
        val w = Window.partitionBy("cohort").orderBy("age_m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tri.withColumn("cum_rev", sum("rev").over(w).cast("long"))
          .join(broadcast(cs), "cohort")
          .select(col("cohort"), col("age_m"), col("n_custs").cast("long").as("n_custs"),
            col("rev"), col("cum_rev"),
            expr("cum_rev * 1000L div n_custs").as("ltv_x1e3"))
          .orderBy("cohort", "age_m")
      },
      Some(
        """WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
          |    CAST(floor(o_totalprice) AS BIGINT) AS rev FROM orders),
          |f AS (SELECT ck, min(od) AS fd FROM o GROUP BY 1),
          |cs AS (SELECT strftime(fd, '%Y-%m') AS cohort, count(*) AS n_custs
          |       FROM f GROUP BY 1),
          |tri AS (SELECT strftime(fd, '%Y-%m') AS cohort,
          |    CAST((year(od) - year(fd)) * 12 + (month(od) - month(fd)) AS BIGINT)
          |      AS age_m,
          |    CAST(sum(rev) AS BIGINT) AS rev
          |  FROM o JOIN f USING (ck) GROUP BY 1, 2),
          |c AS (SELECT cohort, age_m, rev,
          |    CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age_m
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS cum_rev
          |  FROM tri)
          |SELECT cohort, age_m, CAST(n_custs AS BIGINT) AS n_custs, rev, cum_rev,
          |  CAST(cum_rev * 1000 // n_custs AS BIGINT) AS ltv_x1e3
          |FROM c JOIN cs USING (cohort) ORDER BY cohort, age_m""".stripMargin)),

    // Compaction planning — the lakehouse maintenance pass that fixes
    // the small-file problem: greedy sequential bin-packing of a file
    // manifest into ~256 KB rewrite groups (group = exclusive-prefix
    // size // target, so a group overflows by at most one file — the
    // classic streaming first-fit). The manifest here derives from the
    // documents table (100-doc buckets as pseudo-files, documented); in
    // production the input is the table's real file listing. THE scale
    // point: planning runs entirely on the MANIFEST (corpus-size/100
    // rows), the corpus pays one collapse — per-source windows, no
    // global sort.
    "lakehouse_compaction_plan" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val target = 262144L
        val files = Tables.documents(s, d)
          .groupBy(col("source"), expr("doc_id div 100").as("bucket"))
          .agg(sum("n_chars").cast("long").as("sz"))
        val w = Window.partitionBy("source").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val planned = files
          .withColumn("cum0", coalesce(sum("sz").over(w), lit(0L)))
          .withColumn("grp", expr(s"cum0 div ${target}L"))
        val groups = planned.groupBy("source", "grp")
          .agg(sum("sz").as("gsz"))
        planned.groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_files"),
            sum("sz").cast("long").as("total_chars"))
          .join(groups.groupBy("source")
            .agg(count(lit(1)).cast("long").as("n_groups"),
              max("gsz").cast("long").as("max_group_chars")), "source")
          .withColumn("fill_x1e6",
            expr(s"total_chars * 1000000L div (n_groups * ${target}L)"))
          .orderBy("source")
      },
      Some(
        """WITH files AS (SELECT source, doc_id // 100 AS bucket,
          |    CAST(sum(n_chars) AS BIGINT) AS sz
          |  FROM documents GROUP BY 1, 2),
          |p AS (SELECT source, sz,
          |    CAST(coalesce(sum(sz) OVER (PARTITION BY source ORDER BY bucket
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |      // 262144 AS grp
          |  FROM files),
          |g AS (SELECT source, grp, CAST(sum(sz) AS BIGINT) AS gsz
          |      FROM p GROUP BY 1, 2),
          |s AS (SELECT source, count(*) AS n_files,
          |    CAST(sum(sz) AS BIGINT) AS total_chars FROM p GROUP BY 1),
          |t AS (SELECT source, count(*) AS n_groups,
          |    CAST(max(gsz) AS BIGINT) AS max_group_chars FROM g GROUP BY 1)
          |SELECT source, n_files, total_chars, n_groups, max_group_chars,
          |  CAST(total_chars * 1000000 // (n_groups * 262144) AS BIGINT)
          |    AS fill_x1e6
          |FROM s JOIN t USING (source) ORDER BY source""".stripMargin)),

    // Differential-privacy sensitivity audit — before adding DP noise
    // to any per-type aggregate you must know the max single-user
    // contribution (the L1 sensitivity scale) and how many users
    // exceed a clipping candidate: per (type, user) collapse, then a
    // type-level re-aggregation of that user-grain frame (two keyed
    // shuffles, second over the user-count-sized frame). Exact cents;
    // shares via nullif-guarded integral division.
    "privacy_sensitivity_audit" -> Q(
      (s, d) => {
        val u = Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
          .groupBy("event_type", "user_id").agg(sum("c").as("uc"))
        val t = u.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum("uc").cast("long").as("total_c"),
            max("uc").cast("long").as("max_user_c"))
        u.join(broadcast(t), "event_type")
          .groupBy("event_type")
          .agg(max("n_users").as("n_users"), max("total_c").as("total_c"),
            max("max_user_c").as("max_user_c"),
            sum(when(col("uc") * 100 > col("total_c"), 1L).otherwise(0L))
              .cast("long").as("n_over_1pct"))
          .withColumn("max_share_x1e6", expr(
            "CAST(CAST(max_user_c AS DECIMAL(38,0)) * 1000000 div nullif(CAST(total_c AS DECIMAL(38,0)), 0) AS BIGINT)"))
          .orderBy("event_type")
      },
      Some(
        """WITH u AS (SELECT event_type, user_id,
          |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS uc
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT event_type, count(*) AS n_users,
          |    CAST(sum(uc) AS BIGINT) AS total_c,
          |    CAST(max(uc) AS BIGINT) AS max_user_c
          |  FROM u GROUP BY 1)
          |SELECT t.event_type, n_users, total_c, max_user_c,
          |  CAST(sum(CASE WHEN u.uc * 100 > t.total_c THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_over_1pct,
          |  CAST(CAST(max_user_c AS HUGEINT) * 1000000
          |    // nullif(CAST(total_c AS HUGEINT), 0) AS BIGINT) AS max_share_x1e6
          |FROM u JOIN t ON t.event_type = u.event_type
          |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin)),

    // Per-label centroid representatives — the herding/coreset
    // selection every "pick k canonical examples per class" pipeline
    // runs (distillation seeds, eval anchors, label auditing): the 3
    // vectors closest to their label centroid in exact fixed-point
    // arithmetic. dist²·n² = Σ_dim (n·q − s)² needs no division until
    // the final per-vector readout (// n², floored identically both
    // engines); ranking on the floored value + vec_id is
    // engine-invariant. Corpus pays the explode collapse + one
    // broadcast join of the labels×64 centroid frame; top-3 via a
    // per-label window.
    "emb_centroid_representatives" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val cent = q.groupBy("label", "dim")
          .agg(sum("q").as("s"), count(lit(1)).as("n"))
        val dist = q.join(broadcast(cent), Seq("label", "dim"))
          .withColumn("t", dec(col("n")) * dec(col("q")) - dec(col("s")))
          .groupBy("label", "vec_id")
          .agg(graft.functions.GraftFunctions.longDiv(
            sum(col("t") * col("t")),
            dec(max("n")) * dec(max("n"))).as("dist_q"))
        val w = Window.partitionBy("label").orderBy(col("dist_q"), col("vec_id"))
        dist.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("label").cast("long").as("label"),
            col("rk").cast("long").as("rk"),
            col("vec_id").cast("long").as("vec_id"),
            col("dist_q").cast("long").as("dist_q"))
          .orderBy("label", "rk")
      },
      Some(
        """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT label, vec_id, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |cent AS (SELECT label, dim, CAST(sum(q) AS HUGEINT) AS s,
          |    CAST(count(*) AS HUGEINT) AS n
          |  FROM q GROUP BY 1, 2),
          |dist AS (SELECT q.label, vec_id,
          |    CAST(sum((n * q - s) * (n * q - s)) // (max(n) * max(n)) AS BIGINT)
          |      AS dist_q
          |  FROM q JOIN cent ON cent.label = q.label AND cent.dim = q.dim
          |  GROUP BY 1, 2),
          |r AS (SELECT label, vec_id, dist_q,
          |    row_number() OVER (PARTITION BY label ORDER BY dist_q, vec_id) AS rk
          |  FROM dist)
          |SELECT CAST(label AS BIGINT) AS label, CAST(rk AS BIGINT) AS rk,
          |  CAST(vec_id AS BIGINT) AS vec_id, dist_q
          |FROM r WHERE rk <= 3 ORDER BY label, rk""".stripMargin)),

    // Late-interaction (MaxSim) retrieval over label groups — the
    // ColBERT-style scoring where a group's relevance is the MAX inner
    // product of any member, not the centroid (multi-vector documents;
    // labels stand in as the vector groups): for 5 deterministic query
    // vectors (vec_id 0-4 — their own labels score a perfect
    // self-match, documented), rank labels by max fixed-point dot and
    // keep the top 3. ONE corpus scan fanned ×5 by the broadcast
    // query-dim frame; dots summed exactly (q ≤ 1e6 ⇒ products ≤
    // 6.4e13·64, DECIMAL-safe), final window on the 5×labels frame.
    "sim_maxsim_label" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val qs = q.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("dim"), col("q").as("qq"))
        val dots = q.join(broadcast(qs), "dim")
          .groupBy("qid", "label", "vec_id")
          .agg(sum(dec(col("q")) * dec(col("qq"))).as("dot"))
        val best = dots.groupBy("qid", "label")
          .agg(max("dot").as("maxdot"))
        val w = Window.partitionBy("qid").orderBy(desc("maxdot"), col("label"))
        best.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("qid").cast("long").as("qid"),
            col("rk").cast("long").as("rk"),
            col("label").cast("long").as("label"),
            col("maxdot").cast("long").as("maxdot_q"))
          .orderBy("qid", "rk")
      },
      Some(
        """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT label, vec_id, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |qs AS (SELECT vec_id AS qid, dim, q AS qq FROM q WHERE vec_id < 5),
          |dots AS (SELECT qid, q.label, q.vec_id,
          |    CAST(sum(CAST(q.q AS HUGEINT) * qs.qq) AS HUGEINT) AS dot
          |  FROM q JOIN qs ON qs.dim = q.dim
          |  GROUP BY 1, 2, 3),
          |best AS (SELECT qid, label, max(dot) AS maxdot FROM dots GROUP BY 1, 2),
          |r AS (SELECT qid, label, maxdot,
          |    row_number() OVER (PARTITION BY qid ORDER BY maxdot DESC, label) AS rk
          |  FROM best)
          |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
          |  CAST(label AS BIGINT) AS label, CAST(maxdot AS BIGINT) AS maxdot_q
          |FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin)),

    // Positional (U-shaped) multi-touch attribution — the 40/20/40
    // credit model between the asof_last_click (100% last) and
    // range_attribution (window) extremes: each purchase closes a
    // journey of the user's touches since the previous purchase;
    // first and last touch get 4000 bp, middles split 2000 bp evenly
    // (floor, remainder dropped — deterministic), singleton 10000,
    // pair 5000/5000. ONE user-keyed shuffle: the journey id (running
    // purchase count), the per-user purchase total, and the
    // (user, journey) position/size windows all reuse the user
    // partitioning (subset clustering). Credit census per channel.
    "events_attribution_positional" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wAll = Window.partitionBy("user_id")
        val wRun = wAll.orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .withColumn("is_p", when(col("event_type") === "purchase", 1L)
            .otherwise(0L))
          .withColumn("rc", sum("is_p").over(wRun))
          .withColumn("tp", sum("is_p").over(wAll))
        val touches = ev.filter(col("is_p") === 0)
          .withColumn("journey", col("rc") + 1)
          .filter(col("journey") <= col("tp"))
        val wj = Window.partitionBy("user_id", "journey")
        val wjo = wj.orderBy("ts", "event_id")
        touches
          .withColumn("pos", row_number().over(wjo))
          .withColumn("m", count(lit(1)).over(wj))
          .withColumn("credit_bp",
            when(col("m") === 1, 10000L)
              .when(col("m") === 2, 5000L)
              .when(col("pos") === 1 || col("pos") === col("m"), 4000L)
              .otherwise(expr("2000L div (m - 2)")))
          .groupBy(col("event_type").as("channel"))
          .agg(count(lit(1)).cast("long").as("n_touches"),
            sum("credit_bp").cast("long").as("credit_bp"))
          .orderBy("channel")
      },
      Some(
        """WITH ev AS (SELECT event_type, user_id, ts, event_id,
          |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
          |  FROM events),
          |r AS (SELECT event_type, user_id, ts, event_id, is_p,
          |    sum(is_p) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc,
          |    sum(is_p) OVER (PARTITION BY user_id) AS tp
          |  FROM ev),
          |t AS (SELECT event_type, user_id, ts, event_id, rc + 1 AS journey
          |      FROM r WHERE is_p = 0 AND rc + 1 <= tp),
          |p AS (SELECT event_type,
          |    row_number() OVER (PARTITION BY user_id, journey
          |      ORDER BY ts, event_id) AS pos,
          |    count(*) OVER (PARTITION BY user_id, journey) AS m
          |  FROM t),
          |c AS (SELECT event_type,
          |    CASE WHEN m = 1 THEN 10000
          |         WHEN m = 2 THEN 5000
          |         WHEN pos = 1 OR pos = m THEN 4000
          |         ELSE 2000 // (m - 2) END AS credit_bp
          |  FROM p)
          |SELECT event_type AS channel, count(*) AS n_touches,
          |  CAST(sum(credit_bp) AS BIGINT) AS credit_bp
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Label-confusion matrix from centroid geometry — which classes
    // the embedding space entangles: every vector scored against ALL
    // label centroids (the corpus frame fans ×L by the broadcast
    // labels×64 centroid frame — L-bounded, not a pair join), nearest
    // OTHER label by engine-invariant (floored dist, label) rank;
    // a vector is confused when that rival sits strictly closer than
    // its own centroid. Census per (label, nearest_other).
    "emb_label_confusion" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val q = Tables.embeddings(s, d)
          .select(col("label").as("own"), col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
          .withColumn("q", floor(col("x") * 1000000).cast("long"))
        val cent = q.groupBy(col("own").as("c"), col("dim"))
          .agg(sum("q").as("s"), count(lit(1)).as("n"))
        val dists = q.join(broadcast(cent), "dim")
          .withColumn("t", dec(col("n")) * dec(col("q")) - dec(col("s")))
          .groupBy("own", "vec_id", "c")
          .agg(graft.functions.GraftFunctions.longDiv(
            sum(col("t") * col("t")), dec(max("n")) * dec(max("n")))
            .as("dist_q"))
        val ownD = dists.filter(col("c") === col("own"))
          .select(col("vec_id"), col("dist_q").as("own_dist"))
        val wr = Window.partitionBy("vec_id").orderBy(col("dist_q"), col("c"))
        val rival = dists.filter(col("c") =!= col("own"))
          .withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
          .select(col("own"), col("vec_id"), col("c").as("nearest_other"),
            col("dist_q").as("other_dist"))
        rival.join(ownD, "vec_id")
          .groupBy(col("own").cast("long").as("label"),
            col("nearest_other").cast("long").as("nearest_other"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("other_dist") < col("own_dist"), 1L).otherwise(0L))
              .cast("long").as("n_confused"))
          .orderBy("label", "nearest_other")
      },
      Some(
        """WITH v AS (SELECT label AS own, vec_id, CAST(embedding AS DOUBLE[]) AS e
          |           FROM embeddings),
          |q AS (SELECT own, vec_id, g.i - 1 AS dim,
          |    CAST(floor(e[g.i] * 1000000) AS BIGINT) AS q
          |  FROM v CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(e))) AS i) g),
          |cent AS (SELECT own AS c, dim, CAST(sum(q) AS HUGEINT) AS s,
          |    CAST(count(*) AS HUGEINT) AS n
          |  FROM q GROUP BY 1, 2),
          |dists AS (SELECT q.own, q.vec_id, cent.c,
          |    CAST(sum((n * q - s) * (n * q - s)) // (max(n) * max(n)) AS BIGINT)
          |      AS dist_q
          |  FROM q JOIN cent ON cent.dim = q.dim
          |  GROUP BY 1, 2, 3),
          |own_d AS (SELECT vec_id, dist_q AS own_dist FROM dists WHERE c = own),
          |rv AS (SELECT own, vec_id, c AS nearest_other, dist_q AS other_dist,
          |    row_number() OVER (PARTITION BY vec_id ORDER BY dist_q, c) AS rk
          |  FROM dists WHERE c <> own)
          |SELECT CAST(own AS BIGINT) AS label,
          |  CAST(nearest_other AS BIGINT) AS nearest_other,
          |  count(*) AS n,
          |  CAST(sum(CASE WHEN other_dist < own_dist THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_confused
          |FROM rv JOIN own_d USING (vec_id)
          |WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Customer dormancy census — recency segmentation off the corpus
    // max order date (active <90 d, lapsing <365 d, else dormant):
    // the churn-risk panel every retention program starts from. One
    // customer-keyed last-order collapse + broadcast nation dim +
    // 1-row anchor; exact day arithmetic.
    "orders_dormancy" -> Q(
      (s, d) => {
        val last = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("ck"))
          .agg(max(to_date(col("o_orderdate"))).as("ld"))
        val anchor = Tables.orders(s, d)
          .agg(max(to_date(col("o_orderdate"))).as("mx"))
        last
          .join(Tables.customer(s, d).select(col("c_custkey").as("ck"),
            col("c_nationkey")), "ck")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            "c_nationkey")
          .crossJoin(broadcast(anchor))
          .withColumn("rec_d", datediff(col("mx"), col("ld")).cast("long"))
          .withColumn("bucket",
            when(col("rec_d") < 90, "0_active")
              .when(col("rec_d") < 365, "1_lapsing").otherwise("2_dormant"))
          .groupBy(col("n_name").as("nation"), col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_custs"),
            max("rec_d").cast("long").as("max_recency_d"))
          .orderBy("nation", "bucket")
      },
      Some(
        """WITH l AS (SELECT o_custkey AS ck, max(CAST(o_orderdate AS DATE)) AS ld
          |           FROM orders GROUP BY 1),
          |mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
          |b AS (SELECT n_name AS nation,
          |    CAST(datediff('day', ld, mx) AS BIGINT) AS rec_d
          |  FROM l JOIN customer ON c_custkey = ck
          |  JOIN nation ON n_nationkey = c_nationkey
          |  CROSS JOIN mx)
          |SELECT nation,
          |  CASE WHEN rec_d < 90 THEN '0_active'
          |       WHEN rec_d < 365 THEN '1_lapsing' ELSE '2_dormant' END AS bucket,
          |  count(*) AS n_custs, CAST(max(rec_d) AS BIGINT) AS max_recency_d
          |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Time-to-convert distribution — how long a purchase journey runs
    // from its FIRST touch to the purchase that closes it (the latency
    // complement of events_attribution_positional's credit view; same
    // journey algebra). Purchases numbered by the running count,
    // touches assigned journey rc+1, first-touch collapse and the
    // purchase join both reuse the user partitioning — ONE corpus
    // shuffle. Zero-touch journeys (back-to-back purchases) have no
    // latency and drop out of the inner join, documented. Fixed
    // integer buckets (<1m/<1h/<1d/≥1d — no float log).
    "events_time_to_convert" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, d)
          .withColumn("is_p", when(col("event_type") === "purchase", 1L)
            .otherwise(0L))
          .withColumn("rc", sum("is_p").over(wRun))
        val firstTouch = ev.filter(col("is_p") === 0)
          .groupBy(col("user_id"), (col("rc") + 1).as("journey"))
          .agg(min("ts").as("fts"))
        val purch = ev.filter(col("is_p") === 1)
          .select(col("user_id"), col("rc").as("journey"), col("ts").as("pts"))
        firstTouch.join(purch, Seq("user_id", "journey"))
          .withColumn("gap_s",
            expr("(unix_micros(pts) - unix_micros(fts)) div 1000000"))
          .groupBy(
            when(col("gap_s") < 60, "0_lt_1m").when(col("gap_s") < 3600, "1_lt_1h")
              .when(col("gap_s") < 86400, "2_lt_1d").otherwise("3_ge_1d")
              .as("bucket"))
          .agg(count(lit(1)).cast("long").as("n_journeys"),
            sum("gap_s").cast("long").as("total_s"))
          .orderBy("bucket")
      },
      Some(
        """WITH r AS (SELECT user_id, ts, event_id, event_type,
          |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
          |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc
          |  FROM events),
          |ft AS (SELECT user_id, rc + 1 AS journey, min(ts) AS fts
          |       FROM r WHERE is_p = 0 GROUP BY 1, 2),
          |p AS (SELECT user_id, rc AS journey, ts AS pts FROM r WHERE is_p = 1),
          |g AS (SELECT CAST(epoch_us(pts) - epoch_us(fts) AS BIGINT) // 1000000
          |        AS gap_s
          |      FROM ft JOIN p USING (user_id, journey))
          |SELECT CASE WHEN gap_s < 60 THEN '0_lt_1m'
          |    WHEN gap_s < 3600 THEN '1_lt_1h'
          |    WHEN gap_s < 86400 THEN '2_lt_1d' ELSE '3_ge_1d' END AS bucket,
          |  count(*) AS n_journeys, CAST(sum(gap_s) AS BIGINT) AS total_s
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Process-conformance census — which observed event transitions
    // violate the declared lifecycle model (process mining's
    // conformance checking, the data-quality twin of
    // events_markov_transitions' descriptive matrix). The allowed set
    // is an explicit shared whitelist (signup opens, view/click
    // browse, purchase closes and restarts; error is never legal);
    // per-user lag window, transition census with the violation flag.
    // One user-keyed shuffle, linear.
    "events_conformance" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val allowed = Seq(
          "signup>view", "signup>click", "view>view", "view>click",
          "view>purchase", "click>click", "click>view", "click>purchase",
          "purchase>view", "purchase>signup")
        Tables.events(s, d)
          .withColumn("prev", lag("event_type", 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("ok",
            when(concat(col("prev"), lit(">"), col("event_type"))
              .isin(allowed: _*), 1L).otherwise(0L))
          .groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).cast("long").as("n"),
            max(lit(1L) - col("ok")).cast("long").as("is_violation"))
          .orderBy("prev", "cur")
      },
      Some(
        """WITH t AS (SELECT event_type AS cur,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS prev
          |  FROM events),
          |f AS (SELECT prev, cur,
          |    CASE WHEN prev || '>' || cur IN ('signup>view', 'signup>click',
          |      'view>view', 'view>click', 'view>purchase', 'click>click',
          |      'click>view', 'click>purchase', 'purchase>view',
          |      'purchase>signup') THEN 0 ELSE 1 END AS viol
          |  FROM t WHERE prev IS NOT NULL)
          |SELECT prev, cur, count(*) AS n,
          |  CAST(max(viol) AS BIGINT) AS is_violation
          |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Mean segmental type-token ratio (MSTTR) per source — the
    // length-robust lexical-diversity standard (plain TTR collapses as
    // docs grow; fixed 10-token segments make sources comparable):
    // distinct types per full 10-token chunk, remainder dropped,
    // mean ×1e6 in exact integers. One explode + a (doc, chunk)
    // distinct collapse; chunk frames are corpus-token-bounded.
    "text_msttr" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), expr(
            "filter(split(lower(text), '\\\\s+'), t -> t != '')").as("tk"))
        toks.select(col("doc_id"), col("source"),
            expr("size(tk) div 10").as("full_chunks"),
            posexplode(col("tk")).as(Seq("pos", "w")))
          .withColumn("chunk", expr("pos div 10"))
          .filter(col("chunk") < col("full_chunks"))
          .groupBy("source", "doc_id", "chunk")
          .agg(countDistinct("w").as("types"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_chunks"),
            sum("types").cast("long").as("n_types"))
          .withColumn("msttr_x1e6",
            expr("n_types * 1000000L div (n_chunks * 10L)"))
          .orderBy("source")
      },
      Some(
        """WITH t AS (SELECT doc_id, source, list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
          |  FROM documents),
          |u AS (SELECT doc_id, source, len(tk) // 10 AS full_chunks,
          |    (g.i - 1) // 10 AS chunk, tk[g.i] AS w
          |  FROM t CROSS JOIN LATERAL
          |    (SELECT unnest(generate_series(1, len(tk))) AS i) g),
          |c AS (SELECT source, doc_id, chunk, count(DISTINCT w) AS types
          |      FROM u WHERE chunk < full_chunks GROUP BY 1, 2, 3)
          |SELECT source, count(*) AS n_chunks,
          |  CAST(sum(types) AS BIGINT) AS n_types,
          |  CAST(sum(types) * 1000000 // (count(*) * 10) AS BIGINT) AS msttr_x1e6
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Pareto coverage points — the "how many customers make p% of
    // revenue" scalars behind the 80/20 rule (the crossing-point
    // readout of stats_lorenz_deciles' full curve). Descending
    // cumulative revenue WITHOUT a corpus-sized sort: the two-phase
    // bucketedPrefixSum gives the ascending inclusive prefix, and
    // cum_desc = T − prefix + rev converts it (tie order ck ASC maps
    // to the oracle's rev DESC, ck DESC — stated there). A customer is
    // needed for threshold p while the revenue ABOVE it (exclusive)
    // still sits under p·T/100 — strict integer compare, no division.
    "orders_pareto_coverage" -> Q(
      (s, d) => {
        val cust = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("rev"))
        val ranked = graft.ops.Stats.bucketedPrefixSum(cust, "rev", "ck", 1000L)
        val tot = cust.agg(sum("rev").as("t"), count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("above_excl", col("t") - col("prefix"))
          .select(col("above_excl"), col("t"), col("n"),
            explode(expr("array(50L, 80L, 90L)")).as("p"))
          .groupBy("p")
          .agg(max("n").cast("long").as("n_custs"),
            sum(when(col("above_excl") * 100 < col("p") * col("t"), 1L)
              .otherwise(0L)).cast("long").as("n_top"))
          .withColumn("cust_share_x1e6", expr("n_top * 1000000L div n_custs"))
          .orderBy("p")
      },
      Some(
        """WITH cust AS (SELECT o_custkey AS ck,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
          |  FROM orders GROUP BY 1),
          |r AS (SELECT rev,
          |    CAST(sum(rev) OVER (ORDER BY rev DESC, ck DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |      AS cum_desc
          |  FROM cust),
          |t AS (SELECT CAST(sum(rev) AS BIGINT) AS t, count(*) AS n FROM cust),
          |e AS (SELECT cum_desc - rev AS above_excl, t, n, p
          |      FROM r CROSS JOIN t CROSS JOIN (SELECT unnest([50, 80, 90]) AS p))
          |SELECT CAST(p AS BIGINT) AS p, CAST(max(n) AS BIGINT) AS n_custs,
          |  CAST(sum(CASE WHEN above_excl * 100 < p * t THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_top,
          |  CAST(sum(CASE WHEN above_excl * 100 < p * t THEN 1 ELSE 0 END)
          |    * 1000000 // max(n) AS BIGINT) AS cust_share_x1e6
          |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)),

    // 4-4-5 fiscal calendar rollup — retail's week-aligned reporting
    // calendar (periods of 4, 4, 5 weeks per quarter; comparable
    // same-weekday periods, unlike Gregorian months). Fiscal epoch =
    // the corpus min order date (broadcast 1-row anchor, documented);
    // everything is exact integer week arithmetic off the day diff —
    // no engine date-convention in the gate. One collapse shuffle.
    "date_fiscal_445" -> Q(
      (s, d) => {
        val mn = Tables.orders(s, d)
          .agg(min(to_date(col("o_orderdate"))).as("mnd"))
        Tables.orders(s, d)
          .crossJoin(broadcast(mn))
          .withColumn("wk",
            expr("CAST(datediff(to_date(o_orderdate), mnd) AS BIGINT) div 7"))
          .withColumn("fy", expr("wk div 52"))
          .withColumn("wiy", expr("wk % 52"))
          .withColumn("fq", expr("wiy div 13 + 1"))
          .withColumn("wiq", expr("wiy % 13"))
          .withColumn("period",
            when(col("wiq") < 4, 1L).when(col("wiq") < 8, 2L).otherwise(3L))
          .groupBy("fy", "fq", "period")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).cast("long")
              .as("rev"))
          .orderBy("fy", "fq", "period")
      },
      Some(
        """WITH mn AS (SELECT min(CAST(o_orderdate AS DATE)) AS mnd FROM orders),
          |w AS (SELECT CAST(datediff('day', mnd, CAST(o_orderdate AS DATE))
          |        AS BIGINT) // 7 AS wk,
          |    CAST(floor(o_totalprice) AS BIGINT) AS rev
          |  FROM orders CROSS JOIN mn),
          |f AS (SELECT wk // 52 AS fy, (wk % 52) // 13 + 1 AS fq,
          |    CASE WHEN wk % 52 % 13 < 4 THEN 1
          |         WHEN wk % 52 % 13 < 8 THEN 2 ELSE 3 END AS period, rev
          |  FROM w)
          |SELECT fy, fq, CAST(period AS BIGINT) AS period,
          |  count(*) AS n_orders, CAST(sum(rev) AS BIGINT) AS rev
          |FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Error-budget burn — the SRE readout over the event log: daily
    // error rate against a 1% budget (strict integer compare), with
    // the running count of budget-violating days. The corpus collapses
    // to the calendar-bounded day frame first; the only global window
    // runs on that tiny frame (the stats_max_drawdown discipline).
    "events_error_budget" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("dy"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_err"))
          .withColumn("over", when(col("n_err") * 100 > col("n"), 1L)
            .otherwise(0L))
        val w = Window.orderBy("dy")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        day.withColumn("burn_days", sum("over").over(w).cast("long"))
          .select(date_format(col("dy"), "yyyy-MM-dd").as("day"),
            col("n").cast("long").as("n"),
            col("n_err").cast("long").as("n_err"),
            expr("n_err * 1000000L div n").as("err_rate_x1e6"),
            col("over").cast("long").as("over_budget"), col("burn_days"))
          .orderBy("day")
      },
      Some(
        """WITH d AS (SELECT CAST(ts AS DATE) AS dy, count(*) AS n,
          |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_err
          |  FROM events GROUP BY 1),
          |o AS (SELECT dy, n, n_err,
          |    CASE WHEN n_err * 100 > n THEN 1 ELSE 0 END AS over FROM d)
          |SELECT strftime(dy, '%Y-%m-%d') AS day, n, n_err,
          |  CAST(n_err * 1000000 // n AS BIGINT) AS err_rate_x1e6,
          |  CAST(over AS BIGINT) AS over_budget,
          |  CAST(sum(over) OVER (ORDER BY dy
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |    AS burn_days
          |FROM o ORDER BY day""".stripMargin)),

    // Classical additive seasonal decomposition (STL-lite): the
    // centered 7-day moving sum is the trend (×7 so no division enters
    // the frame), detrended = 7·y − trend_sum, and the day-of-week
    // seasonal component is the mean detrended value per dow —
    // sign-factored ×1e3 floors only at the final readout. dow from
    // (epochDays+4) mod 7 (the heatmap discipline — engine date
    // conventions never enter the gate); complete 7-day windows only.
    // The corpus collapses to the calendar-bounded day frame first; the
    // centered window runs on that tiny frame.
    "date_seasonal_decompose" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("dy"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("y"))
        val w = Window.orderBy("dy").rowsBetween(-3, 3)
        day
          .withColumn("tsum", sum("y").over(w))
          .withColumn("wn", count(lit(1)).over(w))
          .filter(col("wn") === 7)
          .withColumn("detr7", col("y") * 7 - col("tsum"))
          .groupBy(expr(
            "(datediff(dy, to_date('1970-01-01')) + 4) % 7").cast("long")
            .as("dow"))
          .agg(count(lit(1)).cast("long").as("n_days"),
            sum("detr7").cast("long").as("detr7_sum"))
          .withColumn("seasonal_x1e3",
            when(col("detr7_sum") >= 0,
              expr("detr7_sum * 1000L div (7L * n_days)"))
              .otherwise(-expr("(-detr7_sum) * 1000L div (7L * n_days)"))
              .cast("long"))
          .orderBy("dow")
      },
      Some(
        """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS dy,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
          |  FROM orders GROUP BY 1),
          |t AS (SELECT dy, y,
          |    CAST(sum(y) OVER (ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3
          |      FOLLOWING) AS BIGINT) AS tsum,
          |    count(*) OVER (ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3
          |      FOLLOWING) AS wn
          |  FROM day),
          |dt AS (SELECT (datediff('day', DATE '1970-01-01', dy) + 4) % 7 AS dow,
          |    y * 7 - tsum AS detr7
          |  FROM t WHERE wn = 7)
          |SELECT CAST(dow AS BIGINT) AS dow, count(*) AS n_days,
          |  CAST(sum(detr7) AS BIGINT) AS detr7_sum,
          |  CAST(CASE WHEN sum(detr7) >= 0
          |    THEN sum(detr7) * 1000 // (7 * count(*))
          |    ELSE -((-sum(detr7)) * 1000 // (7 * count(*))) END AS BIGINT)
          |    AS seasonal_x1e3
          |FROM dt GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Quality×duplication interaction — "are duplicates lower-quality
    // documents?", the 2×2 census that decides whether dedup and
    // quality filtering are redundant or complementary gates (if dups
    // were uniformly low quality, the quality gate would subsume
    // dedup). Shares the exact-plant corpus and the SAME quality /
    // fingerprint fragments as the dedup and curation oracles; odds
    // ratio cross-multiplied, nullif-guarded. One scan + one fp-keyed
    // family join.
    "pipeline_quality_dup_matrix" -> Q(
      (s, d) => {
        val sf = graft.ops.TextOps.scoreFrame(plantedDocs(s, d, exact = true))
        val t = sf.select(col("doc_id"),
          graft.ops.TextOps.qualityFromCounts(col("n_tokens"), col("n_punct"),
            col("s_en")).as("quality"),
          col("fp"))
        val fam = t.groupBy("fp").agg(count(lit(1)).as("fn"))
        t.join(fam, "fp")
          .select(when(col("quality") >= 7000, 1L).otherwise(0L).as("hq"),
            when(col("fn") > 1, 1L).otherwise(0L).as("dup"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("hq") === 1 && col("dup") === 0, 1L).otherwise(0L))
              .cast("long").as("hq_clean"),
            sum(when(col("hq") === 1 && col("dup") === 1, 1L).otherwise(0L))
              .cast("long").as("hq_dup"),
            sum(when(col("hq") === 0 && col("dup") === 0, 1L).otherwise(0L))
              .cast("long").as("lq_clean"),
            sum(when(col("hq") === 0 && col("dup") === 1, 1L).otherwise(0L))
              .cast("long").as("lq_dup"))
          .withColumn("odds_x1e6", expr(
            "CAST(CAST(hq_dup AS DECIMAL(38,0)) * lq_clean * 1000000 div nullif(CAST(hq_clean AS DECIMAL(38,0)) * lq_dup, 0) AS BIGINT)"))
      },
      Some(TextSql.qualityDupMatrix(minQuality = 7000))),

    // Rich-club coefficient — do the highest-degree parts also
    // co-occur with EACH OTHER (φ = realized fraction of possible
    // rich-rich edges)? The hub-interconnection scalar complementing
    // graph_assortativity's global correlation. Rich set = degree ≥ 8
    // on the support-pruned co-order graph (fixed documented
    // threshold); everything past the shared e0 derivation runs on
    // edge-count-sized frames with the rich set broadcast.
    "graph_rich_club" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb").localCheckpoint(true)
        val deg = e0.select(col("pa").as("v"))
          .unionByName(e0.select(col("pb").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val rich = deg.filter(col("deg") >= 8).select("v")
        val eRich = e0
          .join(broadcast(rich.withColumnRenamed("v", "pa")), Seq("pa"), "left_semi")
          .join(broadcast(rich.withColumnRenamed("v", "pb")), Seq("pb"), "left_semi")
          .agg(count(lit(1)).as("e_rich"))
        val tot = e0.agg(count(lit(1)).as("n_edges"))
        val nodes = deg.agg(count(lit(1)).as("n_nodes"))
        val nRich = rich.agg(count(lit(1)).as("n_rich"))
        nodes.crossJoin(broadcast(tot)).crossJoin(broadcast(nRich))
          .crossJoin(broadcast(eRich))
          .select(col("n_nodes").cast("long").as("n_nodes"),
            col("n_edges").cast("long").as("n_edges"),
            col("n_rich").cast("long").as("n_rich"),
            col("e_rich").cast("long").as("e_rich"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("e_rich")) * dec(lit(2000000L)),
              nullif(dec(col("n_rich")) * (dec(col("n_rich")) - 1),
                dec(lit(0L)))).cast("long").as("phi_x1e6"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("n_edges")) * dec(lit(2000000L)),
              nullif(dec(col("n_nodes")) * (dec(col("n_nodes")) - 1),
                dec(lit(0L)))).cast("long").as("density_x1e6"))
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |deg AS (SELECT v, count(*) AS deg FROM
          |        (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY 1),
          |rich AS (SELECT v FROM deg WHERE deg >= 8),
          |er AS (SELECT count(*) AS e_rich FROM e0
          |       WHERE pa IN (SELECT v FROM rich) AND pb IN (SELECT v FROM rich)),
          |c AS (SELECT (SELECT count(*) FROM deg) AS n_nodes,
          |    (SELECT count(*) FROM e0) AS n_edges,
          |    (SELECT count(*) FROM rich) AS n_rich,
          |    (SELECT e_rich FROM er) AS e_rich)
          |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
          |  CAST(n_edges AS BIGINT) AS n_edges,
          |  CAST(n_rich AS BIGINT) AS n_rich, CAST(e_rich AS BIGINT) AS e_rich,
          |  CAST(CAST(e_rich AS HUGEINT) * 2000000
          |    // nullif(CAST(n_rich AS HUGEINT) * (n_rich - 1), 0) AS BIGINT)
          |    AS phi_x1e6,
          |  CAST(CAST(n_edges AS HUGEINT) * 2000000
          |    // nullif(CAST(n_nodes AS HUGEINT) * (n_nodes - 1), 0) AS BIGINT)
          |    AS density_x1e6
          |FROM c""".stripMargin)),

    // Unicode NFC normalization audit — the canonical-composition pass
    // every tokenizer runs first (decomposed "e"+U+0301 and precomposed
    // "é" must not become two vocab entries). Normalization via the
    // codegen NfcNormalizeExpr (UAX #15, mirroring DuckDB's
    // nfc_normalize exactly); the corpus is ASCII so decomposed-accent
    // variants of docs 0-39 are planted under doc_id+600000 (the plant
    // discipline). Census: denormalized docs + code points saved per
    // source. ONE codegen scan.
    "text_unicode_nfc_audit" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 600000)
          .withColumn("text", concat(lit("re\u0301sume\u0301 nai\u0308ve "),
            substring(col("text"), 1, 40)))
        base.unionByName(plants)
          .select(col("source"), col("text"),
            graft.functions.NfcNormalizeExpr(col("text")).as("nfc"))
          .select(col("source"),
            when(col("text") =!= col("nfc"), 1L).otherwise(0L).as("denorm"),
            (length(col("text")) - length(col("nfc"))).cast("long").as("saved"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("denorm").cast("long").as("n_denorm"),
            sum("saved").cast("long").as("cp_saved"))
          .withColumn("denorm_rate_x1e6", expr("n_denorm * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source, 're' || chr(769) || 'sume' || chr(769) || ' nai'
          |      || chr(776) || 've ' || substring(text, 1, 40) AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source, text, nfc_normalize(text) AS nfc FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN text <> nfc THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_denorm,
          |  CAST(sum(length(text) - length(nfc)) AS BIGINT) AS cp_saved,
          |  CAST(sum(CASE WHEN text <> nfc THEN 1 ELSE 0 END) * 1000000
          |    // count(*) AS BIGINT) AS denorm_rate_x1e6
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Two-proportion A/B z² — THE experimentation statistic: purchase
    // conversion of the even-user cohort vs the odd (deterministic
    // assignment stands in for the experiment flag). z² =
    // (a·n₂ − b·n₁)²·N / (n₁·n₂·T·(N−T)) keeps every operand integral
    // (pooled-variance z-test, z² ~ χ²(1) so significance reads off
    // the same table as stats_chi2_segments). One user-grain collapse
    // then a 2-row frame.
    "stats_ab_test" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val u = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
          .withColumn("grp", (col("user_id") % 2 === 0).cast("int"))
        val g = u.groupBy("grp")
          .agg(count(lit(1)).as("n"), sum("conv").as("a"))
        g.agg(
            max(when(col("grp") === 1, col("n"))).as("n1"),
            max(when(col("grp") === 1, col("a"))).as("a1"),
            max(when(col("grp") === 0, col("n"))).as("n2"),
            max(when(col("grp") === 0, col("a"))).as("a2"))
          .select(col("n1").cast("long").as("n_even"),
            col("a1").cast("long").as("conv_even"),
            col("n2").cast("long").as("n_odd"),
            col("a2").cast("long").as("conv_odd"),
            graft.functions.GraftFunctions.longDiv(
              (dec(col("a1")) * dec(col("n2")) - dec(col("a2")) * dec(col("n1")))
                * (dec(col("a1")) * dec(col("n2")) - dec(col("a2")) * dec(col("n1")))
                * (dec(col("n1")) + dec(col("n2"))) * dec(lit(1000000L)),
              nullif(dec(col("n1")) * dec(col("n2"))
                * (dec(col("a1")) + dec(col("a2")))
                * (dec(col("n1")) + dec(col("n2")) - dec(col("a1")) - dec(col("a2"))),
                dec(lit(0L)))).cast("long").as("z2_x1e6"))
      },
      Some(
        """WITH u AS (SELECT user_id,
          |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          |  FROM events GROUP BY 1),
          |g AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS grp,
          |    count(*) AS n, CAST(sum(conv) AS HUGEINT) AS a
          |  FROM u GROUP BY 1),
          |c AS (SELECT
          |    max(CASE WHEN grp = 1 THEN n END) AS n1,
          |    max(CASE WHEN grp = 1 THEN a END) AS a1,
          |    max(CASE WHEN grp = 0 THEN n END) AS n2,
          |    max(CASE WHEN grp = 0 THEN a END) AS a2
          |  FROM g)
          |SELECT CAST(n1 AS BIGINT) AS n_even, CAST(a1 AS BIGINT) AS conv_even,
          |  CAST(n2 AS BIGINT) AS n_odd, CAST(a2 AS BIGINT) AS conv_odd,
          |  CAST((a1 * n2 - a2 * n1) * (a1 * n2 - a2 * n1)
          |      * (CAST(n1 AS HUGEINT) + n2) * 1000000
          |    // nullif(CAST(n1 AS HUGEINT) * n2 * (a1 + a2)
          |      * (n1 + n2 - a1 - a2), 0) AS BIGINT) AS z2_x1e6
          |FROM c""".stripMargin)),

    // Charset/ingest-artifact audit — control characters, replacement
    // characters (U+FFFD, the mojibake tombstone), and non-ASCII share
    // per source: the first OCR/encoding triage every crawl ingest
    // runs. Planted artifacts under doc_id+700000 prove the counters.
    // ONE codegen scan (regexp strips + lengths).
    "text_charset_audit" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 700000)
          .withColumn("text", concat(lit("bad\u0001ctl \ufffd\ufffd "),
            substring(col("text"), 1, 40)))
        base.unionByName(plants)
          .select(col("source"),
            (length(col("text")) - length(regexp_replace(col("text"),
              "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))).as("n_ctl"),
            (length(col("text")) - length(regexp_replace(col("text"),
              "\uFFFD", ""))).as("n_repl"),
            (length(col("text")) - length(regexp_replace(col("text"),
              "[^\\x00-\\x7f]", ""))).as("n_nonascii"))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("n_ctl") > 0 || col("n_repl") > 0, 1L).otherwise(0L))
              .cast("long").as("n_artifact_docs"),
            sum("n_ctl").cast("long").as("ctl_chars"),
            sum("n_repl").cast("long").as("repl_chars"),
            sum("n_nonascii").cast("long").as("nonascii_chars"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source, 'bad' || chr(1) || 'ctl ' || chr(65533) || chr(65533)
          |      || ' ' || substring(text, 1, 40) AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(text) - length(regexp_replace(text,
          |      '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS n_ctl,
          |    length(text) - length(regexp_replace(text, chr(65533), '', 'g'))
          |      AS n_repl,
          |    length(text) - length(regexp_replace(text, '[^\x00-\x7f]', '', 'g'))
          |      AS n_nonascii
          |  FROM docs)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN n_ctl > 0 OR n_repl > 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_artifact_docs,
          |  CAST(sum(n_ctl) AS BIGINT) AS ctl_chars,
          |  CAST(sum(n_repl) AS BIGINT) AS repl_chars,
          |  CAST(sum(n_nonascii) AS BIGINT) AS nonascii_chars
          |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bot-user detection census — the traffic-cleaning rule pair every
    // event pipeline runs before analytics: single-hour burst (≥ 20
    // events in one clock hour) OR type dominance (one event type ≥
    // 90% of an n ≥ 10 user's events). The organic corpus is
    // bot-free, so a deterministic 300-clicks-in-one-hour bot is
    // planted as user 9000001 (epoch-micro arithmetic both engines).
    // Three user-prefixed collapses, exact integer rules.
    "events_bot_users" -> Q(
      (s, d) => {
        val planted = s.range(300).select(
          (col("id") + 5000000L).as("event_id"),
          expr("timestamp_micros(1704067200000000L + id * 1000000L)").as("ts"),
          lit(9000001L).as("user_id"),
          lit("click").as("event_type"))
        val ev = Tables.events(s, d)
          .select("event_id", "ts", "user_id", "event_type")
          .unionByName(planted)
        val burst = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")))
          .agg(count(lit(1)).as("hn"))
          .groupBy("user_id").agg(max("hn").as("burst"))
        val dom = ev.groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("tn"))
          .groupBy("user_id")
          .agg(sum("tn").as("n"), max("tn").as("mx"))
        dom.join(burst, "user_id")
          .select(
            when(col("burst") >= 20, 1L).otherwise(0L).as("b_rule"),
            when(col("n") >= 10 && col("mx") * 10 >= col("n") * 9, 1L)
              .otherwise(0L).as("d_rule"))
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum(when(col("b_rule") + col("d_rule") > 0, 1L).otherwise(0L))
              .cast("long").as("n_bots"),
            sum(when(col("b_rule") === 1 && col("d_rule") === 0, 1L)
              .otherwise(0L)).cast("long").as("burst_only"),
            sum(when(col("b_rule") === 0 && col("d_rule") === 1, 1L)
              .otherwise(0L)).cast("long").as("dom_only"),
            sum(when(col("b_rule") === 1 && col("d_rule") === 1, 1L)
              .otherwise(0L)).cast("long").as("both_rules"))
      },
      Some(
        """WITH ev AS (
          |  SELECT event_id, ts, user_id, event_type FROM events
          |  UNION ALL
          |  SELECT 5000000 + i, make_timestamp(1704067200000000 + i * 1000000),
          |    9000001, 'click'
          |  FROM (SELECT unnest(generate_series(0, 299)) AS i)),
          |b AS (SELECT user_id, max(hn) AS burst FROM (
          |    SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS hn
          |    FROM ev GROUP BY 1, 2) GROUP BY 1),
          |t AS (SELECT user_id, CAST(sum(tn) AS BIGINT) AS n,
          |    CAST(max(tn) AS BIGINT) AS mx FROM (
          |    SELECT user_id, event_type, count(*) AS tn FROM ev GROUP BY 1, 2)
          |  GROUP BY 1),
          |r AS (SELECT
          |    CASE WHEN burst >= 20 THEN 1 ELSE 0 END AS b_rule,
          |    CASE WHEN n >= 10 AND mx * 10 >= n * 9 THEN 1 ELSE 0 END AS d_rule
          |  FROM t JOIN b USING (user_id))
          |SELECT count(*) AS n_users,
          |  CAST(sum(CASE WHEN b_rule + d_rule > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_bots,
          |  CAST(sum(CASE WHEN b_rule = 1 AND d_rule = 0 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS burst_only,
          |  CAST(sum(CASE WHEN b_rule = 0 AND d_rule = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS dom_only,
          |  CAST(sum(CASE WHEN b_rule = 1 AND d_rule = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS both_rules
          |FROM r""".stripMargin)),

    // Supplier scorecard — the procurement panel: per-supplier revenue,
    // line volume, and 30-day on-time-ship rate, ranked within nation
    // (top 3 per nation). One fact-fact keyed join (lineitem ⋈ orders
    // on orderkey) + a supplier-grain collapse; the ranking window runs
    // on the supplier-sized frame partitioned by nation.
    "supplier_scorecard" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            to_date(col("o_orderdate")).as("od")), "l_orderkey")
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("n_lines"),
            sum(expr("CAST(floor(l_extendedprice) AS BIGINT)")).as("rev"),
            sum(when(datediff(to_date(col("l_shipdate")), col("od")) <= 30, 1L)
              .otherwise(0L)).as("on_time"))
        val sc = li.join(Tables.supplier(s, d)
            .select(col("s_suppkey").as("suppkey"), col("s_nationkey")), "suppkey")
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
            "s_nationkey")
        val w = Window.partitionBy("n_name").orderBy(desc("rev"), col("suppkey"))
        sc.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("n_name").as("nation"), col("rk").cast("long").as("rk"),
            col("suppkey").cast("long").as("suppkey"),
            col("n_lines").cast("long").as("n_lines"),
            col("rev").cast("long").as("rev"),
            expr("on_time * 1000000L div n_lines").as("ontime_x1e6"))
          .orderBy("nation", "rk")
      },
      Some(
        """WITH li AS (SELECT l_suppkey AS suppkey, count(*) AS n_lines,
          |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS rev,
          |    CAST(sum(CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
          |        CAST(l_shipdate AS DATE)) <= 30 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS on_time
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          |  GROUP BY 1),
          |sc AS (SELECT n_name, suppkey, n_lines, rev, on_time,
          |    row_number() OVER (PARTITION BY n_name ORDER BY rev DESC, suppkey)
          |      AS rk
          |  FROM li JOIN supplier ON s_suppkey = suppkey
          |  JOIN nation ON n_nationkey = s_nationkey)
          |SELECT n_name AS nation, CAST(rk AS BIGINT) AS rk,
          |  CAST(suppkey AS BIGINT) AS suppkey, n_lines, rev,
          |  CAST(on_time * 1000000 // n_lines AS BIGINT) AS ontime_x1e6
          |FROM sc WHERE rk <= 3 ORDER BY nation, rk""".stripMargin)),

    // Capture–recapture vocabulary estimate (Chapman's Lincoln–Petersen)
    // — the mark-recapture estimator applied to corpus vocabulary: the
    // even-doc vocab "marks" words, the odd-doc vocab "recaptures"
    // them, N̂ = (n₁+1)(n₂+1)/(m+1) − 1. At 100 TB this is how you
    // estimate total distinct count from two partitions WITHOUT a
    // global distinct — the estimator itself is the scale story; the
    // exact corpus-wide count rides along here (testable at these SFs)
    // to expose the estimator's bias. ONE explode + a word collapse.
    "text_capture_recapture" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val w = Tables.documents(s, d)
          .select((col("doc_id") % 2 === 0).as("even"),
            explode(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')"))
              .as("w"))
          .groupBy("w")
          .agg(max(when(col("even"), 1L).otherwise(0L)).as("in_even"),
            max(when(!col("even"), 1L).otherwise(0L)).as("in_odd"))
        w.agg(sum("in_even").as("n1"), sum("in_odd").as("n2"),
            sum(col("in_even") * col("in_odd")).as("m"),
            count(lit(1)).as("actual"))
          .select(col("n1").cast("long").as("n1"),
            col("n2").cast("long").as("n2"),
            col("m").cast("long").as("m"),
            col("actual").cast("long").as("actual_vocab"),
            (graft.functions.GraftFunctions.longDiv(
              (dec(col("n1")) + 1) * (dec(col("n2")) + 1),
              dec(col("m")) + 1) - 1).cast("long").as("chapman_est"))
      },
      Some(
        """WITH w AS (SELECT w,
          |    max(CASE WHEN even THEN 1 ELSE 0 END) AS in_even,
          |    max(CASE WHEN even THEN 0 ELSE 1 END) AS in_odd
          |  FROM (SELECT doc_id % 2 = 0 AS even,
          |      unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
          |        x -> x <> '')) AS w
          |    FROM documents)
          |  GROUP BY 1)
          |SELECT CAST(sum(in_even) AS BIGINT) AS n1,
          |  CAST(sum(in_odd) AS BIGINT) AS n2,
          |  CAST(sum(in_even * in_odd) AS BIGINT) AS m,
          |  count(*) AS actual_vocab,
          |  CAST((CAST(sum(in_even) AS HUGEINT) + 1) * (sum(in_odd) + 1)
          |    // (sum(in_even * in_odd) + 1) - 1 AS BIGINT) AS chapman_est
          |FROM w""".stripMargin)),

    // Rolling-median (median filter) of daily revenue — the robust
    // smoother that kills single-day spikes a moving average smears
    // (the windowed twin of stats_max_drawdown's running extremes):
    // exact 7-day median = 4th smallest of the complete window,
    // engine-invariant (both sides sort the same 7 integers). The
    // corpus collapses to the day frame first; the window runs there.
    "date_rolling_median" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val day = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("dy"))
          .agg(sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("y"))
        val w = Window.orderBy("dy").rowsBetween(-3, 3)
        day
          .withColumn("arr", collect_list("y").over(w))
          .filter(size(col("arr")) === 7)
          .select(date_format(col("dy"), "yyyy-MM-dd").as("day"),
            col("y").cast("long").as("y"),
            element_at(sort_array(col("arr")), 4).cast("long").as("med7"))
          .withColumn("dev", (col("y") - col("med7")).cast("long"))
          .orderBy("day")
      },
      Some(
        """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS dy,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
          |  FROM orders GROUP BY 1),
          |t AS (SELECT dy, y,
          |    array_agg(y) OVER (ORDER BY dy ROWS BETWEEN 3 PRECEDING AND 3
          |      FOLLOWING) AS arr
          |  FROM day)
          |SELECT strftime(dy, '%Y-%m-%d') AS day, y,
          |  CAST(list_sort(arr)[4] AS BIGINT) AS med7,
          |  CAST(y - list_sort(arr)[4] AS BIGINT) AS dev
          |FROM t WHERE len(arr) = 7 ORDER BY day""".stripMargin)),

    // Top purchase paths — the 3-step sequence census behind "how do
    // users actually reach checkout" (the path-mining readout one level
    // deeper than events_markov_transitions' single-step matrix): for
    // every purchase with two preceding same-user events, the
    // (prev2 > prev1 > purchase) path string, top 10 by count. One
    // user-keyed window shuffle.
    "events_top_paths" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("p1", lag("event_type", 1).over(w))
          .withColumn("p2", lag("event_type", 2).over(w))
          .filter(col("event_type") === "purchase"
            && col("p1").isNotNull && col("p2").isNotNull)
          .groupBy(concat(col("p2"), lit(">"), col("p1"), lit(">purchase"))
            .as("path"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy(desc("n"), asc("path")).limit(10)
      },
      Some(
        """WITH t AS (SELECT event_type,
          |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS p1,
          |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS p2
          |  FROM events)
          |SELECT p2 || '>' || p1 || '>purchase' AS path, count(*) AS n
          |FROM t
          |WHERE event_type = 'purchase' AND p1 IS NOT NULL AND p2 IS NOT NULL
          |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // Aspect-ratio bucketing — the SDXL-style batching assignment for
    // image training (variable-aspect images batch only within a
    // bucket; assignment quality decides crop waste): each asset goes
    // to the bucket minimizing the exact cross-multiplied aspect error
    // |w·bh − h·bw|·1e6/(w·bh), ties by bucket order. The bucket set is
    // a broadcast 5-row frame; the per-asset argmin is a window over
    // the ×5 fan-out. Census per bucket with mean relative error.
    "multimodal_aspect_buckets" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val assets = graft.ops.Multimodal
          .assetsFromDocuments(Tables.documents(s, d)).toDF()
          .select(col("asset_id"), col("meta.width").as("w"),
            col("meta.height").as("h"))
        val buckets = s.createDataFrame(Seq(
          (0L, "1:1", 1L, 1L), (1L, "4:3", 4L, 3L), (2L, "3:4", 3L, 4L),
          (3L, "16:9", 16L, 9L), (4L, "9:16", 9L, 16L)))
          .toDF("bidx", "bucket", "bw", "bh")
        val wr = Window.partitionBy("asset_id")
          .orderBy(col("err_x1e6"), col("bidx"))
        assets.crossJoin(broadcast(buckets))
          .withColumn("err_x1e6", graft.functions.GraftFunctions.longDiv(
            abs(dec(col("w")) * dec(col("bh")) - dec(col("h")) * dec(col("bw")))
              * dec(lit(1000000L)),
            dec(col("w")) * dec(col("bh"))).cast("long"))
          .withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as("n_assets"),
            sum("err_x1e6").cast("long").as("err_sum_x1e6"))
          .withColumn("mean_err_x1e6", expr("err_sum_x1e6 div n_assets"))
          .orderBy("bucket")
      },
      Some(
        """WITH a AS (SELECT doc_id AS asset_id,
          |    CAST(doc_id % 640 + 16 AS BIGINT) AS w,
          |    CAST(doc_id % 480 + 16 AS BIGINT) AS h
          |  FROM documents),
          |b AS (SELECT * FROM (VALUES (0, '1:1', 1, 1), (1, '4:3', 4, 3),
          |    (2, '3:4', 3, 4), (3, '16:9', 16, 9), (4, '9:16', 9, 16))
          |  AS t(bidx, bucket, bw, bh)),
          |e AS (SELECT asset_id, bucket, bidx,
          |    CAST(abs(CAST(w AS HUGEINT) * bh - CAST(h AS HUGEINT) * bw)
          |      * 1000000 // (CAST(w AS HUGEINT) * bh) AS BIGINT) AS err_x1e6
          |  FROM a CROSS JOIN b),
          |r AS (SELECT bucket, err_x1e6,
          |    row_number() OVER (PARTITION BY asset_id
          |      ORDER BY err_x1e6, bidx) AS rk
          |  FROM e)
          |SELECT bucket, count(*) AS n_assets,
          |  CAST(sum(err_x1e6) AS BIGINT) AS err_sum_x1e6,
          |  CAST(sum(err_x1e6) // count(*) AS BIGINT) AS mean_err_x1e6
          |FROM r WHERE rk = 1 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gibberish / keyboard-mash detector — the quality rule family
    // neither Gopher's length/stopword rules nor langid covers: a doc
    // with ≥20 letters is gibberish when vowels are under 20% of
    // letters (vowels·5 < letters, strict integer) OR a 6+ consonant
    // run appears. Mash plants under doc_id+900000 prove the census.
    // ONE codegen scan (regex strips + lengths).
    "text_gibberish_detect" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
        val plants = base.filter(col("doc_id") < 40)
          .withColumn("doc_id", col("doc_id") + 900000)
          .withColumn("text", lit("zxqwv bnmkl pfftj rrghw dszxc qwrtp"))
        base.unionByName(plants)
          .select(col("source"),
            length(regexp_replace(lower(col("text")), "[^a-z]", ""))
              .as("letters"),
            length(regexp_replace(lower(col("text")), "[^aeiou]", ""))
              .as("vowels"),
            when(lower(col("text"))
              .rlike("[bcdfghjklmnpqrstvwxz]{6,}"), 1L).otherwise(0L)
              .as("has_run"))
          .withColumn("gib",
            when(col("letters") >= 20 &&
              (col("vowels") * 5 < col("letters") || col("has_run") === 1), 1L)
              .otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("gib").cast("long").as("n_gibberish"))
          .withColumn("gib_rate_x1e6", expr("n_gibberish * 1000000L div n_docs"))
          .orderBy("source")
      },
      Some(
        """WITH docs AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT source, 'zxqwv bnmkl pfftj rrghw dszxc qwrtp' AS text
          |  FROM documents WHERE doc_id < 40),
          |f AS (SELECT source,
          |    length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS letters,
          |    length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS vowels,
          |    CASE WHEN regexp_matches(lower(text), '[bcdfghjklmnpqrstvwxz]{6,}')
          |      THEN 1 ELSE 0 END AS has_run
          |  FROM docs),
          |g AS (SELECT source,
          |    CASE WHEN letters >= 20 AND (vowels * 5 < letters OR has_run = 1)
          |      THEN 1 ELSE 0 END AS gib
          |  FROM f)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(gib) AS BIGINT) AS n_gibberish,
          |  CAST(sum(gib) * 1000000 // count(*) AS BIGINT) AS gib_rate_x1e6
          |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Simpson's-paradox audit — does the even-vs-odd customer cohort
    // comparison of mean order value REVERSE inside priority strata vs
    // the aggregate? The classic aggregation trap every metrics
    // platform must surface before anyone trusts a topline delta. Mean
    // comparison by exact cross-multiplication (sign(sA·nB − sB·nA) —
    // no division anywhere); per-stratum rows plus the __ALL__
    // aggregate row from one grouping-sets-style union of the SAME
    // collapsed frame.
    "stats_simpson_check" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val o = Tables.orders(s, d)
          .select(col("o_orderpriority").as("stratum"),
            (col("o_custkey") % 2 === 0).as("ea"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("x"))
        val g = o.groupBy("stratum")
          .agg(sum(when(col("ea"), 1L).otherwise(0L)).as("n_even"),
            sum(when(col("ea"), col("x")).otherwise(0L)).as("s_even"),
            sum(when(!col("ea"), 1L).otherwise(0L)).as("n_odd"),
            sum(when(!col("ea"), col("x")).otherwise(0L)).as("s_odd"))
          .localCheckpoint(true)
        val all = g.agg(sum("n_even").as("n_even"), sum("s_even").as("s_even"),
            sum("n_odd").as("n_odd"), sum("s_odd").as("s_odd"))
          .withColumn("stratum", lit("__ALL__"))
          .select("stratum", "n_even", "s_even", "n_odd", "s_odd")
        g.select("stratum", "n_even", "s_even", "n_odd", "s_odd")
          .unionByName(all)
          .withColumn("sign_diff",
            signum((dec(col("s_even")) * dec(col("n_odd"))
              - dec(col("s_odd")) * dec(col("n_even"))).cast("double"))
              .cast("long"))
          .select(col("stratum"), col("n_even").cast("long").as("n_even"),
            col("s_even").cast("long").as("s_even"),
            col("n_odd").cast("long").as("n_odd"),
            col("s_odd").cast("long").as("s_odd"), col("sign_diff"))
          .orderBy("stratum")
      },
      Some(
        """WITH o AS (SELECT o_orderpriority AS stratum,
          |    o_custkey % 2 = 0 AS ea,
          |    CAST(floor(o_totalprice) AS BIGINT) AS x
          |  FROM orders),
          |g AS (SELECT stratum,
          |    CAST(sum(CASE WHEN ea THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
          |    CAST(sum(CASE WHEN ea THEN x ELSE 0 END) AS BIGINT) AS s_even,
          |    CAST(sum(CASE WHEN ea THEN 0 ELSE 1 END) AS BIGINT) AS n_odd,
          |    CAST(sum(CASE WHEN ea THEN 0 ELSE x END) AS BIGINT) AS s_odd
          |  FROM o GROUP BY 1),
          |u AS (SELECT * FROM g
          |      UNION ALL
          |      SELECT '__ALL__', CAST(sum(n_even) AS BIGINT),
          |        CAST(sum(s_even) AS BIGINT), CAST(sum(n_odd) AS BIGINT),
          |        CAST(sum(s_odd) AS BIGINT) FROM g)
          |SELECT stratum, n_even, s_even, n_odd, s_odd,
          |  CAST(sign(CAST(s_even AS HUGEINT) * n_odd
          |    - CAST(s_odd AS HUGEINT) * n_even) AS BIGINT) AS sign_diff
          |FROM u ORDER BY stratum""".stripMargin)),

    // Pseudo-relevance-feedback term expansion (Rocchio-style PRF) —
    // the classic retrieval loop: run BM25, mine the top-10 documents
    // for terms over-represented vs the corpus, expand the query. The
    // BM25 stage is the shared hash-green machinery; the expansion is
    // EXACT integers (lift = (df_top/10)/(df_corpus/N) ×1e6, df_top ≥ 3
    // floor, query terms excluded). Top-10 ids broadcast back into one
    // token scan; candidate frame is vocab-of-10-docs-sized.
    "search_prf_terms" -> Q(
      (s, d) => {
        val terms = Seq("spark", "join", "vector")
        val docs = Tables.documents(s, d)
        val top10 = graft.ops.TextOps.bm25TopK(docs, terms, k = 10)
          .select("doc_id")
        val toks = docs
          .select(col("doc_id"),
            explode(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')"))
              .as("w"))
        // n_docs from the TOKENIZED frame (docs with >= 1 token), the
        // same basis the oracle's corpus CTE and bm25TopK use (ADVICE
        // r9): docs.count() diverges if any document tokenizes to zero
        val n = toks.agg(countDistinct("doc_id").as("n_docs"))
        val cdf = toks.groupBy("w").agg(countDistinct("doc_id").as("dfc"))
        val tdf = toks.join(broadcast(top10), "doc_id")
          .filter(!col("w").isin(terms: _*))
          .groupBy("w").agg(countDistinct("doc_id").as("dft"))
          .filter(col("dft") >= 3)
        tdf.join(cdf, "w")
          .crossJoin(broadcast(n))
          .select(col("w").as("term"), col("dft").cast("long").as("df_top"),
            col("dfc").cast("long").as("df_corpus"),
            expr("dft * n_docs * 1000000L div (10L * dfc)").as("lift_x1e6"))
          .orderBy(desc("lift_x1e6"), asc("term")).limit(5)
      },
      Some(TextSql.prfTerms(Seq("spark", "join", "vector")))),

    // Freeman degree centralization — how star-like the co-order graph
    // is as ONE number (1 = perfect star, 0 = regular): Σ(dmax − d_i)
    // normalized by the star's maximum, (n−1)(n−2). Complements
    // graph_assortativity (correlation) and graph_rich_club (hub
    // interconnection) with the network-level concentration scalar.
    // Everything past the shared e0 derivation is one tiny aggregate.
    "graph_centralization" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val e0 = graft.ops.Basket.coOrderEdges(Tables.lineitem(s, d), minSupport = 2)
          .select("pa", "pb")
        val deg = e0.select(col("pa").as("v"))
          .unionByName(e0.select(col("pb").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        deg.agg(count(lit(1)).as("n"), max("deg").as("dmax"),
            sum("deg").as("dsum"))
          .select(col("n").cast("long").as("n_nodes"),
            col("dmax").cast("long").as("max_degree"),
            (col("dsum") / 2).cast("long").as("n_edges"),
            graft.functions.GraftFunctions.longDiv(
              (dec(col("n")) * dec(col("dmax")) - dec(col("dsum")))
                * dec(lit(1000000L)),
              nullif((dec(col("n")) - 1) * (dec(col("n")) - 2), dec(lit(0L))))
              .cast("long").as("centralization_x1e6"))
      },
      Some(
        """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |e0 AS MATERIALIZED (SELECT a.pk AS pa, b.pk AS pb
          |      FROM op a JOIN op b ON b.ok = a.ok AND a.pk < b.pk
          |      GROUP BY 1, 2 HAVING count(*) >= 2),
          |deg AS (SELECT v, count(*) AS deg FROM
          |        (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY 1),
          |c AS (SELECT CAST(count(*) AS HUGEINT) AS n,
          |    CAST(max(deg) AS HUGEINT) AS dmax,
          |    CAST(sum(deg) AS HUGEINT) AS dsum FROM deg)
          |SELECT CAST(n AS BIGINT) AS n_nodes, CAST(dmax AS BIGINT) AS max_degree,
          |  CAST(dsum // 2 AS BIGINT) AS n_edges,
          |  CAST((n * dmax - dsum) * 1000000
          |    // nullif((n - 1) * (n - 2), 0) AS BIGINT) AS centralization_x1e6
          |FROM c""".stripMargin)),

    // Business-day shipping lag — calendar arithmetic the engine must
    // own (finance and logistics SLAs count working days): lag_bd =
    // g(ship) − g(order) where g(d) = business days before d since a
    // Monday anchor, in PURE integer arithmetic ((days div 7)·5 +
    // least(days mod 7, 5) — no engine weekday convention in the
    // gate). Per-priority histogram + exact mean ×1e3 from one
    // fact-fact keyed join.
    "date_business_days" -> Q(
      (s, d) => {
        val j = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            col("o_orderpriority").as("prio"),
            to_date(col("o_orderdate")).as("od")), "l_orderkey")
          .withColumn("d1",
            expr("CAST(datediff(od, to_date('1970-01-05')) AS BIGINT)"))
          .withColumn("d2",
            expr("CAST(datediff(to_date(l_shipdate), to_date('1970-01-05')) AS BIGINT)"))
          .withColumn("bd", expr(
            "(d2 div 7) * 5 + least(d2 % 7, 5) - ((d1 div 7) * 5 + least(d1 % 7, 5))"))
        j.groupBy("prio")
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum("bd").cast("long").as("bd_sum"),
            sum(when(col("bd") <= 5, 1L).otherwise(0L)).cast("long")
              .as("n_le_5"),
            sum(when(col("bd") > 5 && col("bd") <= 20, 1L).otherwise(0L))
              .cast("long").as("n_6_20"),
            sum(when(col("bd") > 20, 1L).otherwise(0L)).cast("long")
              .as("n_gt_20"))
          .withColumn("mean_bd_x1e3", expr("bd_sum * 1000L div n_lines"))
          .orderBy("prio")
      },
      Some(
        """WITH j AS (SELECT o_orderpriority AS prio,
          |    CAST(datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
          |      AS BIGINT) AS d1,
          |    CAST(datediff('day', DATE '1970-01-05', CAST(l_shipdate AS DATE))
          |      AS BIGINT) AS d2
          |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
          |b AS (SELECT prio,
          |    (d2 // 7) * 5 + least(d2 % 7, 5)
          |      - ((d1 // 7) * 5 + least(d1 % 7, 5)) AS bd
          |  FROM j)
          |SELECT prio, count(*) AS n_lines,
          |  CAST(sum(bd) AS BIGINT) AS bd_sum,
          |  CAST(sum(CASE WHEN bd <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_le_5,
          |  CAST(sum(CASE WHEN bd > 5 AND bd <= 20 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_6_20,
          |  CAST(sum(CASE WHEN bd > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_20,
          |  CAST(sum(bd) * 1000 // count(*) AS BIGINT) AS mean_bd_x1e3
          |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Difference-in-differences — the workhorse causal panel estimator:
    // treatment = even customers, cutoff = the corpus midpoint date
    // (broadcast 1-row anchor), effect = (T_post − T_pre) −
    // (C_post − C_pre) over mean order value. Each cell mean is
    // floored ×1e3 (dollars are non-negative so floor = truncate both
    // engines, documented quantization); the DiD combines the four
    // FLOORED means so both engines agree bit-for-bit. One collapse to
    // a 4-cell frame.
    "stats_did_estimator" -> Q(
      (s, d) => {
        val mid = Tables.orders(s, d)
          .agg(expr("CAST(min(to_date(o_orderdate)) AS DATE)").as("mn"),
            expr("CAST(max(to_date(o_orderdate)) AS DATE)").as("mx"))
          .select(expr("date_add(mn, CAST(datediff(mx, mn) div 2 AS INT))")
            .as("cut"))
        val cell = Tables.orders(s, d)
          .crossJoin(broadcast(mid))
          .groupBy((col("o_custkey") % 2 === 0).as("treat"),
            (to_date(col("o_orderdate")) >= col("cut")).as("post"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(floor(o_totalprice) AS BIGINT)")).as("sx"))
          .withColumn("mean_x1e3", expr("sx * 1000L div n"))
        cell.agg(
            max(when(col("treat") && col("post"), col("mean_x1e3"))).as("tp"),
            max(when(col("treat") && !col("post"), col("mean_x1e3"))).as("tr"),
            max(when(!col("treat") && col("post"), col("mean_x1e3"))).as("cp"),
            max(when(!col("treat") && !col("post"), col("mean_x1e3"))).as("cr"),
            sum("n").as("n_orders"))
          .select(col("n_orders").cast("long").as("n_orders"),
            col("tp").cast("long").as("treat_post_x1e3"),
            col("tr").cast("long").as("treat_pre_x1e3"),
            col("cp").cast("long").as("ctrl_post_x1e3"),
            col("cr").cast("long").as("ctrl_pre_x1e3"),
            ((col("tp") - col("tr")) - (col("cp") - col("cr"))).cast("long")
              .as("did_x1e3"))
      },
      Some(
        """WITH mid AS (SELECT date_add(min(CAST(o_orderdate AS DATE)),
          |    CAST(datediff('day', min(CAST(o_orderdate AS DATE)),
          |      max(CAST(o_orderdate AS DATE))) // 2 AS INT)) AS cut
          |  FROM orders),
          |cell AS (SELECT o_custkey % 2 = 0 AS treat,
          |    CAST(o_orderdate AS DATE) >= cut AS post,
          |    count(*) AS n,
          |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sx
          |  FROM orders CROSS JOIN mid GROUP BY 1, 2),
          |m AS (SELECT treat, post, n, sx * 1000 // n AS mean_x1e3 FROM cell),
          |c AS (SELECT
          |    max(CASE WHEN treat AND post THEN mean_x1e3 END) AS tp,
          |    max(CASE WHEN treat AND NOT post THEN mean_x1e3 END) AS tr,
          |    max(CASE WHEN NOT treat AND post THEN mean_x1e3 END) AS cp,
          |    max(CASE WHEN NOT treat AND NOT post THEN mean_x1e3 END) AS cr,
          |    CAST(sum(n) AS BIGINT) AS n_orders
          |  FROM m)
          |SELECT n_orders, CAST(tp AS BIGINT) AS treat_post_x1e3,
          |  CAST(tr AS BIGINT) AS treat_pre_x1e3,
          |  CAST(cp AS BIGINT) AS ctrl_post_x1e3,
          |  CAST(cr AS BIGINT) AS ctrl_pre_x1e3,
          |  CAST((tp - tr) - (cp - cr) AS BIGINT) AS did_x1e3
          |FROM c""".stripMargin)),

    // New-vs-returning revenue split per month — the growth-accounting
    // panel every subscription/commerce report leads with: an order is
    // "new" when it falls in its customer's first-order month. Reuses
    // the cohort algebra (customer-keyed first-order collapse + one
    // keyed join back); the month frame is calendar-bounded.
    "date_new_vs_returning" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), to_date(col("o_orderdate")).as("od"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("rev"))
        val first = o.groupBy("ck").agg(min("od").as("fd"))
        o.join(first, "ck")
          .withColumn("is_new",
            when(date_format(col("od"), "yyyy-MM")
              === date_format(col("fd"), "yyyy-MM"), 1L).otherwise(0L))
          .groupBy(date_format(col("od"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(when(col("is_new") === 1, col("rev")).otherwise(0L))
              .cast("long").as("new_rev"),
            sum(when(col("is_new") === 0, col("rev")).otherwise(0L))
              .cast("long").as("returning_rev"))
          .withColumn("new_share_x1e6", expr(
            "new_rev * 1000000L div nullif(new_rev + returning_rev, 0L)"))
          .orderBy("month")
      },
      Some(
        """WITH o AS (SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
          |    CAST(floor(o_totalprice) AS BIGINT) AS rev FROM orders),
          |f AS (SELECT ck, min(od) AS fd FROM o GROUP BY 1),
          |j AS (SELECT strftime(od, '%Y-%m') AS month,
          |    CASE WHEN strftime(od, '%Y-%m') = strftime(fd, '%Y-%m')
          |      THEN 1 ELSE 0 END AS is_new, rev
          |  FROM o JOIN f USING (ck))
          |SELECT month, count(*) AS n_orders,
          |  CAST(sum(CASE WHEN is_new = 1 THEN rev ELSE 0 END) AS BIGINT)
          |    AS new_rev,
          |  CAST(sum(CASE WHEN is_new = 0 THEN rev ELSE 0 END) AS BIGINT)
          |    AS returning_rev,
          |  CAST(sum(CASE WHEN is_new = 1 THEN rev ELSE 0 END) * 1000000
          |    // nullif(sum(rev), 0) AS BIGINT) AS new_share_x1e6
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Power analysis — how many observations per arm to detect a 5%
    // lift in mean event value at α=0.05 / power 0.80 (two-sided
    // z-test): n = 2σ²(z_α/2+z_β)²/δ² with δ = μ/20 collapses to the
    // PURE INTEGER form n = 6272·(nΣx²−S²) div S² + 1 (the constant
    // 2·(1.96+0.84)²·400 rounds to the shared integer 6272 — both
    // engines use the literal, so no float enters the gate; +1 after
    // the floor stands in for the ceil). The experiment-design
    // complement of stats_ab_test. One collapse to a k-row frame.
    "stats_power_analysis" -> Q(
      (s, d) => {
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"),
            sum(dec(col("x")) * dec(col("x"))).as("qx"))
          .select(col("event_type"), col("n").cast("long").as("n_obs"),
            graft.functions.GraftFunctions.longDiv(
              dec(col("sx")) * dec(lit(100L)), dec(col("n")))
              .cast("long").as("mean_c_x100"),
            (graft.functions.GraftFunctions.longDiv(
              dec(lit(6272L)) * (dec(col("n")) * col("qx") - col("sx") * col("sx")),
              nullif(col("sx") * col("sx"), dec(lit(0L))))
              .cast("long") + 1).as("n_per_arm"))
          .orderBy("event_type")
      },
      Some(
        """WITH g AS (SELECT event_type, count(*) AS n,
          |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
          |      AS sx,
          |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
          |        * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS qx
          |  FROM events GROUP BY 1)
          |SELECT event_type, CAST(n AS BIGINT) AS n_obs,
          |  CAST(sx * 100 // n AS BIGINT) AS mean_c_x100,
          |  CAST(6272 * (n * qx - sx * sx) // nullif(sx * sx, 0) + 1
          |    AS BIGINT) AS n_per_arm
          |FROM g ORDER BY 1""".stripMargin))

  )
}
