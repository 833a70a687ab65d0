package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boundary-margin audit for every hash-gated query whose output floors
  * (or rounds) an IEEE transcendental: the cross-engine hash gate
  * compares floor(f(x)·scale) computed by Spark (java.lang.Math) and
  * DuckDB (libm). Both produce correctly-rounded-to-≤1-ulp doubles, so
  * the gate can only flip if a floored term sits within ~ulp of an
  * integer boundary. This spec measures, at sf0.01, the minimum
  * distance of every floored term from its nearest integer boundary and
  * asserts it exceeds [[FloatGateSpec.Eps]] — turning "hash-matches
  * today" into "cannot flip on a last-ulp libm difference".
  *
  * Enumerated float-gated queries (every `log(` site in the declared
  * Spark plans; grep-complete over Queries.scala + ops/):
  *   - events_survival_km      floor(ln((ar−e)/ar)·1e6)       per day
  *   - stats_psi_sources       floor((p−q)·ln(p/q)·1e9)       per cell
  *   - pipeline_dsir_sample    floor((Δln)·1e6)               per bucket
  *   - text_zipf_slope         floor(ln(rnk)·1e6), floor(ln(cnt)·1e6)
  *   - events_type_entropy     floor(c·ln c·1e6) + day combine
  *   - search_ql_dirichlet     floor(ln(int/int)·1e6)           per cell
  *   - agg_hll_distinct        floor(m·ln(m/V)·1e3) LC term     per group
  *   - text_tfidf_topterms     round(tf·ln(nd/df), 6) — a ROUND gate;
  *                             its boundary is the half-integer of x·1e6
  * (text_bigram_surprisal, named alongside these in round-9 review, is
  * ln-free — exact BIGINT rationals — and needs no margin.)
  *
  * Terms that are exactly 0.0 are algebraically forced (ln(1), or a
  * symmetric cancellation of identical ln operands): every IEEE libm
  * returns exactly 0.0 for ln(1.0), so these cannot diverge and are
  * excluded from the minimum rather than counted as zero margin.
  */
class FloatGateSpec extends SparkSpecBase {
  import FloatGateSpec.Eps

  private val sf = "/root/testdata/sf0.01"

  /** Min distance of column `x` from its nearest integer boundary,
    * excluding algebraically-forced exact zeros (see class doc). */
  private def assertFloorMargin(name: String, terms: DataFrame): Unit = {
    val frac = col("x") - floor(col("x"))
    val row = terms.filter(col("x") =!= 0.0)
      .select(min(least(frac, lit(1.0) - frac)).as("m"),
        count(lit(1)).as("n"))
      .head
    val (m, n) = (row.getDouble(0), row.getLong(1))
    info(f"$name: min boundary margin $m%.3e over $n terms")
    assert(n > 0, s"$name: no nonzero terms to audit")
    assert(m > Eps,
      f"$name: min boundary margin $m%.3e within $Eps%.0e of an integer")
  }

  test("events_survival_km: KM ln-term margins clear the boundary") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.api.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
    val per = ev.groupBy("user_id")
      .agg(min("day").as("t0"),
        min(when(col("event_type") === "purchase", col("day"))).as("conv"))
    val maxDay = ev.agg(max("day").as("mx"))
    val byDay = per.crossJoin(broadcast(maxDay))
      .withColumn("converted", col("conv").isNotNull)
      .withColumn("dur", when(col("converted"),
        datediff(col("conv"), col("t0"))).otherwise(datediff(col("mx"), col("t0")))
        .cast("long"))
      .groupBy("dur")
      .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("e"),
        sum(when(col("converted"), 0L).otherwise(1L)).as("c"))
    // global window over the tiny grouped frame is intentional; the
    // WindowExec warning is silenced suite-wide in SparkSpecBase
    // (a literal partitionBy would be folded away — SPARK-42525)
    val wc = Window.orderBy("dur")
    val terms = byDay
      .withColumn("at_risk",
        sum(col("e") + col("c")).over(wc.rowsBetween(0, Window.unboundedFollowing)))
      .filter(col("at_risk") > col("e"))
      .select((log((col("at_risk") - col("e")).cast("double") /
        col("at_risk").cast("double")) * lit(1000000.0)).as("x"))
    assertFloorMargin("events_survival_km", terms)
  }

  test("stats_psi_sources: per-cell PSI term margins clear the boundary") {
    val docs = graft.api.Tables.documents(spark, sf)
      .withColumn("b", least(expr("n_chars div 256"), lit(19L)))
    val cell = docs.groupBy("source", "b").agg(count(lit(1)).as("c"))
    val bySrc = docs.groupBy("source").agg(count(lit(1)).as("ns"))
    val byB = docs.groupBy("b").agg(count(lit(1)).as("qc"))
    val n = docs.agg(count(lit(1)).as("nn"))
    val terms = bySrc.crossJoin(broadcast(byB)).crossJoin(broadcast(n))
      .join(cell, Seq("source", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("p", (col("c") + 1).cast("double") / (col("ns") + 20).cast("double"))
      .withColumn("q", (col("qc") + 1).cast("double") / (col("nn") + 20).cast("double"))
      .select(((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e9)).as("x"))
    assertFloorMargin("stats_psi_sources", terms)
  }

  test("pipeline_dsir_sample: per-bucket log-ratio margins clear the boundary") {
    val buckets = 4096
    val bg = graft.ops.Selection.bigramRows(graft.api.Tables.documents(spark, sf))
      .withColumn("bucket",
        pmod(graft.functions.GraftFunctions.md5Hash60(col("bg")), lit(buckets.toLong)))
    val counts = bg.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val terms = counts.crossJoin(broadcast(totals))
      .select(((log(col("ct") + 1) - log(col("cr") + 1)
        + log(col("tr") + lit(buckets.toLong))
        - log(col("tt") + lit(buckets.toLong))) * 1e6).as("x"))
    assertFloorMargin("pipeline_dsir_sample", terms)
  }

  test("text_zipf_slope: per-point log margins clear the boundary") {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.api.Tables.documents(spark, sf)
      .select(explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val pts = tf
      .withColumn("rnk", row_number().over(Window.orderBy(desc("cnt"), asc("w"))))
      .filter(col("rnk") <= 1000)
    val terms = pts.select((log(col("rnk")) * 1e6).as("x"))
      .union(pts.select((log(col("cnt")) * 1e6).as("x")))
    assertFloorMargin("text_zipf_slope", terms)
  }

  test("events_type_entropy: cell terms and day combine clear the boundary") {
    val cell = graft.api.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("x", col("c").cast("double") *
        log(col("c").cast("double")) * lit(1000000.0))
    assertFloorMargin("events_type_entropy cells", cell.select("x"))
    // the day-level combine floors (ln(n)·n·1e6 − Σterm)/n — Σterm is
    // the already-floored integer sum, exactly as the query computes it
    val combine = cell
      .withColumn("term", floor(col("x")).cast("long"))
      .groupBy("day")
      .agg(sum("c").as("n"), sum("term").as("s"))
      .select(((log(col("n").cast("double")) * col("n").cast("double") *
        lit(1000000.0) - col("s").cast("double")) / col("n").cast("double")).as("x"))
    assertFloorMargin("events_type_entropy combine", combine)
  }

  test("search_ql_dirichlet: per-term log-likelihood margins clear the boundary") {
    val terms = Seq("spark", "join", "vector")
    val mu = 2000L
    val docs = graft.api.Tables.documents(spark, sf)
    val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val cf = toks.filter(col("w").isin(terms: _*))
      .groupBy("w").agg(count(lit(1)).as("cf"))
    val ct = toks.agg(count(lit(1)).as("c_total"))
    val tf = toks.filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val grid = dl.crossJoin(broadcast(cf.crossJoin(broadcast(ct))))
      .join(tf, Seq("doc_id", "w"), "left")
      .withColumn("tf", coalesce(col("tf"), lit(0L)))
      .select((log(
        (col("tf") * col("c_total") + lit(mu) * col("cf")).cast("double") /
          (col("c_total") * (col("dl") + lit(mu))).cast("double")) * lit(1e6)).as("x"))
    assertFloorMargin("search_ql_dirichlet", grid)
  }

  test("sim_tfidf_sparse: per-cell weight margins clear the boundary") {
    val docs = graft.api.Tables.documents(spark, sf)
    val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val dfc = tf.groupBy("w").agg(count(lit(1)).as("df")).filter(col("df") <= 128)
    val terms = tf.join(dfc, "w").crossJoin(broadcast(nd))
      .select((col("tf") * log(col("n_docs").cast("double") / col("df")) *
        lit(1000.0)).as("x"))
    assertFloorMargin("sim_tfidf_sparse", terms)
  }

  test("agg_hll_distinct: linear-counting term margins clear the boundary") {
    val regs = graft.ops.Hll.registers(
      graft.api.Tables.events(spark, sf), "event_type", col("event_id"))
    val terms = regs.groupBy("event_type").agg(count(lit(1)).as("m_used"))
      .withColumn("v_zero", lit(graft.ops.Hll.M) - col("m_used"))
      .filter(col("v_zero") > 0)
      .select((log(lit(graft.ops.Hll.M.toDouble) / col("v_zero").cast("double")) *
        lit(graft.ops.Hll.M.toDouble) * lit(1000.0)).as("x"))
    assertFloorMargin("agg_hll_distinct lc", terms)
  }

  test("text_tfidf_topterms: round-gate margins clear the half-integer boundary") {
    // tfidf = round(tf · ln(nd/df), 6): the gate flips when tf·ln(nd/df)
    // crosses a half-integer of ×1e6, so the at-risk distance is
    // |frac(x·1e6) − 0.5|. Rebuild the pre-round doubles from the same
    // frame the operator aggregates (TextOps.tfidfTopTerms inputs).
    val docs = graft.api.Tables.documents(spark, sf).filter(col("doc_id") <= 30L)
    val tok = docs.select(col("doc_id"),
        explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("w"))
      .filter(col("w") =!= "")
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nd = docs.agg(countDistinct("doc_id").as("n_docs"))
    val x = tf.join(df, "w").crossJoin(broadcast(nd))
      .select((col("tf") * log(col("n_docs").cast("double") / col("df")) * lit(1e6)).as("x6"))
      .filter(col("x6") =!= 0.0)
    val m = x.select(min(abs(col("x6") - floor(col("x6")) - lit(0.5))).as("m"))
      .head.getDouble(0)
    info(f"text_tfidf_topterms: min half-integer margin = $m%.3e")
    assert(m > Eps, f"round-gate margin $m%.3e within $Eps%.0e of a half-integer")
  }
}

object FloatGateSpec {
  /** Asserted lower bound on every floored term's distance from its
    * integer boundary, in units of the floored quantity. A last-ulp
    * libm divergence on x ~ 1e7 moves it by ~2e-9; 1e-6 gives three
    * orders of magnitude of headroom while sitting far below the
    * ~1/(2·terms) expected minimum of a uniform fractional part.
    */
  val Eps = 1e-6
}
