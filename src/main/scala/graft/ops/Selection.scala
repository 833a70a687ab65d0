package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Data selection via importance resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every document by how much more likely its hashed-ngram
  * features are under a TARGET distribution than under the RAW corpus
  * distribution, then keep the top-weighted docs.
  *
  * Scale shape: two token-stream aggregations (target counts, raw
  * counts) collapse into a FIXED-SIZE bucket table (`buckets` rows —
  * the hashing trick caps the model at a constant regardless of corpus
  * size), which broadcasts back onto the token stream for the per-doc
  * sum. No corpus self-join, no vocabulary-sized shuffle: at 100 TB the
  * plan is scan → map-side-combined agg (buckets cells) → broadcast
  * join → per-doc agg. Per-bucket log-ratio scores are floored to ×1e6
  * BIGINT before the per-doc sum, so document totals are order-free
  * integer sums (engine- and layout-invariant); the four ln() calls sit
  * in one fixed-parenthesization expression mirrored verbatim in the
  * DuckDB oracle.
  */
object Selection {

  /** (doc_id, bigram-occurrence) rows — token pairs with multiplicity,
    * built from the whitespace token stream (array-order transform, no
    * shuffle).
    */
  private[graft] def bigramRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("bg", explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))")))
      .select("doc_id", "lang", "source", "bg")

  /** Per-document DSIR importance weights against the `targetLang`
    * slice: avg over the doc's bigrams of
    * floor((ln(ct+1) − ln(cr+1) + ln(Tr+B) − ln(Tt+B)) · 1e6), where
    * ct/cr are the bigram's hashed-bucket counts in the target/raw
    * streams and Tt/Tr the stream totals (add-one smoothing over B
    * buckets). Returns every doc scored; callers rank and cut.
    */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
      buckets: Int = 4096): DataFrame = {
    val bg = bigramRows(docs)
      .withColumn("bucket", pmod(GraftFunctions.md5Hash60(col("bg")), lit(buckets.toLong)))
    // raw + target counts in ONE map-side-combined pass (a conditional
    // sum rides the same shuffle as the count); totals then come from
    // the buckets-row frame, so the corpus is scanned exactly twice —
    // once for the model, once for the per-doc scoring join.
    val counts = bg.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val model = counts
      .crossJoin(broadcast(totals))
      .withColumn("score_x1e6", floor(
        (log(col("ct") + 1) - log(col("cr") + 1)
          + log(col("tr") + lit(buckets.toLong))
          - log(col("tt") + lit(buckets.toLong))) * 1e6).cast("long"))
      .select("bucket", "score_x1e6")
    bg.join(broadcast(model), "bucket")
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("score_x1e6").as("w"))
      .withColumn("avg_score_x1e6",
        expr("w div n_bigrams").cast("long"))
      .select("doc_id", "lang", "source", "n_bigrams", "avg_score_x1e6")
  }

  /** UniMax language allocation (Chung et al., ICLR 2023): spend a
    * token budget across languages as uniformly as possible subject to
    * a per-language repeat cap (capacity · maxEpochs). The greedy
    * ascending allocation has a closed water-filling form, so no
    * iteration is needed: languages whose cap fits under the running
    * fair share take their cap, the rest split the remainder exactly
    * (integer division, remainder distributed deterministically in
    * sort order — the allocation sums to the budget EXACTLY).
    *
    * Scale shape: one corpus aggregation to a |languages|-row frame;
    * every window after that runs on that tiny frame (the
    * shard-budget prefix-frame discipline — never a corpus-sized
    * window). All arithmetic is exact integers.
    */
  def unimaxAllocation(docs: DataFrame, tokenCol: String = "n_chars",
      budgetNum: Long = 9, budgetDen: Long = 10, maxEpochs: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lt = docs.groupBy("lang")
      .agg(sum(col(tokenCol)).cast("long").as("toks"))
    val budget = lt.agg((sum("toks") * budgetNum).cast("long").as("bn"))
      .select(expr(s"bn div $budgetDen").cast("long").as("budget"))
    val ord = Window.orderBy(col("cap"), col("lang"))
    val s = lt.withColumn("cap", col("toks") * maxEpochs)
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("p", sum("cap").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val f = s.crossJoin(broadcast(budget))
      .withColumn("isfull",
        (col("cap") * (col("n") - col("i") + 1) <=
          col("budget") - (col("p") - col("cap"))).cast("int"))
    val k = f.agg(
      coalesce(max(when(col("isfull") === 1, col("i"))), lit(0L)).cast("long").as("k"),
      coalesce(max(when(col("isfull") === 1, col("p"))), lit(0L)).cast("long").as("pk"))
    f.crossJoin(broadcast(k))
      .withColumn("alloc",
        when(col("i") <= col("k"), col("cap"))
          .otherwise(expr(
            """(budget - pk) div (n - k)
              | + if(i - k <= (budget - pk) % (n - k), 1L, 0L)""".stripMargin))
          .cast("long"))
      .select(col("lang"), col("toks"), col("alloc"),
        expr("alloc * 1000000 div toks").cast("long").as("epochs_x1e6"))
  }
}
