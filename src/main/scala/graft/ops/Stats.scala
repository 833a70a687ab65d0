package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.longDiv

/** Distribution statistics that classically need a GLOBAL sort/rank,
  * re-expressed with the two-phase bucketed-prefix-sum discipline
  * (pipeline_shard_budget's pattern) so no stage ever sees a
  * SinglePartition window over the data.
  */
object Stats {

  /** Exact dense ranking of `valueCol` (ties broken by `tieCol`) without
    * a global-window sort: rows are range-bucketed by value
    * (`bucket = value div bucketWidth` — order-preserving across
    * buckets), ranked per-bucket with an ordinary partitioned window,
    * and shifted by per-bucket offsets computed on the tiny
    * bucket-totals frame (the only SinglePartition window, over
    * O(value_range / bucketWidth) rows — a function of the VALUE DOMAIN,
    * not the corpus). Equivalent to
    * `row_number() OVER (ORDER BY value, tie)` because bucket boundaries
    * respect the value order and ties never straddle buckets.
    *
    * At 100 TB this is the difference between a single-reducer sort of
    * every entity and a keyed window: per-bucket width is bounded by the
    * value distribution (skewed buckets degrade to a wide partition, the
    * same failure AQE skew handling addresses), and the offsets frame
    * stays KB-sized.
    */
  def bucketedRank(df: DataFrame, valueCol: String, tieCol: String,
      bucketWidth: Long): DataFrame = {
    val bucketed = df.withColumn("_bkt", expr(s"$valueCol div $bucketWidth"))
    val inBkt = bucketed.withColumn("_rn",
      row_number().over(Window.partitionBy("_bkt").orderBy(valueCol, tieCol)))
    // offsets: rows strictly before each bucket; the frame has one row
    // per OCCUPIED bucket, so the window input is tiny by construction
    val offsets = bucketed.groupBy("_bkt").agg(count(lit(1)).as("_bn"))
      .withColumn("_off",
        coalesce(sum("_bn").over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_off")
    inBkt.join(broadcast(offsets), "_bkt")
      .withColumn("rank", (col("_off") + col("_rn")).cast("long"))
      .drop("_bkt", "_rn", "_off")
  }

  /** Gini coefficient of a non-negative integer measure, exact in fixed
    * point: G·10⁶ = floor((2·Σ rank·x − (n+1)·Σx) · 10⁶ / (n·Σx)) under
    * the deterministic ranking above. All arithmetic in DECIMAL(38,0) —
    * hash-identical to the oracle's HUGEINT.
    */
  def giniX1e6(ranked: DataFrame, valueCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    ranked
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        sum(dec(col("rank")) * dec(col(valueCol))).as("rx"))
      .select(col("n").cast("long").as("n_entities"),
        col("total").cast("long").as("total_value"),
        longDiv(
          (dec(lit(2)) * dec(col("rx")) - (dec(col("n")) + dec(lit(1))) * dec(col("total")))
            * dec(lit(1000000L)),
          dec(col("n")) * dec(col("total"))).cast("long").as("gini_x1e6"))
  }
}
