package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.LongDotProduct

/** Spectral embedding analysis: the dominant principal component of the
  * embedding cloud by fixed-point power iteration — the direction a
  * whitening / de-biasing pipeline removes first (Mu & Viswanath 2018,
  * "All-but-the-Top", arXiv:1702.01417).
  *
  * The covariance matrix is never materialized: each power step is the
  * matrix-free form v' = Σ_rows q·(qᵀv) (q = centered quantized vector),
  * i.e. ONE corpus pass computing a codegen'd BIGINT dot per row
  * ([[graft.functions.LongDotProduct]]) followed by a per-dimension
  * aggregation (posexplode → groupBy(dim), dim-bounded output). All
  * arithmetic is exact integers: vectors quantized to ×1e6 BIGINT,
  * iterate scaled to |v|∞ = 2²⁰ by truncating integral division after
  * each step, per-dim sums in DECIMAL(38,0) — engine- and
  * layout-invariant, so the unrolled DuckDB oracle gates it hash-exact.
  *
  * Scale shape: iters × (one scan + one dim-sized aggregation); driver
  * state is the dim-length iterate (guarded). At 100 TB each step is an
  * embarrassingly parallel scan with a map-side-combined 64-row
  * aggregate — the same cost class as emb_dim_stats per step.
  */
object Spectral {

  /** |v|∞ scale of the iterate between steps (2²⁰). */
  val Scale: Long = 1L << 20

  /** Max dimensionality kept as driver state (the iterate + mean). */
  val MaxDim = 4096

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Dominant principal direction after `iters` power steps from the
    * all-ones iterate. Returns (d, v) — 1-based dimension index and the
    * component at ×2²⁰ scale, the LAST step computed in-plan (earlier
    * steps collect only the dim-length sums to the driver, like the
    * IVF/BPE bounded-model loops).
    */
  def pcaPower(embs: DataFrame, iters: Int = 3): DataFrame = {
    val dim = embs.select(size(col("embedding"))).head.getInt(0)
    require(dim <= MaxDim, s"pcaPower driver iterate capped at $MaxDim dims, got $dim")

    val xq = embs.select(expr(
      "transform(cast(embedding as array<double>), x -> cast(floor(x * 1000000) as bigint))").as("xq"))
    // per-dim truncating-mean (×1e6): one pass, dim-row output
    val muRows = xq.select(posexplode(col("xq")).as(Seq("d0", "x")))
      .groupBy("d0")
      .agg(expr("sum(x) div count(1)").cast("long").as("mu"))
      .collect().map(r => r.getAs[Int]("d0") -> r.getAs[Long]("mu")).toMap
    val mu = (0 until dim).map(muRows)
    val muLit = array(mu.map(lit): _*)
    val qc = xq.select(zip_with(col("xq"), muLit, (a, b) => a - b).as("q")).cache()

    // one power step: per-dim DECIMAL sums of q_d · (q·v); v enters as
    // a BIGINT literal array so the dot is one codegen'd primitive loop
    def stepSums(v: Seq[Long]): DataFrame = qc
      .withColumn("dot", LongDotProduct(col("q"), array(v.map(lit): _*)))
      .select(posexplode(col("q")).as(Seq("d0", "qd")), col("dot"))
      .groupBy("d0")
      .agg(sum(dec(col("qd")) * dec(col("dot"))).as("s"))

    def normalize(sums: Map[Int, BigInt]): Seq[Long] = {
      val mx = (0 until dim).map(d => sums(d).abs).max.max(BigInt(1))
      (0 until dim).map(d => ((sums(d) * Scale) / mx).toLong)
    }

    var v: Seq[Long] = Seq.fill(dim)(Scale)
    for (_ <- 1 until iters) {
      val sums = stepSums(v).collect()
        .map(r => r.getAs[Int]("d0") -> BigInt(r.getDecimal(1).toBigInteger)).toMap
      v = normalize(sums)
    }
    // final step stays in the plan: sums → global max|s| → rescale
    val sums = stepSums(v)
    val mx = sums.agg(max(abs(col("s"))).as("mx"))
    sums.crossJoin(broadcast(mx))
      .select((col("d0") + 1).cast("long").as("d"),
        expr(s"cast(s * $Scale div greatest(mx, cast(1 as decimal(38,0))) as bigint)").as("v"))
      .orderBy("d")
  }
}
