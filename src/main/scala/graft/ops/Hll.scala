package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deterministic HyperLogLog (Flajolet et al. 2007) over the 60-bit md5
  * hash — the mergeable distinct-count sketch, built so that EVERY bit
  * is engine-replayable: register index = top [[P]] hash bits, rank
  * rho = leading-zero count of the remaining [[W]] bits + 1 computed
  * via the minimal binary-string length (`bin()` — exact integer/string
  * arithmetic on both Spark and DuckDB, no float log2), and the raw
  * estimate alpha·m²/Σ2^−M_j evaluated in exact integer arithmetic
  * (the Σ is a dyadic rational: scaled by 2^[[W10]] it is an integer
  * sum; alpha enters as one shared ×1e9 literal and the final division
  * is a floor div). Unlike approx_count_distinct (whose HLL++ registers
  * are not replayable in SQL, hence `agg_approx_stats` is rows-only),
  * this sketch hash-gates against the DuckDB oracle.
  *
  * Scale shape: one map-side-combined max() aggregation to a
  * (group × ≤m)-row register frame; merge across shards/batches is
  * per-register max (commutative + idempotent), the identity the
  * streaming twin and a 100 TB incremental pipeline rely on. The raw
  * estimate is reported WITHOUT the small-range linear-counting
  * correction — v_zero rides along so a reader can apply it; the point
  * here is the mergeable machinery, and the exact count rides along as
  * the accuracy readout.
  */
object Hll {
  /** Register-index bits (m = 2^P = 1024 registers). */
  val P = 10
  val M: Long = 1L << P
  /** Rank bits: the 60-bit hash minus the index bits. */
  val W = 50
  /** alpha_1024 = 0.7213/(1 + 1.079/m), the standard bias constant,
    * floored ×1e9 — ONE literal shared by the Spark plan and the SQL
    * mirror (the oracle string interpolates this val). */
  val AlphaX1e9: Long = (0.7213 / (1.0 + 1.079 / M.toDouble) * 1e9).toLong
  /** Exact integer numerator of the scaled estimate:
    * alpha_x1e9 · m² · 2^(W+1) · 1000 (≈ 1.7e36, inside DECIMAL(38,0));
    * est_x1e3 = Num div T div 1e9 with T = Σ 2^(W+1 − M_j) over all m
    * registers — the +1 keeps the exponent non-negative at the maximal
    * rank rho = W+1 (floor-div composition is exact for
    * non-negatives). */
  val NumX: BigInt = BigInt(AlphaX1e9) * M * M * (BigInt(1) << (W + 1)) * 1000

  /** Per-(group, register) max rank over `keyCol`'s hash — the sketch
    * state. Works UNCHANGED on a batch frame or a stream in complete
    * mode (state = used registers per group, ≤ m rows FOREVER):
    * disorder-immune and mergeable by per-register max.
    */
  def registers(rows: DataFrame, grp: String, keyCol: Column): DataFrame =
    rows
      .withColumn("h", GraftFunctions.md5Hash60(keyCol))
      .withColumn("idx", expr(s"h div ${1L << W}"))
      .withColumn("rem", col("h") % lit(1L << W))
      .withColumn("rho", when(col("rem") === 0, lit(W + 1).cast("long"))
        .otherwise(lit(W + 1).cast("long") - length(bin(col("rem")))))
      .groupBy(col(grp), col("idx"))
      .agg(max("rho").as("rho"))

  /** Readout over a register frame: used/zero register counts, an
    * order-free register digest (Σ (idx+1)·rho — pins the full register
    * vector, not just its summary), and the raw HLL estimate ×1e3 in
    * exact integer arithmetic.
    */
  def estimate(regs: DataFrame, grp: String): DataFrame =
    regs.groupBy(grp)
      .agg(count(lit(1)).as("m_used"),
        sum(expr(s"shiftleft(1L, ${W + 1} - CAST(rho AS INT))")).as("t_used"),
        sum(expr("(idx + 1) * rho")).cast("long").as("register_digest"))
      .withColumn("v_zero", lit(M) - col("m_used"))
      .withColumn("t", col("t_used").cast("decimal(38,0)") +
        col("v_zero").cast("decimal(38,0)") * lit(1L << (W + 1)))
      // ONE combined divisor (floor(a/t/k) = floor(a/(t·k)) for positive
      // integers): the two-step `div t div 1e9` form's FIRST quotient is
      // IntegralDivide's LongType and overflows once the estimate tops
      // ~9.2e6 per group (ADVICE r10); t·1e9 ≤ 2.3e30 stays inside
      // DECIMAL(38,0) and the final quotient is the ≤1e3·n estimate,
      // Long-safe up to ~9.2e15 distinct (beyond any 100 TB corpus)
      .withColumn("est_x1e3",
        expr(s"CAST(CAST('$NumX' AS DECIMAL(38,0)) div " +
          "(t * CAST(1000000000 AS DECIMAL(38,0))) AS BIGINT)"))
      // linear-counting small-range term m·ln(m/V) — the correction a
      // reader applies when est < 2.5m; the one float op in the sketch
      // (identical op order in the SQL mirror; margins in FloatGateSpec)
      .withColumn("lc_x1e3", when(col("v_zero") > 0,
        floor(log(lit(M.toDouble) / col("v_zero").cast("double")) *
          lit(M.toDouble) * lit(1000.0)).cast("long")))
      .select(col(grp), col("m_used").cast("long").as("m_used"),
        col("v_zero").cast("long").as("v_zero"),
        col("register_digest"), col("est_x1e3"), col("lc_x1e3"))

  /** The declared one-shot path: sketch + readout + the exact distinct
    * count as the accuracy column. */
  def distinctSketch(rows: DataFrame, grp: String, keyCol: Column): DataFrame = {
    val est = estimate(registers(rows, grp, keyCol), grp)
    val exact = rows.groupBy(grp).agg(countDistinct(keyCol).as("exact"))
    est.join(exact, grp)
      .withColumn("exact", col("exact").cast("long"))
      .orderBy(grp)
  }

  /** DuckDB mirror of [[distinctSketch]] over events/event_id — replays
    * the identical hash → index/rank → register-max → exact-integer
    * estimate chain; `bin()` is the same minimal-binary-string function
    * on both engines, and [[AlphaX1e9]]/[[NumX]] are interpolated from
    * the SAME vals the Spark plan uses.
    */
  def oracleSql: String = oracleSqlFor("events", "event_type", "event_id")

  /** The same mirror parameterized over (table, group column, key
    * column) — round-11 reuses the replayable chain for
    * `agg_approx_stats` over lineitem/(l_returnflag, l_partkey). */
  def oracleSqlFor(table: String, grp: String, key: String): String = {
    val h60 = graft.api.GraphSql.md5Hash60(s"CAST($key AS VARCHAR)")
    s"""WITH h AS (SELECT $grp AS event_type, $h60 AS h FROM $table),
       |r AS (SELECT event_type, h // ${1L << W} AS idx, h % ${1L << W} AS rem FROM h),
       |rr AS (SELECT event_type, idx,
       |    max(CASE WHEN rem = 0 THEN ${W + 1} ELSE ${W + 1} - length(bin(rem)) END) AS rho
       |  FROM r GROUP BY 1, 2),
       |e AS (SELECT event_type, count(*) AS m_used,
       |    sum(CAST(1 AS BIGINT) << (${W + 1} - CAST(rho AS INT))) AS t_used,
       |    CAST(sum((idx + 1) * rho) AS BIGINT) AS register_digest
       |  FROM rr GROUP BY 1),
       |x AS (SELECT $grp AS event_type, CAST(count(DISTINCT $key) AS BIGINT) AS exact
       |      FROM $table GROUP BY 1)
       |SELECT e.event_type AS $grp, CAST(m_used AS BIGINT) AS m_used,
       |  CAST($M - m_used AS BIGINT) AS v_zero, register_digest,
       |  CAST(CAST('$NumX' AS HUGEINT)
       |    // ((CAST(t_used AS HUGEINT)
       |        + CAST($M - m_used AS HUGEINT) * (CAST(1 AS HUGEINT) << ${W + 1}))
       |       * 1000000000) AS BIGINT) AS est_x1e3,
       |  CASE WHEN m_used < $M THEN
       |    CAST(floor(ln($M.0 / CAST($M - m_used AS DOUBLE)) * $M.0 * 1000.0)
       |      AS BIGINT) END AS lc_x1e3,
       |  exact
       |FROM e JOIN x ON x.event_type = e.event_type
       |ORDER BY 1""".stripMargin
  }
}
