package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deterministic Count-Min sketch (Cormode & Muthukrishnan 2005) over
  * the 60-bit md5 hash family — the ADDITIVE mergeable frequency
  * sketch, completing the sketch shelf: merge is per-cell SUM (vs the
  * replayable HLL's per-register max and Misra-Gries' counter merge),
  * and the point estimate min_j C[j][h_j(k)] never undercounts. Like
  * [[Hll]], every bit is engine-replayable — row j's hash is the j-th
  * disjoint 10-bit slice of ONE 60-bit md5 of the key (see [[cellOf]]),
  * so the DuckDB oracle reproduces the exact counter table and the
  * gate is a hash match, not an accuracy bound.
  *
  * Scale shape: the counter build is ONE map-side-combined aggregation
  * of rows×[[D]] into a fixed [[D]]×[[Width]] table (4096 cells — the
  * shuffle is cell-keyed and tiny regardless of corpus size); point
  * queries probe D cells per key. State for the streaming twin is the
  * same 4096 additive cells FOREVER.
  */
object CountMin {
  /** Hash rows (depth). */
  val D = 4
  /** Counters per row. */
  val Width = 1024L

  /** Cell index of the pre-hashed key in row `j`: the j-th disjoint
    * 10-bit slice of the 60-bit md5 — ONE md5 per row instead of D
    * (measured 2.4× on the hot stage at 10×, where the single-file
    * test corpus gives the scan stage one task); disjoint slices of an
    * ideal hash are independent uniform hashes, so each row keeps the
    * CM pairwise-independence requirement. Same bit arithmetic in the
    * oracle (`>>`/`&` on BIGINT).
    */
  private def cellOf(j: Column, h: Column): Column =
    call_function("shiftright", h, j * lit(10)).bitwiseAND(lit(Width - 1))

  /** The D×Width counter table as (j, cell, c) rows — additive,
    * mergeable, and streaming-safe (complete-mode state is ≤ 4096
    * rows of commutative sums FOREVER). */
  def counters(rows: DataFrame, keyCol: Column): DataFrame =
    rows.select(GraftFunctions.md5Hash60(keyCol).as("h"))
      .withColumn("j", explode(expr(s"sequence(0, ${D - 1})")))
      .withColumn("cell", cellOf(col("j"), col("h")))
      .groupBy("j", "cell").agg(count(lit(1)).as("c"))

  /** Point-estimate readout for the exact top-k keys: est =
    * min over rows of the probed cell, which is ≥ exact by
    * construction; `overcount` is the collision mass. The top-k frame
    * is a distributed sort-limit; the probe join is k·D rows against
    * the 4096-cell table.
    */
  def pointEstimates(rows: DataFrame, keyCol: Column, topK: Int = 10): DataFrame = {
    val ctr = counters(rows, keyCol)
    val top = rows.groupBy(keyCol.as("k")).agg(count(lit(1)).as("exact"))
      .orderBy(desc("exact"), asc("k")).limit(topK)
    top
      .withColumn("h", GraftFunctions.md5Hash60(col("k")))
      .withColumn("j", explode(expr(s"sequence(0, ${D - 1})")))
      .withColumn("cell", cellOf(col("j"), col("h")))
      .join(ctr, Seq("j", "cell"))
      .groupBy("k")
      .agg(max("exact").cast("long").as("exact"),
        min("c").cast("long").as("cm_est"))
      .select(col("k").cast("long").as("user_id"), col("exact"),
        col("cm_est"), (col("cm_est") - col("exact")).as("overcount"))
      .orderBy(desc("exact"), asc("user_id"))
  }

  /** DuckDB mirror of [[pointEstimates]] over events/user_id. */
  def oracleSql(topK: Int = 10): String = {
    val h60 = graft.api.GraphSql.md5Hash60("CAST(user_id AS VARCHAR)")
    val jlist = (0 until D).mkString(", ")
    s"""WITH rh AS (SELECT $h60 AS h FROM events),
       |cells AS (
       |  SELECT j, (h >> (10 * j)) & ${Width - 1} AS cell, count(*) AS c
       |  FROM rh CROSS JOIN (SELECT unnest([$jlist]) AS j) j GROUP BY 1, 2),
       |topu AS (
       |  SELECT user_id, count(*) AS exact,
       |    ${graft.api.GraphSql.md5Hash60("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events GROUP BY 1
       |  ORDER BY exact DESC, user_id LIMIT $topK),
       |probes AS (
       |  SELECT t.user_id, t.exact, j.j, (t.h >> (10 * j.j)) & ${Width - 1} AS cell
       |  FROM topu t CROSS JOIN (SELECT unnest([$jlist]) AS j) j)
       |SELECT p.user_id, CAST(max(p.exact) AS BIGINT) AS exact,
       |  CAST(min(c.c) AS BIGINT) AS cm_est,
       |  CAST(min(c.c) - max(p.exact) AS BIGINT) AS overcount
       |FROM probes p JOIN cells c ON c.j = p.j AND c.cell = p.cell
       |GROUP BY 1 ORDER BY exact DESC, user_id""".stripMargin
  }
}
