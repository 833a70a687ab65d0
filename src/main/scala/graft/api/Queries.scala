package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The declared operator surface: every entry is one operator from
  * SURVEY.md §2 (or a flagged extension), exercised over the driver
  * testdata, with a DuckDB oracle where SQL can express it.
  *
  * Conventions (driver compare protocol):
  *  - column names identical in Spark and oracle SQL (alias everything);
  *  - deterministic ORDER BY on both sides;
  *  - money math in DECIMAL(12,2) internally, but every FINAL numeric
  *    column is DOUBLE or BIGINT: the driver compare normalizes through
  *    pandas, where DuckDB DECIMAL and HUGEINT silently become float64
  *    while Spark-parquet DECIMAL stays Decimal — emitting DOUBLE/BIGINT
  *    keeps both readings identical (tools/compare.py checks both).
  */

object Queries {

  /** The full declared surface, in the original declaration order —
    * the slice files are contiguous, order-preserving extractions of
    * the one pre-split ListMap literal (round-10 verdict stretch #8:
    * mechanical split, zero semantic change). */
  val registry: scala.collection.immutable.ListMap[String, Q] =
    scala.collection.immutable.ListMap((
      QueriesParity.entries ++
      QueriesStar.entries ++
      QueriesGraphX.entries ++
      QueriesText.entries ++
      QueriesDedup.entries ++
      QueriesSimilarity.entries ++
      QueriesMultimodal.entries ++
      QueriesWavesA.entries ++
      QueriesWavesB.entries ++
      QueriesWavesC.entries ++
      QueriesSketchEval.entries): _*)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }

}
