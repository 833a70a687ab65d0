package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TriplePattern

/** One declared query: the Spark plan plus its DuckDB oracle (None for
  * the documented rows-only set). Hoisted out of [[Queries]] when the
  * registry was split into per-family slice files. */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Helpers shared by every registry slice file (verbatim moves from the
  * pre-split Queries.scala). */
private[api] object QueriesShared {
  def pat(subj: String = "", pred: String = "", obj: String = ""): TriplePattern =
    TriplePattern.fromStrings(subj, pred, obj)

  def withCte(sql: String): String = s"WITH ${StarTriples.sqlCte}\n$sql"

  // Single source of truth for graph_k_truss's k: the Spark call and the
  // oracle's unrolled support threshold (sup >= k - 2) must move together
  // (ADVICE r9: a hardcoded 'sup >= 1' silently desyncs if k changes).
  val kTrussK = 3

  /** Planted near-duplicates: docs with doc_id < 50 re-appended under
    * doc_id+100000 (exact copies, or tail-perturbed for the near-dup
    * detectors). The synthetic corpus has no natural dups, so detectors
    * would otherwise be vacuous; the same construction lives in the SQL
    * oracle (TextSql.plantCte).
    */
  def plantedDocs(s: SparkSession, d: String, exact: Boolean): DataFrame = {
    val base = Tables.documents(s, d)
    val p0 = base.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 100000)
    val plants = if (exact) p0
      else p0.withColumn("text", concat(col("text"), lit(" planted dup tail")))
    base.unionByName(plants)
  }

  /** Contained-quote plants for the containment detector: docs with
    * doc_id < 20 re-appended under doc_id+200000 with text = their first
    * 40 whitespace tokens — fully embedded in the parent (containment
    * 1.0) yet near-invisible to Jaccard (≈ 38/|parent shingles|). Same
    * construction in the SQL oracle (TextSql.plantQuoteCte).
    */
  def plantedQuoteDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
    val quotes = base.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 40)))
    base.unionByName(quotes)
  }
}
