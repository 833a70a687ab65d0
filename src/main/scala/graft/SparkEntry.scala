package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.api.{Queries, Tables}
import graft.engine.Engine
import graft.model.{ArrayOp, TriplePattern}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 3-hop traversal over the derived triples graph:
    * orders → customer → nation → name (SURVEY §2 #11).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    def pat(subj: String = "", pred: String = "") =
      TriplePattern.fromStrings(subj = subj, pred = pred)
    Engine.traverse(Tables.starTriples(spark, dir), Seq(
      ArrayOp.of(pat(subj = "order:1"), pat(subj = "order:2"), pat(subj = "order:3")),
      ArrayOp.of(pat(pred = "nation")),
      ArrayOp.of(pat(pred = "name"))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
