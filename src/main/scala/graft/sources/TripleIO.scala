package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.store.TripleStore

/** Interchange formats for triple data — the reference's external
  * surface is JSON (insert body core/http.go:41-59; dump
  * core/http.go:122-130); CSV and parquet are added for pipeline
  * interop. All readers conform rows to the triple schema (missing
  * provenance → proto3 zero values, null identities rejected).
  */
object TripleIO {

  def readJson(spark: SparkSession, path: String): DataFrame =
    TripleStore.conform(
      spark.read
        .schema("subj STRING, pred STRING, obj STRING, lang STRING, " +
          "author STRING, sig STRING, created LONG")
        .option("mode", "PERMISSIVE")
        .json(path))

  def readCsv(spark: SparkSession, path: String): DataFrame =
    TripleStore.conform(
      spark.read
        .option("header", "true")
        .schema("subj STRING, pred STRING, obj STRING, lang STRING, " +
          "author STRING, sig STRING, created LONG")
        .csv(path))

  def readParquet(spark: SparkSession, path: String): DataFrame =
    TripleStore.conform(spark.read.parquet(path))

  /** ORC round-trips the schema like parquet (columnar, predicate
    * pushdown, min/max stats) — included so warehouses standardized on
    * ORC can consume/produce triple data without a transcode step.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    TripleStore.conform(spark.read.orc(path))

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
