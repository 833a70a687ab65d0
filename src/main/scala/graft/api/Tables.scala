package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md) and the canonical
  * triples view derived from the star schema.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (rejected by Spark's
    * reader unless read as long via the legacy conf) and, since the
    * round-7 regeneration, plain TIMESTAMP(MICROS) without UTC
    * adjustment (read as TIMESTAMP_NTZ). Normalize BOTH to a
    * session-tz (UTC) micros TIMESTAMP so every downstream query sees
    * one type. The nanos path uses integer division — NOT double
    * division, which silently loses precision above 2^53 ns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Canonical triples view over the star schema — the graph the triple
    * queries and the oracle SQL both see. Node ids are `<kind>:<key>`;
    * entity attributes become literal-object triples and foreign keys
    * become node-object edges (the reference's Freebase-style shape,
    * FIXTURES.md §A.1). Deterministic, no floats.
    *
    * Must stay in lockstep with [[StarTriples.sqlCte]].
    */
  def starTriples(s: SparkSession, d: String): DataFrame = {
    // cached DataFrames strongly reference their session, so a weak key
    // would never clear (WeakHashMap's documented value->key pitfall);
    // instead sweep entries of stopped contexts on access. Residual:
    // sessions discarded while their shared context lives on stay
    // pinned — callers churning newSession() per request should clear
    // caches themselves (this engine uses one long-lived session)
    triplesMemo.keySet.removeIf(sess => sess.sparkContext.isStopped)
    triplesMemo.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(d, _ => buildStarTriples(s, d).cache())
  }

  /** One cached triples view per (session, dir): every triple/graph
    * query reads the same materialization instead of re-deriving the
    * 8-way union per query. Keyed by session object identity (no
    * cross-session collisions); see the sweep above for lifetime.
    */
  private val triplesMemo = java.util.Collections.synchronizedMap(
    new java.util.HashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def buildStarTriples(s: SparkSession, d: String): DataFrame = {
    def t(df: DataFrame, subj: org.apache.spark.sql.Column, pred: String,
        obj: org.apache.spark.sql.Column): DataFrame =
      df.select(subj.cast("string").as("subj"), lit(pred).as("pred"),
        obj.cast("string").as("obj"))
    val cust = customer(s, d); val nat = nation(s, d); val reg = region(s, d)
    val ord = orders(s, d); val supp = supplier(s, d)
    Seq(
      t(cust, concat(lit("cust:"), col("c_custkey")), "name", col("c_name")),
      t(cust, concat(lit("cust:"), col("c_custkey")), "mktsegment", col("c_mktsegment")),
      t(cust, concat(lit("cust:"), col("c_custkey")), "nation",
        concat(lit("nation:"), col("c_nationkey"))),
      t(nat, concat(lit("nation:"), col("n_nationkey")), "name", col("n_name")),
      t(nat, concat(lit("nation:"), col("n_nationkey")), "region",
        concat(lit("region:"), col("n_regionkey"))),
      t(reg, concat(lit("region:"), col("r_regionkey")), "name", col("r_name")),
      t(ord, concat(lit("order:"), col("o_orderkey")), "customer",
        concat(lit("cust:"), col("o_custkey"))),
      t(supp, concat(lit("supp:"), col("s_suppkey")), "nation",
        concat(lit("nation:"), col("s_nationkey")))
    ).reduce(_ unionAll _)
      .withColumn("lang", lit(""))
      .withColumn("author", lit(""))
      .withColumn("sig", lit(""))
      .withColumn("created", lit(0L))
  }
}

/** The DuckDB-side rendering of [[Tables.starTriples]] for oracle SQL. */
object StarTriples {
  /** WITH-clause body defining `triples(subj,pred,obj)`. */
  val sqlCte: String =
    """triples AS (
      |  SELECT 'cust:' || c_custkey AS subj, 'name' AS pred, c_name AS obj FROM customer
      |  UNION ALL SELECT 'cust:' || c_custkey, 'mktsegment', c_mktsegment FROM customer
      |  UNION ALL SELECT 'cust:' || c_custkey, 'nation', 'nation:' || c_nationkey FROM customer
      |  UNION ALL SELECT 'nation:' || n_nationkey, 'name', n_name FROM nation
      |  UNION ALL SELECT 'nation:' || n_nationkey, 'region', 'region:' || n_regionkey FROM nation
      |  UNION ALL SELECT 'region:' || r_regionkey, 'name', r_name FROM region
      |  UNION ALL SELECT 'order:' || o_orderkey, 'customer', 'cust:' || o_custkey FROM orders
      |  UNION ALL SELECT 'supp:' || s_suppkey, 'nation', 'nation:' || s_nationkey FROM supplier
      |)""".stripMargin
}
