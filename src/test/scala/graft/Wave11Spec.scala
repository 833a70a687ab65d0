package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 twenty-third wave on crafted
  * fixtures with hand-computed expectations: DP sensitivity shares and
  * the strict 1% threshold, centroid-representative ranking with the
  * centroid member itself at distance 0, and MaxSim label retrieval
  * including negative dots.
  */
class Wave11Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeEmb(dir: String, rows: Seq[(Long, Seq[Float], Int)]): Unit =
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  test("sensitivity audit: dominant user share 99%, strict 1% threshold excludes the boundary user") {
    // type 'buy': user 1 contributes 99 × 1.00 = 9900c, user 2 one
    // 1.00 = 100c. total 10000c ⇒ max share 990000; user 2 sits
    // EXACTLY at 1% (100·100 = 10000, not >) ⇒ n_over_1pct = 1.
    val dir = tmpDir("w11-dp")
    ((1 to 99).map(i => (i.toLong, s"2024-03-01 00:${"%02d".format(i % 60)}:00",
        1L, "buy", 1.00, "{}")) :+
      (100L, "2024-03-01 01:00:00", 2L, "buy", 1.00, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Queries.registry("privacy_sensitivity_audit").fn(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("total_c") == 10000L)
    assert(r.getAs[Long]("max_user_c") == 9900L)
    assert(r.getAs[Long]("n_over_1pct") == 1L)
    assert(r.getAs[Long]("max_share_x1e6") == 990000L)
  }

  test("centroid representatives: centroid member first, equidistant flanks tie-break on vec_id") {
    // label 0 at values 0, 1, 2 (q = 0, 1e6, 2e6): centroid 1e6,
    // t = 3q − 3e6 ⇒ dist_q = 0 for v2, 1e12 for v1/v3 (tie → vec_id).
    val dir = tmpDir("w11-rep")
    writeEmb(dir, Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(1.0f), 0), (3L, Seq(2.0f), 0)))
    val out = Queries.registry("emb_centroid_representatives").fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("label"), r.getAs[Long]("rk"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("dist_q"))).toSeq
    assert(out == Seq(
      (0L, 1L, 2L, 0L),
      (0L, 2L, 1L, 1000000000000L),
      (0L, 3L, 3L, 1000000000000L)))
  }

  test("maxsim: labels ranked by max dot per query, negative dots rank last") {
    // Queries: vec 0 (label 0, [1.0]) and vec 1 (label 1, [-1.0]);
    // corpus adds vec 10 (label 2, [2.0]). Dots for q0: L2=2e12 >
    // L0=1e12 > L1=-1e12; mirrored for q1.
    val dir = tmpDir("w11-maxsim")
    writeEmb(dir, Seq(
      (0L, Seq(1.0f), 0), (1L, Seq(-1.0f), 1), (10L, Seq(2.0f), 2)))
    val out = Queries.registry("sim_maxsim_label").fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rk"),
        r.getAs[Long]("label"), r.getAs[Long]("maxdot_q"))).toSeq
    assert(out == Seq(
      (0L, 1L, 2L, 2000000000000L),
      (0L, 2L, 0L, 1000000000000L),
      (0L, 3L, 1L, -1000000000000L),
      (1L, 1L, 1L, 1000000000000L),
      (1L, 2L, 0L, -1000000000000L),
      (1L, 3L, 2L, -2000000000000L)))
  }
}
