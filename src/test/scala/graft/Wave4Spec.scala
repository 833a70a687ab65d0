package graft

import org.apache.spark.sql.functions._

import graft.api.Queries

/** Semantics gates for the round-9 later waves, on CRAFTED fixtures
  * with hand-computed expectations (the oracle gate proves engine
  * agreement; these prove the statistic itself). Same discipline as
  * Wave3Spec: registry queries run unchanged on a minimal parquet
  * corpus; op-level functions are driven directly on in-memory frames.
  */
class Wave4Spec extends SparkSpecBase {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val dir = tmpDir("w4-events")
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("runs test: alternating above/below hours give runs = n, hand-computed moments") {
    // hourly volumes [1, 5, 1, 5]: total 12, nh 4; sign = x·4 > 12 ⇒
    // F,T,F,T ⇒ 4 runs, a = 2 above, b = 2 below.
    // expected·1e6 = 1e6·(n + 2ab)/n = 1e6·(4+8)/4 = 3_000_000;
    // var·1e6 = 2ab(2ab−n)·1e6/(n²(n−1)) = 8·4·1e6/(16·3) = 666_666.
    var id = 0L
    val rows = Seq(0 -> 1, 1 -> 5, 2 -> 1, 3 -> 5).flatMap { case (h, n) =>
      (0 until n).map { j =>
        id += 1
        (id, f"2024-03-01 $h%02d:$j%02d:00", 1L, "a", 0.0, "{}")
      }
    }
    val out = Queries.registry("stats_runs_test").fn(spark, writeEvents(rows))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_hours") == 4 && r.getAs[Long]("n_above") == 2 &&
      r.getAs[Long]("n_below") == 2 && r.getAs[Long]("runs") == 4)
    assert(r.getAs[Long]("expected_x1e6") == 3000000L)
    assert(r.getAs[Long]("var_x1e6") == 666666L)
  }

  test("KM survival: crafted conversions and censoring, hand-computed log survival") {
    // u1: first day0, purchase day0 (dur 0); u2: first day0, purchase
    // day2 (dur 2); u3: first day0, never purchases, corpus ends day3
    // (censored dur 3); u4: first day1 = purchase (dur 0).
    // d=0: e=2, r=4 → term floor(ln(2/4)·1e6) = −693148
    // d=2: e=1, r=2 → −693148 again; d=3: censoring only, term 0.
    val rows = Seq(
      (1L, "2024-03-01 10:00:00", 1L, "purchase", 0.0, "{}"),
      (2L, "2024-03-01 09:00:00", 2L, "view", 0.0, "{}"),
      (3L, "2024-03-03 09:00:00", 2L, "purchase", 0.0, "{}"),
      (4L, "2024-03-01 08:00:00", 3L, "view", 0.0, "{}"),
      (5L, "2024-03-04 08:00:00", 3L, "view", 0.0, "{}"),
      (6L, "2024-03-02 12:00:00", 4L, "purchase", 0.0, "{}"))
    val out = Queries.registry("events_survival_km").fn(spark, writeEvents(rows))
      .collect().map(r => (r.getAs[Long]("day_offset"), r.getAs[Long]("n_conv"),
        r.getAs[Long]("n_censored"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("log_surv_x1e6")))
    assert(out.toSeq == Seq(
      (0L, 2L, 0L, 4L, -693148L),
      (2L, 1L, 0L, 2L, -1386296L),
      (3L, 0L, 1L, 1L, -1386296L)))
  }

  test("gap islands: planted streaks {1,2,3} and {7,8} land in the right histogram cells") {
    val days = Seq(1, 2, 3, 7, 8)
    val rows = days.zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, f"2024-03-$d%02d 10:00:00", 1L, "a", 0.0, "{}")
    }
    val out = Queries.registry("window_gap_islands").fn(spark, writeEvents(rows))
      .collect().map(r => (r.getAs[Long]("streak_len"), r.getAs[Long]("n_streaks"),
        r.getAs[Long]("n_users")))
    assert(out.toSeq == Seq((2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("EMD: identical per-source distributions give 0; a full shift gives 63/2 bins") {
    // identical: both sources equal the corpus mix exactly ⇒ 0
    val dir1 = tmpDir("w4-docs")
    val same = (1 to 40).map { i =>
      // A = docs 1-20, B = docs 21-40 — both carry the SAME length
      // multiset {100,101,102,103}×5, so each equals the corpus ECDF
      (i.toLong, "x", "en", if (i <= 20) "A" else "B", (100 + (i % 4)).toLong)
    }
    same.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    val out1 = Queries.registry("stats_emd_sources").fn(spark, dir1).collect()
    assert(out1.forall(_.getAs[Long]("emd_x1e6") == 0L),
      s"identical mix must have zero EMD: ${out1.mkString(",")}")

    // full separation: A all length 100 (bin 0), B all length 200
    // (bin 63). Per bin b in 0..62: |cumA·nAll − cumAll·nA| = n²;
    // bin 63 contributes 0 ⇒ EMD·1e6 = 63n²·1e6/(n·2n) = 31_500_000.
    val dir2 = tmpDir("w4-docs2")
    val shifted = (1 to 20).map(i => (i.toLong, "x", "en", "A", 100L)) ++
      (21 to 40).map(i => (i.toLong, "x", "en", "B", 200L))
    shifted.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = Queries.registry("stats_emd_sources").fn(spark, dir2)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("emd_x1e6")).toMap
    assert(out2 == Map("A" -> 31500000L, "B" -> 31500000L))
  }

  test("cosine AUC: perfectly separable labels score exactly 1e6") {
    // label 0 → [1,0], label 1 → [0,1]: same-label cosine 1, cross 0,
    // no cross-group ties ⇒ AUC = 1 exactly.
    val dir = tmpDir("w4-embs")
    (0 until 10).map { i =>
      (i.toLong, if (i < 5) Array(1.0f, 0.0f) else Array(0.0f, 1.0f),
        if (i < 5) 0 else 1)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Queries.registry("emb_cosine_auc").fn(spark, dir).collect().head
    assert(out.getAs[Long]("n_same") > 0 && out.getAs[Long]("n_diff") > 0)
    assert(out.getAs[Long]("auc_x1e6") == 1000000L,
      s"separable data must score AUC 1e6: $out")
  }

  test("HITS: star bipartite ranks the shared part first, leaves equal below") {
    // c1 buys p1,p2,p3 (orders 1,2) and c2 buys p1 (orders 3,4): p1 is
    // the consensus authority, p2 and p3 symmetric below it. The L∞
    // rescale pins the max at 2^20 every round.
    val li = Seq((1L, 1L), (1L, 2L), (1L, 3L), (3L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val o = Seq((1L, 100L), (3L, 200L)).toDF("o_orderkey", "o_custkey")
    val out = graft.ops.Basket.hitsBipartite(li, o, rounds = 3, k = 10)
      .collect().map(r => r.getAs[Long]("part_id") -> r.getAs[Long]("auth_x2p20"))
    assert(out.head._1 == 1L && out.head._2 == (1L << 20),
      s"shared part must lead at the rescale cap: ${out.mkString(",")}")
    val rest = out.filter(_._1 != 1L).toMap
    assert(rest.keySet == Set(2L, 3L) && rest(2L) == rest(3L) &&
      rest(2L) < (1L << 20), s"leaves must tie below the hub part: ${out.mkString(",")}")
  }

  test("label propagation: two planted cliques resolve to two min-label communities") {
    // cliques {1,2,3} and {10,11,12}: every pair co-ordered twice
    // (support 2). Min-of-modes converges each clique to its minimum
    // label.
    def clique(parts: Seq[Long], baseOrder: Long) =
      for (rep <- 0 to 1; p <- parts)
        yield (baseOrder + rep, p)
    val li = (clique(Seq(1L, 2L, 3L), 1L) ++ clique(Seq(10L, 11L, 12L), 100L))
      .toDF("l_orderkey", "l_partkey")
    val out = graft.ops.Basket.labelPropagation(li, rounds = 3, minSupport = 2, k = 10)
      .collect().map(r => r.getAs[Long]("community") -> r.getAs[Long]("n_members"))
    assert(out.toSet == Set(1L -> 3L, 10L -> 3L),
      s"expected two 3-member communities labeled 1 and 10: ${out.mkString(",")}")
  }
}
