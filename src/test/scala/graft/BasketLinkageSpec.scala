package graft

import org.apache.spark.sql.functions._

import graft.ops.{Basket, Linkage, Selection}

/** Round-9 operator family: market-basket mining, blocked record
  * linkage, canonicalization dedup, DSIR data selection — crafted
  * fixtures with hand-computed answers, plus plan-shape pins for the
  * declared queries built on them.
  */
class BasketLinkageSpec extends SparkSpecBase {
  import spark.implicits._

  private def baskets = Seq(
    // orders 1,2: {A,B,C}; 3: {A,B}; 4: {C,D} — co-pair support
    // AB=3, AC=2, BC=2, CD=1
    (1L, 101L), (1L, 102L), (1L, 103L),
    (2L, 101L), (2L, 102L), (2L, 103L),
    (3L, 101L), (3L, 102L),
    (4L, 103L), (4L, 104L)
  ).toDF("l_orderkey", "l_partkey")

  test("co-order edges prune below the support threshold") {
    val e = Basket.coOrderEdges(baskets, minSupport = 2)
      .orderBy("pa", "pb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e.toSeq == Seq((101L, 102L, 3L), (101L, 103L, 2L), (102L, 103L, 2L)))
  }

  test("association rules: hand-computed confidence and lift") {
    val rows = Basket.assocRules(baskets, minSupport = 2)
      .orderBy("pa", "pb").collect()
    val ab = rows.find(r => r.getLong(0) == 101L && r.getLong(1) == 102L).get
    // n_both=3, n_a=3, n_b=3, n_orders=4
    assert(ab.getAs[Long]("conf_ab_x1e6") == 1000000L)
    assert(ab.getAs[Long]("lift_x1e6") == 3L * 4L * 1000000L / 9L)
  }

  test("triangle census finds the single planted triangle") {
    val r = Basket.triangleStats(baskets, minSupport = 2).collect().head
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("n_wedges") == 1L)
    assert(r.getAs[Long]("n_triangles") == 1L)
  }

  test("triangle census: open wedge stays uncounted") {
    // A-B, B-C with NO A-C edge: one wedge, zero triangles
    val open = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), // A-B support 2
      (3L, 2L), (3L, 3L), (4L, 2L), (4L, 3L)  // B-C support 2
    ).toDF("l_orderkey", "l_partkey")
    val r = Basket.triangleStats(open, minSupport = 2).collect().head
    assert(r.getAs[Long]("n_edges") == 2L)
    assert(r.getAs[Long]("n_wedges") == 1L)
    assert(r.getAs[Long]("n_triangles") == 0L)
  }

  test("blocked fuzzy matching verifies inside blocks only, on distinct names") {
    val names = Seq((1L, "AAAA01"), (2L, "AAAA02"), (3L, "AAAA11"), (4L, "BBBB01"))
      .toDF("id", "name")
    val pairs = Linkage.fuzzyNamePairs(names, "name")
      .orderBy("name_a", "name_b")
      .collect().map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Int]("dist")))
    // block AAAA: (01,02) d1, (01,11) d1, (02,11) d2; BBBB01 never
    // pairs with AAAA* despite being within edit distance of the cap
    assert(pairs.toSeq == Seq(("AAAA01", "AAAA02", 1), ("AAAA01", "AAAA11", 1),
      ("AAAA02", "AAAA11", 2)))
  }

  test("fuzzy summary: repeated names collapse to multiplicity, not block width") {
    // 'AAAA01' ×3 and 'AAAA02' ×2: the in-block join sees TWO distinct
    // names (one verify), exact-dup mass lands in the dist-0 row
    // (C(3,2)+C(2,2)=4), and the fuzzy pair carries weight 3·2=6
    val names = Seq("AAAA01", "AAAA01", "AAAA01", "AAAA02", "AAAA02")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val rows = Linkage.fuzzyNameSummary(names, "name")
      .orderBy("dist")
      .collect().map(r => (r.getAs[Long]("dist"), r.getAs[Long]("n_pairs")))
    assert(rows.toSeq == Seq((0L, 4L), (1L, 6L)))
  }

  test("canonical groups: punctuation variants group, exact dups flagged") {
    val docs = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "hello world."),
      (10L, "same text"), (11L, "same text"),
      (20L, "unique line")
    ).toDF("doc_id", "text")
    val gs = Linkage.canonicalGroups(docs).orderBy("canonical_id").collect()
    assert(gs.length == 2)
    val hello = gs(0)
    assert(hello.getAs[Long]("n") == 3L && hello.getAs[Long]("canonical_id") == 1L
      && !hello.getAs[Boolean]("exact_too"))
    val same = gs(1)
    assert(same.getAs[Long]("n") == 2L && same.getAs[Long]("canonical_id") == 10L
      && same.getAs[Boolean]("exact_too"))
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "s1"),
      (2L, "the cat ran to the mat", "en", "s1"),
      (3L, "the dog sat on the rug", "en", "s1"),
      (4L, "der hund lief durch den park", "de", "s2"),
      (5L, "der vogel flog durch den wald", "de", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val w = Selection.dsirWeights(docs, targetLang = "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("avg_score_x1e6")).toMap
    assert(Seq(1L, 2L, 3L).map(w).min > Seq(4L, 5L).map(w).max,
      s"en docs must outscore de docs: $w")
    // smoothing keeps unseen-in-target buckets finite (no nulls)
    assert(w.values.forall(_ > Long.MinValue))
  }

  test("DSIR is a broadcast-model plan: bucket table broadcasts, no cartesian") {
    val df = graft.api.Queries.registry("pipeline_dsir_sample")
      .fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "cartesian in DSIR plan")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket model should broadcast:\n${p.take(1500)}")
  }

  test("assoc/triangle plans stay on keyed joins — no cartesian") {
    for (name <- Seq("assoc_part_pairs", "graph_triangles", "dedup_fuzzy_names")) {
      val df = graft.api.Queries.registry(name).fn(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"cartesian in $name:\n${p.take(1200)}")
    }
  }

  test("EWMA scatter plan has no range join and no cartesian") {
    val df = graft.api.Queries.registry("events_ewma").fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in events_ewma")
    // the only nested-loop is the 1-row max-hour broadcast; the
    // hourly->target scatter must be an aggregate, not a theta-join
    assert(p.contains("Generate") || p.contains("explode"),
      "EWMA should scatter via explode, not join on an hour range")
  }
}
