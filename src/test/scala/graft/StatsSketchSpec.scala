package graft

import org.apache.spark.sql.functions._

/** Misra-Gries candidates + two-phase bucketed ranking (ops/Stats). */
class StatsSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("MisraGries: candidates contain every item with freq > n/cap, across partitionings") {
    // adversarial stream: 3 heavy items on top of a long distinct tail
    // that keeps triggering COMPRESS (the worst case for the bound)
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(120)("gamma")
    val tail = (1 to 5000).map(i => s"t$i")
    val all = scala.util.Random.shuffle(heavy ++ tail)
    val n = all.size.toLong
    val cap = 32
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.createDataset(all).repartition(parts).toDF("w")
      val cand = df.agg(graft.functions.MisraGries.candidates(col("w"), cap))
        .head.getSeq[String](0).toSet
      assert(cand.size <= cap, s"parts=$parts size=${cand.size}")
      val mustHave = Seq("alpha", "beta", "gamma").filter {
        w => heavy.count(_ == w) * cap > n
      }
      mustHave.foreach(w => assert(cand.contains(w), s"parts=$parts missing $w"))
    }
  }

  test("MisraGries: exact-recount threshold output is partitioning-invariant") {
    val heavy = Seq.fill(900)("the") ++ Seq.fill(500)("of") ++ Seq.fill(40)("rare")
    val tail = (1 to 2000).map(i => s"w$i")
    val all = scala.util.Random.shuffle(heavy ++ tail)
    val cap = 64
    def run(parts: Int): Seq[(String, Long)] = {
      val toks = spark.createDataset(all).repartition(parts).toDF("w")
      val sketch = toks.agg(count(lit(1)).as("n"),
        graft.functions.MisraGries.candidates(col("w"), cap).as("cand"))
      val cands = sketch.select(col("n"), explode(col("cand")).as("w"))
      toks.join(broadcast(cands), "w")
        .groupBy("w", "n").agg(count(lit(1)).as("c"))
        .filter(col("c") * cap > col("n"))
        .select("w", "c").orderBy("w")
        .as[(String, Long)].collect().toSeq
    }
    val a = run(1); val b = run(7)
    assert(a == b)
    assert(a.map(_._1).toSet == Set("the", "of")) // rare (40) < n/64 (~53)
  }

  test("mad report: histogram plan is byte-equal to the raw-window plan") {
    // seeded values with heavy ties (small range) AND a distinct tail,
    // several types with odd/even counts — the rank = (n+1) div 2
    // selection and the 5·MAD flags must agree row-for-row between the
    // raw row_number windows and the cumulative-histogram selection
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map { i =>
      val t = s"type${i % 7}"
      val v = if (i % 97 == 0) 100000000L + rnd.nextInt(1000) // true anomalies
              else if (i % 5 == 0) rnd.nextInt(20).toLong     // tie block
              else rnd.nextInt(100000).toLong                 // spread
      (t, v)
    }
    val v = spark.createDataset(rows).toDF("event_type", "vc")
      .repartition(8)
    val a = graft.ops.Stats.madReport(v, useHistogram = false).collect()
    val b = graft.ops.Stats.madReport(v, useHistogram = true).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.nonEmpty && a.exists(_.getAs[Long]("n_anomalies") > 0))
  }

  test("bucketedRank equals a global row_number over (value, tie)") {
    val rnd = new scala.util.Random(7)
    // clustered values so some buckets are dense, some empty, plus ties
    val rows = (1 to 3000).map { i =>
      val v = if (i % 3 == 0) rnd.nextInt(100).toLong else rnd.nextInt(1000000).toLong
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v").repartition(6)
    val got = graft.ops.Stats.bucketedRank(df, "v", "id", bucketWidth = 4096L)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("bucketedPrefixSum equals a global running sum over (value, tie)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map { i =>
      val v = if (i % 3 == 0) rnd.nextInt(100).toLong else rnd.nextInt(1000000).toLong
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v").repartition(6)
    val got = graft.ops.Stats.bucketedPrefixSum(df, "v", "id", bucketWidth = 4096L)
      .select("id", "prefix").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.sortBy { case (id, v) => (v, id) }
      .map { case (id, v) => acc += v; id -> acc }.toMap
    assert(got == want)
  }

  test("ksBinned tracks ksExact within the inter-edge mass bound (events corpus)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(floor(col("value") * 100).cast("long").as("vc"),
        col("event_type").as("fl"))
    val exact = graft.ops.Stats.ksExact(ev, "vc", "fl", "click", "purchase", "at")
      .head.getLong(3)
    val binned = graft.ops.Stats.ksBinned(ev, "vc", "fl", "click", "purchase", 64)
      .head.getLong(3)
    // binned evaluates the same ECDFs at 63 cut points: a lower bound,
    // within the largest inter-edge probability mass (~2/64 combined
    // plus sketch error; 4/64 = 62500 ppm is the generous gate)
    assert(binned <= exact + 1,
      s"binned KS must not exceed exact (binned=$binned exact=$exact)")
    assert(exact - binned <= 62500,
      s"binned KS too loose: exact=$exact binned=$binned")
  }

  test("giniX1e6: zero for uniform values, matches hand formula on a skewed set") {
    val uni = (1L to 100L).map(i => (i, 500L)).toDF("id", "v")
    val g0 = graft.ops.Stats.giniX1e6(
      graft.ops.Stats.bucketedRank(uni, "v", "id", 64L), "v")
      .head.getLong(2)
    assert(g0 == 0L)

    val vals = Seq(1L, 1L, 2L, 4L, 8L, 100L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val g = graft.ops.Stats.giniX1e6(
      graft.ops.Stats.bucketedRank(df, "v", "id", 16L), "v")
      .head.getLong(2)
    val sorted = vals.sorted
    val n = sorted.size
    val num = 2L * sorted.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum -
      (n + 1L) * sorted.sum
    val want = num * 1000000L / (n.toLong * sorted.sum)
    assert(g == want)
  }
}
