package graft

import org.apache.spark.sql.functions._
import graft.api.Tables

/** Pins the loader-level single-split fix (Tables.rowGroupBoundTarget):
  * a row-group-starved table must load with bytes-proportional
  * parallelism, small test tables must load with byte-identical plans,
  * and filter pushdown must survive the inserted Repartition — the
  * three properties the 30×/100× sweeps and the PlanSpec pins rely on.
  */
class TablesSplitSpec extends SparkSpecBase {

  /** Write `rows` rows into ONE parquet file with ONE row group — the
    * exact make_sf.py layout that starved 30×/100× documents and
    * embeddings scans down to a single task. `fat` controls the
    * payload width: ~96 incompressible B/row (the text/vector-table
    * class the guarantee protects) vs ~16 B/row (the skinny fact-table
    * class the guarantee must LEAVE ALONE — the round-11 10× sweep
    * measured the indiscriminate rule at +14% across the surface). */
  private def oneRowGroupTable(rows: Int, fat: Boolean = true): String = {
    import spark.implicits._
    val dir = tmpDir("split-src")
    // distinct hashes defeat both dictionary and page compression so
    // on-disk bytes cross the loader's 8 MB floor with a modest row count
    val payload =
      if (fat) concat(md5(col("id").cast("string")),
        md5(concat(lit("a"), col("id").cast("string"))),
        md5(concat(lit("b"), col("id").cast("string"))))
      else substring(md5(col("id").cast("string")), 1, 12)
    val df = (0 until rows).toDF("id")
      .select(col("id").cast("long").as("id"), payload.as("payload"))
    df.coalesce(1)
      .write.option("parquet.block.size", (1L << 30).toString)
      .mode("overwrite").parquet(s"$dir/big.parquet")
    dir
  }

  test("row-group-starved big table loads with >= half bytes-heuristic splits") {
    // ~300k * ~70B payload ≈ 12-20 MB on disk, one row group
    val dir = oneRowGroupTable(300000)
    val f = new java.io.File(s"$dir/big.parquet")
    val bytes = Option(f.listFiles).getOrElse(Array.empty)
      .filter(x => x.isFile && !x.getName.startsWith(".") && !x.getName.startsWith("_"))
      .map(_.length).sum
    assume(bytes >= (8L << 20), s"fixture too small ($bytes B) to trigger the guarantee")
    val cores = spark.sparkContext.defaultParallelism
    val want = math.max(1L,
      math.min(cores.toLong, (bytes + (4L << 20) - 1) / (4L << 20)) / 2)
    val got = Tables.load(spark, dir, "big").rdd.getNumPartitions
    assert(got >= want, s"loader left a $bytes-byte one-row-group table at " +
      s"$got partition(s); guarantee is >= $want")
  }

  test("filter pushdown reaches the parquet scan through the loader repartition") {
    val dir = oneRowGroupTable(300000)
    val df = Tables.load(spark, dir, "big").filter(col("id") === 7L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Exchange RoundRobinPartitioning") ||
      p.contains("REPARTITION"), s"expected the loader repartition in:\n${p.take(1500)}")
    assert(p.contains("EqualTo(id,7)"),
      s"id=7 not pushed to the scan below the repartition:\n${p.take(2000)}")
  }

  test("skinny one-row-group table stays a bare scan — no loader shuffle") {
    // same single-group starvation shape, but ~20 B/row: the fact-table
    // class, whose scan is cheap and whose row groups scale with data —
    // an inserted shuffle is pure overhead (measured +14% at 10×)
    val dir = oneRowGroupTable(700000, fat = false)
    val layout = Tables.layoutOf(spark, s"$dir/big.parquet")
    assume(layout.bytes >= (8L << 20),
      s"fixture too small (${layout.bytes} B) to reach the trigger region")
    assert(!layout.fatRows, s"fixture must be skinny, got $layout")
    val p = Tables.load(spark, dir, "big").queryExecution.logical.toString
    assert(!p.contains("Repartition"),
      s"skinny table must load as a bare scan, got:\n${p.take(800)}")
  }

  test("high-compression fat table stays guaranteed — logical width classifies when disk width lies") {
    // rows that are LOGICALLY wide (~200 B: a distinct md5 head defeats
    // dictionary encoding, a long x-run pads the width) but compress
    // below the 64 B/row disk threshold: under the disk-only classifier
    // this table silently exits the fat-row class and its single row
    // group starves every consumer — the logical-width secondary
    // classifier (max(disk, uncompressed) per row) must keep the
    // guarantee independent of codec behavior
    import spark.implicits._
    val dir = tmpDir("split-src")
    val df = (0 until 400000).toDF("id")
      .select(col("id").cast("long").as("id"),
        concat(md5(col("id").cast("string")),
          lpad(lit(""), 168, "x")).as("payload"))
    df.coalesce(1)
      .write.option("parquet.block.size", (1L << 30).toString)
      .mode("overwrite").parquet(s"$dir/big.parquet")
    val layout = Tables.layoutOf(spark, s"$dir/big.parquet")
    assume(layout.bytes >= (8L << 20),
      s"fixture too small (${layout.bytes} B) to reach the trigger region")
    // the planted condition: thin on disk, wide uncompressed
    assume(layout.bytes / layout.rows < Tables.FatRowBytes,
      s"codec failed to compress below the disk threshold: $layout")
    assert(layout.logicalBytes / layout.rows >= Tables.FatRowBytes,
      s"fixture not logically wide: $layout")
    assert(layout.fatRows, s"logical-width classifier missed: $layout")
    val cores = spark.sparkContext.defaultParallelism
    val want = math.max(1L,
      math.min(cores.toLong, (layout.bytes + (4L << 20) - 1) / (4L << 20)) / 2)
    val got = Tables.load(spark, dir, "big").rdd.getNumPartitions
    assert(got >= want,
      s"loader left a compressed fat table at $got partition(s); >= $want required")
  }

  test("small testdata tables are untouched — no repartition in the plan") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val p = df.queryExecution.logical.toString
    assert(!p.contains("Repartition"),
      s"sf0.001 lineitem must load as a bare scan, got:\n${p.take(800)}")
  }
}
