package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-operator scale probe — the measurement harness behind
  * SCALE.md's streaming rows, the way ScaleProbe is for batch variants:
  * drives [[graft.streaming.EventStream.attributionPairs]] over an
  * arbitrary events corpus as a time-sliced file stream, asserts the
  * emitted pair multiset converges to the batch interval join
  * (`join_range_attribution`'s inner pair set), and reports the state
  * store's per-batch row counts — the evidence that buffered state is
  * (throughput × horizon)-bounded, not stream-length-bounded.
  *
  * `runMain graft.tools.StreamProbe <sfDir> [slices]` → one JSON line:
  * `{"sf":…,"events":N,"batches":k,"pairs":P,"exact_match":bool,
  *   "state_rows_max":S,"state_rows_per_batch":[…],"sec":…}`.
  *
  * Slices are TIME-ordered (quantile cuts on ts, staged oldest-first
  * with mod-time spacing): the file source orders micro-batches by mod
  * time, and arrival in event-time order is both the realistic stream
  * and the shape that lets the watermark evict — a parity split would
  * ship old rows after the watermark passed and drop them as late.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val slices = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.api.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click")).cache()
    val nEvents = ev.count()

    // quantile cuts on event time (epoch seconds — approxQuantile has
    // no timestamp support) → slices of ~equal row count in strictly
    // increasing time ranges
    val evSec = ev.withColumn("ts_sec", col("ts").cast("double"))
    val cuts = evSec.stat.approxQuantile("ts_sec",
      (1 until slices).map(_.toDouble / slices).toArray, 0.001)
    val stage = java.nio.file.Files.createTempDirectory("graft-streamprobe")
    val bounds = (Array[Option[Double]](None) ++ cuts.map(Some(_))) :+ None
    (0 until slices).foreach { i =>
      val lo = bounds(i); val hi = bounds(i + 1)
      var s = evSec
      lo.foreach(t => s = s.filter(col("ts_sec") >= t))
      hi.foreach(t => s = s.filter(col("ts_sec") < t))
      s.drop("ts_sec").coalesce(1)
        .write.parquet(stage.resolve(f"b$i%03d").toString)
      Thread.sleep(1100) // file source orders micro-batches by mod time
    }

    val t0 = System.nanoTime()
    val in = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString + "/*/")
    val q = graft.streaming.EventStream.attributionPairs(in)
      .writeStream.outputMode("append").format("memory")
      .queryName("streamprobe_attrib").start()
    val (pairsStreamed, stateRows): (Long, Seq[Long]) =
      try {
        q.processAllAvailable()
        (spark.table("streamprobe_attrib").count(),
          q.recentProgress.toSeq
            .filter(_.numInputRows > 0)
            .flatMap(_.stateOperators.headOption.map(_.numRowsTotal)))
      } finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9

    // batch twin: the same interval join as join_range_attribution's
    // inner pair set; exactAll both ways = multiset equality
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("cts"))
    val batch = purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("cts") >= col("pts") - expr("INTERVAL 600 SECONDS") &&
          col("cts") < col("pts"))
      .select("purchase_id", "user_id", "cts")
    val streamed = spark.table("streamprobe_attrib")
    val diff = streamed.exceptAll(batch).count() +
      batch.exceptAll(streamed).count()

    def jlist(xs: Seq[Long]): String = xs.mkString("[", ",", "]")
    val json =
      s"""{"sf":"$sfDir","events":$nEvents,"batches":$slices""" +
        s""","pairs":$pairsStreamed,"exact_match":${diff == 0L}""" +
        s""","state_rows_max":${if (stateRows.isEmpty) 0L else stateRows.max}""" +
        s""","state_rows_per_batch":${jlist(stateRows)}""" +
        s""","sec":${"%.3f".formatLocal(java.util.Locale.ROOT, sec)}}"""
    spark.stop()
    println(json)
    System.out.flush()
  }
}
