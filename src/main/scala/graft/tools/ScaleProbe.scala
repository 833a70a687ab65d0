package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc operator-variant timing probe — the measurement harness
  * behind SCALE.md's "measured and kept/rejected" decisions. Unlike
  * Bench (which times the DECLARED query surface), ScaleProbe times
  * named operator variants side by side on an arbitrary corpus dir so
  * design alternatives can be compared at 10×/30× without declaring
  * them: `runMain graft.tools.ScaleProbe <sfDir> [probe,probe,...]`.
  * Prints one JSON line of min-of-2 seconds per probe, same timing
  * discipline as Bench (toRdd materialization; min of two back-to-back
  * runs to shed sandbox contention).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = graft.api.Tables.documents(spark, sfDir)
    def embs = graft.api.Tables.embeddings(spark, sfDir)
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "containment_direct" -> (() => graft.ops.Dedup.containmentPairs(docs)),
      "containment_prefix" -> (() => graft.ops.Dedup.containmentPairsPrefixed(docs)),
      "jaccard" -> (() => graft.ops.Dedup.ngramJaccardPairs(docs)),
      "minhash" -> (() => graft.ops.Dedup.minhashPairs(docs)),
      "embedding_fixed" -> (() =>
        graft.ops.Dedup.embeddingNearDups(embs, threshold = 0.45)),
      "embedding_sched" -> (() =>
        graft.ops.Dedup.embeddingNearDupsAuto(embs, threshold = 0.45)),
      // dedup_clusters decomposition: pair generation alone vs the full
      // pairs + GraphX connected-components resolution — the difference
      // is the RDD-boundary fromEdges + Pregel cost
      "clusters_pairs_only" -> (() => graft.ops.Dedup.minhashPairs(docs)),
      "clusters_full" -> (() =>
        graft.ops.Dedup.duplicateClusters(graft.ops.Dedup.minhashPairs(docs))))

    val selected = if (args.length > 1) {
      val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet
      probes.filter { case (n, _) => names(n) }
    } else probes

    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn().queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[probe] $name FAILED: ${e.getMessage}"); -1.0 }
      }
      val a = once(); val b = if (a >= 0) once() else -1.0
      name -> (if (b >= 0) math.min(a, b) else -1.0)
    }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    spark.stop()
    println(results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString(s"""{"sf":"$sfDir","probes":{""", ",", "}}"))
    System.out.flush()
  }
}
