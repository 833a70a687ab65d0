package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan-shape probe for declared queries: materializes each named query
  * at sf0.001 and prints its FINAL AQE plan's join/cartesian operators
  * plus nested-loop counts (AQE plan strings repeat operators in the
  * "Initial Plan" section — the final-plan count is the real one).
  * Usage: runMain graft.tools.PlanDump <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = graft.api.Queries.registry(n).fn(spark, "/root/testdata/sf0.001")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val fin = p.split("== Initial Plan ==")(0)
      println(s"== $n finalBNLJ=${"BroadcastNestedLoopJoin".r.findAllIn(fin).size}" +
        s" totalBNLJ=${"BroadcastNestedLoopJoin".r.findAllIn(p).size}" +
        s" finalScans=${"Scan parquet".r.findAllIn(fin).size}" +
        s" reusedExchange=${"ReusedExchange".r.findAllIn(fin).size}")
      fin.linesIterator.filter(l => l.contains("Join") || l.contains("Cartesian")).foreach(l => println("   " + l.trim.take(160)))
    }
    spark.stop()
  }
}
