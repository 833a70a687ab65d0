package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One local session per suite; UTC + small shuffle partitions. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Spec-internal oracle/baseline frames legitimately use GLOBAL
    // windows on tiny grouped results (e.g. FloatGateSpec's KM at-risk
    // suffix sum, the zipf rank frame); every DECLARED query's window is
    // partition-pinned by PlanSpec. The "No Partition Defined" WARN is
    // pure noise here — and cannot be silenced at the plan (SPARK-42525:
    // EliminateWindowPartitions folds literal partition keys back to the
    // empty spec), so raise the one logger instead.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
