package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("graft_* functions are SQL-callable via SparkSessionExtensions") {
    // Force a NEW SparkSession (sharing the JVM's SparkContext) so
    // withExtensions actually applies — getOrCreate would silently
    // reuse the suite-shared session and skip extension injection.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val h = spark.sql("SELECT graft_murmur64('foo') AS h").head().getLong(0)
      assert(h == 0xe271865701f54561L) // reference golden
      val d = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
      assert(d == 11.0)
      val z = spark.sql(
        "SELECT graft_deflate_size(repeat('ab', 1000)) AS z").head().getLong(0)
      assert(z > 0 && z < 100, s"2000 repetitive bytes should deflate tiny, got $z")
    } finally {
      // do NOT stop(): the SparkContext is shared with other suites
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SparkSpecBase.session)
    }
  }
}
