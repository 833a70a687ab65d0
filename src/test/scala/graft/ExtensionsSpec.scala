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

  test("CartesianGuard: unguarded cross join refused at plan time; scalar and broadcast crosses pass") {
    // the suite-shared session carries GraftExtensions (SparkSpecBase),
    // so the guard is live for every spec in the build — this test pins
    // the contract explicitly
    val spark = SparkSpecBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, count, lit, sum}
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    // unguarded cross of two multi-row frames → refused before execution
    val e = intercept[Exception] { a.crossJoin(b).collect() }
    assert(e.getMessage.contains("CartesianGuard"), e.getMessage)
    // broadcast records intent → allowed
    assert(a.crossJoin(broadcast(b)).count() == 6)
    // a 1-row aggregate side is structurally safe → allowed unhinted
    val scalar = b.agg(sum("y").as("s"))
    assert(a.crossJoin(scalar).count() == 3)
    // conditionless INNER join is the same hazard → refused too
    val e2 = intercept[Exception] { a.join(b).collect() }
    assert(e2.getMessage.contains("CartesianGuard"), e2.getMessage)
    // and a keyed join is untouched
    assert(a.join(b.withColumnRenamed("y", "x"), "x").count() == 0)
  }

  test("CartesianGuard negative coverage: SQL-string joins, views, outer joins, barrier-crossing scalars") {
    // the guard is load-bearing for the 100 TB story — pin the failure
    // modes a Spark upgrade could silently re-open (maxRows propagation,
    // parser join shapes, view indirection)
    val spark = SparkSpecBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    a.createOrReplaceTempView("cg_a")
    b.createOrReplaceTempView("cg_b")
    try {
      // conditionless INNER join written as a SQL string
      val e1 = intercept[Exception] {
        spark.sql("SELECT * FROM cg_a JOIN cg_b").collect()
      }
      assert(e1.getMessage.contains("CartesianGuard"), e1.getMessage)
      // comma-list cross of two multi-row frames behind views
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM cg_a, cg_b").collect()
      }
      assert(e2.getMessage.contains("CartesianGuard"), e2.getMessage)
      // conditionless LEFT OUTER is the same BroadcastNestedLoopJoin
      // hazard (ADVICE r10) — refused since round 11
      val e3 = intercept[Exception] {
        spark.sql("SELECT * FROM cg_a LEFT JOIN cg_b").collect()
      }
      assert(e3.getMessage.contains("CartesianGuard"), e3.getMessage)
      // the maxRows<=1 allowance must survive optimizer barriers: a
      // scalar aggregate behind a view, further filtered AND projected
      // in a subquery, is still provably 1-row when the guard sees it
      b.agg(sum("y").as("s")).createOrReplaceTempView("cg_scalar")
      val viaBarrier = spark.sql(
        "SELECT x, t.s FROM cg_a CROSS JOIN " +
          "(SELECT s FROM cg_scalar WHERE s > 0) t")
      assert(viaBarrier.count() == 3)
      // and a LIMIT 1 subquery's maxRows survives the sort it rides on
      val viaLimit = spark.sql(
        "SELECT x, t.y FROM cg_a CROSS JOIN " +
          "(SELECT y FROM cg_b ORDER BY y LIMIT 1) t")
      assert(viaLimit.count() == 3)
    } finally {
      Seq("cg_a", "cg_b", "cg_scalar")
        .foreach(spark.catalog.dropTempView(_))
    }
  }
}
