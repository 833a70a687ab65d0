package graft

/** The driver smoke-checks `SparkEntry.entry(spark)` rows>0 with its own
  * session — pin that here, plus registry/oracle consistency.
  */
class EntrySpec extends SparkSpecBase {
  test("entry returns rows on sf0.001 with a vanilla session") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are column-safe") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os.diff(qs)}")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }

  test("all queries execute at sf0.001 and have stable schemas") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
      // column names must be lowercase identifiers (driver sorts by name)
      assert(df.columns.forall(_.matches("[a-zA-Z0-9_]+")), s"$name: ${df.columns.mkString(",")}")
    }
  }
}
