package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.Engine
import graft.store.TripleStore

/** Thin driver facade mirroring the reference's REST surface
  * (reference: core/http.go:30-35 — /api/v1/{insert,query,triples,info})
  * plus the bloom-reconciliation round the reference left TODO.
  * Usage:
  *   graft.tools.TripleCli <storePath> insert '<json triples>'
  *   graft.tools.TripleCli <storePath> query  '<json patterns>' [limit]
  *   graft.tools.TripleCli <storePath> triples
  *   graft.tools.TripleCli <storePath> info
  *   graft.tools.TripleCli <storePath> sync <peerStorePath>
  *   graft.tools.TripleCli <storePath> compact
  */
object TripleCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: TripleCli <storePath> <insert|query|triples|info|sync> [json|peerPath] [limit]")
    val Array(path, cmd) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new TripleStore(spark, path)
    val engine = new Engine(store)
    try cmd match {
      case "insert" =>
        require(args.length >= 3, "usage: TripleCli <storePath> insert '<json triples>'")
        // JSON array of full triples; signed + stamped like the
        // reference's signAndInsertTriples (core/http.go:62-92).
        // Malformed JSON is an error, never a silent null row
        // (reference rejects undecodable bodies, core/http.go:44-50).
        val text = jsonArg(args(2))
        val parsed = Engine.parseJsonQuery(text) // validates shape + fields
        import spark.implicits._
        val df = parsed.triples.map(p => graft.model.Triple(
          p.subj.getOrElse(""), p.pred.getOrElse(""), p.obj.getOrElse(""),
          p.lang.getOrElse(""))).toDF()
        val key = graft.functions.TripleCrypto.generateKeyPair()
        val n = store.insertSigned(df, key)
        println(s"""{"inserted":$n}""")
      case "query" =>
        require(args.length >= 3, "usage: TripleCli <storePath> query '<json patterns>' [limit]")
        val limit = if (args.length > 3) args(3).toInt else -1
        streamJson(engine.queryJson(jsonArg(args(2)), limit))
      case "triples" =>
        streamJson(engine.triples())
      case "info" =>
        val i = store.info()
        println(s"""{"triples":${i.triples},"diskBytes":${i.diskBytes},"freeDiskBytes":${i.freeDiskBytes}}""")
      case "compact" =>
        // rewrite append-accumulated small files to one sorted file per
        // bucket (two-phase swap inside TripleStore.compact); report
        // the file-count delta the operation exists for
        val before = dataFileCount(spark, path)
        store.compact()
        val after = dataFileCount(spark, path)
        println(s"""{"compacted":true,"filesBefore":$before,"filesAfter":$after,"triples":${store.count()}}""")
      case "sync" =>
        require(args.length >= 3, "usage: TripleCli <storePath> sync <peerStorePath>")
        // one bloom-diff replication round FROM the peer store (the
        // scheduled form: ring-sliced automatically once the predicted
        // filter outgrows the broadcast ceiling)
        val peer = new TripleStore(spark, args(2))
        val n = store.sync(peer)
        println(s"""{"synced":$n,"triples":${store.count()}}""")
      case other => sys.error(s"unknown command: $other")
    } finally spark.stop()
  }

  /** Print one JSON line per row WITHOUT materializing the full result
    * on the driver: `toLocalIterator` pulls one partition at a time —
    * the same batched-iterator contract as TripleStore.eachTripleBatch
    * (reference EachTripleBatch, triplestore/triplestore.go:173-195) —
    * so a full-store dump holds at most one partition in driver memory.
    */
  private def streamJson(df: org.apache.spark.sql.DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    df.toJSON.toLocalIterator().asScala.foreach(println)
  }

  /** Count of parquet data files under the store (recursive; skips
    * `_SUCCESS`/metadata) — the number compaction exists to shrink.
    */
  private def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** `@path` reads JSON from a file (shells and sbt split inline JSON on
    * spaces); anything else is taken literally.
    */
  private def jsonArg(a: String): String =
    if (a.startsWith("@"))
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(a.drop(1))),
        java.nio.charset.StandardCharsets.UTF_8)
    else a
}
