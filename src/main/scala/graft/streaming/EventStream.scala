package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming ingest + windowed aggregation (extension
  * surface; the reference's only "streaming" is channel-batched table
  * scans, triplestore/triplestore.go:173-195).
  *
  * Design: `readStream` file source → event-time tumbling window with
  * watermark → sink. The batch query `Queries.events_hourly` is the
  * same aggregation shape, so streaming results converge to the batch
  * answer once the watermark passes — asserted in StreamingSpec.
  */
object EventStream {

  /** File schema of the events table as the round-7 driver testdata
    * writes it: `ts` is TIMESTAMP(MICROS) without UTC adjustment, which
    * Spark reads as TIMESTAMP_NTZ; [[readEvents]] normalizes it to the
    * session-tz (UTC) TIMESTAMP the batch loader emits.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files.
    *
    * Supports ONLY the current testdata generation (ts stored as
    * TIMESTAMP(MICROS), read as NTZ per [[rawSchema]]); pointing this at
    * the older nanos-generation files fails — Spark rejects
    * TIMESTAMP(NANOS) under an NTZ read schema — while the batch loader
    * (Tables.events) handles both generations. The NTZ→timestamp cast
    * below is instant-preserving only in a UTC session, so a non-UTC
    * session fails loudly here instead of silently shifting event times
    * relative to the batch path.
    */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"readEvents requires spark.sql.session.timeZone=UTC (got $tz): the " +
        "NTZ->timestamp cast is session-tz-dependent and would shift every " +
        "event instant relative to the batch loader")
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling 1-hour event-time window per event type, 2-hour watermark
    * for late data. Append-mode compatible (final results only).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(12,2)")).as("total"))
      .select(col("window.start").as("hr"), col("event_type"), col("n"), col("total"))

  /** Run the hourly aggregation to an in-memory table; the caller drives
    * with processAllAvailable(). Complete mode: every window's current
    * state is visible, so the batch comparison needs no watermark wait.
    */
  def runToMemory(spark: SparkSession, dir: String,
      queryName: String): StreamingQuery =
    hourlyCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Exact streaming dedup on event identity within the watermark
    * horizon — the streaming twin of the batch exact-dup filter. State
    * is one key per event inside the horizon and is evicted as the
    * watermark passes, so state size is bounded by (throughput ×
    * horizon), not by stream length — the property that keeps this
    * runnable forever at 100 TB/day.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: (purchase, click) pairs
    * where the click lands inside the `windowSec` seconds preceding the
    * purchase, per user — the streaming form of the batch
    * `join_range_attribution` (whose inner-join pair set this converges
    * to, asserted in GraphStreamSpec). Both sides come off one events
    * stream; the equality key (user_id) keeps the join keyed and the
    * two-sided event-time range condition plus the watermarks lets the
    * state store evict each side once it can no longer match — buffered
    * state is (throughput × (watermark + windowSec))-bounded, never
    * stream-length-bounded, which is what makes the attribution join
    * runnable forever on a 100 TB/day clickstream. Append mode: pairs
    * emit as both sides arrive.
    */
  def attributionPairs(events: DataFrame, windowSec: Int = 600,
      watermark: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
      .withWatermark("pts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("cts"))
      .withWatermark("cts", watermark)
    purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("cts") >= col("pts") - expr(s"INTERVAL $windowSec SECONDS") &&
          col("cts") < col("pts"))
      .select("purchase_id", "user_id", "cts")
  }

  // ---- Continuous triple ingest ----

  /** Continuous deduplicating ingest into a TripleStore — the
    * Spark-native replacement for the reference's gossip replication
    * (SURVEY §1.6): arriving triple batches are signed-insert-style
    * appended with the same (subj,pred,obj) anti-join dedup as batch
    * inserts, via foreachBatch (each micro-batch is transactional
    * w.r.t. the store read it dedups against).
    */
  def streamInsert(store: graft.store.TripleStore,
      triples: DataFrame): StreamingQuery =
    triples.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.insert(batch, countInserted = false)
        ()
      }
      .start()

  /** Near-dup-suppressing document ingest: each arriving micro-batch's
    * banded MinHash keys probe a persisted band index; a doc sharing
    * any band with an already-ingested doc (or with a smaller-id doc in
    * its own batch) is dropped, survivors append to the corpus sink and
    * their bands to the index. This is the streaming form of
    * minhash-LSH dedup — collision alone (no Jaccard verify) is the
    * standard conservative suppression choice for ingest: the band
    * probability IS the near-dup test, false-positive drops are
    * accepted, and the per-batch cost is one keyed join against the
    * index plus one window over the batch's own bands.
    *
    * Scale: the index holds `bands` rows per ingested doc keyed by
    * (band, key) — parquet-partitionable, probed with a keyed join that
    * broadcasts the (small) batch side; nothing is ever driver-resident.
    * Within-batch suppression keeps the min doc id per colliding band
    * group (a doc dropped against another dropped doc is kept — slight
    * under-suppression vs cluster resolution, resolved by the batch
    * `duplicateClusters` pass if exactness matters).
    *
    * Maintenance: each micro-batch appends one file-set to the index, so
    * a long-running stream would otherwise degrade its own probe scan
    * (thousands of tiny footers). Every `compactEvery` batches the index
    * is rewritten in place — [[compactBandIndex]], the same two-phase
    * rename as TripleStore.compact — so the live file count is bounded
    * regardless of stream length.
    *
    * Index SIZE (not file count) is the remaining growth axis: the probe
    * join would otherwise scan the whole index every micro-batch even
    * after compaction. The index is therefore hive-partitioned on
    * `kb = pmod(xxhash64(key), keyBuckets)` and each batch reads ONLY the
    * key buckets its own band keys hash into ([[probeBandIndex]] —
    * partition pruning at file-listing time, asserted in
    * GraphStreamSpec). A trickle batch touching few distinct keys scans
    * a bounded fraction of an unbounded index; at 100 TB raise
    * `keyBuckets` so bucket width (indexRows / keyBuckets) stays at a
    * comfortable scan size — the probe cost is then
    * O(batchBuckets · bucketWidth), independent of total index size.
    */
  def streamNearDedupIngest(docs: DataFrame, indexDir: String, outDir: String,
      k: Int = 8, bands: Int = 4, compactEvery: Int = 8,
      compactFiles: Int = 4, keyBuckets: Int = 16): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val spark = batch.sparkSession
        // persisted: the band frame is consumed four times per batch
        // (bucket probe set, seen/batch dedup joins, index append) and
        // recomputing MinHash signatures per consumer would dominate
        // small-batch latency
        val banded = graft.ops.Dedup
          .bandKeys(graft.ops.Dedup.minhashSignatures(batch, k), k, bands)
          .persist()
        try {
          // a crash mid-compaction can leave the index parked at a
          // sibling path — restore it BEFORE the read, or an absent-path
          // fallback would silently degrade to an empty index (previously
          // seen near-dups would pass through undetected)
          recoverBandIndex(spark, indexDir)
          // only an ABSENT index (first batch of a fresh stream) may start
          // empty; a present-but-unreadable one (corrupt footer, truncated
          // file) must fail the stream loudly — degrading to empty would
          // pass previously-seen near-dups through with no signal
          val idxPath = new org.apache.hadoop.fs.Path(indexDir)
          val idxFs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val index =
            if (idxFs.exists(idxPath)) {
              // probe ONLY the key buckets this batch's keys hash into —
              // partition pruning keeps the probe scan proportional to the
              // batch's key spread, not the index's total size. The bucket
              // set is bounded by keyBuckets, so the collect is O(buckets).
              val kbs = banded.select(keyBucket(keyBuckets).as("kb"))
                .distinct().collect().map(_.getInt(0)).toSeq
              probeBandIndex(spark, indexDir, kbs)
            } else
              spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                StructType(Seq(StructField("band", IntegerType),
                  StructField("key", StringType))))
          val seenDup = banded.join(index, Seq("band", "key"), "left_semi")
            .select("doc_id").distinct()
          val batchDup = banded
            .withColumn("mn", min("doc_id").over(Window.partitionBy("band", "key")))
            .filter(col("doc_id") =!= col("mn"))
            .select("doc_id").distinct()
          val drops = seenDup.unionByName(batchDup).distinct()
          batch.join(drops, Seq("doc_id"), "left_anti")
            .write.mode("append").parquet(outDir)
          banded.join(drops, Seq("doc_id"), "left_anti")
            .select(col("band"), col("key"), keyBucket(keyBuckets).as("kb"))
            .write.mode("append").partitionBy("kb").parquet(indexDir)
          if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
            compactBandIndex(spark, indexDir, compactFiles)
        } finally banded.unpersist()
        ()
      }
      .start()

  /** The index's hive-partition key: a stable hash bucket of the band
    * key. Writers and probes MUST derive it identically or pruning
    * silently excludes live entries. INT (not LONG) so the value
    * round-trips hive partition-column inference exactly — a type
    * mismatch would wrap the attribute in a cast and defeat
    * listing-time pruning.
    */
  private def keyBucket(buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("key")), lit(buckets.toLong)).cast("int")

  /** Read the band index restricted to the given key buckets — the
    * filter is on the hive-partition column, so non-matching `kb=N`
    * directories are pruned at file-listing time and never opened
    * (GraphStreamSpec asserts selectedPartitions shrinks). An empty
    * bucket set yields an empty frame without touching any file.
    */
  private[graft] def probeBandIndex(spark: SparkSession, indexDir: String,
      kbs: Seq[Int]): DataFrame = {
    val idx = spark.read.parquet(indexDir)
    requireBucketedLayout(idx, indexDir)
    idx.filter(col("kb").isin(kbs: _*))
      .select("band", "key")
  }

  /** An index written by the pre-bucketing flat (band, key) layout —
    * e.g. a stream resumed from an old checkpoint — has no `kb`
    * partition column; probing or compacting it would die in analysis
    * with an unresolved-column error nobody can act on. Fail with the
    * actionable message instead.
    */
  private def requireBucketedLayout(idx: DataFrame, indexDir: String): Unit =
    if (!idx.columns.contains("kb"))
      throw new IllegalStateException(
        s"band index at $indexDir predates kb hive partitioning (columns: " +
          s"${idx.columns.mkString(", ")}); rebuild the index from the corpus " +
          "or rewrite it once into the kb= bucketed layout")

  /** Rewrite the band index's accumulated per-micro-batch appends into
    * a clustered, sorted layout — restores probe locality and bounds the
    * footer count. The hive `kb=` partitioning survives the rewrite
    * (each occupied key bucket collapses to at most `files` sorted
    * files, so the live file count is ≤ occupiedBuckets × files
    * regardless of how many appends accumulated). Two-phase rename (write to a
    * sibling `.compacting` dir, swap, keep `.precompact` until the swap
    * lands) so a crash mid-compaction never loses the index; safe inside
    * foreachBatch because micro-batches are serialized — no concurrent
    * reader of the directory exists while it runs. At 100 TB, partition
    * the rewrite by `band` (or a key hash bucket) instead of a fixed
    * file count — the shape, one clustered rewrite amortized over
    * compactEvery appends, is what matters.
    */
  private[graft] def compactBandIndex(spark: SparkSession, indexDir: String,
      files: Int = 4): Unit = {
    recoverBandIndex(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val t = new org.apache.hadoop.fs.Path(indexDir + ".compacting")
    val old = new org.apache.hadoop.fs.Path(indexDir + ".precompact")
    fs.delete(t, true)
    fs.delete(old, true)
    // repartition on kb alone: hash-partitioning groups each occupied
    // bucket into one task, so partitionBy("kb") emits ONE file per
    // bucket per task that holds it — file count ≤ occupied buckets
    // when files ≥ occupied buckets would all land in distinct tasks,
    // and never more than files per bucket
    val idx = spark.read.parquet(indexDir)
    requireBucketedLayout(idx, indexDir)
    idx
      .repartition(files, col("kb"))
      .sortWithinPartitions("kb", "band", "key")
      .write.mode("overwrite").partitionBy("kb").parquet(t.toString)
    // abort (not proceed) if the park rename fails — the live index is
    // still at `p`, so failing here loses nothing; proceeding would
    // let the second rename land the rewrite NEXT to the stale index
    if (!fs.rename(p, old)) {
      fs.delete(t, true)
      throw new java.io.IOException(
        s"compactBandIndex: rename $p -> $old failed; compaction aborted")
    }
    if (!fs.rename(t, p)) {
      fs.rename(old, p) // roll back
      throw new java.io.IOException(
        s"compactBandIndex: rename $t -> $p failed; rolled back")
    }
    fs.delete(old, true)
  }

  /** Crash recovery for the two-phase compaction swap: if the live
    * index dir is MISSING but a sibling from an interrupted compaction
    * exists, restore it — prefer `.compacting` (the fully-written
    * rewrite: the parquet write committed before any rename ran) and
    * fall back to `.precompact` (the parked original). Runs at every
    * index read and at compaction start; without it, the read path's
    * catch-all would fall back to an EMPTY index and the next
    * compaction's delete(.precompact) would permanently discard the
    * only surviving copy. Idempotent and cheap (two existence probes)
    * when the index is healthy.
    */
  private[graft] def recoverBandIndex(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) return
    val t = new org.apache.hadoop.fs.Path(indexDir + ".compacting")
    val old = new org.apache.hadoop.fs.Path(indexDir + ".precompact")
    if (fs.exists(t) && fs.rename(t, p)) { fs.delete(old, true); return }
    // a recovery candidate exists but the live index could not be
    // restored (either rename failed) — throw rather than fall through
    // to the read path's empty-index fallback: silently losing the
    // index is the exact degrade mode this function exists to close
    if (fs.exists(old)) {
      if (!fs.rename(old, p))
        throw new java.io.IOException(
          s"recoverBandIndex: found parked index at $old but could not restore it")
    } else if (fs.exists(t))
      throw new java.io.IOException(
        s"recoverBandIndex: found compacted index at $t but could not restore it")
  }

  // ---- Stateful sessionization (flatMapGroupsWithState) ----

  final case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Int)
  final case class CompletedSession(user_id: Long, start_us: Long,
      end_us: Long, n_events: Int)

  /** Per-user session assembly with explicit keyed state: a session
    * closes when the gap to the next event exceeds `gapSec`; closed
    * sessions are emitted, the open tail stays in state across
    * micro-batches. This is the `KeyValueGroupedDataset.
    * flatMapGroupsWithState` shape a 100 TB clickstream pipeline needs —
    * state lives in the state store, partitioned by user, never on the
    * driver.
    *
    * Disorder bound (quantified in GraphStreamSpec's disorder test):
    * within a micro-batch any disorder is healed by the in-batch sort;
    * ACROSS batches a late event landing delta behind the open tail
    * regresses last_us, so the next event's computed gap is its true
    * gap g plus delta — g <= gapSec − delta stays correct, a true gap
    * in (gapSec − delta, gapSec] splits spuriously (closing the session
    * at the regressed timestamp), and late events are absorbed into the
    * open session but never retroactively split or merge a closed one.
    * Pipelines with unbounded cross-batch disorder should use the
    * order-free [[latestStates]] upsert family or a watermark-delayed
    * batch recompute instead.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapSec: Long): org.apache.spark.sql.Dataset[CompletedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L

    def fn(user: Long, it: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[CompletedSession] = {
      // events within a micro-batch are NOT ordered — sort this group
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var open = state.getOption
      val out = Seq.newBuilder[CompletedSession]
      sorted.foreach { e =>
        open = open match {
          case None => Some(OpenSession(e.ts_us, e.ts_us, 1))
          case Some(s) if e.ts_us - s.last_us > gapUs =>
            out += CompletedSession(user, s.start_us, s.last_us, s.n)
            Some(OpenSession(e.ts_us, e.ts_us, 1))
          case Some(s) => Some(s.copy(last_us = e.ts_us, n = s.n + 1))
        }
      }
      open.foreach(state.update)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  // ---- Stateful transition mining (the streaming twin of
  //      events_markov_transitions) ----

  final case class TypedEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class LastEvent(ts_us: Long, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, src: String, dst: String)

  /** Per-user next-event transition pairs with explicit keyed state: the
    * last-seen event survives in the state store across micro-batches,
    * so a pair is emitted for every consecutive event pair in the
    * stream, including pairs that straddle a batch boundary. State is
    * ONE row per active user (the property that keeps it runnable
    * forever); downstream counting is an ordinary streaming aggregate
    * over the emitted pairs. Same in-batch sort + monotone-batch
    * assumption as [[sessionize]].
    */
  def transitions(events: org.apache.spark.sql.Dataset[TypedEvent])
      : org.apache.spark.sql.Dataset[Transition] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def fn(user: Long, it: Iterator[TypedEvent],
        state: GroupState[LastEvent]): Iterator[Transition] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var last = state.getOption
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        last.foreach(l => out += Transition(user, l.event_type, e.event_type))
        last = Some(LastEvent(e.ts_us, e.event_id, e.event_type))
      }
      last.foreach(state.update)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  // ---- Stateful latest-state maintenance (the streaming twin of
  //      events_cdc_latest) ----

  final case class ValuedEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value_c: Long)
  final case class LatestState(ts_us: Long, event_id: Long,
      event_type: String, value_c: Long)
  final case class UserState(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value_c: Long)

  /** Per-user latest-state maintenance with explicit keyed state — the
    * streaming MERGE INTO: state holds each user's current latest row
    * ((ts, event_id) max — the CDC sequence tie-break), and the group
    * emits the post-batch latest whenever the user appears. Unlike
    * [[sessionize]]/[[transitions]], this op needs NO monotone-batch
    * assumption: a late event with a smaller (ts, event_id) simply
    * loses the max and the state is untouched — upsert semantics are
    * naturally disorder-tolerant. One state row per user; the emitted
    * stream's last row per user converges to `events_cdc_latest`'s
    * per-user latest (GraphStreamSpec, crafted disorder + corpus).
    */
  def latestStates(events: org.apache.spark.sql.Dataset[ValuedEvent])
      : org.apache.spark.sql.Dataset[UserState] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def fn(user: Long, it: Iterator[ValuedEvent],
        state: GroupState[LatestState]): Iterator[UserState] = {
      val candidates = state.getOption
        .map(s => ValuedEvent(user, s.ts_us, s.event_id, s.event_type, s.value_c))
        .iterator ++ it
      val newest = candidates.maxBy(e => (e.ts_us, e.event_id))
      state.update(LatestState(newest.ts_us, newest.event_id,
        newest.event_type, newest.value_c))
      Iterator.single(UserState(user, newest.ts_us, newest.event_id,
        newest.event_type, newest.value_c))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  // ---- Stateful hourly EWMA maintenance (the streaming twin of
  //      events_ewma) ----

  final case class HourEvent(event_type: String, ts_us: Long)
  final case class HourWindow(counts: Map[Long, Long])
  final case class EwmaRow(event_type: String, hr_us: Long, ewma_wsum: Long)

  private val HourUs = 3600L * 1000000L

  /** Trailing hours of counts the state retains per type: enough to
    * rescore all 10 emitted target hours (each needs its 10-lag window).
    */
  val EwmaRetainHours = 19

  /** Per-type hourly EWMA with explicit keyed state — the streaming
    * twin of `events_ewma` (α = 1/2 truncated at 10 lags, integer
    * weights 2^(9−lag)). State holds the trailing [[EwmaRetainHours]]
    * hour-counts per type (bounded: ≤ 19 entries per key, forever);
    * each batch merges its hour counts ADDITIVELY and re-emits the
    * last 10 target hours as upserts (downstream takes the last emit
    * per (type, hour)). The additive merge makes disorder WITHIN the
    * retained window heal exactly — counts commute, so a late event
    * for a still-retained hour just lands in its bucket and the
    * affected hours re-emit; only events older than maxHour − 18 h are
    * dropped (the quantified bound — the [[latestStates]] discipline
    * of stating exactly what disorder survives).
    */
  def hourlyEwma(events: org.apache.spark.sql.Dataset[HourEvent])
      : org.apache.spark.sql.Dataset[EwmaRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def fn(t: String, it: Iterator[HourEvent],
        state: GroupState[HourWindow]): Iterator[EwmaRow] = {
      val batchCounts = it.toSeq
        .groupBy(e => e.ts_us - java.lang.Math.floorMod(e.ts_us, HourUs))
        .map { case (h, es) => h -> es.size.toLong }
      val merged = state.getOption.map(_.counts).getOrElse(Map.empty)
        .foldLeft(batchCounts) { case (acc, (h, n)) =>
          acc.updated(h, acc.getOrElse(h, 0L) + n) }
      if (merged.isEmpty) Iterator.empty
      else {
        val maxHr = merged.keys.max
        val kept = merged.filter { case (h, _) =>
          h >= maxHr - (EwmaRetainHours - 1) * HourUs }
        state.update(HourWindow(kept))
        (0 until 10).iterator.map { back =>
          val target = maxHr - back * HourUs
          val wsum = (0 until 10).map { lag =>
            kept.getOrElse(target - lag * HourUs, 0L) * (1L << (9 - lag))
          }.sum
          EwmaRow(t, target, wsum)
        }.filter(_.ewma_wsum > 0)
      }
    }

    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  // ---- Stateful SCD2 interval maintenance (the streaming twin of
  //      events_scd2_intervals) ----

  final case class RunState(state_type: String, start_us: Long,
      last_us: Long, last_id: Long)
  final case class ClosedInterval(user_id: Long, state: String,
      start_us: Long, end_us: Long)

  /** Streaming SCD Type-2 builder with explicit keyed state — the twin
    * of `events_scd2_intervals`: state holds each user's OPEN run
    * (state type + its entry timestamp); a batch event with a different
    * type closes the run (emitting the finished validity interval,
    * end = the new event's ts — exactly the batch query's lead())
    * and opens the next. Same-type events only advance the run's tail.
    * One open-run row per user forever; closed intervals stream out
    * append-only and never revise. Same in-batch sort + monotone-batch
    * assumption as [[sessionize]]/[[transitions]] (a cross-batch late
    * event can split a run the batch query would merge — the
    * documented disorder bound); the emitted closed intervals converge
    * to the batch query's closed set (GraphStreamSpec, corpus fixture).
    */
  def scd2Intervals(events: org.apache.spark.sql.Dataset[TypedEvent])
      : org.apache.spark.sql.Dataset[ClosedInterval] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def fn(user: Long, it: Iterator[TypedEvent],
        state: GroupState[RunState]): Iterator[ClosedInterval] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var cur = state.getOption
      val out = Seq.newBuilder[ClosedInterval]
      sorted.foreach { e =>
        cur match {
          case Some(r) if r.state_type == e.event_type =>
            cur = Some(r.copy(last_us = e.ts_us, last_id = e.event_id))
          case Some(r) =>
            out += ClosedInterval(user, r.state_type, r.start_us, e.ts_us)
            cur = Some(RunState(e.event_type, e.ts_us, e.ts_us, e.event_id))
          case None =>
            cur = Some(RunState(e.event_type, e.ts_us, e.ts_us, e.event_id))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  // ---- Stateful heavy-hitter sketch (the streaming twin of
  //      agg_heavy_hitters) ----

  final case class Tok(w: String)
  final case class MgBucketState(counters: Map[String, Long], dec: Long, n: Long)
  final case class MgEmit(bucket: Int, n: Long, dec: Long,
      candidates: Map[String, Long])

  /** Streaming Misra-Gries heavy hitters with explicit keyed state —
    * the streaming twin of `agg_heavy_hitters`, sharing the EXACT same
    * pure buffer ops (graft.functions.MisraGries.add — one code path,
    * so batch and stream can't drift). Tokens are keyed into `buckets`
    * hash groups; each group folds its batch into a ≤2·cap-counter MG
    * buffer (state bounded forever — the [[hourlyEwma]] property) and
    * re-emits its candidate summary as an upsert (downstream keeps the
    * last emit per bucket).
    *
    * Because counts COMMUTE, this twin is fully disorder-immune — no
    * monotone-batch assumption, no watermark: any arrival order folds
    * to a buffer satisfying the same guarantee. Since a token always
    * hashes to the same bucket, its full mass is inside one bucket, so
    * per-bucket dec ≤ n_bucket/(cap+1) ≤ n/(cap+1) gives the GLOBAL
    * guarantee: after any prefix, the union of last-emitted candidate
    * sets contains every token with total frequency > n/cap — the
    * exact-recount threshold census then matches the batch query
    * (GraphStreamSpec pins both against agg_heavy_hitters' plan).
    */
  def heavyHitterSketch(toks: org.apache.spark.sql.Dataset[Tok],
      cap: Int, buckets: Int): org.apache.spark.sql.Dataset[MgEmit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = toks.sparkSession
    import spark.implicits._

    def fn(bucket: Int, it: Iterator[Tok],
        state: GroupState[MgBucketState]): Iterator[MgEmit] = {
      val st = state.getOption.getOrElse(MgBucketState(Map.empty, 0L, 0L))
      var buf: graft.functions.MisraGries.Buf = (st.counters, st.dec)
      var n = st.n
      it.foreach { t => buf = graft.functions.MisraGries.add(buf, t.w, cap); n += 1 }
      state.update(MgBucketState(buf._1, buf._2, n))
      Iterator.single(MgEmit(bucket, n, buf._2, buf._1))
    }

    toks.groupByKey(t => java.lang.Math.floorMod(t.w.hashCode, buckets))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Canonical 60-bit row hash of an event row — the events-table
    * member of the lakehouse_table_fingerprint family (ts as
    * unix_micros, value in exact cents: no float or date FORMATTING in
    * the hashed string, so the hash is layout/engine-invariant).
    */
  def eventRowHash60: org.apache.spark.sql.Column =
    expr("""CAST(conv(substring(md5(concat_ws('|',
      event_id, unix_micros(ts), user_id, event_type,
      CAST(floor(value * 100 + 0.5) AS BIGINT), props)), 1, 15), 16, 10) AS BIGINT)""")

  /** Order-invariant table fingerprint over events — works UNCHANGED on
    * a batch frame or a stream (complete mode): per-row 60-bit hash
    * summed per hash bucket mod 2^61−1. The streaming state is exactly
    * `buckets` partial sums forever (commutative + associative), so the
    * twin is disorder-IMMUNE — no watermark, no monotone-batch
    * assumption — and ADDITIVE: fp(A ∪ B) = fp(A) + fp(B) mod p per
    * bucket, the incremental-maintenance identity a 100 TB copy check
    * relies on (verify deltas, never re-scan the base).
    */
  def tableFingerprint(events: DataFrame, buckets: Int = 32): DataFrame =
    events
      .withColumn("h", eventRowHash60)
      .withColumn("bucket", pmod(col("h"), lit(buckets)).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT)")
          .as("fingerprint"))

  /** Streaming twin of `stats_psi_sources`' distribution cells — the
    * live drift-monitor feed. Works UNCHANGED on a batch frame or a
    * stream in complete mode: state is ONE commutative count per
    * (source, length-bucket) cell FOREVER — ≤ sources × 20 rows,
    * domain-bounded — so the twin is disorder-IMMUNE (no watermark, no
    * monotone-batch assumption) and ADDITIVE across arbitrary batch
    * splits (cell-wise sum, the [[tableFingerprint]] identity). Every
    * downstream PSI quantity — per-source totals, the global bucket
    * mix, the Laplace-smoothed p/q and the (p−q)·ln(p/q) terms — is a
    * reader-side derivation over this bounded frame (the
    * [[errorBudgetDaily]] discipline), computed EXACTLY as the batch
    * query computes it from the same cells, so the two cannot drift: a
    * 100 TB ingest keeps live per-source drift scores without ever
    * re-scanning history.
    */
  def psiSourceCells(docs: DataFrame): DataFrame =
    docs
      .withColumn("b", least(expr("n_chars div 256"), lit(19L)))
      .groupBy("source", "b")
      .agg(count(lit(1)).as("c"))

  /** Streaming/incremental member of the deterministic-bootstrap family
    * (stats_bootstrap_ci's twin): per replica b, the running
    * Poisson(1)-weighted sums of event value in cents — weights from
    * md5(event_id:b) against [[graft.ops.Stats.PoissonCdfX2p60]] (the
    * SAME shared thresholds as the batch query, no drift possible).
    * Works UNCHANGED on a batch frame or a stream in complete mode:
    * state is exactly `replicas` rows of three commutative sums
    * FOREVER, so the twin is disorder-IMMUNE (no watermark, no
    * monotone-batch assumption) and ADDITIVE across arbitrary batch
    * splits — the identity that lets a 100 TB pipeline maintain live
    * confidence intervals over an unbounded ingest without ever
    * re-scanning. The replica mean m_b = wsum_b div w_b is the
    * reader's one division; the CI is the 2nd/31st order statistic of
    * the `replicas`-row frame, exactly as in the batch query.
    */
  def bootstrapSums(events: DataFrame, replicas: Int = 32): DataFrame =
    events
      .select(col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        explode(expr(s"sequence(0, ${replicas - 1})")).as("b"))
      .withColumn("h", graft.functions.GraftFunctions.md5Hash60(
        concat_ws(":", col("event_id"), col("b"))))
      .withColumn("w", graft.ops.Stats.poissonWeight(col("h")))
      .groupBy("b")
      .agg(count(lit(1)).as("n"),
        sum("w").cast("long").as("wsum"),
        sum(expr("w * cents")).cast("long").as("wxsum"))

  /** Streaming twin of `events_error_budget`'s per-day counters — the
    * live SRE error-budget feed. Works UNCHANGED on a batch frame or a
    * stream in complete mode: state is one (n, n_err) row per
    * calendar day FOREVER (horizon-bounded), both counters commutative
    * sums, so the twin is disorder-IMMUNE (no watermark, no
    * monotone-batch assumption) and ADDITIVE across arbitrary batch
    * splits. The reader derives the rate, the strict >1% flag, and the
    * cumulative burn from the day frame exactly as the batch query
    * does — those are presentation windows over a span-bounded frame,
    * not state.
    */
  def errorBudgetDaily(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("dy"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("long").as("n_err"))

  /** Streaming twin of `agg_hll_distinct`'s register state — the live
    * mergeable distinct-count feed. Works UNCHANGED on a batch frame or
    * a stream in complete mode: state is one max-rank row per used
    * (event_type, register), ≤ types × 1024 rows FOREVER, max is
    * commutative + idempotent, so the twin is disorder-IMMUNE (even
    * duplicate redelivery is absorbed — max of a replay is a no-op, a
    * property the counting twins don't have) and MERGEABLE across
    * arbitrary splits by per-register max. The estimate readout is
    * Hll.estimate over this bounded frame — presentation, not state.
    */
  def hllEventRegisters(events: DataFrame): DataFrame =
    graft.ops.Hll.registers(events, "event_type", col("event_id"))

  /** Streaming twin of `agg_countmin_users`' counter table — the live
    * additive frequency sketch. Works UNCHANGED on a batch frame or a
    * stream in complete mode: state is ≤ 4×1024 commutative-sum cells
    * FOREVER, disorder-immune and ADDITIVE across arbitrary splits
    * (cell-wise sum — the [[bootstrapSums]] identity with a fixed-size
    * table). Point estimates are the k·D-probe readout over this
    * bounded frame — presentation, not state.
    */
  def cmUserCounters(events: DataFrame): DataFrame =
    graft.ops.CountMin.counters(events, col("user_id"))

  /** Streaming twin of `events_survival_km`'s per-user survival state —
    * the live cohort/KM feed. Works UNCHANGED on a batch frame or a
    * stream in complete mode: state is one (first day, first purchase
    * day, last day) row per user FOREVER, all three commutative
    * min/max, so the twin is disorder-IMMUNE (no watermark, no
    * monotone-batch assumption) and MERGEABLE across arbitrary batch
    * splits (min of mins / max of maxes) — a 100 TB pipeline maintains
    * live survival curves without re-scanning history. The KM curve
    * itself is [[survivalKmFromState]] over this user-bounded frame —
    * a presentation derivation, not state (the errorBudgetDaily
    * discipline); the batch query runs the SAME derivation, so the two
    * cannot drift.
    */
  def survivalUserState(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", to_date(col("ts"))))
          .as("conv"),
        max(to_date(col("ts"))).as("last_day"))

  /** Kaplan-Meier day-grain curve from [[survivalUserState]]'s frame:
    * duration = conversion lag (converted) or observation span to the
    * frame horizon (censored); per-duration event/censor counts; at-risk
    * via the suffix window; per-day ln-term floored ×1e6 BEFORE the
    * cumulative sum (order-free integer aggregation — the PSI
    * discipline; boundary margins pinned in FloatGateSpec). Every window
    * runs on the duration-grain frame (span-bounded), never the corpus.
    * This IS the declared `events_survival_km` derivation — the
    * registered query calls it on the batch user frame.
    */
  def survivalKmFromState(per: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mx = per.agg(max("last_day").as("mx"))
    val byDay = per.crossJoin(broadcast(mx))
      .withColumn("converted", col("conv").isNotNull)
      .withColumn("dur", when(col("converted"),
        datediff(col("conv"), col("t0"))).otherwise(datediff(col("mx"), col("t0")))
        .cast("long"))
      .groupBy("dur")
      .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("e"),
        sum(when(col("converted"), 0L).otherwise(1L)).as("c"))
    val wc = Window.orderBy("dur")
    byDay
      .withColumn("at_risk",
        sum(col("e") + col("c")).over(wc.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
      .withColumn("term", when(col("at_risk") > col("e"),
        floor(log((col("at_risk") - col("e")).cast("double") /
          col("at_risk").cast("double")) * lit(1000000.0)).cast("long")))
      .withColumn("log_surv_x1e6", sum("term").over(wc))
      .select(col("dur").cast("long").as("day_offset"),
        col("e").cast("long").as("n_conv"),
        col("c").cast("long").as("n_censored"),
        col("at_risk").cast("long").as("at_risk"),
        col("log_surv_x1e6").cast("long").as("log_surv_x1e6"))
      .orderBy("day_offset")
  }

  // ---- Exact-substring census ingest (dedup_exact_substring's twin) ----

  /** Streaming twin of `dedup_exact_substring`'s df-capped positioned
    * shingle index (round-10 verdict #7): each arriving document batch
    * appends its positioned n-token shingle postings (doc_id, pos, h —
    * Dedup.positionedShingles, the SAME projection the declared query
    * runs) to a persisted inverted index, df-capped INCREMENTALLY: a
    * per-shingle document-frequency ledger accumulates across batches,
    * and a batch appends postings for a shingle only while the running
    * df (prior + this batch) stays ≤ `maxShingleDf` — so a shingle
    * whose FINAL df is within the cap is always fully indexed no matter
    * how the corpus was split into batches, and a shingle that crosses
    * the cap stops costing index space from that batch on. State is
    * therefore bounded by the scheduled cap: ≤ cap postings per kept
    * shingle plus a one-sum ledger row per shingle per batch.
    *
    * The run census itself is [[exactSubstrRunsFromIndex]] — a READOUT
    * over the final index through the declared query's own
    * Dedup.runsFromPostings (one shared code path, the KM-twin
    * discipline), filtered to ledger-df ≤ cap. Because both the
    * postings set and the ledger sums are split- and order-independent
    * (each doc arrives exactly once — the dedup_incremental contract),
    * the readout is EQUAL to the batch query on the union corpus for
    * ANY disordered split: capped-out shingles' partial postings are
    * excluded by the ledger filter, kept shingles are complete.
    * Asserted in GraphStreamSpec.
    *
    * Layout: `$indexDir/postings` and `$indexDir/ledger`, both
    * hive-partitioned on kb = h mod `keyBuckets` so the per-batch
    * ledger probe reads ONLY the key buckets the batch's shingles hash
    * into (listing-time pruning — the band-index trick); a trickle
    * batch scans a bounded index fraction. Long-running streams bound
    * their file counts with the band-index compaction discipline
    * ([[compactBandIndex]]'s two-phase rename applies verbatim; the
    * ledger additionally re-aggregates to one row per shingle).
    */
  def streamExactSubstrIngest(docs: DataFrame, indexDir: String,
      n: Int = 5, maxShingleDf: Int = 128,
      keyBuckets: Int = 16): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val posts = graft.ops.Dedup.positionedShingles(batch, n)
          .withColumn("kb", pmod(col("h"), lit(keyBuckets.toLong)).cast("int"))
          .persist()
        try {
          val dfB = posts.groupBy("h", "kb")
            .agg(countDistinct("doc_id").as("dfb"))
            .persist()
          val ledgerPath = new org.apache.hadoop.fs.Path(s"$indexDir/ledger")
          val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val prior =
            if (fs.exists(ledgerPath)) {
              // bounded collect: ≤ keyBuckets values
              val kbs = dfB.select("kb").distinct().collect().map(_.getInt(0))
              spark.read.parquet(s"$indexDir/ledger")
                .filter(col("kb").isin(kbs.toIndexedSeq: _*))
                .groupBy("h").agg(sum("dfb").as("df0"))
            } else
              dfB.select(col("h"), lit(0L).as("df0")).limit(0)
          val keep = dfB.join(prior, Seq("h"), "left")
            .filter(coalesce(col("df0"), lit(0L)) + col("dfb") <= maxShingleDf)
            .select("h")
          posts.join(keep, "h")
            .select("doc_id", "pos", "h", "kb")
            .write.mode("append").partitionBy("kb").parquet(s"$indexDir/postings")
          dfB.select("h", "dfb", "kb")
            .write.mode("append").partitionBy("kb").parquet(s"$indexDir/ledger")
          dfB.unpersist()
        } finally posts.unpersist()
        ()
      }
      .start()

  /** Maximal shared-run census over a [[streamExactSubstrIngest]]
    * index: ledger-filter to shingles whose TOTAL df is within the
    * cap, then the declared query's own diagonal gap-island merge
    * (Dedup.runsFromPostings). Equal to
    * `Dedup.exactSubstringRuns(unionCorpus, n, minRunTokens, cap)` for
    * any batch split of the corpus.
    */
  def exactSubstrRunsFromIndex(spark: SparkSession, indexDir: String,
      n: Int = 5, minRunTokens: Int = 15,
      maxShingleDf: Int = 128): DataFrame = {
    val kept = spark.read.parquet(s"$indexDir/ledger")
      .groupBy("h").agg(sum("dfb").as("df"))
      .filter(col("df") <= maxShingleDf)
      .select("h")
    val posts = spark.read.parquet(s"$indexDir/postings")
      .select("doc_id", "pos", "h")
    graft.ops.Dedup.runsFromPostings(posts.join(kept, "h"), n, minRunTokens)
  }
}
