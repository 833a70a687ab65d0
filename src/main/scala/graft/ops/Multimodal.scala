package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension surface): media as opaque
  * `binary` columns with typed metadata, batch decode / feature-extract
  * as partition-local transforms.
  *
  * The decode step is a STUB — this container has no image/audio codecs,
  * so [[decodeStub]] produces a deterministic fake (byte histogram
  * features). Everything around it is real and load-bearing: the asset
  * schema, the binary column handling, the partition-local batch shape
  * (one decoder init per partition, not per row — the same contract a
  * JNI/FFmpeg decoder would need), and the downstream aggregation.
  */
object Multimodal {

  final case class AssetMeta(format: String, width: Int, height: Int)
  final case class Asset(asset_id: Long, content: Array[Byte], meta: AssetMeta)
  final case class AssetFeatures(asset_id: Long, n_bytes: Long,
      mean_byte: Double, features: Array[Double])

  /** Derive a deterministic asset table from `documents` (text bytes as
    * stand-in payloads; fake but stable metadata from the id).
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("content"),
      struct(
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg").otherwise("webp").as("format"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height")).as("meta"))
      .as[Asset]
  }

  /** STUB decoder: in production this is the partition-local codec call
    * (init once per partition, decode per row). The fake computes an
    * 8-bin byte histogram + mean — deterministic, so the plumbing is
    * testable.
    */
  def decodeStub(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // decoder init would go here, once per partition
      it.map { a =>
        val bytes = a.content
        val hist = new Array[Double](8)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b >>> 5) += 1.0
          sum += b
          i += 1
        }
        val n = math.max(bytes.length, 1)
        AssetFeatures(a.asset_id, bytes.length.toLong,
          sum.toDouble / n, hist.map(_ / n))
      }
    }
  }

  /** Deterministic frame sampling over the binary payload: cut into
    * `frameBytes` chunks, keep every `every`-th. This is the Spark-side
    * plumbing of video frame-sampling (the chunk boundaries and stride a
    * real decoder would use); the frame digest runs over the HEX of the
    * chunk so any engine reproduces it. Pure column expressions — stays
    * in whole-stage codegen, no shuffle before the caller's aggregate.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 64, every: Int = 2): DataFrame =
    assetsFromDocuments(docs).toDF()
      .select(col("asset_id"), col("content"), length(col("content")).as("n"))
      .filter(col("n") > 0)
      // sequence(0, nFrames-1, every); n > 0 so the stop bound is >= 0
      // (sequence with a negative stop would count DOWN, not be empty)
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          ceil(col("n") / lit(frameBytes.toDouble)).cast("long") - 1, lit(every.toLong))))
      .withColumn("frame",
        expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("asset_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(hex(col("frame"))).as("frame_md5"))

  /** Resize planning (stub): the metadata half of an image resize —
    * target dims for a `maxDim` bounding box, aspect preserved, floor'd,
    * min 1. A real decoder consumes these; the arithmetic is the
    * oracle-checkable slice.
    */
  def resizePlan(docs: DataFrame, maxDim: Int = 224): DataFrame =
    assetsFromDocuments(docs).toDF()
      .select(col("asset_id"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .withColumn("scale",
        lit(maxDim.toDouble) / greatest(col("width"), col("height")).cast("double"))
      .select(col("asset_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1)).cast("long").as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1)).cast("long").as("out_h"))

  /** Byte-level stats through the binary column — the oracle-checkable
    * slice of the pipeline (octet counts survive any engine).
    */
  def byteStats(docs: DataFrame): DataFrame =
    assetsFromDocuments(docs).toDF()
      .select(col("asset_id"),
        length(col("content")).cast("long").as("n_bytes"),
        col("meta.format").as("format"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"))
}
