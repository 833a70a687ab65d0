package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.expr.PatternCompiler
import graft.model.{ArrayOp, TriplePattern}
import QueriesShared._

/** LLM-pipeline: multimodal (binary) columns.
  *
  * One contiguous, ORDER-PRESERVING slice of the declared query
  * surface; [[Queries.registry]] concatenates the slices in the
  * original declaration order. Entries are (name -> Q) pairs exactly
  * as they appeared in the pre-split Queries.scala.
  */
private[api] object QueriesMultimodal {
  val entries: Seq[(String, Q)] = Seq(
    // ===== Extension: LLM-pipeline — multimodal columns =====
    "multimodal_bytes" -> Q(
      (s, d) => graft.ops.Multimodal.byteStats(Tables.documents(s, d))
        .orderBy("format"),
      Some(TextSql.multimodalBytes)),

    // Frame sampling: stride-sampled fixed-size chunks of the payload,
    // digested portably (the video-pipeline plumbing slice).
    "multimodal_frame_sample" -> Q(
      (s, d) => graft.ops.Multimodal.frameSample(Tables.documents(s, d))
        .orderBy("asset_id", "frame_idx"),
      Some(TextSql.multimodalFrameSample())),

    // Resize planning: bounding-box target dims from typed metadata.
    "multimodal_resize" -> Q(
      (s, d) => graft.ops.Multimodal.resizePlan(Tables.documents(s, d))
        .orderBy("asset_id"),
      Some(TextSql.multimodalResize())),

    // Decode-stub features; the oracle recovers byte count + scaled mean
    // byte by hex-expanding the payload in SQL.
    "multimodal_features" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions.{col => c}
        graft.ops.Multimodal.decodeStub(
          graft.ops.Multimodal.assetsFromDocuments(Tables.documents(s, d)))
          .toDF()
          .select(c("asset_id"), c("n_bytes"),
            floor(c("mean_byte") * 10000).cast("long").as("mean_byte_x10k"))
          .orderBy("asset_id")
      },
      Some(TextSql.multimodalFeatures)),

    // Frame-level near-dup detection across assets: pairs of assets
    // sharing identical sampled frames (re-encoded copies, clipped
    // videos and boilerplate intros surface here while whole-payload
    // digests differ). Same candidate discipline as containment: a
    // distinct (asset, frame-digest) inverted index, hot digests capped
    // (boilerplate frames would otherwise join df² pairs), equality
    // self-join on the digest — never an all-pairs comparison.
    "multimodal_shared_frames" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val fr = graft.ops.Multimodal.frameSample(plantedDocs(s, d, exact = true))
          .select(col("asset_id"), col("frame_md5")).distinct()
        val capped = fr
          .withColumn("df", count(lit(1)).over(Window.partitionBy("frame_md5")))
          .filter(col("df") <= 64).drop("df")
        val la = capped.select(col("asset_id").as("a"), col("frame_md5"))
        val rb = capped.select(col("asset_id").as("b"), col("frame_md5"))
        la.join(rb, "frame_md5").filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
          .orderBy("a", "b")
      },
      Some(
        """WITH docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
          |a AS (SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
          |        octet_length(encode(text)) AS n
          |      FROM docs WHERE octet_length(encode(text)) > 0),
          |f AS (SELECT DISTINCT asset_id,
          |        md5(substr(hx, CAST(u.i * 128 + 1 AS BIGINT), 128)) AS fm
          |      FROM a, unnest(generate_series(0,
          |        CAST(ceil(n / 64.0) AS BIGINT) - 1, 2)) u(i)),
          |c AS (SELECT asset_id, fm FROM (
          |        SELECT asset_id, fm, count(*) OVER (PARTITION BY fm) AS df FROM f)
          |      WHERE df <= 64),
          |p AS (SELECT l.asset_id AS a, r.asset_id AS b, count(*) AS n_shared
          |      FROM c l JOIN c r ON l.fm = r.fm AND l.asset_id < r.asset_id
          |      GROUP BY 1, 2)
          |SELECT a, b, n_shared FROM p ORDER BY a, b""".stripMargin)),

    // Exact-duplicate detection over the binary asset payload — the
    // multimodal face of dedup_exact: one digest groupBy on md5 of the
    // hex payload (hex so any engine reproduces the digest input),
    // groups > 1 kept, canonical = min asset id. At scale this is a
    // single shuffle on a 128-bit key, identical to text exact dedup.
    // Runs over the planted corpus (exact copies under id+100000) so
    // the detector has real duplicates to find.
    "multimodal_dedup" -> Q(
      (s, d) => graft.ops.Multimodal.assetsFromDocuments(
          plantedDocs(s, d, exact = true)).toDF()
        .select(col("asset_id"), md5(hex(col("content"))).as("digest"),
          length(col("content")).cast("long").as("nb"))
        .groupBy("digest")
        .agg(count(lit(1)).as("n_assets"), min("asset_id").as("canonical_id"),
          min("nb").as("n_bytes"))
        .filter(col("n_assets") > 1)
        .orderBy("digest"),
      Some(
        """WITH docs AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
          |a AS (SELECT doc_id AS asset_id, md5(hex(encode(text))) AS digest,
          |        CAST(octet_length(encode(text)) AS BIGINT) AS nb
          |      FROM docs)
          |SELECT digest, count(*) AS n_assets, min(asset_id) AS canonical_id,
          |  min(nb) AS n_bytes
          |FROM a GROUP BY digest HAVING count(*) > 1 ORDER BY digest""".stripMargin))

  )
}
