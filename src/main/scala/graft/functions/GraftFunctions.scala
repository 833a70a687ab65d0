package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression computing the reference's 64-bit shard hash
  * `murmur3_64(subj)` (reference call sites: query/query.go:37,
  * core/http.go:70, network/network.go:284). A native `Expression` with
  * codegen (not a Scala UDF) so it stays inside whole-stage codegen in
  * the scan→filter hot path.
  */
case class Murmur64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_murmur64"

  override protected def nullSafeEval(v: Any): Any =
    Murmur3x64.hash64(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Murmur3x64.hash64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Murmur64Expr =
    copy(child = newChild)
}

/** Codegen'd bloom probe over a broadcast filter — replaces the Scala
  * UDF in the replication-diff scan path: the probe runs once per row of
  * a full table scan, and a UDF there boxes every key and fences
  * whole-stage codegen. Only the broadcast HANDLE is embedded in the
  * plan (tasks fetch the filter from the block manager), so filter size
  * doesn't bloat task binaries.
  */
case class BloomProbeExpr(
    child: Expression,
    bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(v: Any): Any =
    bf.value.mightContainString(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bf,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value()).mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}

/** [[BloomProbeExpr]] over an ARRAY of broadcast filters, selected per
  * row by a slice-index column — what lets the K-slice reconciliation
  * diff ([[graft.store.TripleStore.syncFromSliced]]) probe every slice
  * in ONE scan of the peer instead of K filtered re-scans. Same probe
  * semantics per slice as the single-filter expression.
  */
case class BloomProbeIndexedExpr(
    left: Expression,
    right: Expression,
    bfs: org.apache.spark.broadcast.Broadcast[
      Array[org.apache.spark.util.sketch.BloomFilter]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_probe_indexed"

  override protected def nullSafeEval(key: Any, idx: Any): Any =
    bfs.value(idx.asInstanceOf[Int])
      .mightContainString(key.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomsBc", bfs,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, (k, i) =>
      s"((org.apache.spark.util.sketch.BloomFilter[]) $ref.value())[$i]" +
        s".mightContainString($k.toString())")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbeIndexedExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level function surface of the engine. SQL names are registered
  * under `graft_*` via [[GraftFunctions.register]].
  */
object GraftFunctions {
  /** Registers the `graft_*` SQL functions in the session's registry.
    * Idempotent; call once per session (TripleStore does this). For
    * library-level packaging use [[graft.GraftExtensions]] instead.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_murmur64", exprs => Murmur64Expr(stringInput(exprs.head)), "built-in")

  /** The expression reads UTF8String; SQL callers can pass anything, so
    * coerce non-string children explicitly (we can't use
    * ExpectsInputTypes — AbstractDataType is private[sql]).
    */
  private[graft] def stringInput(e: Expression): Expression =
    if (e.dataType == org.apache.spark.sql.types.StringType) e
    else org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.StringType)

  /** 64-bit murmur3 shard hash of a string column. Built directly from
    * the Catalyst expression (no session registry needed). The cast keeps
    * arbitrary inputs safe since we skip `ExpectsInputTypes`
    * (`AbstractDataType` is private[sql]).
    */
  def murmur64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Murmur64Expr(ColumnBridge.expression(c.cast("string"))))
  }

  /** The engine-portable 60-bit hash family: the first 15 hex chars of
    * md5 as a BIGINT. Any engine with md5 reproduces it, which is what
    * makes the shard / sampling / simhash oracles possible — the SQL
    * twin is GraphSql.md5Hash60; change them together.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Exact integral division (`a div b` — Catalyst's IntegralDivide;
    * null on null divisor). For operands nested inside lambda bodies,
    * where `expr("a div b")` can't reach and `floor(a / b)` over doubles
    * is NOT a substitute: a 53-bit mantissa rounds quotients adjacent to
    * an integer boundary the wrong way, breaking hash-gated oracles.
    */
  def longDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Codegen'd membership probe of a broadcast bloom filter. */
  def bloomProbe(c: Column,
      bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomProbeExpr(ColumnBridge.expression(c.cast("string")), bf))
  }

  /** Codegen'd per-row probe of `bfs(idx)` — see [[BloomProbeIndexedExpr]]. */
  def bloomProbeIndexed(c: Column, idx: Column,
      bfs: org.apache.spark.broadcast.Broadcast[
        Array[org.apache.spark.util.sketch.BloomFilter]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomProbeIndexedExpr(
      ColumnBridge.expression(c.cast("string")),
      ColumnBridge.expression(idx.cast("int")), bfs))
  }

  /** Canonical binary encoding of a triple's logical content — our
    * deterministic stand-in for the reference's proto marshal
    * (reference: crypto/fingerprint.go:10-17; bloom keys
    * triplestore/bloom.go:26-30). Divergence (documented): the reference
    * keys blooms on the full proto encoding *including* sig/created, so a
    * re-signed copy of a triple gets a new key; we key on
    * (subj,pred,obj,lang) which strictly improves diff accuracy.
    * `\u0000` separates fields (cannot occur in the data).
    */
  def canonicalKey(subj: Column, pred: Column, obj: Column, lang: Column): Column =
    concat_ws("\u0000", subj, pred, obj, lang)

  def canonicalKey(): Column =
    canonicalKey(col("subj"), col("pred"), col("obj"), col("lang"))

  /** SHA-1 fingerprint of the canonical encoding, hex string (reference:
    * crypto/fingerprint.go:10-17 — SHA-1 over the encoded triple).
    * Built-in `sha1` keeps this codegen'd.
    */
  def fingerprint(): Column = sha1(canonicalKey().cast("binary"))

  /** Scala-side canonical key + fingerprint (for driver-side checks). */
  def canonicalKeyScala(subj: String, pred: String, obj: String, lang: String): String =
    s"$subj\u0000$pred\u0000$obj\u0000$lang"

  def fingerprintScala(subj: String, pred: String, obj: String, lang: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(canonicalKeyScala(subj, pred, obj, lang)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
