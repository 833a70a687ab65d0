package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused deterministic Poisson-bootstrap resample weights: all `reps`
  * replica weights of one entity key in ONE call (codegen helper —
  * outside the expression companion for the static-forwarder reason
  * documented on [[DeflateUtil]]).
  *
  * Weight identity with the per-replica column chain it replaces
  * (stats_bootstrap_ci's explode + md5Hash60 + poissonWeight, which the
  * DuckDB oracle replays literally):
  *
  *   w(b) = poissonWeight(conv(substring(md5(key || ':' || b), 1, 15), 16, 10))
  *
  * i.e. the top 60 bits of the MD5 of the ASCII bytes "<key>:<b>"
  * (15 hex nibbles big-endian = (digest[0..6] as 56-bit BE) << 4 |
  * digest[7] >>> 4 — non-negative, so the long holds it exactly),
  * thresholded against [[graft.ops.Stats.PoissonCdfX2p60]] (k = 0..5,
  * else 6). The former chain built, per ROW × REPLICA, a concat'd
  * UTF8String, a 32-char hex digest string, a 15-char substring and a
  * base-16 `conv` parse; this loop reuses one thread-local digest and
  * emits the weights as array<long> for one posexplode (pos ≡ the old
  * `sequence(0, reps-1)` replica id).
  */
object BootstrapWeightsUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // one source of truth: the ops.Stats literals the oracle replicates
  private val thresholds: Array[Long] = graft.ops.Stats.PoissonCdfX2p60.toArray

  def weights(key: Long, reps: Int): ArrayData = {
    val d = md.get()
    val keyBytes = java.lang.Long.toString(key)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Long](reps)
    var b = 0
    while (b < reps) {
      d.reset()
      d.update(keyBytes)
      d.update(':'.toByte)
      d.update(java.lang.Integer.toString(b)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val dig = d.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      v = (v << 4) | ((dig(7) >> 4) & 0xfL)
      var w = 6L
      var k = 0
      var found = false
      while (k < thresholds.length && !found) {
        if (v < thresholds(k)) { w = k.toLong; found = true }
        k += 1
      }
      out(b) = w
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** All `reps` Poisson-bootstrap weights of a BIGINT key as array<long>
  * in one call — see [[BootstrapWeightsUtil.weights]] for the exact
  * md5Hash60/poissonWeight contract.
  */
case class BootstrapWeightsExpr(child: Expression, reps: Int)
    extends UnaryExpression {
  require(reps > 0, "reps must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bootstrap_weights"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    BootstrapWeightsUtil.weights(v.asInstanceOf[Long], reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BootstrapWeightsUtil.weights($c, $reps)")

  override protected def withNewChildInternal(newChild: Expression): BootstrapWeightsExpr =
    copy(child = newChild)
}

object BootstrapWeightsExpr {
  def apply(c: Column, reps: Int): Column =
    ColumnBridge.column(BootstrapWeightsExpr(
      ColumnBridge.expression(c.cast("long")), reps))
}
