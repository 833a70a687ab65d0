package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused k-key MD5 MinHash helper (codegen helper — outside the
  * expression companion for the static-forwarder reason documented on
  * [[DeflateUtil]]).
  *
  * Semantics are EXACTLY the per-column chain it replaces
  * (Dedup.sigsFromShingles' pre-fusion form, spec-gated equal):
  *
  *   key(i) = substring(md5(concat(lit((i/2) + "#"), sh)), 1 + (i%2)*16, 16)
  *
  * i.e. one MD5 per PAIR of keys over the UTF-8 bytes of
  * "<seed>#<shingle>", hex-encoded lowercase, split into its two
  * 16-hex-char halves — the two-independent-64-bit-keys-per-digest
  * trick, returned as an array<string> of length k.
  *
  * What the fusion buys at 100×: the chain ran k/2 separate `md5`
  * expressions per shingle row — each allocating a fresh MessageDigest
  * (commons-codec DigestUtils), a concat'd input string and a 32-char
  * hex string, plus k substring expressions — and the signature
  * aggregation (50M+ shingle rows) was 10-11 s of dedup_minhash's
  * ~21 s with hashing the dominant term (ScaleProbe mh_sigs 13.5 s at
  * k=8 vs 5.2 s at k=2: ~2.7 s per extra digest). Here: one call per
  * row, a THREAD-LOCAL MessageDigest reset across calls, digest bytes
  * hex-split directly into the two key strings, zero intermediate
  * strings.
  */
object MinhashKeysUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  def keys(sh: UTF8String, k: Int): ArrayData = {
    val d = md.get()
    val shBytes = sh.getBytes
    val out = new Array[AnyRef](k)
    var seed = 0
    while (seed < k / 2) {
      d.reset()
      // seed prefix "<seed>#" — ASCII, identical bytes to the UTF-8 of
      // the concat'd string the per-column form hashed
      if (seed < 10) d.update(('0' + seed).toByte)
      else d.update(String.valueOf(seed)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      d.update('#'.toByte)
      d.update(shBytes)
      val dig = d.digest()
      var half = 0
      while (half < 2) {
        val hex = new Array[Byte](16)
        var i = 0
        while (i < 8) {
          val b = dig(half * 8 + i) & 0xff
          hex(2 * i) = HEX(b >>> 4)
          hex(2 * i + 1) = HEX(b & 0xf)
          i += 1
        }
        out(seed * 2 + half) = UTF8String.fromBytes(hex)
        half += 1
      }
      seed += 1
    }
    new GenericArrayData(out)
  }
}

/** All k banded-MD5-MinHash keys of a shingle in ONE call — see
  * [[MinhashKeysUtil.keys]] for the exact semantics contract with the
  * per-column md5/substring chain it replaces.
  */
case class MinhashKeysExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k % 2 == 0, "k must be positive and even")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_keys"

  override protected def nullSafeEval(v: Any): Any =
    MinhashKeysUtil.keys(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashKeysUtil.keys($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashKeysExpr =
    copy(child = newChild)
}

object MinhashKeysExpr {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(MinhashKeysExpr(
      ColumnBridge.expression(c.cast("string")), k))
}
