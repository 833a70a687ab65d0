package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused k-key MD5 MinHash helper emitting HASH-AGGREGABLE LONGS
  * (codegen helper — outside the expression companion for the
  * static-forwarder reason documented on [[DeflateUtil]]).
  *
  * Key identity with the per-column chain it replaces
  * (Dedup.sigsFromShinglesBuiltin, spec-gated equal end to end):
  *
  *   key(i) = substring(md5(concat(lit((i/2) + "#"), sh)), 1 + (i%2)*16, 16)
  *
  * i.e. one MD5 per PAIR of keys over the UTF-8 bytes of
  * "<seed>#<shingle>", split into its two 8-byte halves. Here each half
  * is emitted as its BIG-ENDIAN LONG XOR Long.MinValue: the nibble→hex
  * character map is strictly increasing, so lexicographic order of the
  * lowercase-hex key strings == unsigned byte order of the raw halves
  * == SIGNED order of the flipped longs. `min` over the flipped longs
  * is therefore exactly `min` over the hex strings, and the string form
  * is recovered bit-for-bit after aggregation with
  * `lower(lpad(hex(v ^ Long.MinValue), 16, '0'))`.
  *
  * Why longs (measured at 100×, SCALE round 14): `min(string)` is not a
  * mutable-buffer aggregate, so the signature groupBy planned as
  * Sort + SortAggregate — a full sort of the ~50M-row shingle frame on
  * BOTH sides of the exchange. min(long) buffers are mutable, the same
  * aggregation plans as a HashAggregate with a map-side partial, and
  * the hot path allocates no hex/concat intermediates: signature stage
  * 16.2 s → 10.2 s against the builtin chain. (Round 13's string-array
  * fusion of the same call — one GenericArrayData of 8 UTF8Strings per
  * row — measured 13-15× SLOWER than the builtin: the wide array rode
  * the SortAggregate's sort, and when CollapseProject inlined it into
  * the k aggregate arguments the digests ran k times per row. Reverted;
  * this form is its measured replacement.)
  */
object MinhashLongsUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def keys(sh: UTF8String, k: Int): ArrayData = {
    val d = md.get()
    val shBytes = sh.getBytes
    val out = new Array[Long](k)
    var seed = 0
    while (seed < k / 2) {
      d.reset()
      // seed prefix "<seed>#" — ASCII, identical bytes to the UTF-8 of
      // the concat'd string the per-column form hashes
      if (seed < 10) d.update(('0' + seed).toByte)
      else d.update(String.valueOf(seed)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      d.update('#'.toByte)
      d.update(shBytes)
      val dig = d.digest()
      var half = 0
      while (half < 2) {
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (dig(half * 8 + i) & 0xffL); i += 1 }
        out(seed * 2 + half) = v ^ Long.MinValue
        half += 1
      }
      seed += 1
    }
    new GenericArrayData(out)
  }
}

/** All k banded-MD5-MinHash keys of a shingle as flipped big-endian
  * longs in ONE call — see [[MinhashLongsUtil.keys]] for the exact
  * order-isomorphism contract with the md5/substring hex chain.
  */
case class MinhashLongsExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k % 2 == 0, "k must be positive and even")
  // Value-deterministic, but DECLARED non-deterministic to stop
  // CollapseProject from inlining the k-digest computation into every
  // one of the k `min(element_at(...))` aggregate arguments (the guide's
  // "mark expensive expressions non-deterministic" move): inlined, the
  // fused call runs k times per shingle row.
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_longs"

  override protected def nullSafeEval(v: Any): Any =
    MinhashLongsUtil.keys(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashLongsUtil.keys($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashLongsExpr =
    copy(child = newChild)
}

object MinhashLongsExpr {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(MinhashLongsExpr(
      ColumnBridge.expression(c.cast("string")), k))
}
