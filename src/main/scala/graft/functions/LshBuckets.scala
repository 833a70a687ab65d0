package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `tables` sign-LSH bucket ids of one embedding in ONE expression,
  * with the ±1 hyperplane matrix held as a codegen REFERENCE OBJECT.
  *
  * The former formulation — `array(lshBucket(v, 0) … lshBucket(v,
  * tables−1))`, each bucket a sum of `bits` `when(dot(v, plane) ≥ 0,
  * 1<<j)` terms over a `dim`-literal plane array — builds tables · bits
  * · dim literal nodes: at the 100× knob schedule (tables = 64, bits =
  * 12, dim = 64) that is ~49k nodes, and the Generate stage consuming it
  * blows the 64 KB JIT method limit ("Code grows beyond 64 KB",
  * BENCH_SF10H round-13 log), dropping the THREE heaviest queries of the
  * sweep (`dedup_embedding` 74.6 s, `dedup_embedding_histogram` 52.6 s,
  * `sim_ann_lsh` 42.8 s at 100×) to interpreted eval — where every row
  * also allocates `tables` boxed plane arrays. Same disease, same cure
  * as [[CentroidArgMin]]: the matrix lives OFF the expression tree as
  * one object reference, and the whole bucket battery is a tight
  * primitive loop (tables·bits·dim multiply-adds, zero allocation
  * beyond the output array).
  *
  * Arithmetic is EXACTLY the former formulation's, so every oracle that
  * replays the plane family is untouched: plane p = table·bits + j has
  * cell i = ±1 by MD5("p:i") bit 4 of byte 0 ([[planeSign]] — the same
  * function the per-column `lshBucket` used); the dot accumulates
  * left-to-right over min(|v|, dim) (the [[DoubleDotProduct]] order);
  * bit j is set iff dot ≥ 0 (an EMPTY vector sets every bit — dot 0.0);
  * a NULL vector yields the all-zero bucket array (the old `when(…)
  * .otherwise(0)` + `CreateArray` never returned null). Bit-identity
  * with the per-column formulation is gated in SimilaritySpec.
  */
case class LshBuckets(child: Expression, dim: Int, bits: Int, tables: Int)
    extends UnaryExpression {
  require(dim > 0 && bits > 0 && bits <= 62 && tables > 0,
    s"lsh_buckets: need dim>0, 0<bits<=62, tables>0; got ($dim,$bits,$tables)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_buckets"

  // analysis-time guard: a non-array<double> child must fail analysis,
  // not garbage-read getDouble at runtime
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> input, got ${other.catalogString}")
    }

  // the matrix derives deterministically from (dim, bits, tables), so
  // case-class structural equality — and with it Catalyst semantic
  // equality and subexpression elimination — just works; planes are
  // rebuilt lazily on each deserialized task, once per executor
  @transient private lazy val planes: Array[Double] =
    LshBuckets.planeMatrix(dim, bits, tables)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Long](tables))
    else new GenericArrayData(
      LshBuckets.buckets(v.asInstanceOf[ArrayData], planes, dim, bits, tables))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val childGen = child.genCode(ctx)
    val out = ctx.freshName("buckets")
    ev.copy(code =
      code"""
         |${childGen.code}
         |long[] $out;
         |if (${childGen.isNull}) {
         |  $out = new long[$tables];
         |} else {
         |  $out = graft.functions.LshBuckets.buckets(
         |    ${childGen.value}, $planesRef, $dim, $bits, $tables);
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  /** ±1 hyperplane cell for absolute plane `p`, dimension `i` — the
    * SINGLE source of the plane family, shared with the per-column
    * `Similarity.lshBucket` and documented for oracle replay: sign is
    * +1 iff bit 4 of MD5("p:i") byte 0 is clear.
    */
  def planeSign(p: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Flattened (tables·bits) × dim matrix; row p = plane table·bits+j. */
  def planeMatrix(dim: Int, bits: Int, tables: Int): Array[Double] = {
    val m = new Array[Double](tables * bits * dim)
    var p = 0
    while (p < tables * bits) {
      var i = 0
      while (i < dim) { m(p * dim + i) = planeSign(p, i); i += 1 }
      p += 1
    }
    m
  }

  /** Shared by interpreted eval and generated code (static forwarder).
    * Left-to-right accumulation over min(|v|, dim); bit set iff ≥ 0.
    */
  def buckets(v: ArrayData, planes: Array[Double],
      dim: Int, bits: Int, tables: Int): Array[Long] = {
    val n = math.min(v.numElements(), dim)
    // one primitive copy so the hot loop reads a flat double[] instead
    // of re-dispatching ArrayData.getDouble tables·bits times per cell
    val q = new Array[Double](n)
    var c = 0
    while (c < n) { q(c) = v.getDouble(c); c += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * dim
        var acc = 0.0
        var i = 0
        while (i < n) { acc += q(i) * planes(base + i); i += 1 }
        if (acc >= 0) bucket += (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }

  /** `v` must already be `array<double>`. */
  def apply(v: Column, dim: Int, bits: Int, tables: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(v), dim, bits, tables))
}
