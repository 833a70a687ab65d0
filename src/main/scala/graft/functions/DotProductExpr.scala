package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Dot product of two `array<double>` columns as a native codegen'd
  * expression. The `zip_with` + `aggregate` higher-order-function
  * formulation allocates an intermediate array and boxes every element;
  * this runs a tight primitive loop inside whole-stage codegen —
  * ~10× faster in the all-pairs similarity hot path.
  *
  * Accumulation is left-to-right, matching both the HOF formulation and
  * DuckDB's `list_dot_product` — oracle-exact.
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object DoubleDotProduct {
  /** Both inputs must already be `array<double>`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Exact BIGINT dot product of two `array<long>` columns — the
  * fixed-point sibling of [[DoubleDotProduct]], and the reason the
  * k-means assignment argmin can run at large nlist: the
  * `zip_with`+`aggregate` squared-L2 formulation is an interpreted
  * higher-order function that boxes every element, costing
  * O(n·nlist·dim) lambda invocations per Lloyd pass (measured ~50 s at
  * nlist=160 on 20k vectors, SCALE.md round-8 close). Scoring
  * argmin by |c|² − 2·q·c instead (the |q|² term is constant per row,
  * so the ordering — including ties — is untouched) turns each
  * centroid's distance into one tight primitive loop inside
  * whole-stage codegen. Exact: all operands are BIGINTs bounded by
  * dim·(10⁶)² ≈ 2⁴⁶, far inside 2⁶³.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  /** Both inputs must already be `array<long>`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
