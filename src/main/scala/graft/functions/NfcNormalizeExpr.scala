package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC helper shared by interpreted eval and generated code.
  * `java.text.Normalizer` is thread-safe and allocation-light for
  * already-normal strings (the common case — it checks isNormalized
  * first here so ASCII corpora pay one scan, no copy).
  */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen Unicode NFC normalization — the canonical-composition pass
  * every tokenizer pipeline runs before segmentation (a decomposed
  * "e + U+0301" and a precomposed "é" must not become two vocabulary
  * entries). Mirrors DuckDB's `nfc_normalize` exactly (both implement
  * UAX #15 canonical composition), so normalization audits are
  * oracle-gatable.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(v: Any): Any =
    NfcUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(
      ColumnBridge.expression(c.cast("string"))))
}
