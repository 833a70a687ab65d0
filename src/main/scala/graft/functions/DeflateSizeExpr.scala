package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly deflate helper. Lives OUTSIDE the expression's
  * companion so the JVM static forwarder exists (Scala suppresses
  * forwarders on companions of a class with the same name, and Janino
  * can't see `Object$.MODULE$` cleanly). One Deflater per thread,
  * `reset()` per call — allocating a native zlib stream per row would
  * dominate the scan.
  */
object DeflateUtil {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }

  /** Raw-deflate (no zlib header) byte count of the input at the default
    * level. Deterministic for a given zlib implementation — the JDK's —
    * which is why the query surface gates this path rows-only with a
    * ScalaTest ordering gate instead of a cross-engine oracle.
    */
  def compressedSize(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Deflate-compressed size (bytes) of a string's UTF-8 payload as a
  * native codegen'd expression — the compression-ratio quality signal
  * web-scale curation pipelines use (boilerplate and template text
  * compresses far below natural prose; random/encrypted payloads barely
  * compress at all). Emitting the SIZE (not the ratio) keeps the
  * expression integer-exact; callers derive fixed-point ratios against
  * `octet_length`.
  */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override protected def nullSafeEval(v: Any): Any =
    DeflateUtil.compressedSize(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateUtil.compressedSize($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)
}

object DeflateSizeExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(DeflateSizeExpr(
      ColumnBridge.expression(c.cast("string"))))
}
