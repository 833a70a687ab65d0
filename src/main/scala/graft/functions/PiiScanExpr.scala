package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-call PII scanner (codegen helper — outside the
  * expression companion for the static-forwarder reason documented on
  * [[DeflateUtil]]).
  *
  * Semantics are EXACTLY the composed built-in form they replace
  * (TextOps.piiScrubBuiltin, gated equivalent in TextSpec):
  *  - each count is the number of successive leftmost matches of its
  *    pattern on the ORIGINAL text (java.util.regex find() loop — the
  *    same iteration `regexp_count` runs);
  *  - the redacted text applies email → ip → phone replaceAll
  *    SEQUENTIALLY (each pattern over the previous result), the order
  *    the scaladoc on TextOps.piiScrub pins.
  *
  * What the fusion buys at scale: the built-in chain runs SIX separate
  * regex expressions, each with its own UTF8String→String conversion,
  * and materializes two intermediate redacted strings per row
  * (regexp_replace(regexp_replace(regexp_replace(...)))); this helper
  * converts once and shares the email matcher between its count and its
  * replacement pass — 5 matcher passes, 1 conversion, and one call-site
  * in the generated code, measured ~2x on the 10x corpus where
  * text_pii_scrub was the most expensive pure scan (12.1 s, SCALE.md).
  * Patterns are compiled once per JVM (static), not per row or per
  * task.
  */
object PiiUtil {
  /** RE2-safe pattern SOURCE OF TRUTH (no lookaround, no \b): the same
    * strings run in DuckDB's RE2 for the oracle (TextSql.piiScrub reads
    * them via TextOps). Greedy leftmost semantics agree between Java
    * regex and RE2 for these shapes.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
  val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private val EMAIL = Pattern.compile(emailRe)
  private val IP = Pattern.compile(ipRe)
  private val PHONE = Pattern.compile(phoneRe)

  def scan(u: UTF8String): InternalRow = {
    val s = u.toString
    // email: count + redact share ONE matcher pass (email is the first
    // replacement, so its pass runs over the original text anyway)
    val me = EMAIL.matcher(s)
    var nEmails = 0L
    val sb = new java.lang.StringBuilder(s.length)
    while (me.find()) { nEmails += 1; me.appendReplacement(sb, "[EMAIL]") }
    me.appendTail(sb)
    val r1 = sb.toString
    // ip / phone counts run on the ORIGINAL text (regexp_count
    // semantics), their redactions on the sequentially-redacted text
    var nIps = 0L
    val ci = IP.matcher(s)
    while (ci.find()) nIps += 1
    var nPhones = 0L
    val cp = PHONE.matcher(s)
    while (cp.find()) nPhones += 1
    val r2 = IP.matcher(r1).replaceAll("[IP]")
    val r3 = PHONE.matcher(r2).replaceAll("[PHONE]")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nEmails, nIps, nPhones, UTF8String.fromString(r3)))
  }
}

/** One-pass PII audit struct (n_emails, n_ips, n_phones, redacted) as a
  * native codegen'd expression — see [[PiiUtil.scan]] for the exact
  * semantics contract with the built-in chain it replaces.
  */
case class PiiScanExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def prettyName: String = "graft_pii_scan"

  override protected def nullSafeEval(v: Any): Any =
    PiiUtil.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiUtil.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScanExpr =
    copy(child = newChild)
}

object PiiScanExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(PiiScanExpr(
      ColumnBridge.expression(c.cast("string"))))
}
