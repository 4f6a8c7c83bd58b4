package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization kernels for corpus preparation: the
  * same byte sequence rendered two ways ("Café" composed vs
  * "Café" decomposed) must hash identically before any
  * dedup/fingerprint pass, or visually-identical documents survive
  * exact dedup and pollute near-dup thresholds.
  *
  *  - [[NfcNormalize]] — canonical composition (Unicode NFC). The
  *    canonical pre-hash form; composed output is also the shortest.
  *  - [[StripAccents]] — NFD decomposition, then drop all combining
  *    marks (general categories Mn/Me/Mc). Matches DuckDB/utf8proc
  *    `strip_accents` exactly: base letters keep case, non-decomposable
  *    letters (ø, ß) pass through.
  *
  * Both stay inside whole-stage codegen via a static-helper call (the
  * JDK Normalizer is pure and thread-safe), so normalization rides the
  * scan at bandwidth like the other string kernels. ASCII fast path:
  * NFC/NFD are identity on ASCII, checked bytewise without allocating.
  */
object UnicodeNormHelper {
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
          t != Character.COMBINING_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormHelper.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNormHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormHelper.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNormHelper.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column =
    GraftColumnBridge.column(new NfcNormalize(GraftColumnBridge.expression(c)))
}

object StripAccents {
  def apply(c: Column): Column =
    GraftColumnBridge.column(new StripAccents(GraftColumnBridge.expression(c)))
}
