package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native Catalyst expression — the
  * corpus-cleaning step Spark has no built-in for: NFC composition
  * (é as e + U+0301 and as U+00E9 must dedup/shingle identically),
  * C0/DEL control stripping, whitespace-run collapse, trim. Tier (b)
  * of the custom-operator ladder: `doGenCode` emits one static JVM
  * call per row, so the expression stays inside whole-stage codegen
  * (a Scala UDF would break the codegen span AND pay serializer
  * boundaries).
  *
  * Contract (order matters and is mirrored by the oracle SQL):
  *  1. NFC-normalize (java.text.Normalizer; the oracle's
  *     `nfc_normalize` implements the same Unicode algorithm);
  *  2. strip control chars 0x00-0x08, 0x0E-0x1F, 0x7F (the
  *     non-whitespace C0 set + DEL);
  *  3. collapse runs of [space \t \n \r 0x0B \f] to ONE space
  *     (explicit set — Java's and RE2's `\s` disagree on 0x0B);
  *  4. trim leading/trailing spaces.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeText.normalize($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}

object NormalizeText {

  /** Column builder. */
  def normalizeText(text: Column): Column =
    graftshim.column(NormalizeText(graftshim.expression(text)))

  private def isStrippedControl(c: Char): Boolean =
    (c >= 0x00 && c <= 0x08) || (c >= 0x0E && c <= 0x1F) || c == 0x7F

  private def isCollapsedSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0B ||
      c == '\f'

  /** JVM kernel shared by interpreted and codegen'd paths. */
  def normalize(s: String): String = {
    val nfc =
      if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      if (isStrippedControl(c)) {
        // dropped entirely
      } else if (isCollapsedSpace(c)) {
        pendingSpace = started // leading whitespace never emits
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.toString // trailing whitespace left pending = trimmed
  }
}
