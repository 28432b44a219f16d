package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text hot path — the
  * [[VectorExpressions]] discipline applied to language ID.
  *
  * The Column-tree version ([[graft.pipeline.TextAnalysis
  * .langIdColumnTree]]) spells each stopword count as
  * `(length(t) - length(replace(t, probe))) / len` — 25 probe
  * substitutions ALLOCATE 25 rewritten copies of every document per
  * row, which made `lang_id` the most expensive scalar on the text
  * surface (~0.95 s of `sql_text_surface`'s 1.9 s at sf0.1). This
  * kernel lowercases once through the SAME `UTF8String.toLowerCase`
  * Spark's `lower()` uses, then counts all probes with greedy
  * byte-scans over that single buffer — zero per-probe allocation,
  * same greedy non-overlapping occurrence rule as `replace`
  * (probes are pure ASCII, and no ASCII byte can occur inside a
  * multi-byte UTF-8 character, so byte-level search equals
  * character-level search). Scores, tie order (en > de > fr > es >
  * it) and the `und` floor mirror the Column tree bit-for-bit — the
  * DuckDB oracle that replays the occ() arithmetic is unaffected
  * (TextExpressionsSpec pins corpus-wide parity).
  */
object TextExpressions {

  /** Codegen'd language ID over a string column. */
  def langIdC(text: Column): Column =
    graftshim.column(LangIdExpr(graftshim.expression(text)))
}

/** The shared JVM kernel — called from both interpreted eval and the
  * generated code.
  */
object LangIdKernel {
  // insertion order IS the tie order; probes mirror
  // TextAnalysis.langProbes exactly
  val order: Array[String] = Array("en", "de", "fr", "es", "it")
  private val probeBytes: Array[Array[Array[Byte]]] = Array(
    Array(" the ", " and ", " of ", " to ", " is "),
    Array(" der ", " und ", " die ", " ist ", " das "),
    Array(" le ", " la ", " et ", " les ", " est "),
    Array(" el ", " de la ", " los ", " es ", " y "),
    Array(" il ", " di ", " che ", " e ", " la "))
    .map(_.map(_.getBytes("US-ASCII")))
  private val langs: Array[UTF8String] =
    order.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  /** Greedy non-overlapping occurrence count — the `replace` rule. */
  private def count(h: Array[Byte], len: Int, n: Array[Byte]): Int = {
    var c = 0
    var i = 0
    val last = len - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && h(i + j) == n(j)) j += 1
      if (j == n.length) { c += 1; i += n.length } else i += 1
    }
    c
  }

  def langId(text: UTF8String): UTF8String = {
    val lower = text.toLowerCase.getBytes
    var bestIdx = -1
    var bestScore = 0
    var l = 0
    while (l < probeBytes.length) {
      var s = 0
      var p = 0
      while (p < probeBytes(l).length) {
        s += count(lower, lower.length, probeBytes(l)(p))
        p += 1
      }
      // strictly greater: earlier languages win ties
      if (s > bestScore) { bestScore = s; bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) und else langs(bestIdx)
  }
}

/** Input MUST be string (callers ensure; see [[CosineSimilarity]] on
  * why `ExpectsInputTypes` is out of reach outside the Spark
  * namespace).
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdKernel.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangIdKernel.langId($c)")

  override protected def withNewChildInternal(
      newChild: Expression): LangIdExpr = copy(child = newChild)
}
