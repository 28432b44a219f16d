package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Tier (b) of the custom-operator ladder (SURVEY §7.2): a full
  * `doGenCode` implementation keeps cosine scoring INSIDE whole-stage
  * codegen — no typed-map deserialization boundary, no interpreted
  * higher-order lambdas. Fold order matches `Similarity.cosineJ`
  * bit-for-bit, so every oracle contract is unaffected.
  */
object VectorExpressions {

  /** Codegen'd cosine similarity over two `array<float>` columns. */
  def cosineC(a: Column, b: Column): Column =
    graftshim.column(CosineSimilarity(graftshim.expression(a),
      graftshim.expression(b)))
}

/** Inputs MUST be `array<float>` (callers cast; `AbstractDataType` is
  * private[sql], so `ExpectsInputTypes` is not implementable outside the
  * Spark namespace).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nA = x.numElements()
    val nB = y.numElements()
    var na = 0.0
    var i = 0
    while (i < nA) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < nB) { val v = y.getFloat(i).toDouble; nb += v * v; i += 1 }
    var dot = 0.0
    val n = math.min(nA, nB)
    i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nA = ctx.freshName("nA")
      val nB = ctx.freshName("nB")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      s"""
        final int $nA = $a.numElements();
        final int $nB = $b.numElements();
        double $na = 0.0;
        for (int $i = 0; $i < $nA; $i++) {
          final double $v = (double) $a.getFloat($i);
          $na += $v * $v;
        }
        double $nb = 0.0;
        for (int $i = 0; $i < $nB; $i++) {
          final double $v = (double) $b.getFloat($i);
          $nb += $v * $v;
        }
        double $dot = 0.0;
        final int $n = java.lang.Math.min($nA, $nB);
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        final double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
