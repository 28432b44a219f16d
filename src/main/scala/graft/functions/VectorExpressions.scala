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

  /** Codegen'd exact dot product over two `array<long>` columns.
    *
    * The fixed-point kernel under [[graft.pipeline.KMeans]]: quantized
    * vectors and centroids are exact long vectors, so the dot product is
    * exact 64-bit integer arithmetic — associative, order-independent,
    * and (for magnitudes below 2^53) bit-identical to any other engine's
    * replay in double arithmetic. A higher-order `zip_with`+`aggregate`
    * spelling computes the same value but falls out of whole-stage
    * codegen (HigherOrderFunction is CodegenFallback); this expression
    * keeps the k-per-row scoring loop fused.
    */
  def dotLongC(a: Column, b: Column): Column =
    graftshim.column(LongDotProduct(graftshim.expression(a),
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

/** Exact dot product of two `array<long>` columns (shorter length wins;
  * overflow wraps as 64-bit twos-complement, callers bound magnitudes).
  * Inputs MUST be `array<long>` (same `ExpectsInputTypes` caveat as
  * [[CosineSimilarity]]).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "long_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        final int $n = java.lang.Math.min($a.numElements(),
          $b.numElements());
        long $dot = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}
