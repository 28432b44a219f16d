package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType,
  StructField, StructType}

/** Argmax-centroid assignment for LARGE k-means models: the centroid
  * matrix rides the expression as a codegen REFERENCE (shipped once per
  * stage with the broadcast task binary) instead of per-centroid
  * `typedlit` plan literals — at k=4096 × dim=768 the literal spelling
  * puts ~3M array elements in the expression tree, the same plan
  * blow-up [[BloomExpressions]] exists to prevent for the bloom word
  * table. The kernel replays the EXACT arithmetic of the literal path
  * ([[graft.pipeline.KMeans.assignmentColumns]]): exact long dot
  * product over the min length, `dot.toDouble / sqrt(nrm)` per
  * centroid, strict-greater argmax (⇒ lowest index wins ties), −∞ for
  * a zero centroid, all-zero centroids → cid 0 — so the two spellings
  * are bit-identical and KMeansSpec pins the parity.
  */
object KMeansExpressions {

  /** `struct(cid int, score double)` of the best centroid for a
    * quantized `array<long>` vector (NULL in → NULL struct out).
    * `nrmSqrt(c)` must be `sqrt(dot(m_c, m_c).toDouble)` — callers
    * precompute it once so per-row work is the dot products alone.
    */
  def assignBestC(vq: Column, centroids: Array[Array[Long]],
      nrmSqrt: Array[Double]): Column =
    graftshim.column(KMeansAssignBest(graftshim.expression(vq),
      centroids, nrmSqrt))
}

object KMeansAssignKernel {
  /** One pass over the matrix: exact long dots, IEEE divide by the
    * precomputed norm, first-max argmax. Identical op order to
    * [[graft.pipeline.KMeans.quantizeAssignJ]] and to the literal
    * Column path, so all three agree bit-for-bit.
    */
  def assign(cents: Array[Array[Long]], nrmSqrt: Array[Double],
      vq: ArrayData): InternalRow = {
    val n = vq.numElements()
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val m = cents(c)
      val len = if (n < m.length) n else m.length
      var dot = 0L
      var j = 0
      while (j < len) { dot += vq.getLong(j) * m(j); j += 1 }
      val s =
        if (nrmSqrt(c) == 0.0) Double.NegativeInfinity
        else dot.toDouble / nrmSqrt(c)
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestS))
  }
}

case class KMeansAssignBest(child: Expression,
    centroids: Array[Array[Long]], nrmSqrt: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  override def prettyName: String = "graft_kmeans_assign_best"

  override protected def nullSafeEval(v: Any): Any =
    KMeansAssignKernel.assign(centroids, nrmSqrt,
      v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("kmCentroids", centroids, "long[][]")
    val nRef = ctx.addReferenceObj("kmNrmSqrt", nrmSqrt, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.KMeansAssignKernel.assign($cRef, $nRef, $v)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): KMeansAssignBest = copy(child = newChild)
}
