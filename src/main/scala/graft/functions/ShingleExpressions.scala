package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the shingle-set verify hot path.
  *
  * The exact-Jaccard verify stage of every near-dup family (minhash /
  * simhash / ngram candidates → shingle-set join → J ≥ threshold) was
  * previously `size(array_intersect) / size(array_union)` — two per-pair
  * hash tables over a few hundred longs each, the dominant cost once a
  * low-entropy corpus makes candidates dense (sf0.1 simhash probe:
  * 142k verified pairs per 250-doc batch). [[Dedup.shingleHashArray]]
  * emits its distinct hashes SORTED, so the verify can run a single
  * allocation-free linear merge: |A∩B| by two-pointer walk,
  * |A∪B| = |A| + |B| − |A∩B| by arithmetic (valid because the arrays
  * are duplicate-free by construction).
  */
object ShingleOps {

  /** Jaccard similarity of two duplicate-free `array<long>` columns;
    * merge fast path when both are sorted ascending, hash-set fallback
    * otherwise (a pre-sorted-layout persisted index read by a newer
    * binary must not silently undercount).
    */
  def jaccardSortedC(a: Column, b: Column): Column =
    graftshim.column(JaccardSortedDistinct(graftshim.expression(a),
      graftshim.expression(b)))

  /** Runtime kernel, shared by interpreted eval and codegen (a static
    * call per row keeps generated method size trivially small — the
    * same pattern Spark's own collection expressions use).
    */
  def jaccard(aRaw: AnyRef, bRaw: AnyRef): Double = {
    val a = aRaw.asInstanceOf[ArrayData]
    val b = bRaw.asInstanceOf[ArrayData]
    val nA = a.numElements()
    val nB = b.numElements()
    if (nA == 0 && nB == 0) return 1.0
    if (nA == 0 || nB == 0) return 0.0
    var inter = 0L
    var i = 0
    var j = 0
    var prevX = Long.MinValue
    var prevY = Long.MinValue
    var sorted = true
    while (sorted && i < nA && j < nB) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < prevX || y < prevY) sorted = false
      else {
        prevX = x; prevY = y
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    // tail sortedness: elements past the merge exit never affect the
    // count when sorted; if EITHER array is unsorted anywhere the merge
    // count may be wrong, so verify the remainder before trusting it
    if (sorted) {
      while (sorted && i + 1 < nA) {
        if (a.getLong(i + 1) < a.getLong(i)) sorted = false; i += 1
      }
      while (sorted && j + 1 < nB) {
        if (b.getLong(j + 1) < b.getLong(j)) sorted = false; j += 1
      }
    }
    if (!sorted) {
      // legacy unsorted layout: exact hash-set count (duplicate-free
      // contract still required for the union arithmetic)
      val set = new java.util.HashSet[java.lang.Long](nA * 2)
      var k = 0
      while (k < nA) { set.add(a.getLong(k)); k += 1 }
      inter = 0
      k = 0
      while (k < nB) { if (set.contains(b.getLong(k))) inter += 1; k += 1 }
    }
    val union = nA.toLong + nB.toLong - inter
    if (union == 0L) 1.0 else inter.toDouble / union.toDouble
  }
}

/** Inputs MUST be duplicate-free `array<long>` (the
  * [[graft.pipeline.Dedup.shingleHashArray]] output contract); see
  * [[ShingleOps.jaccard]] for the sorted fast path / unsorted fallback.
  */
case class JaccardSortedDistinct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_distinct"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleOps.jaccard(a.asInstanceOf[AnyRef], b.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ShingleOps.jaccard($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSortedDistinct =
    copy(left = newLeft, right = newRight)
}
