package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}

/** Word lookup for the bloom family's LARGE filters: the word arrays
  * ride the expression as a codegen REFERENCE (shipped once per stage
  * with the broadcast task binary) instead of a `typedlit` plan
  * literal — a 2^30-bit filter as a literal is a 16M-element array in
  * the expression tree (~128 MB serialized with EVERY plan), which is
  * exactly the blow-up the sidecar's own 100 TB contract forbids. The
  * positions are still computed by Spark's `xxhash64` Columns, so
  * build-side and probe-side hashing can never drift.
  */
object BloomExpressions {

  /** `words(shard)(wordIdx)` as a codegen'd Column (missing/short
    * shards read as 0 — an absent word is an all-zero word).
    */
  def wordAtC(shard: Column, wordIdx: Column,
      words: Array[Array[Long]]): Column =
    graftshim.column(ShardWordAt(graftshim.expression(shard),
      graftshim.expression(wordIdx), words))
}

object ShardWordAtKernel {
  def wordAt(words: Array[Array[Long]], shard: Int, idx: Int): Long = {
    if (shard < 0 || shard >= words.length) return 0L
    val w = words(shard)
    if (idx < 0 || idx >= w.length) 0L else w(idx)
  }
}

case class ShardWordAt(left: Expression, right: Expression,
    words: Array[Array[Long]]) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_word_at"

  override protected def nullSafeEval(shard: Any, idx: Any): Any =
    ShardWordAtKernel.wordAt(words,
      shard.asInstanceOf[Number].intValue(),
      idx.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[][]")
    defineCodeGen(ctx, ev, (s, i) =>
      s"graft.functions.ShardWordAtKernel.wordAt($ref, (int)$s, (int)$i)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShardWordAt =
    copy(left = newLeft, right = newRight)
}
