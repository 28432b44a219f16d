package graft.functions

import graft.pipeline.{UnigramKernel, UnigramModel}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Catalyst expressions over
  * [[graft.pipeline.Unigram]] — the [[BpeExpressions]] discipline for
  * the Viterbi tokenizer: the model is a codegen REFERENCE (one object
  * per plan, shipped with the task binary), per-row work is one
  * cached-word kernel call fused into whole-stage codegen. Zero UDFs.
  */
object UnigramExpressions {

  /** Exact token count of `text` under `model` (int). */
  def unigramCountC(text: Column, model: UnigramModel): Column =
    graftshim.column(UnigramCountExpr(graftshim.expression(text), model))

  /** Viterbi pieces of `text` in order (array<string>). */
  def unigramPiecesC(text: Column, model: UnigramModel): Column =
    graftshim.column(UnigramPiecesExpr(graftshim.expression(text), model))

  /** Piece ids of `text` in order (array<int>; unknown → model.unkId). */
  def unigramEncodeC(text: Column, model: UnigramModel): Column =
    graftshim.column(UnigramEncodeExpr(graftshim.expression(text), model))

  /** Total Viterbi cost in micro-nats (long) — the unigram-LM negative
    * log-likelihood quality signal.
    */
  def unigramScoreC(text: Column, model: UnigramModel): Column =
    graftshim.column(UnigramScoreExpr(graftshim.expression(text), model))
}

private[graft] trait UnigramExprBase extends UnaryExpression {
  def model: UnigramModel
  def kernelMethod: String

  protected def genWithModel(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.UnigramKernel.$kernelMethod($ref, $c)")
  }
}

case class UnigramCountExpr(child: Expression, model: UnigramModel)
    extends UnigramExprBase {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_unigram_count"
  override def kernelMethod: String = "countUtf8"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.countUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): UnigramCountExpr = copy(child = newChild)
}

case class UnigramPiecesExpr(child: Expression, model: UnigramModel)
    extends UnigramExprBase {
  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "graft_unigram_pieces"
  override def kernelMethod: String = "piecesUtf8"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.piecesUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): UnigramPiecesExpr = copy(child = newChild)
}

case class UnigramEncodeExpr(child: Expression, model: UnigramModel)
    extends UnigramExprBase {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def prettyName: String = "graft_unigram_encode"
  override def kernelMethod: String = "encodeUtf8"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.encodeUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncodeExpr = copy(child = newChild)
}

case class UnigramScoreExpr(child: Expression, model: UnigramModel)
    extends UnigramExprBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_score"
  override def kernelMethod: String = "scoreUtf8"
  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.scoreUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): UnigramScoreExpr = copy(child = newChild)
}
