package graft.functions

import graft.pipeline.{BpeKernel, BpeModel}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Catalyst expressions over [[graft.pipeline.Bpe]] —
  * the [[TextExpressions]] discipline applied to the tokenizer: the
  * model object becomes a codegen REFERENCE (one object per plan,
  * shipped with the broadcast task binary — never serialized per row),
  * and the per-row work is one cached-word kernel call fused into
  * whole-stage codegen. Zero UDFs.
  */
object BpeExpressions {

  /** Exact token count of `text` under `model` (int). */
  def bpeCountC(text: Column, model: BpeModel): Column =
    graftshim.column(BpeCountExpr(graftshim.expression(text), model))

  /** Final BPE pieces of `text` in order (array<string>). */
  def bpePiecesC(text: Column, model: BpeModel): Column =
    graftshim.column(BpePiecesExpr(graftshim.expression(text), model))

  /** Token ids of `text` in order (array<int>; unknown → model.unkId). */
  def bpeEncodeC(text: Column, model: BpeModel): Column =
    graftshim.column(BpeEncodeExpr(graftshim.expression(text), model))
}

private[graft] trait BpeExprBase extends UnaryExpression {
  def model: BpeModel
  def kernelMethod: String

  protected def genWithModel(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[BpeModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.BpeKernel.$kernelMethod($ref, $c)")
  }
}

case class BpeCountExpr(child: Expression, model: BpeModel)
    extends BpeExprBase {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"
  override def kernelMethod: String = "countUtf8"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.countUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): BpeCountExpr = copy(child = newChild)
}

case class BpePiecesExpr(child: Expression, model: BpeModel)
    extends BpeExprBase {
  override def dataType: DataType = ArrayType(StringType, false)
  override def prettyName: String = "graft_bpe_pieces"
  override def kernelMethod: String = "piecesUtf8"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.piecesUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): BpePiecesExpr = copy(child = newChild)
}

case class BpeEncodeExpr(child: Expression, model: BpeModel)
    extends BpeExprBase {
  override def dataType: DataType = ArrayType(IntegerType, false)
  override def prettyName: String = "graft_bpe_encode"
  override def kernelMethod: String = "encodeUtf8"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encodeUtf8(model, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = genWithModel(ctx, ev)
  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpr = copy(child = newChild)
}
