package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared dot-product kernel: a sequential left fold with a 0.0 init,
  * the SAME operation order as the `aggregate(zip_with(...))`
  * formulation and the DuckDB oracle's list_reduce — so swapping the
  * interpreted higher-order fold for this compiled loop changes
  * nothing in the produced bits, only the cost per pair. */
object VecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // fail loudly on ragged input: silently folding min(len) would
    // return a plausible-but-wrong cosine for a mis-dimensioned corpus
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** `vec_dot(a, b)`: native codegen dot product over two
  * `array<double>` columns. The higher-order-function version
  * (`aggregate(zip_with(a, b, *), 0d, +)`) evaluates interpreted —
  * per-pair lambda dispatch and array allocation — which dominates
  * wall-clock in all-pairs similarity joins; this expression is one
  * virtual-call-free loop inside whole-stage codegen. */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDotProduct].getName, "vec_dot"),
    (args: Seq[Expression]) => VecDotProduct(args(0), args(1)))
}
