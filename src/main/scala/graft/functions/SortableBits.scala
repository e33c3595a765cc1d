package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving DOUBLE → LONG tick mapping (the radix-sort "flip"
  * trick): signed-long comparison of the ticks matches IEEE double
  * comparison exactly, and the mapping is a bijection on non-NaN
  * doubles — so integer-domain selection machinery (the exact-quantiles
  * histogram refinement, Quantiles.scala) applies UNCHANGED to
  * continuous double score columns, with tie cells in tick space equal
  * to tie cells in double space bit-for-bit.
  *
  * ticks(d) = bits(d) XOR ((bits(d) >> 63) AND 0x7FFF...F): positive
  * doubles keep their (already monotonic) payload, negative doubles
  * get their magnitude bits flipped so "more negative" sorts lower.
  * Callers that must treat -0.0 == +0.0 as one tie cell normalize with
  * `d + 0.0` first (IEEE: -0.0 + 0.0 = +0.0); NaN maps above +Inf.
  */
object SortableBits {
  /** The shared scalar kernel (interpreted eval + generated code). */
  def ticks(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7FFFFFFFFFFFFFFFL)
  }
}

/** `sortable_double_bits(double)`: the order-preserving tick of a
  * double. Catalyst expression with doGenCode — one branch-free
  * statement inside the consuming operator's codegen body. */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_double_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sortable_double_bits requires DOUBLE input, got ${child.dataType.sql}")

  protected override def nullSafeEval(input: Any): Any =
    SortableBits.ticks(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SortableBits.ticks($c)")

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)
}

object SortableBitsFunctions {
  val sortableDoubleBits: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sortable_double_bits"),
    new ExpressionInfo(classOf[SortableDoubleBits].getName, "sortable_double_bits"),
    (args: Seq[Expression]) => SortableDoubleBits(args(0)))
}
