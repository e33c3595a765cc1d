package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index over two 16-bit dimensions, shared by the
  * interpreted eval path, the generated code, and (via
  * [[Hilbert.oracleSqlExpr]]) the DuckDB oracle replay.
  *
  * The classic iterative xy→d walk (the Wikipedia/Warren formulation):
  * per level from the top bit down, extract the quadrant (rx, ry),
  * add its contribution `s²·((3·rx) xor ry)` to the index, and rotate
  * the frame (when ry=0: reflect if rx=1, then swap x/y) so the next
  * level sees curve-local coordinates.
  *
  * Why alongside Morton (`Layout.mortonKey`): both interleave two
  * dimensions into one clustering key, but the Hilbert walk never
  * makes the diagonal jumps Morton's bit-interleave takes at quadrant
  * boundaries — CONSECUTIVE index values are always edge-adjacent
  * cells (unit Manhattan step, asserted in the spec). For file layout
  * that means a contiguous key range maps to a more compact x/y
  * region, i.e. tighter per-file min/max stats on both source columns
  * — the reason newer table formats cluster by Hilbert rather than
  * Z-order.
  */
object Hilbert {
  /** Bits per dimension (16 ⇒ a 65536×65536 grid, 32-bit indices). */
  final val Bits = 16

  /** xy→d: the shared JVM walk. Inputs are masked to [[Bits]] bits. */
  def xy2d(x0: Long, y0: Long): Long = {
    val mask = (1L << Bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** d→xy inverse (spec-only: bijectivity evidence). */
  def d2xy(d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < (1L << Bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** The identical walk UNROLLED as engine-neutral SQL — one chained
    * CTE per level, pure BIGINT CASE/bit math, so DuckDB replays the
    * executor's bits exactly. `baseCte` must be a named CTE exposing
    * (ox, oy, x, y, d): original coords carried untouched for the
    * consumer's report, curve-local (x, y, d) seeded as (x, y, 0).
    * Returns the chained CTE text `, h1 AS (...), …, h{Bits} AS (...)`
    * whose last CTE `h16` holds the finished index in `d`.
    *
    * Per level (the object-doc walk, branches as CASE):
    *   ry=1            → (x, y) unchanged
    *   ry=0, rx=0      → swap: (y, x)
    *   ry=0, rx=1      → reflect+swap: (s-1-y, s-1-x)
    *   d += s²·((3rx) xor ry)
    */
  def oracleChainCtes(baseCte: String): String = {
    val steps = (0 until Bits).map { k =>
      val s = 1L << (Bits - 1 - k)
      val prev = if (k == 0) baseCte else s"h$k"
      s"""h${k + 1} AS (
         |  SELECT ox, oy,
         |    CASE WHEN (y & $s) > 0 THEN x
         |         WHEN (x & $s) > 0 THEN ${s - 1} - y
         |         ELSE y END AS x,
         |    CASE WHEN (y & $s) > 0 THEN y
         |         WHEN (x & $s) > 0 THEN ${s - 1} - x
         |         ELSE x END AS y,
         |    d + $s * $s * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
         |                      (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d
         |  FROM $prev)""".stripMargin
    }
    steps.mkString(", ", ", ", "")
  }
}

/** `hilbert_index(x, y)`: the Hilbert index as a native codegen
  * expression — the generated code is one static call per row inside
  * the consuming operator's whole-stage body (the poly_hash64
  * precedent), so the clustering key costs a register-local loop, no
  * UDF boundary. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Hilbert.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertFunctions {
  val hilbertIndex: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_index"),
    new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
    (args: Seq[Expression]) => HilbertIndex(args(0), args(1)))
}
