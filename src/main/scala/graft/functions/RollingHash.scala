package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial (Karp–Rabin) hashing over UTF-8 bytes, shared by
  * the interpreted eval paths and the generated code. Base 257, odd
  * seed; arithmetic is plain wrapping Long multiply-add, so the
  * generated Java is branch-free per byte and stays inside
  * whole-stage codegen.
  */
object RollingHash {
  final val Base = 257L
  final val Seed = 1125899906842597L

  /** Full-string polynomial hash. */
  def polyHash(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    h
  }

  /** Minimum over all `w`-byte window hashes, computed with O(1)
    * rolling updates (subtract the outgoing byte's Base^(w-1) term,
    * multiply, add the incoming byte). Strings shorter than `w` hash
    * as a single window. Unsigned min keeps the fingerprint uniform
    * over the full 64-bit range. */
  def minRollingHash(bytes: Array[Byte], w: Int): Long = {
    val n = bytes.length
    if (n <= w) return polyHash(bytes)
    // window hash = Seed*Base^w + P where P is the seedless polynomial
    // of the window bytes; P rolls in O(1), the seed term is constant.
    var pow = 1L // Base^(w-1)
    var i = 0
    while (i < w - 1) { pow *= Base; i += 1 }
    val seedTerm = Seed * pow * Base // Seed * Base^w (wrapping)
    var p = 0L
    i = 0
    while (i < w) { p = p * Base + (bytes(i) & 0xFF); i += 1 }
    var min = seedTerm + p
    i = w
    while (i < n) {
      p = (p - (bytes(i - w) & 0xFF) * pow) * Base + (bytes(i) & 0xFF)
      val h = seedTerm + p
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }
}

/** `poly_hash64(text | binary)`: 64-bit polynomial content
  * fingerprint. Catalyst expression with doGenCode — the generated
  * code calls the shared static hasher on the UTF-8 bytes (STRING) or
  * the raw payload bytes (BINARY — e.g. media frame slices, where the
  * bytes are NOT valid UTF-8 and must never round-trip a string), one
  * virtual-call-free statement inside the consuming operator's codegen
  * body. */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash64 requires STRING or BINARY input, got ${child.dataType.sql}")

  protected override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => RollingHash.polyHash(s.getBytes)
    case b: Array[Byte] => RollingHash.polyHash(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == BinaryType)
      defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.polyHash($c)")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.RollingHash.polyHash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

/** `rolling_min_hash(text, window)`: winnowing-style fingerprint — the
  * unsigned-minimum polynomial hash over all `window`-byte substrings,
  * maintained with O(1) rolling updates. Near-identical documents
  * share most window hashes, so their minima collide with high
  * probability (the basis of winnowing/MOSS-style fingerprints). */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash requires (STRING, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(text: Any, w: Any): Any =
    RollingHash.minRollingHash(
      text.asInstanceOf[UTF8String].getBytes, w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.RollingHash.minRollingHash($t.getBytes(), $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingMinHash =
    copy(left = newLeft, right = newRight)
}

/** Registration payloads for SparkSessionExtensions.injectFunction —
  * wired in GraftSession so every session (Verify, Bench, tests) sees
  * `poly_hash64` / `rolling_min_hash` as native SQL functions. */
object RollingHashFunctions {
  val polyHash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_hash64"),
    new ExpressionInfo(classOf[PolyHash64].getName, "poly_hash64"),
    (args: Seq[Expression]) => PolyHash64(args.head))

  val rollingMinHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_min_hash"),
    new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
    (args: Seq[Expression]) => RollingMinHash(args(0), args(1)))
}
