package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, XxHash64Function}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}

/** `hll_ndv(hash64, p)`: HyperLogLog distinct-count estimate over a
  * pre-hashed 64-bit column, with `m = 2^p` one-byte registers.
  *
  * Why a hand-rolled HLL when Spark ships `approx_count_distinct`:
  * this one is DETERMINISTIC end-to-end — the register for bucket `j`
  * is a max over per-row values (order-independent), the final fold
  * walks buckets in ascending index order, and every term `2^-rho` is
  * an exactly-representable power of two — so the estimate replays
  * bit-for-bit in the DuckDB oracle (HLL++'s bias-correction tables
  * and its murmur seed layout do not). The estimator is the standard
  * Flajolet–Fusy–Gandouet–Meunier form on a 64-bit hash: bucket =
  * top-p bits, rho = leading zeros of the remaining bits + 1, raw
  * estimate `alpha_m * m^2 / sum_j 2^-M[j]`, linear counting
  * `m * ln(m / V)` below `2.5 m` when empty buckets remain.
  *
  * Scale shape: the aggregation buffer is `m` bytes (256 at p=8), the
  * shuffle carries one register array per group, and merge is an
  * elementwise max — the same "sketch, merge, evaluate" contract that
  * lets a 1000-executor cluster count distincts in one pass without a
  * `distinct` shuffle of the raw keys. Input is expected pre-hashed
  * (`xxhash64(col)`) so the hash cost sits in whole-stage codegen;
  * STRING input is accepted and hashed here with the same seed-42
  * xxhash64 for convenience.
  */
case class HllNdv(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr match {
    case Literal(v: Int, IntegerType) =>
      require(v >= 4 && v <= 14, s"hll_ndv: p must be in [4,14], got $v")
      v
    case other =>
      throw new IllegalArgumentException(
        s"hll_ndv: p must be an INT literal, got $other")
  }
  private lazy val m: Int = 1 << p
  private lazy val rhoCap: Int = 64 - p + 1

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_ndv"

  override def checkInputDataTypes(): TypeCheckResult =
    if ((child.dataType == LongType || child.dataType == StringType) &&
        pExpr.dataType == IntegerType && pExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_ndv requires (BIGINT or STRING, INT literal), got " +
        s"(${child.dataType.sql}, ${pExpr.dataType.sql})")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long => l.longValue()
        case _ => XxHash64Function.hash(v, StringType, 42L)
      }
      val bucket = (h >>> (64 - p)).toInt
      val w = h << p
      val rho = if (w == 0L) rhoCap else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (b2(j) > b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = HllNdv.estimate(buf, p)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllNdv =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllNdv =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllNdv =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

object HllNdv {
  /** Standard alpha constants (FFGM §4); `alphaMM = alpha_m * m^2`. */
  def alphaMM(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m
  }

  /** `2^-rho` for rho in [0, 64-p+1] — every value is an exact power
    * of two, so the ascending-bucket fold below is bit-reproducible
    * in any engine that adds the same doubles in the same order. */
  def powNeg(p: Int): Array[Double] = {
    val cap = 64 - p + 1
    Array.tabulate(cap + 1)(r => java.lang.Math.pow(2.0, -r))
  }

  /** Linear-counting values `m * ln(m / V)` for every possible count
    * of empty buckets V in [1, m]. Precomputed HERE (Java Math.log)
    * and embedded into the DuckDB oracle as literals, because ln() is
    * not correctly-rounded in either engine and disagrees by 1 ulp on
    * some inputs (measured: V=177 at m=256) — a lookup keeps the two
    * engines byte-identical through the small-range branch. */
  def linearCounting(p: Int): Array[Double] = {
    val m = 1 << p
    Array.tabulate(m + 1) {
      case 0 => 0.0 // unused (branch requires V > 0)
      case v => m * java.lang.Math.log(m.toDouble / v)
    }
  }

  /** The deterministic estimator shared by eval and the spec replay:
    * ascending-bucket fold of exact `2^-rho` terms, then the standard
    * raw/linear-counting branch. */
  def estimate(registers: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val pw = powNeg(p)
    var z = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = registers(j) & 0xff
      if (r == 0) zeros += 1
      z += pw(r)
      j += 1
    }
    val raw = alphaMM(p) / z
    if (raw <= 2.5 * m && zeros > 0) linearCounting(p)(zeros) else raw
  }
}

/** `hll_sketch(hash64, p)`: the SAME aggregation as [[HllNdv]] but
  * returning the raw `m`-byte register buffer instead of the
  * estimate — the mergeable-summary artifact. A pipeline stores one
  * sketch per (group, partition-unit) row; later readers union any
  * subset of units with [[HllMergeEst]] and get the estimate the
  * direct pass over the raw rows would produce, WITHOUT rescanning
  * them — exactness of the roll-up follows from register max being
  * associative/commutative/idempotent. This is the pre-aggregation
  * contract (Dataflow "mergeable summaries"; Druid/Pinot sketch
  * columns) that makes distinct-count dashboards O(days), not
  * O(rows), at 100 TB. */
case class HllSketchAgg(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val inner = HllNdv(child, pExpr)

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "hll_sketch"
  override def checkInputDataTypes(): TypeCheckResult = inner.checkInputDataTypes()
  override def createAggregationBuffer(): Array[Byte] = inner.createAggregationBuffer()
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    inner.update(buf, input)
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    inner.merge(b1, b2)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** `hll_merge_est(sketch, p)`: union pre-built [[HllSketchAgg]]
  * register buffers (elementwise max) and evaluate the shared
  * estimator. Because max-merge is associative and idempotent, the
  * result is BIT-IDENTICAL to `hll_ndv` run directly over the raw
  * rows the sketches summarize — under any grouping of the units,
  * any merge order, and at-least-once unit delivery. */
case class HllMergeEst(
    child: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  private lazy val p: Int = pExpr match {
    case Literal(v: Int, IntegerType) =>
      require(v >= 4 && v <= 14, s"hll_merge_est: p must be in [4,14], got $v")
      v
    case other =>
      throw new IllegalArgumentException(
        s"hll_merge_est: p must be an INT literal, got $other")
  }
  private lazy val m: Int = 1 << p

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_merge_est"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType &&
        pExpr.dataType == IntegerType && pExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_merge_est requires (BINARY, INT literal), got " +
        s"(${child.dataType.sql}, ${pExpr.dataType.sql})")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = v.asInstanceOf[Array[Byte]]
      require(sk.length == m,
        s"hll_merge_est: sketch has ${sk.length} registers, p=$p needs $m")
      var j = 0
      while (j < m) { if (sk(j) > buf(j)) buf(j) = sk(j); j += 1 }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) { if (b2(j) > b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = HllNdv.estimate(buf, p)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeEst =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeEst =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeEst =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

object HllFunctions {
  val hllNdv: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_ndv"),
    new ExpressionInfo(classOf[HllNdv].getName, "hll_ndv"),
    (args: Seq[Expression]) => HllNdv(args(0), args(1)).toAggregateExpression())

  val hllSketch: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_sketch"),
    new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_sketch"),
    (args: Seq[Expression]) => HllSketchAgg(args(0), args(1)).toAggregateExpression())

  val hllMergeEst: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_merge_est"),
    new ExpressionInfo(classOf[HllMergeEst].getName, "hll_merge_est"),
    (args: Seq[Expression]) => HllMergeEst(args(0), args(1)).toAggregateExpression())
}
