package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Derived-permutation constants for the minhash family
  * h_i(x) = A_i * x + B_i over the 2^64 ring (A_i odd → a bijection).
  * Generated once with SplitMix64 from a fixed seed so signatures are
  * reproducible across executors, runs, and rounds. */
object MinHashFamily {
  val K = 128

  private def splitmix(state: Long): (Long, Long) = {
    var z = state + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (state + 0x9E3779B97F4A7C15L, z ^ (z >>> 31))
  }

  val (multipliers, offsets): (Array[Long], Array[Long]) = {
    val as = new Array[Long](K)
    val bs = new Array[Long](K)
    var s = 0x5EED5EED5EED5EEDL
    var i = 0
    while (i < K) {
      val (s1, a) = splitmix(s)
      val (s2, b) = splitmix(s1)
      s = s2
      as(i) = a | 1L // odd → invertible mod 2^64
      bs(i) = b
      i += 1
    }
    (as, bs)
  }
}

/** `minhash_sketch(shingle)`: aggregate a group's shingle strings into
  * a K-element MinHash signature.
  *
  * Cost model vs. K independent `min(xxhash64(i, s))` aggregates: the
  * base hash runs ONCE per shingle, and each of the K permutation
  * values is a single multiply-add on that 64-bit hash — O(|shingles|
  * × (1 string hash + K mult-add)) instead of O(|shingles| × K string
  * hashes). The aggregation buffer is one primitive long[K] (vs K
  * boxed agg buffers), partial-aggregates map-side, and the shuffle
  * carries K longs per group. At corpus scale the signature stage is
  * the dominant dedup cost, so this is the operator the 100 TB run
  * actually executes.
  */
case class MinHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val k = MinHashFamily.K

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch requires STRING or BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](k)
    // sentinel must be the UNSIGNED maximum (-1L = 0xFFFF…)—the slot
    // compares are unsigned, so Long.MaxValue (unsigned 2^63-1) could
    // never be replaced by a permuted hash in [2^63, 2^64) and a doc
    // with few shingles would keep ~2^-|shingles| of its slots stuck
    // at the sentinel, diverging from the oracle's true min (r6 review)
    java.util.Arrays.fill(b, -1L)
    b
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // LONG input is taken as an already-hashed shingle (the hashed
      // posting-table path); STRING input is base-hashed here.
      val x = v match {
        case l: java.lang.Long => l.longValue()
        case _ => XxHash64Function.hash(v, StringType, 42L)
      }
      val as = MinHashFamily.multipliers
      val bs = MinHashFamily.offsets
      var i = 0
      while (i < k) {
        val h = as(i) * x + bs(i)
        // signed compare is fine: the family is a bijection either way,
        // but unsigned keeps "min" meaning the numerically smallest hash
        if (java.lang.Long.compareUnsigned(h, buf(i)) < 0) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (java.lang.Long.compareUnsigned(b2(i), b1(i)) < 0) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](k)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}

object MinHashFunctions {
  val minhashSketch: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sketch"),
    new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch"),
    (args: Seq[Expression]) => MinHashSketch(args.head).toAggregateExpression())
}
