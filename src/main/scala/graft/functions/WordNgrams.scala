package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct hashed word-n-gram extraction.
  *
  * Semantically identical to the composed-expression form
  * `array_distinct(transform(sequence(0, size(w)-n), i ->
  * hash(concat_ws(" ", w[i+1..i+n]))))` over `w = split(text, " ")` —
  * the shape every near-dup/contamination operator here consumes —
  * but computed in ONE scan of the UTF-8 bytes. The composed form is
  * a higher-order-function chain Spark evaluates interpreted (no
  * whole-stage codegen inside lambdas, no subexpression elimination),
  * re-running `split` per element access: ~20× the work per document,
  * and the dominant cost of the whole dedup tier (round-5 profile:
  * 5.6 s of a 13 s contamination run was this derivation alone).
  *
  * Key facts making the one-pass form equivalent:
  *  - `split(text, " ")` separators are single spaces, so the joined
  *    n-gram string IS the original byte range from the start of word
  *    i to the end of word i+n-1 (consecutive spaces produce empty
  *    words in both forms — byte ranges reproduce them exactly).
  *  - every consumer (posting joins, intersection counts, the
  *    minhash_sketch aggregate) uses the hash only for EQUALITY, so
  *    the hash function itself is interchangeable; cardinalities are
  *    preserved up to 64-bit collisions and the string-set DuckDB
  *    oracles independently confirm the counts at gate scale.
  *
  * Hash: Karp–Rabin polynomial over the byte range (RollingHash.Base)
  * finished with the splitmix64 mixer so values are uniform across
  * the full 64-bit range (poly hashes alone correlate on short
  * strings — minhash permutations need uniform input).
  *
  * Fewer than `n` words yields an EMPTY array (the composed form's
  * caller contract — `filter(size(w) >= n)` — already excludes those
  * rows; this expression is additionally safe without the filter).
  */
object WordNgrams {
  /** splitmix64 finalizer — decorrelates polynomial hashes. */
  @inline private[functions] def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^= z >>> 31
    z
  }

  /** Distinct n-gram hashes in first-occurrence order (the same order
    * contract as array_distinct). Called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (n < 1) throw new IllegalArgumentException(
      s"hashed_word_ngrams: n must be >= 1, got $n")
    val bytes = text.getBytes
    val len = bytes.length
    // word start offsets (split-on-single-space semantics: a word
    // starts at 0 and after every ' ' byte; empty words included)
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    var wIdx = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(wIdx) = i + 1; wIdx += 1 }; i += 1 }
    starts(nWords) = len + 1 // virtual next-start so end formula is uniform
    val nGrams = nWords - n + 1
    if (nGrams <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))

    // open-addressed dedup set (power-of-two, linear probing).
    // Capacity math must not overflow Int: past 2^30 grams
    // `nGrams * 2` wraps negative, the loop exits at cap=8, and the
    // full-table linear probe below never terminates. A document that
    // large (>1 GiB of single-space-separated words) is corrupt input,
    // not data — fail loudly instead of hanging the executor.
    if (nGrams >= (1 << 29)) throw new IllegalArgumentException(
      s"hashed_word_ngrams: document has $nGrams $n-grams " +
        "(>= 2^29); refusing to build the dedup table — split the " +
        "document upstream")
    var cap = 8
    while (cap < nGrams * 2) cap <<= 1
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nGrams)
    var nOut = 0
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val to = starts(g + n) - 1 // exclusive; strips the trailing separator
      var h = RollingHash.Seed
      var j = from
      while (j < to) { h = h * RollingHash.Base + (bytes(j) & 0xff); j += 1 }
      h = mix(h)
      var slot = h.toInt & (cap - 1) // mask keeps it in [0, cap)
      var seen = false
      while (used(slot) && !seen) {
        if (slots(slot) == h) seen = true
        else slot = (slot + 1) & (cap - 1)
      }
      if (!seen) {
        used(slot) = true
        slots(slot) = h
        out(nOut) = h
        nOut += 1
      }
      g += 1
    }
    if (nOut == nGrams) UnsafeArrayData.fromPrimitiveArray(out)
    else UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }
}

/** One-pass character-n-gram hashing WITH multiplicity.
  *
  * Equivalent (hash-for-string, equality-preserving) to
  * `transform(sequence(1, length(text)-n+1), i -> substring(text, i, n))`
  * — the char-bigram derivation language-ID consumes — computed in one
  * scan: char boundaries located once via UTF-8 lead bytes, each
  * n-gram hashed from its byte range (CHARACTER positions, so
  * multi-byte scripts hash the same units the substring form yields).
  * Unlike [[WordNgrams.compute]] this keeps duplicates and order:
  * profile learning counts occurrences. Texts shorter than `n` chars
  * yield an empty array. */
object CharNgrams {
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (n < 1) throw new IllegalArgumentException(
      s"hashed_char_ngrams: n must be >= 1, got $n")
    val bytes = text.getBytes
    val len = bytes.length
    // char start offsets (UTF-8: count lead bytes)
    var nChars = 0
    var i = 0
    while (i < len) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    val nGrams = nChars - n + 1
    if (nGrams <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(nChars) = len
    val out = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = RollingHash.Seed
      var j = starts(g)
      val to = starts(g + n)
      while (j < to) { h = h * RollingHash.Base + (bytes(j) & 0xff); j += 1 }
      out(g) = WordNgrams.mix(h)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Positional word-n-gram hashing: one hash PER WINDOW, in text
  * order, duplicates kept — the shape exact-substring dedup needs
  * (posexplode gives each window its word offset, so duplicated
  * windows map back to token spans). Same byte-range + poly-fold +
  * splitmix64 hash as [[WordNgrams.compute]]; only the dedup step is
  * dropped. Fewer than `n` words yields an empty array. */
object WordNgramSeq {
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (n < 1) throw new IllegalArgumentException(
      s"hashed_word_ngram_seq: n must be >= 1, got $n")
    val bytes = text.getBytes
    val len = bytes.length
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    var wIdx = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(wIdx) = i + 1; wIdx += 1 }; i += 1 }
    starts(nWords) = len + 1
    val nGrams = nWords - n + 1
    if (nGrams <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val to = starts(g + n) - 1
      var h = RollingHash.Seed
      var j = from
      while (j < to) { h = h * RollingHash.Base + (bytes(j) & 0xff); j += 1 }
      out(g) = WordNgrams.mix(h)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `hashed_word_ngram_seq(text, n)`: ARRAY<BIGINT> of word n-gram
  * hashes in text order, duplicates kept — see [[WordNgramSeq]]. */
case class HashedWordNgramSeq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_ngram_seq"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_word_ngram_seq requires (STRING, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(text: Any, n: Any): Any =
    WordNgramSeq.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordNgramSeq.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedWordNgramSeq =
    copy(left = newLeft, right = newRight)
}

/** `hashed_char_ngrams(text, n)`: ARRAY<BIGINT> of character n-gram
  * hashes with multiplicity, text order — see [[CharNgrams]]. */
case class HashedCharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_char_ngrams requires (STRING, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(text: Any, n: Any): Any =
    CharNgrams.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.CharNgrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedCharNgrams =
    copy(left = newLeft, right = newRight)
}

/** `hashed_word_ngrams(text, n)`: ARRAY<BIGINT> of distinct word
  * n-gram hashes, first-occurrence order — see [[WordNgrams]]. */
case class HashedWordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_word_ngrams requires (STRING, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  protected override def nullSafeEval(text: Any, n: Any): Any =
    WordNgrams.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordNgrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedWordNgrams =
    copy(left = newLeft, right = newRight)
}

object WordNgramFunctions {
  val hashedWordNgrams: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_word_ngrams"),
    new ExpressionInfo(classOf[HashedWordNgrams].getName, "hashed_word_ngrams"),
    (args: Seq[Expression]) => HashedWordNgrams(args(0), args(1)))

  val hashedCharNgrams: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_char_ngrams"),
    new ExpressionInfo(classOf[HashedCharNgrams].getName, "hashed_char_ngrams"),
    (args: Seq[Expression]) => HashedCharNgrams(args(0), args(1)))

  val hashedWordNgramSeq: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hashed_word_ngram_seq"),
    new ExpressionInfo(classOf[HashedWordNgramSeq].getName, "hashed_word_ngram_seq"),
    (args: Seq[Expression]) => HashedWordNgramSeq(args(0), args(1)))
}
