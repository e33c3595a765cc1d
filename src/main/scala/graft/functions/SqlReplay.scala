package graft.functions

/** Shared DuckDB SQL fragments for the oracle builders that replay
  * the native 64-bit hash expressions (fingerprints, MinHash-LSH,
  * langid). One source of truth for the subtle 128-bit-arithmetic
  * string templates — a precedence or lo/hi-split fix here reaches
  * every oracle at once (r6 review: the fragments had drifted into
  * three hand-maintained copies).
  *
  * The technique (proven byte-exact against the executors at gate
  * scale): values live as UBIGINT for bitwise xor/shift, multiplies
  * run in HUGEINT with an explicit mod 2^64, and a 64×64-bit product
  * is split into 32-bit halves so no intermediate exceeds INT128:
  * `a·b mod 2^64 = (a_lo·b + ((a_hi·b) mod 2^32)·2^32) mod 2^64`.
  */
private[graft] object SqlReplay {
  /** 2^64 / 2^63 as HUGEINT literals. */
  val Two64 = "CAST('18446744073709551616' AS HUGEINT)"
  val Two63 = "CAST('9223372036854775808' AS HUGEINT)"

  /** A signed long's unsigned value, for embedding as a SQL literal. */
  def u(l: Long): java.math.BigInteger =
    new java.math.BigInteger(java.lang.Long.toUnsignedString(l))

  /** `(a * c) mod 2^64` for a UBIGINT expression `a` and a 64-bit
    * constant, via the lo/hi 32-bit split. Result is UBIGINT. */
  def mulmod(a: String, c: java.math.BigInteger): String =
    s"""CAST(((CAST(($a) % 4294967296 AS HUGEINT) * $c) % $Two64
       |      + ((CAST(($a) >> 32 AS HUGEINT) * $c) % 4294967296) * 4294967296)
       |      % $Two64 AS UBIGINT)""".stripMargin

  /** `rotl(a, r)` mod 2^64: the shifted-out high bits land in the low
    * bits the shift cleared, so `+` is a carry-free OR. */
  def rotl(a: String, r: Int): String =
    s"(${mulmod(a, u(1L << r))} + (($a) >> ${64 - r}))"

  /** Reinterpret a UBIGINT expression as the signed BIGINT Spark
    * emits for LongType columns. */
  def toSigned(uexpr: String): String =
    s"""CAST(CASE WHEN $uexpr >= $Two63
       |  THEN CAST($uexpr AS HUGEINT) - $Two64
       |  ELSE CAST($uexpr AS HUGEINT) END AS BIGINT)""".stripMargin

  /** UTF-8 bytes of a string column as a HUGEINT list, decoded from
    * `hex(encode(col))`; `hx`/`n` name the hex and octet_length
    * columns of the enclosing CTE. */
  def hexBytes(hx: String, n: String): String =
    s"""list_transform(generate_series(1, $n), j ->
       |        CAST(16*(strpos('0123456789ABCDEF', substr($hx, 2*j-1, 1))-1)
       |           + (strpos('0123456789ABCDEF', substr($hx, 2*j, 1))-1) AS HUGEINT))""".stripMargin

  /** Karp–Rabin polynomial fold over a HUGEINT byte list: the
    * RollingHash.polyHash replay (`h = h·Base + byte` wrapping),
    * seeded, mod 2^64. Result is UBIGINT. */
  def polyFold(bytesList: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(${RollingHash.Seed} AS HUGEINT),
       |      $bytesList),
       |    (acc, x) -> (acc*${RollingHash.Base} + x) % $Two64) AS UBIGINT)""".stripMargin

  /** splitmix64 finisher constants (WordNgrams.mix), unsigned. */
  val MixC1: java.math.BigInteger = u(-4658895280553007687L) // 0xBF58476D1CE4E5B9
  val MixC2: java.math.BigInteger = u(-7723592293110705685L) // 0x94D049BB133111EB
}
