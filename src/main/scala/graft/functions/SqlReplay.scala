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

  /** CTE chain replaying Spark's `xxhash64(longCol)` (seed 42) — the
    * XXH64 single-long path (one merge round + avalanche), the exact
    * structure the langid oracle's train/holdout split uses, factored
    * for reuse (the langid text itself stays byte-frozen for
    * hash-gate stability). Emits CTEs `${p}0..${p}A`; `${p}A` exposes
    * `keyCols` plus the hash as UBIGINT column `h`. `src` must expose
    * `keyCols` and `longCol`. XXH64 primes are public constants of
    * the xxHash spec. */
  def xxh64LongCtes(p: String, src: String, keyCols: String,
                    longCol: String): String = {
    val p1 = u(-7046029288634856825L); val p2 = u(-4417276706812531889L)
    val p3 = u(1609587929392839161L);  val p4 = u(-8796714831421723037L)
    val init = u(42L + 2870177450012600261L /* P5 */ + 8L)
    s"""${p}0 AS (SELECT $keyCols, CAST('$init' AS UBIGINT) AS h,
       |        CAST($longCol AS UBIGINT) AS l FROM $src),
       |${p}1 AS (SELECT $keyCols, h, ${mulmod("l", p2)} AS k1 FROM ${p}0),
       |${p}2 AS (SELECT $keyCols, h, ${rotl("k1", 31)} AS k1 FROM ${p}1),
       |${p}3 AS (SELECT $keyCols, h, ${mulmod("k1", p1)} AS k1 FROM ${p}2),
       |${p}4 AS (SELECT $keyCols, xor(h, k1) AS h FROM ${p}3),
       |${p}5 AS (SELECT $keyCols, CAST((CAST(${mulmod(rotl("h", 27), p1)} AS HUGEINT)
       |        + $p4) % $Two64 AS UBIGINT) AS h FROM ${p}4),
       |${p}6 AS (SELECT $keyCols, xor(h, h >> 33) AS h FROM ${p}5),
       |${p}7 AS (SELECT $keyCols, ${mulmod("h", p2)} AS h FROM ${p}6),
       |${p}8 AS (SELECT $keyCols, xor(h, h >> 29) AS h FROM ${p}7),
       |${p}9 AS (SELECT $keyCols, ${mulmod("h", p3)} AS h FROM ${p}8),
       |${p}A AS (SELECT $keyCols, xor(h, h >> 32) AS h FROM ${p}9)""".stripMargin
  }
}
