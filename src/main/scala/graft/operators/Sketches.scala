package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HllNdv
import graft.sources.Tables

/** Sketch-based approximate aggregates — the one-pass, merge-able
  * summaries a 100 TB pipeline uses where exact answers would shuffle
  * the raw keys (distinct users per segment, cardinality feeds for
  * join planning, dedup-rate monitoring).
  *
  * The driver query reports the HLL estimate NEXT TO the exact count
  * so the oracle both (a) replays the estimator bit-for-bit and (b)
  * documents the accuracy actually achieved (~1.04/√m relative error;
  * ~6.5% at p=8).
  */
object Sketches {

  /** HLL precision: m = 2^8 = 256 one-byte registers per group. */
  val P = 8

  /** Distinct users per event type: exact (count-distinct shuffle)
    * beside the [[graft.functions.HllNdv]] sketch (one pass, 256-byte
    * buffers, elementwise-max merge). At scale the exact column is
    * the one you delete; here it is the measuring stick. */
  def aggApproxNdv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("ndv_exact"),
        call_function("hll_ndv", xxhash64(col("user_id")), lit(P)).as("ndv_approx"))
      .withColumn("err_pct",
        round(abs(col("ndv_approx") - col("ndv_exact")) / col("ndv_exact") * lit(100.0), 4))

  /** Full DuckDB replay of the sketch: the xxhash64-of-BIGINT lane
    * (same XXH64 single-long chain the langid oracle replays), bucket
    * = top-8 bits, rho via the minimal-width `bin()` leading-zero
    * trick, registers as a per-(group, bucket) MAX — and the
    * estimator with BOTH branches made bit-exact by embedding
    * Scala-computed lookup tables as literals: `2^-rho` terms (exact
    * powers of two, folded in ascending bucket order exactly like
    * [[HllNdv.estimate]]'s loop) and the linear-counting values
    * `m·ln(m/V)` (ln() differs by 1 ulp between engines on some
    * inputs — measured at V=177 — so the Java-evaluated doubles ARE
    * the constants, single source of truth). */
  /** Shared CTE pipeline: xxhash64-of-BIGINT → per-(key, bucket)
    * registers → estimator, parameterized on the grouping key so the
    * batch (per event_type) and streaming (per hour window) oracles
    * stay one source of truth. `keyExpr` is a SQL expression over the
    * `events` table; `keyName` its output column alias; the result
    * CTE `est` exposes `(keyName, ndv_approx)`. */
  private def hllReplayCtes(keyExpr: String, keyName: String,
                            whereSql: String = "TRUE"): String = {
    import graft.functions.SqlReplay._
    val m = 1 << P
    val rhoCap = 64 - P + 1
    val two64 = Two64
    val p1 = u(-7046029288634856825L); val p2 = u(-4417276706812531889L)
    val p3 = u(1609587929392839161L);  val p4 = u(-8796714831421723037L)
    val init = u(42L + 2870177450012600261L /* P5 */ + 8L)
    val alphaMM = HllNdv.alphaMM(P)
    // literals QUOTED: DuckDB decimal-routes bare 17-digit literals
    // and double-rounds them 1 ulp off (measured: the linear-counting
    // value for V=170 at sf0.1); VARCHAR→DOUBLE is correctly-rounded
    val powRows = HllNdv.powNeg(P).zipWithIndex
      .map { case (t, r) => s"($r, CAST('$t' AS DOUBLE))" }.mkString(",\n  ")
    val lnRows = HllNdv.linearCounting(P).zipWithIndex.drop(1)
      .map { case (e, v) => s"($v, CAST('$e' AS DOUBLE))" }.mkString(",\n  ")
    // w = h << P mod 2^64, as a multiply so it stays in UBIGINT
    val w = mulmod("h", u(1L << P))
    s"""h0 AS (
       |  SELECT $keyExpr AS $keyName, CAST('$init' AS UBIGINT) AS h,
       |    CAST(user_id AS UBIGINT) AS l FROM events WHERE $whereSql),
       |h1 AS (SELECT $keyName, h, ${mulmod("l", p2)} AS k1 FROM h0),
       |h2 AS (SELECT $keyName, h, ${rotl("k1", 31)} AS k1 FROM h1),
       |h3 AS (SELECT $keyName, h, ${mulmod("k1", p1)} AS k1 FROM h2),
       |h4 AS (SELECT $keyName, xor(h, k1) AS h FROM h3),
       |h5 AS (SELECT $keyName, CAST((CAST(${mulmod(rotl("h", 27), p1)} AS HUGEINT)
       |       + $p4) % $two64 AS UBIGINT) AS h FROM h4),
       |h6 AS (SELECT $keyName, xor(h, h >> 33) AS h FROM h5),
       |h7 AS (SELECT $keyName, ${mulmod("h", p2)} AS h FROM h6),
       |h8 AS (SELECT $keyName, xor(h, h >> 29) AS h FROM h7),
       |h9 AS (SELECT $keyName, ${mulmod("h", p3)} AS h FROM h8),
       |hh AS (SELECT $keyName, xor(h, h >> 32) AS h FROM h9),
       |regs0 AS (
       |  SELECT $keyName, CAST(h >> ${64 - P} AS INTEGER) AS bucket,
       |    MAX(CASE WHEN $w = 0 THEN $rhoCap
       |        ELSE 65 - length(ltrim(bin($w), '0')) END) AS rho
       |  FROM hh GROUP BY 1, 2),
       |grid AS (
       |  SELECT et.$keyName, gs.j AS bucket
       |  FROM (SELECT DISTINCT $keyName FROM regs0) et
       |  CROSS JOIN generate_series(0, ${m - 1}) gs(j)),
       |regs AS (
       |  SELECT g.$keyName, g.bucket, COALESCE(r.rho, 0) AS rho
       |  FROM grid g LEFT JOIN regs0 r
       |    ON r.$keyName = g.$keyName AND r.bucket = g.bucket),
       |powtab(r, term) AS (VALUES
       |  $powRows),
       |lntab(v, lnv) AS (VALUES
       |  $lnRows),
       |zsum AS (
       |  SELECT $keyName,
       |    list_reduce(list(term ORDER BY bucket), (x, y) -> x + y) AS z,
       |    SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS vz
       |  FROM regs JOIN powtab ON powtab.r = regs.rho
       |  GROUP BY $keyName),
       |est AS (
       |  SELECT $keyName,
       |    CASE WHEN (CAST('$alphaMM' AS DOUBLE) / z) <= ${2.5 * m} AND vz > 0
       |         THEN lnv ELSE (CAST('$alphaMM' AS DOUBLE) / z) END AS ndv_approx
       |  FROM zsum LEFT JOIN lntab ON lntab.v = zsum.vz)""".stripMargin
  }

  val aggApproxNdvOracleSql: String =
    s"""WITH ${hllReplayCtes("event_type", "event_type")},
       |exact AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS ndv_exact
       |  FROM events GROUP BY 1)
       |SELECT x.event_type, x.ndv_exact, e.ndv_approx,
       |  round(abs(e.ndv_approx - CAST(x.ndv_exact AS DOUBLE))
       |        / CAST(x.ndv_exact AS DOUBLE) * 100.0, 4) AS err_pct
       |FROM exact x JOIN est e ON x.event_type = e.event_type""".stripMargin

  /** Segments for [[aggDistinctIntersect]]. */
  val InterTypeA = "click"
  val InterTypeB = "purchase"

  /** Key `agg_distinct_intersect`: sketch-estimated distinct-key
    * INTERSECTION between two segments ("how many users both clicked
    * and purchased") — the set-algebra query HLL alone cannot answer:
    * register-max union is lossless, but HLL carries no intersection
    * operator (inclusion–exclusion on two ±1.04/√m estimates has
    * unbounded relative error when the overlap is small — the reason
    * the theta/KMV sketch family exists). The standard composite
    * estimator instead multiplies a MinHash Jaccard estimate by an
    * HLL union estimate:
    *
    *   |A∩B| ≈ Ĵ(A,B) · |Â∪B|,  Ĵ = matching lanes / K
    *
    * BOTH inputs are the suite's existing mergeable artifacts — the
    * K=128-lane MinHash signature (elementwise-min merge,
    * `dedup_source_sim`'s per-source form) and the HLL register
    * buffer (elementwise-max merge) — so per-day/per-shard summaries
    * roll up into an intersection estimate without rescanning raw
    * rows, completing the sketch tier's algebra: union (HLL/CMS/
    * histogram/MinHash) AND intersection (MinHash×HLL).
    *
    * Scale shape: two one-pass aggregates over the filtered scan
    * (signatures + union HLL, both fixed-size state), the exact
    * measuring-stick columns from one user-keyed distinct, and a
    * 1-row assembly of broadcast singletons. The exact columns are
    * what a 100 TB run deletes; the estimates are what it keeps.
    *
    * Determinism: lane mins and registers are exact integers; the
    * estimate is one double multiply of two replayable doubles.
    *
    * Empty segments: each side frame is pinned to EXACTLY one row (a
    * left join from a 1-row anchor), so a segment with zero events
    * reports `n_?_exact = 0` with NULL signature → NULL
    * matching_lanes / est_jaccard / est_intersection — the same 1-row
    * NULL report the oracle's ungrouped SUM produces, instead of the
    * 0-row frame a bare crossJoin would collapse to. (Both segments
    * empty remains a precondition: the HLL union estimate has no rows
    * to group on either engine.) */
  def aggDistinctIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin(InterTypeA, InterTypeB))
    val sides = ev.groupBy(col("event_type")).agg(
      call_function("minhash_sketch", col("user_id").cast("string")).as("sig"),
      countDistinct(col("user_id")).as("ndv"))
    val anchor = spark.range(1).select(lit(1).as("one"))
    val sa = anchor.join(
        sides.where(col("event_type") === InterTypeA), lit(true), "left")
      .select(col("sig").as("sig_a"),
        coalesce(col("ndv"), lit(0L)).as("n_a_exact"))
    val sb = anchor.join(
        sides.where(col("event_type") === InterTypeB), lit(true), "left")
      .select(col("sig").as("sig_b"),
        coalesce(col("ndv"), lit(0L)).as("n_b_exact"))
    val unionEst = ev.agg(
      call_function("hll_ndv", xxhash64(col("user_id")), lit(P)).as("est_union"))
    // exact intersection: one user-keyed two-flag aggregate
    val interExact = ev.groupBy(col("user_id")).agg(
        max(when(col("event_type") === InterTypeA, 1).otherwise(0)).as("ia"),
        max(when(col("event_type") === InterTypeB, 1).otherwise(0)).as("ib"))
      .agg(sum(col("ia") * col("ib")).as("inter_exact"))
    val k = graft.functions.MinHashFamily.K
    // all four frames are 1-row by construction — broadcast assembly
    sa.crossJoin(broadcast(sb))
      .crossJoin(broadcast(interExact))
      .crossJoin(broadcast(unionEst))
      .withColumn("matching_lanes",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
          .cast("int"))
      .select(
        col("n_a_exact"), col("n_b_exact"), col("inter_exact"),
        col("est_union"), col("matching_lanes"),
        (col("matching_lanes").cast("double") / k).as("est_jaccard"),
        ((col("matching_lanes").cast("double") / k) * col("est_union"))
          .as("est_intersection"))
  }

  /** Oracle: the MinHash lane replay (the dedup_source_sim chain with
    * the segment as the set key and `CAST(user_id AS VARCHAR)` as the
    * element) joined with the shared HLL replay filtered to the two
    * segments, plus the exact two-flag intersection. */
  val aggDistinctIntersectOracleSql: String = {
    import graft.functions.SqlReplay._
    import graft.functions.MinHashFamily
    val permRows = (0 until MinHashFamily.K).map { i =>
      s"($i, CAST('${u(MinHashFamily.multipliers(i))}' AS HUGEINT), " +
        s"CAST('${u(MinHashFamily.offsets(i))}' AS HUGEINT))"
    }.mkString(",\n  ")
    val two64 = Two64
    val inTypes = s"('$InterTypeA', '$InterTypeB')"
    s"""WITH ${hllReplayCtes("'u'", "hk", s"event_type IN $inTypes")},
       |el AS (
       |  SELECT DISTINCT event_type AS side, CAST(user_id AS VARCHAR) AS gram
       |  FROM events WHERE event_type IN $inTypes
       |), gh AS (
       |  SELECT side, hex(encode(gram)) AS hx,
       |    octet_length(encode(gram)) AS n FROM el
       |), sph AS (
       |  SELECT DISTINCT side, ${polyFold(hexBytes("hx", "n"))} AS p FROM gh
       |), sm1 AS (SELECT side, p, xor(p, p >> 30) AS z FROM sph
       |), sm2 AS (SELECT side, p, ${mulmod("z", MixC1)} AS z FROM sm1
       |), sm3 AS (SELECT side, p, xor(z, z >> 27) AS z FROM sm2
       |), sm4 AS (SELECT side, p, ${mulmod("z", MixC2)} AS z FROM sm3
       |), smx AS (SELECT side, p, xor(z, z >> 31) AS x FROM sm4
       |), sxs AS (
       |  SELECT side, p, CAST(x % 4294967296 AS HUGEINT) AS xlo,
       |                  CAST(x >> 32 AS HUGEINT) AS xhi
       |  FROM smx
       |), perms(i, a, b) AS (VALUES
       |  $permRows
       |), pv AS (
       |  SELECT side, i,
       |    min(CAST(((xlo * a) % $two64 + ((xhi * a) % 4294967296) * 4294967296 + b)
       |        % $two64 AS UBIGINT)) AS mn
       |  FROM sxs CROSS JOIN perms
       |  GROUP BY side, i
       |), lanes AS (
       |  SELECT SUM(CASE WHEN x.mn = y.mn THEN 1 ELSE 0 END) AS matching_lanes
       |  FROM pv x JOIN pv y ON x.i = y.i
       |  WHERE x.side = '$InterTypeA' AND y.side = '$InterTypeB'
       |), flags AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = '$InterTypeA' THEN 1 ELSE 0 END) AS ia,
       |    MAX(CASE WHEN event_type = '$InterTypeB' THEN 1 ELSE 0 END) AS ib
       |  FROM events WHERE event_type IN $inTypes GROUP BY 1
       |), exact AS (
       |  SELECT CAST(SUM(ia) AS BIGINT) AS n_a_exact,
       |    CAST(SUM(ib) AS BIGINT) AS n_b_exact,
       |    CAST(SUM(ia * ib) AS BIGINT) AS inter_exact
       |  FROM flags
       |)
       |SELECT x.n_a_exact, x.n_b_exact, x.inter_exact,
       |  e.ndv_approx AS est_union,
       |  CAST(l.matching_lanes AS INTEGER) AS matching_lanes,
       |  CAST(l.matching_lanes AS DOUBLE) / ${MinHashFamily.K} AS est_jaccard,
       |  (CAST(l.matching_lanes AS DOUBLE) / ${MinHashFamily.K}) * e.ndv_approx
       |    AS est_intersection
       |FROM exact x CROSS JOIN lanes l CROSS JOIN est e""".stripMargin
  }

  /** Mergeable-summary roll-up (key `agg_sketch_union`): build ONE
    * HLL sketch per (event_type, day) — the pre-aggregation a 100 TB
    * pipeline persists at ingest — then union each type's daily
    * sketches (`hll_merge_est`, elementwise register max) into the
    * range estimate WITHOUT rescanning raw rows. Register max is
    * associative/commutative/idempotent, so the rolled-up estimate is
    * BIT-IDENTICAL to the direct one-pass `hll_ndv` over the raw
    * range — which is exactly what the oracle computes (the identity
    * under test), while `n_days` pins the roll-up really passed
    * through the daily layer. Shuffles: one (type, day)-keyed pass
    * over events, then a types×days-row sketch table — the second
    * stage is calendar-sized, not corpus-sized. */
  def aggSketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(call_function("hll_sketch",
        xxhash64(col("user_id")), lit(P)).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        call_function("hll_merge_est", col("sk"), lit(P)).as("ndv_merged"))
  }

  val aggSketchUnionOracleSql: String =
    s"""WITH ${hllReplayCtes("event_type", "event_type")},
       |days AS (
       |  SELECT event_type, COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
       |  FROM events GROUP BY 1)
       |SELECT d.event_type, d.n_days, e.ndv_approx AS ndv_merged
       |FROM days d JOIN est e ON d.event_type = e.event_type""".stripMargin

  /** Oracle for the streaming twin: same replay, keyed by the hour
    * window start (a tumbling window's start IS date_trunc). */
  val windowedApproxNdvOracleSql: String =
    s"""WITH ${hllReplayCtes("date_trunc('hour', CAST(ts AS TIMESTAMP))", "window_start")}
       |SELECT window_start, ndv_approx AS ndv_users FROM est""".stripMargin

  // --- Count-Min Sketch heavy hitters ---

  /** CMS depth (independent hash rows) and width (2^bits counters per
    * row). 4×1024 longs = 32 KB per sketch — the whole summary rides
    * one broadcast regardless of corpus size. */
  val CmsDepth = 4
  val CmsWidthBits = 10
  /** How many exact heavy hitters the driver query probes. */
  val CmsTopK = 30

  /** Per-row CMS bucket array for a 64-bit key hash `h`: row i's
    * bucket is the top `CmsWidthBits` bits of `xxhash64(i, h)` — d
    * independent codegen'd hash lanes, no multiply (ANSI-safe). */
  private def cmsBuckets(h: Column): Column =
    array((0 until CmsDepth).map(i =>
      shiftrightunsigned(xxhash64(lit(i.toLong), h), 64 - CmsWidthBits)): _*)

  /** Heavy hitters with Count-Min estimates beside exact counts.
    *
    * The sketch: term occurrence counts folded into a `CmsDepth` ×
    * `2^CmsWidthBits` counter grid (`cell[i][g_i(term)] += count`);
    * a term's estimate is `min_i cell[i][g_i(term)]` — an upper bound
    * on the true count that two-sided-errors only through collisions
    * (Cormode–Muthukrishnan). The driver query reports the estimate
    * NEXT TO the exact count for the corpus's `topK` most frequent
    * terms, so the oracle replays the estimator bit-for-bit and the
    * output documents the accuracy achieved.
    *
    * Scale shape: one exploded-token scan feeds BOTH the exact
    * vocabulary aggregate (vocab-sized shuffle, the same shape
    * text_vocab carries) and the sketch (map-side partial grids make
    * its shuffle `d·w` rows TOTAL, independent of corpus size). At
    * 100 TB the exact column is the one you delete — the sketch plus
    * a candidate stream replaces the second full vocabulary pass —
    * and the grid is what you'd maintain incrementally per ingest
    * batch (counter merge = elementwise sum).
    *
    * Determinism: buckets come from `poly_hash64(term)` pushed through
    * d `xxhash64` lanes — both already replayed bit-exact by other
    * oracles; counts are integers; ties at the topK cut break on the
    * term string.
    */
  /** Plain form pins its vocab-sized cache for the session (same
    * documented lifetime as Dedup.persistedTrigramSets — acceptable in
    * per-run verify/bench sessions); long-lived callers should use
    * [[aggHeavyHittersWithHandle]] and unpersist the handle. */
  def aggHeavyHittersOn(docs: DataFrame, topK: Int = CmsTopK): DataFrame =
    aggHeavyHittersWithHandle(docs, topK)._1

  /** Returns (result, cache handle): `handle.unpersist()` after the
    * result is consumed releases the vocabulary-sized cached plan
    * instead of pinning one per invocation. */
  def aggHeavyHittersWithHandle(docs: DataFrame,
                                topK: Int = CmsTopK): (DataFrame, DataFrame) = {
    import graft.functions.TextHashing
    // vocab-sized and reused by three branches (grid, topK cut, probe)
    // — persist like Dedup.persistedTrigramSets rather than re-derive
    // the corpus explode per branch (the round-4 contamination lesson)
    val termCounts = docs
      .select(explode(TextHashing.words(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
      .withColumn("buckets", cmsBuckets(call_function("poly_hash64", col("term"))))
      .persist()
    val cells = termCounts
      .select(col("n_exact"), posexplode(col("buckets")).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("n_exact")).as("cell"))
    val top = termCounts.orderBy(col("n_exact").desc, col("term")).limit(topK)
    val result = top
      .select(col("term"), col("n_exact"),
        posexplode(col("buckets")).as(Seq("row", "bucket")))
      .join(broadcast(cells), Seq("row", "bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("cell")).as("cms_count"))
      .withColumn("overcount", col("cms_count") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("term"))
    (result, termCounts)
  }

  /** Driver query over `documents` (key `agg_heavy_hitters`): topK-row
    * result staged durably, vocab-sized CMS cache released with the
    * call (r7 advice; see [[Scratch.materializeAndRelease]]). */
  def aggHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val (result, handle) = aggHeavyHittersWithHandle(Tables.documents(spark, dir))
    Scratch.materializeAndRelease(result, handle, "graft_heavy_hitters")
  }

  /** Full DuckDB replay of the CMS. `poly_hash64(term)` is the
    * Karp–Rabin byte fold ([[graft.functions.SqlReplay.polyFold]],
    * proven byte-exact by the text_fingerprint oracle); each hash row
    * `i` is Spark's two-lane `xxhash64(i, h)` — lane one is over the
    * CONSTANT `i`, so its full avalanche collapses to a per-row seed
    * computed here with Spark's own `XXH64.hashLong` and embedded as
    * a literal (single source of truth), leaving ONE single-long
    * XXH64 chain to replay with the seed as a column. */
  /** Shared CMS replay chain (`tc` … `cells`, `top`, `est`): global
    * term counts → poly_hash64 → d seeded XXH64 lanes → buckets →
    * counter cells → the topK probe with its min-of-cells estimate.
    * No leading WITH; both CMS oracles splice it. */
  private def cmsReplayCtes: String = {
    import graft.functions.SqlReplay._
    val two64 = Two64
    val p1 = u(-7046029288634856825L); val p2 = u(-4417276706812531889L)
    val p3 = u(1609587929392839161L)
    val p4bi = u(-8796714831421723037L)
    val P5 = 2870177450012600261L
    val seedRows = (0 until CmsDepth).map { i =>
      val init = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(i.toLong, 42L) + P5 + 8L
      s"($i, CAST('${u(init)}' AS UBIGINT))"
    }.mkString(",\n  ")
    s"""tc AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_exact
       |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY term),
       |tb AS (
       |  SELECT term, n_exact, hex(encode(term)) AS hx,
       |    octet_length(encode(term)) AS n
       |  FROM tc),
       |th AS (SELECT term, n_exact, ${polyFold(hexBytes("hx", "n"))} AS l FROM tb),
       |seeds(i, init) AS (VALUES
       |  $seedRows),
       |pairs AS (SELECT term, n_exact, i, init, l FROM th CROSS JOIN seeds),
       |x1 AS (SELECT term, n_exact, i, init, ${mulmod("l", p2)} AS k1 FROM pairs),
       |x2 AS (SELECT term, n_exact, i, init, ${rotl("k1", 31)} AS k1 FROM x1),
       |x3 AS (SELECT term, n_exact, i, init, ${mulmod("k1", p1)} AS k1 FROM x2),
       |x4 AS (SELECT term, n_exact, i, xor(init, k1) AS h FROM x3),
       |x5 AS (SELECT term, n_exact, i,
       |  CAST((CAST(${mulmod(rotl("h", 27), p1)} AS HUGEINT)
       |        + $p4bi) % $two64 AS UBIGINT) AS h FROM x4),
       |x6 AS (SELECT term, n_exact, i, xor(h, h >> 33) AS h FROM x5),
       |x7 AS (SELECT term, n_exact, i, ${mulmod("h", p2)} AS h FROM x6),
       |x8 AS (SELECT term, n_exact, i, xor(h, h >> 29) AS h FROM x7),
       |x9 AS (SELECT term, n_exact, i, ${mulmod("h", p3)} AS h FROM x8),
       |bk AS (SELECT term, n_exact, i,
       |  CAST(xor(h, h >> 32) >> ${64 - CmsWidthBits} AS BIGINT) AS bucket FROM x9),
       |cells AS (
       |  SELECT i, bucket, CAST(SUM(n_exact) AS BIGINT) AS cell
       |  FROM bk GROUP BY 1, 2),
       |top AS (SELECT term FROM tc ORDER BY n_exact DESC, term LIMIT $CmsTopK),
       |est AS (
       |  SELECT b.term, b.n_exact, MIN(c.cell) AS cms_count
       |  FROM bk b
       |  JOIN top t ON t.term = b.term
       |  JOIN cells c ON c.i = b.i AND c.bucket = b.bucket
       |  GROUP BY 1, 2)""".stripMargin
  }

  val aggHeavyHittersOracleSql: String =
    s"""WITH $cmsReplayCtes
       |SELECT term, n_exact, cms_count, cms_count - n_exact AS overcount
       |FROM est
       |ORDER BY n_exact DESC, term""".stripMargin

  /** Mergeable CMS roll-up (key `agg_cms_union`) — the counter-grid
    * counterpart of [[aggSketchUnion]], completing the artifact form
    * of every sketch family in the suite (HLL: register max; MinHash:
    * elementwise min; CMS: elementwise SUM): build one `CmsDepth ×
    * 2^CmsWidthBits` grid per SOURCE — the summary a 100 TB ingest
    * persists per shard — then merge the per-source grids by counter
    * addition and probe the corpus's topK terms against the MERGED
    * grid. Counter addition is associative/commutative, so the merged
    * estimate is BIT-IDENTICAL to the direct one-pass grid — the
    * identity under test (the oracle computes the direct grid);
    * `n_sources` pins that the roll-up really passed through the
    * per-source layer.
    *
    * Scale shape: the exploded-token scan is paid once (persisted,
    * released with the call); the per-source artifacts total
    * sources·d·2^w rows and the merge shuffles only those — per-batch
    * grid maintenance at ingest is this exact groupBy. */
  def aggCmsUnion(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextHashing
    val termCounts = Tables.documents(spark, dir)
      .select(col("source"), explode(TextHashing.words(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      .withColumn("buckets", cmsBuckets(call_function("poly_hash64", col("term"))))
      .persist()
    val shardGrids = termCounts
      .select(col("source"), col("n"),
        posexplode(col("buckets")).as(Seq("row", "bucket")))
      .groupBy(col("source"), col("row"), col("bucket"))
      .agg(sum(col("n")).as("cell"))
    val merged = shardGrids.groupBy(col("row"), col("bucket"))
      .agg(sum(col("cell")).as("cell"))
    val nSources = shardGrids.select(col("source")).distinct()
      .agg(count(lit(1)).as("n_sources"))
    val top = termCounts.groupBy(col("term")).agg(sum(col("n")).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term")).limit(CmsTopK)
    val result = top
      .withColumn("buckets", cmsBuckets(call_function("poly_hash64", col("term"))))
      .select(col("term"), col("n_exact"),
        posexplode(col("buckets")).as(Seq("row", "bucket")))
      .join(broadcast(merged), Seq("row", "bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("cell")).as("cms_merged"))
      .crossJoin(broadcast(nSources))
      .orderBy(col("n_exact").desc, col("term"))
    Scratch.materializeAndRelease(result, termCounts, "graft_cms_union")
  }

  /** Oracle: the direct-grid replay (merge identity) + the source pin. */
  val aggCmsUnionOracleSql: String =
    s"""WITH $cmsReplayCtes,
       |ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |       FROM documents)
       |SELECT e.term, e.n_exact, e.cms_count AS cms_merged, ns.n_sources
       |FROM est e CROSS JOIN ns
       |ORDER BY e.n_exact DESC, e.term""".stripMargin
}
