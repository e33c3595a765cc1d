package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.Row
import graft.sources.Tables

/** Exact order-statistic quantiles WITHOUT a global sort.
  *
  * `etl_dq_profile` computes exact percentiles the textbook way — a
  * per-group sort — which is the right plan when groups are small but
  * is exactly what you cannot do to a 100 TB column: a global sort
  * shuffles the entire dataset to order it, then throws all of it away
  * for three output rows. This operator finds the same exact order
  * statistics with iterative histogram refinement (the classic
  * distributed-selection recipe): each round scans the column once,
  * aggregates a `Bins`-cell histogram per probed quantile
  * (shuffle = `targets × Bins` partial counts, KILOBYTES, independent
  * of data size), and narrows each quantile's candidate interval to
  * the one bucket its rank falls in. Interval width shrinks by `Bins`×
  * per round, so `ceil(log_Bins(range))` rounds — 3 scans for a
  * microsecond-timestamp year range — replace the full shuffle-sort.
  *
  * The driver-side `.collect()` each round moves `targets × Bins`
  * COUNTER rows (≤ 3×1024 longs) for plan-time interval decisions —
  * coordination scalars like Similarity's dim probe, not a data
  * collect; every row of real data stays on executors.
  *
  * Rank contract (type-1 / `quantile_disc`): the q-quantile of n
  * non-null values is the value at 1-indexed sorted position
  * `ceil(q·n)`, computed in integer arithmetic (`(n·num + den - 1)
  * div den`) so the rank is bit-portable across engines. Values are
  * LONG ticks (epoch-micros here; any integer-mappable domain works —
  * cents, token counts), so bucket math is exact integer division and
  * the recursion provably terminates: width 1 means bucket == value.
  *
  * After each round the live intervals' union becomes a pushable
  * `BETWEEN` on the scan — from round 2 on, parquet row-group min/max
  * skipping reads only the slivers still in play.
  */
object Quantiles {

  /** Probed quantiles as exact rationals (name, numerator, denominator). */
  val Targets: Seq[(String, Long, Long)] =
    Seq(("p50", 50L, 100L), ("p90", 90L, 100L), ("p99", 99L, 100L))

  /** Histogram cells per target per round. 1024 cells × 8 B counters
    * keeps the per-round shuffle + collect ≈ 8 KB per target. */
  val Bins = 1024L

  /** Interval-refinement state for one quantile: rank `k` (1-indexed),
    * candidate interval [lo, hi] (inclusive, ticks), and `below` =
    * how many values sort strictly before `lo`. */
  private case class Probe(name: String, k: Long, lo: Long, hi: Long, below: Long)

  /** Exact quantile selection over `df`'s LONG column `tickCol`.
    * Returns (quantile name, rank, tick value) — resolved, so callers
    * decide the presentation type (timestamp, decimal, raw count). */
  def exactTickQuantiles(df: DataFrame, tickCol: String,
                         targets: Seq[(String, Long, Long)] = Targets): Seq[(String, Long, Long)] = {
    val ticks = df.select(col(tickCol).as("t")).filter(col("t").isNotNull)
    val head = ticks.agg(
      count(col("t")).as("n"), min(col("t")).as("mn"), max(col("t")).as("mx"))
      .collect()(0)
    if (head.isNullAt(1)) return Seq.empty // empty input: no order statistics
    val (n, mn, mx) = (head.getLong(0), head.getLong(1), head.getLong(2))
    // bucket arithmetic ((hi-lo+Bins) and (t-lo)) must not wrap: a tick
    // domain spanning more than 2^62 is outside the contract (epoch
    // micros span ~2^51; cents ~2^47) and fails loudly here instead
    require(
      try Math.subtractExact(mx, mn) <= (1L << 62) catch { case _: ArithmeticException => false },
      s"tick span [$mn, $mx] exceeds 2^62 — rescale the tick domain")

    var probes = targets.map { case (name, num, den) =>
      require(num > 0 && num <= den, s"quantile $name=$num/$den outside (0,1]")
      val k = (n * num + den - 1) / den // ceil(q*n), exact integer math
      Probe(name, k, mn, mx, 0L)
    }
    var rounds = 0
    while (probes.exists(p => p.lo < p.hi)) {
      rounds += 1
      // width-1 buckets resolve an interval in one round, so the round
      // count is bounded by ceil(log_Bins(mx-mn+1)) + 1; anything past
      // that is a logic bug worth failing loudly on, not looping on.
      require(rounds <= 12, s"quantile refinement did not converge: $probes")
      val live = probes.filter(p => p.lo < p.hi)
      // one histogram pass for ALL live probes: a row contributes one
      // (probe, bucket) count per live interval containing it
      val cells: Column = array(live.map { p =>
        val width = (p.hi - p.lo + Bins) / Bins // ceil(range/Bins) >= 1
        // membership gate per probe: Bins·width >= range means a row
        // ABOVE hi (but under another probe's interval) would still
        // land in a valid bucket index — it must not count here
        struct(lit(p.name).as("q"),
          when(col("t").between(p.lo, p.hi),
            expr(s"(t - ${p.lo}) div $width")).otherwise(lit(-1L)).as("b"))
      }: _*)
      val coarseLo = live.map(_.lo).min
      val coarseHi = live.map(_.hi).max
      val hist = ticks
        .filter(col("t").between(coarseLo, coarseHi)) // pushable sliver
        .select(explode(cells).as("pb"))
        .filter(col("pb.b") >= 0) // rows outside this probe's interval
        .groupBy(col("pb.q").as("q"), col("pb.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
      probes = probes.map { p =>
        if (p.lo >= p.hi) p
        else {
          val width = (p.hi - p.lo + Bins) / Bins
          val counts = hist.getOrElse(p.name, Array.empty[Row])
            .map(r => r.getLong(1) -> r.getLong(2)).toMap
          // walk buckets in order until cumulative count reaches rank
          var cum = p.below
          var b = 0L
          var found = -1L
          while (found < 0 && b < Bins) {
            val c = counts.getOrElse(b, 0L)
            if (cum + c >= p.k) found = b else { cum += c; b += 1 }
          }
          require(found >= 0, s"rank ${p.k} not reachable in [${p.lo},${p.hi}] for ${p.name}")
          val lo2 = p.lo + found * width
          val hi2 = math.min(p.hi, lo2 + width - 1)
          if (width == 1) Probe(p.name, p.k, lo2, lo2, cum)
          else Probe(p.name, p.k, lo2, hi2, cum)
        }
      }
    }
    probes.map(p => (p.name, p.k, p.lo))
  }

  /** Driver query (key `q_exact_quantiles`): p50/p90/p99 of lineitem's
    * ship date — the data-freshness distribution of the fact table,
    * exact to the microsecond, computed in 3 column scans instead of a
    * 600k-row (100 TB-row) global sort. */
  def qExactQuantiles(spark: SparkSession, dir: String): DataFrame = {
    // parquet TIMESTAMP(MILLIS, ntz) arrives as TIMESTAMP_NTZ; the
    // session is pinned UTC so the cast changes type, not instant
    val li = Tables.lineitem(spark, dir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    val resolved = exactTickQuantiles(li, "ship_us")
    val schema = StructType(Seq(
      StructField("quantile", StringType, nullable = false),
      StructField("rank_k", LongType, nullable = false),
      StructField("ship_us", LongType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(resolved.map { case (q, k, v) => Row(q, k, v) }, 1),
        schema)
      .select(col("quantile"), col("rank_k"),
        timestamp_micros(col("ship_us")).as("value"))
  }

  /** ONE-PASS bounded-error quantiles — the sketch companion to
    * [[exactTickQuantiles]]. Where the exact operator iterates
    * `log_Bins(range)` scans to pin the order statistic to a single
    * tick, this stops after the FIRST histogram round and reports the
    * bucket each rank falls in: `[value_lo, value_hi]` with guaranteed
    * width ≤ `ceil(range/Bins)` — for a year of microsecond timestamps
    * at 1024 bins, ±4.3 hours, from exactly one data scan. The
    * per-bucket count grid is order-independent and mergeable
    * (elementwise sum), the same property that makes the HLL/CMS
    * sketches in [[Sketches]] shuffle-light: the exchange carries at
    * most `Bins` partial counts per partition, independent of data
    * size.
    *
    * The rank→bucket selection runs distributed: a running-count
    * window over the ≤`Bins`-row bucket table (bounded exactly like
    * the bin walk the exact operator does driver-side) joined to the
    * rank targets — each rank matches the unique bucket where the
    * cumulative count first reaches it. Only the (n, min, max) scalar
    * probe touches the driver. */
  def histQuantiles(df: DataFrame, tickCol: String,
                    targets: Seq[(String, Long, Long)] = Targets,
                    bins: Long = Bins): DataFrame = {
    val spark = df.sparkSession
    val ticks = df.select(col(tickCol).as("t")).filter(col("t").isNotNull)
    val head = ticks.agg(
      count(col("t")).as("n"), min(col("t")).as("mn"), max(col("t")).as("mx"))
      .collect()(0)
    val outSchema = StructType(Seq(
      StructField("quantile", StringType, nullable = false),
      StructField("rank_k", LongType, nullable = false)))
    if (head.isNullAt(1))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
        .withColumn("lo_tick", lit(null).cast(LongType))
        .withColumn("hi_tick", lit(null).cast(LongType))
    val (n, mn, mx) = (head.getLong(0), head.getLong(1), head.getLong(2))
    require(
      try Math.subtractExact(mx, mn) <= (1L << 62) catch { case _: ArithmeticException => false },
      s"tick span [$mn, $mx] exceeds 2^62 — rescale the tick domain")
    val width = (mx - mn + bins) / bins // ceil(range/bins) >= 1
    val ks = spark.createDataFrame(
      spark.sparkContext.parallelize(targets.map { case (name, num, den) =>
        require(num > 0 && num <= den, s"quantile $name=$num/$den outside (0,1]")
        Row(name, (n * num + den - 1) / den) // ceil(q*n), exact integer math
      }, 1), outSchema)
    // bounded single-partition window: <= bins rows by construction
    // (lit(0) declares the intentional one-partition layout)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("b"))
    val cum = ticks
      .groupBy(expr(s"(t - $mn) div $width").as("b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
    ks.join(broadcast(cum),
        col("cum") >= col("rank_k") && (col("cum") - col("c")) < col("rank_k"))
      .select(col("quantile"), col("rank_k"),
        (lit(mn) + col("b") * width).as("lo_tick"),
        least(lit(mx), lit(mn) + (col("b") + 1) * width - 1).as("hi_tick"))
  }

  /** Driver query (key `agg_hist_quantiles`): the one-scan sketch over
    * the same ship-date domain as [[qExactQuantiles]], so the two
    * results are directly comparable — the exact value always lands
    * inside [value_lo, value_hi], and `max_err_us` is the honest
    * uncertainty a consumer holds. */
  def aggHistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    histQuantiles(li, "ship_us")
      .select(col("quantile"), col("rank_k"),
        timestamp_micros(col("lo_tick")).as("value_lo"),
        timestamp_micros(col("hi_tick")).as("value_hi"),
        (col("hi_tick") - col("lo_tick")).as("max_err_us"))
  }

  /** Mergeable histogram roll-up (key `agg_hist_union`) — the
    * fixed-grid counterpart of the sketch-union family: once the grid
    * (global min, ceil-width) is agreed, per-SHARD bucket-count
    * histograms are the artifact a 100 TB pipeline persists per
    * ingest slice, and the range quantile comes from merging them by
    * plain counter addition — no re-scan of raw ticks. Shards here
    * are `l_returnflag` (the natural per-slice split of the same
    * ship-date domain [[aggHistQuantiles]] sketches); merge identity
    * (sum associativity) makes the merged bounds BIT-IDENTICAL to the
    * direct histogram, which is what the oracle computes; `n_shards`
    * pins that the roll-up really passed through the per-shard layer.
    *
    * Scale shape: one (shard, bucket)-keyed pass over ticks; the
    * merge shuffles ≤ shards·Bins rows — calendar/catalog-sized, not
    * corpus-sized; the rank→bucket join runs on the ≤Bins-row merged
    * table exactly as in [[histQuantiles]]. */
  def aggHistUnion(spark: SparkSession, dir: String,
                   targets: Seq[(String, Long, Long)] = Targets,
                   bins: Long = Bins): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("t"),
        col("l_returnflag").as("shard"))
      .filter(col("t").isNotNull)
    val head = li.agg(
      count(col("t")).as("n"), min(col("t")).as("mn"), max(col("t")).as("mx"))
      .collect()(0)
    val (n, mn, mx) = (head.getLong(0), head.getLong(1), head.getLong(2))
    val width = (mx - mn + bins) / bins
    val outSchema = StructType(Seq(
      StructField("quantile", StringType, nullable = false),
      StructField("rank_k", LongType, nullable = false)))
    val ks = spark.createDataFrame(
      spark.sparkContext.parallelize(targets.map { case (name, num, den) =>
        Row(name, (n * num + den - 1) / den)
      }, 1), outSchema)
    // the per-shard artifact: shard × bucket counts on the agreed grid
    val shardHists = li
      .groupBy(col("shard"), expr(s"(t - $mn) div $width").as("b"))
      .agg(count(lit(1)).as("c"))
    // merge = counter addition; bounded single-partition window over
    // the ≤bins-row merged table (lit(0) declares the layout)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("b"))
    val cum = shardHists.groupBy(col("b")).agg(sum(col("c")).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
    val nShards = shardHists.select(col("shard")).distinct()
      .agg(count(lit(1)).as("n_shards"))
    ks.join(broadcast(cum),
        col("cum") >= col("rank_k") && (col("cum") - col("c")) < col("rank_k"))
      .crossJoin(broadcast(nShards))
      .select(col("quantile"), col("rank_k"),
        timestamp_micros(lit(mn) + col("b") * width).as("value_lo"),
        timestamp_micros(least(lit(mx), lit(mn) + (col("b") + 1) * width - 1))
          .as("value_hi"),
        col("n_shards"))
  }

  /** Oracle: the direct fixed-grid replay (merge identity) + shard pin. */
  val aggHistUnionOracleSql: String = {
    val targetRows = Targets.map { case (q, num, den) => s"('$q', $num, $den)" }
      .mkString(", ")
    s"""WITH src AS (
       |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS v
       |  FROM lineitem WHERE l_shipdate IS NOT NULL),
       |s2 AS (
       |  SELECT CAST(COUNT(v) AS BIGINT) AS n, MIN(v) AS mn, MAX(v) AS mx,
       |    (MAX(v) - MIN(v) + $Bins) // $Bins AS width
       |  FROM src),
       |t(quantile, num, den) AS (VALUES $targetRows),
       |ks AS (
       |  SELECT quantile, CAST((n * num + den - 1) // den AS BIGINT) AS rank_k
       |  FROM t CROSS JOIN s2),
       |h AS (
       |  SELECT (src.v - s2.mn) // s2.width AS b, COUNT(*) AS c
       |  FROM src CROSS JOIN s2 GROUP BY 1),
       |ch AS (
       |  SELECT b, c, SUM(c) OVER (ORDER BY b) AS cum FROM h),
       |ns AS (SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_shards
       |       FROM lineitem WHERE l_shipdate IS NOT NULL)
       |SELECT k.quantile, k.rank_k,
       |  make_timestamp(s2.mn + ch.b * s2.width) AS value_lo,
       |  make_timestamp(LEAST(s2.mx, s2.mn + (ch.b + 1) * s2.width - 1)) AS value_hi,
       |  ns.n_shards
       |FROM ks k
       |JOIN ch ON ch.cum >= k.rank_k AND ch.cum - ch.c < k.rank_k
       |CROSS JOIN s2 CROSS JOIN ns""".stripMargin
  }

  /** Oracle: the identical integer bucket math replayed in one SQL
    * pipeline — count/min/max, ceil-width grid, running-count bucket
    * table, rank→first-covering-bucket join. */
  val aggHistQuantilesOracleSql: String = {
    val targetRows = Targets.map { case (q, num, den) => s"('$q', $num, $den)" }
      .mkString(", ")
    s"""WITH src AS (
       |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS v
       |  FROM lineitem WHERE l_shipdate IS NOT NULL),
       |s AS (
       |  SELECT CAST(COUNT(v) AS BIGINT) AS n, MIN(v) AS mn, MAX(v) AS mx,
       |    (MAX(v) - MIN(v) + $Bins) // $Bins AS width
       |  FROM src),
       |t(quantile, num, den) AS (VALUES $targetRows),
       |ks AS (
       |  SELECT quantile, CAST((n * num + den - 1) // den AS BIGINT) AS rank_k
       |  FROM t CROSS JOIN s),
       |h AS (
       |  SELECT (src.v - s.mn) // s.width AS b, COUNT(*) AS c
       |  FROM src CROSS JOIN s GROUP BY 1),
       |ch AS (
       |  SELECT b, c, SUM(c) OVER (ORDER BY b) AS cum FROM h)
       |SELECT k.quantile, k.rank_k,
       |  make_timestamp(s.mn + ch.b * s.width) AS value_lo,
       |  make_timestamp(LEAST(s.mx, s.mn + (ch.b + 1) * s.width - 1)) AS value_hi,
       |  LEAST(s.mx, s.mn + (ch.b + 1) * s.width - 1) - (s.mn + ch.b * s.width)
       |    AS max_err_us
       |FROM ks k
       |JOIN ch ON ch.cum >= k.rank_k AND ch.cum - ch.c < k.rank_k
       |CROSS JOIN s""".stripMargin
  }

  /** Oracle: the same type-1 order statistics read off a ranked sort —
    * the formulation this operator exists to avoid at scale, which is
    * exactly what makes it the right independent check. Rank uses the
    * identical integer ceil. */
  val qExactQuantilesOracleSql: String = {
    val targetRows = Targets.map { case (q, num, den) => s"('$q', $num, $den)" }
      .mkString(", ")
    s"""WITH nn AS (
       |  SELECT CAST(COUNT(l_shipdate) AS BIGINT) AS n FROM lineitem
       |  WHERE l_shipdate IS NOT NULL),
       |t(quantile, num, den) AS (VALUES $targetRows),
       |ks AS (
       |  SELECT quantile, CAST((n * num + den - 1) // den AS BIGINT) AS rank_k
       |  FROM t CROSS JOIN nn),
       |ranked AS (
       |  SELECT l_shipdate AS v,
       |    ROW_NUMBER() OVER (ORDER BY l_shipdate) AS rn
       |  FROM lineitem WHERE l_shipdate IS NOT NULL)
       |SELECT k.quantile, k.rank_k, CAST(r.v AS TIMESTAMP) AS value
       |FROM ks k JOIN ranked r ON r.rn = k.rank_k""".stripMargin
  }
}
