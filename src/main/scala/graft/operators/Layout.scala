package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order (Morton) data layout: interleave the bits of two clustering
  * dimensions so that sorting by the single interleaved key places
  * rows close in BOTH dimensions into the same files — the layout
  * technique behind Delta/Iceberg `ZORDER BY` and the reason min/max
  * file skipping works for multi-column predicates.
  *
  * Why it matters at 100 TB: a parquet lake is pruned by per-file
  * min/max statistics. Sorted by one column, predicates on any other
  * column read every file. Z-ordered by (a, b), a predicate on EITHER
  * column maps to a bounded set of Morton-key ranges, so both
  * predicate shapes skip most files. The key is pure bit math
  * (codegen'd, no shuffle of its own); the layout write is one
  * `repartitionByRange` + in-partition sort — the same single
  * exchange a plain sorted write costs.
  *
  * The bit-spread uses the standard mask-and-shift doubling: spread
  * 16 bits to 32 with masks 0x00FF00FF / 0x0F0F0F0F / 0x33333333 /
  * 0x55555555, then OR the two spread words offset by one bit.
  */
object Layout {

  /** Low 16 bits of `c` spread to even bit positions (0, 2, 4, …). */
  private def spread16(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit dimensions (`x` even bits, `y`
    * odd bits). Inputs are masked to their low 16 bits. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Writes `df` z-ordered on (`x`, `y`): one range exchange on the
    * Morton key, sorted within partitions, so every output file covers
    * a contiguous key range and carries tight min/max stats on the
    * key (and near-tight ones on both source dimensions). */
  def zorderWrite(df: DataFrame, x: Column, y: Column, path: String,
                  partitions: Int = 0): Unit = {
    val keyed = df.withColumn("zkey", mortonKey(x, y))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("zkey"))
      else keyed.repartitionByRange(col("zkey"))
    ranged.sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
  }

  /** Tile width exponent for the driver query's locality report:
    * bucket = zkey >> 22, i.e. a 32×32 grid of 2048×2048 tiles. */
  val BucketShift = 22

  /** Driver query: Morton-key the events table on
    * (user_id, minute-of-epoch) and report per-tile extents — each
    * tile's x/y min–max spans stay bounded by the tile geometry, which
    * is the file-skipping property the layout exists to create (a
    * tile ≙ a file's worth of rows at scale; its min/max IS the
    * pruning statistic). Deterministic integer math end to end. */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("x", col("user_id").bitwiseAND(lit(0xFFFFL)))
      // `div` (integer division) — `/` is double division on Columns;
      // both engines see positive epochs so trunc == floor
      .withColumn("y", expr("unix_micros(ts) div 60000000")
        .bitwiseAND(lit(0xFFFFL)))
    ev.withColumn("zkey", mortonKey(col("x"), col("y")))
      .groupBy(shiftright(col("zkey"), BucketShift).as("tile"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("zkey")).as("min_zkey"), max(col("zkey")).as("max_zkey"))
  }

  /** Writes `df` Hilbert-clustered on (`x`, `y`): identical exchange
    * shape to [[zorderWrite]] — one range partition + in-partition
    * sort on the curve index, so every file covers a contiguous,
    * pairwise-disjoint hkey range with the curve's tighter x/y
    * locality per range. */
  def hilbertWrite(df: DataFrame, x: Column, y: Column, path: String,
                   partitions: Int = 0): Unit = {
    val keyed = df.withColumn("hkey", call_function("hilbert_index", x, y))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("hkey"))
      else keyed.repartitionByRange(col("hkey"))
    ranged.sortWithinPartitions(col("hkey"))
      .write.mode("overwrite").parquet(path)
  }

  /** Driver query (key `layout_hilbert`): the Z-order report's twin on
    * the Hilbert curve — index the events table on (user_id,
    * minute-of-epoch) with the native `hilbert_index` expression and
    * report per-tile extents. Hilbert's walk never takes Morton's
    * diagonal quadrant jumps, so a contiguous index range (≙ one file
    * at scale) covers a more compact x/y region — tighter min/max
    * pruning stats on BOTH columns than the zkey tiles, which is why
    * newer table formats cluster by Hilbert rather than Z-order. Same
    * single-aggregation plan shape as `layout_zorder`: the key is one
    * static call per row inside whole-stage codegen. */
  def qHilbertLayout(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("x", col("user_id").bitwiseAND(lit(0xFFFFL)))
      .withColumn("y", expr("unix_micros(ts) div 60000000")
        .bitwiseAND(lit(0xFFFFL)))
    ev.withColumn("hkey", expr("hilbert_index(x, y)"))
      .groupBy(shiftright(col("hkey"), BucketShift).as("tile"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        min(col("hkey")).as("min_hkey"), max(col("hkey")).as("max_hkey"))
  }

  /** Oracle: the unrolled 16-level walk as chained CTEs (identical
    * branch structure to the executor's loop — see Hilbert.scala). */
  val qHilbertLayoutOracleSql: String =
    s"""WITH e AS (
       |  SELECT user_id & 65535 AS ox,
       |    (epoch_us(CAST(ts AS TIMESTAMP)) // 60000000) & 65535 AS oy,
       |    user_id & 65535 AS x,
       |    (epoch_us(CAST(ts AS TIMESTAMP)) // 60000000) & 65535 AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM events
       |)${graft.functions.Hilbert.oracleChainCtes("e")}
       |SELECT d >> $BucketShift AS tile, COUNT(*) AS n_rows,
       |  MIN(ox) AS min_x, MAX(ox) AS max_x,
       |  MIN(oy) AS min_y, MAX(oy) AS max_y,
       |  MIN(d) AS min_hkey, MAX(d) AS max_hkey
       |FROM h${graft.functions.Hilbert.Bits} GROUP BY 1""".stripMargin

  /** Bins per partition for the driver compaction key: each day's
    * file set packs into ~quarter-day bins, a scale-invariant target
    * (the bin count stays 4 whether the day has 1k or 1B rows). */
  val CompactionBinsPerDay = 4

  /** Small-file compaction planner (key `layout_compaction`) — the
    * lakehouse maintenance pass behind Delta OPTIMIZE / Iceberg
    * rewrite_data_files: given a file inventory (partition, file,
    * size), assign files to compaction bins of ~target size by
    * cumulative packing in file order, so each bin becomes one
    * rewrite task producing one right-sized file.
    *
    * Why it matters at 100 TB: streaming/incremental ingest writes
    * thousands of small files per partition, and scan cost becomes
    * per-file overhead (open + footer + scheduling), not bytes. The
    * planner is METADATA-sized — it touches one row per file (a 100 TB
    * lake is ~10⁵–10⁷ inventory rows, not data rows), so the plan
    * itself costs one inventory-sized shuffle; the rewrite it drives
    * is then an embarrassingly parallel per-bin repartition.
    *
    * Packing contract (deterministic, engine-portable integer math):
    * within each partition, files ordered by file id accumulate an
    * EXCLUSIVE running size; `bin = cum_excl div target` — the
    * "fill past the target, then start a new bin" discipline. Every
    * bin except possibly the last exceeds neither bound by more than
    * one file, the standard greedy guarantee.
    *
    * `files` needs columns (part, file_id, size); `target` must be a
    * positive integral Column (constant or per-row derived). */
  def compactionPlanOn(files: DataFrame, target: Column): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ordW = W.partitionBy(col("part")).orderBy(col("file_id"))
    files
      .withColumn("__target", target)
      .withColumn("cum_excl", coalesce(
        sum(col("size")).over(ordW.rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("bin", expr("cum_excl div __target"))
      .drop("__target")
  }

  /** Driver query (key `layout_compaction`): the inventory is the
    * events table bucketed into (day, hour) "files" (row count as the
    * size proxy — the shape a streaming-ingest lake produces: one
    * small file per source per hour). Target = ceil(day_total /
    * [[CompactionBinsPerDay]]), so each day plans into ~4 rewrite
    * tasks at any scale. Output: one row per file with its assigned
    * bin plus the bin's rolled-up size — the exact work list a
    * rewrite job consumes. */
  def qCompaction(spark: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val inv = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"),
        hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("n_rows"))
    val dayW = W.partitionBy(col("day"))
    val ordW = dayW.orderBy(col("hr"))
    inv
      // both windows share the day partitioning the groupBy shuffle
      // already established — the hourly inventory is bounded
      // (≤ 24 rows/day), so the window pass is metadata-sized
      .withColumn("day_rows", sum(col("n_rows")).over(dayW))
      .withColumn("cum_excl", coalesce(
        sum(col("n_rows")).over(ordW.rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("bin", expr(
        s"cum_excl div ((day_rows + ${CompactionBinsPerDay - 1}) div $CompactionBinsPerDay)"))
      .withColumn("bin_rows",
        sum(col("n_rows")).over(W.partitionBy(col("day"), col("bin"))))
      .withColumn("bin_files",
        count(lit(1)).over(W.partitionBy(col("day"), col("bin"))))
      .select(col("day"), col("hr"), col("n_rows"), col("bin"),
        col("bin_rows"), col("bin_files"))
  }

  /** Oracle: identical integer packing replayed in SQL. */
  val qCompactionOracleSql: String =
    s"""WITH inv AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
       |    COUNT(*) AS n_rows
       |  FROM events GROUP BY 1, 2
       |), packed AS (
       |  SELECT day, hr, n_rows,
       |    CAST(COALESCE(SUM(n_rows) OVER (PARTITION BY day ORDER BY hr
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // ((SUM(n_rows) OVER (PARTITION BY day) + ${CompactionBinsPerDay - 1})
       |          // $CompactionBinsPerDay) AS BIGINT) AS bin
       |  FROM inv
       |)
       |SELECT day, hr, n_rows, bin,
       |  CAST(SUM(n_rows) OVER (PARTITION BY day, bin) AS BIGINT) AS bin_rows,
       |  COUNT(*) OVER (PARTITION BY day, bin) AS bin_files
       |FROM packed""".stripMargin

  /** Same bit math in DuckDB (BIGINT &, |, <<). */
  val qZorderLayoutOracleSql: String = {
    def spread(e: String): String = {
      val v0 = s"(($e) & 65535)"
      val v1 = s"((($v0) | (($v0) << 8)) & 16711935)"
      val v2 = s"((($v1) | (($v1) << 4)) & 252645135)"
      val v3 = s"((($v2) | (($v2) << 2)) & 858993459)"
      s"((($v3) | (($v3) << 1)) & 1431655765)"
    }
    s"""WITH e AS (
       |  SELECT user_id & 65535 AS x,
       |    (epoch_us(CAST(ts AS TIMESTAMP)) // 60000000) & 65535 AS y
       |  FROM events
       |), z AS (
       |  SELECT x, y, ${spread("x")} | (${spread("y")} << 1) AS zkey FROM e
       |)
       |SELECT zkey >> $BucketShift AS tile, COUNT(*) AS n_rows,
       |  MIN(x) AS min_x, MAX(x) AS max_x,
       |  MIN(y) AS min_y, MAX(y) AS max_y,
       |  MIN(zkey) AS min_zkey, MAX(zkey) AS max_zkey
       |FROM z GROUP BY 1""".stripMargin
  }
}
