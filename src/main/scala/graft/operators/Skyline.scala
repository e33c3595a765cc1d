package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed skyline / Pareto frontier (key `q_skyline`) — the
  * classic "best tradeoff" operator (Börzsönyi, Kossmann & Stocker,
  * ICDE'01): keep every row no other row DOMINATES, where r'
  * dominates r iff r' is ≤ on the minimized dimension and ≥ on the
  * maximized one, strictly better on at least one. The cheapest
  * part at every size class, the largest part at every price point —
  * the curated-zone question behind "best value" reports and
  * candidate pruning before expensive downstream scoring.
  *
  * The naive form is the O(n²) NOT-EXISTS self-join the oracle runs;
  * the engine form is the sort-scan identity, made distributed:
  *
  *   keep r  ⟺  size(r) = max size at its price
  *            ∧ size(r) > max size over all STRICTLY cheaper prices
  *
  * (equal-price ties at the group max are mutually non-dominating and
  * all kept — matching strict dominance exactly). That needs one
  * per-price aggregate and one PREFIX MAX over prices — and a prefix
  * over a global order is exactly the surrogate-key problem, so the
  * same recipe applies (Keys.surrogateKeysOn): range-partition the
  * per-price maxima, per-partition maxima are a #partitions-sized
  * bounded collect, driver prefix-scan gives each partition its
  * carry-in, and the within-partition strict-prefix max runs under a
  * window PARTITIONED by the partition id. No unpartitioned window,
  * no quadratic pair join; the one range exchange carries DISTINCT
  * prices, not rows.
  *
  * Determinism: the ranged frame holds one row per DISTINCT price, so
  * range-partition tie-splitting (the Keys caveat) cannot occur; all
  * comparisons are exact int/double orderings.
  */
object Skyline {

  /** Partitions for the prefix exchange (parallelism knob only). */
  val SkyPartitions = 32

  /** Generic skyline of `df` minimizing `minCol`, maximizing `maxCol`.
    * Returns the input rows that survive (all columns), ties kept. */
  def skylineOn(df: DataFrame, minCol: Column, maxCol: Column,
                partitions: Int = SkyPartitions): DataFrame = {
    val spark = df.sparkSession
    val gm = df.groupBy(minCol.as("__price")).agg(max(maxCol).as("__gmax"))
    // the prefix-max carry below rides Long driver-side (per-partition
    // maxima collect + Long.MinValue sentinel + a long-typed map
    // literal) — a fractional maxCol would silently TRUNCATE carry-ins
    // and emit a wrong frontier. Integral types only; callers with a
    // fractional dimension rescale to a fixed-point integer first
    // (exact for decimals; the driver key casts p_size to bigint).
    gm.schema("__gmax").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"skylineOn maxCol must be an integral type (got $other): the " +
          "distributed prefix-max carries partition maxima as Long — " +
          "rescale a fractional dimension to fixed-point integer first")
    }
    // STAGED for the same reason as Keys.surrogateKeysOn: the carry-in
    // count job and the final scan must read ONE frozen (__pid, row)
    // assignment, or AQE may re-coalesce the range exchange between
    // executions and key the offsets to partitions that no longer exist
    val staged = Scratch.dir("graft_skyline_ranged")
    gm.repartitionByRange(partitions, col("__price"))
      .sortWithinPartitions(col("__price"))
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(staged)
    val ranged = spark.read.parquet(staged)
    // bounded: one row per partition — the per-partition max feeds the
    // driver prefix-scan that gives each partition its carry-in
    val pmax = ranged.groupBy(col("__pid")).agg(max(col("__gmax")).as("m"))
      .collect().map(r => (r.getInt(0), r.getAs[Number](1).longValue())).sortBy(_._1)
    val carryIn = pmax.scanLeft((0, Long.MinValue)) { case ((_, acc), (pid, m)) =>
      (pid, math.max(acc, m))
    }.init.map { case (_, carry) => carry }
    val carryByPid = pmax.map(_._1).zip(carryIn).toMap
    val carryCol = element_at(
      typedLit(carryByPid.map { case (k, v) => (k, v) }), col("__pid"))
    // strict-prefix max within the partition: everything strictly
    // cheaper in earlier rows of THIS partition
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__price"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val frontier = ranged
      .withColumn("__before",
        greatest(coalesce(max(col("__gmax")).over(w), lit(Long.MinValue)),
          carryCol))
      .where(col("__gmax") > col("__before"))
      .select(col("__price"), col("__gmax"))
    // re-attach the surviving rows: every row AT the group max of a
    // frontier price is non-dominated (equal ties all kept)
    df.join(frontier,
        minCol === col("__price") && maxCol === col("__gmax"))
      .drop("__price", "__gmax")
  }

  /** Driver key: best-value parts — minimize `p_retailprice`,
    * maximize `p_size`. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    skylineOn(
      Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("bigint").as("p_size")),
      col("p_retailprice"), col("p_size"))

  /** Oracle: the quadratic strict-dominance NOT EXISTS the scan
    * replaces — different algorithm, same rows. */
  val qSkylineOracleSql: String =
    """SELECT r.p_partkey, r.p_retailprice, CAST(r.p_size AS BIGINT) AS p_size
      |FROM part r
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part d
      |  WHERE d.p_retailprice <= r.p_retailprice AND d.p_size >= r.p_size
      |    AND (d.p_retailprice < r.p_retailprice OR d.p_size > r.p_size))""".stripMargin
}
