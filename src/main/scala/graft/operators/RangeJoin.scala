package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.queries.Analytics.dsum

/** Binned (bucketed) range join: match point rows to interval rows
  * with NO equi-key — the join shape Spark's optimizer handles worst.
  * A naive `p.ts BETWEEN i.start AND i.end` theta-join plans as a
  * nested-loop over the full point×interval product; at 100 TB of
  * points that is the canonical scale-killer.
  *
  * The standard fix (as used by Databricks' range-join hints and
  * Flink's interval joins): quantize time into fixed-width bins,
  * explode each interval to the bins it covers, bin each point once,
  * and equi-join on the bin — Catalyst then plans a hash join whose
  * shuffle is proportional to the data, and the exact half-open
  * `start <= ts < end` predicate filters within the bin. Each point
  * falls in exactly ONE bin and an interval emits each covered bin
  * once, so a (point, interval) pair meets exactly once: no
  * post-join dedup needed. Cost scales with interval_count ×
  * bins_per_interval (pick the bin width near the median interval
  * length, the same tuning rule as the Databricks hint).
  */
object RangeJoin {

  /** Generic form. `intervals` must carry `start_ts`/`end_ts`
    * (half-open [start, end)); `points` joins on `pointTs`. `binUnit`
    * is a date_trunc unit — pick it near the median interval length. */
  def binnedRangeJoinOn(intervals: DataFrame, points: DataFrame,
                        pointTs: Column, binUnit: String = "hour"): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        date_trunc(binUnit, col("start_ts")),
        date_trunc(binUnit, col("end_ts")),
        expr(s"INTERVAL 1 $binUnit"))))
    points
      .withColumn("__bin", date_trunc(binUnit, pointTs))
      .join(binned, "__bin")
      .filter(pointTs >= col("start_ts") && pointTs < col("end_ts"))
      .drop("__bin")
  }

  /** Busiest hours promoted to interval rows. */
  val SpikeK = 20
  /** Half-open incident-window length in hours. */
  val WindowHours = 3

  /** Driver query: the `SpikeK` busiest event hours open 3-hour
    * "incident windows" [hour, +3h); count ALL events (every user —
    * no equi-key, the genuinely range-only case) landing in each
    * window. DuckDB's oracle runs the same join as a native
    * inequality join (IEJoin) — same semantics, different physical
    * strategy. Windows may overlap; a (window, event) pair still
    * meets exactly once (see [[binnedRangeJoinOn]]). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val windows = events
      .groupBy(date_trunc("hour", col("ts")).as("start_ts"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("start_ts"))
      .limit(SpikeK)
      .select(col("start_ts"),
        (col("start_ts") + expr(s"INTERVAL $WindowHours HOURS")).as("end_ts"))
    binnedRangeJoinOn(windows, events, col("ts"), "hour")
      .groupBy(col("start_ts").as("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
  }

  val qRangeJoinOracleSql: String =
    s"""WITH w AS (
       |  SELECT start_ts, start_ts + INTERVAL $WindowHours HOUR AS end_ts
       |  FROM (
       |    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS start_ts,
       |      COUNT(*) AS n
       |    FROM events GROUP BY 1
       |    ORDER BY n DESC, start_ts LIMIT $SpikeK))
       |SELECT w.start_ts AS window_start, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
       |FROM w JOIN events e
       |  ON CAST(e.ts AS TIMESTAMP) >= w.start_ts
       | AND CAST(e.ts AS TIMESTAMP) <  w.end_ts
       |GROUP BY 1""".stripMargin
}
