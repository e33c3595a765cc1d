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

  /** Incident windows for the interval-interval key. */
  val IntervalTopK = 20
  /** Bin width for the interval×interval join: 1 day in µs — near the
    * long tail of session lengths, so explode factors stay 1–3. */
  val IntervalBinUs = 86400000000L

  /** Interval×INTERVAL overlap join (key `q_interval_join`) — the
    * two-sided generalization of [[binnedRangeJoinOn]]: both relations
    * are intervals and a pair matches when they OVERLAP. The naive
    * `s.start <= i.end AND i.start <= s.end` theta-join is a
    * nested-loop product at scale; binning BOTH sides restores an
    * equi-join: each interval explodes to its covered bins, pairs meet
    * in every shared bin, and the "first shared bin" guard
    * `bin == greatest(floor(s.start/W), floor(i.start/W))` — the bin
    * where the LATER interval begins, necessarily covered by both —
    * keeps exactly one copy without a distinct. Shuffle is
    * bins-per-interval × rows, the Flink/Databricks interval-join
    * recipe with no dedup pass.
    *
    * Driver semantics: user sessions (the q_events_sessionize
    * intervals) overlapping the [[IntervalTopK]] LONGEST sessions
    * (deterministic top: duration desc, user, session) of OTHER
    * users — "who was active while the marathon sessions ran"; emits
    * the exact µs overlap per pair. Oracle = the same top-K + a plain
    * inequality overlap join (DuckDB IEJoin) — different physical
    * strategy, same rows, which is precisely what the binned rewrite
    * must preserve. */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.Analytics
    val sessions = Analytics.qEventsSessionize(spark, dir)
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"),
        col("duration_sec"))
    val incidents = sessions
      .orderBy(col("duration_sec").desc, col("user_id"), col("session_id"))
      .limit(IntervalTopK)
      .select(col("user_id").as("inc_user"), col("session_id").as("inc_session"),
        col("s_us").as("inc_s"), col("e_us").as("inc_e"))
    val w = IntervalBinUs
    val sb = sessions.withColumn("bin",
      explode(sequence(expr(s"s_us div $w"), expr(s"e_us div $w"))))
    val ib = incidents.withColumn("bin",
      explode(sequence(expr(s"inc_s div $w"), expr(s"inc_e div $w"))))
    sb.join(ib, "bin")
      .filter(col("user_id") =!= col("inc_user"))
      .filter(col("s_us") <= col("inc_e") && col("inc_s") <= col("e_us"))
      .filter(col("bin") === greatest(expr(s"s_us div $w"), expr(s"inc_s div $w")))
      .select(col("user_id"), col("session_id"),
        col("inc_user"), col("inc_session"),
        (least(col("e_us"), col("inc_e")) -
          greatest(col("s_us"), col("inc_s"))).as("overlap_us"))
  }

  val qIntervalJoinOracleSql: String =
    s"""WITH s AS (
       |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |    epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us,
       |    (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
       |  FROM (
       |    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
       |      SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |    FROM (
       |      SELECT user_id, ts, event_id,
       |        CASE WHEN prev_us IS NULL
       |               OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 21600000000
       |             THEN 1 ELSE 0 END AS is_new
       |      FROM (
       |        SELECT user_id, ts, event_id,
       |          LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
       |            PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |        FROM events) a) b) c
       |  GROUP BY 1, 2
       |), inc AS (
       |  SELECT user_id AS inc_user, session_id AS inc_session,
       |    s_us AS inc_s, e_us AS inc_e
       |  FROM s ORDER BY duration_sec DESC, user_id, session_id
       |  LIMIT $IntervalTopK
       |)
       |SELECT s.user_id, s.session_id, i.inc_user, i.inc_session,
       |  LEAST(s.e_us, i.inc_e) - GREATEST(s.s_us, i.inc_s) AS overlap_us
       |FROM s JOIN inc i
       |  ON s.s_us <= i.inc_e AND i.inc_s <= s.e_us
       |WHERE s.user_id != i.inc_user""".stripMargin

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
