package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.queries.Analytics.{davg, dsum}

/** ETL core — the reference pipeline's actual surface, re-expressed
  * as declarative Spark transforms over the `events` table.
  *
  * Reference semantics covered (file:line cites against
  * /root/reference, studied for behavior only):
  *  - normalize: scripts/normalize_open_meteo_to_parquet.py:44-96 —
  *    semi-structured payload → fixed typed schema, one row per
  *    observation, derived date/hour, load metadata columns.
  *  - keep-latest merge: scripts/sql/l2_tables/upsert_l2_for_ds.sql:7-33 —
  *    ROW_NUMBER() OVER (PARTITION BY key ORDER BY recency DESC) = 1.
  *  - DQ gates: normalize_open_meteo_to_parquet.py:53-56 — emptiness /
  *    shape / NaN checks, generalized to a null/range/PK report.
  *  - per-ds incremental runs: airflow/dags/dag_normalize_to_parquet.py —
  *    every transform is parameterized by a `ds` partition so reruns
  *    are idempotent (see Sinks for the dynamic-overwrite write path).
  *
  * Scale notes: every operator here is a narrow projection, a single
  * hash aggregate, or a single window over a bounded key — no
  * collect(), no cartesian, filters are parquet-pushable. At 100 TB
  * the normalize path is scan-bound (good) and keep-latest shuffles
  * once on the dedupe key.
  */
object Etl {

  /** Logical load date stamped on normalized rows; a pipeline would
    * pass the DAG's `ds` here — fixed so verify runs are deterministic. */
  val LoadDs = "2024-02-01"

  /** The incremental-run example partition (etl_incremental_ds). */
  val IncrementalDs = "2024-01-15"

  /** Normalize: semi-structured event payload → fixed typed schema.
    * Parses the JSON `props` column, derives `event_date`/`event_hour`
    * from the event timestamp, and stamps source/load metadata —
    * the reference's raw→staging contract. */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      col("ts"),
      to_date(col("ts")).as("event_date"),
      hour(col("ts")).as("event_hour"),
      col("user_id"),
      col("event_type"),
      col("value"),
      // parse as STRING + try_cast so malformed props yield NULL (not a
      // job failure) — same null-on-malformed semantics as the oracle's
      // TRY_CAST (r2 advice: hard CAST diverged on dirty input).
      from_json(col("props"), lit("k STRING")).getField("k")
        .try_cast("int").as("prop_k"),
      lit("events").as("source"),
      lit(LoadDs).as("load_ds"))

  val normalizeOracleSql: String =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
      |  CAST(ts AS DATE) AS event_date,
      |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour,
      |  user_id, event_type, value,
      |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
      |  'events' AS source, '2024-02-01' AS load_ds
      |FROM events""".stripMargin

  /** Hourly rollup: the reference's hourly-observation aggregation
    * shape (avg/min/max/count per date×hour×type). Two-phase hash
    * aggregate; group key cardinality is bounded (dates × 24 × types)
    * so the shuffle is tiny regardless of input size. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    normalize(spark, dir)
      .groupBy(col("event_date"), col("event_hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users"))

  val hourlyRollupOracleSql: String =
    """SELECT CAST(ts AS DATE) AS event_date,
      |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value) AS avg_value,
      |  MIN(value) AS min_value, MAX(value) AS max_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2, 3""".stripMargin

  /** Keep-latest-by-key merge (the reference's L2 upsert semantics):
    * one row per (user_id, event_type), the most recent by ts with a
    * deterministic event_id tiebreak. Single shuffle on the dedupe
    * key; row_number (not max+join) so it is one pass. */
  def keepLatest(spark: SparkSession, dir: String): DataFrame =
    Merge.keepLatest(Tables.events(spark, dir),
        keys = Seq(col("user_id"), col("event_type")),
        orderCol = col("ts"), tiebreak = col("event_id"))
      .select("event_id", "ts", "user_id", "event_type", "value")

  val keepLatestOracleSql: String =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY user_id, event_type
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin

  /** Data-quality report: one wide row of null counts, distincts,
    * ranges, and PK-uniqueness violations — the reference's DQ gates
    * generalized. A single aggregate pass over the table. */
  def dqReport(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("n_null_event_id"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("n_null_ts"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user_id"),
      sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("n_null_event_type"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
      countDistinct(col("user_id")).as("n_distinct_users"),
      countDistinct(col("event_type")).as("n_distinct_event_types"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("pk_violations"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))

  // SUMs are wrapped CAST(... AS BIGINT): DuckDB evaluates SUM over
  // integers as HUGEINT while Spark emits LongType — identical values,
  // diverging type-sensitive driver hash (r2 advice).
  val dqReportOracleSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_event_id,
      |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ts,
      |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user_id,
      |  CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_event_type,
      |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
      |  CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props,
      |  COUNT(DISTINCT user_id) AS n_distinct_users,
      |  COUNT(DISTINCT event_type) AS n_distinct_event_types,
      |  COUNT(*) - COUNT(DISTINCT event_id) AS pk_violations,
      |  CAST(MIN(ts) AS TIMESTAMP) AS min_ts,
      |  CAST(MAX(ts) AS TIMESTAMP) AS max_ts,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events""".stripMargin

  /** Schema enforcement: cast every column to the staging contract
    * (the reference's explicit dtype table), safe-cast the
    * JSON-derived field (bad values → NULL, not a job failure), and
    * prune to exactly the contract columns. Money is quantized through
    * DECIMAL(12,2) — exact, engine-portable — then presented as DOUBLE
    * (r2 advice: a raw DECIMAL output column serializes differently
    * between Spark parquet and the DuckDB result, failing the driver
    * hash with zero value-level difference). */
  def schemaEnforce(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id").cast("bigint").as("event_id"),
      col("ts").cast("timestamp").as("ts"),
      col("user_id").cast("int").as("user_id"),
      col("event_type").cast("string").as("event_type"),
      col("value").cast("decimal(12,2)").cast("double").as("value_2dp"),
      from_json(col("props"), lit("k STRING")).getField("k")
        .try_cast("int").as("prop_k"))

  val schemaEnforceOracleSql: String =
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |  CAST(ts AS TIMESTAMP) AS ts,
      |  CAST(user_id AS INTEGER) AS user_id,
      |  CAST(event_type AS VARCHAR) AS event_type,
      |  CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value_2dp,
      |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
      |FROM events""".stripMargin

  /** DQ distribution profile: exact interpolated percentiles of the
    * metric per event type (plus count/min/max) — the distributional
    * complement to dqReport's null/uniqueness checks, the shape a DQ
    * monitor alerts on. Spark's `percentile` is the exact sort-based
    * aggregate (not approx_percentile) with the same linear
    * interpolation DuckDB's quantile_cont uses, so results compare
    * bit-exactly; at 100 TB the exact form costs a per-group sort and
    * a monitor would switch to approx_percentile (t-digest), trading
    * the oracle for an error bound. */
  def dqProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.75)").as("p75"),
        expr("percentile(value, 0.95)").as("p95"),
        max(col("value")).as("max_value"))

  val dqProfileOracleSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  MIN(value) AS min_value,
      |  quantile_cont(value, 0.25) AS p25,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.75) AS p75,
      |  quantile_cont(value, 0.95) AS p95,
      |  MAX(value) AS max_value
      |FROM events
      |GROUP BY 1""".stripMargin

  /** Drift fences for [[dqDrift]]: a day whose row count moves outside
    * [1/DriftFactor, DriftFactor]× its trailing-window average is
    * flagged. */
  val DriftFactor = 2.0
  /** Trailing window: the 7 preceding days (current day excluded). */
  val DriftWindowDays = 7

  /** Day-over-day DQ DRIFT report — the reference runs per-ds loads
    * (its airflow dags, one slice a day); the monitoring question those
    * pipelines actually page on is "did today's slice arrive at the
    * usual size?". One row per CALENDAR day between the lake's first
    * and last observed date (the [[backfillGapsOn]] calendar, so a day
    * that arrived with ZERO rows is a row here — the worst arrival
    * size must page loudest, not silently have no row to flag), with
    * its row/user counts, the trailing 7-CALENDAR-day average, the
    * ratio against it, and an anomaly flag when the ratio leaves
    * [1/2, 2]. The calendar basis also keeps the trailing window
    * honest through outages: 7 rows back is 7 days back, not 7
    * observed-days-skipping-the-outage back. A day with rows on an
    * ALL-ZERO trailing week (first day of recovery after a
    * window-length outage) has no ratio but IS flagged — that is the
    * strongest drift signal there is. Days with no history at all
    * (the corpus head, trailing average null) are NOT flagged —
    * silence, not a false page, is the cold-start contract.
    *
    * Shape: one bounded hash aggregate (day-cardinality-sized), the
    * bounded calendar explode, + one window over the day table — the
    * global-order window is over distinct DATES (bounded like
    * q_running_total's, documented there), never over raw rows.
    * Integer day-counts keep the trailing average bit-portable (exact
    * integer sums < 2^53 divided once). */
  def dqDrift(spark: SparkSession, dir: String): DataFrame =
    dqDriftOn(Tables.events(spark, dir).withColumn("event_date", to_date(col("ts"))))

  def dqDriftOn(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"))
    val cal = daily
      .agg(min(col("event_date")).as("mn"), max(col("event_date")).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("event_date"))
    val full = cal.join(broadcast(daily), Seq("event_date"), "left")
      .select(col("event_date"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
    // bounded single-partition window: one row per CALENDAR DAY of the
    // lake's span, never corpus-sized (lit(0) declares the layout)
    val w = Window.partitionBy(lit(0)).orderBy(col("event_date"))
      .rowsBetween(-DriftWindowDays, -1)
    full
      .withColumn("trailing_avg_rows", avg(col("n_rows")).over(w))
      // ratio only when the trailing average is a real positive basis:
      // 0/0 would be NaN, whose comparison semantics differ across
      // engines — an all-zero history gives no basis to page on
      .withColumn("ratio", when(col("trailing_avg_rows") > 0.0,
        col("n_rows").cast("double") / col("trailing_avg_rows")))
      // avg==0 with rows present is the strongest drift signal there
      // is (first day of recovery after a >=window-length total
      // outage) — it needs no ratio. Only the genuinely-no-history
      // head (avg IS NULL -> whole OR nulls out) stays silent.
      .withColumn("is_anomaly",
        coalesce(col("ratio") > DriftFactor || col("ratio") < lit(1.0) / DriftFactor
            || (col("trailing_avg_rows") === 0.0 && col("n_rows") > 0),
          lit(false)))
  }

  val dqDriftOracleSql: String =
    s"""WITH d AS (
       |  SELECT CAST(ts AS DATE) AS event_date,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       |  FROM events GROUP BY 1),
       |b AS (SELECT MIN(event_date) AS mn, MAX(event_date) AS mx FROM d),
       |cal AS (
       |  SELECT CAST(unnest(generate_series(CAST(b.mn AS TIMESTAMP),
       |    CAST(b.mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS event_date
       |  FROM b),
       |f AS (
       |  SELECT c.event_date, COALESCE(d.n_rows, 0) AS n_rows,
       |    COALESCE(d.n_users, 0) AS n_users
       |  FROM cal c LEFT JOIN d USING (event_date)),
       |t AS (
       |  SELECT *, AVG(n_rows) OVER (ORDER BY event_date
       |      ROWS BETWEEN $DriftWindowDays PRECEDING AND 1 PRECEDING)
       |    AS trailing_avg_rows
       |  FROM f)
       |SELECT event_date, n_rows, n_users, trailing_avg_rows,
       |  CASE WHEN trailing_avg_rows > 0
       |    THEN CAST(n_rows AS DOUBLE) / trailing_avg_rows END AS ratio,
       |  COALESCE(CASE WHEN trailing_avg_rows > 0
       |      THEN CAST(n_rows AS DOUBLE) / trailing_avg_rows END > $DriftFactor
       |    OR CASE WHEN trailing_avg_rows > 0
       |      THEN CAST(n_rows AS DOUBLE) / trailing_avg_rows END < ${1.0 / DriftFactor}
       |    OR (trailing_avg_rows = 0 AND n_rows > 0),
       |    FALSE) AS is_anomaly
       |FROM t""".stripMargin

  /** Backfill coverage calendar (key `etl_backfill_gaps`) — the
    * planner the reference's per-ds orchestration implies: its dags
    * run one `ds` slice per day and are explicitly backfill-friendly,
    * which presumes knowing WHICH days are missing. One row per
    * calendar day between the lake's first and last observed date,
    * with that day's row count and an `is_gap` flag for days with no
    * rows at all — the exact work-list a backfill scheduler consumes
    * (the reference finds this out one Airflow run at a time).
    *
    * Shape: one day-cardinality hash aggregate, a 1-row bounds
    * aggregate, the calendar exploded from that single row (bounded by
    * the day span, never by corpus size), broadcast-joined back to the
    * daily counts. */
  def backfillGaps(spark: SparkSession, dir: String): DataFrame =
    backfillGapsOn(Tables.events(spark, dir).select(to_date(col("ts")).as("event_date")))

  def backfillGapsOn(dated: DataFrame): DataFrame = {
    val daily = dated.groupBy(col("event_date")).agg(count(lit(1)).as("n_rows"))
    val cal = daily
      .agg(min(col("event_date")).as("mn"), max(col("event_date")).as("mx"))
      .select(explode(expr("sequence(mn, mx, interval 1 day)")).as("expect_date"))
    cal.join(broadcast(daily), cal("expect_date") === daily("event_date"), "left")
      .select(col("expect_date"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        col("n_rows").isNull.as("is_gap"))
  }

  val backfillGapsOracleSql: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS event_date, CAST(COUNT(*) AS BIGINT) AS n_rows
      |  FROM events GROUP BY 1),
      |b AS (SELECT MIN(event_date) AS mn, MAX(event_date) AS mx FROM d),
      |cal AS (
      |  SELECT CAST(unnest(generate_series(CAST(b.mn AS TIMESTAMP),
      |    CAST(b.mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS expect_date
      |  FROM b)
      |SELECT c.expect_date, COALESCE(d.n_rows, 0) AS n_rows,
      |  d.n_rows IS NULL AS is_gap
      |FROM cal c LEFT JOIN d ON c.expect_date = d.event_date""".stripMargin

  /** THE deterministic 32-bit key hash every sampling/packing draw is
    * built on (first 8 hex chars of md5 — engine-portable): the
    * nesting/agreement properties across sampleDeterministic /
    * sampleStratified / sampleWeighted / TrainPrep.packSequences hold
    * only while all of them share this exact construction. */
  private[graft] def keyHash32(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("bigint")

  /** Sampling percentage kept by sampleDeterministic. */
  val SamplePct = 20

  /** Deterministic hash-bucket sampling: keep rows whose md5(key)
    * bucket falls under the rate. Unlike rand()-based sample(), the
    * selection is a pure function of the key — reproducible across
    * runs, engines, partitionings, and retries, and consistent for
    * the same key across tables (the property training-data corpus
    * cuts need: re-running a pipeline selects the SAME subset). */
  def sampleDeterministic(spark: SparkSession, dir: String, pct: Int = SamplePct): DataFrame = {
    val bucket = keyHash32(col("doc_id")) % 100
    Tables.documents(spark, dir).filter(bucket < pct)
  }

  val sampleDeterministicOracleSql: String =
    s"""SELECT * FROM documents
       |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100
       |      < $SamplePct""".stripMargin

  /** Per-stratum target for sampleStratified. */
  val StratumTarget = 50

  /** Stratified deterministic sampling: draw ~`target` documents per
    * stratum (language), downsampling over-represented strata and
    * keeping under-represented ones whole — the corpus REBALANCING cut
    * a training-data pipeline makes (e.g. capping English before
    * pretraining). Selection stays a pure function of the key, like
    * [[sampleDeterministic]]: a doc is kept iff
    * `hash32(doc_id)/2^32 < target/n_stratum`, so reruns, engines, and
    * partitionings agree, and raising `target` only ever ADDS docs
    * (nested samples). The comparison runs in DECIMAL so it is exact
    * at any corpus size (hash32 × n_stratum overflows BIGINT around
    * n = 2^31 — at 100 TB that is a real, reachable bound).
    *
    * Plan shape: one tiny per-stratum count aggregate, broadcast back,
    * then a scan-bound filter — no corpus-sized shuffle. */
  def sampleStratified(spark: SparkSession, dir: String,
                       target: Int = StratumTarget): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
    docs.join(broadcast(counts), "lang")
      .filter(keyHash32(col("doc_id")).cast("decimal(19,0)") * col("__n").cast("decimal(19,0)")
        < lit(target.toLong).cast("decimal(19,0)") * lit(4294967296L).cast("decimal(19,0)"))
      .select(docs.columns.map(col): _*)
  }

  val sampleStratifiedOracleSql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS __n FROM documents GROUP BY 1)
       |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
       |FROM documents d JOIN c USING (lang)
       |WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DECIMAL(19,0))
       |        * CAST(__n AS DECIMAL(19,0))
       |      < CAST($StratumTarget AS DECIMAL(19,0)) * CAST(4294967296 AS DECIMAL(19,0))""".stripMargin

  /** Mixture weights for [[sampleWeighted]]'s driver form — the
    * source-rebalancing lever a pretraining corpus run turns
    * (upsample curated sources, downsample crawl). Sources absent
    * from the map fall back to [[DefaultMixtureWeight]]. */
  val MixtureWeights: Map[String, Double] = Map(
    "src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25)
  val DefaultMixtureWeight = 0.1

  /** Weighted source-mixture sampling: keep each document with
    * per-SOURCE probability `weights(source)` — deterministic in the
    * key like [[sampleDeterministic]] (same hash-threshold draw, so
    * reruns/engines agree and raising a weight only ADDS documents),
    * but config-driven per source rather than data-driven per stratum
    * ([[sampleStratified]] caps counts; this applies mixture rates).
    * The threshold product w·2^32 is exact in double (hash < 2^53),
    * so the comparison is engine-portable bit-for-bit.
    *
    * Plan shape: scan-bound filter, no shuffle, no aggregate. */
  def sampleWeighted(spark: SparkSession, dir: String,
                     weights: Map[String, Double] = MixtureWeights,
                     default: Double = DefaultMixtureWeight): DataFrame =
    sampleWeightedOn(Tables.documents(spark, dir), weights, default)

  def sampleWeightedOn(docs: DataFrame,
                       weights: Map[String, Double] = MixtureWeights,
                       default: Double = DefaultMixtureWeight): DataFrame = {
    val rate = weights.foldLeft(lit(default)) { case (acc, (src, wt)) =>
      when(col("source") === src, lit(wt)).otherwise(acc)
    }
    docs.filter(keyHash32(col("doc_id")).cast("double") < rate * lit(4294967296.0))
  }

  val sampleWeightedOracleSql: String = {
    val cases = MixtureWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    s"""SELECT doc_id, text, lang, source, n_chars FROM documents
       |WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
       |      < (CASE source $cases ELSE $DefaultMixtureWeight END) * 4294967296.0""".stripMargin
  }

  /** Keep-rate assigned to the LARGEST group by [[sampleTemperature]].
    * A power of two, so the `baseRate × sqrt(ratio)` product stays a
    * correctly-rounded double on every engine (sqrt and division are
    * IEEE-correctly-rounded; multiplying by 0.5 is exponent
    * arithmetic, exact). */
  val TemperatureBaseRate = 0.5

  /** Temperature (α = 0.5) mixture sampling — the multilingual-corpus
    * rebalancing scheme (sampled counts ∝ n^α instead of n, so
    * low-resource groups keep a larger share): each group's keep rate
    * is `min(1, baseRate · sqrt(n_max / n_g))`, applied with the same
    * deterministic per-key hash draw as [[sampleWeighted]] — reruns
    * and engines agree bit-for-bit, and raising baseRate only ADDS
    * documents (nested samples). α is fixed at 1/2: it is the one
    * exponent computable as a single correctly-rounded IEEE op
    * (sqrt); arbitrary pow() carries no cross-engine rounding
    * guarantee and would break the oracle contract.
    *
    * Plan shape: one group-count aggregate (group-cardinality-sized),
    * a 1-row max, rates broadcast back onto the scan — the corpus
    * itself is filtered in place, no shuffle. */
  def sampleTemperatureOn(docs: DataFrame, group: Column,
                          baseRate: Double = TemperatureBaseRate): DataFrame = {
    val counts = docs.groupBy(group.as("__g")).agg(count(lit(1)).as("__n"))
    val nMax = counts.agg(max(col("__n")).as("__nmax"))
    val rates = counts.crossJoin(broadcast(nMax))
      .withColumn("__rate", least(lit(1.0),
        lit(baseRate) * sqrt(col("__nmax").cast("double") / col("__n").cast("double"))))
      .select(col("__g"), col("__rate"))
    // null-safe group match: a null group is a group like any other —
    // an equality join would silently DROP unlabeled rows from the
    // sample instead of sampling them at their own group's rate
    docs.join(broadcast(rates), group <=> col("__g"))
      .filter(keyHash32(col("doc_id")).cast("double") < col("__rate") * lit(4294967296.0))
      .drop("__g", "__rate")
  }

  /** Driver query (key `sample_temperature`): α-sample `documents` by
    * language — the skewed column (en dominates) this scheme exists
    * to rebalance. */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame =
    sampleTemperatureOn(Tables.documents(spark, dir), col("lang"))

  val sampleTemperatureOracleSql: String =
    s"""WITH c AS (
       |  SELECT lang AS g, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1),
       |m AS (SELECT MAX(n) AS nmax FROM c),
       |r AS (
       |  SELECT g, LEAST(1.0, $TemperatureBaseRate *
       |    sqrt(CAST(m.nmax AS DOUBLE) / CAST(c.n AS DOUBLE))) AS rate
       |  FROM c CROSS JOIN m)
       |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
       |FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.g
       |WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
       |      < r.rate * 4294967296.0""".stripMargin

  /** Token budget for [[sampleMixtureEpochs]], as a multiple of the
    * corpus's own token mass — budget-relative so the planner's
    * output shape is scale-invariant (the same knob means the same
    * thing at sf0.01 and at 100 TB). */
  val MixtureBudgetFactor = 1.5
  /** Repetition ceiling: no source is repeated past 4 epochs. Public
    * data-constrained-scaling finding (Muennighoff et al. 2023):
    * up to ~4 epochs of repetition costs little vs fresh data;
    * beyond that returns decay rapidly — so the planner caps there
    * and lets the budget shortfall fall where it may. */
  val MaxMixtureEpochs = 4.0

  /** Token-budget mixture/epoch planner — the data-mixing lever a
    * pretraining run actually turns. [[sampleWeighted]] answers
    * "keep which docs"; this answers the production question "given
    * a token budget B and target mixture weights, HOW MANY TIMES
    * does each source repeat?": target tokens for source g are
    * `w_g/Σw · B`, so its epoch factor is `e_g = min(MaxEpochs,
    * (w_g/Σw · B) / tokens_g)` — over-weighted small sources repeat
    * (e_g > 1), bulk crawl subsamples (e_g < 1). The plan is then
    * MATERIALIZED deterministically: every doc emits full epochs
    * `0..⌊e_g⌋-1`, and membership in the final fractional epoch is
    * the same md5 draw every sampling operator uses
    * (`hash32(doc_id) < frac(e_g)·2^32`) — reruns and engines agree
    * bit-for-bit, and raising the budget only ADDS (doc, epoch) rows
    * (nested plans, the property that makes budget sweeps
    * comparable). Token mass is the whitespace token count (the
    * [[TextAnalysis.textTokensOn]] `n_ws_tokens` convention).
    *
    * Double discipline: Σw accumulates in DECIMAL(20,10) (exact for
    * weight literals; double fold order would be engine-dependent),
    * token sums are exact BIGINTs, and the epoch expression fixes
    * one parenthesization `((w/Σw)·(F·T))/tokens_g` — every factor
    * bit-identical across engines, so `floor`/`frac` agree too.
    *
    * Plan shape: one source-cardinality aggregate, a 1-row total,
    * epoch factors broadcast back onto the scan, then an
    * output-proportional `explode(sequence(...))` — the corpus is
    * never shuffled. At 100 TB the repeated epochs are a VIEW (zero
    * storage until the packer consumes them), and the epoch column
    * is exactly the repeat-disambiguator the sequence packer needs
    * to keep repeated instances in distinct training positions. */
  def sampleMixtureEpochsOn(docs: DataFrame,
                            weights: Map[String, Double] = MixtureWeights,
                            default: Double = DefaultMixtureWeight,
                            budgetFactor: Double = MixtureBudgetFactor,
                            maxEpochs: Double = MaxMixtureEpochs): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(graft.functions.TextHashing.words(col("text"))).cast("long").as("__ntok"))
    val wcol = weights.foldLeft(lit(default)) { case (acc, (src, wt)) =>
      when(col("source") === src, lit(wt)).otherwise(acc)
    }
    val perSource = toks.groupBy(col("source")).agg(sum(col("__ntok")).as("__gt"))
      .withColumn("__w", wcol)
    val totals = perSource.agg(
      sum(col("__w").cast("decimal(20,10)")).cast("double").as("__sw"),
      sum(col("__gt")).as("__tt"))
    val epochs = perSource.crossJoin(broadcast(totals))
      .withColumn("__ep", least(lit(maxEpochs),
        ((col("__w") / col("__sw")) * (lit(budgetFactor) * col("__tt").cast("double")))
          / col("__gt").cast("double")))
      .select(col("source"), col("__ep"))
    docs.join(broadcast(epochs), "source")
      .select(col("doc_id"), col("source"), col("__ep"),
        explode(sequence(lit(0), floor(col("__ep")).cast("int"))).as("epoch"))
      .filter(col("epoch") < floor(col("__ep")) ||
        keyHash32(col("doc_id")).cast("double")
          < (col("__ep") - floor(col("__ep"))) * lit(4294967296.0))
      .select(col("doc_id"), col("source"), col("epoch").cast("int").as("epoch"))
  }

  /** Driver query (key `sample_mixture_epochs`). */
  def sampleMixtureEpochs(spark: SparkSession, dir: String): DataFrame =
    sampleMixtureEpochsOn(graft.sources.Tables.documents(spark, dir))

  val sampleMixtureEpochsOracleSql: String = {
    val caseArms = MixtureWeights.toSeq.sortBy(_._1).map { case (s, w) =>
      s"WHEN '$s' THEN CAST('$w' AS DOUBLE)"
    }.mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
       |  FROM documents),
       |g AS (SELECT source, SUM(ntok) AS gt FROM t GROUP BY 1),
       |gw AS (SELECT source, gt,
       |  CASE source $caseArms
       |    ELSE CAST('$DefaultMixtureWeight' AS DOUBLE) END AS w
       |  FROM g),
       |n AS (SELECT CAST(SUM(CAST(w AS DECIMAL(20,10))) AS DOUBLE) AS sw,
       |             SUM(gt) AS tt FROM gw),
       |e AS (SELECT source, LEAST(CAST('$MaxMixtureEpochs' AS DOUBLE),
       |    ((w / n.sw) * (CAST('$MixtureBudgetFactor' AS DOUBLE) * CAST(n.tt AS DOUBLE)))
       |      / CAST(gt AS DOUBLE)) AS ep
       |  FROM gw CROSS JOIN n),
       |idx AS (SELECT unnest(generate_series(0, ${MaxMixtureEpochs.toInt})) AS epoch)
       |SELECT d.doc_id, d.source, CAST(i.epoch AS INTEGER) AS epoch
       |FROM documents d
       |JOIN e USING (source)
       |JOIN idx i ON i.epoch <= CAST(floor(e.ep) AS BIGINT)
       |WHERE i.epoch < floor(e.ep)
       |   OR CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
       |      < (e.ep - floor(e.ep)) * 4294967296.0""".stripMargin
  }

  /** Permille fences for [[sampleHoldoutSplit]]: buckets 0-799 train,
    * 800-899 validation, 900-999 test. */
  val TrainPermille = 800
  val ValPermille = 900

  /** Deterministic held-out split assignment: every document gets a
    * train/val/test label as a pure function of its key — the
    * split-versioning contract an evaluation pipeline needs. Because
    * the assignment is `keyHash32(doc_id) mod 1000` against fixed
    * fences (not a rand() draw, not a row-position modulus), it is
    * stable under corpus GROWTH: ingesting tomorrow's documents never
    * migrates today's doc across the train/test fence, so a model
    * trained on yesterday's train split is still honestly evaluated
    * on today's test split. Same md5 hash family as the sampling
    * operators, so one draw system governs every selection decision
    * in the corpus pipeline (a doc sampled by [[sampleDeterministic]]
    * keeps its split label in the sample).
    *
    * Plan shape: scan-bound projection — no shuffle, no aggregate,
    * no state; at 100 TB this is a free column on the ingest pass.
    * `split_bucket` rides along so downstream re-fencing (e.g.
    * carving val into val+calibration) needs no re-hash. */
  def sampleHoldoutSplitOn(docs: DataFrame, key: Column): DataFrame =
    docs
      .withColumn("split_bucket", keyHash32(key) % 1000)
      .withColumn("split",
        when(col("split_bucket") < TrainPermille, lit("train"))
          .when(col("split_bucket") < ValPermille, lit("val"))
          .otherwise(lit("test")))

  /** Driver query (key `sample_holdout_split`). */
  def sampleHoldoutSplit(spark: SparkSession, dir: String): DataFrame =
    sampleHoldoutSplitOn(Tables.documents(spark, dir), col("doc_id"))
      .select("doc_id", "source", "split_bucket", "split")

  val sampleHoldoutSplitOracleSql: String =
    s"""SELECT doc_id, source,
       |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000 AS BIGINT)
       |    AS split_bucket,
       |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000 < $TrainPermille THEN 'train'
       |       WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000 < $ValPermille THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Per-source document cap for [[sampleCapPerSource]]. */
  val SourceCap = 10

  /** Hard per-source cap: keep at most `cap` documents per source,
    * chosen deterministically by (hash, doc_id) order — the
    * "no single domain dominates the corpus" guard a crawl pipeline
    * applies before mixing (the cap analogue of
    * [[sampleStratified]]'s proportional draw; a cap is the right
    * tool when the contract is an exact per-group budget, e.g. at
    * most N pages per registered domain).
    *
    * Selection is a pure function of the keys: the kept set is stable
    * across reruns, engines, and partitionings, and raising `cap`
    * only ever ADDS documents (the hash order is fixed, a bigger cap
    * keeps a superset — same nesting property as the sampling family).
    *
    * Plan shape: one Exchange on `source` + a per-group TopK. Spark
    * plans `rank <= cap` windows as WindowGroupLimit (a streaming
    * top-K per group, no full sort spill) before the filter. At 100 TB
    * the shuffle carries ONLY (source, hash, doc_id) — the projection
    * below keeps wide columns out of the Exchange and joins them back
    * by doc_id; with millions of distinct sources the Exchange is
    * uniform and AQE splits any megadomain skew. */
  def sampleCapPerSourceOn(docs: DataFrame, cap: Int = SourceCap): DataFrame = {
    // rank over the narrow projection; wide columns (text) rejoin by
    // key so the window shuffle moves ~20 bytes/row, not documents
    val keep = docs.select(col("doc_id"), col("source"))
      .withColumn("__h", keyHash32(col("doc_id")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("__h"), col("doc_id"))))
      .filter(col("__rk") <= cap)
      .select(col("doc_id"))
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Driver query over `documents` (key `sample_cap_per_source`). */
  def sampleCapPerSource(spark: SparkSession, dir: String): DataFrame =
    sampleCapPerSourceOn(Tables.documents(spark, dir))

  val sampleCapPerSourceOracleSql: String =
    s"""SELECT doc_id, text, lang, source, n_chars FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY source
       |    ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT),
       |             doc_id) AS __rk
       |  FROM documents) t
       |WHERE __rk <= $SourceCap""".stripMargin

  /** Numerator of the kept fraction for [[sampleQualityTopFrac]]
    * (pct/100 — an exact rational, never a float threshold). */
  val TopFracPct = 20

  /** Per-group TOP-FRACTION selection by a score column — "keep the
    * best `pctNum`% of each source by quality" (the
    * quality-percentile pruning step of DCLM/FineWeb-style curation,
    * where a fixed global threshold would gut low-scoring domains and
    * a per-domain CAP ignores how much good data a domain has).
    *
    * Exact contract: per group, keep the `ceil(pctNum% · n_g)` rows
    * ranked first by (score DESC NULLS LAST, id ASC) — integer quota
    * math (`(n·pct + 99) div 100`), engine-portable; raising the
    * percentage only ADDS rows (nested, the sampling-family
    * property). NULL scores count toward n_g and are drawn (id ASC)
    * only once the group's non-null rows are exhausted — both this
    * form and the continuous twin below.
    *
    * Scale shape — the naive form is a `row_number() OVER (PARTITION
    * BY group ORDER BY score)` window over the CORPUS: with few
    * groups (the usual case: sources/dumps/languages) one group's
    * entire data sorts in one task. This form never ranks raw rows:
    *
    *  1. histogram: one (group, score)-keyed count agg — map-side
    *     partials collapse duplicate scores, and quality scores are
    *     ratios of small integer counts, so the histogram is
    *     collision-heavy and orders of magnitude under corpus size;
    *  2. per-group running counts over THAT bounded frame (window
    *     partitions = distinct scores per group, not rows) derive a
    *     per-(group, score) verdict: fully kept, partially kept (the
    *     threshold score, with its residual quota), or dropped;
    *  3. rows join the verdict on (group, score); the only row-level
    *     window ranks WITHIN one (group, score) tie cell to apply the
    *     residual quota — tie-cell-sized partitions, uniform.
    *
    * For genuinely continuous scores (histogram ≈ corpus) the right
    * pre-step is the iterative per-group threshold refinement the
    * exact-quantiles operator implements (Quantiles.scala) — same
    * verdict join afterwards; this operator's contract targets the
    * discrete-score regime every counting-based quality metric lives
    * in. */
  def sampleQualityTopFracOn(scored: DataFrame, group: Column, score: Column,
                             id: Column, pctNum: Int = TopFracPct): DataFrame = {
    // pct 0 would keep nothing here but the continuous twin's probe
    // collapse assumed quota==0 means "no non-null scores" — the two
    // variants must stay output-identical, so both reject it (r14
    // advice); pct 100 keeps everything, still a valid draw
    require(pctNum >= 1 && pctNum <= 100,
      s"top-frac pct must be in 1..100, got $pctNum")
    val base = scored.select(group.as("__g"), score.as("__s"), id.as("__id"))
    val hist = base.groupBy(col("__g"), col("__s")).agg(count(lit(1)).as("__cnt"))
    val totals = hist.groupBy(col("__g")).agg(sum(col("__cnt")).as("__n"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val verdict = hist.join(totals, "__g")
      .withColumn("__quota", expr(s"(__n * $pctNum + 99) div 100"))
      .withColumn("__cum", sum(col("__cnt")).over(wRun))
      .withColumn("__cum_excl", col("__cum") - col("__cnt"))
      // kept fully (cum <= quota) or partially (threshold score)
      .where(col("__cum_excl") < col("__quota"))
      .withColumn("__tie_quota",
        least(col("__quota"), col("__cum")) - col("__cum_excl"))
      .select(col("__g"), col("__s"), col("__tie_quota"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__s")).orderBy(col("__id"))
    // null-SAFE score match: a NULL score forms its own histogram cell
    // (groupBy keeps it; `desc` sorts it last, exactly the contract's
    // nulls-last rank), so the verdict row for that cell must find its
    // way back to the rows — plain EqualTo would silently drop every
    // null-score row even when the quota reaches into them
    val keptIds = base.join(
        verdict.select(col("__g").as("__vg"), col("__s").as("__vs"),
          col("__tie_quota")),
        col("__g") <=> col("__vg") && col("__s") <=> col("__vs"))
      .withColumn("__rk", row_number().over(wTie))
      .where(col("__rk") <= col("__tie_quota"))
      .select(col("__id"))
    scored.join(keptIds, id === col("__id"), "left_semi")
  }

  /** CONTINUOUS-SCORE regime of [[sampleQualityTopFracOn]] (r13
    * verdict item 7): same exact contract — per group keep the
    * `ceil(pct%·n_g)` rows first by (score DESC, id ASC) — for score
    * domains where the (group, score) histogram is corpus-sized and
    * the discrete form's verdict frame stops being "bounded". The
    * documented composition with the exact-quantiles refinement
    * (Quantiles.scala), executed:
    *
    *  1. scores map order-preservingly to LONG ticks
    *     (`sortable_double_bits`, a bijection on non-NaN doubles —
    *     tie cells in tick space ARE tie cells in score space), with
    *     `+ 0.0` first so -0.0 and +0.0 share a cell;
    *  2. ONE multi-probe histogram refinement (the
    *     [[Quantiles.exactTickQuantiles]] recipe, generalized to one
    *     probe per group with a group-membership gate) finds each
    *     group's threshold tick — the quota-th largest — in
    *     ceil(log_Bins(span)) shared scans whose shuffle is
    *     groups×Bins counters, never corpus rows;
    *  3. rows strictly above their group's threshold are kept
    *     outright; the only row-level window ranks INSIDE the
    *     threshold tie cell by id to apply the residual quota —
    *     exactly the discrete form's tie handling.
    *
    * Driver-side state is coordination-sized: |groups| head rows +
    * groups×Bins counters per round (the few-groups premise both
    * variants share — sources/dumps/languages). The span guard only
    * rejects domains whose TICK span overflows the long bin
    * arithmetic (needs ticks spanning nearly the full ±1.8e308 double
    * range — any bounded, mixed-sign, or ratio-like score fits).
    * NULL scores sort LAST under the contract's (score DESC, id ASC)
    * — exactly the discrete twin — drawn only once a group's non-null
    * side is exhausted. Spec-equated to the discrete form — identical
    * output rows, including planted cross-threshold ties and
    * null-score rows — on a corpus-sized-histogram fixture. */
  def sampleQualityTopFracContinuousOn(scored: DataFrame, group: Column,
                                       score: Column, id: Column,
                                       pctNum: Int = TopFracPct): DataFrame = {
    // same domain guard as the discrete twin: with pctNum == 0 every
    // group's quota is 0 and the quotaNN==0 probe collapse below —
    // whose contract is "the group has NO non-null scores" — would
    // instead keep every positive-tick row (r14 advice)
    require(pctNum >= 1 && pctNum <= 100,
      s"top-frac pct must be in 1..100, got $pctNum")
    val spark = scored.sparkSession
    import spark.implicits._
    // ONE narrow staged projection (the knnGraphOn precedent): the
    // caller's scoring pipeline would otherwise re-run for the heads
    // pass, every refinement round, and the verdict branches below —
    // ~10 executions of e.g. a full-text quality composite. A null
    // score stays a null tick (the expression is null-intolerant).
    val base = Scratch.stageReuse(
      scored.select(group.cast("string").as("__g"),
        call_function("sortable_double_bits", score.cast("double") + lit(0.0)).as("__t"),
        id.as("__id")),
      "topfrac_cont_base")
    val heads = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), count(col("__t")).as("nn"),
        min(col("__t")).as("mn"), max(col("__t")).as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3),
        if (r.isNullAt(4)) 0L else r.getLong(4)))
    if (heads.isEmpty) return scored.limit(0)
    val bins = Quantiles.Bins
    heads.foreach { case (g, _, nn, mn, mx) =>
      require(nn == 0L || (
        try Math.subtractExact(mx, mn) <= Long.MaxValue - 2L * bins
        catch { case _: ArithmeticException => false }),
        s"score tick span for group '$g' overflows the refinement's " +
          "long bin arithmetic — rescale the score domain")
    }
    case class GProbe(g: String, k: Long, lo: Long, hi: Long,
                      below: Long, quota: Long, nullKeep: Long)
    var probes = heads.map { case (g, n, nn, mn, mx) =>
      val quota = (n * pctNum + 99) / 100
      // nulls fill the quota only after every non-null row (the
      // DESC-nulls-last contract); quotaNN == 0 ⟺ the group has no
      // non-null scores — collapse its probe to an empty range
      val nullKeep = math.max(0L, quota - nn)
      val quotaNN = quota - nullKeep
      if (quotaNN == 0L) GProbe(g, 0L, 0L, 0L, 0L, 0L, nullKeep)
      else GProbe(g, nn - quotaNN + 1, mn, mx, 0L, quotaNN, nullKeep)
    }.toSeq
    var rounds = 0
    while (probes.exists(p => p.lo < p.hi)) {
      rounds += 1
      require(rounds <= 12, s"topfrac refinement did not converge: $probes")
      val live = probes.filter(p => p.lo < p.hi)
      val cells: Column = array(live.map { p =>
        val width = (p.hi - p.lo + bins) / bins
        struct(lit(p.g).as("q"),
          when(col("__g") === p.g && col("__t").between(p.lo, p.hi),
            expr(s"(__t - ${p.lo}L) div ${width}L")).otherwise(lit(-1L)).as("b"))
      }: _*)
      val coarseLo = live.map(_.lo).min
      val coarseHi = live.map(_.hi).max
      val hist = base
        .filter(col("__t").between(coarseLo, coarseHi))
        .select(explode(cells).as("pb"))
        .filter(col("pb.b") >= 0)
        .groupBy(col("pb.q").as("q"), col("pb.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
      probes = probes.map { p =>
        if (p.lo >= p.hi) p
        else {
          val width = (p.hi - p.lo + bins) / bins
          val counts = hist.getOrElse(p.g, Array.empty[org.apache.spark.sql.Row])
            .map(r => r.getLong(1) -> r.getLong(2)).toMap
          var cum = p.below
          var b = 0L
          var found = -1L
          while (found < 0 && b < bins) {
            val c = counts.getOrElse(b, 0L)
            if (cum + c >= p.k) found = b else { cum += c; b += 1 }
          }
          require(found >= 0,
            s"rank ${p.k} not reachable in [${p.lo},${p.hi}] for group ${p.g}")
          val lo2 = p.lo + found * width
          val hi2 = math.min(p.hi, lo2 + width - 1)
          if (width == 1) GProbe(p.g, p.k, lo2, lo2, cum, p.quota, p.nullKeep)
          else GProbe(p.g, p.k, lo2, hi2, cum, p.quota, p.nullKeep)
        }
      }
    }
    // hint only at use sites where the hinted side is the BUILD side:
    // a hinted thr as the LEFT of the left-outer resid join below
    // would draw a HintErrorLogger warning (build-left unsupported)
    val thr = probes.map(p => (p.g, p.lo, p.quota))
      .toDF("__g", "__thr", "__quota")
    val joined = base.join(broadcast(thr), "__g")
    val nAbove = joined.where(col("__t") > col("__thr"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__na"))
    val resid = broadcast(thr.join(nAbove, Seq("__g"), "left")
      .select(col("__g"),
        (col("__quota") - coalesce(col("__na"), lit(0L))).as("__resid")))
    val keptAbove = joined.where(col("__t") > col("__thr")).select(col("__id"))
    val wTie = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__id"))
    val keptTies = joined.where(col("__t") === col("__thr"))
      .join(resid, "__g")
      .withColumn("__rk", row_number().over(wTie))
      .where(col("__rk") <= col("__resid"))
      .select(col("__id"))
    // null-score rows fill any residual quota a group's non-null side
    // could not cover (all comparisons above drop null ticks), by the
    // same id-ASC tie rule
    val nullKeep = broadcast(probes.filter(_.nullKeep > 0L)
      .map(p => (p.g, p.nullKeep)).toDF("__g", "__nullkeep"))
    val keptNulls = base.where(col("__t").isNull)
      .join(nullKeep, "__g")
      .withColumn("__rk", row_number().over(wTie))
      .where(col("__rk") <= col("__nullkeep"))
      .select(col("__id"))
    scored.join(keptAbove.unionAll(keptTies).unionAll(keptNulls),
      id === col("__id"), "left_semi")
  }

  /** Driver query (key `sample_quality_topfrac`): top [[TopFracPct]]%
    * of each source by the [[TextAnalysis.qualityScore]] composite. */
  def sampleQualityTopFrac(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"))
    sampleQualityTopFracOn(scored,
      group = col("source"), score = col("quality_score"), id = col("doc_id"))
  }

  /** Driver query (key `sample_topfrac_continuous`): the SAME corpus,
    * contract, and oracle as `sample_quality_topfrac`, executed by the
    * continuous-score refinement variant — the two keys sharing one
    * oracle SQL is the point (the variants are output-identical by
    * contract, and the driver gate now checks that cross-engine, not
    * just the spec's fixture). */
  def sampleQualityTopFracContinuous(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"))
    sampleQualityTopFracContinuousOn(scored,
      group = col("source"), score = col("quality_score"), id = col("doc_id"))
  }

  // oracle = the per-group rank formulation the verdict join replaces
  // (different algorithm, same rows — the skyline precedent)
  val sampleQualityTopFracOracleSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, source,
       |  ${TextAnalysis.qualityScoreSqlExpr("text")} AS quality_score
       |  FROM documents
       |), n AS (
       |  SELECT source, COUNT(*) AS n FROM q GROUP BY 1
       |), r AS (
       |  SELECT doc_id, source, quality_score, ROW_NUMBER() OVER (
       |    PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rk
       |  FROM q
       |)
       |SELECT r.doc_id, r.source, r.quality_score
       |FROM r JOIN n ON r.source = n.source
       |WHERE r.rk <= (n.n * $TopFracPct + 99) // 100""".stripMargin

  /** SCD type-2 state history over the event log: each user's
    * `event_type` transitions become validity intervals
    * [eff_start, eff_end) with an `is_current` flag — the
    * full-history counterpart of [[keepLatest]]'s last-state-only
    * upsert (reference: upsert_l2_for_ds.sql keeps rn=1; SCD2 keeps
    * every rn with its validity window). See [[Merge.scd2]] for the
    * one-shuffle plan shape. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    Merge.scd2(
      Tables.events(spark, dir).select(
        col("user_id"), col("event_type"), col("ts"), col("event_id")),
      keys = Seq(col("user_id")),
      stateCol = col("event_type"),
      orderCol = col("ts"), tiebreak = col("event_id"))
      .select(col("user_id"), col("event_type").as("state"),
        col("eff_start"), col("eff_end"), col("is_current"))

  // first-row detect via rn=1 + IS DISTINCT FROM: mirrors Merge.scd2's
  // explicit row_number + null-safe state compare (consecutive null
  // states collapse into one interval; null→non-null is a change).
  val scd2OracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    LAG(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |c AS (
      |  SELECT user_id, event_type, ts, event_id FROM e
      |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      |SELECT user_id, event_type AS state, ts AS eff_start,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_end,
      |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current
      |FROM c""".stripMargin

  /** The tombstone op for [[cdcApply]]'s driver mapping: an `error`
    * event is read as the account-closed signal for its user. */
  val CdcDeleteType = "error"

  /** CDC → SCD2 composition (key `etl_cdc_scd2`): the event log read
    * as a tombstone-bearing change feed ([[cdcApply]]'s mapping)
    * applied into FULL validity-interval history
    * ([[Merge.scd2Changelog]]) — where [[cdcApply]] answers "what is
    * each user's state now" and [[scd2History]] answers "what states
    * did each user pass through", this answers both at once under
    * deletes: an [[CdcDeleteType]] event closes the user's open
    * interval (no `is_current` row survives a trailing delete), and a
    * post-delete re-observation opens a fresh interval even for an
    * unchanged state. Same one-shuffle window plan as `etl_scd2`. */
  def cdcScd2(spark: SparkSession, dir: String): DataFrame =
    Merge.scd2Changelog(
        Tables.events(spark, dir).select(
          col("user_id"), col("event_type"), col("ts"), col("event_id")),
        keys = Seq(col("user_id")),
        stateCol = col("event_type"),
        orderCol = col("ts"), tiebreak = col("event_id"),
        opCol = col("event_type"), deleteOp = CdcDeleteType)
      .select(col("user_id"), col("event_type").as("state"),
        col("eff_start"), col("eff_end"), col("is_current"))

  // the SCD2 oracle's own CTE chain with the delete runs dropped
  // AFTER the interval windows (so a delete still closes its
  // predecessor and still separates two same-state runs) — the
  // engine's struct fold is injective on event_type, so change points
  // agree run-for-run with the plain state comparison here
  val cdcScd2OracleSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |    LAG(event_type) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS prev,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |c AS (
       |  SELECT user_id, event_type, ts, event_id FROM e
       |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
       |iv AS (
       |  SELECT user_id, event_type AS state, ts AS eff_start,
       |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_end,
       |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |      AS is_current
       |  FROM c)
       |SELECT user_id, state, eff_start, eff_end, is_current
       |FROM iv WHERE state IS DISTINCT FROM '$CdcDeleteType'""".stripMargin

  /** Point-in-time SCD2 ENRICHMENT (key `etl_scd2_enrich`): the
    * other half of the SCD2 contract — [[cdcScd2]] BUILDS validity
    * intervals, this READS them to answer "what state was the key in
    * when this fact happened", the temporal dimension join every
    * lakehouse star schema needs (Delta/Iceberg "join the dimension
    * AS OF the fact's timestamp"). Driver shape: purchase events are
    * the facts; the change feed is every NON-purchase event (the
    * user's browsing state, with [[CdcDeleteType]] tombstones), so
    * each purchase is stamped with what the user was doing when they
    * bought. A purchase before the user's first observed state, or
    * inside a deleted span (the tombstone closed the interval, no
    * re-insert yet), reads NULL — the honest as-of answer, via the
    * left join.
    *
    * Plan shape: the interval build is the one-shuffle [[cdcScd2]]
    * window pass; the enrich is an EQUI-join on the key with the
    * half-open containment (`eff_start <= ts < eff_end`, null-open
    * current) as a join filter — per-key intervals are
    * change-count-bounded, so the join is a plain hash join on
    * user_id, no range binning needed. ≤1 interval covers any ts
    * (intervals partition the key's timeline), so output is
    * fact-sized. A key whose history is pathologically hot would use
    * the binned [[RangeJoin.qIntervalJoin]] shape instead; serving
    * the STREAMING lake is the same join against
    * [[graft.streaming.Streams.readScd2]]. */
  def scd2Enrich(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hist = Merge.scd2Changelog(
        ev.filter(col("event_type") =!= lit("purchase"))
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
        keys = Seq(col("user_id")),
        stateCol = col("event_type"),
        orderCol = col("ts"), tiebreak = col("event_id"),
        opCol = col("event_type"), deleteOp = CdcDeleteType)
      .select(col("user_id").as("h_user_id"), col("event_type").as("state"),
        col("eff_start"), col("eff_end"))
    ev.filter(col("event_type") === lit("purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .join(hist,
        col("user_id") === col("h_user_id") &&
          col("ts") >= col("eff_start") &&
          (col("eff_end").isNull || col("ts") < col("eff_end")),
        "left")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("state").as("state_asof"))
  }

  // the cdcScd2 oracle chain re-rooted on the non-purchase feed,
  // then the half-open containment left join
  val scd2EnrichOracleSql: String =
    s"""WITH ch AS (
       |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
       |    LAG(event_type) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS prev,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events WHERE event_type <> 'purchase'),
       |c AS (
       |  SELECT user_id, event_type, ts, event_id FROM ch
       |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
       |iv AS (
       |  SELECT user_id, event_type AS state, ts AS eff_start,
       |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_end
       |  FROM c),
       |hist AS (
       |  SELECT * FROM iv WHERE state IS DISTINCT FROM '$CdcDeleteType'),
       |f AS (
       |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
       |  FROM events WHERE event_type = 'purchase')
       |SELECT f.event_id, f.user_id, f.ts, f.value, h.state AS state_asof
       |FROM f LEFT JOIN hist h ON f.user_id = h.user_id
       |  AND f.ts >= h.eff_start
       |  AND (h.eff_end IS NULL OR f.ts < h.eff_end)""".stripMargin

  /** CDC changelog apply (key `etl_cdc_apply`): the event log read as
    * a change feed over the per-user profile row — each event is an
    * upsert of that user's latest state, except [[CdcDeleteType]]
    * events, which are tombstones. The snapshot keeps, per user, the
    * latest change by (ts, event_id) unless that change is a delete —
    * exactly what applying a Postgres logical-decoding feed to the L2
    * zone means (the reference reloads L1 per ds instead because its
    * feed is upsert-only; see [[Merge.applyChangelog]]).
    *
    * Plan shape: one shuffle on user_id + one window pass; the
    * tombstone filter touches only the one surviving row per key. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame =
    Merge.applyChangelog(
        Tables.events(spark, dir),
        keys = Seq(col("user_id")),
        orderCol = col("ts"), tiebreak = col("event_id"),
        opCol = col("event_type"), deleteOp = CdcDeleteType)
      .select("user_id", "event_id", "ts", "event_type", "value")

  // IS DISTINCT FROM, not <>: the operator's contract keeps a NULL op
  // as an upsert (Merge.applyChangelog's null-safe tombstone filter);
  // a bare <> would evaluate NULL and silently drop such rows here
  val cdcApplyOracleSql: String =
    s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events) t
       |WHERE rn = 1 AND event_type IS DISTINCT FROM '$CdcDeleteType'""".stripMargin

  /** Source timezone for normalizeTz — the reference pipeline's own
    * data locale (open-meteo Jakarta extracts). Deliberately DST-free
    * so the oracle comparison is tz-database-independent; DST edge
    * policy is specified against America/New_York in EtlSpec. */
  val SourceTz = "Asia/Jakarta"

  /** Timezone-aware normalize: interpret the source's NAIVE wall-clock
    * timestamp as local time in `srcTz` and derive the true UTC
    * instant, keeping the local calendar fields that partition and
    * roll up by "the source's day/hour" (the reference localizes
    * tz-naive API timestamps the same way —
    * normalize_open_meteo_to_parquet.py:63-64).
    *
    * DST edge policy (java.time resolution, asserted in EtlSpec):
    * wall times inside a spring-forward GAP shift forward by the gap
    * width — identical to the reference's `nonexistent=
    * "shift_forward"`; AMBIGUOUS fall-back times resolve
    * deterministically to the EARLIER offset (the reference maps them
    * to NaT and drops them — we keep a deterministic instant instead,
    * because silently nulling rows fails the pipeline's own null-key
    * DQ gate downstream).
    *
    * Scale note: pure per-row projection, no shuffle; the tz rules are
    * a JVM-local table lookup inside codegen. */
  def normalizeTz(spark: SparkSession, dir: String, srcTz: String = SourceTz): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      col("ts").as("ts_local"),
      to_utc_timestamp(col("ts"), srcTz).as("ts_utc"),
      to_date(col("ts")).as("local_date"),
      hour(col("ts")).as("local_hour"),
      col("user_id"),
      col("event_type"),
      col("value"),
      lit(srcTz).as("source_tz"))

  val normalizeTzOracleSql: String =
    s"""SELECT event_id,
       |  CAST(ts AS TIMESTAMP) AS ts_local,
       |  CAST(timezone('UTC', timezone('$SourceTz', CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS ts_utc,
       |  CAST(ts AS DATE) AS local_date,
       |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS local_hour,
       |  user_id, event_type, value,
       |  '$SourceTz' AS source_tz
       |FROM events""".stripMargin

  /** Per-`ds` incremental slice: the reference's whole DAG runs one
    * `ds` partition at a time (backfill-safe). The date filter is a
    * parquet-pushable predicate; combined with the dynamic-overwrite
    * sink (Sinks.writePartitioned) a same-`ds` rerun is idempotent —
    * see EtlSpec. */
  def incrementalDs(spark: SparkSession, dir: String, ds: String = IncrementalDs): DataFrame =
    normalize(spark, dir).filter(col("event_date") === lit(ds).cast("date"))

  val incrementalDsOracleSql: String =
    s"""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
       |  CAST(ts AS DATE) AS event_date,
       |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour,
       |  user_id, event_type, value,
       |  TRY_CAST(json_extract_string(props, '$$.k') AS INTEGER) AS prop_k,
       |  'events' AS source, '$LoadDs' AS load_ds
       |FROM events
       |WHERE CAST(ts AS DATE) = DATE '$IncrementalDs'""".stripMargin

  /** Reference coordinates stamped on array-normalized rows (the
    * extract config's latitude/longitude — Jakarta, consistent with
    * [[SourceTz]]; the reference passes these through from config to
    * constant columns, normalize_open_meteo_to_parquet.py:68-69). */
  val RefLat = -6.2
  val RefLon = 106.8167

  /** Wire format for observation times inside array payloads:
    * ISO-8601 'T' separator at microsecond precision (the events
    * table's native resolution — a coarser format would silently
    * truncate and break the raw-zone "re-runnable verbatim" property). */
  private val TimeFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** Hourly-array payloads: ONE JSON document per calendar date
    * carrying two PARALLEL arrays (`hourly.time`,
    * `hourly.temperature_2m`) — the exact wire shape the reference's
    * extract stage lands in the raw zone and its normalize stage reads
    * back as parallel lists (normalize_open_meteo_to_parquet.py:47-50).
    * Derived deterministically from the events table (sorted
    * collect_list, total order via the unique event_id tiebreak) so
    * the DuckDB oracle can re-derive byte-identical payloads.
    *
    * Scale note: one shuffle on the payload key (`ds`); payload size
    * is bounded by a day's observations per source — the reference's
    * own per-ds sharding contract. */
  def arrayPayloads(spark: SparkSession, dir: String): DataFrame =
    arrayPayloadsOn(Tables.events(spark, dir))

  /** Generic form: any frame with (ts, event_id, value). The ONE
    * encoder for the hourly-array wire format — tests exercise this
    * exact production path so format drift cannot hide. */
  def arrayPayloadsOn(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("ds"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("value")))).as("obs"))
      .select(col("ds").cast("string").as("ds"),
        to_json(struct(struct(
          transform(col("obs"), o => date_format(o.getField("ts"), TimeFmt)).as("time"),
          transform(col("obs"), o => o.getField("value")).as("temperature_2m")
        ).as("hourly"))).as("payload"))

  /** Parallel-array explode normalize — the reference's literal
    * raw→staging transform (normalize_open_meteo_to_parquet.py:47-96):
    * parse a JSON payload carrying two parallel arrays, DQ-GATE the
    * shape (unequal lengths / missing arrays / zero rows / all-NaN
    * metric each fail the run, matching the script's ValueError gates
    * at :55, :91, :93), then `arrays_zip` + `explode` to one typed row
    * per array element with derived date/hour and constant
    * lat/lon/tz/load metadata.
    *
    * The gates are per-payload ROW-LEVEL expressions inside the
    * projection that feeds the explode — codegen'd, no driver action,
    * and impossible to optimize away (the zip itself is the `otherwise`
    * branch). Scale shape: parse + explode is a narrow per-row
    * generator, no shuffle. */
  def normalizeArrays(payloads: DataFrame,
                      latitude: Double = RefLat, longitude: Double = RefLon,
                      timezone: String = SourceTz,
                      source: String = "events-hourly"): DataFrame = {
    val parsed = payloads.select(col("ds"),
      from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "hourly STRUCT<time: ARRAY<STRING>, temperature_2m: ARRAY<DOUBLE>>"),
        Map.empty[String, String]).as("p"))
      .select(col("ds"),
        col("p.hourly.time").as("times"),
        col("p.hourly.temperature_2m").as("temps"))
    val nTime = size(col("times"))
    val nTemp = size(col("temps"))
    val gatedZip =
      when(col("times").isNull || col("temps").isNull,
        raise_error(concat(lit("Malformed hourly payload for ds="), col("ds"))))
      .when(nTime =!= nTemp,
        raise_error(concat(lit("Length mismatch hourly arrays: time="),
          nTime.cast("string"), lit(" vs temp="), nTemp.cast("string"))))
      .when(nTime === 0,
        raise_error(lit("No hourly rows produced from payload.")))
      .when(size(filter(col("temps"), t => t.isNotNull && !t.isNaN)) === 0,
        raise_error(lit("All temperature_c values are NaN.")))
      .otherwise(arrays_zip(col("times"), col("temps")))
    parsed
      .select(col("ds"), explode(gatedZip).as("z"))
      // per-ELEMENT gate: an unparseable time string fails the run
      // loudly regardless of spark.sql.ansi.enabled (the reference's
      // pandas parse raises; a silent ts=null row would ship corrupt
      // staging data under ansi=false)
      .select(col("ds"), col("z.times").as("__t"), col("z.temps").as("temperature_c"),
        coalesce(try_to_timestamp(col("z.times"), lit(TimeFmt)),
          raise_error(concat(lit("Unparseable hourly time: "), col("z.times"))))
          .as("ts"))
      .select(
        col("ts"),
        substring(col("__t"), 1, 10).as("date"),
        hour(col("ts")).as("hour"),
        lit(latitude).as("latitude"),
        lit(longitude).as("longitude"),
        lit(timezone).as("timezone"),
        col("temperature_c"),
        col("ds").as("load_ds"),
        lit(source).as("source"))
  }

  // The oracle re-derives the payload lists (same total order), zips
  // them positionally with unnest — DuckDB's multi-unnest zips — and
  // re-derives the typed columns. Pairing needs each engine to use ONE
  // consistent order for both lists; the shared (ts, event_id) order
  // also makes it cross-engine deterministic.
  /** Snapshot-diff driver key (`etl_snapshot_diff`): the churn report
    * between the keep-latest state as of a mid-month watermark and the
    * current one — which (user, event_type) keys appeared, and whose
    * latest row advanced. See [[Merge.snapshotDiff]] for the generic
    * contract; with an append-only source old ⊆ new, so `removed`
    * can't occur here (it exists for the general two-publication
    * reconciliation). Output is churn-sized: unchanged keys drop
    * inside the diff, before anything downstream. */
  val SnapshotCutoff = "2024-01-16 00:00:00"

  def etlSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def snap(df: DataFrame): DataFrame =
      Merge.keepLatest(df, keys = Seq(col("user_id"), col("event_type")),
        orderCol = col("ts"), tiebreak = col("event_id"))
    val oldSnap = snap(ev.where(col("ts") < lit(SnapshotCutoff).cast("timestamp")))
    val newSnap = snap(ev)
    Merge.snapshotDiff(oldSnap, newSnap,
      keys = Seq("user_id", "event_type"),
      compare = Seq("event_id", "ts", "value"))
  }

  val etlSnapshotDiffOracleSql: String =
    s"""WITH o AS (
       |  SELECT user_id, event_type, event_id, ts, value FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY user_id, event_type
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts < TIMESTAMP '$SnapshotCutoff') t
       |  WHERE rn = 1
       |), n AS (
       |  SELECT user_id, event_type, event_id, ts, value FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY user_id, event_type
       |      ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events) t
       |  WHERE rn = 1
       |), j AS (
       |  SELECT user_id, event_type,
       |    CASE WHEN o.user_id IS NULL THEN 'added'
       |         WHEN n.user_id IS NULL THEN 'removed'
       |         WHEN NOT (o.event_id IS NOT DISTINCT FROM n.event_id
       |               AND o.ts       IS NOT DISTINCT FROM n.ts
       |               AND o.value    IS NOT DISTINCT FROM n.value)
       |           THEN 'changed'
       |    END AS status,
       |    o.event_id AS old_event_id, CAST(o.ts AS TIMESTAMP) AS old_ts,
       |    o.value AS old_value,
       |    n.event_id AS new_event_id, CAST(n.ts AS TIMESTAMP) AS new_ts,
       |    n.value AS new_value
       |  FROM o FULL OUTER JOIN n USING (user_id, event_type)
       |)
       |SELECT * FROM j WHERE status IS NOT NULL""".stripMargin

  /** MERGE INTO driver key (`etl_merge_into`): the per-user profile
    * snapshot as of [[SnapshotCutoff]] (target) merged with the
    * keep-latest collapse of everything after it (source batch) under
    * the statement's clause semantics ([[Merge.mergeInto]]): a source
    * row whose latest state is [[CdcDeleteType]] DELETES the matched
    * profile (and inserts nothing for a brand-new user — the
    * tombstone-no-op default), any other source row updates or
    * inserts, untouched users keep their target row.
    *
    * Deliberately NOT [[cdcApply]] over the full log: MERGE applies
    * delete clauses only to the INCOMING batch — a user whose last
    * pre-cutoff event was `error` keeps that row here (the target
    * snapshot holds it as plain state), where the full-log changelog
    * apply would drop the user. That distinction is the statement's
    * contract, and the spec pins it. */
  def etlMergeInto(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def snap(df: DataFrame): DataFrame =
      Merge.keepLatest(df, keys = Seq(col("user_id")),
          orderCol = col("ts"), tiebreak = col("event_id"))
        .select("user_id", "event_id", "ts", "event_type", "value")
    val cutoff = lit(SnapshotCutoff).cast("timestamp")
    Merge.mergeInto(
      target = snap(ev.where(col("ts") < cutoff)),
      source = snap(ev.where(col("ts") >= cutoff)),
      keys = Seq("user_id"),
      deleteCond = col("event_type") <=> lit(CdcDeleteType))
  }

  val etlMergeIntoOracleSql: String =
    s"""WITH t AS (
       |  SELECT user_id, event_id, ts, event_type, value FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts < TIMESTAMP '$SnapshotCutoff') x
       |  WHERE rn = 1
       |), s AS (
       |  SELECT user_id, event_id, ts, event_type, value FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events WHERE ts >= TIMESTAMP '$SnapshotCutoff') x
       |  WHERE rn = 1
       |)
       |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
       |  CASE WHEN s.user_id IS NOT NULL THEN s.event_id ELSE t.event_id END AS event_id,
       |  CAST(CASE WHEN s.user_id IS NOT NULL THEN s.ts ELSE t.ts END AS TIMESTAMP) AS ts,
       |  CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
       |  CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value
       |FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
       |WHERE (t.user_id IS NOT NULL AND s.user_id IS NULL)
       |   OR (s.user_id IS NOT NULL
       |       AND s.event_type IS DISTINCT FROM '$CdcDeleteType')""".stripMargin

  val normalizeArraysOracleSql: String =
    s"""WITH p AS (
       |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS ds,
       |    list(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f')
       |         ORDER BY ts, event_id) AS times,
       |    list(value ORDER BY ts, event_id) AS temps
       |  FROM events GROUP BY 1),
       |z AS (SELECT ds, unnest(times) AS t, unnest(temps) AS c FROM p)
       |SELECT CAST(strptime(t, '%Y-%m-%dT%H:%M:%S.%f') AS TIMESTAMP) AS ts,
       |  substr(t, 1, 10) AS "date",
       |  CAST(EXTRACT(hour FROM strptime(t, '%Y-%m-%dT%H:%M:%S.%f')) AS INTEGER) AS "hour",
       |  CAST($RefLat AS DOUBLE) AS latitude,
       |  CAST($RefLon AS DOUBLE) AS longitude,
       |  '$SourceTz' AS timezone,
       |  c AS temperature_c,
       |  ds AS load_ds,
       |  'events-hourly' AS source
       |FROM z""".stripMargin
}
