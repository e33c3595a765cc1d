package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Join-key skew profiler (key `dq_key_skew`) — the pre-flight
  * diagnostic that decides whether a production join/aggregation on a
  * key needs salting, and at what factor.
  *
  * Mirrors the DQ-gate posture of the reference's normalize step
  * (reference: scripts/normalize_open_meteo_to_parquet.py:98-130 —
  * inspect the batch, emit a verdict, THEN act): profile the key
  * distribution first, let the pipeline pick its shuffle strategy
  * from the numbers instead of discovering the hot key when one
  * straggler task runs 40× longer than the rest.
  *
  * Why it matters at 100 TB: a shuffled join partitions by key hash.
  * With a Zipf-heavy key, the hottest key's rows all land on ONE
  * reducer — the job's wall-clock becomes that task. The standard
  * fixes (salt the key by a factor F, or AQE skew-split) both need F,
  * and F is exactly `ceil(max_key_rows / avg_key_rows)` — the number
  * this operator computes, exact, in two aggregation passes whose
  * shuffles carry one row per DISTINCT key (then one global row).
  *
  * Output: the top-K heaviest keys, each row carrying its count, its
  * share of all rows, and the corpus-level summary (distinct keys,
  * total rows, recommended salt factor) — a bounded, human-readable
  * report (K rows), not a corpus.
  *
  * Determinism: counts are exact integers; `share` is one IEEE
  * double division of two exact integers (correctly rounded, so
  * engine-identical); `salt_factor` is pure integer ceil math.
  */
object Skew {

  /** Report rows: the K heaviest keys. */
  val TopKeys = 10

  /** Generic profile of `key` over `df` — see object doc. The first
    * aggregation spreads by key (high cardinality, uniform); the
    * second collapses per-key counts into one summary row + a
    * TakeOrdered top-K. Nothing corpus-sized crosses the wire twice. */
  def keySkewProfileOn(df: DataFrame, key: Column, topK: Int = TopKeys): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    // 1-row global summary: bounded by construction, broadcast below
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"))
    // top-K by (cnt desc, key asc): orderBy+limit is a TakeOrdered —
    // per-partition heaps + a K-row driver merge, no global sort
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
    top.crossJoin(broadcast(summary))
      .select(
        col("key"), col("cnt"),
        // exact-int / exact-int in one correctly-rounded division:
        // bit-identical across engines
        (col("cnt").cast("double") / col("total_rows").cast("double")).as("share"),
        col("n_keys"), col("total_rows"),
        // ceil(max/avg) = ceil(max * n_keys / total) in pure integer
        // math — through DECIMAL(38,0): at the corpus this profiler is
        // pitched at (~1e9 distinct keys × ~1e10 hot-key rows) the
        // Long product would wrap silently where DuckDB raises,
        // breaking both the answer and the oracle contract
        expr("cast((cast(max_cnt as decimal(38,0)) * n_keys + total_rows - 1)" +
          " div total_rows as bigint)").as("salt_factor"))
  }

  /** The executor the profiler's `salt_factor` feeds — the standard
    * pre-AQE salted join: join `fact` to `dim` on `keys` with the hot
    * keys' rows SPREAD over `saltFactor` reducer partitions instead of
    * one. The fact side gets a deterministic per-row salt in
    * [0, saltFactor) (xxhash64 over the whole row — stable across task
    * retries, unlike `rand()`, so speculative re-execution cannot
    * double-emit); the dim side is exploded saltFactor× so every
    * (key, salt) fact partition finds its dim row. Result rows equal
    * the plain join exactly (spec-equated); the cost is saltFactor×
    * the DIM shuffle volume — which is the trade: dim is the small
    * side, and the hot key's fact rows stop serializing through one
    * straggler task.
    *
    * AQE's skew-join split covers sort-merge joins at runtime; the
    * explicit salt is for the cases AQE can't reach — skewed
    * AGGREGATION feeding the join, deterministic plan shape for
    * bucketed co-location, or engines/configs without AQE. Factor
    * comes from [[keySkewProfileOn]]'s `salt_factor` column
    * ([[saltedJoinAuto]] wires the two).
    *
    * `joinType` must be fact-preserving (`inner` or `left`): an
    * unmatched DIM row appears once per salt replica under outer
    * types, so right/full outer are refused. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Set("inner", "left", "left_outer", "leftouter")
        .contains(joinType.toLowerCase),
      s"saltedJoin requires a fact-preserving join type (inner/left), got $joinType")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** [[saltedJoin]] with the factor taken from the profiler: one
    * bounded profile pass over the fact keys (shuffles one row per
    * DISTINCT key), read the 1-row summary's `salt_factor`, salt by
    * it. A uniform key distribution profiles to factor 1 — the salt
    * column is constant and the join degenerates to the plain join. */
  def saltedJoinAuto(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                     joinType: String = "inner"): DataFrame = {
    val keyCol = if (keys.length == 1) col(keys.head)
      else struct(keys.map(col): _*)
    // 1-row bounded collect: every report row carries the same summary
    val factor = keySkewProfileOn(fact, keyCol, topK = 1)
      .select(col("salt_factor")).limit(1)
      .collect().headOption.map(_.getLong(0).toInt).getOrElse(1)
    saltedJoin(fact, dim, keys, math.max(1, factor), joinType)
  }

  /** Driver query (key `dq_key_skew`): profile `events.user_id` — the
    * key every sessionize/attribution join in the suite shuffles on.
    * `rank` disambiguates ties deterministically for the report. */
  def dqKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val prof = keySkewProfileOn(Tables.events(spark, dir), col("user_id"))
    // bounded single-partition window: TopKeys rows by construction
    // (lit(0) declares the intentional one-partition layout)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("cnt").desc, col("key"))
    prof.withColumn("rank", row_number().over(w).cast("int"))
      .select(col("rank"), col("key").as("user_id"), col("cnt"),
        col("share"), col("n_keys"), col("total_rows"), col("salt_factor"))
  }

  /** Oracle: the same two-stage profile in SQL. */
  val dqKeySkewOracleSql: String =
    s"""WITH counts AS (
       |  SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY 1
       |), summary AS (
       |  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total_rows,
       |    MAX(cnt) AS max_cnt
       |  FROM counts
       |), top AS (
       |  SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank
       |  FROM counts ORDER BY cnt DESC, key LIMIT $TopKeys
       |)
       |SELECT CAST(t.rank AS INTEGER) AS rank, t.key AS user_id, t.cnt,
       |  CAST(t.cnt AS DOUBLE) / CAST(s.total_rows AS DOUBLE) AS share,
       |  s.n_keys, s.total_rows,
       |  CAST((CAST(s.max_cnt AS HUGEINT) * s.n_keys + s.total_rows - 1)
       |    // s.total_rows AS BIGINT) AS salt_factor
       |FROM top t CROSS JOIN summary s""".stripMargin
}
