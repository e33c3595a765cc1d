package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of (temporal) join: attach to each left row the payload of the
  * most recent right row with the same key and `rightTs <= leftTs` —
  * the standard enrichment shape for event streams against
  * slowly-changing facts (each event sees the latest order / price /
  * config *as of* its own timestamp).
  *
  * Spark has no native ASOF JOIN (DuckDB/Flink do), and the naive
  * formulations both fail at scale: an inequality theta-join explodes
  * to a range product, and join-then-keep-latest shuffles the full
  * match set. This is the union trick instead — tag both sides, union
  * them, and run ONE running `last(payload, ignoreNulls)` window per
  * key ordered by time, so each left row picks up the right payload
  * that most recently preceded it:
  *
  *   shuffle cost = one Exchange on the key (same as an equi-join),
  *   memory cost  = O(1) per row (running last, no buffered ranges).
  *
  * Determinism contract: the right side must be unique per
  * (key, ts) — pre-reduce with [[Merge.keepLatest]] — otherwise
  * "the" most recent right row is ambiguous (DuckDB's ASOF has the
  * same caveat). Ties between a left and right row at the SAME
  * instant match (>= semantics): the right row sorts first.
  */
object AsOf {

  /** Generic frame form. `payloadCols` are the right-side columns to
    * carry onto each left row (null when no right row precedes). */
  def asOfJoinOn(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column,
                 leftTs: Column, rightTs: Column,
                 payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val paySchema = right.select(payloadCols.map(col): _*).schema
    val l = left.select(
      leftKey.as("__k"), leftTs.as("__ts"), lit(0).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(paySchema).as("__pay"))
    val r = right.select(
      rightKey.as("__k"), rightTs.as("__ts"), lit(1).as("__side"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      struct(payloadCols.map(col): _*).as("__pay"))
    // right rows sort BEFORE left rows at the same (key, ts): a right
    // row at exactly the left timestamp matches (>= semantics)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Driver query: each event enriched with the user's most recent
    * order as of the event time. The right side is reduced to one row
    * per (custkey, orderdate) first — deterministic max-orderkey
    * survivor — so the as-of match is unique (see class doc). */
  def qAsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Merge.keepLatest(
      Tables.orders(spark, dir),
      keys = Seq(col("o_custkey"), col("o_orderdate")),
      orderCol = col("o_orderkey"), tiebreak = col("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").as("last_orderts"),
        col("o_orderkey").as("last_orderkey"),
        round(col("o_totalprice"), 4).as("last_totalprice"))
    val events = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id")
    asOfJoinOn(events, orders,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTs = col("ts"), rightTs = col("last_orderts"),
      payloadCols = Seq("last_orderkey", "last_orderts", "last_totalprice"))
  }

  val qAsOfJoinOracleSql: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS last_orderts,
      |    o_orderkey AS last_orderkey, ROUND(o_totalprice, 4) AS last_totalprice
      |  FROM orders
      |  QUALIFY ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1
      |)
      |SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id,
      |  o.last_orderkey, o.last_orderts, o.last_totalprice
      |FROM events e
      |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.last_orderts""".stripMargin
}
