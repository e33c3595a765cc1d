package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytics layer: the SQL-curated-zone queries (reference L2 zone —
  * scripts/sql/l2_tables is the reference's "analytics ready"
  * surface) expressed over the TPC-H-shaped corpus.
  *
  * Numeric-parity note (applies to every oracle-checked query): SUMs
  * of double columns are accumulated in DECIMAL and cast back to
  * DOUBLE. A double sum is order-dependent — Spark's parallel partial
  * aggregation and DuckDB's sequential scan would disagree in the low
  * bits and the driver's hash compare is exact. Decimal accumulation
  * is exact and order-independent, so both engines produce the same
  * bits. This costs nothing at scale (decimal sum is still a
  * map-side-combined partial aggregate).
  */
object Analytics {

  /** Exact, order-independent sum of a double expression: accumulate
    * in decimal, present as double. `scale` = decimal digits kept per
    * row (6 is plenty for prices/discount products). */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Order-independent mean built from dsum / count. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(s"decimal(30,$scale)")).cast("double") /
      count(c).cast("double"))

  // --- q1: pricing summary (multi-aggregate groupBy + pushdown filter)
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
