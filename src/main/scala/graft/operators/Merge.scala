package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic merge/dedupe primitives — the library-facing form of the
  * reference's L2 upsert semantics (keep one row per key by a
  * recency/priority order; reference:
  * scripts/sql/l2_tables/upsert_l2_for_ds.sql:7-33), decoupled from
  * any specific table so callers bring their own frames.
  *
  * One shuffle on the key set, one sort per partition, row_number
  * prune — the same single-pass shape regardless of key arity. Pair
  * with Sinks.writePartitioned (dynamic partition overwrite) for
  * idempotent per-partition upserts into object storage.
  */
object Merge {

  /** One row per key, chosen by `ordering` (first row wins). The
    * ordering must be total per key group for deterministic results —
    * include a unique tiebreak column. */
  def dedupeByKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Last-write-wins: keep the row with the greatest (orderCol,
    * tiebreak) per key — upsert semantics over an append log. */
  def keepLatest(df: DataFrame, keys: Seq[Column],
                 orderCol: Column, tiebreak: Column): DataFrame =
    dedupeByKey(df, keys, Seq(orderCol.desc, tiebreak.desc))

  /** First-write-wins: keep the earliest row per key. */
  def keepFirst(df: DataFrame, keys: Seq[Column],
                orderCol: Column, tiebreak: Column): DataFrame =
    dedupeByKey(df, keys, Seq(orderCol.asc, tiebreak.asc))
}
