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

  /** CDC changelog apply: collapse an ordered change feed carrying
    * upserts AND DELETES to the current snapshot — the generalization
    * of [[keepLatest]] to real change-data-capture input. The
    * reference's L2 upsert (upsert_l2_for_ds.sql:7-33) assumes an
    * append/upsert-only feed; a logical-decoding feed (the natural
    * 100 TB replacement for its per-ds Postgres reloads) also carries
    * tombstones, and applying one is: keep the latest change per key
    * by (orderCol, tiebreak); if that change is the delete op, the key
    * leaves the snapshot entirely.
    *
    * Same single shuffle + one window pass as keepLatest — the
    * tombstone filter is a post-window projection on the one surviving
    * row per key, so deletes cost nothing extra. Re-inserts after a
    * delete behave correctly by construction (latest change wins). */
  def applyChangelog(df: DataFrame, keys: Seq[Column], orderCol: Column,
                     tiebreak: Column, opCol: Column, deleteOp: String): DataFrame =
    keepLatest(df, keys, orderCol, tiebreak)
      // null-safe: a null op is an upsert, not a tombstone
      .filter(!(opCol <=> lit(deleteOp)))

  /** Snapshot diff: the added/removed/changed key report between two
    * keyed snapshots (one row per key each) — the audit primitive
    * behind "what did this load change", reconciliation between a
    * rebuilt table and its previous publication, and incremental
    * downstream invalidation.
    *
    * One full-outer hash join on the key columns; change detection
    * compares the named `compare` columns null-safely (`<=>`, so a
    * NULL→value transition reads as a change, not a match). Unchanged
    * keys are dropped BEFORE anything downstream, so the output is
    * churn-sized, not snapshot-sized. Old/new values are emitted
    * side-by-side with `old_`/`new_` prefixes.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compare: Seq[String]): DataFrame = {
    val o = oldSnap.select((keys ++ compare).map(col): _*)
      .withColumn("__old", lit(1))
    val n = newSnap.select(keys.map(col) ++ compare.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__new", lit(1))
    val joined = o.join(n, keys, "full_outer")
    val changed = compare.map(c => !(col(c) <=> col(s"__n_$c")))
      .reduce(_ || _)
    val status = when(col("__old").isNull, lit("added"))
      .when(col("__new").isNull, lit("removed"))
      .when(changed, lit("changed"))
    val outCols = keys.map(col) ++
      Seq(status.as("status")) ++
      compare.map(c => col(c).as(s"old_$c")) ++
      compare.map(c => col(s"__n_$c").as(s"new_$c"))
    joined.where(status.isNotNull).select(outCols: _*)
  }

  /** SCD type-2 history build: where [[keepLatest]] keeps only the
    * newest state per key (the reference's L2 upsert), this keeps the
    * FULL state history as validity intervals — each run of equal
    * consecutive `stateCol` values per key collapses to one row with
    * `eff_start` (first ts of the run), `eff_end` (next run's start;
    * null while current) and `is_current`. Re-observations of an
    * unchanged state extend the open interval instead of opening a
    * new one, which is the SCD2 contract.
    *
    * Plan shape: ONE shuffle on the key — both windows (the lag that
    * finds change points and the lead that closes intervals) share
    * the same partitioning, so Catalyst reuses the Exchange. The
    * change-point filter runs before the second window: the lead
    * sorts only change rows, not the raw log. */
  def scd2(df: DataFrame, keys: Seq[Column], stateCol: Column,
           orderCol: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderCol.asc, tiebreak.asc)
    // first row detected EXPLICITLY (row_number), not via a null lag:
    // a null PREVIOUS STATE is indistinguishable from "no previous
    // row" in the lag alone, which would re-open an interval on every
    // consecutive-null state instead of collapsing the run (r4 advice).
    // State comparison is the null-safe inequality only.
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(stateCol, 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> stateCol))
    changes
      .withColumn("eff_start", orderCol)
      .withColumn("eff_end", lead(orderCol, 1).over(w))
      .withColumn("is_current", col("eff_end").isNull)
      .drop("__rn", "__prev")
  }

  /** Generic MERGE INTO (the lakehouse upsert statement: Delta
    * `MERGE`, Iceberg `MERGE INTO`, SQL:2003 `MERGE`) resolved as one
    * relational pass — where [[applyChangelog]] collapses ONE ordered
    * feed by recency, this merges a BATCH of incoming rows into an
    * existing keyed snapshot with the statement's clause semantics:
    *
    *  - matched  + `deleteCond` (on the source row)  → row deleted
    *  - matched  (otherwise)                         → source row wins
    *  - not matched by target + `insertCond`         → source row inserted
    *  - not matched by source                        → target row kept
    *
    * `insertCond` defaults to ¬deleteCond: a tombstone for a key the
    * target never held is a no-op, not an insert — the changelog
    * reading. Pass `lit(true)` for the SQL-standard unconditional
    * INSERT clause.
    *
    * Both inputs must be keyed snapshots (≤1 row per key — the MERGE
    * precondition; Delta throws on source multi-matches). Callers with
    * raw feeds collapse them first with [[keepLatest]]/[[applyChangelog]].
    *
    * Plan shape: ONE full-outer hash join on the key columns + a
    * clause-resolution projection — both sides shuffle once on the
    * keys, AQE splits skewed keys. At 100 TB the target side is the
    * lake: pair with the key-hash-bucketed layout
    * (`Streams.cdcApplySink`) so the join co-locates by bucket and
    * only buckets the source batch touches are rewritten — the merge
    * itself is layout-agnostic. */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                deleteCond: Column,
                insertCondOpt: Option[Column] = None): DataFrame = {
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    require(dataCols == source.columns.filterNot(keys.contains).toSeq,
      "mergeInto: target/source non-key columns must match")
    val insertCond = insertCondOpt.getOrElse(!deleteCond)
    val t = target.select(keys.map(col) ++ dataCols.map(c => col(c).as(s"__t_$c")): _*)
      .withColumn("__in_t", lit(1))
    // clause conditions evaluate against the source's ORIGINAL column
    // names — resolve them before the __s_ rename hides those names
    val s = source
      .withColumn("__del", deleteCond)
      .withColumn("__ins", insertCond)
      .select(keys.map(col) ++ dataCols.map(c => col(c).as(s"__s_$c")) ++
        Seq(col("__del"), col("__ins")): _*)
      .withColumn("__in_s", lit(1))
    val matched = col("__in_t").isNotNull && col("__in_s").isNotNull
    // survives iff: matched non-delete (source wins), unmatched target
    // (kept as-is), or insertable unmatched source
    val keep = (matched && !col("__del")) ||
      (col("__in_t").isNotNull && col("__in_s").isNull) ||
      (col("__in_t").isNull && col("__in_s").isNotNull && col("__ins"))
    val resolved = dataCols.map { c =>
      when(col("__in_s").isNotNull, col(s"__s_$c")).otherwise(col(s"__t_$c")).as(c)
    }
    t.join(s, keys, "full_outer")
      .where(keep)
      .select(keys.map(col) ++ resolved: _*)
  }

  /** Apply a TOMBSTONE-BEARING change feed into SCD2 history — the
    * lakehouse "apply changes into SCD2" contract composing
    * [[applyChangelog]]'s delete semantics with [[scd2]]'s interval
    * build: upsert changes open/extend state intervals exactly as in
    * [[scd2]], and a `deleteOp` change CLOSES the key's open interval
    * without opening a new one (the key holds no state while deleted;
    * a later re-insert — even of the same state — opens a fresh
    * interval). A key whose latest change is a delete therefore has
    * NO `is_current` row, matching [[applyChangelog]]'s snapshot.
    *
    * Implementation: the delete op is folded into the tracked state as
    * a (is_delete, state) struct — injective, so change-point
    * detection sees a delete as "a different state" (closing the
    * prior interval, collapsing consecutive deletes into one run) —
    * then the delete runs' own intervals are dropped after the
    * interval build. Same ONE shuffle on the key as [[scd2]]; the
    * tombstone filter is a post-window projection.
    *
    * `opCol` may BE the state column (a feed where one value of the
    * tracked state means "closed"): the struct fold handles that
    * without a sentinel collision. */
  def scd2Changelog(df: DataFrame, keys: Seq[Column], stateCol: Column,
                    orderCol: Column, tiebreak: Column,
                    opCol: Column, deleteOp: String): DataFrame = {
    val isDel = opCol <=> lit(deleteOp)
    val folded = df.withColumn("__scd_state",
      struct(isDel.as("del"),
        when(isDel, lit(null)).otherwise(stateCol).as("s")))
    scd2(folded, keys, col("__scd_state"), orderCol, tiebreak)
      .filter(!col("__scd_state.del"))
      .drop("__scd_state")
  }
}
