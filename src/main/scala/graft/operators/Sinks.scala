package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Write paths: partitioned parquet with dynamic partition overwrite
  * (the reference's per-`ds` idempotent backfill semantics —
  * airflow/dags/dag_upsert_for_l2.py re-runs a day without touching
  * the others), plus csv/json lines source+sink with explicit schema
  * (the reference ingests raw JSON; schema-on-read is never inferred
  * in production paths — inference is a full extra scan at 100 TB).
  */
object Sinks {

  /** Partitioned snappy-parquet sink: mode=overwrite replaces ONLY the
    * partitions present in `df` — rerunning one `ds` is idempotent and
    * leaves sibling partitions intact. The dynamic mode is forced as a
    * WRITE-level option (it overrides the session conf): on a plain
    * session the default `static` mode would wipe every sibling
    * partition first, which for durable artifacts like the dedup index
    * destroys accumulated history (r5 review finding). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed-table sink: rows hash-clustered into `buckets`
    * files by `bucketCol`, sorted within buckets. Two tables bucketed
    * the same way join WITHOUT any Exchange — the shuffle is paid once
    * at write time instead of on every join, the standard layout for
    * fact tables that are repeatedly joined or merged on one key at
    * warehouse scale. (Bucketing metadata lives in the catalog, hence
    * saveAsTable rather than a bare path.) */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Stage `df` durably to `tmpPath`, then re-read and overwrite
    * `targetPath` — the lineage of the final write points at the temp
    * files, never at the path being replaced (cached blocks are not
    * durable; recomputation must not scan a half-overwritten target).
    * Shared by the L2 merges (Pipeline, Streams.upsertSink). Returns
    * the staged row count; the staging directory is deleted before
    * returning (callers should pass a per-run unique `tmpPath` so
    * concurrent pipelines sharing a lake dir never collide). */
  def stageAndReplace(df: DataFrame, tmpPath: String, targetPath: String,
                      partitionCols: Seq[String]): Long = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(tmpPath)
    val staged = spark.read.parquet(tmpPath)
    if (partitionCols.nonEmpty)
      // dynamic mode forced per-WRITE, same as writePartitioned: on a
      // plain session the default static mode would wipe every sibling
      // partition of the target before writing the staged slice —
      // destroying the accumulated lake the streaming sinks merge into
      staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*).parquet(targetPath)
    else staged.write.mode("overwrite").parquet(targetPath)
    val n = staged.count()
    val hp = new org.apache.hadoop.fs.Path(tmpPath)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    n
  }

  /** Small-file compaction: rewrite a parquet dataset with files
    * sized toward `targetRowsPerFile`, preserving content exactly and
    * (optionally) the partition layout. Streaming sinks and per-ds
    * incremental writes accrete small files that tax the name node /
    * object-store listing and per-file scan setup at 100 TB — this is
    * the standard maintenance pass that fixes it.
    *
    * Partitioned datasets are salted per partition VALUE: each value
    * gets ceil(its rows / target) output slots, so a 50M-row day
    * still splits into right-sized files instead of funneling into
    * one task (repartitioning on the partition columns alone would). */
  def compact(spark: SparkSession, path: String, tmpPath: String,
              targetRowsPerFile: Long, partitionCols: Seq[String] = Nil): Unit = {
    // write the compacted copy to tmpPath (the source path is only
    // ever READ — no read-your-own-overwrite hazard), then swap via
    // delete + rename. The primary is in a deleted state only for the
    // duration of a directory rename, and a crash inside that window
    // is recoverable: tmpPath holds the complete compacted dataset
    // (recovery = rename it to `path`). This also writes the data once
    // instead of the previous stage-then-rewrite's twice.
    val src = spark.read.parquet(path)
    if (partitionCols.isEmpty) {
      val n = src.count()
      val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
      src.repartition(files).write.mode("overwrite").parquet(tmpPath)
    } else {
      val keys = partitionCols.map(col)
      val counts = src.groupBy(keys: _*)
        .agg(count(lit(1)).as("__n"))
        .withColumn("__slots",
          greatest(lit(1L), ceil(col("__n") / lit(targetRowsPerFile.toDouble))))
        .drop("__n")
      // explicit partition count: an expression-only repartition is
      // fair game for AQE coalescing (tiny test data collapses to one
      // task and one file per value); a user-specified count is not
      val totalSlots = counts.agg(sum(col("__slots"))).collect()(0).getLong(0)
      val nonPart = src.columns.filterNot(partitionCols.contains)
      src.join(broadcast(counts), partitionCols)
        .withColumn("__salt",
          pmod(xxhash64(nonPart.map(col): _*), col("__slots")))
        .repartition(math.max(1, totalSlots).toInt, (keys :+ col("__salt")): _*)
        .drop("__slots", "__salt")
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmpPath)
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmpPath),
        new org.apache.hadoop.fs.Path(path)))
      throw new IllegalStateException(
        s"compact: rename $tmpPath -> $path failed; " +
          s"the compacted dataset is intact at $tmpPath")
  }

  /** CSV sink with header; one file per partition, snappy-less (csv is
    * an interchange format here, not the storage format). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** CSV source with an explicit schema — no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines sink. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with an explicit schema — no inference pass. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC sink — the second columnar interchange format warehouses
    * speak (Hive/Trino ecosystems); zlib is ORC's portable default
    * codec. Same dynamic-overwrite semantics as the parquet sink when
    * partitioned. */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil): Unit = {
    // dynamic overwrite forced per-write, exactly like writePartitioned
    // above: without it a partitioned rerun in a plain session wipes
    // every SIBLING partition (static mode), not just the ones being
    // rewritten (r6 review finding)
    val w = df.write.mode("overwrite").option("compression", "zlib")
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** ORC source. Schema travels in the file footer (like parquet), so
    * no explicit schema is required for round-tripping. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
