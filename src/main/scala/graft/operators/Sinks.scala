package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Write paths: partitioned parquet with dynamic partition overwrite
  * (the reference's per-`ds` idempotent backfill semantics —
  * airflow/dags/dag_upsert_for_l2.py re-runs a day without touching
  * the others), plus csv/json lines source+sink with explicit schema
  * (the reference ingests raw JSON; schema-on-read is never inferred
  * in production paths — inference is a full extra scan at 100 TB).
  */
object Sinks {

  /** Partitioned snappy-parquet sink. With
    * `spark.sql.sources.partitionOverwriteMode=dynamic` (set by
    * GraftSession) mode=overwrite replaces ONLY the partitions present
    * in `df` — rerunning one `ds` is idempotent and leaves sibling
    * partitions intact. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

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

  /** Small-file compaction: rewrite a parquet dataset with files
    * sized toward `targetRowsPerFile`, preserving content exactly and
    * (optionally) the partition layout. Streaming sinks and per-ds
    * incremental writes accrete small files that tax the name node /
    * object-store listing and per-file scan setup at 100 TB — this is
    * the standard maintenance pass that fixes it. The rewrite stages
    * durably to `tmpPath` before replacing the target (same
    * no-read-your-own-overwrite rule as the L2 merges). */
  def compact(spark: SparkSession, path: String, tmpPath: String,
              targetRowsPerFile: Long, partitionCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    val reshaped =
      if (partitionCols.nonEmpty)
        // spread within each partition value, keep the layout
        df.repartition(files, partitionCols.map(df(_)): _*)
      else df.repartition(files)
    reshaped.write.mode("overwrite").parquet(tmpPath)
    val staged = spark.read.parquet(tmpPath)
    if (partitionCols.nonEmpty)
      staged.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    else staged.write.mode("overwrite").parquet(path)
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
}
