package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-zone ingestion — the reference's extract stage
  * (scripts/extract_open_meteo_to_minio.py: fetch payload → write the
  * RAW bytes to object storage keyed by `ds`, parse later) minus the
  * HTTP client (no egress here; callers hand in files or frames).
  *
  * The raw zone stores payloads VERBATIM in an envelope
  * (payload, source, ds, ingest metadata), so normalize bugs are
  * re-runnable against the original bytes — the property the
  * reference's two-zone layout exists for. Envelope writes are
  * partitioned by (ds) with dynamic overwrite: re-ingesting a ds is
  * idempotent like every other stage.
  */
object Ingest {

  /** Raw-zone envelope schema. */
  val EnvelopeSchema: StructType = StructType.fromDDL(
    "payload STRING, source STRING, ds STRING, ingest_id BIGINT")

  /** Wrap a line-oriented text file (one payload per line — JSON
    * lines, CSV rows, anything) into raw-zone envelopes. No parsing
    * happens here by design. */
  def envelopes(spark: SparkSession, path: String, source: String, ds: String): DataFrame =
    spark.read.text(path)
      .select(
        col("value").as("payload"),
        lit(source).as("source"),
        lit(ds).as("ds"),
        monotonically_increasing_id().as("ingest_id"))

  /** Land envelopes in the raw zone, replacing only this ds/source
    * partition. */
  def landRaw(env: DataFrame, rawPath: String): Unit =
    Sinks.writePartitioned(env, rawPath, Seq("ds", "source"))

  /** Parse a raw-zone slice with an explicit schema (never inferred —
    * inference is an extra full scan at scale and nondeterministic
    * under dirty data). Malformed payloads yield null columns, not
    * job failures — inspect `_corrupt` to quarantine them. */
  def parseRaw(spark: SparkSession, rawPath: String, ds: String,
               payloadSchema: StructType): DataFrame = {
    val raw = spark.read.parquet(rawPath).filter(col("ds") === ds)
    // parse ONCE in its own projection; _corrupt derives from the
    // parsed struct. (CollapseProject keeps non-cheap expressions like
    // from_json un-inlined when referenced more than once, so the
    // payload really is parsed a single time per row.)
    raw.select(col("ds"), col("source"), col("ingest_id"), col("payload"),
        from_json(col("payload"), payloadSchema).as("rec"))
      .select(col("ds"), col("source"), col("ingest_id"),
        col("rec"),
        when(col("rec").isNull || to_json(col("rec")) === lit("{}"),
          col("payload")).as("_corrupt"))
      .select(col("ds"), col("source"), col("ingest_id"), col("rec.*"), col("_corrupt"))
  }
}
