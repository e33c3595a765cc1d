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

  /** Transport-agnostic retry with the reference extract's semantics
    * (extract_open_meteo_to_minio.py:52-83 `_http_get_json`):
    * `retries + 1` total attempts, a FIXED `backoffMs` sleep between
    * attempts (the reference's backoff is linear, not exponential),
    * rethrow once exhausted with the earlier failures attached as
    * suppressed (the reference logs each and raises the last). The
    * `sleep` hook is injectable so specs assert backoff without
    * wall-clock waits. Driver-side only — wraps the FETCH, which is
    * inherently a single-caller transport action, not a Spark job. */
  def withRetry[T](retries: Int, backoffMs: Long = 1000L,
                   sleep: Long => Unit = Thread.sleep)(attempt: Int => T): T = {
    require(retries >= 0, s"withRetry: retries must be >= 0, got $retries")
    var last: Throwable = null
    var i = 1
    while (i <= retries + 1) {
      try return attempt(i)
      catch {
        case scala.util.control.NonFatal(e) =>
          // a memoized failure (e.g. a failed Future) can rethrow the
          // SAME instance — self-suppression is a JVM error
          if (last != null && (e ne last)) e.addSuppressed(last)
          last = e
          if (i <= retries) sleep(backoffMs)
      }
      i += 1
    }
    throw last
  }

  /** Envelopes from a retried in-memory fetch — the no-egress analog
    * of the reference's HTTP GET → raw landing (the thunk stands in
    * for the transport; everything after it is identical). Payload
    * order assigns `ingest_id` deterministically, unlike the
    * partition-dependent monotonically_increasing_id of the file
    * path — a retried fetch must land IDENTICAL envelopes. */
  def envelopesFetched(spark: SparkSession, fetch: Int => Seq[String],
                       source: String, ds: String,
                       retries: Int = 2, backoffMs: Long = 1000L,
                       sleep: Long => Unit = Thread.sleep): DataFrame = {
    val payloads = withRetry(retries, backoffMs, sleep)(fetch)
    val rows = payloads.zipWithIndex.map { case (p, i) => (p, source, ds, i.toLong) }
    spark.createDataFrame(rows).toDF("payload", "source", "ds", "ingest_id")
  }

  /** Parse a raw-zone slice with an explicit schema (never inferred —
    * inference is an extra full scan at scale and nondeterministic
    * under dirty data). Malformed payloads yield null columns, not
    * job failures — inspect `_corrupt` to quarantine them.
    *
    * Corruption is reported by the PARSER (PERMISSIVE mode's
    * corrupt-record column), not inferred from the parsed values: a
    * payload of `{}` or `{"k": null}` produces an all-null struct that
    * is legitimately non-corrupt, which a to_json-roundtrip check
    * would misclassify (to_json drops null fields). */
  def parseRaw(spark: SparkSession, rawPath: String, ds: String,
               payloadSchema: StructType): DataFrame = {
    val raw = spark.read.parquet(rawPath).filter(col("ds") === ds)
    val parseSchema = payloadSchema.add("_corrupt", org.apache.spark.sql.types.StringType)
    raw.select(col("ds"), col("source"), col("ingest_id"),
        from_json(col("payload"), parseSchema, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("rec"))
      .select(col("ds"), col("source"), col("ingest_id"), col("rec.*"))
  }
}
