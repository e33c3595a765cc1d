package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column support: media payloads ride pipelines as opaque
  * `binary` columns with typed metadata, and feature extraction runs
  * as batched per-partition passes.
  *
  * The test corpus has no real media, so the binary column is the
  * UTF-8 encoding of `documents.text` and the decode step inside
  * featureExtract is a clearly-marked deterministic STUB (the
  * container ships no image/audio codecs). Everything around the stub
  * — binary schema, metadata derivation, partition-batched iteration,
  * fixed-width feature output — is the real plumbing a media corpus
  * would use.
  */
object Multimodal {

  /** Typed metadata over a binary payload column: byte length, md5,
    * and a magic-byte content-type sniff (PDF/JPEG/PNG prefixes, else
    * text) — metadata a raw-zone loader attaches before any decode. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast("binary")
    val prefixHex = upper(hex(substring(bin, 1, 4)))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(bin).as("n_bytes"),
      md5(bin).as("content_md5"),
      substring(prefixHex, 1, 8).as("prefix_hex"),
      when(prefixHex.startsWith("25504446"), "application/pdf")
        .when(prefixHex.startsWith("FFD8"), "image/jpeg")
        .when(prefixHex.startsWith("89504E47"), "image/png")
        .otherwise("text/plain").as("content_type"))
  }

  val binaryMetaOracleSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS content_md5,
      |  left(upper(hex(encode(substring(text, 1, 4)))), 8) AS prefix_hex,
      |  CASE
      |    WHEN upper(hex(encode(substring(text, 1, 4)))) LIKE '25504446%' THEN 'application/pdf'
      |    WHEN upper(hex(encode(substring(text, 1, 4)))) LIKE 'FFD8%' THEN 'image/jpeg'
      |    WHEN upper(hex(encode(substring(text, 1, 4)))) LIKE '89504E47%' THEN 'image/png'
      |    ELSE 'text/plain'
      |  END AS content_type
      |FROM documents""".stripMargin

  /** Feature width the (stub) decoder emits. */
  val FeatureDim = 8

  /** Deterministic fake "decode": derives FeatureDim floats from the
    * payload bytes. STUB — a real deployment swaps this body for an
    * image/audio decode + model forward pass; the function signature
    * (bytes in, fixed-width float features + dims out) is the
    * contract the Spark plumbing is built against. */
  private[operators] def stubDecode(bytes: Array[Byte]): (Array[Float], Int, Int) = {
    val feats = Array.tabulate(FeatureDim) { i =>
      var h = 1125899906842597L + i
      var j = i
      while (j < bytes.length) { h = h * 31 + bytes(j); j += FeatureDim }
      (h % 1000).toFloat / 1000f
    }
    // fake spatial dims from the payload size
    (feats, bytes.length % 640, bytes.length % 480)
  }

  /** Batched feature extraction over the binary column: one
    * mapPartitions pass (the per-partition batch shape a vectorized
    * decoder needs — amortized model/codec init per partition, not per
    * row), emitting a fixed-schema feature frame. Partitioning of the
    * input is preserved; no shuffle. */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      // per-partition init happens HERE (decoder/model handle in a
      // real pipeline) — amortized across the whole batch
      batch.map { case (id, bytes) =>
        val (feats, w, h) = stubDecode(bytes)
        (id, bytes.length, w, h, feats)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "features")
  }
}
