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

  /** Deterministic fake "decode", integer core: one strided 64-bit
    * polynomial hash per feature lane over the payload bytes. STUB —
    * a real deployment swaps this for an image/audio decode + model
    * forward pass; the signature (bytes in, fixed-width features out)
    * is the contract the Spark plumbing is built against. Kept as
    * plain wrapping-long arithmetic so the DuckDB oracle can replay
    * it bit-exactly (HUGEINT mod-2^64 fold over the same bytes). */
  private[operators] def stubDecodeHashes(bytes: Array[Byte]): Array[Long] =
    Array.tabulate(FeatureDim) { i =>
      var h = 1125899906842597L + i
      var j = i
      while (j < bytes.length) { h = h * 31 + bytes(j); j += FeatureDim }
      h
    }

  /** Float-vector form of the stub decode — the `Array[Float]`
    * embedding shape a real model head would emit. */
  private[operators] def stubDecode(bytes: Array[Byte]): (Array[Float], Int, Int) = {
    val feats = stubDecodeHashes(bytes).map(h => (h % 1000).toFloat / 1000f)
    // fake spatial dims from the payload size
    (feats, bytes.length % 640, bytes.length % 480)
  }

  /** Batched feature extraction over the binary column: one
    * mapPartitions pass (the per-partition batch shape a vectorized
    * decoder needs — amortized model/codec init per partition, not per
    * row), emitting a fixed-schema feature frame. Partitioning of the
    * input is preserved; no shuffle.
    *
    * Output schema is FLAT scalars (`feature_0..feature_{FeatureDim-1}`
    * doubles) — a vector column stays internal (`featureExtractVec`)
    * because flat scalars are what cross-engine comparison and
    * column-pruned downstream reads want. Each feature is
    * (h mod 1000)/1000 as an exact IEEE division, so Spark and the
    * DuckDB oracle produce identical doubles with no rounding step. */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      // per-partition init happens HERE (decoder/model handle in a
      // real pipeline) — amortized across the whole batch
      batch.map { case (id, bytes) =>
        val f = stubDecodeHashes(bytes).map(h => (h % 1000).toDouble / 1000.0)
        (id, bytes.length, bytes.length % 640, bytes.length % 480,
          f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }
    }.toDF("doc_id" +: "n_bytes" +: "width" +: "height" +:
      (0 until FeatureDim).map(i => s"feature_$i"): _*)
  }

  /** Vector form of the extraction (`features array<float>`) — the
    * internal shape similarity/dedup stages consume directly. */
  def featureExtractVec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        val (feats, w, h) = stubDecode(bytes)
        (id, bytes.length, w, h, feats)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "features")
  }

  /** Stub frame geometry for [[frameSample]]: the payload is treated
    * as a raw concatenation of fixed-size frames. A real container
    * (mp4/mkv) needs a demuxer here — the STUB is the layout, not the
    * plumbing. */
  val FrameBytes = 64
  /** Keep every `FrameStride`-th frame — the standard video
    * preprocessing cut (temporal subsampling before encode/caption). */
  val FrameStride = 4

  /** Strided frame sampling over a binary container column: derive
    * the frame count from the payload size, keep frames
    * `0, stride, 2·stride, …`, and emit one row per KEPT frame with
    * its byte offset and a 64-bit content fingerprint of the frame
    * slice (`poly_hash64` over BINARY — frame bytes are not UTF-8 and
    * never round-trip a string). Downstream stages treat the row
    * stream exactly like a decoded-image corpus: dedup on `frame_fp64`,
    * batch-decode with [[featureExtract]]'s mapPartitions shape.
    *
    * Scale shape: a pure generator expansion (`explode(sequence(…))`)
    * — shuffle-free, codegen end-to-end; fan-out is `n_frames/stride`
    * rows per payload, each a fixed-width projection. Only FULL frames
    * count (`n_frames = n_bytes div FrameBytes`) so every emitted
    * slice is exactly `FrameBytes` long, and payloads shorter than one
    * frame yield zero rows, not a ragged tail. */
  def frameSampleOn(docs: DataFrame, frameBytes: Int = FrameBytes,
                    stride: Int = FrameStride): DataFrame =
    docs
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .withColumn("n_frames", expr(s"octet_length(content) div $frameBytes"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"), col("content"),
        explode(sequence(lit(0), (col("n_frames") - 1).cast("int"),
          lit(stride))).as("frame_idx"))
      .withColumn("frame_offset", (col("frame_idx") * frameBytes).cast("bigint"))
      .withColumn("frame_fp64", call_function("poly_hash64",
        expr(s"substring(content, frame_offset + 1, $frameBytes)")))
      .select("doc_id", "n_frames", "frame_idx", "frame_offset", "frame_fp64")

  /** Driver query (key `mm_frame_sample`). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    frameSampleOn(Tables.documents(spark, dir))

  /** Oracle: same frame grid in SQL; the fingerprint replays through
    * the shared Karp–Rabin byte fold over the hex-decoded slice. */
  val frameSampleOracleSql: String = {
    import graft.functions.SqlReplay._
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n FROM documents
       |), by AS (
       |  SELECT doc_id, CAST(n // $FrameBytes AS BIGINT) AS n_frames,
       |    ${hexBytes("hx", "n")} AS bytes
       |  FROM b WHERE n >= $FrameBytes
       |), fr AS (
       |  SELECT doc_id, n_frames,
       |    CAST(unnest(generate_series(0, n_frames - 1, $FrameStride)) AS INTEGER) AS frame_idx,
       |    bytes
       |  FROM by
       |)
       |SELECT doc_id, n_frames, frame_idx,
       |  CAST(frame_idx * $FrameBytes AS BIGINT) AS frame_offset,
       |  ${toSigned(polyFold(s"list_slice(bytes, frame_idx * $FrameBytes + 1, (frame_idx + 1) * $FrameBytes)"))}
       |    AS frame_fp64
       |FROM fr""".stripMargin
  }

  /** DuckDB replay of the stub decode: UTF-8 bytes via hex pairs,
    * per-lane strided fold with explicit mod-2^64 wrap (HUGEINT), then
    * the same (h mod 1000)/1000 division. Validated byte-exact against
    * the Scala path (Java sign semantics for % match DuckDB's). */
  val featureExtractOracleSql: String = {
    val featExprs = (0 until FeatureDim).map { i =>
      s"""  CAST(list_reduce(list_prepend(CAST(${1125899906842597L + i} AS HUGEINT),
         |    list_transform(generate_series(${i + 1}, n, $FeatureDim), j -> CAST(bytes[j] AS HUGEINT))),
         |    (acc, x) -> ((acc*31 + x + CAST('9223372036854775808' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
         |      + CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
         |      - CAST('9223372036854775808' AS HUGEINT)) % 1000 AS DOUBLE) / 1000.0 AS feature_$i""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
       |), by AS (
       |  SELECT doc_id, n,
       |    list_transform(generate_series(1, n), j ->
       |      CASE WHEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*j-1, 1))-1)
       |              + (strpos('0123456789ABCDEF', substr(hx, 2*j, 1))-1) >= 128
       |           THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*j-1, 1))-1)
       |              + (strpos('0123456789ABCDEF', substr(hx, 2*j, 1))-1) - 256
       |           ELSE 16*(strpos('0123456789ABCDEF', substr(hx, 2*j-1, 1))-1)
       |              + (strpos('0123456789ABCDEF', substr(hx, 2*j, 1))-1) END) AS bytes
       |  FROM b
       |)
       |SELECT doc_id, CAST(n AS INTEGER) AS n_bytes, CAST(n % 640 AS INTEGER) AS width,
       |  CAST(n % 480 AS INTEGER) AS height,
       |$featExprs
       |FROM by""".stripMargin
  }
}
