package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.operators.Ingest

class IngestSpec extends SparkSpecBase {

  test("raw zone roundtrip: payload verbatim, idempotent per-ds, parse with quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val src = s"$dir/feed.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src),
      """{"k": 1, "v": "alpha"}
        |{"k": 2, "v": "beta"}
        |this line is not json
        |{"k": 3, "v": "gamma"}
        |""".stripMargin)

    val raw = s"$dir/raw"
    val env = Ingest.envelopes(spark, src, "feed", "2024-05-01")
    Ingest.landRaw(env, raw)
    // verbatim: every input line is present byte-for-byte
    val stored = spark.read.parquet(raw)
    assert(stored.count() == 4)
    assert(stored.filter(col("payload") === "this line is not json").count() == 1)

    // idempotent: re-landing the same ds does not duplicate
    Ingest.landRaw(Ingest.envelopes(spark, src, "feed", "2024-05-01"), raw)
    assert(spark.read.parquet(raw).count() == 4)

    // a second source partition coexists
    Ingest.landRaw(Ingest.envelopes(spark, src, "feed2", "2024-05-01"), raw)
    assert(spark.read.parquet(raw).count() == 8)

    // parse: good rows typed, bad row quarantined not fatal
    val parsed = Ingest.parseRaw(spark, raw, "2024-05-01",
      StructType.fromDDL("k INT, v STRING"))
      .filter(col("source") === "feed")
    assert(parsed.count() == 4)
    assert(parsed.filter(col("k").isNotNull).count() == 3)
    val bad = parsed.filter(col("_corrupt").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getAs[String]("_corrupt") == "this line is not json")
  }
}
