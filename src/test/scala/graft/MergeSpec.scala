package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpecBase {

  test("keepLatest: last write wins per key with deterministic tiebreak") {
    import spark.implicits._
    val log = Seq(
      ("k1", 1L, 10L, "v1"),
      ("k1", 2L, 20L, "v2"),   // latest ts for k1
      ("k1", 3L, 20L, "v3"),   // same ts, higher tiebreak -> wins
      ("k2", 4L, 5L, "v4")
    ).toDF("key", "id", "ts", "payload")
    val kept = Merge.keepLatest(log, Seq(col("key")), col("ts"), col("id"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(kept == Map("k1" -> "v3", "k2" -> "v4"))
  }

  test("keepFirst: earliest wins; helper column removed") {
    import spark.implicits._
    val log = Seq(
      ("k1", 1L, 10L, "v1"),
      ("k1", 2L, 5L, "v2"),
      ("k2", 3L, 7L, "v3")
    ).toDF("key", "id", "ts", "payload")
    val kept = Merge.keepFirst(log, Seq(col("key")), col("ts"), col("id"))
    assert(!kept.columns.contains("__rn"))
    val m = kept.collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(m == Map("k1" -> "v2", "k2" -> "v3"))
  }

  test("generic dedup entry points run on arbitrary frames") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text here"),
      (2L, "same text here"),
      (3L, "SAME   text here"),
      (4L, "different entirely")
    ).toDF("doc_id", "text")
    val exact = graft.operators.Dedup.exactOn(docs).collect()
    assert(exact.length == 3) // 1+2 merge, 3 and 4 separate
    val norm = graft.operators.Dedup.exactNormalizedOn(docs).collect()
    assert(norm.length == 2) // 1+2+3 merge after canonicalization
    assert(norm.map(_.getLong(2)).sorted.toSeq == Seq(1L, 3L))
  }
}
