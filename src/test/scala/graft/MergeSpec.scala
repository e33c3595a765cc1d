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

  test("applyChangelog: deletes drop keys, re-inserts revive them, null op is an upsert") {
    import spark.implicits._
    val feed = Seq(
      // k1: insert, update — latest is an upsert, survives with v2
      ("k1", 1L, 10L, "I", "v1"),
      ("k1", 2L, 20L, "U", "v2"),
      // k2: insert then delete — gone
      ("k2", 3L, 10L, "I", "v3"),
      ("k2", 4L, 20L, "D", null),
      // k3: insert, delete, RE-insert — revived with the new payload
      ("k3", 5L, 10L, "I", "v5"),
      ("k3", 6L, 20L, "D", null),
      ("k3", 7L, 30L, "I", "v7"),
      // k4: latest change has a NULL op — an upsert, not a tombstone
      ("k4", 8L, 10L, "I", "v8"),
      ("k4", 9L, 20L, null, "v9"),
      // k5: same-ts delete loses to the higher tiebreak upsert
      ("k5", 10L, 10L, "D", null),
      ("k5", 11L, 10L, "U", "v11")
    ).toDF("key", "id", "ts", "op", "payload")
    val snap = Merge.applyChangelog(feed, Seq(col("key")),
        orderCol = col("ts"), tiebreak = col("id"),
        opCol = col("op"), deleteOp = "D")
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(snap == Map("k1" -> "v2", "k3" -> "v7", "k4" -> "v9", "k5" -> "v11"))
  }

  test("scd2Changelog: deletes close intervals, re-inserts reopen, state==op feeds work") {
    import spark.implicits._
    // k1: A,A (run extends), B, DELETE, B again — the delete closes B's
    //     first interval AND separates the two same-state B runs;
    // k2: A then trailing DELETE — no is_current row survives;
    // k3: consecutive DELETEs collapse to one closing run
    val feed = Seq(
      ("k1", 1L, 10L, "A"), ("k1", 2L, 20L, "A"), ("k1", 3L, 30L, "B"),
      ("k1", 4L, 40L, "D"), ("k1", 5L, 50L, "B"),
      ("k2", 6L, 10L, "A"), ("k2", 7L, 20L, "D"),
      ("k3", 8L, 10L, "A"), ("k3", 9L, 20L, "D"), ("k3", 10L, 30L, "D"),
      ("k3", 11L, 40L, "A")
    ).toDF("key", "id", "ts", "state")
    val got = Merge.scd2Changelog(feed, Seq(col("key")),
        stateCol = col("state"), orderCol = col("ts"), tiebreak = col("id"),
        opCol = col("state"), deleteOp = "D")
      .select(col("key"), col("state"),
        col("eff_start"), col("eff_end"), col("is_current"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("eff_start"),
        Option(r.getAs[Any]("eff_end")).map(_.asInstanceOf[Long]),
        r.getBoolean(4))).toSet
    assert(got == Set(
      ("k1", "A", 10L, Some(30L), false),
      ("k1", "B", 30L, Some(40L), false),   // closed by the delete
      ("k1", "B", 50L, None, true),         // re-opened after the delete
      ("k2", "A", 10L, Some(20L), false),   // trailing delete: no current row
      ("k3", "A", 10L, Some(20L), false),   // consecutive deletes = one close
      ("k3", "A", 40L, None, true)))
    // helper column does not leak
    assert(!Merge.scd2Changelog(feed, Seq(col("key")), col("state"),
      col("ts"), col("id"), col("state"), "D").columns.contains("__scd_state"))
  }

  test("applyChangelog == keepLatest on a delete-free feed") {
    import spark.implicits._
    val feed = Seq(
      ("k1", 1L, 10L, "U", "v1"), ("k1", 2L, 20L, "U", "v2"),
      ("k2", 3L, 5L, "I", "v3")
    ).toDF("key", "id", "ts", "op", "payload")
    val viaCdc = Merge.applyChangelog(feed, Seq(col("key")),
      col("ts"), col("id"), col("op"), deleteOp = "D")
    val viaLatest = Merge.keepLatest(feed, Seq(col("key")), col("ts"), col("id"))
    assert(viaCdc.exceptAll(viaLatest).count() == 0)
    assert(viaLatest.exceptAll(viaCdc).count() == 0)
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

  test("scd2: runs collapse, re-observations extend, history closes intervals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val log = Seq(
      // user 1: A A B A — four observations, three state runs
      (1L, 10L, 100L, "A"),
      (1L, 20L, 101L, "A"), // same state: extends the open interval
      (1L, 30L, 102L, "B"),
      (1L, 40L, 103L, "A"), // A returns: a NEW interval, not a merge
      // user 2: single state, stays current forever
      (2L, 15L, 200L, "X"))
      .toDF("user_id", "t", "event_id", "state")
    val got = graft.operators.Merge.scd2(log,
        keys = Seq(col("user_id")), stateCol = col("state"),
        orderCol = col("t"), tiebreak = col("event_id"))
      .select("user_id", "state", "eff_start", "eff_end", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 15L, None, true)))
  }

  test("scd2 current rows == keepLatest (the reference L2 upsert view)") {
    val events = graft.sources.Tables.events(spark, sfDir)
    import org.apache.spark.sql.functions._
    val current = graft.operators.Etl.scd2History(spark, sfDir)
      .filter(col("is_current"))
      .select(col("user_id"), col("state"))
    val latest = graft.operators.Merge.keepLatest(
        events.select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
        keys = Seq(col("user_id")),
        orderCol = col("ts"), tiebreak = col("event_id"))
      .select(col("user_id"), col("event_type").as("state"))
    assert(current.exceptAll(latest).count() == 0)
    assert(latest.exceptAll(current).count() == 0)
  }

  test("scd2: consecutive null states collapse; null<->value transitions are change points") {
    import spark.implicits._
    val log = Seq(
      (1L, Option.empty[String], 10L, 1L),
      (1L, Option.empty[String], 20L, 2L), // same (null) state: extends the interval
      (1L, Option("A"), 30L, 3L),
      (1L, Option.empty[String], 40L, 4L),
      (1L, Option.empty[String], 50L, 5L)
    ).toDF("user_id", "state", "t", "event_id")
    val got = Merge.scd2(log,
        keys = Seq(col("user_id")), stateCol = col("state"),
        orderCol = col("t"), tiebreak = col("event_id"))
      .select("user_id", "state", "eff_start", "eff_end", "is_current")
      .collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getString(1)), r.getLong(2),
                 if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (None, 10L, Some(30L), false),
      (Some("A"), 30L, Some(40L), false),
      (None, 40L, None, true)))
  }

  test("snapshot diff: added/removed/changed classified; unchanged dropped; null-safe") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, Some(10.0), "a"),             // unchanged
      (2L, Some(20.0), "b"),             // value changes
      (3L, Option.empty[Double], "c"),   // NULL -> value: a change
      (4L, Some(40.0), "d")              // removed in new
    ).toDF("k", "v", "tag")
    val newSnap = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, Some(30.0), "c"),
      (5L, Some(50.0), "e")              // added
    ).toDF("k", "v", "tag")
    val got = Merge.snapshotDiff(oldSnap, newSnap, keys = Seq("k"), compare = Seq("v", "tag"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("status")).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("snapshot diff: old and new values ride side by side") {
    import spark.implicits._
    val oldSnap = Seq((1L, 1.0)).toDF("k", "v")
    val newSnap = Seq((1L, 2.0)).toDF("k", "v")
    val r = Merge.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("v")).collect().head
    assert(r.getAs[Double]("old_v") == 1.0 && r.getAs[Double]("new_v") == 2.0)
  }

  test("snapshot diff driver key: append-only source never yields removed") {
    val rows = graft.operators.Etl.etlSnapshotDiff(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses.subsetOf(Set("added", "changed")), s"got $statuses")
    // a changed key's latest row advanced: new (ts, id) >= old
    rows.filter(_.getAs[String]("status") == "changed").foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("new_ts").before(r.getAs[java.sql.Timestamp]("old_ts")))
    }
  }

  test("mergeInto: update/delete/insert clauses resolve; tombstone insert is a no-op") {
    import spark.implicits._
    val target = Seq(("k1", "a", 1L), ("k2", "b", 1L), ("k3", "c", 1L))
      .toDF("key", "state", "ver")
    val source = Seq(
      ("k2", "b2", 2L),   // matched -> update
      ("k3", "DEL", 2L),  // matched + delete cond -> delete
      ("k4", "d", 2L),    // unmatched -> insert
      ("k5", "DEL", 2L)   // unmatched tombstone -> NO-OP (default insertCond)
    ).toDF("key", "state", "ver")
    val out = Merge.mergeInto(target, source, Seq("key"),
        deleteCond = col("state") === "DEL")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      "k1" -> ("a", 1L),    // untouched target survives
      "k2" -> ("b2", 2L),   // source wins on match
      "k4" -> ("d", 2L)))   // inserted
  }

  test("mergeInto: SQL-standard unconditional INSERT via insertCond override") {
    import spark.implicits._
    val target = Seq(("k1", "a")).toDF("key", "state")
    val source = Seq(("k5", "DEL")).toDF("key", "state")
    val out = Merge.mergeInto(target, source, Seq("key"),
        deleteCond = col("state") === "DEL",
        insertCondOpt = Some(lit(true)))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("k1", "k5"), "lit(true) insertCond must insert tombstones too")
  }

  test("mergeInto applies deletes only to the INCOMING batch — not cdcApply over the full log") {
    import spark.implicits._
    // user u1's LAST pre-cutoff change is the delete op; no post-cutoff
    // rows. MERGE keeps the target snapshot row (the delete clause
    // never sees u1); a full-log changelog apply drops u1.
    val log = Seq(
      ("u1", 1L, "error", 1L), ("u2", 2L, "view", 1L), // pre-cutoff
      ("u2", 3L, "click", 5L)                          // post-cutoff
    ).toDF("key", "id", "state", "ts")
    def snap(df: org.apache.spark.sql.DataFrame) =
      Merge.keepLatest(df, Seq(col("key")), col("ts"), col("id"))
    val merged = Merge.mergeInto(
        snap(log.where(col("ts") < 3)), snap(log.where(col("ts") >= 3)),
        Seq("key"), deleteCond = col("state") === "error")
      .collect().map(_.getString(0)).toSet
    val fullLog = Merge.applyChangelog(log, Seq(col("key")),
        col("ts"), col("id"), col("state"), "error")
      .collect().map(_.getString(0)).toSet
    assert(merged == Set("u1", "u2"), "MERGE keeps the pre-cutoff error-state row")
    assert(fullLog == Set("u2"), "changelog apply drops the deleted key")
  }

  test("mergeInto driver key: merged snapshot differs from cdcApply exactly on pre-cutoff-error users") {
    val merged = graft.operators.Etl.etlMergeInto(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val cdc = graft.operators.Etl.cdcApply(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0)).toSet
    // every user cdcApply keeps, MERGE keeps too (deletes in the batch
    // are a superset-restriction of deletes over the log only for the
    // final state; inclusion holds because a post-cutoff non-error
    // latest row implies the same surviving row both ways)
    assert(cdc.subsetOf(merged))
    assert(merged.nonEmpty)
  }

  test("scd2 enrich: as-of state covers, delete spans and pre-history read NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    // user 5's browsing history: a@10, b@12, deleted@14, a@16
    // purchases at 09 (pre-history), 11 (inside a-run), 13 (inside
    // b-run), 15 (inside the deleted span), 17 (after re-insert)
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 5L, "a", 0.0),
      (2L, ts("2024-03-01 12:00:00"), 5L, "b", 0.0),
      (3L, ts("2024-03-01 14:00:00"), 5L, "error", 0.0),
      (4L, ts("2024-03-01 16:00:00"), 5L, "a", 0.0),
      (10L, ts("2024-03-01 09:00:00"), 5L, "purchase", 1.0),
      (11L, ts("2024-03-01 11:00:00"), 5L, "purchase", 2.0),
      (12L, ts("2024-03-01 13:00:00"), 5L, "purchase", 3.0),
      (13L, ts("2024-03-01 15:00:00"), 5L, "purchase", 4.0),
      (14L, ts("2024-03-01 17:00:00"), 5L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_enrich").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Etl.scd2Enrich(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.getString(4)).orNull).toMap
    assert(got == Map(10L -> null, 11L -> "a", 12L -> "b",
      13L -> null, 14L -> "a"),
      s"as-of states wrong: $got")
  }
}
