package graft

import org.apache.spark.sql.functions._
import graft.operators.Jdbc

/** Upsert-sink roundtrips against embedded Derby (in-memory, on the
  * Spark unmanaged classpath) — the reference's Postgres L1 load
  * semantics: DDL-if-absent, batched last-write-wins on the PK,
  * idempotent reruns (load_parquet_to_postgres_l1.py:37-149). */
class JdbcSpec extends SparkSpecBase {

  private def freshUrl(name: String) = s"jdbc:derby:memory:$name;create=true"

  private def mkBatch(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-15 10:00:00")))
      .withColumn("load_ds", lit(java.sql.Date.valueOf("2024-02-01")))
  }

  test("upsert: creates table, loads, rerun is idempotent, overlap wins last") {
    val url = freshUrl("graft_upsert")
    val batch1 = mkBatch(Seq((1L, "view", 1.5), (2L, "click", 2.5), (3L, "view", 3.5)))

    // first load creates the table (DDL-if-absent) and inserts
    val n1 = Jdbc.writeJdbcUpsert(batch1, url, "app.l1_events", Seq("event_id"))
    assert(n1 == 3)
    val readBack = Jdbc.readJdbc(spark, url, "app.l1_events")
    assert(readBack.count() == 3)

    // identical rerun: same content, nothing duplicated
    val n2 = Jdbc.writeJdbcUpsert(batch1, url, "app.l1_events", Seq("event_id"))
    assert(n2 == 3)
    assert(Jdbc.readJdbc(spark, url, "app.l1_events").count() == 3)

    // overlapping batch: id=2 updated, id=4 inserted — last write wins
    val batch2 = mkBatch(Seq((2L, "click", 99.0), (4L, "purchase", 4.5)))
    Jdbc.writeJdbcUpsert(batch2, url, "app.l1_events", Seq("event_id"))
    val after = Jdbc.readJdbc(spark, url, "app.l1_events")
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(after == Set(
      (1L, "view", 1.5), (2L, "click", 99.0), (3L, "view", 3.5), (4L, "purchase", 4.5)))
  }

  test("upsert: composite PK updates only the matching key") {
    import spark.implicits._
    val url = freshUrl("graft_upsert_ck")
    val df1 = Seq((10L, "a", 1.0), (10L, "b", 2.0))
      .toDF("user_id", "event_type", "value")
    Jdbc.writeJdbcUpsert(df1, url, "app.l1_keyed", Seq("user_id", "event_type"))
    val df2 = Seq((10L, "b", 20.0)).toDF("user_id", "event_type", "value")
    Jdbc.writeJdbcUpsert(df2, url, "app.l1_keyed", Seq("user_id", "event_type"))
    val rows = Jdbc.readJdbc(spark, url, "app.l1_keyed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((10L, "a", 1.0), (10L, "b", 20.0)))
  }

  test("upsert: nulls in non-PK columns survive the roundtrip") {
    import spark.implicits._
    val url = freshUrl("graft_upsert_null")
    val df = Seq((1L, Some(1.5)), (2L, None))
      .toDF("event_id", "value")
    Jdbc.writeJdbcUpsert(df, url, "app.l1_nulls", Seq("event_id"))
    val back = Jdbc.readJdbc(spark, url, "app.l1_nulls")
    assert(back.filter(col("value").isNull).select("event_id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("upsert: typical L1 flow — keepLatest merge then load") {
    // the reference pipeline shape: dedupe to PK-unique upstream
    // (pandas dedupe / L2 ROW_NUMBER), then batched upsert
    val url = freshUrl("graft_upsert_flow")
    val merged = graft.operators.Merge.keepLatest(
      graft.sources.Tables.events(spark, sfDir),
      keys = Seq(col("user_id"), col("event_type")),
      orderCol = col("ts"), tiebreak = col("event_id"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val n = Jdbc.writeJdbcUpsert(merged, url, "app.l1_latest",
      Seq("user_id", "event_type"))
    assert(n == merged.count())
    assert(Jdbc.readJdbc(spark, url, "app.l1_latest").count() == n)
  }

  test("postgres dialect emits the reference's ON CONFLICT statement") {
    val sql = Jdbc.PostgresDialect
      .upsertSql("public.l1", Seq("ts", "value", "source"), Seq("ts", "source")).get
    assert(sql.contains("ON CONFLICT (ts, source) DO UPDATE SET value = EXCLUDED.value"))
    assert(!sql.contains("EXCLUDED.ts"), "PK columns are never in the SET list")
    assert(Jdbc.dialectFor("jdbc:postgresql://h/db") == Jdbc.PostgresDialect)
    assert(Jdbc.dialectFor("jdbc:derby:memory:x") == Jdbc.DeleteInsertDialect)
  }

  test("ensureTable probe escapes LIKE wildcards: decoy table does not mask a missing one") {
    import spark.implicits._
    val url = freshUrl("graft_upsert_like")
    // decoy whose name matches "events_l1" as a LIKE pattern ('_' = any char)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("CREATE TABLE eventsXl1 (k BIGINT NOT NULL, PRIMARY KEY (k))")
      finally st.close()
    } finally conn.close()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // an unescaped probe would see the decoy, skip CREATE, and the
    // upsert would die with 'events_l1 does not exist'
    assert(Jdbc.writeJdbcUpsert(df, url, "events_l1", Seq("k")) == 2L)
    // rerun still idempotent (the probe now finds the real table)
    assert(Jdbc.writeJdbcUpsert(df, url, "events_l1", Seq("k")) == 2L)
    assert(Jdbc.readJdbc(spark, url, "events_l1").count() == 2)
  }
}
