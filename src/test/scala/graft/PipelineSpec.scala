package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

class PipelineSpec extends SparkSpecBase {

  test("per-ds pipeline: two partitions land, rerun is idempotent") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val ds1 = "2024-01-15"
    val ds2 = "2024-01-16"

    val r1 = Pipeline.runDs(spark, sfDir, lake, ds1)
    assert(r1.nNormalized > 0 && r1.nL2 > 0 && r1.nL2 <= r1.nNormalized)

    val r2 = Pipeline.runDs(spark, sfDir, lake, ds2)
    assert(r2.nNormalized > 0)

    val l2 = spark.read.parquet(s"$lake/l2")
    val afterBoth = l2.count()
    assert(afterBoth == r1.nL2 + r2.nL2, "partitions are disjoint by date")

    // rerun ds1: same content, nothing duplicated, ds2 untouched
    val r1b = Pipeline.runDs(spark, sfDir, lake, ds1)
    assert(r1b.nL2 == r1.nL2)
    val afterRerun = spark.read.parquet(s"$lake/l2").count()
    assert(afterRerun == afterBoth, "rerun must not duplicate or clobber")

    // L2 invariant: one row per (user, type) within each date partition
    val dups = spark.read.parquet(s"$lake/l2")
      .groupBy("event_date", "user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("DQ gate rejects an empty batch instead of loading it") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake2").toString
    intercept[Pipeline.DataQualityException] {
      // a ds with no events in the corpus
      Pipeline.runDs(spark, sfDir, lake, "1999-12-31")
    }
    // nothing was written
    assert(!new java.io.File(s"$lake/l2").exists())
  }

  test("run ledger: a normal run logs every stage with verdicts, rows, timings") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake_lg").toString
    val ds = "2024-01-15"
    val r = Pipeline.runDs(spark, sfDir, lake, ds)
    val rows = Pipeline.readRunLedger(spark, lake).collect()
      .map(x => (x.getString(0), x.getInt(1), x.getString(2), x.getString(3),
        x.getLong(4), x.getLong(5), x.getString(6), x.getLong(7)))
      .sortBy(_._2)
    assert(rows.map(_._3).sameElements(
      Array("normalize_dq_gate", "staging_write", "l2_merge")))
    assert(rows.forall(_._1 == ds) && rows.forall(_._4 != "rejected"))
    val gate = rows(0); val merge = rows(2)
    assert(gate._4 == "pass" && gate._6 == r.nNormalized)
    assert(merge._6 == r.nL2 && merge._5 == r.nNormalized)
    assert(rows.forall(_._8 >= 0L), "stage timings must be recorded")
    // a rerun REPLACES the ledger (idempotent like the partitions)
    Pipeline.runDs(spark, sfDir, lake, ds)
    assert(Pipeline.readRunLedger(spark, lake).count() == 3)
  }

  test("run ledger: a DQ-rejected run still leaves its rejection row") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake_lg2").toString
    intercept[Pipeline.DataQualityException] {
      Pipeline.runDs(spark, sfDir, lake, "1999-12-31")
    }
    val rows = Pipeline.readRunLedger(spark, lake).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(2) == "normalize_dq_gate" && r.getString(3) == "rejected")
    assert(r.getString(6).contains("empty batch") && r.getLong(5) == 0L)
    // the rejected run wrote the LOG and nothing else
    assert(!new java.io.File(s"$lake/l2").exists())
    assert(!new java.io.File(s"$lake/staging").exists())
  }

  test("runDsWithL1 loads the gated batch into the row store, rerun-idempotent") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake_l1").toString
    val url = "jdbc:derby:memory:graft_pipe_l1;create=true"
    val ds = "2024-01-15"
    val r1 = Pipeline.runDsWithL1(spark, sfDir, lake, ds, url, "app.l1_pipe")
    val l1 = graft.operators.Jdbc.readJdbc(spark, url, "app.l1_pipe")
    assert(l1.count() == r1.nNormalized, "L1 holds exactly the normalized batch")
    // rerun: upsert on PK — same keys, same values, nothing duplicated
    Pipeline.runDsWithL1(spark, sfDir, lake, ds, url, "app.l1_pipe")
    assert(graft.operators.Jdbc.readJdbc(spark, url, "app.l1_pipe").count() == r1.nNormalized)
  }

  test("stratified sample: per-stratum caps, nesting, and determinism") {
    import org.apache.spark.sql.functions.count
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val perLangN = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s50 = graft.operators.Etl.sampleStratified(spark, sfDir, target = 50)
    val perLang = s50.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      // a binomial draw at rate target/n_stratum: expect ~50, allow wide slack
      assert(n > 20 && n < 90, s"$lang drew $n docs for target 50")
    }
    // strata smaller than the target are kept whole
    val small = perLangN.filter(_._2 <= 50).keySet
    small.foreach(l => assert(perLang(l) == perLangN(l)))
    // nested: every doc in the 20-target cut is in the 50-target cut
    val s20 = graft.operators.Etl.sampleStratified(spark, sfDir, target = 20)
    assert(s20.join(s50, Seq("doc_id"), "left_anti").count() == 0)
    // deterministic across runs
    assert(graft.operators.Etl.sampleStratified(spark, sfDir, target = 50)
      .exceptAll(s50).count() == 0)
  }

  test("DQ gate rejects an all-NaN/null metric batch (broken extract)") {
    import spark.implicits._
    // reference behavior: normalize_open_meteo_to_parquet.py:94-96
    // rejects a batch whose metric column carries no real observation
    val allBad = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), 7, "view", Double.NaN),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 11:00:00"), 8, "view", Double.NaN))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("value", when(col("event_id") === 2L, lit(null).cast("double"))
        .otherwise(col("value")))
    val ex = intercept[Pipeline.DataQualityException] {
      Pipeline.dqGate(allBad, "2024-01-15")
    }
    assert(ex.getMessage.contains("entirely null/NaN"))
    // a single real observation is enough to pass the gate
    val oneGood = allBad.withColumn("value",
      when(col("event_id") === 1L, lit(3.5)).otherwise(col("value")))
    assert(Pipeline.dqGate(oneGood, "2024-01-15") == 2L)
  }

  test("runBackfill: ledger-aware sweep executes the work-list; an injected " +
      "mid-run failure is isolated; the rerun resumes at exactly the failed " +
      "day and a third sweep finds no work") {
    // 3-day mini source: a full-corpus sweep would run ~30 runDs calls
    val src = java.nio.file.Files.createTempDirectory("graft_backfill_src").toString
    val days = Seq("2024-01-15", "2024-01-16", "2024-01-17")
    graft.sources.Tables.events(spark, sfDir)
      .filter(to_date(col("ts")).cast("string").isin(days: _*))
      .write.parquet(s"$src/events.parquet")
    val lake = java.nio.file.Files.createTempDirectory("graft_backfill_lake").toString
    // sweep 1: the middle day throws a transient (non-DQ) failure
    var calls = Vector.empty[String]
    def flaky(s: org.apache.spark.sql.SparkSession, sd: String, lk: String,
              ds: String): Pipeline.DsRunSummary = {
      calls :+= ds
      if (ds == days(1)) throw new RuntimeException("injected transient failure")
      Pipeline.runDs(s, sd, lk, ds)
    }
    val s1 = Pipeline.runBackfill(spark, src, lake, runOne = flaky)
    assert(calls == days.toVector, "sweep 1 must attempt every day in order")
    assert(s1.map(b => (b.ds, b.status)) ==
      Seq((days(0), "ok"), (days(1), "failed"), (days(2), "ok")),
      s"one day's failure must not abort the sweep, got $s1")
    assert(spark.read.parquet(s"$lake/l2")
      .select(col("event_date").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq == Seq(days(0), days(2)))
    // sweep 2: resumes at EXACTLY the failed day — completed days
    // short-circuit on their ledger rows, nothing recomputes
    calls = Vector.empty
    val s2 = Pipeline.runBackfill(spark, src, lake,
      runOne = (s, sd, lk, ds) => { calls :+= ds; Pipeline.runDs(s, sd, lk, ds) })
    assert(calls == Vector(days(1)),
      s"the rerun must retry only the failed day, attempted $calls")
    assert(s2.map(b => (b.ds, b.status)) == Seq((days(1), "ok")))
    assert(spark.read.parquet(s"$lake/l2")
      .select(col("event_date").cast("string")).distinct()
      .count() == 3)
    // sweep 3: ledger says complete — zero work, zero runs
    val s3 = Pipeline.runBackfill(spark, src, lake)
    assert(s3.isEmpty, s"a complete lake must yield an empty sweep, got $s3")
  }
}
