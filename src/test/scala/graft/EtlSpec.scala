package graft

import org.apache.spark.sql.functions._
import graft.operators.{Etl, Sinks}

class EtlSpec extends SparkSpecBase {

  test("normalize: fixed schema, derived date/hour, parsed props") {
    val df = Etl.normalize(spark, sfDir)
    assert(df.columns.toSeq == Seq("event_id", "ts", "event_date", "event_hour",
      "user_id", "event_type", "value", "prop_k", "source", "load_ds"))
    val rows = df.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getInt(r.fieldIndex("event_hour"))
      assert(h >= 0 && h <= 23)
      assert(r.getString(r.fieldIndex("load_ds")) == Etl.LoadDs)
    }
    // safe-cast contract: on this corpus prop_k parses for almost all
    // rows — assert a null-rate bound, not exactly zero (the cast is
    // allowed to fire on dirty input; see malformed-props test below).
    val total = df.count()
    assert(total == sources.Tables.events(spark, sfDir).count())
    assert(df.filter(col("prop_k").isNull).count() <= total / 10)
  }

  test("normalize/schema_enforce safe cast: malformed props -> NULL, no failure") {
    import spark.implicits._
    val bad = Seq(
      ("{\"k\": 7}", Some(7)),          // clean
      ("{\"k\": \"oops\"}", None),      // non-numeric k
      ("not json at all", None),        // unparseable payload
      ("{\"j\": 1}", None)              // missing key
    ).toDF("props", "expected")
    val parsed = bad.select(
      from_json(col("props"), lit("k STRING")).getField("k")
        .try_cast("int").as("prop_k"),
      col("expected"))
    parsed.collect().foreach { r =>
      val exp = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val got = if (r.isNullAt(0)) None else Some(r.getInt(0))
      assert(got == exp, s"row $r")
    }
  }

  test("keep_latest: one row per key, and it is the max-ts row") {
    val kept = Etl.keepLatest(spark, sfDir).cache()
    val keys = kept.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(keys == 0, "keep_latest must emit exactly one row per key")
    // the kept ts equals the per-key max ts
    val maxTs = sources.Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type").agg(max("ts").as("max_ts"))
    val mismatched = kept.join(maxTs, Seq("user_id", "event_type"))
      .filter(col("ts") =!= col("max_ts")).count()
    assert(mismatched == 0)
  }

  test("dq_report: counts consistent on clean data") {
    val r = Etl.dqReport(spark, sfDir).collect()(0)
    assert(r.getLong(r.fieldIndex("n_rows")) > 0)
    assert(r.getLong(r.fieldIndex("pk_violations")) == 0)
    assert(r.getLong(r.fieldIndex("n_null_event_id")) == 0)
  }

  test("schema_enforce: contract types, money quantized to cents") {
    val df = Etl.schemaEnforce(spark, sfDir)
    val types = df.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(types("event_id") == "BIGINT")
    assert(types("user_id") == "INT")
    assert(types("value_2dp") == "DOUBLE")
    assert(types("prop_k") == "INT")
    // quantization: value_2dp round-trips through DECIMAL(12,2) exactly
    val notQuantized = df.filter(
      col("value_2dp") =!= col("value_2dp").cast("decimal(12,2)").cast("double")).count()
    assert(notQuantized == 0)
  }

  test("dq_profile: ordered percentiles bracketed by min/max per group") {
    val rows = Etl.dqProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vals = (2 to 6).map(r.getDouble) // min, p25, p50, p75, p95
      val mx = r.getDouble(7)
      assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
      assert(vals.last <= mx)
      assert(r.getLong(1) > 0)
    }
  }

  test("incremental_ds slice + partitioned sink is idempotent on rerun") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val slice = Etl.incrementalDs(spark, sfDir).cache()
    val n = slice.count()
    assert(n > 0, s"no events on ds=${Etl.IncrementalDs}")
    Sinks.writePartitioned(slice, out, Seq("event_date"))
    val afterFirst = spark.read.parquet(out).count()
    // rerun the same ds: dynamic overwrite must replace, not append
    Sinks.writePartitioned(slice, out, Seq("event_date"))
    val afterSecond = spark.read.parquet(out).count()
    assert(afterFirst == n && afterSecond == n)
    // writing a different ds must not clobber the first partition
    val other = Etl.normalize(spark, sfDir)
      .filter(col("event_date") === lit("2024-01-16").cast("date"))
    Sinks.writePartitioned(other, out, Seq("event_date"))
    assert(spark.read.parquet(out).count() == n + other.count())
  }

  test("deterministic sampling: reproducible, rate-bounded, monotone in rate") {
    val a = Etl.sampleDeterministic(spark, sfDir).collect().map(_.getLong(0)).toSet
    val b = Etl.sampleDeterministic(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(a == b, "same key set must be selected on every run")
    val total = sources.Tables.documents(spark, sfDir).count().toDouble
    assert(a.size / total > 0.10 && a.size / total < 0.30,
      s"20% hash sample came out at ${a.size / total}")
    // raising the rate only ADDS keys (bucket predicate is monotone)
    val wider = Etl.sampleDeterministic(spark, sfDir, pct = 50)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
  }

  test("compaction: file count shrinks, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val data = s"$dir/data"
    // fragment: 64 tiny files
    val src = Etl.normalize(spark, sfDir).repartition(64)
    src.write.mode("overwrite").parquet(data)
    def parquetFiles = new java.io.File(data).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 32, s"fragmentation setup produced only $before files")
    val expected = spark.read.parquet(data).collect()
      .map(_.toString).sorted
    Sinks.compact(spark, data, s"$dir/tmp", targetRowsPerFile = 100000L)
    val after = parquetFiles
    assert(after < before / 4, s"compaction left $after files (was $before)")
    val got = spark.read.parquet(data).collect().map(_.toString).sorted
    assert(got.sameElements(expected), "compaction must preserve content exactly")
  }

  test("partitioned compaction: per-value salting splits big partitions, content identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_p").toString
    val data = s"$dir/data"
    val src = Etl.normalize(spark, sfDir)
    src.write.mode("overwrite").partitionBy("event_date").parquet(data)
    val expected = spark.read.parquet(data).collect().map(_.toString).sorted
    // tiny target forces EVERY partition value to need multiple files
    Sinks.compact(spark, data, s"$dir/tmp", targetRowsPerFile = 10L,
      partitionCols = Seq("event_date"))
    val partDirs = new java.io.File(data).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(partDirs.nonEmpty)
    // a partition with >10 rows must have been split across >1 file
    val multiFile = partDirs.count(_.listFiles().count(_.getName.endsWith(".parquet")) > 1)
    assert(multiFile > 0, "per-value salting never split a partition")
    val got = spark.read.parquet(data).collect().map(_.toString).sorted
    assert(got.sameElements(expected))
  }

  test("normalizeTz: DST gap shifts forward, ambiguity resolves to earlier offset") {
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft_tz").toString
    Seq(
      (1L, "2024-03-10 02:30:00"), // inside the NY spring-forward gap (02:00-03:00 does not exist)
      (2L, "2024-11-03 01:30:00"), // ambiguous: occurs twice at fall-back
      (3L, "2024-06-15 12:00:00")) // plain summer instant (EDT, -4)
      .toDF("event_id", "ts_str")
      .select(col("event_id"), col("ts_str").cast("timestamp").as("ts"),
        lit(7).as("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
        lit("""{"k":"1"}""").as("props"))
      .write.mode("overwrite").parquet(s"$lake/events.parquet")
    val out = Etl.normalizeTz(spark, lake, srcTz = "America/New_York")
      .select("event_id", "ts_utc").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toMap
    // gap: 02:30 EST does not exist -> shift forward to 03:30 EDT = 07:30 UTC
    // (the reference's nonexistent="shift_forward" policy)
    assert(out(1L) == "2024-03-10 07:30:00.0")
    // ambiguous: earlier offset (EDT, -4) wins deterministically -> 05:30 UTC
    assert(out(2L) == "2024-11-03 05:30:00.0")
    // plain: EDT -4
    assert(out(3L) == "2024-06-15 16:00:00.0")
  }

  test("csv and json roundtrip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val df = Etl.schemaEnforce(spark, sfDir)
      .select("event_id", "user_id", "event_type", "prop_k").limit(100).cache()
    Sinks.writeCsv(df, s"$dir/csv")
    val backCsv = Sinks.readCsv(spark, s"$dir/csv", df.schema)
    assert(backCsv.count() == 100)
    assert(backCsv.schema == df.schema)
    Sinks.writeJsonLines(df, s"$dir/json")
    val backJson = Sinks.readJsonLines(spark, s"$dir/json", df.schema)
    assert(backJson.count() == 100)
    assert(backJson.exceptAll(df).count() == 0)
  }

  test("orc roundtrip: schema in the footer, values and partitions intact") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).limit(200).cache()
    Sinks.writeOrc(df, s"$dir/flat")
    val back = Sinks.readOrc(spark, s"$dir/flat")
    assert(back.schema == df.schema, "orc must carry the schema losslessly")
    assert(back.count() == 200)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // partitioned form: one dir per event_type, values preserved
    Sinks.writeOrc(df, s"$dir/part", Seq("event_type"))
    val backPart = Sinks.readOrc(spark, s"$dir/part")
    assert(backPart.count() == 200)
    assert(backPart.select(df.columns.map(col): _*)
      .exceptAll(df).count() == 0)
    // dynamic overwrite: rewriting ONE partition leaves siblings
    // intact (static mode would wipe them all — r6 review)
    val one = df.filter(col("event_type") === "click")
    Sinks.writeOrc(one, s"$dir/part", Seq("event_type"))
    assert(Sinks.readOrc(spark, s"$dir/part").count() == 200,
      "sibling partitions must survive a single-partition rewrite")
    df.unpersist()
  }

  test("normalizeArrays: parallel arrays explode to one typed row per element, losslessly") {
    val out = Etl.normalizeArrays(Etl.arrayPayloads(spark, sfDir)).cache()
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(out.count() == ev.count())
    assert(out.columns.toSeq == Seq("ts", "date", "hour", "latitude", "longitude",
      "timezone", "temperature_c", "load_ds", "source"))
    // JSON round trip is lossless at microsecond/double precision:
    // the (ts, metric) multiset survives payload build + parse + explode
    val direct = ev.select(col("ts"), col("value").as("temperature_c"))
    val viaArrays = out.select(col("ts"), col("temperature_c"))
    assert(viaArrays.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaArrays).count() == 0)
    // derived columns agree with the parsed timestamp
    assert(out.filter(col("date") =!= date_format(col("ts"), "yyyy-MM-dd")).count() == 0)
    assert(out.filter(col("hour") =!= hour(col("ts"))).count() == 0)
    assert(out.filter(col("load_ds") =!= col("date")).count() == 0)
    out.unpersist()
    ()
  }

  test("normalizeArrays DQ gates: mismatch / empty / all-NaN / malformed payloads fail the run") {
    import spark.implicits._
    def messages(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(Option(c.getMessage).getOrElse("")).append('\n'); c = c.getCause }
      sb.toString
    }
    def run(payload: String): Unit =
      Etl.normalizeArrays(Seq(("2024-01-01", payload)).toDF("ds", "payload")).collect()

    val t0 = "2024-01-01T00:00:00.000000"
    val t1 = "2024-01-01T01:00:00.000000"
    val mismatch = intercept[Throwable] {
      run(s"""{"hourly": {"time": ["$t0", "$t1"], "temperature_2m": [1.5]}}""")
    }
    assert(messages(mismatch).contains("Length mismatch hourly arrays: time=2 vs temp=1"))
    val empty = intercept[Throwable] {
      run("""{"hourly": {"time": [], "temperature_2m": []}}""")
    }
    assert(messages(empty).contains("No hourly rows produced from payload."))
    val allNaN = intercept[Throwable] {
      run(s"""{"hourly": {"time": ["$t0", "$t1"], "temperature_2m": [NaN, NaN]}}""")
    }
    assert(messages(allNaN).contains("All temperature_c values are NaN."))
    val malformed = intercept[Throwable] { run("""{"daily": {"x": 1}}""") }
    assert(messages(malformed).contains("Malformed hourly payload for ds=2024-01-01"))
    val notJson = intercept[Throwable] { run("this is not json") }
    assert(messages(notJson).contains("Malformed hourly payload"))

    // SOME NaN is fine (the gate is all-NaN, matching the reference)
    val ok = Etl.normalizeArrays(
      Seq(("2024-01-01", s"""{"hourly": {"time": ["$t0", "$t1"], "temperature_2m": [NaN, 2.5]}}"""))
        .toDF("ds", "payload")).collect()
    assert(ok.length == 2)
    assert(ok.map(_.getAs[Double]("temperature_c")).count(_.isNaN) == 1)
  }

  test("weighted mixture sampling: deterministic, rate-accurate, monotone in weight") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = Etl.sampleWeighted(spark, sfDir)
    val b = Etl.sampleWeighted(spark, sfDir)
    // reproducible: a pure function of the key
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // weight 1.0 keeps the whole source
    val nSrc0 = docs.filter(col("source") === "src0").count()
    assert(a.filter(col("source") === "src0").count() == nSrc0)
    // empirical per-source rates near the configured weights
    Seq("src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25).foreach { case (src, w) =>
      val n = docs.filter(col("source") === src).count().toDouble
      val kept = a.filter(col("source") === src).count().toDouble
      assert(math.abs(kept / n - w) < 0.25, s"$src kept ${kept / n} want ~$w")
    }
    // nested: doubling every weight only ADDS documents
    val half = Etl.sampleWeighted(spark, sfDir,
      weights = Etl.MixtureWeights.view.mapValues(_ / 2).toMap, default = 0.05)
    assert(half.exceptAll(a).count() == 0)
    assert(half.count() < a.count())
  }

  test("backfill gaps: holes flagged, continuous coverage clean, bounds inclusive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def d(s: String) = java.sql.Date.valueOf(s)
    // days 1,2,5 present; 3,4 are holes
    val dated = Seq(d("2024-02-01"), d("2024-02-01"), d("2024-02-02"), d("2024-02-05"))
      .toDF("event_date")
    val got = graft.operators.Etl.backfillGapsOn(dated).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size == 5, "one row per calendar day between min and max, inclusive")
    assert(got("2024-02-01") == ((2L, false)) && got("2024-02-02") == ((1L, false)))
    assert(got("2024-02-03") == ((0L, true)) && got("2024-02-04") == ((0L, true)))
    assert(got("2024-02-05") == ((1L, false)))
    // continuous coverage: no gaps
    val cont = Seq(d("2024-02-01"), d("2024-02-02")).toDF("event_date")
    assert(graft.operators.Etl.backfillGapsOn(cont)
      .filter(col("is_gap")).count() == 0)
    // single-day corpus: exactly one row, not a gap
    val one = Seq(d("2024-02-01")).toDF("event_date")
    val oneGot = graft.operators.Etl.backfillGapsOn(one).collect()
    assert(oneGot.length == 1 && !oneGot(0).getBoolean(2))
  }

  test("dq drift: spike, crater, AND zero-row days flagged; cold start silent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 6 quiet days of 10 rows, a day with NO rows at all (the worst
    // arrival size — it must page loudest, not silently have no row),
    // a quiet day, a 50-row spike, a 2-row crater
    val days = (1 to 6).map(d => f"2024-01-$d%02d" -> 10) ++
      Seq("2024-01-08" -> 10, "2024-01-09" -> 50, "2024-01-10" -> 2)
    val rows = days.zipWithIndex.flatMap { case ((day, n), di) =>
      (0 until n).map(i => (di.toLong * 1000 + i, java.sql.Date.valueOf(day), i.toLong % 7))
    }
    val df = rows.toDF("event_id", "event_date", "user_id")
    val got = graft.operators.Etl.dqDriftOn(df).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(5))))
      .toMap
    assert(got.size == 10, "one row per CALENDAR day, including the outage day")
    // day 1: no history -> null trailing avg, NOT flagged
    assert(got("2024-01-01") == ((10L, None, false)))
    // the zero-row outage day exists in the report and is flagged
    val (oRows, oAvg, oFlag) = got("2024-01-07")
    assert(oRows == 0L && oAvg == Some(10.0) && oFlag,
      s"zero-row day must page, got ${got("2024-01-07")}")
    // quiet day after the outage: avg dips ((10*5+0)/6 or similar) but stays in band
    assert(!got("2024-01-08")._3)
    // spike: 50 vs dampened avg -> flagged
    assert(got("2024-01-09")._3, "spike day must be flagged")
    // crater: 2 vs trailing avg -> flagged
    assert(got("2024-01-10")._3, "crater day must be flagged")
  }

  test("dq drift: first day with rows after a window-length total outage pages") {
    import spark.implicits._
    // day 1 arrives, days 2-9 are a total outage (zero rows), day 10
    // resumes: its trailing week is ALL-ZERO, so there is no ratio —
    // but rows-on-zero-history is the strongest drift signal there is
    // and must page; the same all-zero basis with zero rows (day 9)
    // stays silent, as does the no-history head (day 1)
    val rows = (0 until 10).map(i =>
        (i.toLong, java.sql.Date.valueOf("2024-02-01"), i.toLong % 3)) ++
      (0 until 5).map(i =>
        (100L + i, java.sql.Date.valueOf("2024-02-10"), i.toLong % 3))
    val df = rows.toDF("event_id", "event_date", "user_id")
    val got = graft.operators.Etl.dqDriftOn(df).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.isNullAt(4), r.getBoolean(5)))).toMap
    assert(got("2024-02-10") == ((5L, true, true)),
      s"recovery day must page despite null ratio, got ${got("2024-02-10")}")
    assert(got("2024-02-09") == ((0L, true, false)),
      "a zero-row day on an all-zero basis has nothing to page about")
    assert(got("2024-02-01")._3 == false, "no-history head stays silent")
  }

  test("temperature sampling: low-resource groups keep more, nested in base rate, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = Etl.sampleTemperature(spark, sfDir).cache()
    val b = Etl.sampleTemperature(spark, sfDir)
    // reproducible: a pure function of the key
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // per-lang keep fractions track min(1, 0.5*sqrt(nmax/n)) and are
    // therefore LARGER for smaller languages — the rebalancing contract
    val n = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy("lang").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nmax = n.values.max.toDouble
    n.foreach { case (lang, cnt) =>
      val want = math.min(1.0, Etl.TemperatureBaseRate * math.sqrt(nmax / cnt))
      val got = kept.getOrElse(lang, 0L).toDouble / cnt
      assert(math.abs(got - want) < 0.2, s"$lang kept $got want ~$want")
    }
    val (big, small) = (n.maxBy(_._2)._1, n.minBy(_._2)._1)
    assert(kept(small).toDouble / n(small) > kept(big).toDouble / n(big),
      "smallest language must keep a larger fraction than the largest")
    // nested: halving the base rate selects a subset
    val half = Etl.sampleTemperatureOn(docs, col("lang"),
      baseRate = Etl.TemperatureBaseRate / 2)
    assert(half.exceptAll(a).count() == 0)
    assert(half.count() < a.count())
    a.unpersist()
    // NULL group: unlabeled rows form their own stratum (1 member ->
    // rate clamps to 1.0) rather than silently vanishing from the join
    val withNull = docs.limit(20)
      .unionByName(docs.limit(1).withColumn("lang", lit(null).cast("string"))
        .withColumn("doc_id", lit(999999L)))
    val sampled = Etl.sampleTemperatureOn(withNull, col("lang"))
    assert(sampled.filter(col("doc_id") === 999999L).count() == 1,
      "singleton null-lang stratum must survive at rate 1.0")
  }

  test("mixture epochs: full epochs exact, fractional draw rate-accurate, capped, nested in budget") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = Etl.sampleMixtureEpochs(spark, sfDir).cache()
    // reproducible: a pure function of the key
    val b = Etl.sampleMixtureEpochs(spark, sfDir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // replicate the planner's formula per source and check both the
    // exact full-epoch layer counts and the fractional-layer rate
    val toks = docs.select(col("source"),
      size(graft.functions.TextHashing.words(col("text"))).cast("long").as("t"))
      .groupBy("source").agg(sum(col("t")).as("gt"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = toks.keys.map(s =>
      s -> Etl.MixtureWeights.getOrElse(s, Etl.DefaultMixtureWeight)).toMap
    val sw = w.values.sum
    val tt = toks.values.map(_._1).sum.toDouble
    val perEpoch = a.groupBy("source", "epoch").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    toks.foreach { case (src, (gt, n)) =>
      val ep = math.min(Etl.MaxMixtureEpochs,
        ((w(src) / sw) * (Etl.MixtureBudgetFactor * tt)) / gt)
      val full = math.floor(ep).toInt
      // every full epoch contains EVERY doc of the source
      (0 until full).foreach { e =>
        assert(perEpoch.getOrElse((src, e), 0L) == n, s"$src epoch $e incomplete")
      }
      // the fractional layer tracks frac(ep) and nothing lies beyond it
      val fracKept = perEpoch.getOrElse((src, full), 0L).toDouble / n
      assert(math.abs(fracKept - (ep - full)) < 0.25, s"$src frac kept $fracKept want ~${ep - full}")
      assert(perEpoch.keys.filter(_._1 == src).map(_._2).max <= full)
    }
    // nested: raising the budget only ADDS (doc, epoch) rows
    val bigger = Etl.sampleMixtureEpochsOn(docs, budgetFactor = Etl.MixtureBudgetFactor * 1.5)
    assert(a.exceptAll(bigger).count() == 0)
    assert(bigger.count() > a.count())
    a.unpersist()
    // repetition ceiling: an unbounded budget still stops at MaxMixtureEpochs
    val capped = Etl.sampleMixtureEpochsOn(docs, budgetFactor = 1e6)
    val maxEp = capped.agg(max(col("epoch"))).collect()(0).getInt(0)
    assert(maxEp == Etl.MaxMixtureEpochs.toInt - 1, s"cap leaked: max epoch $maxEp")
    assert(capped.count() == docs.count() * Etl.MaxMixtureEpochs.toLong)
  }

  test("per-source cap: exact budgets, nested in cap, partitioning-independent") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val cap = 3
    val capped = Etl.sampleCapPerSourceOn(docs, cap).cache()
    // every source lands at min(cap, n_source) — the cap is EXACT,
    // not probabilistic
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .join(capped.groupBy("source").agg(count(lit(1)).as("kept")), "source")
    assert(perSource.filter(col("kept") =!= least(col("n"), lit(cap))).count() == 0)
    // schema passes through untouched (semi-join, not a projection)
    assert(capped.columns.toSeq == docs.columns.toSeq)
    // nested: a bigger cap keeps a superset
    val wider = Etl.sampleCapPerSourceOn(docs, cap + 2)
    assert(capped.exceptAll(wider).count() == 0)
    // pure function of the keys: partitioning cannot change the cut
    val repart = Etl.sampleCapPerSourceOn(docs.repartition(7), cap)
    assert(capped.exceptAll(repart).count() == 0 &&
      repart.exceptAll(capped).count() == 0)
    capped.unpersist()
  }

  test("quality top-frac: exact per-group ceil quota, score-desc/id-asc selection, threshold ties split by id") {
    import spark.implicits._
    // group g1: 10 rows — quota ceil(20% * 10) = 2; threshold tie at
    // 0.8 must keep the SMALLEST id among the tied rows
    val g1 = Seq((1L, 0.9), (2L, 0.8), (3L, 0.8), (4L, 0.8)) ++
      (5L to 10L).map(i => (i, 0.1))
    // group g2: 3 rows — quota ceil(20% * 3) = 1
    val g2 = Seq((101L, 0.5), (102L, 0.7), (103L, 0.5))
    val scored = (g1.map { case (i, s) => ("g1", i, s) } ++
      g2.map { case (i, s) => ("g2", i, s) }).toDF("src", "id", "score")
    val kept = Etl.sampleQualityTopFracOn(scored,
        group = col("src"), score = col("score"), id = col("id"), pctNum = 20)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept == Set(1L, 2L, 102L),
      s"expected top-2 of g1 (0.9 then smallest-id 0.8) + top-1 of g2, got $kept")
  }

  test("quality top-frac: nested in the percentage; 100% keeps everything") {
    import spark.implicits._
    val scored = (1L to 37L).map(i => ("s" + (i % 3), i, (i * 7 % 11).toDouble))
      .toDF("src", "id", "score")
    def ids(pct: Int): Set[Long] =
      Etl.sampleQualityTopFracOn(scored, col("src"), col("score"), col("id"), pct)
        .collect().map(_.getAs[Long]("id")).toSet
    val p20 = ids(20); val p50 = ids(50); val p100 = ids(100)
    assert(p20.subsetOf(p50) && p50.subsetOf(p100),
      "raising the kept fraction must only ADD rows")
    assert(p100 == (1L to 37L).toSet)
    // exact quotas per group: ceil(pct% * n_g)
    val sizes = scored.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerGroup = Etl.sampleQualityTopFracOn(
        scored, col("src"), col("score"), col("id"), 50)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (g, n) =>
      assert(keptPerGroup(g) == (n * 50 + 99) / 100, s"group $g quota")
    }
  }

  test("quality top-frac: discrete and continuous forms agree on seeded-random " +
      "fixtures mixing tie clusters, continuous scores, and null regimes; " +
      "quotas exact; raising pct only adds rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(1405)
    (1 to 6).foreach { trial =>
      val nGroups = 2 + rnd.nextInt(4)
      val rows = (0 until nGroups).flatMap { g =>
        val n = 1 + rnd.nextInt(300)
        // regime per group: tie-heavy discrete, continuous, or null-mixed
        val regime = rnd.nextInt(3)
        (0 until n).map { i =>
          val s: java.lang.Double = regime match {
            case 0 => java.lang.Double.valueOf((rnd.nextInt(7) * 10).toDouble)
            case 1 => java.lang.Double.valueOf(rnd.nextDouble() * 2.0 - 1.0)
            case _ =>
              if (rnd.nextDouble() < 0.3) null
              else java.lang.Double.valueOf(rnd.nextInt(5).toDouble / 3.0)
          }
          (s"g$g", (g * 100000L) + i, s)
        }
      }
      val scored = rnd.shuffle(rows).toDF("src", "id", "score")
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.collect().map(_.getAs[Long]("id")).toSet
      val d20 = ids(Etl.sampleQualityTopFracOn(
        scored, col("src"), col("score"), col("id"), 20))
      val c20 = ids(Etl.sampleQualityTopFracContinuousOn(
        scored, col("src"), col("score"), col("id"), 20))
      assert(c20 == d20, s"trial $trial: variants diverged at pct=20")
      // quota exactness per group
      val sizes = scored.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = scored.filter(col("id").isInCollection(c20.toSeq))
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.foreach { case (g, n) =>
        assert(kept.getOrElse(g, 0L) == (n * 20 + 99) / 100,
          s"trial $trial group $g quota") }
      // nesting: a larger percentage only ADDS rows (both variants)
      val c45 = ids(Etl.sampleQualityTopFracContinuousOn(
        scored, col("src"), col("score"), col("id"), 45))
      assert(c20.subsetOf(c45), s"trial $trial: pct=20 not nested in pct=45")
      assert(c45 == ids(Etl.sampleQualityTopFracOn(
        scored, col("src"), col("score"), col("id"), 45)),
        s"trial $trial: variants diverged at pct=45")
    }
  }

  test("quality top-frac continuous: refinement variant equals the discrete form " +
      "on a corpus-sized-histogram fixture, ties quota-exact") {
    import spark.implicits._
    // continuous scores: ~6000 near-distinct hash doubles across 3
    // groups (histogram ≈ corpus — the regime the refinement exists
    // for), PLUS a planted 16-way tie cell straddling one group's
    // threshold so the residual-quota tie split is exercised exactly
    val continuous = (1L to 6000L).map { i =>
      val g = "s" + (i % 3)
      val s = ((i * 2654435761L) % 1000003L).toDouble / 1000003.0
      (g, i, s)
    }
    // group "tie": 100 rows, quota at 20% = 20; ids 1..15 distinct-high,
    // ids 16..31 all EXACTLY 0.5 (threshold cell, residual 5 keeps the
    // 5 smallest ids), the rest distinct-low
    val tied = (1L to 100L).map { i =>
      val s =
        if (i <= 15) 0.9 + i.toDouble / 1000.0
        else if (i <= 31) 0.5
        else 0.4 - i.toDouble / 1000.0
      ("tie", 10000L + i, s)
    }
    // null-score rows: group "nulls" has 10 rows, only ONE scored —
    // quota at the default 20% is 2, so it dips INTO the null side and
    // the contract (DESC NULLS LAST, id ASC) must draw the smallest-id
    // null. Group "allnull" is 5 rows of pure nulls (quota 1 → the
    // smallest id survives, no refinement probe at all).
    val nullScored: Seq[(String, Long, java.lang.Double)] =
      (1L to 10L).map { i =>
        val s: java.lang.Double =
          if (i <= 1) java.lang.Double.valueOf(0.9) else null
        ("nulls", 20000L + i, s)
      } ++ (1L to 5L).map(i => ("allnull", 21000L + i, null: java.lang.Double))
    val scored = (continuous.map(t => (t._1, t._2, java.lang.Double.valueOf(t._3)))
      ++ tied.map(t => (t._1, t._2, java.lang.Double.valueOf(t._3)))
      ++ nullScored).toDF("src", "id", "score")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getAs[Long]("id")).toSet
    val discrete = ids(Etl.sampleQualityTopFracOn(
      scored, col("src"), col("score"), col("id")))
    val refined = ids(Etl.sampleQualityTopFracContinuousOn(
      scored, col("src"), col("score"), col("id")))
    assert(refined == discrete,
      "continuous refinement diverged from the discrete verdict form")
    // the planted tie: exactly ids 16..20 of the 0.5 cell survive
    assert((10016L to 10031L).filter(refined.contains).toSeq ==
      (10016L to 10020L), "residual tie quota must keep the 5 smallest ids")
    // nulls-last: the scored row + the smallest-id null fill the quota
    assert((20001L to 20010L).filter(refined.contains).toSeq ==
      Seq(20001L, 20002L), "null fill must draw the smallest-id null")
    assert((21001L to 21005L).filter(refined.contains).toSeq ==
      Seq(21001L), "all-null group keeps its quota by id ASC")
    // quota exactness per group
    val sizes = scored.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptPerGroup = Etl.sampleQualityTopFracContinuousOn(
        scored, col("src"), col("score"), col("id"))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (g, n) =>
      assert(keptPerGroup(g) == (n * Etl.TopFracPct + 99) / 100,
        s"group $g quota") }
    // and on the driver corpus's discrete scores the two variants
    // still agree (the contract is identical either regime)
    val docs = graft.sources.Tables.documents(spark, sfDir).select(
      col("doc_id"), col("source"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
    assert(
      ids(Etl.sampleQualityTopFracContinuousOn(docs, col("source"), col("q"),
        col("doc_id")).select(col("doc_id").as("id"))) ==
      ids(Etl.sampleQualityTopFracOn(docs, col("source"), col("q"),
        col("doc_id")).select(col("doc_id").as("id"))))
  }

  test("quality top-frac driver key: row count matches the summed per-source quotas") {
    val out = Etl.sampleQualityTopFrac(spark, sfDir).cache()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val expected = docs.groupBy("source").count().collect()
      .map(r => (r.getLong(1) * Etl.TopFracPct + 99) / 100).sum
    assert(out.count() == expected)
    assert(out.columns.toSeq == Seq("doc_id", "source", "quality_score"))
    out.unpersist()
  }
}
