package graft

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and emits ONE machine-readable JSON line.
  *
  * Output hygiene (round-1 verdict): the JSON line is printed with no
  * prefix on its own stdout line AND written to BENCH_LOCAL.json in
  * the working directory, so the driver can parse it even when sbt
  * log noise surrounds stdout. A query that throws is reported in an
  * `errors` map and excluded from `total` instead of being silently
  * folded in as a near-zero timing.
  *
  * Timing methodology: each query is materialized with a count-free
  * full evaluation (`write.format("noop")` semantics via
  * `queryExecution.toRdd.foreach`) so the measured plan is the same
  * plan Verify writes — a bare .count() can drop sorts/projections.
  *
  * Each query is executed TWICE and the minimum is reported
  * (round 7). Rationale, measured on the round-7 box: identical
  * plans swung up to 7× between back-to-back runs (e.g.
  * dedup_contamination 0.9 s → 7.3 s) with zero CPU steal, zero
  * iowait, GC pauses ≤140 ms, and only ~2 busy cores on average —
  * i.e. sporadic hypervisor-level stalls, not plan cost. The min of
  * two runs estimates steady-state plan cost, which is the quantity
  * BASELINE.md rows record (same harness inside each baseline run;
  * medians across three harness invocations). The per-query
  * `jitter` map (max/min ratio) keeps the interference visible.
  *
  * The two executions are TWO FULL PASSES over the suite — the
  * second in reverse key order — not back-to-back runs of each key
  * (round 13). Back-to-back min-of-2 is blind to a contention window
  * that outlasts one key: the round-12 driver run flagged 11 keys
  * >2× baseline, all flat on same-commit triples, CLUSTERED in
  * alphabetical runs of the suite — a minutes-long hot stretch
  * inflates both executions of every key inside it, so the min
  * launders the interference into the record. With the two
  * measurements of each key separated by ~a suite length (and the
  * reverse order making early-pass-A keys late-pass-B), a window
  * must span the whole invocation to corrupt any key's min — and a
  * whole-run level shift is exactly what the run TOTAL already
  * exposes. Same cost: two executions per key either way.
  */
object Bench {

  /** Environment fingerprint captured at run START — the mechanical
    * answer to "is this run's uniform level shift the box or the
    * code" (r14 verdict item 6: adjudicating a ~1.15× whole-suite
    * shift cost a session of re-runs because the bench JSON recorded
    * nothing about the machine). Reading rule (BASELINE.md): compare
    * `env` between the two runs FIRST — differing cpu_mhz/governor, a
    * high load_1m, or low mem_avail_kb at start explains a uniform
    * shift without any plan diff. Best-effort: absent /proc or /sys
    * entries (non-Linux, containers) record as empty/-1, never
    * abort a bench. */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def envFingerprint(): String = {
    def slurp(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8"))
      catch { case _: Exception => None }
    val cpuinfo = slurp("/proc/cpuinfo").getOrElse("")
    def cpuField(key: String): String =
      cpuinfo.linesIterator.find(_.startsWith(key))
        .map(_.split(":", 2).last.trim).getOrElse("")
    val nCores = cpuinfo.linesIterator.count(_.startsWith("processor"))
    val load = slurp("/proc/loadavg").map(_.trim.split("\\s+"))
      .filter(_.length >= 3).map(a => (a(0), a(1), a(2)))
      .getOrElse(("-1", "-1", "-1"))
    def memField(key: String): Long =
      slurp("/proc/meminfo").flatMap(_.linesIterator
        .find(_.startsWith(key + ":"))
        .map(_.split("\\s+")(1).toLong)).getOrElse(-1L)
    val governor = slurp(
      "/sys/devices/system/cpu/cpu0/cpufreq/scaling_governor")
      .map(_.trim).getOrElse("")
    s"""{"cpu_model":${jstr(cpuField("model name"))},""" +
      s""""cpu_mhz":${jstr(cpuField("cpu MHz"))},"n_cores":$nCores,""" +
      s""""governor":${jstr(governor)},""" +
      s""""load_1m":${jstr(load._1)},"load_5m":${jstr(load._2)},""" +
      s""""load_15m":${jstr(load._3)},""" +
      s""""mem_avail_kb":${memField("MemAvailable")},""" +
      s""""mem_total_kb":${memField("MemTotal")}}"""
  }

  /** Reference seconds for [[calibrate]] on the recording box (idle,
    * 2.1 GHz Xeon, median of 5 runs of the identical loop when the row was
    * introduced — round 17). `era_ratio` = measured/this; see the
    * BASELINE.md reading rule. */
  val CalibRefSec = 0.93

  /** Reference wall seconds for [[calibrateParallel]] on the same
    * recording box (idle, 32 cores, median of 8 samples spread over
    * ~10 min — round 18; observed spread ±2.4%). `era_ratio_par` =
    * measured/this. */
  val CalibParRefSec = 1.10

  /** Fixed CPU-bound calibration task (r16 verdict item 7): rounds
    * 13–16 each burned adjudication time deciding whether a uniform
    * per-key level shift was code or a degraded box era. This pins a
    * code-independent yardstick INTO every bench line: a
    * single-threaded xorshift64* fold of fixed iteration count — no
    * allocation, no IO, no Spark — timed after one untimed JIT pass.
    * Reading rule: divide per-key ratios by `era_ratio` before
    * calling anything a regression; a run whose era_ratio itself is
    * ≫1 was measured on a slowed box. Single-threaded on purpose:
    * the box eras observed were uniform CPU slowdowns (steal /
    * frequency / noisy neighbor), which a 1-core probe sees without
    * adding a 32-core load spike to the run it is fingerprinting. */
  private def fold(iters: Long, seed: Long): Long = {
    var x = 0x9E3779B97F4A7C15L ^ seed
    var acc = 0L
    var i = 0L
    while (i < iters) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      acc += x * 0x2545F4914F6CDD1DL
      i += 1
    }
    acc
  }

  private def calibrate(): Double = {
    val warm = fold(50000000L, 0L) // untimed: JIT compiles the loop
    val t0 = System.nanoTime()
    val timed = fold(400000000L, 0L)
    val sec = (System.nanoTime() - t0) / 1e9
    if (warm == 42L && timed == 42L) System.err.print("") // defeat DCE
    math.round(sec * 1000.0) / 1000.0
  }

  /** MULTI-CORE companion of [[calibrate]] (r17 verdict item 3): the
    * round-17 suite ran a uniform 1.15× of its same-code basis while
    * the 1-thread era probe read 0.983 — the box was contended at the
    * MULTI-core level (`load_1m` 4.23 at run start), which a 1-core
    * probe cannot see. This runs the identical fold on one thread per
    * core simultaneously (~1 s wall, the same length as the serial
    * probe) and reports the wall seconds for ALL threads to finish —
    * on an idle box ≈ the serial figure; under contention it
    * stretches by exactly the throughput loss Spark's 32 task threads
    * experience. Reading rule (BASELINE.md): for throughput-bound
    * rows divide per-key ratios by `era_ratio_par`, not `era_ratio`;
    * when the two ratios disagree the gap IS the multi-core
    * contention the run was measured under. */
  private def calibrateParallel(nThreads: Int): Double = {
    val n = math.max(1, nThreads)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    def runAll(iters: Long): Long = {
      val tasks = (0 until n).map { i =>
        new java.util.concurrent.Callable[Long] {
          def call(): Long = fold(iters, i.toLong)
        }
      }
      var acc = 0L
      pool.invokeAll(scala.jdk.CollectionConverters
        .SeqHasAsJava(tasks).asJava).forEach(f => acc ^= f.get())
      acc
    }
    val warm = runAll(10000000L) // untimed: threads + JIT spin-up
    val t0 = System.nanoTime()
    val timed = runAll(400000000L)
    val sec = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    if (warm == 42L && timed == 42L) System.err.print("") // defeat DCE
    math.round(sec * 1000.0) / 1000.0
  }

  private def load1m(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .trim.split("\\s+")(0)
    catch { case _: Exception => "-1" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // captured BEFORE the session/warm-up so load/mem reflect the box
    // the run STARTED on, not the bench's own footprint
    val env = envFingerprint()
    val calibSec = calibrate()
    val eraRatio = math.round(calibSec / CalibRefSec * 1000.0) / 1000.0
    val nCores = Runtime.getRuntime.availableProcessors()
    val calibParSec = calibrateParallel(nCores)
    val eraRatioPar =
      math.round(calibParSec / CalibParRefSec * 1000.0) / 1000.0
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up (untimed): the first query of a fresh JVM otherwise
    // absorbs one-time session/codegen/shuffle-machinery JIT —
    // rounds 5–6 show ~4–6 s landing on whichever key sorts first
    // (dedup_clusters, then agg_approx_ndv), which distorts exactly
    // one per-query row per run. One tiny scan + broadcast join +
    // window + agg exercises those code paths once so every TIMED
    // number reflects its plan. Documented in BASELINE.md.
    {
      import org.apache.spark.sql.functions._
      // synthetic frame, not a table read: the warm-up must never abort
      // the bench on a data dir that lacks some table (per-query errors
      // belong in the errors map, not out of main)
      val r = spark.range(1000L).select(col("id").as("r_regionkey"))
      r.join(broadcast(r.select(col("r_regionkey").as("k"))),
          col("r_regionkey") === col("k"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("r_regionkey").orderBy("k")))
        .groupBy(col("rn")).count()
        .write.format("noop").mode("overwrite").save()
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val jitter = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // optional comma-separated key filter for local iteration (the
    // driver sets no filter → full run)
    val keyFilter = sys.env.get("SPARK_GRAFT_BENCH_KEYS").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => keyFilter.forall(_.contains(kv._1)))
    val passTimes = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    def runPass(keys: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)]): Unit =
      keys.foreach { case (name, fn) =>
        if (!errors.contains(name)) try {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          passTimes(name) = sec :: passTimes.getOrElse(name, Nil)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(200)
            passTimes.remove(name)
            ()
        }
      }
    runPass(selected)          // pass A: ascending key order
    runPass(selected.reverse)  // pass B: reverse — see scaladoc
    passTimes.toSeq.sortBy(_._1).foreach { case (name, runs) =>
      timings(name) = runs.min
      jitter(name) = math.round(runs.max / runs.min * 100.0) / 100.0
    }
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val js = jitter.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    // end-of-run load sample: the round-17 contention era was visible
    // in load_1m at START; a window that OPENS mid-run is only visible
    // in a closing sample
    // `cpus` = the session's local[N]/shuffle width — env.n_cores is
    // the BOX; without this a local[8] history line reads ~3× slow
    // against a local[32] one with no visible cause
    val calibs =
      s""""cpus":${cpus.toIntOption.getOrElse(-1)},"calib_sec":$calibSec,"era_ratio":$eraRatio,"calib_par_sec":$calibParSec,"era_ratio_par":$eraRatioPar,"load_1m_end":${jstr(load1m())}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"jitter":$js,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir)},$calibs,"env":$env}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), full + "\n")
    // Per-round per-key history (r17 verdict item 2): BENCH_LOCAL.json
    // is overwritten by every run, and the driver's BENCH_rN.json
    // snapshot carries only the compact line — round 16's per-key
    // detail was unrecoverable from the round artifacts alone. The
    // history file is APPEND-ONLY (timestamped full lines, committed
    // with the repo), so per-key diffs between any two driver rounds
    // read straight out of one file. The full map stays OFF stdout on
    // purpose: a ~12 KB line overflows the driver's tail capture (the
    // round-7 `parsed: null` failure) and would zero the round's bench
    // artifact.
    val ts = java.time.Instant.now().toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
      "{" + s""""ts":${jstr(ts)},""" + full.drop(1) + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    // KEY-LIST FINGERPRINT (r19 verdict item 5 — "positional qsec
    // shears silently on a key rename/removal"): a keyed {key: sec}
    // map was measured at ~3.7 KB for 162 keys — it can NEVER ride the
    // ~1800-char driver tail, 2dp rounding or not, so the map itself
    // stays in BENCH_LOCAL.json / BENCH_HISTORY.jsonl. What the
    // compact line CAN carry is a CRC32 of the comma-joined ascending
    // successful-key list: two rounds whose qsec arrays are
    // positionally comparable have EQUAL crcs, and any key
    // rename/add/removal flips the crc — a per-key diff tool checks
    // one integer before trusting positions, so the shear is loud,
    // never silent.
    val qsecKeysCrc = {
      val c = new java.util.zip.CRC32()
      c.update(timings.keys.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      c.getValue
    }
    // Per-key seconds INSIDE the driver snapshot (r18 verdict item 6):
    // the driver parses the stdout JSON line out of a ~2000-char tail
    // capture, so the NAMED queries map (key names alone are ~2.4 KB
    // at 161 keys) can never ride along — that is the round-7
    // `parsed: null` failure. The keys are, however, already fixed by
    // the artifact set: `qsec[i]` is the seconds of the i-th key of
    // the ASCENDING-sorted successful key list (the exact key set
    // CORRECTNESS_rN.json / BENCH_LOCAL.json / BENCH_HISTORY.jsonl
    // carry), which makes BENCH_rN.json self-contained at ~5 bytes
    // per key. `qsec_order` states the decode rule in-line. The size
    // guard NEVER lets the line outgrow the tail: first the array
    // drops to 1-decimal precision, then (never expected) it is
    // replaced by a pointer to the history file — a lost per-key
    // array is recoverable, a `parsed: null` round artifact is not.
    def qsecArr(dec: Int): String = timings.values
      .map(v => BigDecimal(v).setScale(dec, BigDecimal.RoundingMode.HALF_UP)
        .toDouble.toString).mkString("[", ",", "]")
    def compactWith(qsec: String): String =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":{},"qsec":$qsec,"qsec_order":"keys-asc","qsec_keys_crc32":$qsecKeysCrc,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir)},$calibs,"env":$env,"detail":"BENCH_LOCAL.json","history":"BENCH_HISTORY.jsonl"}"""
    val tailBudget = 1800 // driver tail ≈ 2000 chars minus sbt's epilogue
    val compact = Seq(compactWith(qsecArr(2)), compactWith(qsecArr(1)))
      .find(_.length <= tailBudget)
      .getOrElse(compactWith("\"overflow: see BENCH_HISTORY.jsonl\""))
    println(compact)
    spark.stop()
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(",")}")
  }
}
