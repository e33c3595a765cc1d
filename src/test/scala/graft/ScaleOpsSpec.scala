package graft

import org.apache.spark.sql.functions._
import graft.functions.HllNdv
import graft.operators.{BloomJoin, Layout, Sketches, SubstringSpans}

/** Specs for the round-7 scale-path operators: bloom-prefiltered
  * join, HLL approximate NDV, z-order layout, substring-span dedup. */
class ScaleOpsSpec extends SparkSpecBase {
  import spark.implicits._

  // --- bloom join -------------------------------------------------------

  test("bloom prefilter: result identical to the plain join") {
    val withBloom = BloomJoin.qBloomJoin(spark, sfDir)
    val orders = sources.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > BloomJoin.PriceFloor)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = sources.Tables.lineitem(spark, sfDir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        queries.Analytics.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    assert(withBloom.collect().toSet == plain.collect().toSet)
  }

  test("bloom prefilter prunes most of the probe side, keeps every true match") {
    val lineitem = sources.Tables.lineitem(spark, sfDir)
    val orders = sources.Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > BloomJoin.PriceFloor)
    val kept = BloomJoin.bloomPrefilter(
      lineitem, col("l_orderkey"), orders, col("o_orderkey"),
      math.max(orders.count(), 1L))
    val total = lineitem.count()
    val keptN = kept.count()
    // true matches: lineitems whose order qualifies
    val trueN = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey")).count()
    assert(keptN >= trueN, "a bloom filter must never drop a true match")
    // at fpp=1% the kept set should be close to the true set, far from total
    assert(keptN < total / 2, s"prefilter kept $keptN of $total — no pruning happened")
    assert(keptN <= trueN + (total * 5 * BloomJoin.Fpp).toLong + 10,
      s"false-positive volume implausible: kept=$keptN true=$trueN total=$total")
  }

  // --- HLL ndv ----------------------------------------------------------

  test("hll_ndv: estimate within the p=8 error band and branch-consistent with the reference estimator") {
    val rows = Sketches.aggApproxNdv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("ndv_exact"))
      val approx = r.getDouble(r.fieldIndex("ndv_approx"))
      assert(exact > 0)
      // 1.04/sqrt(256) ~ 6.5% standard error; allow 4 sigma
      assert(math.abs(approx - exact) / exact < 0.26,
        s"estimate $approx too far from exact $exact")
    }
  }

  test("hll_ndv: order-independent and merge-consistent") {
    val n = 5000
    val df = spark.range(n).select((col("id") % 977).as("k"))
    def est(d: org.apache.spark.sql.DataFrame): Double =
      d.agg(call_function("hll_ndv", xxhash64(col("k")), lit(8))).head().getDouble(0)
    val whole = est(df)
    val shuffled = est(df.repartition(13, col("k")))
    val reversed = est(df.orderBy(col("k").desc))
    assert(whole == shuffled && whole == reversed,
      "register maxes must make the estimate partitioning/order independent")
    assert(math.abs(whole - 977) / 977.0 < 0.26)
  }

  test("sketch union: daily roll-up is bit-identical to the direct pass under any unit grouping") {
    val df = spark.range(5000).select(
      (col("id") % 977).as("k"),
      (col("id") % 7).cast("int").as("day"),
      (col("id") % 3).cast("int").as("week"))
    def direct: Double =
      df.agg(call_function("hll_ndv", xxhash64(col("k")), lit(8))).head().getDouble(0)
    def rolled(unit: String): Double = df
      .groupBy(col(unit))
      .agg(call_function("hll_sketch", xxhash64(col("k")), lit(8)).as("sk"))
      .agg(call_function("hll_merge_est", col("sk"), lit(8))).head().getDouble(0)
    // merge associativity/idempotence: ANY partition of the rows into
    // units merges back to the direct estimate, bit for bit
    assert(rolled("day") == direct)
    assert(rolled("week") == direct)
    // finer units (day x week cells) merge to the same estimate too
    val fine = df
      .groupBy(col("week"), col("day"))
      .agg(call_function("hll_sketch", xxhash64(col("k")), lit(8)).as("sk"))
      .agg(call_function("hll_merge_est", col("sk"), lit(8))).head().getDouble(0)
    assert(fine == direct)
  }

  test("cms union driver key: merged per-source grids equal the direct grid's estimates") {
    // counter addition is associative/commutative, so the per-source
    // roll-up's min-of-cells estimate must be BIT-IDENTICAL to the
    // direct one-pass CMS the heavy-hitters key probes
    val merged = Sketches.aggCmsUnion(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val direct = Sketches.aggHeavyHitters(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (t, v) =>
      assert(v == direct(t), s"CMS roll-up diverged from direct grid for '$t'") }
    // the shard pin really counted the per-source layer
    val nSources = Sketches.aggCmsUnion(spark, sfDir)
      .select("n_sources").distinct().collect()
    assert(nSources.length == 1 && nSources(0).getLong(0) >= 2)
  }

  test("hist union driver key: merged per-shard histograms reproduce the direct bounds") {
    val union = graft.operators.Quantiles.aggHistUnion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      .toSet
    val direct = graft.operators.Quantiles.aggHistQuantiles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      .toSet
    assert(union == direct,
      s"merged histogram bounds diverged from the direct pass:\n$union\nvs\n$direct")
  }

  test("sketch union driver key: merged estimate equals agg_approx_ndv's per type") {
    val merged = Sketches.aggSketchUnion(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val direct = Sketches.aggApproxNdv(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (t, v) =>
      assert(v == direct(t), s"roll-up diverged from direct pass for $t") }
  }

  test("distinct intersect: composite estimator consistent and within sketch error bounds") {
    val r = Sketches.aggDistinctIntersect(spark, sfDir).head()
    val (na, nb, inter) = (r.getAs[Long]("n_a_exact"),
      r.getAs[Long]("n_b_exact"), r.getAs[Long]("inter_exact"))
    val unionExact = na + nb - inter
    val k = graft.functions.MinHashFamily.K
    val lanes = r.getAs[Int]("matching_lanes")
    assert(lanes >= 0 && lanes <= k)
    // internal identities: the reported estimates are exactly the
    // composite of the reported parts
    assert(r.getAs[Double]("est_jaccard") == lanes.toDouble / k)
    assert(r.getAs[Double]("est_intersection") ==
      r.getAs[Double]("est_jaccard") * r.getAs[Double]("est_union"))
    // HLL union: ~1.04/sqrt(256) = 6.5% stderr; allow 4 sigma
    val unionErr = math.abs(r.getAs[Double]("est_union") - unionExact) / unionExact
    assert(unionErr < 0.26, s"union estimate off by ${unionErr * 100}%")
    // MinHash Jaccard: stderr sqrt(J(1-J)/K); allow 4 sigma + grain 1/K
    val trueJ = inter.toDouble / unionExact
    val jErr = math.abs(r.getAs[Double]("est_jaccard") - trueJ)
    assert(jErr < 4.0 * math.sqrt(trueJ * (1 - trueJ) / k) + 1.0 / k,
      s"jaccard estimate $jErr off true $trueJ")
  }

  test("distinct intersect: an empty segment yields one NULL-estimate row, not zero rows") {
    // advice finding r13: the bare crossJoin collapsed to 0 rows when a
    // segment was empty while the oracle's ungrouped SUM emits 1 row —
    // stage an events table holding NO purchase events and assert the
    // 1-row NULL report
    val tmp = java.nio.file.Files.createTempDirectory("graft_di_empty").toString
    sources.Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("event_type") =!=
        Sketches.InterTypeB)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = Sketches.aggDistinctIntersect(spark, tmp).collect()
    assert(rows.length == 1, s"expected exactly one report row, got ${rows.length}")
    val r = rows(0)
    assert(r.getAs[Long]("n_a_exact") > 0L)
    assert(r.getAs[Long]("n_b_exact") == 0L)
    assert(r.getAs[Long]("inter_exact") == 0L)
    assert(!r.isNullAt(r.fieldIndex("est_union")), "union HLL still estimable")
    assert(r.isNullAt(r.fieldIndex("matching_lanes")))
    assert(r.isNullAt(r.fieldIndex("est_jaccard")))
    assert(r.isNullAt(r.fieldIndex("est_intersection")))
  }

  test("hll_ndv eval matches the companion estimator on hand-built registers") {
    // a tiny known register set: bucket 0 -> rho 3, bucket 1 -> rho 1
    val regs = new Array[Byte](256)
    regs(0) = 3; regs(1) = 1
    val est = HllNdv.estimate(regs, 8)
    // 254 empty buckets -> linear counting branch
    assert(est == 256.0 * math.log(256.0 / 254.0))
  }

  // --- z-order layout ---------------------------------------------------

  test("mortonKey interleaves bits (reference implementation agreement)") {
    def mortonRef(x: Long, y: Long): Long = {
      var k = 0L
      var b = 0
      while (b < 16) {
        k |= ((x >> b) & 1L) << (2 * b)
        k |= ((y >> b) & 1L) << (2 * b + 1)
        b += 1
      }
      k
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L), (70000L, 3L)) // 70000 masks to low 16 bits
    val df = samples.toDF("x", "y")
      .withColumn("z", Layout.mortonKey(col("x"), col("y")))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(x & 0xFFFFL, y & 0xFFFFL), s"morton($x,$y)")
    }
  }

  test("qZorderLayout tiles bound both dimensions") {
    val rows = Layout.qZorderLayout(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val spanX = r.getLong(r.fieldIndex("max_x")) - r.getLong(r.fieldIndex("min_x"))
      val spanY = r.getLong(r.fieldIndex("max_y")) - r.getLong(r.fieldIndex("min_y"))
      // tile = zkey >> 22 => 11 interleaved bits per dim remain => spans < 2^11*2 = 2048
      assert(spanX < 2048 && spanY < 2048,
        s"tile ${r.getLong(r.fieldIndex("tile"))} spans x=$spanX y=$spanY — not clustered")
    }
  }

  test("zorderWrite produces files with pairwise-disjoint zkey ranges") {
    val dir = java.nio.file.Files.createTempDirectory("zorder-spec").toString
    try {
      val ev = sources.Tables.events(spark, sfDir)
        .withColumn("x", col("user_id").bitwiseAND(lit(0xFFFFL)))
        .withColumn("y", expr("unix_micros(ts) div 60000000").bitwiseAND(lit(0xFFFFL)))
      Layout.zorderWrite(ev, col("x"), col("y"), dir, partitions = 8)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length > 1, "expected multiple output files")
      val ranges = files.map { f =>
        val r = spark.read.parquet(f).agg(min(col("zkey")), max(col("zkey"))).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 lo=$lo2 — min/max pruning broken")
        case _ =>
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("hilbertWrite produces files with pairwise-disjoint hkey ranges") {
    val dir = java.nio.file.Files.createTempDirectory("hilbert-spec").toString
    try {
      val ev = sources.Tables.events(spark, sfDir)
        .withColumn("x", col("user_id").bitwiseAND(lit(0xFFFFL)))
        .withColumn("y", expr("unix_micros(ts) div 60000000").bitwiseAND(lit(0xFFFFL)))
      Layout.hilbertWrite(ev, col("x"), col("y"), dir, partitions = 8)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length > 1, "expected multiple output files")
      val ranges = files.map { f =>
        val r = spark.read.parquet(f).agg(min(col("hkey")), max(col("hkey"))).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 lo=$lo2 — min/max pruning broken")
        case _ =>
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // --- substring spans --------------------------------------------------

  test("substring spans: planted cross-doc span found with exact token accounting") {
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ") // 12-word verbatim run
    val a = s"alpha beta gamma $shared tail1 tail2"
    val b = s"$shared omega psi chi phi delta"
    val c = "entirely unique words here that no other document carries at all"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = SubstringSpans.substringSpansOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: words 0..2 prefix, shared at positions 3..14, K=8 windows
    // inside the shared run only => island covers exactly the 12 shared tokens
    assert(out(1L).getLong(out(1L).fieldIndex("dup_tokens")) == 12)
    assert(out(2L).getLong(out(2L).fieldIndex("dup_tokens")) == 12)
    assert(out(3L).getLong(out(3L).fieldIndex("dup_tokens")) == 0)
    // 12-word run, 8-word windows => 5 duplicated windows each
    assert(out(1L).getLong(out(1L).fieldIndex("dup_windows")) == 5)
    val frac1 = out(1L).getDouble(out(1L).fieldIndex("dup_frac"))
    assert(math.abs(frac1 - 12.0 / 17.0) < 1e-6)
  }

  test("substring spans: within-doc repetition alone is not flagged") {
    val phrase = (1 to 10).map(i => s"rep$i").mkString(" ")
    val selfRep = s"$phrase filler middle words $phrase"
    val other = "completely different vocabulary in this second document body text"
    val docs = Seq((1L, selfRep), (2L, other)).toDF("doc_id", "text")
    val out = SubstringSpans.substringSpansOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1 + 2)).toMap // dup_tokens at index 3
    assert(out(1L) == 0, "same-doc repeats must not count as cross-doc duplication")
    assert(out(2L) == 0)
  }

  test("substring spans: overlapping duplicated runs merge into one island") {
    // doc 1 contains a 20-word run; docs 2 and 3 each share a different
    // overlapping 14-word half of it => doc 1's windows overlap => one island
    val words = (1 to 20).map(i => s"w$i")
    val full = words.mkString(" ")
    val left = words.take(14).mkString(" ")
    val right = words.drop(6).mkString(" ")
    val docs = Seq(
      (1L, s"intro $full outro"),
      (2L, s"$left unrelated trailing tokens here now"),
      (3L, s"prefix tokens also here $right")).toDF("doc_id", "text")
    val r1 = SubstringSpans.substringSpansOn(docs).filter(col("doc_id") === 1L).head()
    assert(r1.getLong(r1.fieldIndex("dup_tokens")) == 20,
      "the two overlapping halves must merge to the full 20-token span")
  }

  test("span cut: the planted shared span is cut from every copy, unique docs survive") {
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma $shared tail1 tail2"
    val b = s"$shared omega psi chi phi delta"
    val c = "entirely unique words here that no other document carries at all"
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = SubstringSpans.spanCutOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def cut(id: Long) = out(id).getLong(out(id).fieldIndex("n_cut"))
    def clean(id: Long) = out(id).getString(out(id).fieldIndex("clean_text"))
    // the symmetric cut removes the 12 shared words from BOTH copies
    assert(cut(1L) == 12 && clean(1L) == "alpha beta gamma tail1 tail2")
    assert(cut(2L) == 12 && clean(2L) == "omega psi chi phi delta")
    // the unique doc is untouched, text round-trips verbatim
    assert(cut(3L) == 0 && clean(3L) == c)
    // accounting agrees with the span report's coverage
    val rep = SubstringSpans.substringSpansOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("dup_tokens"))).toMap
    Seq(1L, 2L, 3L).foreach(id => assert(cut(id) == rep(id),
      s"doc $id: cut ${cut(id)} words but the report covers ${rep(id)}"))
  }

  test("span cut: a fully-duplicated doc empties; every doc still appears") {
    val body = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq((1L, body), (2L, body), (3L, s"unique leading words $body"))
      .toDF("doc_id", "text")
    val out = SubstringSpans.spanCutOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getString(out(1L).fieldIndex("clean_text")) == "")
    assert(out(1L).getLong(out(1L).fieldIndex("n_kept")) == 0)
    assert(out(3L).getString(out(3L).fieldIndex("clean_text")) == "unique leading words")
  }

  // --- CMS heavy hitters ------------------------------------------------

  test("cms heavy hitters: estimates upper-bound exact counts; overcount is their gap") {
    val rows = Sketches.aggHeavyHitters(spark, sfDir).collect()
    assert(rows.length == Sketches.CmsTopK)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact"))
      val est = r.getLong(r.fieldIndex("cms_count"))
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(r.getLong(r.fieldIndex("overcount")) == est - exact)
    }
    // 4×1024 counters over a tiny-sf vocabulary: collision mass cannot
    // hit all d rows of every top term — some estimates must be exact
    assert(rows.count(r => r.getLong(r.fieldIndex("overcount")) == 0L) > 0,
      "no top term came out collision-free — sketch wiring suspect")
  }

  test("cms heavy hitters: partitioning-independent (grid merge is a plain sum)") {
    val docs = sources.Tables.documents(spark, sfDir)
    val a = Sketches.aggHeavyHittersOn(docs).collect().toSeq
    val b = Sketches.aggHeavyHittersOn(docs.repartition(7, col("doc_id"))).collect().toSeq
    assert(a == b)
  }

  // --- exact quantiles --------------------------------------------------

  test("exact quantiles: match the sorted order statistics of the driver table") {
    val got = operators.Quantiles.qExactQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getTimestamp(2)))).toMap
    val vals = sources.Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").cast("timestamp").as("ts"))
      .orderBy(col("ts")).collect().map(_.getTimestamp(0))
    val n = vals.length.toLong
    operators.Quantiles.Targets.foreach { case (name, num, den) =>
      val k = (n * num + den - 1) / den
      assert(got(name)._1 == k, s"$name rank")
      assert(got(name)._2 == vals(k.toInt - 1), s"$name value")
    }
  }

  test("exact quantiles engine: random corpora — duplicates, negatives, wide ranges, tiny n") {
    val rnd = new scala.util.Random(20260813L)
    val cases = Seq(
      Array.fill(1)(rnd.nextLong() >> 2),                    // n = 1
      Array.fill(2)(rnd.nextLong() >> 2),                    // n = 2
      Array.fill(300)(rnd.nextInt(7).toLong - 3L),           // dup-heavy tiny domain, negatives
      Array.fill(1000)(rnd.nextLong() % 1000000L),           // mixed-sign medium domain
      Array.fill(500)(rnd.nextLong() >> 2))                  // ~2^62 span
    cases.foreach { vals =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals.toSeq.map(org.apache.spark.sql.Row(_)), 3),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType))))
      val got = operators.Quantiles.exactTickQuantiles(df, "t")
        .map { case (q, k, v) => q -> ((k, v)) }.toMap
      val sorted = vals.sorted
      val n = vals.length.toLong
      operators.Quantiles.Targets.foreach { case (name, num, den) =>
        val k = (n * num + den - 1) / den
        assert(got(name) == ((k, sorted(k.toInt - 1))), s"$name over n=$n")
      }
    }
    // empty input: no order statistics, not a crash
    val empty = spark.range(0).select(col("id").as("t"))
    assert(operators.Quantiles.exactTickQuantiles(empty.toDF(), "t").isEmpty)
  }

  test("hist quantiles: one-pass interval brackets the exact value within the width bound") {
    val rnd = new scala.util.Random(20260814L)
    val cases = Seq(
      Array.fill(1000)(rnd.nextLong() % 1000000L), // span >> bins: real intervals
      Array.fill(300)(rnd.nextInt(7).toLong - 3L), // span < bins: width-1 buckets, exact
      Array.fill(1)(42L))                          // n = 1
    cases.foreach { vals =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals.toSeq.map(org.apache.spark.sql.Row(_)), 3),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType))))
      val got = operators.Quantiles.histQuantiles(df, "t").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val sorted = vals.sorted
      val n = vals.length.toLong
      val span = sorted.last - sorted.head
      val width = (span + operators.Quantiles.Bins) / operators.Quantiles.Bins
      operators.Quantiles.Targets.foreach { case (name, num, den) =>
        val k = (n * num + den - 1) / den
        val exact = sorted(k.toInt - 1)
        val (gotK, lo, hi) = got(name)
        assert(gotK == k, s"$name rank over n=$n")
        assert(lo <= exact && exact <= hi, s"$name: exact $exact outside [$lo,$hi]")
        assert(hi - lo <= width - 1, s"$name: interval wider than the bound")
        if (span < operators.Quantiles.Bins)
          assert(lo == exact && hi == exact, s"$name: width-1 grid must resolve exactly")
      }
    }
    // empty input: empty frame, not a crash
    val empty = spark.range(0).select(col("id").as("t"))
    assert(operators.Quantiles.histQuantiles(empty.toDF(), "t").count() == 0)
  }

  // --- holdout split ----------------------------------------------------

  test("holdout split: total labeling, fences respected, stable under corpus growth") {
    val docs = sources.Tables.documents(spark, sfDir)
    val all = operators.Etl.sampleHoldoutSplitOn(docs, col("doc_id"))
      .select(col("doc_id"), col("split_bucket"), col("split")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(all.size == docs.count(), "every document must receive a label")
    all.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 1000)
      val expect = if (b < operators.Etl.TrainPermille) "train"
                   else if (b < operators.Etl.ValPermille) "val" else "test"
      assert(s == expect)
    }
    val trainFrac = all.values.count(_._2 == "train").toDouble / all.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // growth stability: labels computed over a sub-corpus agree with the
    // full corpus — no doc migrates across a fence when data arrives
    operators.Etl.sampleHoldoutSplitOn(
        docs.filter(col("doc_id") % 2 === 0), col("doc_id"))
      .select(col("doc_id"), col("split")).collect()
      .foreach(r => assert(all(r.getLong(0))._2 == r.getString(1)))
  }
}
