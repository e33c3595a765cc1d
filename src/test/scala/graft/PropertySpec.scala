package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashFamily, RollingHash}

/** Randomized property checks (fixed seeds — deterministic) for the
  * native kernels and merge primitives. */
class PropertySpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(20240812L)

  private def randBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    rnd.nextBytes(b)
    b
  }

  test("polyHash: concatenation law h(a++b) = h(a)*B^|b| + P(b)") {
    (1 to 200).foreach { _ =>
      val a = randBytes(rnd.nextInt(64))
      val b = randBytes(rnd.nextInt(64))
      var powB = 1L
      (0 until b.length).foreach(_ => powB *= RollingHash.Base)
      // seedless polynomial of b
      var pb = 0L
      b.foreach(c => pb = pb * RollingHash.Base + (c & 0xFF))
      assert(RollingHash.polyHash(a ++ b) ==
        RollingHash.polyHash(a) * powB + pb)
    }
  }

  test("minRollingHash: equals brute force for arbitrary inputs and windows") {
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(120)
      val w = 1 + rnd.nextInt(40)
      val bytes = randBytes(n)
      val brute =
        if (n <= w) RollingHash.polyHash(bytes)
        else (0 to n - w).map(i => RollingHash.polyHash(bytes.slice(i, i + w)))
          .reduce((x, y) => if (java.lang.Long.compareUnsigned(x, y) < 0) x else y)
      assert(RollingHash.minRollingHash(bytes, w) == brute,
        s"n=$n w=$w")
    }
  }

  test("minhash family: signature agreement tracks Jaccard similarity") {
    import spark.implicits._
    // two shingle sets with known overlap; the fraction of agreeing
    // signature positions estimates J with stderr ~ sqrt(J(1-J)/K)
    def sig(items: Seq[String]): Array[Long] = {
      val df = items.toDF("t")
      df.agg(call_function("minhash_sketch", col("t"))).collect()(0)
        .getSeq[Long](0).toArray
    }
    val shared = (0 until 60).map(i => s"sh$i")
    val aOnly = (0 until 20).map(i => s"a$i")
    val bOnly = (0 until 20).map(i => s"b$i")
    val (sa, sb) = (sig(shared ++ aOnly), sig(shared ++ bOnly))
    val trueJ = 60.0 / 100.0
    val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / MinHashFamily.K
    assert(math.abs(agree - trueJ) < 0.15, s"agreement $agree vs J $trueJ")
    // identical sets -> identical signatures regardless of order
    val shuffled = sig(rnd.shuffle(shared ++ aOnly))
    assert(shuffled.sameElements(sa))
  }

  test("Merge.keepLatest: agrees with a naive max-reference on random logs") {
    import spark.implicits._
    import graft.operators.Merge
    (1 to 5).foreach { _ =>
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(50).toLong, rnd.nextDouble())
      } // (key, unique id, ts with collisions, payload)
      val df = rows.toDF("key", "id", "ts", "payload")
      val got = Merge.keepLatest(df, Seq(col("key")), col("ts"), col("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.groupBy(_._1).map { case (k, g) =>
        k -> g.maxBy(r => (r._3, r._2))._2
      }
      assert(got == want)
    }
  }

  test("hashed_word_ngrams: set structure identical to the composed split/transform form") {
    import spark.implicits._
    import graft.functions.{TextHashing => TH}
    // random texts over a tiny vocabulary (forces real shingle repeats),
    // with occasional double spaces (empty-word edge of split-on-space)
    val texts = (1 to 120).map { i =>
      val words = (0 until (3 + rnd.nextInt(40))).map(_ => s"w${rnd.nextInt(12)}")
      val sep = if (rnd.nextInt(10) == 0) "  " else " "
      (i.toLong, words.mkString(sep))
    }
    Seq(2, 3, 4).foreach { n =>
      val df = texts.toDF("doc_id", "text")
        .filter(size(TH.words(col("text"))) >= n)
        .select(col("doc_id"),
          call_function("hashed_word_ngrams", col("text"), lit(n)).as("hg"),
          TH.shingles(TH.words(col("text")), n).as("sg"))
        .cache()
      // per-doc distinct cardinality matches the string form exactly
      assert(df.filter(size(col("hg")) =!= size(col("sg"))).count() == 0, s"n=$n sizes")
      // cross-doc equality structure: posting-join pair counts match
      val hPairs = {
        val p = df.select(col("doc_id"), explode(col("hg")).as("g"))
        p.as("a").join(p.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id")).count()
      }
      val sPairs = {
        val p = df.select(col("doc_id"), explode(col("sg")).as("g"))
        p.as("a").join(p.as("b"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id")).count()
      }
      assert(hPairs == sPairs, s"n=$n posting pairs")
      df.unpersist()
    }
  }

  test("hashed_word_ngrams: codegen and interpreted paths agree; short docs empty") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a  b"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    def run(): Map[Long, Seq[Long]] = {
      df.select(col("doc_id"),
          call_function("hashed_word_ngrams", col("text"), lit(3)).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    }
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(withCodegen == interpreted)
    assert(withCodegen(1L).length == 3)              // 5 words -> 3 trigrams
    assert(withCodegen(2L).length == 1)              // ["a","","b"] -> one trigram "a  b"
    assert(withCodegen(3L).isEmpty && withCodegen(4L).isEmpty)
    // first-occurrence-order distinctness on a repeating text
    val rep = Seq((1L, "x y x y x y x y")).toDF("doc_id", "text")
      .select(call_function("hashed_word_ngrams", col("text"), lit(2)).as("g"))
      .collect()(0).getSeq[Long](0)
    assert(rep.length == 2 && rep.distinct.length == 2) // {"x y", "y x"}
  }

  test("hashed_char_ngrams: multiplicity/order/UTF-8 structure matches the substring form") {
    import spark.implicits._
    // ASCII, multi-byte (CJK + accents), short, and empty texts
    val texts = Seq((1L, "abcabc"), (2L, "\u4f60\u597d\u4e16\u754c\u4f60\u597d"),
      (3L, "caf\u00e9 caf\u00e9"), (4L, "x"), (5L, ""))
    val df = texts.toDF("doc_id", "text").select(col("doc_id"),
      call_function("hashed_char_ngrams", col("text"), lit(2)).as("hg"),
      when(length(col("text")) >= 2,
        transform(sequence(lit(1), length(col("text")) - lit(1)), i =>
          call_function("substring", col("text"), i, lit(2))))
        .otherwise(array()).as("sg"))
    df.collect().foreach { r =>
      val hg = r.getSeq[Long](1)
      val sg = r.getSeq[String](2)
      assert(hg.length == sg.length, s"doc ${r.getLong(0)} count")
      // same-position equality structure: hashes agree exactly where strings do
      for (i <- sg.indices; j <- sg.indices)
        assert((sg(i) == sg(j)) == (hg(i) == hg(j)), s"doc ${r.getLong(0)} ($i,$j)")
    }
    // codegen/interpreted parity
    def run(): Seq[Seq[Long]] = texts.toDF("doc_id", "text")
      .select(call_function("hashed_char_ngrams", col("text"), lit(2)))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val cg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val ip = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(cg == ip)
  }

  test("normalizeArrays round trip: random micro-timestamps and doubles survive exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    // random microsecond instants across years and full-precision doubles:
    // the payload wire format must lose NOTHING the events table can hold
    val rows = (1 to 300).map { i =>
      val us = 1500000000000000L + (math.abs(rnd.nextLong()) % (200L * 86400000000L))
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      val v = rnd.nextDouble() * math.pow(10, rnd.nextInt(6) - 3)
      (i.toLong, t, v)
    }
    val events = rows.toDF("event_id", "ts", "value")
    // the PRODUCTION encoder, not a re-implementation — format drift
    // between arrayPayloadsOn and normalizeArrays cannot hide here
    val payloads = graft.operators.Etl.arrayPayloadsOn(events)
    val out = graft.operators.Etl.normalizeArrays(payloads)
      .select(col("ts"), col("temperature_c"))
    val want = events.select(col("ts"), col("value").as("temperature_c"))
    assert(out.count() == rows.size)
    assert(out.exceptAll(want).count() == 0, "round trip lost or altered rows")
    assert(want.exceptAll(out).count() == 0)
  }

  test("triangles: random graphs agree with the brute-force count, per node") {
    (1 to 12).foreach { trial =>
      val n = 4 + rnd.nextInt(8)
      val p = 0.2 + rnd.nextDouble() * 0.5
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rnd.nextDouble() < p
      } yield (u.toLong, v.toLong)).toSeq
      if (edges.nonEmpty) {
        val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
        val nodes = adj.keys.toSeq.sorted
        val bruteTotal = (for {
          a <- nodes; b <- nodes if a < b && adj(a)(b)
          c <- nodes if b < c && adj(a)(c) && adj(b)(c)
        } yield 1).size
        val brutePerNode = nodes.map { x =>
          x -> (for {
            a <- nodes; b <- nodes
            if a < b && a != x && b != x && adj(x)(a) && adj(x)(b) && adj(a)(b)
          } yield 1).size.toLong
        }.filter(_._2 > 0).toMap
        import spark.implicits._
        val rows = graft.operators.Graph.trianglesOn(edges.toDF("u", "v")).collect()
        if (bruteTotal == 0) assert(rows.isEmpty, s"trial $trial: expected no triangles")
        else {
          assert(rows.head.getAs[Long]("total_triangles") == bruteTotal.toLong,
            s"trial $trial: total mismatch")
          val got = rows.map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("triangles")).toMap
          // top-K cut: every reported node must match brute force exactly
          got.foreach { case (node, cnt) =>
            assert(brutePerNode(node) == cnt, s"trial $trial node $node") }
        }
      }
    }
  }

  test("skyline: random frames agree with the brute-force dominance filter") {
    (1 to 15).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      // small value domains force ties in both dimensions
      val rows = (1L to n.toLong).map(i =>
        (i, (1 + rnd.nextInt(6)).toDouble, (1 + rnd.nextInt(6)).toLong))
      val brute = rows.filter { r =>
        !rows.exists(d => d._1 != r._1 && d._2 <= r._2 && d._3 >= r._3 &&
          (d._2 < r._2 || d._3 > r._3))
      }.map(_._1).toSet
      import spark.implicits._
      val got = graft.operators.Skyline.skylineOn(
          rows.toDF("id", "price", "size"), col("price"), col("size"),
          partitions = 1 + rnd.nextInt(6))
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got == brute, s"trial $trial: $got != $brute on $rows")
    }
  }

  test("edit candidates: complete and sound for Levenshtein <= 1 on random strings") {
    val alpha = "abc" // tiny alphabet maximizes near-collisions
    def randStr() = (1 to (1 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(3))).mkString
    (1 to 8).foreach { trial =>
      val dirty = (1L to 12L).map(i => (i, randStr()))
      val canon = (1 to 12).map(_ => randStr()).distinct
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val expect = (for {
        (id, dn) <- dirty; cn <- canon if lev(dn, cn) <= 1
      } yield (id, cn)).toSet
      import spark.implicits._
      val got = graft.operators.Fuzzy.editCandidates(
          dirty.toDF("row_id", "name"), canon.toDF("name"))
        .collect().map(r => (r.getAs[Long]("row_id"), r.getAs[String]("cand"))).toSet
      assert(got == expect, s"trial $trial: $got != $expect")
    }
  }

  test("mergeInto: agrees with the naive per-key clause resolution on random snapshots") {
    import spark.implicits._
    (1 to 6).foreach { trial =>
      // ~60% key overlap, ~25% of source rows tombstones
      val tKeys = (1 to 15).map(_ => rnd.nextInt(20)).distinct
      val sKeys = (1 to 15).map(_ => rnd.nextInt(20)).distinct
      val t = tKeys.map(k => (k.toLong, s"t$k", rnd.nextInt(100).toLong))
      val s = sKeys.map(k => (k.toLong,
        if (rnd.nextInt(4) == 0) "DEL" else s"s$k", rnd.nextInt(100).toLong))
      val expect = {
        val tm = t.map(r => r._1 -> r).toMap
        val sm = s.map(r => r._1 -> r).toMap
        (tm.keySet ++ sm.keySet).flatMap { k =>
          (tm.get(k), sm.get(k)) match {
            case (_, Some(sr)) if sr._2 == "DEL" => None // matched-delete / tombstone no-op
            case (_, Some(sr))                   => Some(sr)
            case (Some(tr), None)                => Some(tr)
            case (None, None)                    => None
          }
        }
      }
      val got = graft.operators.Merge.mergeInto(
          t.toDF("key", "state", "ver"), s.toDF("key", "state", "ver"),
          Seq("key"), deleteCond = col("state") === "DEL")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expect, s"trial $trial")
    }
  }

  test("quality top-frac: agrees with the naive sort-and-take per group on random scores") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val pct = 10 + rnd.nextInt(80)
      // coarse score grid forces threshold ties — the hard case
      val rows = (1L to (20 + rnd.nextInt(60)).toLong).map(i =>
        (s"g${rnd.nextInt(3)}", i, rnd.nextInt(5).toDouble / 4.0))
      val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
        val quota = ((g.size * pct + 99) / 100).toInt
        g.sortBy(r => (-r._3, r._2)).take(quota)
      }.map(_._2).toSet
      val got = graft.operators.Etl.sampleQualityTopFracOn(
          rows.toDF("src", "id", "score"),
          col("src"), col("score"), col("id"), pct)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got == expect, s"trial $trial pct=$pct")
    }
  }

  test("kcore: agrees with brute-force peeling on random graphs") {
    import spark.implicits._
    (1 to 4).foreach { trial =>
      val k = 2 + rnd.nextInt(2)
      val edges = (1 to 40).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
        .filter { case (u, v) => u != v }
        .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
        .distinct
      // brute force: peel until stable
      var adj = scala.collection.mutable.Map[Long, Set[Long]]()
      edges.foreach { case (u, v) =>
        adj(u) = adj.getOrElse(u, Set.empty) + v
        adj(v) = adj.getOrElse(v, Set.empty) + u
      }
      var changed = true
      while (changed) {
        val doomed = adj.collect { case (n, s) if s.size < k => n }.toSet
        changed = doomed.nonEmpty
        doomed.foreach { n =>
          adj.remove(n)
          adj.keys.foreach(m => adj(m) = adj(m) - n)
        }
      }
      val expect = adj.map { case (n, s) => n -> s.size.toLong }.toMap
      val got = graft.operators.Graph.kcoreOn(edges.toDF("u", "v"), k = k,
          topK = 100)
        .collect().map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("core_deg"))
        .toMap
      assert(got == expect, s"trial $trial k=$k")
    }
  }
}
