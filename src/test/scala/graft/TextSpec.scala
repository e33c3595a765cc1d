package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.functions.RollingHash

class TextSpec extends SparkSpecBase {

  test("text tokens: counts consistent per document") {
    val rows = TextAnalysis.textTokens(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nws, nd, nbpe) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(nc > 0 && nws > 0)
      assert(nd <= nws, "distinct tokens cannot exceed tokens")
      assert(nbpe >= nws, "BPE-ish tokens at least as fine as whitespace")
    }
  }

  test("text quality: ratios bounded, score composes as documented") {
    val rows = TextAnalysis.textQuality(spark, sfDir).collect()
    rows.foreach { r =>
      val (p, s, u, q) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      Seq(p, s, u).foreach(x => assert(x >= 0 && x <= 1))
      assert(q >= 0 && q <= 1)
      assert(math.abs(q - u * (1 - s) * math.min(1.0, 1.0)) < 1.0) // composite sanity
    }
  }

  test("langid: recovers language on corpora with distinct char distributions") {
    import spark.implicits._
    // three fake languages with disjoint character inventories
    def mk(alphabet: String, seed: Int): String =
      (0 until 200).map(i => alphabet((i * 31 + seed) % alphabet.length)).mkString
    val docs = (0 until 30).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val text = lang match {
        case "aa" => mk("abcde ", i)
        case "bb" => mk("nopqr ", i)
        case _    => mk("vwxyz ", i)
      }
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    // run the same pipeline as textLangid but over this frame:
    // profiles learned from labels, then predictions scored blind
    val tmp = java.nio.file.Files.createTempDirectory("graft_langid").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // satisfy the reader contract for unused columns
    val padded = spark.read.parquet(s"$tmp/documents.parquet")
      .withColumn("source", lit("x")).withColumn("n_chars", length(col("text")))
    padded.write.mode("overwrite").parquet(s"$tmp/doc2/documents.parquet")
    val pred = TextAnalysis.textLangid(spark, s"$tmp/doc2").collect()
    val truth = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val correct = pred.count(r => truth(r.getLong(0)) == r.getString(1))
    assert(pred.length == 30)
    assert(correct == 30, s"langid accuracy ${correct / 30.0}")
  }

  test("langid on corpus: emits one prediction per document with scores") {
    val pred = TextAnalysis.textLangid(spark, sfDir).collect()
    val n = sources.Tables.documents(spark, sfDir).count()
    assert(pred.length == n)
    pred.foreach(r => assert(r.getDouble(2) >= 0))
  }

  test("tfidf: top-k per doc, rare terms outscore common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common rare"),
      (2L, "common common other other"),
      (3L, "common unique")).toDF("doc_id", "text")
    val rows = TextAnalysis.textTfidfOn(docs).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.values.foreach { rs =>
      assert(rs.length <= TextAnalysis.TfidfTopK)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
    // doc 1: 'rare' (df=1) must outrank 'common' (df=3) despite lower tf
    val doc1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(doc1.head.getString(2) == "rare")
    val corpus = TextAnalysis.textTfidf(spark, sfDir)
    assert(corpus.count() > 0)
  }

  test("poly_hash64: codegen path matches the reference implementation") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "the same the same",
      "éü unicode bytes", "x" * 1000)
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), call_function("poly_hash64", col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == RollingHash.polyHash(s.getBytes("UTF-8")),
        s"mismatch for sample $i")
    }
  }

  test("rolling_min_hash: equals brute-force window minimum; detects shared content") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val w = 8
    val bytes = text.getBytes("UTF-8")
    val brute = (0 to bytes.length - w)
      .map(i => RollingHash.polyHash(bytes.slice(i, i + w)))
      .reduce((a, b) => if (java.lang.Long.compareUnsigned(a, b) < 0) a else b)
    assert(RollingHash.minRollingHash(bytes, w) == brute)
    // identical prefix/suffix content -> shared minimum with high prob
    val df = Seq((1L, text), (2L, "PREFIX " + text)).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
        call_function("rolling_min_hash", col("text"), lit(w)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L), "shared content should share the winnow minimum")
    // short strings hash as one window
    assert(RollingHash.minRollingHash("abc".getBytes, 8) ==
      RollingHash.polyHash("abc".getBytes))
  }

  test("vocab: exact counts on a known frame, deterministic top-K cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"), (2L, "a b b"), (3L, "c")).toDF("doc_id", "text")
    val v = TextAnalysis.textVocabOn(docs, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: 3 occurrences in 2 docs; b: 3 in 2; c: 2 in 2 — the top-2 cut
    // keeps (a, b) with the term tiebreak, never c
    assert(v.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 2L)))
    // corpus-level invariants: occurrence mass equals token mass for
    // an uncut vocabulary; doc frequency never exceeds occurrences
    val corpus = graft.sources.Tables.documents(spark, sfDir)
    val full = TextAnalysis.textVocabOn(corpus, topK = 1000000).cache()
    val tokenMass = corpus.select(
      sum(size(split(col("text"), " ")))).as[Long].head()
    assert(full.agg(sum(col("n_occurrences"))).as[Long].head() == tokenMass)
    assert(full.filter(col("n_docs") > col("n_occurrences")).count() == 0)
    full.unpersist()
  }

  test("lm score: rare-token soup is cut, common prose kept, integer-exact averages") {
    import spark.implicits._
    // corpus: one dominant common phrase repeated, one rare-token doc.
    // "the cat sat" tokens appear 40x+ each; the garbage doc's tokens
    // appear once each -> far below the 0.01% fence... with a corpus
    // this small every token is above 0.01%, so widen the contrast by
    // checking relative ordering and the exact integer means instead.
    val common = Seq.tabulate(40)(i => (i.toLong, "the cat sat"))
    val garbage = Seq((99L, "zq xv qk jw"))
    val docs = (common ++ garbage).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.textLmScoreOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    // common docs: 3 tokens, each token count = 40 -> avg 40.0
    val (nTok, avg, _, _) = got(0L)
    assert(nTok == 3 && avg == 40.0)
    // garbage doc: 4 tokens each counted once -> avg 1.0, strictly lower
    val (gTok, gAvg, gRare, _) = got(99L)
    assert(gTok == 4 && gAvg == 1.0 && gAvg < avg)
    // rarity fence: total tokens = 124; a count-1 token is rare iff
    // 1*10000 < 124 is false -> no doc flagged rare on a tiny corpus
    assert(gRare == 0.0 && got.values.forall(_._4))
    // scale the corpus so the fence bites: 4000 common docs make the
    // garbage tokens' 1/12004 share fall below 0.01% (garbage doc_id
    // outside the tabulated range — ids must stay unique)
    val big = (Seq.tabulate(4000)(i => (i.toLong, "the cat sat")) ++ Seq((99999L, "zq xv qk jw")))
      .toDF("doc_id", "text")
    val bigGot = graft.operators.TextAnalysis.textLmScoreOn(big)
      .filter(col("doc_id") === 99999L).collect()(0)
    assert(bigGot.getDouble(3) == 1.0 && !bigGot.getBoolean(4))
  }

  test("fingerprint operator: deterministic across runs") {
    val a = TextAnalysis.textFingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = TextAnalysis.textFingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
    // distinct docs get distinct 64-bit fingerprints (no collisions at n=500)
    assert(a.map(_._2).distinct.length == a.length)
  }

  test("entropy: uniform tokens ratio 1, repeated token 0, mixed matches local math") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d"),            // uniform: H = ln(4), ratio 1
      (2L, "x x x x x"),          // single token: H = 0, ratio 0 (n_distinct = 1)
      (3L, "a a a b"))            // mixed: H = ln(4) - (3 ln 3)/4
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.textEntropyOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, 4L, r4(math.log(4)), 1.0)))
    assert(got(2L) == ((5L, 1L, 0.0, 0.0)))
    val h3 = math.log(4) - 3 * math.log(3) / 4
    assert(got(3L)._3 == r4(h3), s"mixed entropy ${got(3L)._3} != ${r4(h3)}")
    assert(got(3L)._4 == r4(h3 / math.log(2)))
  }

  test("entropy: over-long docs degrade to NULL, never a wrong number or a crash") {
    import spark.implicits._
    val long = (1L, Seq.tabulate(graft.operators.TextAnalysis.EntropyLnTableSize + 5)(
      i => s"w$i").mkString(" "))
    val got = graft.operators.TextAnalysis.textEntropyOn(
      Seq(long).toDF("doc_id", "text")).collect()(0)
    assert(got.isNullAt(3), "entropy past the ln table must be NULL")
  }
}
