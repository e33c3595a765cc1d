package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Fuzzy

class FuzzySpec extends SparkSpecBase {

  private def df(cols: (Long, String)*): DataFrame = {
    import spark.implicits._
    cols.toDF("row_id", "name")
  }
  private def canonDf(names: String*): DataFrame = {
    import spark.implicits._
    names.toDF("name")
  }

  test("substitution candidates: first-, middle-, and last-position edits all found") {
    val dirty = df((1L, "#bcde"), (2L, "ab#de"), (3L, "abcd#"))
    val canon = canonDf("abcde")
    val got = Fuzzy.substitutionCandidates(dirty, canon).collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[String]("cand"), r.getAs[Int]("distance")))
    assert(got.toSet == Set((1L, "abcde", 1), (2L, "abcde", 1), (3L, "abcde", 1)))
    // each pair exactly once — the two blocking passes never double-emit
    assert(got.length == 3)
  }

  test("substitution candidates: length-1 strings repair (both end chars change at once)") {
    // a 1-char substitution flips the first AND last character, so the
    // two end-char blocks both miss it — the dedicated len-1 pass must
    // generate the pair exactly once (r12 advisory)
    val got = Fuzzy.substitutionCandidates(df((1L, "x"), (2L, "a")), canonDf("a", "b"))
      .collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[String]("cand"), r.getAs[Int]("distance")))
    assert(got.toSet == Set((1L, "a", 1), (1L, "b", 1), (2L, "a", 0), (2L, "b", 1)))
    assert(got.length == 4, "each len-1 pair must be emitted exactly once")
  }

  test("substitution candidates: different length or distance > max excluded") {
    val dirty = df((1L, "ab#de"))
    val canon = canonDf("abcde", "abcdef", "zzzde", "abcde ")
    val got = Fuzzy.substitutionCandidates(dirty, canon).collect()
    assert(got.map(_.getAs[String]("cand")).toSet == Set("abcde"))
  }

  test("exact duplicates (distance 0) rank above distance-1 repairs") {
    val dirty = df((1L, "abcde"))
    val canon = canonDf("abcde", "abcdx")
    val got = Fuzzy.substitutionCandidates(dirty, canon).collect()
      .map(r => (r.getAs[String]("cand"), r.getAs[Int]("distance"))).toSet
    assert(got == Set(("abcde", 0), ("abcdx", 1)))
  }

  test("driver key: every part row repairs at distance 1, exactly once") {
    val rows = Fuzzy.qFuzzyMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("p_partkey"))
    assert(keys.distinct.length == keys.length, "one best match per row")
    rows.foreach { r =>
      // '#' appears in no canonical name, so the repair distance is
      // exactly the one substitution the corruption applied
      assert(r.getAs[Int]("distance") == 1)
      assert(r.getAs[String]("dirty_name").contains("#"))
      assert(!r.getAs[String]("matched_name").contains("#"))
      assert(r.getAs[Long]("n_candidates") >= 1)
    }
  }

  test("edit candidates: substitution, insertion, and deletion all found at distance 1") {
    val dirty = df((1L, "ab#de"), (2L, "abde"), (3L, "abc#de"), (4L, "abcde"))
    val canon = canonDf("abcde")
    val got = Fuzzy.editCandidates(dirty, canon).collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[Int]("distance"))).toSet
    assert(got == Set((1L, 1), (2L, 1), (3L, 1), (4L, 0)))
  }

  test("edit candidates: each (row, candidate) pair appears once despite shared keys") {
    // identical strings intersect on every neighborhood key (len+1)
    val got = Fuzzy.editCandidates(df((1L, "abcde")), canonDf("abcde")).collect()
    assert(got.length == 1 && got.head.getAs[Int]("distance") == 0)
  }

  test("edit candidates: distance-2 strings excluded even when keys collide") {
    // "ab" and "cb": substitution at pos 1 -> neighborhoods share "b"
    // (both delete pos 1) so they MEET, but distance 1 keeps them;
    // "ab" vs "cd" shares no key and never meets
    val got = Fuzzy.editCandidates(df((1L, "ab")), canonDf("cb", "cd")).collect()
    assert(got.map(_.getAs[String]("cand")).toSet == Set("cb"))
  }

  test("edit-class driver key: every corruption class repairs at its true distance") {
    val rows = Fuzzy.qFuzzyEdit1(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("p_partkey"))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      val k = r.getAs[Long]("p_partkey")
      val d = r.getAs[Int]("distance")
      // substitution/insert corruptions use '#' (never canonical) so
      // they sit at exactly 1; a deletion can coincide with another
      // canonical name (distance 0) but never exceeds 1
      if (k % 3 != 1) assert(d == 1, s"key $k class ${k % 3} at distance $d")
      else assert(d <= 1)
    }
  }
}
