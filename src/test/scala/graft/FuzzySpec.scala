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
}
