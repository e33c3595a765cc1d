package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {

  test("bpe micro-corpus: exact merges, tie-break, and early exhaustion") {
    import spark.implicits._
    // one word "ab" x3: round 1 ties (a,b)=3 with (b,</w>)=3 -> (a,b)
    // wins on the (left, right) tie-break; round 2 merges (ab,</w>);
    // round 3 finds no pairs left and training stops early
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val m = Bpe.trainOn(docs, rounds = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1, "a", "b", "ab", 3L),
      (2, "ab", "</w>", "ab</w>", 3L)))
  }

  test("bpe merge application is greedy leftmost on overlaps") {
    import spark.implicits._
    // "aaa" under (a,a): fold resolves left-to-right -> [aa, a, </w>],
    // never [a, aa, </w>]
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val syms = Bpe.encodeWordsOn(docs, Seq(("a", "a")))
      .select("syms").collect()(0).getSeq[String](0)
    assert(syms == Seq("aa", "a", "</w>"))
  }

  test("bpe on the corpus: ranked rounds, non-increasing counts, round-trip decode") {
    val docs = sources.Tables.documents(spark, sfDir)
    val m = Bpe.train(spark, sfDir).collect()
    assert(m.nonEmpty && m.length <= Bpe.BpeRounds)
    assert(m.map(_.getInt(0)).toSeq == (1 to m.length), "rounds must be 1..n in order")
    m.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    // classic BPE invariant: a merge can only create pairs at most as
    // frequent as itself, so winning counts never increase
    val counts = m.map(_.getLong(4)).toSeq
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"pair counts must be non-increasing: $counts")
    // round-trip: concatenating each word's final symbols and stripping
    // the end marker recovers the word exactly, for every corpus word
    val merges = m.map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encodeWordsOn(docs, merges)
    val mismatches = enc.filter(
      concat_ws("", col("syms")) =!= concat(col("word"), lit(Bpe.EndMark))).count()
    assert(mismatches == 0, "decode must recover every corpus word")
    // and the merges actually compress: mean symbols per word shrinks
    // below characters-plus-marker
    val stats = enc.agg(
      avg(size(col("syms"))).as("s"),
      avg(length(col("word")) + 1).as("c")).collect()(0)
    assert(stats.getDouble(0) < stats.getDouble(1), "merges must compress")
  }
}
