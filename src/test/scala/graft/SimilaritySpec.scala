package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpecBase {

  test("knn bruteforce: k neighbors per query, ranked by cosine desc") {
    val rows = Similarity.knnBruteforce(spark, sfDir).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.keySet == (0L until Similarity.NQueries.toLong).toSet)
    perQuery.values.foreach { rs =>
      assert(rs.length == Similarity.K)
      val byRank = rs.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).sameElements(1 to Similarity.K))
      val cosines = byRank.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      // no self-matches
      rs.foreach(r => assert(r.getLong(1) != r.getLong(0)))
    }
  }

  test("vec stats: one row per label, sane norms, centroid norm below avg norm") {
    val rows = Similarity.vecStats(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (n, dim) = (r.getLong(1), r.getInt(2))
      val (avg, mn, mx, cn) = (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(n > 0 && dim == 64)
      assert(mn <= avg && avg <= mx)
      // random-ish vectors: the centroid is much shorter than members
      assert(cn < avg)
    }
  }

  test("knn lsh: bounded candidates, useful recall vs exact scan") {
    val exact = Similarity.knnBruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnLsh(spark, sfDir).collect()
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // it must actually prune: fewer scored pairs than the full corpus scan
    val corpus = sources.Tables.embeddings(spark, sfDir).count()
    assert(approx.length <= Similarity.NQueries * Similarity.K)
    val candCounts = approx.groupBy(_.getLong(0)).view.mapValues(_.length)
    candCounts.values.foreach(n => assert(n <= corpus.toInt))
  }
}
