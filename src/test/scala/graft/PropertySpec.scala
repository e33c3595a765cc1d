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
}
