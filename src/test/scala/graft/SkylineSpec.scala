package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  private def sky(rows: Seq[(Long, Double, Long)], parts: Int = 3): Set[Long] =
    Skyline.skylineOn(rows.toDF("id", "price", "size"),
        col("price"), col("size"), partitions = parts)
      .collect().map(_.getAs[Long]("id")).toSet

  test("skyline: dominated rows drop, frontier stays, across partition carry-ins") {
    // frontier: (1, 10) (2, 20) (5, 30); dominated: (3, 15) by (2,20),
    // (6, 30) by (5,30) [same size, pricier], (2, 5) by (1,10)
    val rows = Seq(
      (1L, 1.0, 10L), (2L, 2.0, 20L), (3L, 3.0, 15L),
      (4L, 5.0, 30L), (5L, 6.0, 30L), (6L, 2.0, 5L))
    assert(sky(rows) == Set(1L, 2L, 4L))
    // partitioning must not change the answer (carry-in correctness)
    assert(sky(rows, parts = 1) == Set(1L, 2L, 4L))
    assert(sky(rows, parts = 8) == Set(1L, 2L, 4L))
  }

  test("skyline: equal (price, size) ties are mutually non-dominating — all kept") {
    val rows = Seq((1L, 1.0, 10L), (2L, 1.0, 10L), (3L, 1.0, 7L))
    assert(sky(rows) == Set(1L, 2L))
  }

  test("skyline: equal price, different size — only the group max survives") {
    val rows = Seq((1L, 1.0, 10L), (2L, 1.0, 9L), (3L, 2.0, 11L))
    assert(sky(rows) == Set(1L, 3L))
  }

  test("skyline: single row and monotone chains") {
    assert(sky(Seq((1L, 1.0, 1L))) == Set(1L))
    // strictly improving chain: all kept
    val chain = (1L to 6L).map(i => (i, i.toDouble, i))
    assert(sky(chain) == chain.map(_._1).toSet)
    // strictly worsening chain: only the first survives
    val worse = (1L to 6L).map(i => (i, i.toDouble, 7L - i))
    assert(sky(worse) == Set(1L))
  }

  test("skyline: fractional maximized column is refused, not silently truncated") {
    // the prefix-max carry rides Long driver-side; a DOUBLE maxCol
    // would truncate carry-ins into a wrong frontier (r12 advisory)
    val e = intercept[IllegalArgumentException] {
      Skyline.skylineOn(Seq((1L, 1.0, 10.5)).toDF("id", "price", "size"),
        col("price"), col("size")).collect()
    }
    assert(e.getMessage.contains("integral"))
  }

  test("skyline driver key: every survivor undominated, every non-survivor dominated") {
    val all = sources.Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val got = Skyline.qSkyline(spark, sfDir).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    def dominated(r: (Long, Double, Long)) = all.exists { d =>
      d._1 != r._1 && d._2 <= r._2 && d._3 >= r._3 && (d._2 < r._2 || d._3 > r._3)
    }
    all.foreach { r =>
      assert(got.contains(r._1) == !dominated(r),
        s"row ${r._1} membership disagrees with dominance check")
    }
  }
}
