package graft

import graft.queries.Analytics

class AnalyticsSpec extends SparkSpecBase {
  test("q1 pricing summary: groups are the distinct flag/status pairs, sums positive") {
    val df = Analytics.q1PricingSummary(spark, sfDir).cache()
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val byName = df.columns.zipWithIndex.toMap
    rows.foreach { r =>
      assert(r.getDouble(byName("sum_qty")) > 0)
      assert(r.getDouble(byName("avg_disc")) >= 0 && r.getDouble(byName("avg_disc")) <= 1)
      assert(r.getLong(byName("count_order")) > 0)
    }
    // count_order sums to the filtered row count
    val total = rows.map(_.getLong(byName("count_order"))).sum
    val expected = sources.Tables.lineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02").count()
    assert(total == expected)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
