package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpecBase {

  test("asOfJoin matches the brute-force definition on crafted edges") {
    import spark.implicits._
    val left = Seq(
      (1L, "2024-01-10 00:00:00", "A"), // after two rights -> latest (01-05)
      (2L, "2024-01-05 00:00:00", "A"), // EXACTLY at a right ts -> matches it (>= semantics)
      (3L, "2023-12-31 00:00:00", "A"), // before all rights -> null
      (4L, "2024-01-10 00:00:00", "B"), // other key: sees only B's right
      (5L, "2024-01-10 00:00:00", "C")) // key with no rights at all -> null
      .toDF("id", "ts_s", "k")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"), col("k"))
    val right = Seq(
      ("A", "2024-01-01 00:00:00", 100L),
      ("A", "2024-01-05 00:00:00", 105L),
      ("A", "2024-02-01 00:00:00", 201L), // in the future of every left -> never matched
      ("B", "2024-01-02 00:00:00", 300L))
      .toDF("k2", "rts_s", "payload")
      .select(col("k2"), col("rts_s").cast("timestamp").as("rts"), col("payload"))

    val out = AsOf.asOfJoinOn(left, right,
      leftKey = col("k"), rightKey = col("k2"),
      leftTs = col("ts"), rightTs = col("rts"),
      payloadCols = Seq("payload", "rts"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

    assert(out == Map(
      1L -> Some(105L), 2L -> Some(105L), 3L -> None,
      4L -> Some(300L), 5L -> None))
  }

  test("q_asof_join: every enrichment equals the max preceding order") {
    // independent brute-force oracle via a join + groupBy (the plan we
    // deliberately avoid at scale, fine at sf0.001)
    val dir = "/root/testdata/sf0.001"
    val got = AsOf.qAsOfJoin(spark, dir)
    val events = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"))
    val orders = graft.sources.Tables.orders(spark, dir)
    val brute = events.join(orders,
        events("user_id") === orders("o_custkey") &&
          orders("o_orderdate") <= events("ts"), "left")
      .groupBy(events("event_id"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("m.o_orderkey").as("bf_orderkey"))
    val diffs = got.join(brute, "event_id")
      .filter(not(col("last_orderkey") <=> col("bf_orderkey")))
      .count()
    assert(diffs == 0)
    assert(got.count() == events.count(), "left join: every event survives")
  }

  test("asOfJoin plan: single exchange on the key, no cartesian/range join") {
    val plan = AsOf.qAsOfJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
