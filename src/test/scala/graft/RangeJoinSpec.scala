package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpecBase {

  private def ts(s: String) = to_timestamp(lit(s))

  test("interval join: binned form equals the naive theta join; each pair once") {
    val binned = graft.operators.RangeJoin.qIntervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // each (session, incident) pair appears EXACTLY once despite the
    // two sides sharing several covered bins
    assert(binned.length == binned.map(t => (t._1, t._2, t._3, t._4)).distinct.length,
      "a pair met in more than one bin — the first-shared-bin guard leaks")
    assert(binned.forall(_._5 >= 0L), "negative overlap emitted")
    // the naive formulation (no bins): same session/incident pairs
    import graft.queries.Analytics
    val sessions = Analytics.qEventsSessionize(spark, sfDir)
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"), col("duration_sec"))
    val incidents = sessions
      .orderBy(col("duration_sec").desc, col("user_id"), col("session_id"))
      .limit(graft.operators.RangeJoin.IntervalTopK)
      .select(col("user_id").as("iu"), col("session_id").as("is"),
        col("s_us").as("i_s"), col("e_us").as("i_e"))
    val naive = sessions.join(incidents,
        col("s_us") <= col("i_e") && col("i_s") <= col("e_us") &&
        col("user_id") =!= col("iu"))
      .select(col("user_id"), col("session_id"), col("iu"), col("is"),
        (least(col("e_us"), col("i_e")) - greatest(col("s_us"), col("i_s"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(binned.toSet == naive.toSet,
      s"binned ${binned.length} rows != naive ${naive.length}")
  }

  test("binnedRangeJoinOn: boundary semantics and bin-crossing intervals") {
    import spark.implicits._
    val intervals = Seq(
      ("w1", "2024-01-01 10:00:00", "2024-01-01 13:00:00"),
      ("w2", "2024-01-01 12:30:00", "2024-01-01 14:30:00")) // overlaps w1
      .toDF("wid", "s", "e")
      .select(col("wid"), col("s").cast("timestamp").as("start_ts"),
        col("e").cast("timestamp").as("end_ts"))
    val points = Seq(
      (1L, "2024-01-01 10:00:00"), // == start -> in (closed start)
      (2L, "2024-01-01 12:59:59"), // in w1 and w2
      (3L, "2024-01-01 13:00:00"), // == w1 end -> OUT of w1 (open end), in w2
      (4L, "2024-01-01 09:59:59"), // before everything
      (5L, "2024-01-01 14:29:59"), // last second of w2, bin 14 != start bin
      (6L, "2024-01-01 14:30:00")) // == w2 end -> out
      .toDF("pid", "p")
      .select(col("pid"), col("p").cast("timestamp").as("pts"))
    val got = RangeJoin.binnedRangeJoinOn(intervals, points, col("pts"), "hour")
      .select("wid", "pid").as[(String, Long)].collect().toSet
    assert(got == Set(("w1", 1L), ("w1", 2L), ("w2", 2L), ("w2", 3L), ("w2", 5L)))
  }

  test("binnedRangeJoinOn meets each (interval, point) pair exactly once") {
    import spark.implicits._
    // a 3-bin interval and a point inside it: the bin explosion must
    // not duplicate the match
    val intervals = Seq(("w", "2024-01-01 10:00:00", "2024-01-01 13:00:00"))
      .toDF("wid", "s", "e")
      .select(col("wid"), col("s").cast("timestamp").as("start_ts"),
        col("e").cast("timestamp").as("end_ts"))
    val points = Seq((1L, "2024-01-01 11:30:00")).toDF("pid", "p")
      .select(col("pid"), col("p").cast("timestamp").as("pts"))
    assert(RangeJoin.binnedRangeJoinOn(intervals, points, col("pts"), "hour")
      .count() == 1)
  }

  test("q_range_join matches the naive theta-join at sf0.001") {
    val got = RangeJoin.qRangeJoin(spark, sfDir)
    val events = graft.sources.Tables.events(spark, sfDir)
    val windows = events
      .groupBy(date_trunc("hour", col("ts")).as("start_ts"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("start_ts")).limit(RangeJoin.SpikeK)
      .select(col("start_ts"),
        (col("start_ts") + expr(s"INTERVAL ${RangeJoin.WindowHours} HOURS")).as("end_ts"))
    // the plan we refuse at scale — fine over sf0.001
    val naive = windows.join(events,
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .groupBy(col("start_ts").as("window_start"))
      .agg(count(lit(1)).as("n_events"))
    val diffs = got.select("window_start", "n_events")
      .exceptAll(naive).count()
    assert(diffs == 0 && got.count() == naive.count())
  }

  test("q_range_join plan: equi-join on the bin, no nested-loop product") {
    val plan = RangeJoin.qRangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the interval side is tiny (SpikeK rows) so a broadcast HASH join
    // on the bin key is the right plan; a nested-loop broadcast join
    // (range-predicate-only) is exactly what the binning avoids
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
