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

  test("q3: at most 10 rows, sorted by revenue desc") {
    val rows = Analytics.q3ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(3))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5: one row per ASIA nation with positive revenue") {
    val rows = Analytics.q5LocalSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach(r => assert(r.getDouble(1) > 0))
  }

  test("market share: share in [0,1] and volumes consistent") {
    val rows = Analytics.qMarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(share >= 0 && share <= 1)
      assert(math.abs(share - nat / tot) < 1e-12)
    }
  }

  test("top customers: at most 3 per nation, ranks 1..3 contiguous") {
    val rows = Analytics.qTopCustomers(spark, sfDir).collect()
    val perNation = rows.groupBy(_.getString(0))
    perNation.values.foreach { rs =>
      val ranks = rs.map(_.getInt(1)).sorted
      assert(ranks.sameElements(1 to ranks.length))
      assert(ranks.length <= 3)
    }
  }

  test("running total: monotone and ends at the grand total") {
    val rows = Analytics.qRunningTotal(spark, sfDir)
      .orderBy("order_date").collect()
    val running = rows.map(_.getDouble(2))
    assert(running.zip(running.tail).forall { case (a, b) => b >= a })
    val totalDaily = rows.map(_.getDouble(1)).sum
    assert(math.abs(running.last - totalDaily) < 1e-6 * math.abs(totalDaily))
  }

  test("rollup: grand-total level matches table count") {
    val rows = Analytics.qRollup(spark, sfDir).collect()
    val byLvl = rows.groupBy(_.getInt(5))
    assert(byLvl.keySet == Set(0, 1, 3))
    val grand = byLvl(3).head.getLong(2)
    assert(grand == sources.Tables.lineitem(spark, sfDir).count())
    assert(byLvl(0).map(_.getLong(2)).sum == grand)
  }

  test("grouping sets: exactly the three requested levels, each a " +
      "partition of the table") {
    val rows = Analytics.qGroupingSets(spark, sfDir).collect()
    // cols (rf, ls, ln): set (rf,ls) → ln aggregated → lvl 0b001=1;
    // set (ln) → lvl 0b110=6; grand total → 7 — and NOTHING else
    // (the irregular lattice, not a rollup prefix chain or full cube)
    val byLvl = rows.groupBy(_.getInt(5))
    assert(byLvl.keySet == Set(1, 6, 7), s"unexpected levels ${byLvl.keySet}")
    val n = sources.Tables.lineitem(spark, sfDir).count()
    assert(byLvl(7).head.getLong(3) == n)
    assert(byLvl(1).map(_.getLong(3)).sum == n,
      "the (returnflag, linestatus) grid must partition the table")
    assert(byLvl(6).map(_.getLong(3)).sum == n,
      "the linenumber margin must partition the table")
    // per-group decimal sums are exact; re-summing their DOUBLE casts
    // driver-side reintroduces fp error — tolerance, not equality
    val grandQty = byLvl(7).head.getDouble(4)
    assert(math.abs(byLvl(1).map(_.getDouble(4)).sum - grandQty)
      < 1e-9 * math.abs(grandQty),
      "quantity mass must be conserved across the detail grid")
  }

  test("semi/anti: buckets partition the customer table") {
    val rows = Analytics.qSemiAnti(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == sources.Tables.customer(spark, sfDir).count())
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("with_orders", "without_orders")))
  }

  test("skew topk: 3 rows sorted by count desc") {
    val rows = Analytics.qSkewTopk(spark, sfDir).collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("sessionize: events partition into gap-bounded sessions") {
    val sess = Analytics.qEventsSessionize(spark, sfDir).collect()
    val nEvents = sess.map(_.getLong(2)).sum
    assert(nEvents == sources.Tables.events(spark, sfDir).count())
    sess.foreach { r =>
      val dur = r.getLong(5)
      assert(dur >= 0)
    }
    // session ids per user are contiguous starting at 1
    sess.groupBy(_.getLong(0)).values.foreach { rs =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 1 && ids.last == ids.length)
    }
  }

  test("funnel: monotone step counts; completers verified on a handcrafted log") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.qWindowFunnel(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    assert(rows.map(_._2).toSeq == Analytics.FunnelSteps)
    // each step's population is a subset of the previous step's
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3)
    assert(rows(0)._3 > 0, "no user ever clicked — corpus assumption broken")
    // handcrafted chains pin the ORDER and WINDOW semantics:
    //  u1: full in-order chain inside the window       -> completes
    //  u2: purchase BEFORE view (order violated)       -> stops at 2
    //  u3: in-order but chain span exceeds the window  -> stops at 2
    //  u4: click only                                  -> stops at 1
    //  u5: chain from the FIRST click misses the window, but a later
    //      click starts a complete in-window chain     -> completes
    //      (the case an earliest-click anchor undercounts; r6 review)
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(plusSec: Long) = new java.sql.Timestamp(base.getTime + plusSec * 1000)
    val W = Analytics.FunnelWindowSec
    val log = Seq(
      (1L, "click", t(0)), (1L, "view", t(10)), (1L, "purchase", t(20)),
      (2L, "click", t(0)), (2L, "purchase", t(5)), (2L, "view", t(10)),
      (3L, "click", t(0)), (3L, "view", t(10)), (3L, "purchase", t(W + 1)),
      (4L, "click", t(0)),
      (5L, "click", t(0)), (5L, "click", t(W - 86400)),
      (5L, "view", t(W - 43200)), (5L, "purchase", t(W + 43200))
    ).toDF("user_id", "event_type", "ts")
    val steps = Analytics.windowFunnelOn(log).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(steps(1) == 5, "u1-u5 all clicked")
    assert(steps(2) == 4, "u4 never viewed; u2's pre-click purchase doesn't count as step 3 but its view does as step 2")
    assert(steps(3) == 2, "u1 and u5 complete: u2 out of order, u3 outside the window, u5 via its LATER click")
  }

  test("pivot: cells partition the per-day totals; absent types are NULL") {
    import org.apache.spark.sql.functions._
    val ev = sources.Tables.events(spark, sfDir)
    val pivoted = Analytics.qPivotEvents(spark, sfDir).cache()
    // one row per distinct event date, one column per declared type
    assert(pivoted.count() ==
      ev.select(to_date(col("ts"))).distinct().count())
    assert(pivoted.columns.toSeq ==
      ("event_date" +: Analytics.EventTypes))
    // the pivot cells sum (null-safe) to the plain per-day total —
    // the wide report and the long rollup describe the same mass
    val cellSum = Analytics.EventTypes
      .map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduce(_ + _)
    val longForm = ev.groupBy(to_date(col("ts")).as("event_date"))
      .agg(Analytics.dsum(col("value")).as("day_total"))
    val joined = pivoted.withColumn("cells", cellSum)
      .join(longForm, "event_date")
    assert(joined.filter(
      abs(col("cells") - col("day_total")) > 1e-9).count() == 0)
    // a (day, type) with no events is NULL, never 0.0
    val present = ev.select(to_date(col("ts")).as("event_date"),
      col("event_type")).distinct().collect()
      .map(r => (r.getDate(0).toString, r.getString(1))).toSet
    pivoted.collect().foreach { r =>
      val d = r.getDate(0).toString
      Analytics.EventTypes.zipWithIndex.foreach { case (t, i) =>
        val isNull = r.isNullAt(i + 1)
        assert(isNull == !present((d, t)),
          s"cell ($d, $t) null=$isNull but present=${present((d, t))}")
      }
    }
    pivoted.unpersist()
  }

  test("retention cohorts: offset-0 row is the full cohort; shares bounded") {
    val rows = Analytics.qRetentionCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (active, size) = (r.getAs[Long]("active_users"), r.getAs[Long]("cohort_size"))
      val (off, ret) = (r.getAs[Int]("week_offset"), r.getAs[Double]("retention"))
      assert(off >= 0 && active >= 1 && active <= size)
      assert(ret > 0.0 && ret <= 1.0)
      // cohort week = first-active week, so everyone is active at offset 0
      if (off == 0) assert(active == size && ret == 1.0)
    }
    // (cohort, offset) is a key
    val keys = rows.map(r => (r.getAs[java.sql.Date]("cohort_week"), r.getAs[Int]("week_offset")))
    assert(keys.distinct.length == keys.length)
  }
}
