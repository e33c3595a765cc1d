package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Skew}
import graft.queries.Analytics

/** Lakehouse-maintenance + diagnostics tier: compaction planner,
  * key-skew profiler, cube lattice. */
class MaintainSpec extends SparkSpecBase {
  import spark.implicits._

  test("compaction plan: bins partition each day's files, contiguous in hour order") {
    val rows = Layout.qCompaction(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDay = rows.groupBy(_.getDate(0))
    byDay.foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.getInt(1))
      // bins are monotone non-decreasing in hour order (contiguity:
      // a bin is an hour interval, never interleaved)
      val bins = sorted.map(_.getLong(3))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
      // bin_rows is consistent: sum of member n_rows
      sorted.groupBy(_.getLong(3)).foreach { case (_, members) =>
        val expect = members.map(_.getLong(2)).sum
        assert(members.forall(_.getLong(4) == expect))
        assert(members.forall(_.getLong(5) == members.length.toLong))
      }
      // day splits into at most BinsPerDay+1 bins (greedy overflow can
      // add one tail bin when the last file overshoots), at least 1
      val nBins = bins.distinct.length
      assert(nBins >= 1 && nBins <= Layout.CompactionBinsPerDay + 1)
    }
  }

  test("compaction plan: greedy packing fills past target then opens a new bin") {
    // handcrafted inventory: one partition, target 10, sizes chosen so
    // the greedy walk is unambiguous
    val files = Seq(
      ("p", 1L, 4L), ("p", 2L, 4L), ("p", 3L, 4L), // cum_excl 0,4,8  -> bin 0
      ("p", 4L, 4L),                               // cum_excl 12     -> bin 1
      ("p", 5L, 9L),                               // cum_excl 16     -> bin 1
      ("p", 6L, 1L)                                // cum_excl 25     -> bin 2
    ).toDF("part", "file_id", "size")
    val plan = Layout.compactionPlanOn(files, lit(10L))
      .orderBy("file_id").select("file_id", "bin").as[(Long, Long)].collect()
    assert(plan.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 2L)))
  }

  test("key skew: handcrafted hot key yields its share and the ceil(max/avg) salt") {
    // 1 hot key with 8 rows + 4 keys with 1 row: N=12, D=5, max=8
    // avg = 12/5 = 2.4 -> salt = ceil(8/2.4) = ceil(8*5/12) = ceil(3.33) = 4
    val df = (Seq.fill(8)(100L) ++ Seq(1L, 2L, 3L, 4L)).toDF("k")
    val prof = Skew.keySkewProfileOn(df, col("k"), topK = 3)
      .orderBy(col("cnt").desc, col("key")).collect()
    assert(prof.length == 3)
    val hot = prof.head
    assert(hot.getLong(hot.fieldIndex("cnt")) == 8L)
    assert(hot.getLong(hot.fieldIndex("n_keys")) == 5L)
    assert(hot.getLong(hot.fieldIndex("total_rows")) == 12L)
    assert(hot.getLong(hot.fieldIndex("salt_factor")) == 4L)
    assert(math.abs(hot.getDouble(hot.fieldIndex("share")) - 8.0 / 12.0) < 1e-15)
  }

  test("key skew driver query: ranks dense from 1, shares sum below 1, summary constant") {
    val rows = Skew.dqKeySkew(spark, sfDir).collect()
    assert(rows.length == Skew.TopKeys)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to Skew.TopKeys))
    // counts non-increasing in rank order
    val byRank = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getDouble(3)).sum <= 1.0 + 1e-12)
    assert(rows.map(_.getLong(6)).distinct.length == 1) // one salt verdict
  }

  test("salted join: row-for-row equal to the plain join; no straggler partition") {
    // skewed fixture: one hot key carrying 20k fact rows beside 50
    // uniform keys of 100 rows; dim = one row per key
    val fact = spark.range(25000L).select(
      when(col("id") < 20000L, lit(999L)).otherwise(col("id") % 50).as("k"),
      col("id").as("fact_payload"))
    val dim = spark.range(50L).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("dim_payload"))
      .unionAll(Seq((999L, "hot")).toDF("k", "dim_payload"))
    // profile says spread the hot key: max=20000, D=51, N=25000
    // -> ceil(20000*51/25000) = 41
    val plainRows = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val saltedDf = Skew.saltedJoin(fact, dim, Seq("k"), saltFactor = 41)
    val saltedRows = saltedDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(saltedRows == plainRows, "salted join must equal the plain join row-for-row")
    assert(!saltedDf.columns.contains("__salt"))
    // left join: unmatched fact keys survive exactly once
    val factExtra = fact.unionAll(Seq((12345L, -1L)).toDF("k", "fact_payload"))
    val leftGot = Skew.saltedJoin(factExtra, dim, Seq("k"), 41, "left")
      .where(col("k") === 12345L).collect()
    assert(leftGot.length == 1 && leftGot.head.isNullAt(2))
    // outer types that would replicate unmatched dim rows are refused
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), 41, "full_outer")
    }
    // the straggler assert: with the shuffle path forced (no broadcast,
    // no AQE rewrite), the plain join lands every hot-key row in ONE
    // reducer partition; the salted form spreads them ~saltFactor ways
    val conf = spark.conf
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
        df.withColumn("__p", spark_partition_id())
          .groupBy("__p").count().agg(max("count")).collect()(0).getLong(0)
      def hotParts(df: org.apache.spark.sql.DataFrame): Long =
        df.where(col("k") === 999L).withColumn("__p", spark_partition_id())
          .select("__p").distinct().count()
      val plain = fact.join(dim, Seq("k"))
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), 41)
      assert(maxPartRows(plain) >= 20000L && hotParts(plain) == 1L,
        "fixture must straggle the plain join (all hot rows in one task)")
      // spread: the hot key occupies EVERY reducer, and no partition
      // holds much more than its fair share of the whole join
      val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(hotParts(salted) == nParts.toLong,
        s"salted hot key must span all $nParts reducers, got ${hotParts(salted)}")
      assert(maxPartRows(salted) <= 2L * 25000L / nParts,
        s"salted max partition ${maxPartRows(salted)} exceeds 2x fair share")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // the auto form reads the profiler's factor (41 here) and agrees
    val autoRows = Skew.saltedJoinAuto(fact, dim, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(autoRows == plainRows)
  }

  test("hilbert: consecutive indices are edge-adjacent cells (unit Manhattan step)") {
    import graft.functions.Hilbert
    // the defining curve property Morton lacks — check a dense prefix
    // plus random aligned blocks deeper in the index space
    def stepOk(d: Long): Boolean = {
      val (x0, y0) = Hilbert.d2xy(d)
      val (x1, y1) = Hilbert.d2xy(d + 1)
      math.abs(x1 - x0) + math.abs(y1 - y0) == 1
    }
    assert((0L until 4096L).forall(stepOk))
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val base = (rnd.nextLong() & ((1L << 32) - 2)) & ~15L
      assert((base until base + 15).forall(stepOk), s"non-unit step near $base")
    }
  }

  test("hilbert: xy2d inverts d2xy across the index space; expression agrees with the JVM walk") {
    import graft.functions.Hilbert
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val d = rnd.nextLong() & ((1L << 32) - 1)
      val (x, y) = Hilbert.d2xy(d)
      assert(Hilbert.xy2d(x, y) == d, s"bijectivity broke at d=$d")
    }
    // the native expression = the shared static, through codegen
    val pts = Seq.fill(64)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = pts.toDF("x", "y")
      .withColumn("h", expr("hilbert_index(x, y)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    df.foreach { case (x, y, h) => assert(h == Hilbert.xy2d(x, y)) }
  }

  test("qHilbertLayout tiles bound both dimensions") {
    val rows = Layout.qHilbertLayout(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val spanX = r.getLong(r.fieldIndex("max_x")) - r.getLong(r.fieldIndex("min_x"))
      val spanY = r.getLong(r.fieldIndex("max_y")) - r.getLong(r.fieldIndex("min_y"))
      // tile = hkey >> 22: an ALIGNED 4^11 index block is exactly one
      // 2^11 × 2^11 subsquare of the recursive construction
      assert(spanX < 2048 && spanY < 2048,
        s"tile ${r.getLong(r.fieldIndex("tile"))} spans x=$spanX y=$spanY — not clustered")
    }
  }

  test("surrogate keys: dense 1..n, order-consistent, partition-count independent") {
    val df = (1 to 500).map(i => (i.toLong * 7 % 501, i.toLong))
      .toDF("k", "id")
    def run(parts: Int) = graft.operators.Keys
      .surrogateKeysOn(df, Seq(col("k"), col("id")), partitions = parts)
      .select("sk", "k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = run(4)
    assert(a.map(_._1).toSeq == (1L to 500L), "ids not dense 1..n")
    // ids follow the declared total order
    val ordered = a.sortBy(t => (t._2, t._3))
    assert(ordered.map(_._1).toSeq == (1L to 500L), "ids disagree with the order key")
    // the parallelism knob must not change a single id
    assert(run(9).toSeq == a.toSeq, "ids depend on partition count")
  }

  test("cube: 4 grouping levels; grand total row equals the table count") {
    val rows = Analytics.qCube(spark, sfDir).collect()
    val lvls = rows.map(_.getInt(4)).distinct.sorted
    assert(lvls.toSeq == Seq(0, 1, 2, 3))
    val total = sources.Tables.orders(spark, sfDir).count()
    val grand = rows.filter(_.getInt(4) == 3)
    assert(grand.length == 1 && grand.head.getLong(2) == total)
    // detail level sums to the grand total
    assert(rows.filter(_.getInt(4) == 0).map(_.getLong(2)).sum == total)
    // both one-dim margins (lvl 1 = priority rolled up, lvl 2 = status
    // rolled up) also each sum to the table count
    assert(rows.filter(_.getInt(4) == 1).map(_.getLong(2)).sum == total)
    assert(rows.filter(_.getInt(4) == 2).map(_.getLong(2)).sum == total)
  }
}
