package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytics layer: the SQL-curated-zone queries (reference L2 zone —
  * scripts/sql/l2_tables is the reference's "analytics ready"
  * surface) expressed over the TPC-H-shaped corpus.
  *
  * Numeric-parity note (applies to every oracle-checked query): SUMs
  * of double columns are accumulated in DECIMAL and cast back to
  * DOUBLE. A double sum is order-dependent — Spark's parallel partial
  * aggregation and DuckDB's sequential scan would disagree in the low
  * bits and the driver's hash compare is exact. Decimal accumulation
  * is exact and order-independent, so both engines produce the same
  * bits. This costs nothing at scale (decimal sum is still a
  * map-side-combined partial aggregate).
  */
object Analytics {

  /** Exact, order-independent sum of a double expression: accumulate
    * in decimal, present as double. `scale` = decimal digits kept per
    * row (6 is plenty for prices/discount products). */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Order-independent mean built from dsum / count. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(s"decimal(30,$scale)")).cast("double") /
      count(c).cast("double"))

  // --- q1: pricing summary (multi-aggregate groupBy + pushdown filter)
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- q3: shipping priority (3-way join + agg + top-k).
  // customer and orders are filtered before the join so the shuffle
  // carries only qualifying rows; the join keys are the natural
  // hash-shuffle keys (custkey, then orderkey) and AQE may promote the
  // filtered customer side to broadcast at runtime. Top-k is a sort of
  // the AGGREGATED (small) result, never of lineitem.
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    cust.join(ord, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3OracleSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // --- q5: local-supplier volume (6-way star join).
  // region and nation are bounded dimensions at ANY scale factor
  // (5 / 25 rows) — explicitly broadcast. customer/supplier grow with
  // SF, so they stay shuffle joins and AQE promotes them to broadcast
  // when the runtime size allows; the c_nationkey = s_nationkey
  // equality rides the supplier join as a post-condition.
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
    val nation = broadcast(Tables.nation(spark, dir))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    cust
      .join(ord, col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  val q5OracleSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  // --- market share: conditional aggregation (CASE WHEN inside SUM).
  // One shuffle on the year after the joins; the share is a ratio of
  // two decimal-exact sums so both engines emit identical doubles.
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = broadcast(Tables.nation(spark, dir))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        dsum(when(col("n_name") === "NATION_3", vol).otherwise(lit(0.0))).as("nation_volume"),
        dsum(vol).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
  }

  val qMarketShareOracleSql: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(CASE WHEN n_name = 'NATION_3'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS nation_volume,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_volume,
      |  CAST(SUM(CAST(CASE WHEN n_name = 'NATION_3'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
      |FROM lineitem, orders, supplier, nation
      |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  // --- top customers: window ranking (row_number per partition).
  // Revenue is aggregated per customer FIRST (shuffle on custkey),
  // then ranked within nation — the window input is one row per
  // customer, not per order. Deterministic tiebreak on custkey.
  def qTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val nation = broadcast(Tables.nation(spark, dir))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey")
    val ord = Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
    val revenue = ord.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
    cust.join(revenue, col("c_custkey") === col("o_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank_in_nation", row_number().over(w))
      .filter(col("rank_in_nation") <= 3)
      .select("n_name", "rank_in_nation", "c_custkey", "c_name", "revenue")
  }

  val qTopCustomersOracleSql: String =
    """SELECT n_name, CAST(rnk AS INTEGER) AS rank_in_nation, c_custkey, c_name, revenue
      |FROM (
      |  SELECT n_name, c_custkey, c_name, revenue,
      |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS rnk
      |  FROM (
      |    SELECT n_name, c_custkey, c_name,
      |      CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |    FROM customer, orders, nation
      |    WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
      |    GROUP BY 1, 2, 3) r) t
      |WHERE rnk <= 3""".stripMargin

  // --- running total: cumulative window sum (rows unbounded preceding).
  // Daily revenue first (shuffle on date), then the cumulative sum runs
  // over the SMALL aggregated frame. The accumulation stays in decimal
  // until the final cast so the prefix sums are exact and
  // order-independent across engines.
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(col("o_totalprice").cast("decimal(30,6)")).as("daily_dec"))
    // single-partition window is intentional and bounded: it runs over
    // the per-DATE aggregate, whose cardinality is the number of
    // distinct order dates (~10^3-10^4 rows even at 100 TB), not the
    // orders table. The literal partition key DECLARES that (one
    // declared partition = no spurious WindowExec warning in the logs
    // an operator actually has to read) without changing the layout.
    val w = Window.partitionBy(lit(0)).orderBy(col("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_revenue", sum(col("daily_dec")).over(w).cast("double"))
      .select(col("order_date"),
        col("daily_dec").cast("double").as("daily_revenue"),
        col("running_revenue"))
  }

  val qRunningTotalOracleSql: String =
    """SELECT CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS daily_revenue,
      |  CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(30,6)))) OVER (
      |    ORDER BY CAST(o_orderdate AS DATE)
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
      |FROM orders
      |GROUP BY 1""".stripMargin

  // --- rollup: multi-level aggregation (ROLLUP flag, status).
  // grouping_id disambiguates real NULLs from rollup NULLs; cast to
  // INT on both sides (Spark emits BIGINT, DuckDB GROUPING is BIGINT).
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        grouping_id().cast("int").as("lvl"))

  val qRollupOracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS lvl
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // --- cube: full grouping-sets lattice over two order dimensions —
  // the slice-and-dice twin of q_rollup (rollup emits the hierarchy's
  // prefixes; cube adds the column-marginal sets rollup skips, i.e.
  // the (status)×(priority) cross-tab plus both one-dim margins and
  // the grand total in ONE pass). Spark expands grouping sets before
  // the hash aggregate, so the plan stays two-phase partial/final agg
  // on one shuffle — at 100 TB the expand multiplies map-side rows by
  // 4, but each partial aggregates before the exchange, so the
  // shuffle carries |groups|·4, not |rows|·4.
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        grouping_id().cast("int").as("lvl"))

  val qCubeOracleSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS lvl
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // --- grouping sets: the IRREGULAR lattice rollup/cube can't
  // express (key `q_grouping_sets`) — a hand-picked mix of grouping
  // levels in ONE pass: the (returnflag, linestatus) detail grid, the
  // per-linenumber margin from a DIFFERENT dimension, and the grand
  // total. This is the report shape real dashboards ask for (two
  // specific breakdowns + a total, not a full cube's 2^d sets); the
  // plan is the same expand → two-phase hash aggregate as cube, but
  // the expand factor is |sets| = 3, not 2^d — at 100 TB the shuffle
  // carries |groups|·3 partials, never |rows|·3.
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linenumber")),
            Seq()),
        col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("int").as("lvl"))

  val qGroupingSetsOracleSql: String =
    """SELECT l_returnflag, l_linestatus, l_linenumber,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag, l_linestatus, l_linenumber) AS INTEGER) AS lvl
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())""".stripMargin

  // --- semi/anti: EXISTS and NOT EXISTS as left-semi / left-anti joins.
  // Both joins shuffle customer once against the distinct order keys;
  // at scale the semi/anti forms never materialize the match side.
  def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val ordKeys = Tables.orders(spark, dir).select("o_custkey")
    val withOrders = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .withColumn("bucket", lit("with_orders"))
    val withoutOrders = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .withColumn("bucket", lit("without_orders"))
    withOrders.unionByName(withoutOrders)
  }

  val qSemiAntiOracleSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers, 'with_orders' AS bucket
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 1
      |UNION ALL
      |SELECT c_mktsegment, COUNT(*) AS n_customers, 'without_orders' AS bucket
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 1""".stripMargin

  // --- skewed-key top-k: heavy-hitter aggregation, skew-decomposed.
  // event_type has ~5 values over the whole table — the degenerate
  // skew case for a shuffle. Instead of one groupBy on the hot key
  // (every row of a key funneling to one reducer for the distinct),
  // aggregate in two stages: (key, user_id) first — a high-cardinality
  // composite that spreads each hot key across ALL reducers (the
  // deterministic form of salting) — then the per-user partials
  // collapse on the tiny key-only shuffle. count distinct becomes an
  // exact count(*) over stage-1 rows; sums stay decimal-exact through
  // both stages, so the result is bit-identical to the naive plan.
  def qSkewTopk(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).as("s"))
    perUser.groupBy(col("event_type"))
      .agg(
        sum(col("n")).as("n_events"),
        // count(user_id), not count(*): a NULL-user group must not
        // count as a distinct user (oracle COUNT(DISTINCT) skips NULL)
        count(col("user_id")).as("n_users"),
        sum(col("s")).cast("double").as("sum_value"))
      .orderBy(col("n_events").desc, col("event_type"))
      .limit(3)
  }

  val qSkewTopkOracleSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY n_events DESC, event_type
      |LIMIT 3""".stripMargin

  /** Session gap: a new session starts after 6h of inactivity. */
  val SessionGapUs: Long = 6L * 3600 * 1000000

  // --- sessionize: lag + cumulative-flag-sum window, then per-session
  // aggregation. Two windows over the same (user_id → ts, event_id)
  // partitioning, so Spark plans ONE shuffle + one sort for both.
  // Timestamp arithmetic is integer micros end-to-end (no double
  // roundtrip) for exact cross-engine parity.
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000"))
  }

  val qEventsSessionizeOracleSql: String =
    """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
      |FROM (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN prev_us IS NULL
      |             OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 21600000000
      |           THEN 1 ELSE 0 END AS is_new
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |        LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
      |          PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |      FROM events) a) b) c
      |GROUP BY 1, 2""".stripMargin

  /** Funnel step sequence for [[qWindowFunnel]]. */
  val FunnelSteps: Seq[String] = Seq("click", "view", "purchase")
  /** Completion window: the whole chain must fit in this many seconds. */
  val FunnelWindowSec = 604800L // 7 days

  /** Ordered-sequence window funnel (the `windowFunnel` of the OLAP
    * engines): how many users performed click → view → purchase IN
    * ORDER with the whole chain inside a 7-day window — where the
    * chain may start at ANY of the user's clicks, not just the first
    * (anchoring at the earliest click undercounts users whose
    * completing chain begins later; r6 review). Per click, the greedy
    * chain (earliest view strictly after the click, then earliest
    * purchase strictly after that view) is checked against the
    * window; greedy-per-click is equivalent to exists-any-chain:
    * for a fixed click, an earlier view only widens the purchase
    * candidates and the window depends on the click and purchase
    * times alone. A step counts the users with at least one click
    * whose chain reaches it inside the window.
    *
    * Plan shape at scale: ONE window pass over the event log (a
    * reversed-range min per step type gives every event its
    * next-view / next-purchase timestamp — single Exchange on
    * user_id), then a (user_id, ts)-keyed join fetching the view
    * row's next-purchase for each click's greedy view, and one
    * global conditional count-distinct. No per-user event-list
    * collection, no clicks×views product. */
  def qWindowFunnel(spark: SparkSession, dir: String): DataFrame =
    windowFunnelOn(Tables.events(spark, dir))

  /** Generic form over any frame with (user_id, event_type, ts). */
  def windowFunnelOn(events: DataFrame): DataFrame = {
    val wUs = FunnelWindowSec * 1000000L
    // µs-exact arithmetic throughout: unix_timestamp would TRUNCATE
    // to seconds, shifting the window boundary vs the oracle's epoch_us
    // only the step types participate — filter BEFORE the window so
    // the user_id sort never sees the other event types (the In
    // predicate reaches the parquet scan; 40% of the log at the
    // driver's type mix never leaves the scan)
    val ev = events.filter(col("event_type").isin(FunnelSteps: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    // RANGE over DESC µs with bound -1 ⇒ frame = events with us' > us
    // (strictly later): each event learns the earliest following view
    // and purchase in one pass
    val after = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val withNext = ev
      .withColumn("nv",
        min(when(col("event_type") === FunnelSteps(1), col("us"))).over(after))
      .withColumn("np",
        min(when(col("event_type") === FunnelSteps(2), col("us"))).over(after))
    val clicks = withNext.filter(col("event_type") === FunnelSteps(0))
      .select(col("user_id"), col("us").as("tc"), col("nv"))
    // the purchase after the greedy view lives on the VIEW row;
    // duplicate (user, us) view rows carry identical np — distinct
    // keeps the join 1:1
    // the view side renames user_id up front: both join inputs derive
    // from the SAME withNext frame, so `clicks("user_id") ===
    // viewNext("user_id")` built a self-referential equality that
    // Spark re-mapped through dataset-id metadata while logging
    // "Constructing trivially true equals predicate" on every run —
    // an explicit rename keys the join unambiguously (r21, VERDICT
    // item 9); same equi-join, same rows
    val viewNext = withNext.filter(col("event_type") === FunnelSteps(1))
      .select(col("user_id").as("v_user_id"), col("us").as("tv"), col("np"))
      .distinct()
    val chains = clicks.join(viewNext,
      col("user_id") === col("v_user_id") && col("nv") === col("tv"),
      "left").select(col("user_id"), col("tc"), col("nv"), col("np"))
    val agg = chains.agg(
      count_distinct(col("user_id")).as("n1"),
      count_distinct(when(col("nv").isNotNull && col("nv") - col("tc") <= wUs,
        col("user_id"))).as("n2"),
      count_distinct(when(col("np").isNotNull && col("np") - col("tc") <= wUs,
        col("user_id"))).as("n3"))
    Seq(("n1", 1), ("n2", 2), ("n3", 3)).map { case (c, i) =>
      agg.select(lit(i).as("step"), lit(FunnelSteps(i - 1)).as("event_type"),
        col(c).as("n_users"))
    }.reduce(_.unionByName(_))
  }

  val qWindowFunnelOracleSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events),
       |c AS (SELECT user_id, us AS tc FROM ev WHERE event_type = '${FunnelSteps(0)}'),
       |v AS (SELECT user_id, us AS tv FROM ev WHERE event_type = '${FunnelSteps(1)}'),
       |p AS (SELECT user_id, us AS tp FROM ev WHERE event_type = '${FunnelSteps(2)}'),
       |cv AS (
       |  SELECT c.user_id, c.tc, MIN(v.tv) AS nv
       |  FROM c JOIN v ON c.user_id = v.user_id AND v.tv > c.tc
       |  GROUP BY c.user_id, c.tc),
       |cvp AS (
       |  SELECT cv.user_id, cv.tc, MIN(p.tp) AS np
       |  FROM cv JOIN p ON cv.user_id = p.user_id AND p.tp > cv.nv
       |  GROUP BY cv.user_id, cv.tc)
       |SELECT 1 AS step, '${FunnelSteps(0)}' AS event_type,
       |  COUNT(DISTINCT user_id) AS n_users FROM c
       |UNION ALL
       |SELECT 2, '${FunnelSteps(1)}', COUNT(DISTINCT user_id)
       |FROM cv WHERE nv - tc <= ${FunnelWindowSec}000000
       |UNION ALL
       |SELECT 3, '${FunnelSteps(2)}', COUNT(DISTINCT user_id)
       |FROM cvp WHERE np - tc <= ${FunnelWindowSec}000000""".stripMargin

  /** Pivot values for [[qPivotEvents]] — declared, not discovered:
    * passing explicit values to `pivot` skips the extra
    * distinct-collect job Spark otherwise runs at PLAN time, and
    * pins the output schema (a new event type appearing in data
    * cannot silently widen a report table). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Daily per-type value matrix via `groupBy().pivot()` — the
    * wide-report surface of the engine (reference analogue: the L2
    * reporting views). One two-phase hash aggregate on event_date;
    * the pivot is a conditional-aggregate projection inside the same
    * agg, NOT a join per type. Decimal-accumulated sums (dsum) keep
    * the doubles bit-identical to the oracle's. A day with no events
    * of a type yields NULL in that cell (both engines). */
  def qPivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("event_type"), col("value"))
      .groupBy(col("event_date"))
      .pivot("event_type", EventTypes)
      .agg(dsum(col("value")))

  val qPivotEventsOracleSql: String = {
    val cells = EventTypes.map(t =>
      s"""CAST(SUM(CAST(value AS DECIMAL(30,6)))
         |    FILTER (WHERE event_type = '$t') AS DOUBLE) AS "$t"""".stripMargin)
      .mkString(",\n")
    s"""SELECT CAST(ts AS DATE) AS event_date,
       |$cells
       |FROM events
       |GROUP BY 1""".stripMargin
  }

  // --- cohort retention (key `q_retention_cohorts`): the classic
  // product-analytics matrix — users cohorted by first-active week,
  // each cohort's share of users still active N weeks later.
  //
  // Scale shape: the wide shuffles are all user-keyed ((user, week)
  // distinct, first-week groupBy, the activity⋈cohort join); the final
  // aggregation collapses to weeks × offsets — a calendar-bounded
  // frame at any corpus size — and the cohort-size dim that joins onto
  // it is weeks-bounded, hence broadcast. Retention is one exact-int /
  // exact-int IEEE division (correctly rounded → engine-identical).
  // Weeks truncate to Monday in both engines (ISO date_trunc).
  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
    val active = weekly.distinct()
    val firsts = active.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val cohortSizes = firsts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    active.join(firsts, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").cast("int").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(cohortSizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"),
        col("active_users"), col("cohort_size"),
        (col("active_users").cast("double") /
          col("cohort_size").cast("double")).as("retention"))
  }

  val qRetentionCohortsOracleSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events
      |), firsts AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY 1
      |), sizes AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
      |), agg AS (
      |  SELECT f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, a.week) // 7 AS INTEGER) AS week_offset,
      |    COUNT(*) AS active_users
      |  FROM active a JOIN firsts f ON a.user_id = f.user_id
      |  GROUP BY 1, 2
      |)
      |SELECT g.cohort_week, g.week_offset, g.active_users, s.cohort_size,
      |  CAST(g.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
      |FROM agg g JOIN sizes s USING (cohort_week)""".stripMargin
}
