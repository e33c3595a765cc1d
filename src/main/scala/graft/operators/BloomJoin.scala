package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.queries.Analytics.dsum

/** Bloom-prefiltered join: cut the probe side's shuffle volume with a
  * bloom filter built from the (selective) build side's join keys —
  * the explicit form of Spark's runtime bloom filter and of the
  * sideways information passing every warehouse engine does for
  * star-schema joins.
  *
  * Why it matters at 100 TB: in `fact ⋈ dim.filter(selective)`, the
  * fact table's shuffle dominates — every fact row crosses the wire
  * just to be dropped by the join. The bloom moves that drop BEFORE
  * the exchange: build-side keys are hashed into an `m`-bit filter by
  * a distributed aggregate (map-side partials, one binary blob to the
  * driver — KBs–MBs, same pattern as a broadcast relation), and the
  * probe scan keeps only rows whose key MIGHT be present. At 1% false
  * positive rate the exchange shrinks to ~(selectivity + 1%) of the
  * fact table. Correctness is unconditional: a false positive just
  * rides to the exact hash join and is dropped there, so the output
  * equals the plain join's — which is exactly what the oracle checks.
  *
  * The filter itself is `org.apache.spark.util.sketch.BloomFilter`
  * via Spark's own `BloomFilterAggregate`/`BloomFilterMightContain`
  * expressions (see [[graft.functions.BloomFunctions]]), keyed on
  * `xxhash64` so the probe-side test is a codegen'd long-hash lookup.
  */
object BloomJoin {

  /** False-positive rate the filter is sized for. */
  val Fpp = 0.01

  /** Returns `probe` reduced to rows whose `probeKey` might appear in
    * `build`'s `buildKey` set. `expectedItems` sizes the filter; pass
    * the build side's (approximate) key count — an undersized filter
    * only raises the false-positive rate, never drops a true match. */
  def bloomPrefilter(probe: DataFrame, probeKey: Column,
                     build: DataFrame, buildKey: Column,
                     expectedItems: Long): DataFrame = {
    require(expectedItems > 0, s"bloomPrefilter: expectedItems must be > 0, got $expectedItems")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, Fpp)
    // one-row scalar collect: the serialized filter (KBs at these
    // cardinalities), the same driver round-trip a broadcast join does
    val bloom = build
      .agg(call_function("graft_bloom_agg",
        xxhash64(buildKey), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    probe.where(call_function("graft_might_contain", lit(bloom), xxhash64(probeKey)))
  }

  /** Build-side selectivity knob: orders above this price qualify
    * (~3% of rows on the TPC-H-shaped generator). */
  val PriceFloor = 480000.0

  /** Driver query: revenue of lineitems belonging to high-value
    * orders, with the lineitem side bloom-prefiltered on
    * `l_orderkey` before the join. Output is identical to the plain
    * join (the oracle runs the plain join), so the hash check proves
    * the reduction is semantics-free. */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > PriceFloor)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lineitem = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    // cheap count-aggregate over the already-filtered build side;
    // at warehouse scale this would come from stats / a prior stage
    val nKeys = math.max(orders.count(), 1L)
    val pref = bloomPrefilter(lineitem, col("l_orderkey"), orders, col("o_orderkey"), nKeys)
    pref.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** The oracle is the PLAIN join — the bloom must not change it. */
  val qBloomJoinOracleSql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_totalprice > $PriceFloor
       |GROUP BY 1""".stripMargin
}
