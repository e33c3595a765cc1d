package graft

import org.apache.spark.sql.functions._

/** Scale-stress harness: synthesizes an events table N× the sf0.1
  * row count (same schema/distributions) in a temp dir, runs the
  * shuffle-bearing core operators on it, and prints one JSON line of
  * seconds per operator. Generated data is used ONLY here — the
  * correctness gate always runs on the driver's corpora.
  *
  * `sbt "runMain graft.ScaleCheck 100"` → 10M events.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt * 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 100000L * mult
    val dir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    // same columns/value shapes as the driver's events table
    spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + (col("id") % 2592000L) * 1000000L).as("ts"),
      pmod(xxhash64(col("id")), lit(15000L)).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase"), lit("scroll"), lit("hover")),
        (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int")).as("event_type"),
      (pmod(xxhash64(col("id"), lit(2)), lit(100000L)).cast("double") / 1000.0).as("value"),
      concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(3)), lit(100L)), lit("}")).as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    def run(name: String, df: => org.apache.spark.sql.DataFrame) = {
      val d = df
      // one execution: count rows with an accumulator DURING the timed
      // materialization instead of re-running the operator for a count
      val acc = spark.sparkContext.longAccumulator(s"rows_$name")
      val t0 = System.nanoTime()
      d.queryExecution.toRdd.foreachPartition(it => acc.add(it.size.toLong))
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, acc.value.toLong)
    }

    val results = Seq(
      run("etl_normalize", operators.Etl.normalize(spark, dir)),
      run("etl_hourly_rollup", operators.Etl.hourlyRollup(spark, dir)),
      run("etl_keep_latest", operators.Etl.keepLatest(spark, dir)),
      run("q_events_sessionize", queries.Analytics.qEventsSessionize(spark, dir)),
      run("stream_windowed_agg", streaming.Streams.windowedAggBatch(spark, dir)))

    // end-to-end per-ds pipeline (normalize + DQ + staged write + L2
    // merge) — the unit of work the reference DAG runs per day
    val lake = java.nio.file.Files.createTempDirectory("graft_scale_lake").toString
    val tp0 = System.nanoTime()
    val summary = operators.Pipeline.runDs(spark, dir, lake, "2024-01-15")
    val pipeSec = (System.nanoTime() - tp0) / 1e9
    val pipe = s""""pipeline_run_ds":{"sec":$pipeSec,"rows":${summary.nNormalized},"l2_rows":${summary.nL2}}"""

    val qs = (results.map { case (k, s, r) => s""""$k":{"sec":$s,"rows":$r}""" } :+ pipe).mkString(",")
    println(s"""{"scale_mult":$mult,"n_events":$n,"ops":{$qs}}""")
    spark.stop()
  }
}
