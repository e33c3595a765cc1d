package graft

/** Diagnostic main: attribute optimizer hint warnings to driver keys.
  *
  * `HintErrorLogger` warns ("A hint ... is not part of a join
  * relation") when a `broadcast()` mark survives to a plan position
  * the optimizer cannot attach to a join — an orphaned hint. The
  * warning carries no query context, so the bench tail shows WHICH
  * warnings but not WHOSE. This main executes every key at the given
  * sf dir with a stderr marker line before each, so the interleaved
  * stderr attributes each warning to the key that produced it:
  *
  *   sbt -batch "runMain graft.HintAudit /root/testdata/sf0.01" \
  *     2>&1 | grep -B3 HintError
  *
  * Diagnostic only — not part of the driver contract.
  */
object HintAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[hintaudit] $name")
      System.err.flush()
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable => System.err.println(s"[hintaudit] $name FAILED: ${e.getMessage}")
      }
    }
    System.err.println("[hintaudit] done")
    spark.stop()
  }
}
