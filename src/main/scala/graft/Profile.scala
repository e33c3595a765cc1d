package graft

import scala.collection.mutable

/** Dev utility (guide §1: measure first): run single keys and break
  * their wall time into Spark JOBS — the local-mode stand-in for the
  * UI's stage page when deciding where a multi-action key (staged
  * builds, iterative rounds, manifest publishes) actually spends its
  * time. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Profile knn_ivf_opq_delete graph_triangles"
  *
  * Per key: total seconds (same noop-sink methodology as Bench) and a
  * per-job table (seconds, stage count, task count, description) so a
  * 5 s key decomposes into "3.2 s Lloyd rounds / 0.9 s encode /
  * 0.6 s publish" instead of one opaque number.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, start: Long,
                   var end: Long = 0L, var nTasks: Int = 0, var nStages: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse {
            // no explicit description: attribute by the deepest graft
            // frame in the result stage's callsite (long form), falling
            // back to the stage's short name ("count at Opq.scala:332")
            e.stageInfos.lastOption.map { si =>
              val g = si.details.linesIterator
                .filter(l => l.contains("graft.") && !l.contains("graft.Profile"))
                .take(2).mkString(" <- ").trim
              if (g.nonEmpty) g else si.name
            }
          }.getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, desc, e.time,
            nStages = e.stageInfos.size,
            nTasks = e.stageInfos.map(_.numTasks).sum)
        }
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // same warm-up as Bench so the first key doesn't absorb JIT
    {
      import org.apache.spark.sql.functions._
      val r = spark.range(1000L).select(col("id").as("r_regionkey"))
      r.join(broadcast(r.select(col("r_regionkey").as("k"))),
          col("r_regionkey") === col("k"))
        .groupBy(col("r_regionkey")).count()
        .write.format("noop").mode("overwrite").save()
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach { name =>
      jobs.synchronized { jobs.clear() }
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      val snapshot = jobs.synchronized { jobs.values.toSeq }
      println(f"\n===== $name: total ${(t1 - t0) / 1e9}%.2f s " +
        f"(construct+eager ${(tPlan - t0) / 1e9}%.2f s, final action ${(t1 - tPlan) / 1e9}%.2f s, " +
        f"${snapshot.size} jobs) =====")
      snapshot.sortBy(j => -(j.end - j.start)).take(25).foreach { j =>
        println(f"  ${(j.end - j.start) / 1e3}%7.2f s  job ${j.id}%3d  stages=${j.nStages}%2d tasks=${j.nTasks}%5d  ${j.desc.take(90)}")
      }
      val accounted = snapshot.map(j => j.end - j.start).sum / 1e3
      println(f"  jobs account for $accounted%.2f s of wall (gaps = driver/planning time)")
    }
    spark.stop()
  }
}
