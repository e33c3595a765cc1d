package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** TEMPORARY scale harness (not committed): stages factor-F blowups of
  * sf0.1 documents/embeddings/events into a /dev/shm dir shaped like a
  * testdata sf dir, then times the round-9 keys on it. */
object ScaleTmp {
  def main(args: Array[String]): Unit = {
    val factor = args(0).toInt
    val base = args(1)
    val out = args(2)
    val keys = if (args.length > 3) args(3).split(",").toSet
               else Set("sample_mixture_epochs", "knn_pq", "stream_topk")
    val spark = GraftSession.builder().getOrCreate()
    import graft.sources.Tables

    val outPath = java.nio.file.Paths.get(out)
    if (!java.nio.file.Files.exists(outPath.resolve("documents.parquet"))) {
      val docs = Tables.documents(spark, base)
      val maxDoc = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
      docs.withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("doc_id") + col("k").cast("long") * lit(maxDoc)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = Tables.embeddings(spark, base)
      val maxVec = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
      emb.withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("vec_id") + col("k").cast("long") * lit(maxVec)).as("vec_id"),
          col("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      val ev = Tables.events(spark, base)
      val maxEv = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
      ev.withColumn("k", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("event_id") + col("k").cast("long") * lit(maxEv)).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      println(s"STAGED factor=$factor at $out")
    }

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.queryExecution.toRdd.foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      val n = d.count()
      println(f"SCALE $name factor=$factor sec=$sec%.2f rows=$n")
    }

    if (keys("sample_mixture_epochs"))
      time("sample_mixture_epochs")(graft.operators.Etl.sampleMixtureEpochs(spark, out))
    if (keys("knn_pq"))
      time("knn_pq")(graft.operators.Pq.knnPq(spark, out))
    if (keys("stream_topk"))
      time("stream_topk")(graft.streaming.Streams.topkBatch(spark, out))
    spark.stop()
  }
}

/** TEMPORARY phase profiler for knn_pq at scale (not committed). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    import graft.operators.{Pq, Similarity}
    import graft.functions.{VectorOps => V}
    val M = Pq.M; val Kc = Pq.Kc
    val vectors = Tables.embeddings(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val d = 64; val sub = d / M
    val vn = vectors.select(col("vec_id"), V.toDouble(col("embedding")).as("e"))
      .withColumn("nrm", V.l2Norm(col("e")))
    val un = vn.select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("u"))
    def subvecs(frame: org.apache.spark.sql.DataFrame) = frame
      .select(col("vec_id"), explode(sequence(lit(0), lit(M - 1))).as("m"), col("u"))
      .select(col("vec_id"), col("m"), slice(col("u"), col("m") * sub + 1, lit(sub)).as("s"))
    val sv = subvecs(un)
    def l2sq(a: Column, b: Column): Column =
      (V.dot(a, a) - lit(2.0) * V.dot(a, b)) + V.dot(b, b)
    val seeds = broadcast(subvecs(un.orderBy(col("vec_id")).limit(Kc))
      .select(col("vec_id").as("code0"), col("m"), col("s").as("cs")))
    t("corpus_scan_count")(un.count())
    // phase replicas of the new build
    val seedsByM: Array[Array[(Long, Array[Double])]] = t("seeds_collect") {
      val rows = un.orderBy(col("vec_id")).limit(Kc).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      Array.tabulate(M)(m => rows.map { case (vid, u) =>
        (vid, java.util.Arrays.copyOfRange(u, m * sub, (m + 1) * sub)) })
    }
    import spark.implicits._
    val subW = sub
    val fa2 = un.as[(Long, Array[Double])].mapPartitions { it =>
      it.flatMap { case (_, u) =>
        (0 until M).iterator.map { m =>
          val cm = seedsByM(m)
          var best = -1; var bestD = 0.0; var kk = 0
          while (kk < cm.length) {
            val cs = cm(kk)._2
            var aa = 0.0; var ab = 0.0; var bb = 0.0; var i = 0
            while (i < subW) { val av = u(m * subW + i); val bv = cs(i)
              aa += av * av; ab += av * bv; bb += bv * bv; i += 1 }
            val d2 = (aa - 2.0 * ab) + bb
            if (best < 0 || d2 < bestD) { best = kk; bestD = d2 }
            kk += 1
          }
          (m, cm(best)._1, java.util.Arrays.copyOfRange(u, m * subW, (m + 1) * subW))
        }
      }
    }.toDF("m", "code", "s")
    val cents2 = fa2.select(col("m"), col("code"), posexplode(col("s")).as(Seq("pos", "v")))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg((sum(col("v").cast("decimal(30,10)")).cast("double") / count(col("v"))).as("mean"))
      .groupBy(col("m"), col("code"))
      .agg(sort_array(collect_list(struct(col("pos"), col("mean")))).as("pm"))
      .select(col("m"), col("code"), transform(col("pm"), p => p.getField("mean")).as("cs"))
    t("cents_collect")(cents2.collect())
    t("dt_collect")(sv.filter(col("vec_id") < graft.operators.Similarity.NQueries)
      .select(col("vec_id").as("query_id"), col("m"), col("s").as("qs"))
      .join(broadcast(cents2), "m")
      .select(col("query_id"), col("m"), col("code"), l2sq(col("qs"), col("cs")).as("d2"))
      .collect())
    t("full_knn_pq")(Pq.knnPq(spark, dir).queryExecution.toRdd.foreach(_ => ()))
    spark.stop()
  }
}
