package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IndexManifest, Opq, Pq, Quantize, Similarity}

/** The atomic index lifecycle (r17 verdict item 1): append and erase
  * land as manifest-published versions — hardlinked-unchanged cells +
  * touched-cell rewrite + one pointer flip — so a concurrent reader
  * sees wholly-old or wholly-new, a crash mid-op leaves the old
  * version serving, and superseded versions retire behind keep-N.
  * Every tier's atomic form must answer bit-identically to its
  * in-place fast path (whose answers the driver gate hash-checks).
  *
  * r18 verdict item 3 adds the multi-writer discipline: concurrent
  * publishers serialize on a create-exclusive version claim — both
  * deltas land (the loser retries against the winner's version) or
  * the loser fails loudly; rows are never silently dropped. The
  * pointer-history vacuum (r18 advice) retires only once-live
  * versions, so a crash-orphaned partial can never displace a
  * readable version from the keep window.
  *
  * Fixture sharing (r18 verdict item 8): the float tier stages ONE
  * in-place twin and ONE versioned root, evolved across the cases in
  * suite order (append → erase → crash/recovery) instead of a fresh
  * staging per case — the QuantizeSpec staging pattern.
  *
  * This suite pins `spark.graft.manifest.mode = link` (r20): it IS
  * the hardlink-tier spec — self-contained version directories,
  * inode-identity assertions, wholesale vacuum. The default REFS
  * layout (file-reference manifests, store-landed deltas) has its own
  * suite, [[ManifestRefsSpec]], and is what every other suite and the
  * driver gate exercise. */
class ManifestAtomicSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.manifest.mode", "link")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.manifest.mode")
    super.afterAll()
  }

  private def vectors = graft.sources.Tables.embeddings(spark, sfDir)

  private def canon(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    .sortBy(t => (t._1, t._3))

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def inode(p: String): Long =
    java.nio.file.Files.getAttribute(
      java.nio.file.Paths.get(p), "unix:ino").asInstanceOf[Long]

  private def versionDirs(root: String): Seq[String] = {
    val d = new java.io.File(root)
    d.listFiles().toSeq.filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName).sorted
  }

  private def firstParquetUnder(dir: String): String = {
    val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try stream.filter(p => p.toString.endsWith(".parquet"))
      .findFirst().get().toString
    finally stream.close()
  }

  // ---- shared float-tier lifecycle fixtures (staged once) ----
  private lazy val cut =
    vectors.agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
  private lazy val base = vectors.filter(col("vec_id") <= cut)
  private lazy val rest = vectors.filter(col("vec_id") > cut)
  private lazy val plainDir = {
    val d = tmp("graft_atomic_plain"); Similarity.writeIvfIndex(base, d); d
  }
  private lazy val rootDir = tmp("graft_atomic_root")
  private lazy val v1 = Similarity.stageIvfIndexVersion(base, rootDir)

  test("float tier: atomic append equals the in-place append; old version " +
      "immutable; untouched cells hardlink, not copy") {
    // in-place twin: the lifecycle the driver gate already hash-checks
    Similarity.appendIvfIndex(spark, plainDir, rest)
    val expect = canon(Similarity.queryIvfIndex(spark, plainDir))
    // atomic path
    val v1Answers = canon(Similarity.queryIvfIndex(spark, v1))
    val n = Similarity.appendIvfIndexAtomic(spark, rootDir, rest)
    assert(n == rest.count())
    val v2 = IndexManifest.currentOrFail(spark, rootDir)
    assert(v2 != v1)
    assert(canon(Similarity.queryIvfIndex(spark, v2)).sameElements(expect),
      "atomic append must answer exactly like the in-place append")
    // a reader that resolved v1 before the append still serves the
    // day-0 index unchanged — that is what "atomic for readers" means
    assert(canon(Similarity.queryIvfIndex(spark, v1)).sameElements(v1Answers),
      "the superseded version must be immutable under an atomic append")
    // O(touched) proof: the centroids artifact (untouched by an
    // append) is HARDLINKED into v2 — same inode, zero bytes copied
    assert(inode(firstParquetUnder(s"$v1/centroids")) ==
      inode(firstParquetUnder(s"$v2/centroids")),
      "untouched artifacts must hardlink into the new version")
    // the batch's cells were REWRITTEN (old ∪ new), so v2's postings
    // tree contains at least one file that is NOT a link into v1
    val batchCells = spark.read.parquet(s"$v2/postings")
      .filter(col("vec_id") > cut)
      .select(col("cell").cast("long")).distinct().collect().map(_.getLong(0))
    assert(batchCells.nonEmpty)
    val rewritten = s"$v2/postings/cell=${batchCells.min}"
    val v1Twin = s"$v1/postings/cell=${batchCells.min}"
    if (new java.io.File(v1Twin).exists())
      assert(inode(firstParquetUnder(rewritten)) !=
        inode(firstParquetUnder(v1Twin)),
        "a touched cell must be rewritten, not linked")
  }

  test("two interleaved atomic appenders serialize on the version claim: " +
      "both deltas land in the final chain — never silent row loss") {
    val root = tmp("graft_atomic_conc")
    Similarity.stageIvfIndexVersion(base, root)
    val restA = rest.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    val restB = rest.filter(pmod(col("vec_id"), lit(2L)) === 1L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def submit(f: => Long) = pool.submit(
      new java.util.concurrent.Callable[Long] { def call(): Long = f })
    // keep=3: each writer's vacuum must not retire the version the
    // other writer may still be staging its encode against (the
    // documented rule: keep ≥ concurrent writers + 1)
    val fa = submit(Similarity.appendIvfIndexAtomic(spark, root, restA, keep = 3))
    val fb = submit(Similarity.appendIvfIndexAtomic(spark, root, restB, keep = 3))
    val (na, nb) =
      try (fa.get(), fb.get()) finally pool.shutdown()
    assert(na == restA.count() && nb == restB.count())
    val live = IndexManifest.currentOrFail(spark, root)
    assert(live.endsWith("v=3"),
      s"two appends must CHAIN to v=3 (claims serialized), got $live")
    // the final version holds base ∪ restA ∪ restB exactly: the loser
    // remerged against the winner's version, dropping nothing
    val ids = spark.read.parquet(s"$live/postings")
      .select("vec_id").collect().map(_.getLong(0)).sorted
    val want = vectors.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(want),
      "both writers' deltas must be visible in the final version")
  }

  test("float tier: atomic erase equals the in-place erase; crash mid-op " +
      "leaves the old version serving AND blocks the chain loudly until " +
      "releaseStaleClaims; vacuum then retires the rest") {
    val erased = Similarity.DeleteLo to Similarity.DeleteHi
    // continue the shared fixtures: both now hold base ∪ rest
    val nPlain = Similarity.deleteFromIvfIndex(spark, plainDir, erased)
    val expect = canon(Similarity.queryIvfIndex(spark, plainDir))
    val n = Similarity.deleteFromIvfIndexAtomic(spark, rootDir, erased, keep = 3)
    assert(n == nPlain, s"atomic erase removed $n rows, in-place $nPlain")
    val v3 = IndexManifest.currentOrFail(spark, rootDir)
    assert(v3.endsWith("v=3"))
    assert(canon(Similarity.queryIvfIndex(spark, v3)).sameElements(expect),
      "atomic erase must answer exactly like the in-place erase")
    // no erased id survives in the new version; every id survives in
    // the (immutable) pre-erase version v2
    assert(spark.read.parquet(s"$v3/postings")
      .filter(col("vec_id").between(Similarity.DeleteLo, Similarity.DeleteHi))
      .count() == 0)
    assert(spark.read.parquet(s"$rootDir/v=2/postings")
      .filter(col("vec_id").between(Similarity.DeleteLo, Similarity.DeleteHi))
      .count() == n)
    // crash INSIDE a delta publish — after the claim + partial write,
    // before the flip: the pointer must still name v3, which keeps
    // serving, and the claim orphan must BLOCK later publishes loudly
    // (the multi-writer chain: a version id is never reused while its
    // claim stands, so rows can never land in a shadowed version)
    val preCrash = versionDirs(rootDir)
    intercept[RuntimeException] {
      IndexManifest.publishFrom(spark, rootDir) { (live, next) =>
        // partial materialization, then death before the pointer flip
        spark.read.parquet(s"$live/centroids")
          .write.parquet(s"$next/centroids")
        throw new RuntimeException("simulated crash before the flip")
      }
    }
    assert(IndexManifest.currentOrFail(spark, rootDir) == v3,
      "a crashed delta publish must leave the pointer on the old version")
    assert(canon(Similarity.queryIvfIndex(spark,
      IndexManifest.currentOrFail(spark, rootDir))).sameElements(expect))
    assert(versionDirs(rootDir).size == preCrash.size + 1,
      "the orphaned claim is on disk, not a serving path")
    intercept[IndexManifest.ConcurrentPublishException] {
      IndexManifest.publish(spark, rootDir)(_ =>
        fail("a blocked chain must throw BEFORE materializing anything"))
    }
    // recovery: release the stale claim (documented operator/restart
    // action — no publisher is alive here), then the lifecycle resumes
    val released = IndexManifest.releaseStaleClaims(spark, rootDir)
    assert(released.map(_.split('/').last) == Seq("v=4"),
      s"releaseStaleClaims must remove exactly the crashed claim, got $released")
    // keep-N retirement: below the live version only ONCE-LIVE
    // versions exist here; keep=1 retires them all
    val gone = IndexManifest.vacuum(spark, rootDir, keep = 1)
    assert(gone.map(_.split('/').last).sorted == Seq("v=1", "v=2"),
      s"vacuum(keep=1) should retire the superseded v1+v2, got $gone")
    assert(canon(Similarity.queryIvfIndex(spark, v3)).sameElements(expect),
      "the live version must survive vacuum")
    // the chain continues where it was blocked: the released id is
    // reclaimed by the next publish
    val survivorId = spark.read.parquet(s"$v3/postings")
      .agg(min("vec_id")).collect()(0).getLong(0)
    val n2 = Similarity.deleteFromIvfIndexAtomic(spark, rootDir,
      Seq(survivorId), keep = 1)
    assert(n2 == 1L)
    assert(IndexManifest.currentOrFail(spark, rootDir).endsWith("v=4"))
    assert(versionDirs(rootDir) == Seq("v=4"))
  }

  test("vacuum counts only once-live versions: a crashed first publish's " +
      "never-referenced orphan is deleted outright, not retained in the " +
      "keep window in place of a readable version") {
    val root = tmp("graft_atomic_orphan")
    intercept[RuntimeException] {
      IndexManifest.publish(spark, root) { dir =>
        base.limit(10).write.parquet(s"$dir/centroids")
        throw new RuntimeException("simulated crash during the first publish")
      }
    }
    assert(IndexManifest.current(spark, root).isEmpty)
    assert(versionDirs(root) == Seq("v=1")) // a partial nothing references
    // the retried first publish claims PAST the orphan
    val v2 = Similarity.stageIvfIndexVersion(base, root)
    assert(v2.endsWith("v=2"))
    // keep=2 must NOT count the unreadable never-live v1 as the one
    // retained below-live version (the r18-advice failure: doing so
    // evicted the genuinely superseded readable version instead)
    val gone = IndexManifest.vacuum(spark, root, keep = 2)
    assert(gone.map(_.split('/').last) == Seq("v=1"),
      s"the never-live orphan must be vacuumed outright, got $gone")
    // whereas a once-live version IS retained under the same policy
    Similarity.appendIvfIndexAtomic(spark, root, rest, keep = 2)
    assert(versionDirs(root) == Seq("v=2", "v=3"))
    assert(IndexManifest.currentOrFail(spark, root).endsWith("v=3"))
  }

  test("retention: the default keep=2 bounds the version chain through " +
      "append/erase/rebalance lifecycles") {
    val root = tmp("graft_atomic_keep_root")
    Similarity.stageIvfIndexVersion(base, root)
    Similarity.appendIvfIndexAtomic(spark, root, rest) // v2, retires nothing
    assert(versionDirs(root) == Seq("v=1", "v=2"))
    Similarity.deleteFromIvfIndexAtomic(spark, root, Seq(5L)) // v3, retires v1
    assert(versionDirs(root) == Seq("v=2", "v=3"))
    val v4 = Similarity.rebalanceIvfIndexVersioned(spark, root) // v4, retires v2
    assert(versionDirs(root) == Seq("v=3", "v=4"))
    assert(IndexManifest.currentOrFail(spark, root) == v4)
    // a rebalanced versioned index answers exactly like a fresh build
    // over the surviving corpus (the in-place rebalance equation)
    val fresh = tmp("graft_atomic_keep_fresh")
    Similarity.writeIvfIndex(vectors.filter(col("vec_id") =!= 5L), fresh)
    assert(canon(Similarity.queryIvfIndex(spark, v4))
      .sameElements(canon(Similarity.queryIvfIndex(spark, fresh))))
  }

  test("PQ tier: atomic append and erase answer bit-identically to the " +
      "in-place forms") {
    val qids = 0L until Similarity.NQueries.toLong
    // append
    val plain = tmp("graft_atomic_pq_plain")
    Pq.writeIvfPqIndex(Pq.buildIvfPq(base), plain)
    Pq.appendIvfPqIndex(spark, plain, rest)
    val root = tmp("graft_atomic_pq_root")
    Pq.stageIvfPqIndexVersion(Pq.buildIvfPq(base), root)
    Pq.appendIvfPqIndexAtomic(spark, root, rest)
    assert(canon(Pq.queryIvfPq(Pq.readIvfPqIndex(spark,
        IndexManifest.currentOrFail(spark, root)), vectors, qids))
      .sameElements(canon(Pq.queryIvfPq(
        Pq.readIvfPqIndex(spark, plain), vectors, qids))))
    // erase on top of the appended index
    val erased = Pq.DeleteLo to Pq.DeleteHi
    val nPlain = Pq.deleteFromIvfPqIndex(spark, plain, erased)
    val nAtomic = Pq.deleteFromIvfPqIndexAtomic(spark, root, erased)
    assert(nAtomic == nPlain)
    assert(canon(Pq.queryIvfPq(Pq.readIvfPqIndex(spark,
        IndexManifest.currentOrFail(spark, root)), vectors, qids))
      .sameElements(canon(Pq.queryIvfPq(
        Pq.readIvfPqIndex(spark, plain), vectors, qids))))
  }

  test("compressed-tier health loop: per-tier stats off the codes trees " +
      "equal each other (shared coarse quantizer) and sum consistently; " +
      "versioned PQ retrain answers bit-identically to a fresh rebuild") {
    def statsCanon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        java.lang.Double.doubleToLongBits(r.getDouble(4))))
      .sortBy(_._1)
    // PQ on the manifest lifecycle: stats read the LIVE version's tree
    val pqRoot = tmp("graft_health_pq_root")
    Pq.stageIvfPqIndexVersion(Pq.buildIvfPq(base), pqRoot)
    Pq.appendIvfPqIndexAtomic(spark, pqRoot, rest)
    val pqStats = statsCanon(Pq.ivfPqIndexStats(spark,
      IndexManifest.currentOrFail(spark, pqRoot), appendedFrom = cut + 1))
    // internal consistency: Σn = corpus, Σn_appended = appended batch
    assert(pqStats.map(_._2).sum == vectors.count())
    assert(pqStats.map(_._3).sum == rest.count())
    // OPQ and IVF-SQ8 report the SAME rows: all three compressed tiers
    // assign against the identical deterministic coarse quantizer, so
    // one health report (and one driver oracle) covers them all
    val opqPath = tmp("graft_health_opq")
    Opq.writeIvfOpqIndex(Opq.buildIvfOpq(base), opqPath)
    Opq.appendIvfOpqIndex(spark, opqPath, rest)
    assert(statsCanon(Opq.ivfOpqIndexStats(spark, opqPath, cut + 1))
      .sameElements(pqStats),
      "OPQ stats must equal the PQ tier's (shared coarse assignment)")
    val sq8Path = tmp("graft_health_ivfsq8")
    Quantize.writeIvfSq8Index(base, sq8Path)
    Quantize.appendIvfSq8Index(spark, sq8Path, rest)
    assert(statsCanon(Quantize.ivfSq8IndexStats(spark, sq8Path, cut + 1))
      .sameElements(pqStats),
      "IVF-SQ8 stats must equal the PQ tier's (shared coarse assignment)")
    // the retrain the stats gate: versioned rebalance over the declared
    // float corpus == a fresh buildIvfPq over it, bit for bit
    val qids = 0L until Similarity.NQueries.toLong
    val published = Pq.rebalanceIvfPqIndexVersioned(spark, pqRoot, vectors)
    assert(published.endsWith("v=3"))
    assert(versionDirs(pqRoot) == Seq("v=2", "v=3"),
      "retrain publishes a version and retires behind keep")
    assert(canon(Pq.queryIvfPq(Pq.readIvfPqIndex(spark, published), vectors, qids))
      .sameElements(canon(Pq.queryIvfPq(Pq.buildIvfPq(vectors), vectors, qids))),
      "post-retrain answers must equal a fresh rebuild bit-for-bit")
    // and the retrained index's stats read flat: no appended rows
    // above the new watermark, skew re-balanced by fresh Lloyd
    val after = Pq.ivfPqIndexStats(spark, published,
      appendedFrom = vectors.count() + 1)
    assert(after.collect().forall(_.getLong(2) == 0L))
  }

  test("SQ8 flat tier (grp buckets) and OPQ rotated tier: atomic forms " +
      "equal the in-place forms") {
    val qids = 0L until Similarity.NQueries.toLong
    val erased = Pq.DeleteLo to Pq.DeleteHi
    // SQ8: the erasure bucket tree (grp=vec_id mod N) through the
    // same generic delta publisher
    val sq8Plain = tmp("graft_atomic_sq8_plain")
    Quantize.writeSq8Index(base, sq8Plain)
    Quantize.appendSq8Index(spark, sq8Plain, rest)
    Quantize.deleteFromSq8Index(spark, sq8Plain, erased)
    val sq8Root = tmp("graft_atomic_sq8_root")
    Quantize.stageSq8IndexVersion(base, sq8Root)
    assert(Quantize.appendSq8IndexAtomic(spark, sq8Root, rest) == rest.count())
    Quantize.deleteFromSq8IndexAtomic(spark, sq8Root, erased)
    assert(canon(Quantize.querySq8Index(spark,
        IndexManifest.currentOrFail(spark, sq8Root), vectors, qids))
      .sameElements(canon(Quantize.querySq8Index(spark, sq8Plain, vectors, qids))))
    // OPQ: append must rotate through the STAGED basis — the seam a
    // wrong-space pairing would corrupt
    val opqPlain = tmp("graft_atomic_opq_plain")
    Opq.writeIvfOpqIndex(Opq.buildIvfOpq(base), opqPlain)
    Opq.appendIvfOpqIndex(spark, opqPlain, rest)
    Opq.deleteFromIvfOpqIndex(spark, opqPlain, erased)
    val opqRoot = tmp("graft_atomic_opq_root")
    Opq.stageIvfOpqIndexVersion(Opq.buildIvfOpq(base), opqRoot)
    Opq.appendIvfOpqIndexAtomic(spark, opqRoot, rest)
    Opq.deleteFromIvfOpqIndexAtomic(spark, opqRoot, erased)
    assert(canon(Opq.queryIvfOpq(Opq.readIvfOpqIndex(spark,
        IndexManifest.currentOrFail(spark, opqRoot)), vectors, qids))
      .sameElements(canon(Opq.queryIvfOpq(
        Opq.readIvfOpqIndex(spark, opqPlain), vectors, qids))))
  }
}
