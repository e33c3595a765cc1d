package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IndexManifest, Similarity}

/** The REFS manifest layout (r19 verdict item 2 — object-store-shaped
  * delta publishes): a version is a `_REFS` file list; a delta lands
  * ONLY its touched partitions as fresh files in the shared `_store`
  * and inherits every other file by reference — per-publish data
  * motion is O(touched bytes) on EVERY filesystem, where the link
  * layout degrades to a full unchanged-partition copy without
  * hardlinks. This is the session default; [[ManifestAtomicSpec]]
  * pins and covers the link layout.
  *
  * Covered here: bit-identical answers vs the in-place fast path,
  * zero-materialization deltas (no parquet under a delta version's
  * directory), reachability vacuum (referenced full-publish files
  * survive any keep policy; dead store files collect without a store
  * walk), stale-claim release reclaiming the claim's fresh store
  * files, orphan deep-sweep, and mixed link/refs chains (the mode is
  * per-session, not an on-disk commitment). */
class ManifestRefsSpec extends SparkSpecBase {

  private def vectors = graft.sources.Tables.embeddings(spark, sfDir)

  private def canon(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    .sortBy(t => (t._1, t._3))

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def parquetsUnder(dir: String): Seq[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return Nil
    val stream = java.nio.file.Files.walk(root)
    try {
      val b = Seq.newBuilder[String]
      stream.filter(p => p.toString.endsWith(".parquet"))
        .forEach(p => b += p.toString)
      b.result()
    } finally stream.close()
  }

  private def versionDirs(root: String): Seq[String] = {
    val d = new java.io.File(root)
    d.listFiles().toSeq.filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName).sorted
  }

  // ---- shared float-tier lifecycle fixtures (staged once) ----
  private lazy val cut =
    vectors.agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
  private lazy val base = vectors.filter(col("vec_id") <= cut)
  private lazy val rest = vectors.filter(col("vec_id") > cut)
  private lazy val plainDir = {
    val d = tmp("graft_refs_plain"); Similarity.writeIvfIndex(base, d); d
  }
  private lazy val rootDir = tmp("graft_refs_root")
  private lazy val v1 = Similarity.stageIvfIndexVersion(base, rootDir)

  test("refs delta publish: append answers bit-identically to in-place; " +
      "the delta version materializes ZERO inherited bytes (pure manifest); " +
      "fresh rows land in the shared store") {
    Similarity.appendIvfIndex(spark, plainDir, rest)
    val expect = canon(Similarity.queryIvfIndex(spark, plainDir))
    val v1Answers = canon(Similarity.queryIvfIndex(spark, v1))
    val n = Similarity.appendIvfIndexAtomic(spark, rootDir, rest)
    assert(n == rest.count())
    val v2 = IndexManifest.currentOrFail(spark, rootDir)
    assert(v2 != v1)
    assert(canon(Similarity.queryIvfIndex(spark, v2)).sameElements(expect),
      "refs-mode atomic append must answer exactly like the in-place append")
    assert(canon(Similarity.queryIvfIndex(spark, v1)).sameElements(v1Answers),
      "the superseded version must be immutable under a refs append")
    // THE refs property: the delta version directory holds NO parquet
    // at all — untouched partitions were inherited by reference and
    // the touched ones landed in the store, so the publish moved
    // O(batch) bytes regardless of index size (no hardlinks needed —
    // the object-store shape)
    assert(parquetsUnder(v2).isEmpty,
      s"a refs delta version must be a pure manifest, found parquet under $v2")
    assert(new java.io.File(s"$v2/${IndexManifest.RefsFile}").exists(),
      "a refs delta version must carry a _REFS manifest")
    assert(parquetsUnder(s"$rootDir/${IndexManifest.StoreDir}").nonEmpty,
      "the append's fresh files must land in the shared store")
    // v1's physical files are untouched (still serving via v2's refs)
    assert(parquetsUnder(v1).nonEmpty)
  }

  test("refs erase: survivors rewrite to the store, answers match in-place; " +
      "reachability vacuum retires delta manifests and dead store files " +
      "but never a referenced full-publish file") {
    val erased = rest.select("vec_id").limit(7)
      .collect().map(_.getLong(0)).toSeq
    Similarity.deleteFromIvfIndex(spark, plainDir, erased)
    val expect = canon(Similarity.queryIvfIndex(spark, plainDir))
    // force the fixture chain (v1 full, v2 append) before erasing
    val v2 = IndexManifest.currentOrFail(spark, rootDir)
    val storeBefore = parquetsUnder(s"$rootDir/${IndexManifest.StoreDir}").toSet
    val nDel = Similarity.deleteFromIvfIndexAtomic(spark, rootDir, erased,
      keep = 2)
    assert(nDel == erased.size.toLong)
    val v3 = IndexManifest.currentOrFail(spark, rootDir)
    assert(canon(Similarity.queryIvfIndex(spark, v3)).sameElements(expect),
      "refs-mode atomic erase must answer exactly like the in-place erase")
    // keep=2 retained v2; now vacuum to keep=1: v2's manifest dir
    // retires, and the store files ONLY v2 referenced (the erased
    // cells' pre-erase rewrites) are collected — while v1's
    // full-publish files stay, because v3 still references them
    val gone = IndexManifest.vacuum(spark, rootDir, keep = 1)
    assert(gone.exists(_.endsWith(v2.split('/').last)),
      s"keep=1 must retire the superseded delta manifest, got $gone")
    assert(!new java.io.File(v2).exists())
    val storeAfter = parquetsUnder(s"$rootDir/${IndexManifest.StoreDir}").toSet
    val deadStore = storeBefore.diff(storeAfter)
    assert(deadStore.nonEmpty,
      "the erased cells' superseded store files must be collected")
    assert(parquetsUnder(v1).nonEmpty,
      "v1's files are still referenced by the live version — vacuum must keep them")
    assert(new java.io.File(v1).exists())
    assert(canon(Similarity.queryIvfIndex(spark, v3)).sameElements(expect),
      "the live version must keep answering identically after vacuum")
  }

  test("stale-claim release reclaims the crashed publish's fresh store " +
      "files; sweepStore reclaims manifest-less orphans; both leave the " +
      "live chain serving") {
    val live = IndexManifest.currentOrFail(spark, rootDir)
    val answers = canon(Similarity.queryIvfIndex(spark, live))
    // simulate a publisher that died between its store landing and the
    // pointer flip: a claimed version dir whose _REFS lists a fresh
    // store file no one else references
    val liveV = live.split('/').last.stripPrefix("v=").toLong
    val claimDir = s"$rootDir/v=${liveV + 1}"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(claimDir))
    val orphanRef = s"$rootDir/${IndexManifest.StoreDir}/postings/cell=0/crashed.parquet"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(orphanRef).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(orphanRef),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(claimDir, IndexManifest.RefsFile),
      s"postings/cell=0/crashed.parquet\t$orphanRef".getBytes("UTF-8"))
    val released = IndexManifest.releaseStaleClaims(spark, rootDir)
    assert(released.contains(claimDir))
    assert(released.contains(orphanRef),
      s"the claim's fresh store file must be reclaimed, got $released")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(orphanRef)))
    // a MANIFEST-LESS orphan (crash before _REFS): invisible to
    // incremental vacuum by design, reclaimed by the deep sweep
    val bare = s"$rootDir/${IndexManifest.StoreDir}/postings/cell=0/orphan.parquet"
    java.nio.file.Files.write(java.nio.file.Paths.get(bare), Array[Byte](9))
    val swept = IndexManifest.sweepStore(spark, rootDir)
    assert(swept.contains(bare), s"sweepStore must reclaim the orphan, got $swept")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(bare)))
    // referenced store files all survived both operations
    assert(canon(Similarity.queryIvfIndex(spark,
      IndexManifest.currentOrFail(spark, rootDir))).sameElements(answers))
  }

  test("mixed chains: a link-mode publish continues a refs chain and vice " +
      "versa — the layout is a per-session choice, not an on-disk commitment") {
    val root = tmp("graft_refs_mixed")
    val plain = tmp("graft_refs_mixed_plain")
    val maxId = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val third = maxId / 3
    val b0 = vectors.filter(col("vec_id") <= third)
    val b1 = vectors.filter(col("vec_id") > third && col("vec_id") <= 2 * third)
    val b2 = vectors.filter(col("vec_id") > 2 * third)
    Similarity.writeIvfIndex(b0, plain)
    Similarity.stageIvfIndexVersion(b0, root)
    // link-mode delta on top of the full publish
    spark.conf.set("spark.graft.manifest.mode", "link")
    try Similarity.appendIvfIndexAtomic(spark, root, b1)
    finally spark.conf.unset("spark.graft.manifest.mode")
    Similarity.appendIvfIndex(spark, plain, b1)
    assert(canon(Similarity.queryIvfIndex(spark,
        IndexManifest.currentOrFail(spark, root)))
      .sameElements(canon(Similarity.queryIvfIndex(spark, plain))),
      "a link publish must serve correctly in a refs session")
    // refs-mode delta on top of the link version (its _REFS inherits
    // the link version's physical files)
    Similarity.appendIvfIndexAtomic(spark, root, b2)
    Similarity.appendIvfIndex(spark, plain, b2)
    val live = IndexManifest.currentOrFail(spark, root)
    assert(parquetsUnder(live).isEmpty,
      "the refs delta on a link base must still be a pure manifest")
    assert(canon(Similarity.queryIvfIndex(spark, live))
      .sameElements(canon(Similarity.queryIvfIndex(spark, plain))),
      "a refs publish over a link base must answer identically")
  }

  test("link-mode delta on a REFS base: the base's manifest materializes " +
      "physically and never rides along — appended partitions serve once " +
      "(no stale-refs double-serving) and erased rows stay erased") {
    val root = tmp("graft_refs_linkonrefs")
    val plain = tmp("graft_refs_linkonrefs_plain")
    val maxId = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val third = maxId / 3
    val b0 = vectors.filter(col("vec_id") <= third)
    val b1 = vectors.filter(col("vec_id") > third && col("vec_id") <= 2 * third)
    val b2 = vectors.filter(col("vec_id") > 2 * third)
    Similarity.writeIvfIndex(b0, plain)
    Similarity.stageIvfIndexVersion(b0, root)
    // refs base: v2 is a pure manifest whose inherited files exist
    // only as _REFS lines
    Similarity.appendIvfIndexAtomic(spark, root, b1)
    Similarity.appendIvfIndex(spark, plain, b1)
    spark.conf.set("spark.graft.manifest.mode", "link")
    try {
      // the bug this pins: a mirror that copied the refs base's _REFS
      // verbatim would serve the touched partitions' superseded files
      // BESIDE the link rewrite — every pre-existing row in the
      // batch's cells twice (the canon compare below catches any
      // duplicate), and erased rows resurrected (the erase leg)
      Similarity.appendIvfIndexAtomic(spark, root, b2)
      Similarity.appendIvfIndex(spark, plain, b2)
      val live = IndexManifest.currentOrFail(spark, root)
      assert(!new java.io.File(s"$live/${IndexManifest.RefsFile}").exists(),
        "a link version must be self-contained — no manifest may ride along")
      assert(parquetsUnder(live).nonEmpty,
        "the refs base's inherited files must have materialized physically")
      assert(canon(Similarity.queryIvfIndex(spark, live))
        .sameElements(canon(Similarity.queryIvfIndex(spark, plain))),
        "link-on-refs append must serve each row exactly once")
      // erase rows that live ONLY via the refs base's store files
      val erased = b1.select("vec_id").limit(5)
        .collect().map(_.getLong(0)).toSeq
      Similarity.deleteFromIvfIndexAtomic(spark, root, erased)
      Similarity.deleteFromIvfIndex(spark, plain, erased)
      assert(canon(Similarity.queryIvfIndex(spark,
          IndexManifest.currentOrFail(spark, root)))
        .sameElements(canon(Similarity.queryIvfIndex(spark, plain))),
        "link-on-refs erase must not resurrect rows through a stale manifest")
    } finally spark.conf.unset("spark.graft.manifest.mode")
  }

  test("epoch-pinned delta publish: a retrain landing between a delta's " +
      "encode and its publish trips the fence loudly (before any claim) " +
      "and the chain stays publishable") {
    val root = tmp("graft_refs_epochpin")
    val maxId = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val b0 = vectors.filter(col("vec_id") <= maxId / 2)
    val b1 = vectors.filter(col("vec_id") > maxId / 2)
    Similarity.stageIvfIndexVersion(b0, root)
    val epochAtEncode =
      IndexManifest.epochOf(spark, IndexManifest.currentOrFail(spark, root))
    // a retrain publishes mid-flight: full publishes bump the epoch
    IndexManifest.publish(spark, root)(
      dir => Similarity.writeIvfIndex(b0, dir))
    val e = intercept[IllegalStateException] {
      IndexManifest.publishFrom(spark, root,
        requiredBaseEpoch = Some(epochAtEncode)) { (_, _) =>
        fail("the edit must never run once the epoch fence trips")
      }
    }
    assert(e.getMessage.contains("retrain epoch"),
      s"the fence must name the epoch mismatch, got: ${e.getMessage}")
    // the fence fired BEFORE claiming: no stale claim poisons the
    // chain — a delta re-derived at the fresh epoch lands normally
    // (the tier wrapper reads the live epoch itself)
    assert(Similarity.appendIvfIndexAtomic(spark, root, b1) == b1.count())
  }
}
