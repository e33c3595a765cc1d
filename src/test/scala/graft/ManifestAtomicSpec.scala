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
  * in-place fast path (whose answers the driver gate hash-checks). */
class ManifestAtomicSpec extends SparkSpecBase {

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

  test("float tier: atomic append equals the in-place append; old version " +
      "immutable; untouched cells hardlink, not copy") {
    val cut = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
    val base = vectors.filter(col("vec_id") <= cut)
    val rest = vectors.filter(col("vec_id") > cut)
    // in-place twin: the lifecycle the driver gate already hash-checks
    val plain = tmp("graft_atomic_plain")
    Similarity.writeIvfIndex(base, plain)
    Similarity.appendIvfIndex(spark, plain, rest)
    val expect = canon(Similarity.queryIvfIndex(spark, plain))
    // atomic path
    val root = tmp("graft_atomic_root")
    val v1 = Similarity.stageIvfIndexVersion(base, root)
    val v1Answers = canon(Similarity.queryIvfIndex(spark, v1))
    val n = Similarity.appendIvfIndexAtomic(spark, root, rest)
    assert(n == rest.count())
    val v2 = IndexManifest.currentOrFail(spark, root)
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

  test("float tier: atomic erase equals the in-place erase; crash mid-op " +
      "leaves the old version serving; keep-N retires the rest") {
    val erased = Similarity.DeleteLo to Similarity.DeleteHi
    val plain = tmp("graft_atomic_del_plain")
    Similarity.writeIvfIndex(vectors, plain)
    val nPlain = Similarity.deleteFromIvfIndex(spark, plain, erased)
    val expect = canon(Similarity.queryIvfIndex(spark, plain))
    val root = tmp("graft_atomic_del_root")
    val v1 = Similarity.stageIvfIndexVersion(vectors, root)
    val n = Similarity.deleteFromIvfIndexAtomic(spark, root, erased)
    assert(n == nPlain, s"atomic erase removed $n rows, in-place $nPlain")
    val v2 = IndexManifest.currentOrFail(spark, root)
    assert(canon(Similarity.queryIvfIndex(spark, v2)).sameElements(expect),
      "atomic erase must answer exactly like the in-place erase")
    // no erased id survives in the new version; every id survives in v1
    assert(spark.read.parquet(s"$v2/postings")
      .filter(col("vec_id").between(Similarity.DeleteLo, Similarity.DeleteHi))
      .count() == 0)
    assert(spark.read.parquet(s"$v1/postings")
      .filter(col("vec_id").between(Similarity.DeleteLo, Similarity.DeleteHi))
      .count() == n)
    // crash INSIDE a delta publish — after the mirror, before the
    // commit: the pointer must still name v2 and v2 must keep serving
    val preCrash = versionDirs(root)
    intercept[RuntimeException] {
      IndexManifest.publishFrom(spark, root) { (live, next) =>
        // partial materialization, then death before the pointer flip
        spark.read.parquet(s"$live/centroids")
          .write.parquet(s"$next/centroids")
        throw new RuntimeException("simulated crash before the flip")
      }
    }
    assert(IndexManifest.currentOrFail(spark, root) == v2,
      "a crashed delta publish must leave the pointer on the old version")
    assert(canon(Similarity.queryIvfIndex(spark,
      IndexManifest.currentOrFail(spark, root))).sameElements(expect))
    assert(versionDirs(root).size == preCrash.size + 1,
      "the orphaned partial version is garbage for vacuum, not a serving path")
    // keep-N: the orphan sits ABOVE the live version (in-flight shape),
    // so vacuum never touches it; below the live version keep=1 retires v1
    val gone = IndexManifest.vacuum(spark, root, keep = 1)
    assert(gone == Seq(v1.stripPrefix("file:")) || gone == Seq(v1),
      s"vacuum(keep=1) should retire exactly the superseded v1, got $gone")
    assert(!new java.io.File(v1).exists())
    assert(canon(Similarity.queryIvfIndex(spark, v2)).sameElements(expect),
      "the live version must survive vacuum")
  }

  test("retention: the default keep=2 bounds the version chain through " +
      "append/erase/rebalance lifecycles") {
    val cut = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
    val root = tmp("graft_atomic_keep_root")
    Similarity.stageIvfIndexVersion(vectors.filter(col("vec_id") <= cut), root)
    Similarity.appendIvfIndexAtomic(spark, root,
      vectors.filter(col("vec_id") > cut))                    // v2, retires nothing
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
    val cut = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
    val base = vectors.filter(col("vec_id") <= cut)
    val rest = vectors.filter(col("vec_id") > cut)
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

  test("SQ8 flat tier (grp buckets) and OPQ rotated tier: atomic forms " +
      "equal the in-place forms") {
    val cut = vectors.agg(max(col("vec_id"))).collect()(0).getLong(0) / 2
    val base = vectors.filter(col("vec_id") <= cut)
    val rest = vectors.filter(col("vec_id") > cut)
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
