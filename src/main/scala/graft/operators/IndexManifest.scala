package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{CreateFlag, FileContext, FileUtil, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Atomic publish/resolve for multi-frame index artifacts — the
  * manifest layer the staged ANN indexes' own docstrings call for
  * (r16 verdict item 2). A staged index is several parquet frames
  * (float tier: centroids + postings, [[Similarity.writeIvfIndex]];
  * PQ tier: centroids + codebooks + codes, [[Pq.writeIvfPqIndex]];
  * SQ8: ranges + codes, [[Quantize.writeSq8Index]]) and each writer
  * commits its frames separately, so RESTAGING a live index has a
  * window where a reader pairs new centroids with old postings — and
  * a crash inside that window leaves the mix on disk.
  *
  * The manifest closes both holes with the classic versioned-layout +
  * pointer-flip design (the ALSO-serving-reads shape of a Delta/
  * Iceberg table pointer, reduced to one file because an index
  * version is immutable once published):
  *
  *   root/v=1/{centroids,postings,…}   — complete, immutable versions
  *   root/v=2/…
  *   root/CURRENT                      — one file naming the live one
  *
  * [[publish]] materializes the WHOLE new version into a fresh `v=n`
  * directory (readers cannot see it — nothing references it), then
  * flips `CURRENT` with a single atomic rename
  * ([[Options.Rename.OVERWRITE]] — POSIX rename on the local FS, the
  * atomic primitive on HDFS; object stores swap in their own CAS
  * pointer here). Every reader resolves the pointer ONCE via
  * [[current]] and serves that immutable directory for the life of
  * its plan, so a query overlapping a restage sees wholly old or
  * wholly new, never a mix. A crash anywhere before the flip leaves
  * `CURRENT` naming the old version — the old index keeps serving and
  * the orphaned partial `v=n` is garbage for [[vacuum]].
  *
  * 100 TB: the manifest adds ONE tiny file read per query plan and
  * one rename per restage, independent of index size; the cost of
  * atomicity is the double-materialization of a restaged version,
  * which a restage (unlike the in-place append/delete fast paths)
  * already pays by definition. */
object IndexManifest {

  private val Pointer = "CURRENT"

  private def fc(spark: SparkSession, root: String): FileContext = {
    val uri = new Path(root).toUri
    if (uri.getScheme == null)
      FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)
    else
      FileContext.getFileContext(uri, spark.sparkContext.hadoopConfiguration)
  }

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v=")) name.drop(2).toLongOption else None

  private def listVersions(ctx: FileContext, root: Path): Seq[Long] = {
    if (!ctx.util.exists(root)) return Nil
    val it = ctx.listStatus(root)
    val b = Seq.newBuilder[Long]
    while (it.hasNext) {
      val st = it.next()
      if (st.isDirectory) versionOf(st.getPath.getName).foreach(b += _)
    }
    b.result()
  }

  /** The live version directory under `root`, or None when nothing
    * has been published. Resolve ONCE per query plan and read every
    * frame from the returned directory — that is what makes a
    * concurrent restage invisible. */
  def current(spark: SparkSession, root: String): Option[String] = {
    val ctx = fc(spark, root)
    val ptr = new Path(root, Pointer)
    if (!ctx.util.exists(ptr)) return None
    val in = ctx.open(ptr)
    val name =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim
      finally in.close()
    if (name.isEmpty) None else Some(s"$root/$name")
  }

  /** [[current]] that fails loudly when no version is published. */
  def currentOrFail(spark: SparkSession, root: String): String =
    current(spark, root).getOrElse(throw new IllegalStateException(
      s"IndexManifest: no published index at $root — publish one first"))

  /** Publish a new index version: allocate the next `v=n` directory,
    * run `write` to materialize the COMPLETE version into it (any of
    * the tier writers — they see an empty private directory, so their
    * own tmp+rename discipline is belt-and-braces here), then flip the
    * pointer atomically. Returns the published directory. A failure
    * inside `write` propagates untouched: the pointer still names the
    * old version and the partial directory is unreferenced. */
  def publish(spark: SparkSession, root: String)(write: String => Unit): String = {
    val ctx = fc(spark, root)
    val rootPath = new Path(root)
    ctx.mkdir(rootPath, null, true)
    val next = (listVersions(ctx, rootPath) :+ 0L).max + 1
    val dirName = s"v=$next"
    write(s"$root/$dirName")
    val tmp = new Path(rootPath, s"$Pointer.tmp")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
    try out.write(dirName.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // THE commit: one rename. Readers resolve either the old pointer
    // bytes or the new — never a torn mix, never a missing pointer.
    ctx.rename(tmp, new Path(rootPath, Pointer), Options.Rename.OVERWRITE)
    s"$root/$dirName"
  }

  /** Retire superseded version directories behind a keep-N policy:
    * the live version, the `keep - 1` most recent versions below it,
    * and any version published AFTER the pointer was read (monotonic
    * ids make "newer than live" checkable, so a vacuum racing a
    * publish never deletes the version being published) all survive;
    * everything older is deleted. Returns the deleted directories.
    * In-flight readers of a retired version are the standard
    * retention tradeoff — run vacuum on a delay exceeding the longest
    * query (or keep ≥ 2 so the immediately superseded version
    * outlives any reader that resolved just before the flip), exactly
    * like lake-format VACUUM. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Seq[String] = {
    require(keep >= 1, s"vacuum keeps at least the live version (keep=$keep)")
    val ctx = fc(spark, root)
    val live = current(spark, root).getOrElse(return Nil)
    val liveV = versionOf(new Path(live).getName).getOrElse(return Nil)
    listVersions(ctx, new Path(root)).filter(_ < liveV).sorted
      .dropRight(keep - 1).map { v =>
        val p = new Path(root, s"v=$v")
        ctx.delete(p, true)
        p.toString
      }
  }

  /** [[publish]] with the LIVE version's directory handed to the
    * writer — the delta-publish primitive: `edit(live, next)`
    * materializes the next version FROM the current one (hardlink
    * what didn't change, rewrite what did). Fails loudly when nothing
    * is published yet. */
  def publishFrom(spark: SparkSession, root: String)
                 (edit: (String, String) => Unit): String = {
    val live = currentOrFail(spark, root)
    publish(spark, root)(next => edit(live, next))
  }

  /** Mirror `src`'s artifact tree into `dst`, skipping any entry whose
    * src-relative path is in `skip` (a skipped directory's whole
    * subtree is skipped). Files are HARDLINKED when the filesystem is
    * local — one inode-metadata op per file, zero data copied, and
    * safe because published versions are immutable by contract — and
    * byte-copied otherwise (HDFS has no user hardlinks; object-store
    * deployments swap in their server-side copy here, which is the
    * same O(metadata) shape). At 100 TB the delta-publish bill is
    * therefore O(touched-partition rewrite) data IO plus O(n_files)
    * metadata ops — never a second materialization of the index. */
  private[operators] def mirror(spark: SparkSession, src: String, dst: String,
                                skip: Set[String] = Set.empty): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcRoot = new Path(src)
    val fs = srcRoot.getFileSystem(conf)
    val local = fs.getScheme == "file"
    def localPath(p: Path): java.nio.file.Path =
      java.nio.file.Paths.get(p.toUri.getPath)
    def walk(rel: String): Unit = {
      val here = if (rel.isEmpty) srcRoot else new Path(src, rel)
      fs.listStatus(here).foreach { st =>
        val childRel =
          if (rel.isEmpty) st.getPath.getName
          else s"$rel/${st.getPath.getName}"
        if (!skip.contains(childRel)) {
          val target = new Path(dst, childRel)
          if (st.isDirectory) {
            fs.mkdirs(target)
            walk(childRel)
          } else {
            fs.mkdirs(target.getParent)
            if (local)
              java.nio.file.Files.createLink(
                localPath(target), localPath(st.getPath))
            else
              FileUtil.copy(fs, st.getPath, fs, target, false, conf)
            ()
          }
        }
      }
    }
    walk("")
  }

  /** Columns of `df` with `partCol` cast to long in place — the union
    * pin between a partition-discovered tree (whose partition column
    * may infer narrow) and a freshly computed delta frame. */
  private def pinPart(df: DataFrame, partCol: String): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      if (c == partCol) col(c).cast("long").as(c) else col(c)): _*)

  /** ATOMIC batch append on a versioned index whose mutable state is
    * one partition tree (`root/v=n/$tree/$partCol=…` — the float
    * tier's postings, every compressed tier's codes): hardlink-mirror
    * the live version except the batch's touched partition
    * directories, write those partitions as old-rows ∪ batch into the
    * fresh version, flip the pointer. A reader overlapping the append
    * sees the wholly-old or wholly-new version — never some of the
    * batch's cells and not others (the in-place fast paths'
    * documented residual); a crash anywhere leaves the pointer on the
    * old version, whose files the orphaned partial never touched.
    * `batch` must carry exactly the tree's columns (tier wrappers
    * enforce the metadata/dimension discipline before calling).
    * Returns appended rows. Cost: O(touched-partition rewrite) data
    * IO — the batch's own locality under the frozen assignment keeps
    * that request-sized — plus the mirror's metadata ops. */
  private[graft] def appendRowsAtomic(spark: SparkSession, root: String,
                                          tree: String, partCol: String,
                                          batch: DataFrame,
                                          keep: Int = 2): Long = {
    val live = currentOrFail(spark, root)
    val treeCols = spark.read.parquet(s"$live/$tree").columns.toSet
    require(batch.columns.toSet == treeCols,
      s"appendRowsAtomic: batch columns ${batch.columns.toSet} do not " +
        s"match the live $tree tree's $treeCols")
    // materialize the batch once: encode/assign arithmetic should not
    // re-run for the touched-partition probe AND the rewrite
    val staged = pinPart(Scratch.stageReuse(batch, s"manifest_append_$tree"), partCol)
    val touched = staged.select(partCol).distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return 0L
    val oldRows = pinPart(spark.read.parquet(s"$live/$tree"), partCol)
      .filter(col(partCol).isInCollection(touched.toSeq))
    publishFrom(spark, root) { (liveDir, next) =>
      mirror(spark, liveDir, next,
        skip = touched.map(v => s"$tree/$partCol=$v"))
      oldRows.unionByName(staged).repartition(col(partCol))
        .write.mode("append").partitionBy(partCol).parquet(s"$next/$tree")
    }
    vacuum(spark, root, keep)
    staged.count()
  }

  /** ATOMIC right-to-erasure on a versioned index (layout as
    * [[appendRowsAtomic]]): hardlink-mirror the live version except
    * the partition directories holding an erased id, write their
    * survivors into the fresh version (an emptied partition writes no
    * rows — its directory simply never exists in the new version, no
    * explicit retire step), flip the pointer. Readers never see a
    * half-erased index and a crash leaves the old version serving —
    * the consistency the in-place form's per-partition commits cannot
    * give. Returns deleted rows. */
  private[graft] def deleteVecIdsAtomic(spark: SparkSession, root: String,
                                            tree: String, partCol: String,
                                            vecIds: Seq[Long],
                                            keep: Int = 2): Long = {
    if (vecIds.isEmpty) return 0L
    val live = currentOrFail(spark, root)
    val rows = pinPart(spark.read.parquet(s"$live/$tree"), partCol)
    val affected = rows.filter(col("vec_id").isInCollection(vecIds))
      .select(partCol).distinct().collect().map(_.getLong(0)).toSet
    if (affected.isEmpty) return 0L
    val inAffected = rows.filter(col(partCol).isInCollection(affected.toSeq))
    val survivors = inAffected.filter(!col("vec_id").isInCollection(vecIds))
    val nBefore = inAffected.count()
    publishFrom(spark, root) { (liveDir, next) =>
      mirror(spark, liveDir, next,
        skip = affected.map(v => s"$tree/$partCol=$v"))
      survivors.repartition(col(partCol))
        .write.mode("append").partitionBy(partCol).parquet(s"$next/$tree")
    }
    // count BEFORE vacuum: survivors reads the (immutable) superseded
    // version, which keep=1 would have deleted; the filter is
    // deterministic so the count matches what was written
    val nAfter = survivors.count()
    vacuum(spark, root, keep)
    nBefore - nAfter
  }
}
