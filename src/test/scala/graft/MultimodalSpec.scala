package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** A pluggable test decoder for the [[Multimodal.MediaDecoder]]
  * contract spec: 3 lanes derived from payload length, open() calls
  * counted (object state is visible across local-mode tasks). */
object ProbeDecoder extends Multimodal.MediaDecoder {
  val featureDim = 3
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val decodes = new java.util.concurrent.atomic.AtomicInteger(0)
  override def open(): Unit = { opens.incrementAndGet(); () }
  def decode(bytes: Array[Byte]): Multimodal.MediaFeatures = {
    decodes.incrementAndGet()
    Multimodal.MediaFeatures(
      Array(bytes.length.toDouble, (bytes.length % 7).toDouble, 1.0),
      bytes.length, bytes.length / 2)
  }
}

/** A contract-violating decoder: emits 2 lanes but claims 3. */
object RaggedDecoder extends Multimodal.MediaDecoder {
  val featureDim = 3
  def decode(bytes: Array[Byte]): Multimodal.MediaFeatures =
    Multimodal.MediaFeatures(Array(1.0, 2.0), 0, 0)
}

class MultimodalSpec extends SparkSpecBase {

  test("media decoder contract: schema tracks featureDim, open() once per partition, " +
      "ragged decode fails loudly, partitioning preserved") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, "x" * i.toInt)).toDF("doc_id", "text")
      .repartition(4)
    ProbeDecoder.opens.set(0); ProbeDecoder.decodes.set(0)
    val flat = Multimodal.featureExtractOn(docs, ProbeDecoder)
    // schema adapts to the decoder's width
    assert(flat.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "feature_0", "feature_1", "feature_2"))
    val rows = flat.collect()
    assert(rows.length == 40)
    // batch shape: open() once per PARTITION, decode once per row
    assert(ProbeDecoder.opens.get == 4,
      s"open() must run once per partition, ran ${ProbeDecoder.opens.get}")
    assert(ProbeDecoder.decodes.get == 40)
    rows.foreach { r =>
      assert(r.getDouble(4) == r.getInt(1).toDouble)  // lane 0 = n_bytes
      assert(r.getInt(2) == r.getInt(1))              // width from decoder
    }
    // no shuffle: the extraction preserves the input partitioning
    assert(flat.rdd.getNumPartitions == 4)
    // vector form honors the same contract
    ProbeDecoder.opens.set(0)
    val vec = Multimodal.featureExtractVecOn(docs, ProbeDecoder).collect()
    assert(vec.length == 40 && vec.forall(_.getSeq[Float](4).length == 3))
    assert(ProbeDecoder.opens.get == 4)
    // a decoder that breaks its own width contract fails loudly
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.featureExtractOn(docs, RaggedDecoder).collect()
    }
    assert(e.getMessage != null)
  }

  test("binary meta: lengths and md5 agree with the payload bytes") {
    val docs = sources.Tables.documents(spark, sfDir)
    val meta = Multimodal.binaryMeta(spark, sfDir).cache()
    assert(meta.count() == docs.count())
    val sample = meta.limit(20).collect()
    val texts = docs.limit(20).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sample.foreach { r =>
      val id = r.getLong(0)
      texts.get(id).foreach { t =>
        assert(r.getInt(1) == t.getBytes("UTF-8").length)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getString(2) == md)
        assert(r.getString(4) == "text/plain")
      }
    }
  }

  test("binary meta: magic sniffing recognizes media prefixes") {
    import spark.implicits._
    // raw binary payloads — PNG/JPEG magics are not valid UTF-8, so
    // they must enter as bytes, exactly as a media raw zone would
    val png = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte) ++ "rest".getBytes
    val jpg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++ "rest".getBytes
    val pdf = "%PDF-1.4 fake".getBytes
    val txt = "plain old text".getBytes
    val prefixHex = upper(hex(substring(col("content"), 1, 4)))
    val sniffed = Seq((1L, pdf), (2L, png), (3L, jpg), (4L, txt))
      .toDF("doc_id", "content")
      .select(col("doc_id"),
        when(prefixHex.startsWith("25504446"), "application/pdf")
          .when(prefixHex.startsWith("FFD8"), "image/jpeg")
          .when(prefixHex.startsWith("89504E47"), "image/png")
          .otherwise("text/plain").as("content_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sniffed(1L) == "application/pdf")
    assert(sniffed(2L) == "image/png")
    assert(sniffed(3L) == "image/jpeg")
    assert(sniffed(4L) == "text/plain")
  }

  test("feature extract: fixed-width deterministic features, one row per doc") {
    val n = sources.Tables.documents(spark, sfDir).count()
    val a = Multimodal.featureExtractVec(spark, sfDir).collect()
    assert(a.length == n)
    a.foreach { r =>
      assert(r.getSeq[Float](4).length == Multimodal.FeatureDim)
      assert(r.getInt(1) > 0)
    }
    // deterministic across runs (stub decode is pure)
    val b = Multimodal.featureExtractVec(spark, sfDir).collect()
    val am = a.map(r => r.getLong(0) -> r.getSeq[Float](4)).toMap
    val bm = b.map(r => r.getLong(0) -> r.getSeq[Float](4)).toMap
    assert(am == bm)
  }

  test("feature extract: flat driver schema agrees with the vector form") {
    val flat = Multimodal.featureExtract(spark, sfDir)
    assert(flat.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height") ++
        (0 until Multimodal.FeatureDim).map(i => s"feature_$i"))
    val fm = flat.collect().map { r =>
      r.getLong(0) -> (0 until Multimodal.FeatureDim).map(i => r.getDouble(4 + i))
    }.toMap
    val vm = Multimodal.featureExtractVec(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](4)).toMap
    assert(fm.keySet == vm.keySet)
    fm.foreach { case (id, fs) =>
      fs.zip(vm(id)).foreach { case (d, f) =>
        assert(math.abs(d - f) < 1e-6, s"doc $id: flat $d vs vec $f")
      }
    }
  }

  test("frame sample: strided grid, exact offsets, fingerprints match the slice bytes") {
    import spark.implicits._
    // payloads with known byte lengths incl. a sub-frame one (0 rows)
    // and a non-UTF-8-safe boundary (multibyte char straddles a cut)
    val docs = Seq(
      (1L, "a" * 300),                      // 4 full frames -> idx 0
      (2L, "b" * 512),                      // 8 full frames -> idx 0, 4
      (3L, "c" * 63),                       // shorter than one frame
      (4L, ("é" * 100) + ("x" * 100))       // 300 bytes, cuts inside é pairs
    ).toDF("doc_id", "text")
    val out = Multimodal.frameSampleOn(docs).collect()
      .map(r => (r.getLong(0), r.getInt(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(!out.keys.exists(_._1 == 3L), "sub-frame payload must emit no rows")
    assert(out.keys.count(_._1 == 1L) == 1 && out.contains((1L, 0)))
    assert(out.keys.count(_._1 == 2L) == 2 &&
      out.contains((2L, 0)) && out.contains((2L, 4)))
    out.foreach { case ((id, idx), (nf, off, fp)) =>
      assert(off == idx.toLong * Multimodal.FrameBytes)
      val bytes = docs.filter(col("doc_id") === id).head().getString(1)
        .getBytes("UTF-8")
      assert(nf == bytes.length / Multimodal.FrameBytes)
      val slice = bytes.slice(off.toInt, off.toInt + Multimodal.FrameBytes)
      assert(fp == graft.functions.RollingHash.polyHash(slice),
        s"fingerprint mismatch for doc $id frame $idx")
    }
  }

  test("frame dedup: duplicated payload pairs found with containment 1.0") {
    import spark.implicits._
    val f = (c: Char) => c.toString * 16
    val base = f('a') + f('b') + f('c') + f('d')  // 4 distinct frames
    val docs = Seq(
      (1L, base), (2L, base),            // exact dup pair
      (3L, base + f('e')),               // superset: contains all 4
      (4L, f('z') + f('y'))              // unrelated
    ).toDF("doc_id", "text")
    val rows = graft.operators.Multimodal.mmFrameDedupOn(docs).collect()
    val byPair = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    assert(byPair.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    byPair.values.foreach { r =>
      assert(r.getAs[Long]("shared_frames") == 4L)
      // min(4, 4) or min(4, 5) both divide 4 shared -> full containment
      assert(r.getAs[Double]("containment") == 1.0)
    }
  }

  test("frame dedup: shared distinct frames counted once; min-shared enforced") {
    import spark.implicits._
    val f = (c: Char) => c.toString * 16
    val docs = Seq(
      (1L, f('a') + f('b') + f('c')),
      (2L, f('a') + f('b') + f('d')),  // shares 2 distinct frames with 1
      (3L, f('c') + f('e') + f('f'))   // shares only 1 with doc 1 -> dropped
    ).toDF("doc_id", "text")
    val rows = graft.operators.Multimodal.mmFrameDedupOn(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == (1L, 2L))
    assert(r.getAs[Long]("shared_frames") == 2L)
    assert(r.getAs[Long]("n_frames_a") == 3L && r.getAs[Long]("n_frames_b") == 3L)
    assert(r.getAs[Double]("containment") == 2.0 / 3.0)
  }

  test("frame dedup: boilerplate frames above the posting cap generate no pairs") {
    import spark.implicits._
    val hot = "h" * 16
    // 5 docs all sharing ONLY the hot frame; cap 3 drops it entirely
    val docs = (1L to 5L).map(i => (i, hot + i.toString * 16)).toDF("doc_id", "text")
    val rows = graft.operators.Multimodal
      .mmFrameDedupOn(docs, maxPosting = 3).collect()
    assert(rows.isEmpty, "hot frame must be cut before pair generation")
  }
}
