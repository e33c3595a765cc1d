package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

class TrainPrepSpec extends SparkSpecBase {

  test("packSequences: packing invariants hold on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val packed = TrainPrep.packSequencesOn(docs, nShards = 4, budget = 100L)
      .cache()
    // total preservation: every doc is packed exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // chunk_id is exactly the offset contract
    assert(packed.filter(
      col("chunk_id") =!= expr("token_offset DIV 100")).count() == 0)
    // within a shard, offsets telescope: offset(k+1) = offset(k) + tokens(k)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("seq_pos")
    val bad = packed
      .withColumn("prev_end", lag(col("token_offset") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("token_offset") =!= col("prev_end"))
      .count()
    assert(bad == 0, "token offsets must telescope within a shard")
    // chunks are monotone within a shard (concat-and-chunk: a later
    // doc can never land in an earlier chunk)
    val nonMono = packed
      .withColumn("prev_chunk", lag(col("chunk_id"), 1, 0L).over(w))
      .filter(col("chunk_id") < col("prev_chunk"))
      .count()
    assert(nonMono == 0)
    packed.unpersist()
  }

  test("packBoundaries: segments tile every chunk and reconstruct every doc") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sfDir)
    val segs = graft.operators.TrainPrep.packBoundariesOn(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getBoolean(6)))
    val lay = graft.operators.TrainPrep.packSequencesOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc_id -> n_tokens
    val budget = graft.operators.TrainPrep.ChunkBudget
    // per chunk: segments are contiguous, non-overlapping, in seg_index order
    segs.groupBy(s => (s._1, s._2)).foreach { case ((shard, chunk), ss) =>
      val ordered = ss.sortBy(_._3)
      assert(ordered.map(_._3).sameElements(1 to ss.length), s"seg_index gap in ($shard,$chunk)")
      var expectStart = ordered.head._5
      ordered.foreach { s =>
        assert(s._5 == expectStart, s"segment not contiguous in ($shard,$chunk)")
        assert(s._6 > 0 && s._5 + s._6 <= budget)
        expectStart = s._5 + s._6
      }
      // only a chunk's FIRST segment may continue a split doc
      ordered.tail.foreach(s => assert(s._7, "non-leading segment must start its doc"))
    }
    // per doc: segment lengths sum to the doc's token count, exactly one
    // starts_doc segment, continuations start at offset 0 of their chunk
    segs.groupBy(_._4).foreach { case (docId, ss) =>
      assert(ss.map(_._6.toLong).sum == lay(docId), s"doc $docId segment lengths")
      assert(ss.count(_._7) == 1, s"doc $docId must start exactly once")
      ss.filter(!_._7).foreach(s => assert(s._5 == 0, "continuation must resume at chunk start"))
    }
  }

  test("packSequences: deterministic across runs and partitionings") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = TrainPrep.packSequencesOn(docs)
    val b = TrainPrep.packSequencesOn(docs.repartition(7))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "shard/order/chunk assignment is a pure function of the key")
  }

  test("packSequences: budget halving only splits chunks, never reorders") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val coarse = TrainPrep.packSequencesOn(docs, budget = 200L)
      .select(col("doc_id"), col("seq_pos"), col("shard"))
    val fine = TrainPrep.packSequencesOn(docs, budget = 100L)
      .select(col("doc_id"), col("seq_pos"), col("shard"))
    // the training ORDER (shard, seq_pos) is budget-independent
    assert(coarse.exceptAll(fine).count() == 0)
  }

  test("textEncode: ids are vocabulary ranks, OOV real and counted, decode round-trips") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val enc = TrainPrep.textEncodeOn(docs).cache()
    val k = TrainPrep.EncodeVocabK
    // every doc encoded once, one id per word
    assert(enc.count() == docs.count())
    assert(enc.filter(size(col("token_ids")) =!= col("n_tokens")).count() == 0)
    // ids live in [0, K] (K = the OOV id) and n_oov counts the K's
    assert(enc.filter(
      exists(col("token_ids"), id => id < 0 || id > k)).count() == 0)
    assert(enc.filter(
      size(filter(col("token_ids"), _ === k)) =!= col("n_oov")).count() == 0)
    // the small encode vocabulary makes OOV real data on this corpus
    assert(enc.agg(sum("n_oov")).collect()(0).getLong(0) > 0,
      "corpus must exercise the OOV path")
    // re-encode check: for a sample of docs, the id stream equals
    // mapping each word through the vocabulary rank table with OOV → K
    // (ids are injective vocabulary ranks, so this is also the decode
    // round-trip for every in-vocab position)
    val idToTerm = TrainPrep.encodeVocab(docs, k).collect()
      .map(r => r.getInt(1) -> r.getString(0)).toMap
    assert(idToTerm.size == k)
    val termToId = idToTerm.map(_.swap)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.collect().take(50).foreach { r =>
      val want = texts(r.getLong(0)).split(" ", -1).toSeq
        .map(w => termToId.getOrElse(w, k))
      assert(r.getSeq[Int](1) == want,
        s"re-encode mismatch for doc ${r.getLong(0)}")
    }
    enc.unpersist()
  }

  test("packTokenIds: exact chunk sizes and shard streams equal the per-doc encoding") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val budget = 100L
    val packed = TrainPrep.packTokenIdsOn(docs, budget = budget).cache()
    // every chunk but each shard's last carries exactly `budget` ids
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard")
    assert(packed.withColumn("mx", max("chunk_id").over(w))
      .filter(col("chunk_id") =!= col("mx") && col("n_tokens") =!= budget)
      .count() == 0, "non-tail chunks must be exactly the budget")
    assert(packed.filter(size(col("token_ids")) =!= col("n_tokens")).count() == 0)
    // token conservation: chunk streams hold every corpus token once
    val total = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
    val words = docs.select(size(graft.functions.TextHashing.words(col("text")))
      .cast("long").as("n")).agg(sum("n")).collect()(0).getLong(0)
    assert(total == words)
    // shard-stream equivalence: concatenating a shard's chunks in
    // chunk order equals concatenating its docs' encodings in the
    // deterministic training order packSequences defines
    val encMap = TrainPrep.textEncodeOn(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val layout = TrainPrep.packSequencesOn(docs, budget = budget).collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getLong(0))) // (shard, seq_pos, doc_id)
    val chunks = packed.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Int](3)))
    (0 until TrainPrep.NShards).foreach { s =>
      val want = layout.filter(_._1 == s).sortBy(_._2).flatMap(t => encMap(t._3)).toSeq
      val got = chunks.filter(_._1 == s).sortBy(_._2).flatMap(_._3).toSeq
      assert(got == want, s"shard $s stream must equal per-doc encoding order")
    }
    packed.unpersist()
  }

  test("packIdStream: fed the whole-word encoding it reproduces packTokenIds exactly") {
    val docs = sources.Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getSeq[Int](3))).toSet
    val viaStream = rows(TrainPrep.packIdStreamOn(TrainPrep.textEncodeOn(docs)))
    val direct = rows(TrainPrep.packTokenIdsOn(docs))
    assert(viaStream == direct,
      "generic id-stream packer must agree with the fused whole-word packer")
  }

  test("chunkDocuments: window/coverage invariants hold on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val size = 16; val stride = 12
    val chunks = TrainPrep.chunkDocumentsOn(docs, size, stride).cache()
    val n = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(split(col("text"), " ")).as("n"))
    // every doc chunks; chunk word counts match the emitted text
    assert(chunks.select("doc_id").distinct().count() == docs.count())
    assert(chunks.filter(
      org.apache.spark.sql.functions.size(split(col("chunk_text"), " "))
        =!= col("n_words")).count() == 0)
    // the LAST chunk ends exactly at the document's end (full
    // coverage, no overhang), and every non-final chunk is full-size
    val last = chunks.groupBy("doc_id")
      .agg(max(col("chunk_idx")).as("m"),
        max(col("chunk_idx") * stride + col("n_words")).as("covered"))
      .join(n, "doc_id")
    assert(last.filter(col("covered") =!= col("n")).count() == 0)
    assert(chunks.join(last.select(col("doc_id"), col("m")), "doc_id")
      .filter(col("chunk_idx") < col("m") && col("n_words") =!= size)
      .count() == 0)
    // a doc at or under the window is exactly one chunk: itself
    val short = docs.join(n.filter(col("n") <= size), "doc_id")
    val shortChunks = chunks.join(n.filter(col("n") <= size), "doc_id")
    assert(shortChunks.count() == short.count())
    assert(shortChunks
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("chunk_text") =!= col("text") || col("chunk_idx") =!= 0)
      .count() == 0)
    chunks.unpersist()
  }

  test("chunkDocuments: deterministic across partitionings") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = TrainPrep.chunkDocumentsOn(docs)
    val b = TrainPrep.chunkDocumentsOn(docs.repartition(7))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("chunkDocuments: rejects invalid window/stride") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    intercept[IllegalArgumentException] {
      TrainPrep.chunkDocumentsOn(docs, sizeWords = 8, stride = 9)
    }
    intercept[IllegalArgumentException] {
      TrainPrep.chunkDocumentsOn(docs, sizeWords = 0, stride = 0)
    }
  }

  test("sampleMixture: sqrt-temperature flattening, whole-kept small sources, " +
      "deterministic admission, weights sum to 1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // skewed synthetic mix: one dominant source, one mid, one tiny
    val docs = ((1L to 800L).map(i => (i, "big")) ++
      (801L to 980L).map(i => (i, "mid")) ++
      (981L to 1000L).map(i => (i, "tiny")))
      .toDF("doc_id", "source")
    val out = TrainPrep.sampleMixtureOn(docs).cache()
    val stats = out.groupBy("source")
      .agg(count(lit(1)).as("kept"), first("weight").as("w"), first("rate").as("r"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // weights ∝ sqrt(count): flatter than raw proportions — big's
    // weight share is below its count share, tiny's above
    assert(stats("big")._2 < 800.0 / 1000.0 && stats("tiny")._2 > 20.0 / 1000.0)
    // weight ordering still tracks size, and the weights sum to 1
    assert(stats("big")._2 > stats("mid")._2 && stats("mid")._2 > stats("tiny")._2)
    assert(math.abs(stats.values.map(_._2).sum - 1.0) < 1e-12)
    // N = total/2 and sqrt-flattening ⇒ the dominant source is
    // down-sampled (rate < 1) while the tiny source keeps everything
    assert(stats("big")._3 < 1.0)
    assert(stats("tiny")._3 == 1.0 && stats("tiny")._1 == 20L,
      "a small source under temperature sampling must be kept whole")
    // admitted counts are binomially near rate·count (5σ tolerance)
    Seq("big" -> 800L, "mid" -> 180L).foreach { case (s, n) =>
      val (kept, _, r) = stats(s)
      val sigma = math.sqrt(n * r * (1 - r))
      assert(math.abs(kept - n * r) <= 5 * sigma + 1,
        s"$s kept $kept vs expected ${n * r} ± ${5 * sigma}")
    }
    // deterministic: same frame repartitioned arbitrarily → same set
    val again = TrainPrep.sampleMixtureOn(docs.repartition(7))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(out.select("doc_id").collect().map(_.getLong(0)).sorted))
    // every admitted doc really clears its source's admission compare
    val grid = (1L << TrainPrep.MixtureGridBits).toDouble
    val viol = out.filter(
      (pmod(xxhash64(col("doc_id")), lit(1L << TrainPrep.MixtureGridBits))
        .cast("double") / lit(grid)) >= col("rate")).count()
    assert(viol == 0L, "an admitted doc must clear its admission compare")
    out.unpersist()
    ()
  }

  test("sampleMixture temperature sweep: T ∈ {1, 2, 4} flattens the mix " +
      "monotonically; T=1 reproduces raw proportions; other T rejected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = ((1L to 800L).map(i => (i, "big")) ++
      (801L to 980L).map(i => (i, "mid")) ++
      (981L to 1000L).map(i => (i, "tiny")))
      .toDF("doc_id", "source")
    def weightsAt(t: Int): Map[String, Double] =
      TrainPrep.sampleMixtureOn(docs, temperature = t)
        .groupBy("source").agg(first("weight").as("w"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byT = Seq(1, 2, 4).map(t => t -> weightsAt(t)).toMap
    // T=1 is examples-proportional: weights equal raw count shares
    // exactly (integer-unit arithmetic — no rounding residue at these
    // counts: units are count·10^6)
    assert(math.abs(byT(1)("big") - 0.8) < 1e-12 &&
      math.abs(byT(1)("tiny") - 0.02) < 1e-12)
    // flattening is MONOTONE in T: the dominant source's weight
    // falls, the tiny source's rises, at every step of the sweep
    assert(byT(1)("big") > byT(2)("big") && byT(2)("big") > byT(4)("big"),
      s"big-source weight must fall with T, got ${Seq(1, 2, 4).map(byT(_)("big"))}")
    assert(byT(1)("tiny") < byT(2)("tiny") && byT(2)("tiny") < byT(4)("tiny"),
      s"tiny-source weight must rise with T, got ${Seq(1, 2, 4).map(byT(_)("tiny"))}")
    // weight ordering still tracks size at every T, and sums to 1
    Seq(1, 2, 4).foreach { t =>
      val w = byT(t)
      assert(w("big") > w("mid") && w("mid") > w("tiny"))
      assert(math.abs(w.values.sum - 1.0) < 1e-12)
    }
    // the oracle replays the same grid: its temperature builder
    // rejects the same off-grid values the operator does
    intercept[IllegalArgumentException] {
      TrainPrep.sampleMixtureOn(docs, temperature = 3)
    }
    intercept[IllegalArgumentException] {
      TrainPrep.sampleMixtureOracleSqlFor(3)
    }
    // the gate key's oracle is byte-stable: parameterizing did not
    // move the committed T=2 SQL the driver hashes against
    assert(TrainPrep.sampleMixtureOracleSql ==
      TrainPrep.sampleMixtureOracleSqlFor(2))
  }
}
