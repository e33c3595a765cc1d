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
}
