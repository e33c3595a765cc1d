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
}
