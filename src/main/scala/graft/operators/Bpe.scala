package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextHashing => TH}
import graft.sources.Tables

/** Byte-pair-encoding merge training (key `bpe_train`): learn the
  * ranked merge table that turns [[TextAnalysis.textVocab]]'s word
  * vocabulary into a real subword vocabulary — the tokenizer-training
  * step that sits upstream of `text_encode`/`pack_token_ids` in every
  * LLM data pipeline (reference scope: the corpus-prep tier;
  * cf. /root/reference/scripts/normalize_open_meteo_to_parquet.py:1
  * for the reference's per-stage ETL framing — BPE is the engine-
  * forward extension of that prep tier, not a reference port).
  *
  * Algorithm (Sennrich et al. 2016, public): start from per-word
  * character sequences plus an end-of-word marker; each round counts
  * adjacent symbol pairs weighted by word frequency, merges the most
  * frequent pair everywhere (greedy leftmost, non-overlapping), and
  * records it. The merge table IS the tokenizer.
  *
  * Scale shape — what each piece costs at 100 TB:
  *  - ONE corpus scan builds the (word, count) table, staged durably
  *    to scratch; every subsequent round reads the staged vocabulary,
  *    never the corpus. Vocabulary size is Zipf-bounded (millions of
  *    rows at web scale, not corpus-sized) and stays distributed.
  *  - Each round is one vocab-sized pair explode (Σ symbols per
  *    DISTINCT word) + one keyed aggregate + a 1-ROW collect (the
  *    winning pair) + one narrow fold projection. Rounds are bounded
  *    by the `rounds` argument; the driver holds only the merge
  *    table (R rows) — never symbol data.
  *  - The merge application is a codegen'd higher-order `aggregate`
  *    fold over each word's symbol array (greedy leftmost semantics,
  *    exactly replayable in SQL) — no UDF, no shuffle.
  *
  * Determinism: pair counts are exact integers; ties break on
  * (count DESC, left, right) — both engines compare ASCII strings
  * bytewise — so the DuckDB oracle replays training bit-for-bit with
  * one recursive-fold CTE per round.
  */
object Bpe {

  val BpeRounds = 10
  val EndMark = "</w>"
  /** Rounds between durable re-stagings of the symbol table in
    * [[trainOn]] — bounds replayed fold depth (see the restage note). */
  val RestageEvery = 4

  /** word → initial symbols: characters + end-of-word marker. */
  private def initialSyms(w: Column): Column =
    concat(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit(EndMark)))

  /** Adjacent-pair counts over the symbol table, weighted by word
    * frequency. A fully-merged word collapses to ONE symbol (e.g.
    * "a" + "</w>" -> ["a</w>"]); it contributes no pairs and must be
    * filtered BEFORE the explode — Spark's `sequence(1, 0)` is the
    * DESCENDING [1, 0] (probing index 2 of a 1-element array throws
    * under ANSI), while DuckDB's `generate_series(1, 0)` is empty, so
    * the size guard is both the crash fix and the engine-agreement
    * condition. */
  private def pairCounts(wsyms: DataFrame): DataFrame =
    wsyms.filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("total"))

  /** Apply one merge (l, r) -> lr to a symbol array: greedy leftmost
    * non-overlapping, via a single left fold — after a merge the new
    * token becomes the fold's tail, so overlapping occurrences
    * ("a a a" under (a,a)) resolve left-to-right exactly like the
    * reference BPE implementations. Codegen'd array ops, no UDF. */
  private[operators] def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(syms, typedLit(Array.empty[String]),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** The staged (word, cnt, syms) start state: one corpus scan,
    * vocabulary written durably so the per-round actions replay a
    * vocab-sized parquet read instead of the corpus explode. */
  private def stagedWordSyms(docs: DataFrame): DataFrame = {
    val staged = Scratch.dir("graft_bpe_words")
    docs.select(explode(TH.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(staged)
    docs.sparkSession.read.parquet(staged)
      .select(col("word"), col("cnt"), initialSyms(col("word")).as("syms"))
  }

  /** Train `rounds` merges; returns the ranked merge table
    * (round, left_sym, right_sym, merged, pair_count). Stops early if
    * the vocabulary runs out of distinct pairs. */
  def trainOn(docs: DataFrame, rounds: Int = BpeRounds): DataFrame =
    trainWithSymsOn(docs, rounds)._1

  /** [[trainOn]] plus the POST-TRAINING symbol table — (word, cnt,
    * syms) with every learned merge applied. The training loop already
    * computes this table round by round; returning it lets the apply/
    * encode tier reuse it instead of re-folding the merge list from
    * scratch. */
  def trainWithSymsOn(docs: DataFrame,
                      rounds: Int = BpeRounds): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var wsyms = stagedWordSyms(docs)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // 1-row collect per round: the winning pair — the only data the
      // driver ever holds
      val top = pairCounts(wsyms)
        .orderBy(col("total").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, total) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, l, r, l + r, total))
        wsyms = wsyms.withColumn("syms", mergeFold(col("syms"), l, r))
        // Re-stage every few rounds: without this, round R's action
        // replays all R-1 prior mergeFolds from the round-0 staging —
        // O(R^2) fold work and an R-deep nested higher-order plan. A
        // periodic vocab-sized parquet write truncates both, keeping
        // per-round cost O(vocab · k) at production merge counts
        // (10^4–10^5 rounds). Fresh dir per restage: never overwrite
        // a path the live lineage still reads.
        if (round % RestageEvery == 0) {
          val staged = Scratch.dir(s"graft_bpe_r$round")
          wsyms.write.mode("overwrite").parquet(staged)
          wsyms = spark.read.parquet(staged)
        }
        round += 1
      }
    }
    import spark.implicits._
    (merges.toSeq.toDF("round", "left_sym", "right_sym", "merged", "pair_count"),
      wsyms)
  }

  /** Driver query over `documents` (key `bpe_train`). */
  def train(spark: SparkSession, dir: String): DataFrame =
    trainOn(Tables.documents(spark, dir))

  /** Encode each distinct corpus word with an already-learned merge
    * list: the same fold, applied in merge order — the subword twin of
    * `text_encode`'s whole-word lookup. Returns (word, cnt, syms).
    * Used by BpeSpec's round-trip property (decode: concat symbols,
    * strip the marker, recover the word). */
  def encodeWordsOn(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    var df = stagedWordSyms(docs)
    var applied = 0
    merges.foreach { case (l, r) =>
      df = df.withColumn("syms", mergeFold(col("syms"), l, r))
      applied += 1
      // same plan-depth bound as trainOn: production merge tables are
      // 10^4–10^5 rows; an unbroken fold chain that deep would not
      // analyze, let alone codegen
      if (applied % RestageEvery == 0 && applied < merges.size) {
        val staged = Scratch.dir(s"graft_bpe_apply_$applied")
        df.write.mode("overwrite").parquet(staged)
        df = spark.read.parquet(staged)
      }
    }
    df
  }

  /** The shared DuckDB training replay: per round, a pair-count CTE, a
    * 1-row winner CTE, and a RECURSIVE fold CTE that applies the winner
    * with the same greedy-leftmost semantics as [[mergeFold]] (the
    * accumulator walks each word's symbol array once; acc[-1] is the
    * fold tail). All arithmetic is exact (integer counts, string
    * compares), so the replay is bit-for-bit. `w$rounds` is the
    * post-training symbol table the apply/encode oracles read. */
  private def oracleTrainingCtes(rounds: Int): String = {
    val perRound = (1 to rounds).map { n =>
      val prev = s"w${n - 1}"
      s"""p$n AS MATERIALIZED (
         |  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS total FROM (
         |    SELECT w.cnt, w.syms[t.i] AS l, w.syms[t.i + 1] AS r
         |    FROM $prev w, unnest(generate_series(1, len(w.syms) - 1)) AS t(i))
         |  GROUP BY l, r),
         |m$n AS MATERIALIZED (
         |  SELECT l, r, l || r AS merged, total FROM p$n
         |  ORDER BY total DESC, l, r LIMIT 1),
         |f$n AS (
         |  SELECT word, cnt, syms, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM $prev
         |  UNION ALL
         |  SELECT word, cnt, syms, i + 1,
         |    CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT l FROM m$n)
         |           AND syms[i + 1] = (SELECT r FROM m$n)
         |      THEN list_append(acc[1:len(acc) - 1], (SELECT merged FROM m$n))
         |      ELSE list_append(acc, syms[i + 1]) END
         |  FROM f$n WHERE i < len(syms)),
         |w$n AS MATERIALIZED (SELECT word, cnt, acc AS syms FROM f$n WHERE i = len(syms))""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE wc AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |w0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |    list_append(list_transform(generate_series(1, length(word)),
       |      i -> substr(word, i, 1)), '$EndMark') AS syms
       |  FROM wc),
       |$perRound""".stripMargin
  }

  def trainOracleSql(rounds: Int = BpeRounds): String = {
    val unions = (1 to rounds).map { n =>
      s"""  SELECT CAST($n AS INTEGER) AS round, l AS left_sym, r AS right_sym,
         |    merged, total AS pair_count FROM m$n""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""${oracleTrainingCtes(rounds)}
       |SELECT round, left_sym, right_sym, merged, pair_count FROM (
       |$unions
       |)""".stripMargin
  }

  /** One fold applying a BATCH of symbol-disjoint merges: the
    * when-chain is exclusive by construction (all symbols across the
    * batch are distinct, so at most one arm can match any (tail, x)
    * state), making one traversal equivalent to composing the
    * per-pair folds in any order. */
  private[operators] def mergeFoldBatch(syms: Column,
                                        pairs: Seq[(String, String)]): Column =
    aggregate(syms, typedLit(Array.empty[String]),
      (acc, x) => {
        val first = pairs.head
        val chain = pairs.tail.foldLeft(
          when(size(acc) > 0 &&
              element_at(acc, lit(-1)) === lit(first._1) && x === lit(first._2),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(lit(first._1 + first._2))))) { case (w, (l, r)) =>
          w.when(size(acc) > 0 &&
              element_at(acc, lit(-1)) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        }
        chain.otherwise(concat(acc, array(x)))
      })

  /** BATCHED merge training — the production-scale variant of
    * [[trainOn]]: production tokenizers learn 32k–256k merges, and one
    * driver round-trip per merge would make scheduling latency the
    * bottleneck (10^5 rounds × ~100 ms driver latency is hours of
    * idle cluster). Each round instead takes the top candidate pairs
    * and accepts a maximal SYMBOL-DISJOINT prefix by rank (up to
    * `batchSize`): merging (a, b) only perturbs counts of pairs that
    * touch `a` or `b`, so the counts of the accepted symbol-disjoint
    * pairs are exactly invariant under each other's application — the
    * batch is not an approximation of ITS OWN ranks, and driver
    * round-trips drop by the achieved batch factor. The cross-batch
    * sequence can differ from strict sequential BPE where a rejected
    * overlapping pair would have out-ranked a later accepted one —
    * the standard scalable-BPE tradeoff; `batchSize = 1` reproduces
    * [[trainOn]] exactly (spec-asserted).
    *
    * Per round: ONE vocab-sized aggregate, one bounded
    * (4×batchSize-row) collect, one batched fold projection. */
  def trainBatchedOn(docs: DataFrame, totalMerges: Int,
                     batchSize: Int = 16): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = docs.sparkSession
    var wsyms = stagedWordSyms(docs)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 0
    var exhausted = false
    while (merges.size < totalMerges && !exhausted) {
      round += 1
      // bounded collect: enough candidates that a maximal disjoint
      // prefix usually fills the batch, never corpus-sized
      val cand = pairCounts(wsyms)
        .orderBy(col("total").desc, col("l"), col("r"))
        .limit(batchSize * 4).collect()
      if (cand.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = cand.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .filter { case (l, r, _) =>
            val ok = !used(l) && !used(r)
            if (ok) { used += l; used += r }
            ok
          }
          .take(math.min(batchSize, totalMerges - merges.size))
          .toSeq
        val base = merges.size
        merges ++= batch.zipWithIndex.map { case ((l, r, total), i) =>
          (base + i + 1, l, r, l + r, total)
        }
        wsyms = wsyms.withColumn("syms",
          mergeFoldBatch(col("syms"), batch.map(p => (p._1, p._2))))
        if (round % RestageEvery == 0) {
          val staged = Scratch.dir(s"graft_bpe_b$round")
          wsyms.write.mode("overwrite").parquet(staged)
          wsyms = spark.read.parquet(staged)
        }
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** Subword segmentation of the corpus vocabulary under the learned
    * merge table (key `bpe_apply`) — the tokenizer-APPLY step train
    * leaves open: every distinct corpus word mapped to its subword
    * sequence. The training loop already materializes exactly this
    * table ([[trainWithSymsOn]]'s second member), so apply costs
    * nothing beyond training; a standalone merge-table application is
    * [[encodeWordsOn]]. Output is vocab-sized (never corpus-sized) and
    * the subword column rides the driver gate as a space-joined string
    * (symbols never contain spaces: words come from a space split). */
  def applySegmentsOn(docs: DataFrame, rounds: Int = BpeRounds): DataFrame =
    trainWithSymsOn(docs, rounds)._2
      .select(col("word"), col("cnt"),
        array_join(col("syms"), " ").as("subwords"),
        size(col("syms")).as("n_subwords"))

  /** Driver query over `documents` (key `bpe_apply`). */
  def applySegments(spark: SparkSession, dir: String): DataFrame =
    applySegmentsOn(Tables.documents(spark, dir))

  def applyOracleSql(rounds: Int = BpeRounds): String =
    s"""${oracleTrainingCtes(rounds)}
       |SELECT word, cnt, array_to_string(syms, ' ') AS subwords,
       |  CAST(len(syms) AS INTEGER) AS n_subwords
       |FROM w$rounds""".stripMargin

  /** Doc-level subword-ID encoding (key `bpe_encode`): the corpus
    * application that feeds the packing tier — each document becomes
    * its stream of subword token ids under the learned merge table,
    * the BPE twin of [[TrainPrep.textEncodeOn]]'s whole-word lookup.
    *
    * Id assignment: subwords ranked by (frequency-weighted total DESC,
    * subword ASC) — deterministic across runs and engines, ids 0-based.
    * No OOV id is needed: the vocabulary derives from the same corpus,
    * so every word has a segmentation by construction.
    *
    * Plan shape: the post-training symbol table is staged once to
    * scratch; subword→id resolution happens ENTIRELY at the vocab
    * level — (word, syms) explodes, joins the bounded subword-id table
    * (|chars| + rounds rows, broadcast), and reassembles to a
    * (word, ids: array<int>) lookup, all over vocab-sized frames. The
    * corpus then explodes to (doc_id, pos, word) ONCE and equi-joins
    * that lookup on `word`, so the token-sized stream is never widened
    * to subword rows (measured 6× at 100×: a per-subword stream doubles
    * the rows through the reassembly shuffle and adds a second
    * token-sized join). The lookup join is keyed, not broadcast-hinted
    * — web-scale vocabularies are millions of rows; Catalyst/AQE still
    * auto-broadcasts it when its stats fit. Reassembly is the one
    * keyed groupBy(doc_id) shuffle (structs sort on pos before the
    * array field is ever compared), and per-doc streams flatten from
    * per-word id arrays. The subword-id ranking window is
    * single-partition over the BOUNDED subword vocabulary, never the
    * corpus. */
  def encodeDocsOn(docs: DataFrame, rounds: Int = BpeRounds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val staged = Scratch.dir("graft_bpe_segs")
    trainWithSymsOn(docs, rounds)._2.write.mode("overwrite").parquet(staged)
    val segs = spark.read.parquet(staged)
    val sv = segs
      .select(explode(col("syms")).as("subword"), col("cnt"))
      .groupBy(col("subword")).agg(sum(col("cnt")).as("total"))
      // lit(0) declares the intentional single-partition rank over the
      // bounded (chars + merges) subword vocabulary
      .withColumn("sid", (row_number().over(
        Window.partitionBy(lit(0))
          .orderBy(col("total").desc, col("subword"))) - 1).cast("int"))
      .select(col("subword"), col("sid"))
    val wordIds = segs
      .select(col("word"), posexplode(col("syms")).as(Seq("subpos", "subword")))
      .join(broadcast(sv), Seq("subword"))
      .groupBy(col("word"))
      .agg(sort_array(collect_list(struct(col("subpos"), col("sid")))).as("s"))
      .select(col("word"), col("s")("sid").as("ids"))
    docs
      .select(col("doc_id"), posexplode(TH.words(col("text"))).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .join(wordIds, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("pos"), col("ids")))).as("s"),
        sum(size(col("ids"))).cast("int").as("n_tokens"))
      .select(col("doc_id"), flatten(col("s")("ids")).as("token_ids"),
        col("n_tokens"))
  }

  /** Driver query over `documents` (key `bpe_encode`): same hashable
    * string projection as [[TrainPrep.textEncode]]. */
  def encodeDocs(spark: SparkSession, dir: String): DataFrame =
    encodeDocsOn(Tables.documents(spark, dir))
      .select(col("doc_id"),
        array_join(col("token_ids"), " ").as("token_ids"),
        col("n_tokens"))

  def encodeDocsOracleSql(rounds: Int = BpeRounds): String =
    s"""${oracleTrainingCtes(rounds)},
       |sv AS MATERIALIZED (
       |  SELECT subword,
       |    CAST(ROW_NUMBER() OVER (ORDER BY total DESC, subword) - 1
       |      AS INTEGER) AS sid
       |  FROM (
       |    SELECT s AS subword, CAST(SUM(cnt) AS BIGINT) AS total
       |    FROM (SELECT unnest(syms) AS s, cnt FROM w$rounds)
       |    GROUP BY s)),
       |dt AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
       |    generate_subscripts(string_split(text, ' '), 1) AS pos
       |  FROM documents),
       |seg AS (
       |  SELECT dt.doc_id, dt.pos, w.syms
       |  FROM dt JOIN w$rounds w ON dt.word = w.word
       |  WHERE dt.word <> ''),
       |sub AS (
       |  SELECT e.doc_id, e.pos, t.i AS subpos, e.syms[t.i] AS subword
       |  FROM seg e, unnest(generate_series(1, len(e.syms))) AS t(i)),
       |ids AS (
       |  SELECT s.doc_id, s.pos, s.subpos, sv.sid
       |  FROM sub s JOIN sv ON sv.subword = s.subword)
       |SELECT doc_id,
       |  array_to_string(list(sid ORDER BY pos, subpos), ' ') AS token_ids,
       |  CAST(COUNT(*) AS INTEGER) AS n_tokens
       |FROM ids GROUP BY doc_id""".stripMargin
}
