package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Exact-substring duplicate SPANS: find, for every document, the
  * token ranges that also appear verbatim in some other document —
  * the span-level form of exact dedup used on LLM training corpora
  * (dedup whole documents AND cut repeated boilerplate/quotations
  * that survive doc-level dedup; cf. the suffix-array "deduplicating
  * training data" recipe, reframed shuffle-friendly).
  *
  * Distributed shape — a suffix array is a global sorted structure a
  * shuffle engine can't build cheaply, but its OUTPUT (duplicated
  * runs ≥ K tokens) is reproduced by fixed-width window hashing:
  *  1. hash every K-word window per doc in ONE codegen pass
  *     (`hashed_word_ngram_seq` — positional sibling of the dedup
  *     tier's `hashed_word_ngrams`), posexplode to (doc, pos, h):
  *     8-byte postings, never the strings;
  *  2. windows seen in ≥2 DISTINCT docs = duplicated (one uniform
  *     groupBy-h shuffle; a duplicated run of L ≥ K tokens appears as
  *     L-K+1 consecutive duplicated windows, so run boundaries are
  *     recovered exactly up to K-1 tokens of slack at the edges);
  *  3. merge overlapping [pos, pos+K-1] intervals per doc (islands
  *     over one (doc, pos) window — partition-local after the
  *     doc-keyed exchange) and report covered-token counts.
  *
  * At 100 TB: stage-2's shuffle carries one 12-byte row per window
  * posting (~n_tokens rows) — the same order of bytes the dedup
  * tier's shingle stages move; nothing is quadratic and no driver
  * state exists. Tuning K trades recall (short repeats) for posting
  * volume; 8 words ≈ the shortest span worth cutting.
  */
object SubstringSpans {

  /** Window length in words (the minimum duplicated run detected). */
  val K = 8

  /** Per-document duplicated-span report over `documents`:
    * `(doc_id, n_words, dup_windows, dup_tokens, dup_frac)` — every
    * doc appears; zero rows mean "no ≥K-token span shared with
    * another doc". */
  def substringSpans(spark: SparkSession, dir: String): DataFrame =
    substringSpansOn(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** Cross-doc duplicated K-word windows as (doc_id, pos) postings —
    * the shared core of the span REPORT and the span CUT. */
  private def dupWindows(docs: DataFrame): DataFrame = {
    val wins = docs.select(col("doc_id"),
      posexplode(call_function("hashed_word_ngram_seq", col("text"), lit(K))))
      .toDF("doc_id", "pos", "h")
    // duplicated across documents: distinct-doc count ≥ 2 (count(*)
    // would also fire on within-doc repetition — that's text_repetition's
    // job, not dedup's)
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2).select(col("h"))
    wins.join(dup, "h").select(col("doc_id"), col("pos"))
  }

  /** Generic form over any `(doc_id, text)` frame. */
  def substringSpansOn(docs: DataFrame): DataFrame = {
    val dupWins = dupWindows(docs)
    // classic islands: a window starts a new span iff it begins past
    // every previous window's end
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val islands = dupWins
      .withColumn("end", col("pos") + lit(K - 1))
      .withColumn("prev_max",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max").isNull || col("pos") > col("prev_max"), 1).otherwise(0))
      .withColumn("island",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val perIsland = islands.groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("nw"),
        (max(col("end")) - min(col("pos")) + lit(1)).as("cov"))
    val perDoc = perIsland.groupBy(col("doc_id"))
      .agg(sum(col("nw")).as("dup_windows"), sum(col("cov")).as("dup_tokens"))
    docs
      .withColumn("n_words", size(split(col("text"), " ")))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / col("n_words").cast("double"), 6).as("dup_frac"))
  }

  /** Duplicated-span CUT (key `dedup_span_cut`) — the ACTION the span
    * report feeds: remove every cross-doc duplicated ≥K-word window's
    * tokens from every document and reassemble the surviving text
    * (the span-level dedup cut of the suffix-array training-data
    * recipe, reframed on the same shuffle-friendly window postings).
    * Deterministic symmetric contract: the duplicated range is cut
    * from EVERY copy — a keep-one-occurrence policy needs a global
    * ownership rule (e.g. exempt the min doc_id per window), which
    * callers can layer by exempting docs from `dupWindows` before the
    * cut; the symmetric cut is the one that needs no cross-doc
    * coordination and is what boilerplate removal wants.
    *
    * Shape: the window postings (one uniform hash shuffle — shared
    * with the report), a bounded K-fold explode to covered positions,
    * one doc-keyed anti-join against the word stream, one doc-keyed
    * reassembly. Reassembly canonicalizes inter-word whitespace to
    * single spaces (the corpus convention; a byte-exact cut would
    * carry char offsets instead of word positions through the same
    * plan). Output: every doc, with `clean_text` empty when fully
    * covered. */
  def spanCut(spark: SparkSession, dir: String): DataFrame =
    spanCutOn(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  def spanCutOn(docs: DataFrame): DataFrame = {
    val covered = dupWindows(docs)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(K - 1))).as("pos"))
      .distinct()
    val words = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val cleaned = words
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("word")))).as("s"),
        count(lit(1)).as("n_kept"))
      .select(col("doc_id"),
        array_join(col("s")("word"), " ").as("clean_text"), col("n_kept"))
    docs
      .withColumn("n_words", size(split(col("text"), " ")))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_words").cast("long") - coalesce(col("n_kept"), lit(0L))).as("n_cut"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Oracle: the shared duplicated-window prefix + covered-position
    * explode + anti-join + ordered reassembly. */
  val spanCutOracleSql: String =
    s"""$dupWindowsCtesSql, cov AS (
       |  SELECT DISTINCT doc_id, pos FROM (
       |    SELECT doc_id, unnest(generate_series(pos, pos + ${K - 1})) AS pos
       |    FROM dw)
       |), t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
       |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
       |  FROM documents
       |), kept AS (
       |  SELECT t.doc_id, t.pos, t.word FROM t
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
       |), cl AS (
       |  SELECT doc_id, array_to_string(list(word ORDER BY pos), ' ') AS clean_text,
       |    COUNT(*) AS n_kept
       |  FROM kept GROUP BY doc_id
       |), d AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents
       |)
       |SELECT d.doc_id, CAST(d.n_words AS INTEGER) AS n_words,
       |  CAST(COALESCE(cl.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(d.n_words - COALESCE(cl.n_kept, 0) AS BIGINT) AS n_cut,
       |  COALESCE(cl.clean_text, '') AS clean_text
       |FROM d LEFT JOIN cl USING (doc_id)""".stripMargin

  /** Shared oracle CTE prefix ending at `dw` (the cross-doc
    * duplicated (doc_id, pos) window postings): window strings
    * rebuilt from the split-word list (a K-gram joined with single
    * spaces IS the original byte range — the
    * [[graft.functions.WordNgramSeq]] contract), hashed with the
    * poly-fold + splitmix64 chain the dedup-tier oracles share.
    * Positions are 0-based to match posexplode. */
  private def dupWindowsCtesSql: String = {
    import graft.functions.SqlReplay._
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), g0 AS (
       |  SELECT doc_id, unnest(generate_series(1, len(w) - ${K - 1})) AS i, w
       |  FROM w WHERE len(w) >= $K
       |), g1 AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    array_to_string(list_slice(w, i, i + ${K - 1}), ' ') AS gram
       |  FROM g0
       |), gb AS (
       |  SELECT doc_id, pos, hex(encode(gram)) AS hx,
       |    octet_length(encode(gram)) AS n FROM g1
       |), ph AS (
       |  SELECT doc_id, pos, ${polyFold(hexBytes("hx", "n"))} AS p FROM gb
       |), m1 AS (SELECT doc_id, pos, xor(p, p >> 30) AS z FROM ph
       |), m2 AS (SELECT doc_id, pos, ${mulmod("z", MixC1)} AS z FROM m1
       |), m3 AS (SELECT doc_id, pos, xor(z, z >> 27) AS z FROM m2
       |), m4 AS (SELECT doc_id, pos, ${mulmod("z", MixC2)} AS z FROM m3
       |), grams AS (SELECT doc_id, pos, xor(z, z >> 31) AS h FROM m4
       |), dup AS (
       |  SELECT h FROM (
       |    SELECT h, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY h) t
       |  WHERE nd >= 2
       |), dw AS (
       |  SELECT doc_id, pos FROM grams JOIN dup USING (h)
       |)""".stripMargin
  }

  /** DuckDB replay of the span report: the shared prefix + the same
    * distinct-doc / islands / coverage SQL. */
  val substringSpansOracleSql: String = {
    s"""$dupWindowsCtesSql, mk AS (
       |  SELECT doc_id, pos, pos + ${K - 1} AS e,
       |    MAX(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM dw
       |), il AS (
       |  SELECT doc_id, pos, e,
       |    SUM(CASE WHEN prev_max IS NULL OR pos > prev_max THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM mk
       |), isl AS (
       |  SELECT doc_id, island, COUNT(*) AS nw,
       |    MAX(e) - MIN(pos) + 1 AS cov
       |  FROM il GROUP BY 1, 2
       |), pd AS (
       |  SELECT doc_id, SUM(nw) AS dup_windows, SUM(cov) AS dup_tokens
       |  FROM isl GROUP BY 1
       |), docs AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents
       |)
       |SELECT d.doc_id, CAST(d.n_words AS INTEGER) AS n_words,
       |  CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
       |  CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  round(CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
       |        / CAST(d.n_words AS DOUBLE), 6) AS dup_frac
       |FROM docs d LEFT JOIN pd p USING (doc_id)""".stripMargin
  }
}
