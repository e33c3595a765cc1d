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

  /** Generic form over any `(doc_id, text)` frame. */
  def substringSpansOn(docs: DataFrame): DataFrame = {
    val wins = docs.select(col("doc_id"),
      posexplode(call_function("hashed_word_ngram_seq", col("text"), lit(K))))
      .toDF("doc_id", "pos", "h")
    // duplicated across documents: distinct-doc count ≥ 2 (count(*)
    // would also fire on within-doc repetition — that's text_repetition's
    // job, not dedup's)
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2).select(col("h"))
    val dupWins = wins.join(dup, "h").select(col("doc_id"), col("pos"))
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

  /** DuckDB replay: window strings rebuilt from the split-word list
    * (a K-gram joined with single spaces IS the original byte range —
    * the [[graft.functions.WordNgramSeq]] contract), hashed with the
    * poly-fold + splitmix64 chain the dedup-tier oracles share, then
    * the same distinct-doc / islands / coverage SQL. Positions are
    * 0-based to match posexplode. */
  val substringSpansOracleSql: String = {
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
       |), mk AS (
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
