package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{TextHashing => TH}

/** Text-analysis tier over `documents`: token statistics, quality
  * scoring, language identification, and content fingerprinting —
  * the per-document feature extraction a training-data pipeline runs
  * before filtering/dedup.
  *
  * Everything except langid is a pure per-row projection (scan-bound,
  * no shuffle, fully codegen'd — text_fingerprint through the native
  * PolyHash64/RollingMinHash expressions). Langid is one exploded
  * bigram join against a broadcast profile table + one argmax window.
  */
object TextAnalysis {

  /** BPE-ish tokenizer regex: letter runs, digit runs, or single
    * non-alphanumeric marks — the shape (if not the exact merges) of
    * byte-pair pretokenizers. Kept to POSIX classes so the Java and
    * RE2 dialects agree. */
  val TokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Stopword list for quality ratios (function words present in the
    * corpus vocabulary). */
  val Stopwords = Seq("the", "a", "of", "to", "is", "and")

  /** Per-document token statistics. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    textTokensOn(Tables.documents(spark, dir))

  def textTokensOn(docs: DataFrame): DataFrame = {
    val toks = TH.words(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_ws_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0))).as("n_bpe_tokens"))
  }

  val textTokensOracleSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_chars,
       |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
       |  CAST(len(regexp_extract_all(text, '$TokenPattern')) AS INTEGER) AS n_bpe_tokens
       |FROM documents""".stripMargin

  /** Per-document quality score: length, punctuation ratio, stopword
    * ratio, distinct-token ratio, and a composite in [0,1]. All
    * ratios are divisions of integer counts — bit-identical across
    * engines with no decimal tricks needed. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    textQualityOn(Tables.documents(spark, dir))

  def textQualityOn(docs: DataFrame): DataFrame = {
    val toks = TH.words(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))).cast("double")
    val nChars = length(col("text")).cast("double")
    val lenScore = least(lit(1.0), nTok / lit(100.0))
    val score = (nUniq / nTok) * (lit(1.0) - nStop / nTok) * lenScore
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      (nPunct / nChars).as("punct_ratio"),
      (nStop / nTok).as("stopword_ratio"),
      (nUniq / nTok).as("uniq_token_ratio"),
      score.as("quality_score"))
  }

  val textQualityOracleSql: String = {
    val stop = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_chars,
       |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
       |    / CAST(length(text) AS DOUBLE) AS punct_ratio,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_token_ratio,
       |  (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE))
       |  * (1.0 - CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE))
       |  * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) AS quality_score
       |FROM documents""".stripMargin
  }

  /** Character bigrams of a text column, as 64-bit hashes WITH
    * multiplicity — the native one-pass expression
    * (functions/WordNgrams.scala `hashed_char_ngrams`; the composed
    * transform+substring chain evaluates interpreted per element and
    * was most of this query's cost). Profile learning and scoring use
    * the bigram only for EQUALITY (group keys / join keys), so hashes
    * are a drop-in; the profile-rank tiebreak becomes hash order —
    * deterministic, just a different arbitrary total order. */
  private def charBigrams(text: Column): Column =
    call_function("hashed_char_ngrams", text, lit(2))

  /** Top bigrams kept per language profile. */
  val ProfileSize = 30

  /** Language-ID by character-bigram profile match.
    *
    * Profiles are learned from a labeled sample (here: the corpus
    * itself via its `lang` column — in production, any labeled seed
    * set): the top-`ProfileSize` bigrams per language, weighted by
    * their in-language frequency share. A document scores against
    * each profile as the weight-sum of its bigram occurrences
    * (normalized by its bigram count); prediction = argmax with a
    * deterministic lang tiebreak. The profile table is tiny
    * (langs × ProfileSize) and broadcast; the per-doc work is one
    * explode + one join + one argmax window. */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    textLangidOn(Tables.documents(spark, dir))

  def textLangidOn(labeled: DataFrame): DataFrame = {
    val docs = labeled.select(col("doc_id"), col("lang"), col("text"))
    val grams = docs
      .select(col("doc_id"), col("lang"), explode(charBigrams(col("text"))).as("bg"))
    val profiles = {
      // learn on an 80% id-HASH split (hash first: a raw doc_id modulo
      // is correlated with any id-ordered corpus generation, e.g.
      // planted near-dup pairs at adjacent ids) — predictions for
      // held-out docs never see their own label, so accuracy is honest
      val train = grams.filter(pmod(xxhash64(col("doc_id")), lit(5)) < 4)
      val counts = train.groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("n"))
      val totals = Window.partitionBy(col("lang"))
      val ranked = counts
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bg"))))
        .withColumn("lang_total", sum(col("n")).over(totals))
        .filter(col("rk") <= ProfileSize)
      ranked.select(col("lang").as("profile_lang"), col("bg"),
        (col("n").cast("double") / col("lang_total").cast("double")).as("weight"))
    }
    // |bigrams| = len-1 by construction — arithmetic, not a second
    // explode+aggregate pass over the gram table
    val docGramCount = docs.select(col("doc_id"),
      when(length(col("text")) >= 2, length(col("text")) - 1)
        .otherwise(0).cast("long").as("n_grams"))
    val scored = grams.join(broadcast(profiles), "bg")
      .groupBy(col("doc_id"), col("profile_lang"))
      .agg(sum(col("weight")).as("raw"))
      .join(docGramCount, "doc_id")
      .select(col("doc_id"), col("profile_lang"),
        (col("raw") / col("n_grams").cast("double")).as("score"))
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("profile_lang"))
    scored
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("profile_lang").as("pred_lang"), col("score"))
  }

  /** Top terms kept per document by tf-idf. */
  val TfidfTopK = 5

  /** TF-IDF-style salient-term extraction: for each document, the
    * top-k terms by tf × idf where idf uses the BM25 rational form
    * (N - df + 0.5)/(df + 0.5) — deliberately LOG-FREE: ln() can
    * differ by 1 ulp between libm implementations, which would break
    * exact cross-engine comparison, while pure integer-derived
    * divisions are bit-identical everywhere.
    *
    * Shape at scale: one explode (corpus token count rows), one
    * (term) aggregate for document frequencies joined back on the
    * term, one (doc) window for the top-k — no O(n²), no driver-side
    * vocabulary. */
  def textTfidf(spark: SparkSession, dir: String): DataFrame =
    textTfidfOn(Tables.documents(spark, dir))

  def textTfidfOn(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    val nDocs = d.select(countDistinct(col("doc_id")).as("n_docs"))
    val terms = d.select(col("doc_id"),
        size(TH.words(col("text"))).as("doc_len"),
        explode(TH.words(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"), col("doc_len"))
      .agg(count(lit(1)).as("n_occ"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df_, "term").crossJoin(broadcast(nDocs))
      .withColumn("tf", col("n_occ").cast("double") / col("doc_len").cast("double"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= TfidfTopK)
      .select(col("doc_id"), col("rk"), col("term"), col("score"))
  }

  val textTfidfOracleSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS doc_len,
       |    unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, term, doc_len, COUNT(*) AS n_occ
       |  FROM terms GROUP BY 1, 2, 3),
       |df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    (CAST(tf.n_occ AS DOUBLE) / CAST(tf.doc_len AS DOUBLE)) *
       |    ((CAST(nd.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
       |     (CAST(df.df AS DOUBLE) + 0.5)) AS score
       |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN nd)
       |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, score FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, term) AS rk
       |  FROM scored) t
       |WHERE rk <= $TfidfTopK""".stripMargin

  /** Repetition-based quality filters (the Gopher/C4 family): the
    * fraction of duplicated words, the most-frequent-word share, and
    * the same two ratios over word bigrams. Heavily repeated text
    * (boilerplate, keyword stuffing, degenerate generations) scores
    * high and gets cut before pretraining.
    *
    * Shape at scale: two explodes (words, bigrams) each followed by a
    * two-level hash aggregate — map-side partial counts, shuffle
    * keyed on (doc_id, term), no window, no O(n²) in doc length.
    * All outputs are integer-count divisions: bit-identical across
    * engines with no decimal tricks. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    textRepetitionOn(Tables.documents(spark, dir))

  def textRepetitionOn(docs: DataFrame): DataFrame = {
    val w = TH.words(col("text"))
    val base = docs.select(col("doc_id"), w.as("w"))
    val wordStats = base
      .select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(
        sum(col("n")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
    // bigrams WITH multiplicity — TH.shingles dedups, so built inline
    val bgStats = base
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - lit(2)), i =>
          concat_ws(" ", element_at(col("w"), i + lit(1)),
            element_at(col("w"), i + lit(2))))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(
        sum(col("n")).as("n_bg"),
        count(lit(1)).as("n_distinct_bg"),
        max(col("n")).as("top_bg_n"))
    // left join: a 1-word doc has word stats but no bigrams (frac 0)
    wordStats.join(bgStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        ((col("n_words") - col("n_distinct")).cast("double") /
          col("n_words").cast("double")).as("dup_word_frac"),
        (col("top_n").cast("double") /
          col("n_words").cast("double")).as("top_word_frac"),
        coalesce((col("n_bg") - col("n_distinct_bg")).cast("double") /
          col("n_bg").cast("double"), lit(0.0)).as("dup_bigram_frac"),
        coalesce(col("top_bg_n").cast("double") /
          col("n_bg").cast("double"), lit(0.0)).as("top_bigram_frac"))
  }

  val textRepetitionOracleSql: String =
    """WITH ws AS (
      |  SELECT doc_id, SUM(n) AS n_words, COUNT(*) AS n_distinct,
      |    MAX(n) AS top_n
      |  FROM (
      |    SELECT doc_id, t, COUNT(*) AS n
      |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |          FROM documents)
      |    GROUP BY 1, 2)
      |  GROUP BY 1),
      |bs AS (
      |  SELECT doc_id, SUM(n) AS n_bg, COUNT(*) AS n_distinct_bg,
      |    MAX(n) AS top_bg_n
      |  FROM (
      |    SELECT doc_id, bg, COUNT(*) AS n
      |    FROM (
      |      SELECT doc_id, unnest(
      |        [w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bg
      |      FROM (SELECT doc_id, string_split(text, ' ') AS w
      |            FROM documents)
      |      WHERE len(w) >= 2)
      |    GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT ws.doc_id,
      |  CAST(ws.n_words - ws.n_distinct AS DOUBLE)
      |    / CAST(ws.n_words AS DOUBLE) AS dup_word_frac,
      |  CAST(ws.top_n AS DOUBLE)
      |    / CAST(ws.n_words AS DOUBLE) AS top_word_frac,
      |  COALESCE(CAST(bs.n_bg - bs.n_distinct_bg AS DOUBLE)
      |    / CAST(bs.n_bg AS DOUBLE), 0.0) AS dup_bigram_frac,
      |  COALESCE(CAST(bs.top_bg_n AS DOUBLE)
      |    / CAST(bs.n_bg AS DOUBLE), 0.0) AS top_bigram_frac
      |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id""".stripMargin

  /** Email pattern for PII scrubbing — POSIX classes only, so the
    * Java (Spark) and RE2 (DuckDB oracle) dialects match exactly. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  /** URL pattern (scheme to first whitespace). */
  val UrlPattern = "https?://[^ ]+"
  /** Long digit runs (phone/account/card-shaped identifiers). */
  val DigitRunPattern = "[0-9][0-9][0-9][0-9][0-9][0-9]+"

  /** PII scrubbing: replace emails, URLs, and 6+-digit runs with
    * typed redaction tokens, reporting per-document hit counts — the
    * redaction pass a training-data pipeline runs before releasing a
    * corpus. Order matters and is part of the contract: URLs first
    * (an email-shaped substring inside a URL is a URL), then emails,
    * then digit runs. Pure per-row projection — scan-bound,
    * shuffle-free, codegen'd; patterns avoid `{m,n}` bounds and
    * backslash classes so the Java and RE2 regex dialects agree. */
  def textPiiScrub(spark: SparkSession, dir: String): DataFrame =
    textPiiScrubOn(Tables.documents(spark, dir))

  def textPiiScrubOn(docs: DataFrame): DataFrame = {
    val afterUrl = regexp_replace(col("text"), UrlPattern, "<URL>")
    val afterEmail = regexp_replace(afterUrl, EmailPattern, "<EMAIL>")
    val scrubbed = regexp_replace(afterEmail, DigitRunPattern, "<NUM>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(UrlPattern), lit(0))).as("n_urls"),
      size(regexp_extract_all(afterUrl, lit(EmailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(DigitRunPattern), lit(0))).as("n_digit_runs"),
      scrubbed.as("scrubbed_text"))
  }

  val textPiiScrubOracleSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$UrlPattern')) AS INTEGER) AS n_urls,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(text, '$UrlPattern', '<URL>', 'g'),
       |    '$EmailPattern')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(regexp_replace(text, '$UrlPattern', '<URL>', 'g'),
       |      '$EmailPattern', '<EMAIL>', 'g'),
       |    '$DigitRunPattern')) AS INTEGER) AS n_digit_runs,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$UrlPattern', '<URL>', 'g'),
       |    '$EmailPattern', '<EMAIL>', 'g'),
       |    '$DigitRunPattern', '<NUM>', 'g') AS scrubbed_text
       |FROM documents""".stripMargin

  /** Content fingerprints through the native codegen expressions:
    * whole-document polynomial hash + winnowing-style minimum rolling
    * hash over 32-byte windows (near-identical docs collide on the
    * latter with high probability). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    textFingerprintOn(Tables.documents(spark, dir))

  def textFingerprintOn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      call_function("poly_hash64", col("text")).as("fp64"),
      call_function("rolling_min_hash", col("text"), lit(32)).as("winnow_fp"))

  /** Vocabulary size cap for [[textVocab]]. */
  val VocabTopK = 200

  /** Corpus vocabulary: the `topK` most frequent terms with occurrence
    * and document frequencies — the input a tokenizer-training /
    * vocab-coverage step reads off a corpus. Ties are broken by term
    * (ascending) so the cut is deterministic and engine-independent.
    *
    * Plan shape: explode + two-phase hash aggregate (map-side partial
    * counts make the shuffle vocabulary-sized, not token-sized —
    * `approx` nothing, the counts are exact), then a single-partition
    * TopK on the vocabulary-cardinality aggregate, which is the only
    * correct global cut and is tiny by construction (vocabularies are
    * millions of terms at 100 TB corpus scale, not corpus-sized).
    * `n_docs` counts each term once per document via the DISTINCT
    * aggregate over (term, doc_id) — same exploded scan, no second
    * pass over text. */
  def textVocabOn(docs: DataFrame, topK: Int = VocabTopK): DataFrame =
    docs
      .select(col("doc_id"), explode(TH.words(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(topK)

  /** Driver query over `documents` (key `text_vocab`). */
  def textVocab(spark: SparkSession, dir: String): DataFrame =
    textVocabOn(Tables.documents(spark, dir))

  val textVocabOracleSql: String =
    s"""SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |      FROM documents)
       |GROUP BY term
       |ORDER BY n_occurrences DESC, term
       |LIMIT $VocabTopK""".stripMargin
}
