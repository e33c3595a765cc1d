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

  /** Token-entropy ln-lookup bound: ln(k) is precomputed for
    * k ∈ [1, EntropyLnTableSize) and embedded in BOTH engines — the
    * HLL linear-counting precedent (ln() is not correctly-rounded in
    * either engine and disagrees by 1 ulp on some inputs, so a shared
    * literal table is the only bit-stable form). Documents with more
    * tokens than the table covers get a NULL entropy in both engines
    * (the honest out-of-contract signal) — chunk longer docs first
    * ([[graft.operators.TrainPrep]] text_chunk), exactly what a
    * training pipeline does anyway. */
  val EntropyLnTableSize = 2048

  private lazy val entropyLnTable: Array[Double] =
    Array.tabulate(EntropyLnTableSize)(k =>
      if (k == 0) 0.0 else java.lang.Math.log(k.toDouble))

  /** Per-document token ENTROPY (key `text_entropy`): the unigram
    * Shannon entropy of each document's token distribution in nats,
    * H = ln(T) − Σ c_w·ln(c_w) / T, plus the normalized form
    * H / ln(n_distinct) ∈ [0,1] (1 = perfectly even usage, → 0 =
    * one token dominates). This is the repetitiveness/diversity
    * quality signal the length/punctuation ratios of `text_quality`
    * and the n-gram repetition report (`text_repetition`) don't
    * capture: boilerplate and keyword-stuffed spam score low-entropy
    * even when their surface shape looks normal — a standard cut in
    * C4/Gopher-style curation stacks.
    *
    * Plan shape: one token explode → (doc, word) count aggregate →
    * doc-keyed aggregate; both aggregates partial-combine map-side
    * and share the doc-keyed exchange domain. ln values come from a
    * broadcast-in-plan literal array (`element_at`), so the whole
    * scoring pass stays codegen'd — no UDF, no per-row Math.log.
    * Decimal accumulation (scale 10) makes the Σ c·ln(c) term
    * order-independent; every other op is replicated exactly in the
    * oracle's lookup-join replay. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    textEntropyOn(Tables.documents(spark, dir))

  def textEntropyOn(docs: DataFrame): DataFrame = {
    val lnArr = array(entropyLnTable.map(lit): _*)
    // try_element_at, not element_at: ANSI mode throws on an
    // out-of-table index, but an over-long doc must read as a NULL
    // entropy (matching the oracle's left-join miss), not a job abort
    val counts = docs
      .select(col("doc_id"), explode(TH.words(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val perDoc = counts.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum((col("c").cast("double") *
          try_element_at(lnArr, (col("c") + 1).cast("int")))
        .cast("decimal(30,10)")).cast("double").as("clnc"))
    val entropy =
      try_element_at(lnArr, (col("n_tokens") + 1).cast("int")) -
        col("clnc") / col("n_tokens")
    // 4dp presentation (the embed_clusters precedent): the final
    // subtract/divide chain can land 1 ulp apart cross-engine
    // (measured on one sf0.01 doc); everything upstream is bit-stable
    perDoc.select(
      col("doc_id"), col("n_tokens"), col("n_distinct"),
      round(entropy, 4).as("entropy"),
      round(when(col("n_distinct") > 1,
          entropy / try_element_at(lnArr, (col("n_distinct") + 1).cast("int")))
        .otherwise(lit(0.0)), 4).as("entropy_ratio"))
  }

  /** The shared ln table as a DuckDB VALUES relation. The literals
    * are QUOTED STRINGS cast to DOUBLE: DuckDB routes bare decimal
    * literals through DECIMAL and converts int128×10^-s with a
    * double-rounding that lands 1 ulp off the correctly-rounded
    * value on some 17-digit literals (measured on the HLL
    * linear-counting table at sf0.1), while the VARCHAR→DOUBLE cast
    * is a correctly-rounded strtod — only the quoted form actually
    * parses back to the identical bits. */
  private def entropyLnValuesSql: String =
    (1 until EntropyLnTableSize)
      .map(k => s"($k,CAST('${entropyLnTable(k)}' AS DOUBLE))")
      .mkString(",")

  val textEntropyOracleSql: String =
    s"""WITH lnt(k, lnk) AS (VALUES ${entropyLnValuesSql}),
       |tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |cnt AS (
       |  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    COUNT(*) AS n_distinct,
       |    CAST(SUM(CAST(c * l.lnk AS DECIMAL(30,10))) AS DOUBLE) AS clnc
       |  FROM cnt LEFT JOIN lnt l ON cnt.c = l.k
       |  GROUP BY doc_id)
       |SELECT a.doc_id, a.n_tokens, a.n_distinct,
       |  round(lt.lnk - a.clnc / a.n_tokens, 4) AS entropy,
       |  round(CASE WHEN a.n_distinct > 1
       |    THEN (lt.lnk - a.clnc / a.n_tokens) / ld.lnk
       |    ELSE 0.0 END, 4) AS entropy_ratio
       |FROM agg a
       |LEFT JOIN lnt lt ON a.n_tokens = lt.k
       |LEFT JOIN lnt ld ON a.n_distinct = ld.k""".stripMargin

  /** Per-document quality score: length, punctuation ratio, stopword
    * ratio, distinct-token ratio, and a composite in [0,1]. All
    * ratios are divisions of integer counts — bit-identical across
    * engines with no decimal tricks needed. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    textQualityOn(Tables.documents(spark, dir))

  /** The composite quality score of [[textQualityOn]] as a standalone
    * column expression — shared with the top-fraction pruning key so
    * both compute the identical IEEE double. */
  def qualityScore(text: Column): Column = {
    val toks = TH.words(text)
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val lenScore = least(lit(1.0), nTok / lit(100.0))
    (nUniq / nTok) * (lit(1.0) - nStop / nTok) * lenScore
  }

  /** [[qualityScore]] replayed in DuckDB SQL over a `text` column —
    * the same parenthesization as textQualityOracleSql's score term. */
  def qualityScoreSqlExpr(text: String): String = {
    val stop = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""(CAST(len(list_distinct(string_split($text, ' '))) AS DOUBLE)
       |    / CAST(len(string_split($text, ' ')) AS DOUBLE))
       |  * (1.0 - CAST(len(list_filter(string_split($text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |    / CAST(len(string_split($text, ' ')) AS DOUBLE))
       |  * least(1.0, CAST(len(string_split($text, ' ')) AS DOUBLE) / 100.0)""".stripMargin
  }

  def textQualityOn(docs: DataFrame): DataFrame = {
    val toks = TH.words(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))).cast("double")
    val nChars = length(col("text")).cast("double")
    val score = qualityScore(col("text"))
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
      // carry the integer (count, total) instead of a pre-divided
      // double weight: the per-doc score sums COUNTS (exact longs,
      // order-independent) and divides once — a running double sum of
      // weights would make the low bits of `score` depend on partition
      // arrival order, i.e. a nondeterministic output column
      ranked.select(col("lang").as("profile_lang"), col("bg"),
        col("n"), col("lang_total"))
    }
    // |bigrams| = len-1 by construction — arithmetic, not a second
    // explode+aggregate pass over the gram table
    val docGramCount = docs.select(col("doc_id"),
      when(length(col("text")) >= 2, length(col("text")) - 1)
        .otherwise(0).cast("long").as("n_grams"))
    val scored = grams.join(broadcast(profiles), "bg")
      .groupBy(col("doc_id"), col("profile_lang"), col("lang_total"))
      .agg(sum(col("n")).as("sn"))
      .join(docGramCount, "doc_id")
      .select(col("doc_id"), col("profile_lang"),
        ((col("sn").cast("double") / col("lang_total").cast("double"))
          / col("n_grams").cast("double")).as("score"))
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("profile_lang"))
    scored
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("profile_lang").as("pred_lang"), col("score"))
  }

  /** Full DuckDB replay of language-ID — learning included. Every
    * stage is deterministic, so the "learned" operator is as
    * hash-checkable as any SQL query:
    *
    *  - train/holdout split: Spark's xxhash64(doc_id) % 5 — the XXH64
    *    single-long path (merge round + avalanche) replayed with the
    *    HUGEINT mod-2^64 machinery; rotations become
    *    shift-mod + disjoint-bits addition, multiplies split lo/hi
    *    32-bit halves (same technique as the minhash oracle).
    *  - char-bigram hashes: substr(text, i, 2) is character-based in
    *    DuckDB exactly like the native expression's UTF-8 boundary
    *    walk; each bigram gets the poly-fold + splitmix64 finisher.
    *  - profiles: count/rank/total windows — plain SQL; ties on the
    *    SIGNED hash value, hence the sign conversion before ranking.
    *  - scoring: integer count sums divided twice, matching the
    *    operator's order-independent (sum n)/lang_total/n_grams form.
    */
  val textLangidOracleSql: String = {
    import graft.functions.SqlReplay._
    val two64 = Two64
    // XXH64 primes (public constants of the xxHash spec)
    val p1 = u(-7046029288634856825L); val p2 = u(-4417276706812531889L)
    val p3 = u(1609587929392839161L);  val p4 = u(-8796714831421723037L)
    val init = u(42L + 2870177450012600261L /* P5 */ + 8L)
    s"""WITH d AS (
       |  SELECT doc_id, lang, text FROM documents
       |),
       |sp0 AS (SELECT doc_id, CAST('$init' AS UBIGINT) AS h,
       |        CAST(doc_id AS UBIGINT) AS l FROM d),
       |sp1 AS (SELECT doc_id, h, ${mulmod("l", p2)} AS k1 FROM sp0),
       |sp2 AS (SELECT doc_id, h, ${rotl("k1", 31)} AS k1 FROM sp1),
       |sp3 AS (SELECT doc_id, h, ${mulmod("k1", p1)} AS k1 FROM sp2),
       |sp4 AS (SELECT doc_id, xor(h, k1) AS h FROM sp3),
       |sp5 AS (SELECT doc_id, CAST((CAST(${mulmod(rotl("h", 27), p1)} AS HUGEINT)
       |        + $p4) % $two64 AS UBIGINT) AS h FROM sp4),
       |sp6 AS (SELECT doc_id, xor(h, h >> 33) AS h FROM sp5),
       |sp7 AS (SELECT doc_id, ${mulmod("h", p2)} AS h FROM sp6),
       |sp8 AS (SELECT doc_id, xor(h, h >> 29) AS h FROM sp7),
       |sp9 AS (SELECT doc_id, ${mulmod("h", p3)} AS h FROM sp8),
       |spA AS (SELECT doc_id, xor(h, h >> 32) AS h FROM sp9),
       |split AS (
       |  SELECT doc_id, ((${toSigned("h")} % 5) + 5) % 5 AS bucket FROM spA),
       |g0 AS (
       |  SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(text)-1),
       |    i -> substr(text, i, 2))) AS gs
       |  FROM d WHERE len(text) >= 2),
       |g1 AS (
       |  SELECT doc_id, lang, hex(encode(gs)) AS hx,
       |    octet_length(encode(gs)) AS n FROM g0),
       |g2 AS (
       |  SELECT doc_id, lang, ${polyFold(hexBytes("hx", "n"))} AS p
       |  FROM g1),
       |g3 AS (SELECT doc_id, lang, xor(p, p >> 30) AS z FROM g2),
       |g4 AS (SELECT doc_id, lang, ${mulmod("z", MixC1)} AS z FROM g3),
       |g5 AS (SELECT doc_id, lang, xor(z, z >> 27) AS z FROM g4),
       |g6 AS (SELECT doc_id, lang, ${mulmod("z", MixC2)} AS z FROM g5),
       |grams AS (
       |  SELECT doc_id, lang, ${toSigned("xor(z, z >> 31)")} AS bg FROM g6),
       |train AS (
       |  SELECT g.doc_id, g.lang, g.bg FROM grams g JOIN split s USING (doc_id)
       |  WHERE s.bucket < 4),
       |counts AS (
       |  SELECT lang, bg, COUNT(*) AS n FROM train GROUP BY lang, bg),
       |ranked AS (
       |  SELECT lang, bg, n,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bg) AS rk,
       |    SUM(n) OVER (PARTITION BY lang) AS lang_total
       |  FROM counts),
       |profiles AS (
       |  SELECT lang AS profile_lang, bg, n, lang_total
       |  FROM ranked WHERE rk <= $ProfileSize),
       |dg AS (
       |  SELECT doc_id, CAST(CASE WHEN len(text) >= 2 THEN len(text)-1 ELSE 0 END
       |    AS BIGINT) AS n_grams FROM d),
       |scored AS (
       |  SELECT g.doc_id, p.profile_lang,
       |    (CAST(SUM(p.n) AS DOUBLE) / CAST(p.lang_total AS DOUBLE))
       |      / CAST(dg.n_grams AS DOUBLE) AS score
       |  FROM grams g JOIN profiles p USING (bg) JOIN dg ON g.doc_id = dg.doc_id
       |  GROUP BY g.doc_id, p.profile_lang, p.lang_total, dg.n_grams)
       |SELECT doc_id, profile_lang AS pred_lang, score FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id ORDER BY score DESC, profile_lang) AS rk
       |  FROM scored) t
       |WHERE rk = 1""".stripMargin
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

  /** Byte-exact DuckDB replay of both native fingerprint expressions
    * (the same HUGEINT mod-2^64 technique as the multimodal feature
    * oracle): decode UTF-8 bytes from hex, fold the Karp–Rabin
    * polynomial (h·Base + byte, wrapping) in HUGEINT, and for the
    * winnow take the UNSIGNED minimum over every 32-byte window —
    * HUGEINT window hashes are non-negative, so plain list_min IS the
    * unsigned min; the final CASE maps [2^63, 2^64) back onto the
    * negative signed longs Spark emits. The brute per-window fold is
    * algebraically identical (mod 2^64) to the O(1) rolling update
    * the native expression uses. */
  val textFingerprintOracleSql: String = {
    import graft.functions.SqlReplay._
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n
       |  FROM documents
       |), by AS (
       |  SELECT doc_id, n,
       |    ${hexBytes("hx", "n")} AS bytes
       |  FROM b
       |), fp AS (
       |  SELECT doc_id, n, bytes,
       |    ${polyFold("bytes")} AS fp_u
       |  FROM by
       |), win AS (
       |  SELECT doc_id, fp_u,
       |    CASE WHEN n <= 32 THEN fp_u
       |    ELSE list_min(list_transform(generate_series(1, n - 31), i ->
       |      ${polyFold("list_slice(bytes, i, i + 31)")}))
       |    END AS win_u
       |  FROM fp
       |)
       |SELECT doc_id,
       |  ${toSigned("fp_u")} AS fp64,
       |  ${toSigned("win_u")} AS winnow_fp
       |FROM win""".stripMargin
  }

  /** Rarity fence for [[textLmScore]], in basis points of the corpus:
    * a term is RARE when its corpus count × 10000 < total tokens
    * (i.e. frequency below 0.01%). Integer comparison — no float
    * threshold to diverge across engines. */
  val RareBasisPoints = 10000L

  /** Rare-fraction cut for the keep flag: docs whose tokens are more
    * than half rare read as lexical noise (OCR garbage, hash soup). */
  val RareFracCut = 0.5

  /** Corpus-frequency language-model scoring — the log-free core of
    * the KenLM-style quality filter: score each document by how
    * "expected" its tokens are under the corpus's own unigram
    * distribution. Documents dominated by corpus-rare tokens (OCR
    * garbage, base64 soup, wrong-language fragments) score low and
    * get cut before pretraining; `avg_term_count` (mean corpus count
    * of the doc's tokens) is the monotone stand-in for unigram
    * log-likelihood, exact-integer until the final division so every
    * engine agrees bit-for-bit.
    *
    * Plan shape at 100 TB: one explode feeding a two-phase hash
    * aggregate (vocabulary-sized shuffle, same as [[textVocabOn]]),
    * the count table joined back to the exploded tokens ON TERM — the
    * join key is the vocabulary, so both sides hash-partition on a
    * bounded-cardinality key (no broadcast needed, no skew beyond the
    * Zipf head that AQE splits) — then one per-doc aggregate. The
    * scalar total rides a 1-row broadcast. */
  def textLmScoreOn(docs: DataFrame): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(TH.words(col("text"))).as("term"))
    val counts = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total_tokens"))
    terms.join(counts, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("c")).as("sum_term_count"),
        sum(when(col("c") * RareBasisPoints < col("total_tokens"), 1L)
          .otherwise(0L)).as("n_rare"))
      .withColumn("avg_term_count",
        col("sum_term_count").cast("double") / col("n_tokens").cast("double"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_tokens").cast("double"))
      .withColumn("keep", col("rare_frac") <= RareFracCut)
      .select("doc_id", "n_tokens", "avg_term_count", "rare_frac", "keep")
  }

  /** Driver query over `documents` (key `text_lm_score`). */
  def textLmScore(spark: SparkSession, dir: String): DataFrame =
    textLmScoreOn(Tables.documents(spark, dir))

  val textLmScoreOracleSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |counts AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM terms GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM counts)
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(c.c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_term_count,
       |  CAST(SUM(CASE WHEN c.c * $RareBasisPoints < tot.total_tokens
       |                THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS rare_frac,
       |  (CAST(SUM(CASE WHEN c.c * $RareBasisPoints < tot.total_tokens
       |                 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE)) <= $RareFracCut AS keep
       |FROM terms t JOIN counts c ON t.term = c.term CROSS JOIN tot
       |GROUP BY t.doc_id, tot.total_tokens""".stripMargin

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
