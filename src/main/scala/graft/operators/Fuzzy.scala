package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Blocked fuzzy-match repair join (key `q_fuzzy_match`) — entity
  * resolution for dirty catalog strings: match each corrupted name
  * back to its canonical form by edit distance WITHOUT the all-pairs
  * cross join a naive `levenshtein(a, b) <= 1` theta-join plans.
  *
  * The corruption model under repair is single-character
  * SUBSTITUTION (the dominant dirty-data class for fixed-width codes
  * and OCR'd fields): the driver key corrupts each part name
  * deterministically — position `(p_partkey % length) + 1` replaced
  * with '#', a character no canonical name contains — then repairs it
  * against the distinct canonical vocabulary.
  *
  * Blocking (the PassJoin/Gravano partition-filter family): a
  * same-length pair at substitution distance ≤ 1 differs in at most
  * one position, so it agrees on the FIRST character or on the LAST
  * one (length ≥ 2). Two equi-joins — on (length, first char) and on
  * (length, last char) — therefore cover every candidate; the second
  * pass keeps only pairs whose first characters DIFFER, so a
  * mid-string substitution (both ends intact) meets exactly once and
  * no distinct pass is needed. Every candidate pair is then verified
  * with `levenshtein` and ranked per dirty row.
  *
  * Scale design: both passes are hash equi-joins on bounded block
  * keys — candidates are Σ block² over (length × alphabet) blocks,
  * never |dirty|×|canon|; a skewed name-length distribution shows up
  * in `dq_key_skew` terms and salts like any other hot join key. The
  * per-row rank window partitions on the high-cardinality row key.
  * Determinism: edit distance is the standard DP (engine-identical
  * integers); ties break on the candidate string.
  */
object Fuzzy {

  /** Candidate pairs at substitution distance ≤ `maxDist` between
    * `dirty` (cols `row_id`, `name`) and `canon` (col `name`), via
    * the two-pass (length, end-char) blocking — complete for
    * same-length substitution edits of length ≥ 2, plus a third
    * length-equality pass for 1-char strings (there a substitution
    * changes the first AND last character at once, so neither end-char
    * block meets the pair; the block is the 1-char vocabulary itself,
    * alphabet-bounded). */
  def substitutionCandidates(dirty: DataFrame, canon: DataFrame,
                             maxDist: Int = 1): DataFrame = {
    // the end-char blocking is complete ONLY for distance 1 (a pair
    // at substitution distance 2 can change both end chars and meet
    // no pass); the parameter exists to tighten, never to widen
    require(maxDist == 1,
      s"substitutionCandidates' blocking is complete only for maxDist=1, got $maxDist")
    val d = dirty.select(col("row_id"), col("name").as("dirty_name"),
      length(col("name")).as("len"),
      substring(col("name"), 1, 1).as("first"),
      expr("substring(name, length(name), 1)").as("last"))
    val c = canon.select(col("name").as("cand"),
      length(col("name")).as("len"),
      substring(col("name"), 1, 1).as("cfirst"),
      expr("substring(name, length(name), 1)").as("clast"))
    val byFirst = d.join(c.withColumnRenamed("cfirst", "first"), Seq("len", "first"))
      .select(col("row_id"), col("dirty_name"), col("cand"))
    val byLast = d.join(c.withColumnRenamed("clast", "last"), Seq("len", "last"))
      // first chars equal ⇒ the first pass already met this pair
      .where(substring(col("dirty_name"), 1, 1) =!= col("cfirst"))
      .select(col("row_id"), col("dirty_name"), col("cand"))
    // len=1: a substitution flips the only char, so first AND last
    // both differ — the end-char passes provably miss it. The length
    // block alone is the candidate set (≤ alphabet rows per side);
    // first-chars-equal pairs (identical strings) met in pass 1
    val len1 = d.where(col("len") === 1)
      .join(c.where(col("len") === 1).drop("clast"), Seq("len"))
      .where(col("first") =!= col("cfirst"))
      .select(col("row_id"), col("dirty_name"), col("cand"))
    byFirst.unionAll(byLast).unionAll(len1)
      .withColumn("distance", levenshtein(col("dirty_name"), col("cand")).cast("int"))
      .where(col("distance") <= maxDist)
  }

  /** Driver key: corrupt every part name (one deterministic '#'
    * substitution), repair against the distinct canonical names, and
    * report each row's best match with its candidate count. */
  def qFuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val dirty = part.select(col("p_partkey").as("row_id"),
      expr("""concat(
                substring(p_name, 1, cast(p_partkey % length(p_name) as int)),
                '#',
                substring(p_name, cast(p_partkey % length(p_name) as int) + 2))""")
        .as("name"))
    val canon = part.select(col("p_name").as("name")).distinct()
    val cands = substitutionCandidates(dirty, canon)
    // best match per dirty row: min distance, then lexicographic —
    // window partitioned on the high-cardinality row key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("row_id")).orderBy(col("distance"), col("cand"))
    cands
      .withColumn("rn", row_number().over(w))
      .withColumn("n_candidates", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("row_id"))))
      .where(col("rn") === 1)
      .select(col("row_id").as("p_partkey"), col("dirty_name"),
        col("cand").as("matched_name"), col("distance"), col("n_candidates"))
  }

  /** Candidate pairs at FULL Levenshtein distance ≤ 1 (substitution,
    * insertion, or deletion) via the FastSS deletion-neighborhood
    * join: each string's blocking keys are itself plus every
    * single-char deletion; two strings are within edit distance 1 iff
    * their key sets intersect (sub: both delete the edited position;
    * ins/del: the longer side's deletion hits the shorter string
    * itself). Complete with NO length-band unions or end-char guards.
    *
    * Scale shape: the explode factor is `len + 1` keys per string —
    * linear in string length, the standard trade for full edit-class
    * coverage (the substitution-only [[substitutionCandidates]] emits
    * 2 keys/row when the corruption class is known). A pair can meet
    * on several shared keys, so candidates dedupe (one distinct on
    * (row, cand)) before the levenshtein verify. */
  def editCandidates(dirty: DataFrame, canon: DataFrame,
                     maxDist: Int = 1): DataFrame = {
    // the single-deletion neighborhood intersects iff distance <= 1;
    // wider radii need k-deletion neighborhoods this join doesn't build
    require(maxDist == 1,
      s"editCandidates' deletion-neighborhood blocking is complete only for maxDist=1, got $maxDist")
    val neighborhood = explode(array_distinct(concat(array(col("name")),
      expr("""transform(sequence(1, length(name)), i ->
                concat(substring(name, 1, i - 1), substring(name, i + 1)))"""))))
    val dk = dirty.select(col("row_id"), col("name").as("dirty_name"),
      neighborhood.as("bk"))
    val ck = canon.select(col("name").as("cand"), neighborhood.as("bk"))
    dk.join(ck, "bk")
      .select(col("row_id"), col("dirty_name"), col("cand"))
      .distinct()
      .withColumn("distance", levenshtein(col("dirty_name"), col("cand")).cast("int"))
      .where(col("distance") <= maxDist)
  }

  /** Driver key `q_fuzzy_edit1`: like [[qFuzzyMatch]] but the
    * corruption class rotates by key — substitute '#' / delete a char
    * / insert '#' — and the repair runs the full edit-distance-1
    * neighborhood join, which the substitution blocking provably
    * misses for the ins/del thirds. */
  def qFuzzyEdit1(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    // pos in [1, len] from the key; op = key mod 3
    val dirty = part.select(col("p_partkey").as("row_id"),
      expr("""CASE p_partkey % 3
                WHEN 0 THEN concat(
                  substring(p_name, 1, cast(p_partkey % length(p_name) as int)),
                  '#',
                  substring(p_name, cast(p_partkey % length(p_name) as int) + 2))
                WHEN 1 THEN concat(
                  substring(p_name, 1, cast(p_partkey % length(p_name) as int)),
                  substring(p_name, cast(p_partkey % length(p_name) as int) + 2))
                ELSE concat(
                  substring(p_name, 1, cast(p_partkey % length(p_name) as int)),
                  '#',
                  substring(p_name, cast(p_partkey % length(p_name) as int) + 1))
              END""").as("name"))
    val canon = part.select(col("p_name").as("name")).distinct()
    val cands = editCandidates(dirty, canon)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("row_id")).orderBy(col("distance"), col("cand"))
    cands
      .withColumn("rn", row_number().over(w))
      .withColumn("n_candidates", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("row_id"))))
      .where(col("rn") === 1)
      .select(col("row_id").as("p_partkey"), col("dirty_name"),
        col("cand").as("matched_name"), col("distance"), col("n_candidates"))
  }

  val qFuzzyEdit1OracleSql: String =
    """WITH dirty AS (
      |  SELECT p_partkey AS row_id,
      |    CASE p_partkey % 3
      |      WHEN 0 THEN substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
      |        || '#' || substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2)
      |      WHEN 1 THEN substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
      |        || substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2)
      |      ELSE substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
      |        || '#' || substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 1)
      |    END AS name
      |  FROM part
      |), canon AS (
      |  SELECT DISTINCT p_name AS name FROM part
      |), dk AS (
      |  SELECT row_id, name AS dirty_name,
      |    unnest(list_distinct(list_prepend(name,
      |      list_transform(generate_series(1, length(name)), i ->
      |        substr(name, 1, i - 1) || substr(name, i + 1))))) AS bk
      |  FROM dirty
      |), ck AS (
      |  SELECT name AS cand,
      |    unnest(list_distinct(list_prepend(name,
      |      list_transform(generate_series(1, length(name)), i ->
      |        substr(name, 1, i - 1) || substr(name, i + 1))))) AS bk
      |  FROM canon
      |), cands AS (
      |  SELECT DISTINCT d.row_id, d.dirty_name, c.cand
      |  FROM dk d JOIN ck c ON d.bk = c.bk
      |), verified AS (
      |  SELECT row_id, dirty_name, cand,
      |    CAST(levenshtein(dirty_name, cand) AS INTEGER) AS distance
      |  FROM cands
      |  WHERE levenshtein(dirty_name, cand) <= 1
      |), ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY row_id ORDER BY distance, cand) AS rn,
      |    COUNT(*) OVER (PARTITION BY row_id) AS n_candidates
      |  FROM verified
      |)
      |SELECT row_id AS p_partkey, dirty_name, cand AS matched_name,
      |  distance, n_candidates
      |FROM ranked WHERE rn = 1""".stripMargin

  val qFuzzyMatchOracleSql: String =
    """WITH dirty AS (
      |  SELECT p_partkey AS row_id,
      |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER))
      |      || '#' ||
      |    substr(p_name, CAST(p_partkey % length(p_name) AS INTEGER) + 2) AS name
      |  FROM part
      |), canon AS (
      |  SELECT DISTINCT p_name AS name FROM part
      |), cands AS (
      |  SELECT d.row_id, d.name AS dirty_name, c.name AS cand
      |  FROM dirty d JOIN canon c
      |    ON length(d.name) = length(c.name)
      |   AND substr(d.name, 1, 1) = substr(c.name, 1, 1)
      |  UNION ALL
      |  SELECT d.row_id, d.name, c.name
      |  FROM dirty d JOIN canon c
      |    ON length(d.name) = length(c.name)
      |   AND substr(d.name, length(d.name), 1) = substr(c.name, length(c.name), 1)
      |  WHERE substr(d.name, 1, 1) <> substr(c.name, 1, 1)
      |  UNION ALL
      |  SELECT d.row_id, d.name, c.name
      |  FROM dirty d JOIN canon c
      |    ON length(d.name) = 1 AND length(c.name) = 1
      |  WHERE substr(d.name, 1, 1) <> substr(c.name, 1, 1)
      |), verified AS (
      |  SELECT row_id, dirty_name, cand,
      |    CAST(levenshtein(dirty_name, cand) AS INTEGER) AS distance
      |  FROM cands
      |  WHERE levenshtein(dirty_name, cand) <= 1
      |), ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY row_id ORDER BY distance, cand) AS rn,
      |    COUNT(*) OVER (PARTITION BY row_id) AS n_candidates
      |  FROM verified
      |)
      |SELECT row_id AS p_partkey, dirty_name, cand AS matched_name,
      |  distance, n_candidates
      |FROM ranked WHERE rn = 1""".stripMargin
}
