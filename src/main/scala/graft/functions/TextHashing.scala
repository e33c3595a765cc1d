package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash families for text dedup, built entirely from codegen'd
  * built-in expressions (xxhash64 + higher-order array functions) —
  * no Scala UDFs anywhere in the hot path, so whole-stage codegen
  * stays unbroken and the expressions vectorize over 100 TB the same
  * way they do over a test table.
  *
  * Shapes follow the standard near-dup literature (MinHash banding:
  * Broder; SimHash: Charikar) as used in large-scale LLM corpus
  * dedup pipelines.
  */
object TextHashing {

  /** Whitespace-tokenized words of a text column. */
  def words(text: Column): Column = split(text, " ")

  /** Canonical text for normalized comparisons: lowercase, trimmed,
    * whitespace collapsed to single spaces. */
  def canonicalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Distinct word n-gram shingles. Caller must filter size(words) >= n
    * first — Spark's sequence() generates DESCENDING ranges when
    * start > stop, which would fabricate shingles for short docs. */
  def shingles(w: Column, n: Int = 3): Column =
    array_distinct(transform(sequence(lit(0), size(w) - lit(n)), i =>
      concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k + 1))): _*)))

  // Hashed shingle production lives in the native `hashed_word_ngrams`
  // expression (functions/WordNgrams.scala) — a composed
  // transform+concat_ws+hash chain here would evaluate interpreted
  // inside the lambda (no codegen, split re-derived per element) and
  // was the dominant cost of the dedup tier before round 5.
  // MinHash signatures are produced by the custom minhash_sketch
  // aggregate (functions/MinHashSketch.scala): one base hash per
  // shingle + k derived mult-add permutations into a primitive
  // long[k] buffer. (A nested-lambda formulation
  // `transform(perms, i -> array_min(transform(shingles, ...)))` is
  // pathological: ProjectCollapse inlines the shingle construction
  // into every permutation lambda — O(k × build) per row.)

  /** LSH band hashes for a minhash signature attribute: `bands`
    * hashes, each over a disjoint slice of `rowsPerBand` signature
    * values (two docs collide in band b iff their signatures agree on
    * the whole slice). Hash input includes the band index so buckets
    * from different bands never alias. Pass an ATTRIBUTE (post-select
    * column), not a raw expression, to keep the signature built once. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))

  /** Per-bit +1/-1 balance aggregates for a 64-bit SimHash over an
    * EXPLODED (doc_id, token_hash) table — same rationale as
    * [[minhashAggs]]: one hash per token, 64 cheap shift-mask sums,
    * all partial-aggregated map-side. Token multiplicity = weight. */
  def simhashBitAggs(tokenHash: Column): Seq[Column] =
    (0 until 64).map { b =>
      sum(when(shiftright(tokenHash, b).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
        .otherwise(lit(-1L))).as(s"bit_$b")
    }

  /** Pack the 64 bit-balance aggregates into one long, MSB-first:
    * bit b of the simhash is 1 iff balance(b) >= 0. */
  def packSimhash: Column =
    (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      val b = 63 - i
      shiftleft(acc, 1) + when(col(s"bit_$b") >= 0, lit(1L)).otherwise(lit(0L))
    }

  /** The `i`-th 16-bit chunk of a 64-bit simhash (i in 0..3). By
    * pigeonhole, two hashes within Hamming distance 3 agree on at
    * least one chunk — exact-match joins on (chunk index, chunk value)
    * are a complete candidate generator for distance <= 3. */
  def simhashChunk(sh: Column, i: Int): Column =
    shiftright(sh, i * 16).bitwiseAND(lit(0xFFFFL))
}
