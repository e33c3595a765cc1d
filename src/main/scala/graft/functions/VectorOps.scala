package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `array<float>` embedding columns using
  * higher-order built-ins (zip_with / aggregate) — codegen'd, no UDFs.
  *
  * Numeric-parity contract: every fold is a SEQUENTIAL left fold in
  * DOUBLE with a 0.0 init, i.e. ((0 + p1) + p2) + ... — the exact
  * operation order the DuckDB oracle replays (list_reduce over the
  * same index order), so dot products and norms are bit-identical
  * across engines and safe to compare, threshold, and rank on.
  */
object VectorOps {

  /** Cast a float vector to double elements (deterministic widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double vectors — dispatched to
    * the native `vec_dot` codegen expression (same fold order as the
    * higher-order formulation, compiled instead of interpreted; see
    * VectorExpressions). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Reference higher-order formulation (interpreted) — kept for spec
    * cross-validation of the native kernel. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm via the same fold. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity given precomputed norms (callers precompute
    * norms once per row instead of per pair). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
