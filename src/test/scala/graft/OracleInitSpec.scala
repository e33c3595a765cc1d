package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard against the circular-object-init oracle corruption class
  * (round 17): a `val` in [[graft.operators.Similarity]] that touches
  * a downstream object (`Pq`/`Quantize`/`Opq`) starts THAT object's
  * initialization while Similarity is still mid-init, and the
  * downstream oracle vals then bake Similarity's not-yet-assigned
  * constants as zeros — measured as `rk <= 0` probe cuts (empty
  * oracle results) and τ = 0 radius admissions (corpus-sized oracle
  * results). The failure is INIT-ORDER dependent, so this suite
  * forces the order that bit: touch Similarity first, then force
  * every oracle string and assert none baked a zero. */
class OracleInitSpec extends AnyFunSuite {

  test("oracle strings bake live constants — no circular-init zeros") {
    // force Similarity's init FIRST (the hazardous order: its init
    // must complete without pulling any downstream object in)
    assert(graft.operators.Similarity.FilteredNProbe > 0)
    assert(graft.operators.Similarity.RadiusTau > 0.0)
    // now force every other object via the full oracle map and scan
    // for the measured corruption signatures
    val adcZero = s"adist <= CAST('2.0' AS DOUBLE)" // 2(1-τ) with τ=0
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("rk <= 0"),
        s"$k baked a zero probe/top-k cut — circular-init regression")
      assert(!sql.contains("crk <= 0"),
        s"$k baked a zero rerank cut — circular-init regression")
      assert(!sql.contains(adcZero),
        s"$k baked a tau=0 ADC admission — circular-init regression")
      assert(!sql.contains("cosine >= CAST('0.0'"),
        s"$k baked a tau=0 radius verify — circular-init regression")
    }
    // and the constants the PQ/SQ8/OPQ oracles embed really are the
    // live ones (an end-to-end spot check of one baked string)
    assert(graft.operators.Pq.knnIvfPqFilteredOracleSql
      .contains(s"rk <= ${graft.operators.Similarity.FilteredNProbe}"))
    assert(graft.operators.Pq.knnIvfPqRadiusOracleSql
      .contains(s"CAST('${graft.operators.Similarity.RadiusTau}' AS DOUBLE)"))
  }
}
