package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** SQL-callable wrappers over Spark's own runtime-filter bloom
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` —
  * the machinery behind `spark.sql.optimizer.runtime.bloomFilter`).
  *
  * Spark injects these automatically only under a narrow planner
  * heuristic (shuffle-join, selective build side it can SEE through
  * stats). Exposing them as functions lets an operator apply the same
  * semi-join reduction DELIBERATELY: aggregate the build side's
  * xxhash64 keys into a bloom (map-side partials, one binary blob
  * out), then filter the probe side BEFORE its shuffle. False
  * positives only pass extra rows to the exact join that follows, so
  * results are unchanged — only the shuffled bytes shrink.
  *
  *  - `graft_bloom_agg(xxhash64(k), estItems, numBits)` → BINARY
  *  - `graft_might_contain(bloomBinary, xxhash64(k))` → BOOLEAN
  */
object BloomFunctions {
  val bloomAgg: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
    (args: Seq[Expression]) =>
      new BloomFilterAggregate(args(0), args(1), args(2)).toAggregateExpression())

  val bloomMightContain: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
    (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1)))
}
