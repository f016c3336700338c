package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's OWN bloom-filter expressions, surfaced as graft functions.
  *
  * Catalyst ships `BloomFilterAggregate` / `BloomFilterMightContain` for its
  * runtime-filter rewrite (InjectRuntimeFilter) but does not register them
  * in the public function registry — the sketch machinery exists, codegen'd
  * and mergeable (TypedImperativeAggregate over `org.apache.spark.util
  * .sketch.BloomFilter`), with no public door. Registering the existing
  * expressions is strictly better than reimplementing the sketch: same
  * serialization, same merge semantics, zero new runtime code.
  *
  *  - `bloom_filter_build(xxhash64(key), estItems, numBits)` → one BINARY
  *    sketch value (partial sketches merge associatively, so the build is
  *    one map-side-combined aggregation);
  *  - `bloom_might_contain(sketch, xxhash64(key))` → false means the key is
  *    DEFINITELY absent; true means present-or-false-positive.
  *
  * The no-false-negative direction is the load-bearing contract: a
  * prefilter may only ever bypass work for keys the exact operator would
  * also have passed ([[graft.streaming.IngestGate.admitNovel]]'s bloom
  * fast-path). xxhash64 is engine-specific, so bloom-assisted paths are
  * spec-checked by RESULT EQUALITY against their exact twins rather than
  * DuckDB-replayed — the sketch is an optimization artifact, never a
  * semantic one.
  */
object BloomFns {

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (new FunctionIdentifier("bloom_filter_build"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_build"),
        (cs: Seq[Expression]) => new BloomFilterAggregate(cs(0), cs(1), cs(2))),
      (new FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_might_contain"),
        (cs: Seq[Expression]) => BloomFilterMightContain(cs(0), cs(1))))
}
