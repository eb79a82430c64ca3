package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shim

/** Column wrappers for Spark's OWN Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind Catalyst's runtime row-level filtering / `InjectRuntimeFilter`).
  * Spark keeps them out of the public `FunctionRegistry`, so the same
  * `Shim` bridge the geo expressions use exposes them as `Column`s —
  * no re-implementation, no UDF, and `might_contain` stays codegen'd
  * in the scan-side filter where it runs.
  *
  * Contract (mirrors Spark's internal use): values on BOTH sides are
  * pre-hashed to a long with `xxhash64`, the aggregate's input type.
  */
object SketchFunctions {

  /** Aggregate a column of xxhash64 longs into a serialized Bloom filter
    * (one binary row). `estItems`/`numBits` size it exactly like
    * `BloomFilter.create(expectedItems, numBits)`.
    */
  def bloom_agg(hashed: Column, estItems: Long, numBits: Long): Column =
    Shim.column(
      new BloomFilterAggregate(
        Shim.expression(hashed),
        Literal(estItems),
        Literal(numBits)).toAggregateExpression())

  /** True when the serialized filter (a foldable binary — e.g.
    * `lit(bytes)` of a collected [[bloom_agg]] row) might contain the
    * xxhash64 long; false is definite absence (no false negatives).
    */
  def might_contain(bloom: Column, hashed: Column): Column =
    Shim.column(
      BloomFilterMightContain(Shim.expression(bloom), Shim.expression(hashed)))
}
