package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is hot (one station
  * drowning the others, one document cluster, one user): salt the fact side
  * into `saltFactor` sub-keys and replicate the dimension side across all
  * salts, so a hot key spreads over `saltFactor` tasks instead of one.
  *
  * Result-identical to the plain equi-join (every fact row still meets every
  * matching dim row exactly once) — asserted in LakeLayoutSpec. AQE's
  * skew-join handles sort-merge spills adaptively; explicit salting is the
  * deterministic-plan alternative and the only option for broadcast-poisoned
  * aggregations.
  */
object Skew {

  def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltFactor: Int = 8): DataFrame = {
    // any per-row deterministic spread works; id-derived beats rand() for
    // replayability
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key — caps any single task's group size. For
    * algebraic aggregates only (sum/count/min/max).
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: Column, saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
}
