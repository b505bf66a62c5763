package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys: two-phase salted aggregation.
  *
  * A single pathological key (one status value holding 90% of rows, one
  * parent folder with millions of children) concentrates a `groupBy` into
  * one reducer task. Salting splits each key into `saltBuckets` sub-keys for
  * a partial aggregate, then combines partials in a second, tiny aggregate.
  * AQE's skew handling covers JOINs automatically; aggregation skew still
  * benefits from explicit salting when a key dwarfs every partition target.
  *
  * Works for aggregates expressible as (partial, combine) pairs — counts and
  * sums here, which covers the engine's conditional-count surface (A1/A2).
  */
object Salt {

  /** `df.groupBy(key).agg(count(when(cond_i, 1)) …)` with salting:
    * `conds` maps output column name → the count condition (null = count(*)).
    */
  def saltedConditionalCounts(df: DataFrame, key: Column, keyName: String,
      conds: Map[String, Option[Column]], saltBuckets: Int = 16): DataFrame = {
    val partialAggs = conds.map { case (name, cond) =>
      count(cond.map(c => when(c, 1)).getOrElse(lit(1))).as(name)
    }.toSeq
    val combineAggs = conds.keys.map(n => sum(col(n)).as(n)).toSeq
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(key.as(keyName), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(keyName))
      .agg(combineAggs.head, combineAggs.tail: _*)
  }
}
