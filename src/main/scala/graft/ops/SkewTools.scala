package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys (SURVEY §7.5 / the 100-TB
  * checklist: "skewed keys → salting or AQE skew-join").
  *
  * A plain `groupBy(key)` over a low-cardinality key (e.g. 5 event types in
  * 100 TB of events) funnels each key through ONE reducer task regardless of
  * `spark.sql.shuffle.partitions`. Spark's partial (map-side) aggregation
  * already bounds the damage for algebraic aggregates, but the merge of all
  * map outputs for a hot key still lands on one task; salting makes the
  * *reduce* side parallel too:
  *
  *   phase 1: groupBy(key, salt) — salt spreads each key over N tasks
  *   phase 2: groupBy(key)       — merges the N partials (N rows per key)
  *
  * Only algebraic aggregates compose this way; sum/count are provided.
  * The salt must be a deterministic function of the row (stable under task
  * retries) — pass e.g. `pmod(col("some_id"), N)`.
  */
object SkewTools {

  /** Two-phase salted sum+count. Returns (key, n, sum) with exact longs. */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      salt: Column,
      buckets: Int): DataFrame = {
    val phase1 = df
      .groupBy(key.as("k"), pmod(salt, lit(buckets)).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("psum"))
    phase1.groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("sum"))
  }
}
