package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContainExpr

/** Bloom-filter semi-join reduction: probe-side rows that cannot possibly
  * join are dropped BEFORE the join's shuffle, using a compact sketch of
  * the build side's keys.
  *
  * When to reach for it at 100 TB: the build side is too big to broadcast
  * (so Catalyst plans a shuffle join and `broadcast()` is off the table)
  * but its KEY SET still fits a bloom filter — e.g. 10^9 keys at 1% fpp is
  * ~1.2 GB, at 3% ~0.8 GB, vs shuffling the full probe side. The probe
  * side's shuffle volume drops by (1 − selectivity − fpp): for a 5%-match
  * fact table that is ~19/20 of the exchange gone. Spark's own runtime
  * bloom pushdown (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * makes the same trade only when its size heuristics allow; this operator
  * is the explicit, always-on form with caller-controlled sizing.
  *
  * Build path: `df.stat.bloomFilter` is ONE distributed aggregation (each
  * partition folds its keys into a local sketch; sketches OR-merge on the
  * driver) — the key column itself is never collected. The merged filter
  * then rides to probe-side tasks inside the codegen'd
  * [[BloomMightContainExpr]] predicate. False positives pass through to
  * the exact join below, so results are hash-identical to the plain join.
  */
object BloomJoin {

  /** Inner equi-join of `fact` to `dim` on `factKey == dimKey`, with the
    * bloom pre-filter on the fact side.
    *
    * @param expectedItems sizing for the sketch — set to the build side's
    *                      expected DISTINCT key count at the target scale
    * @param fpp           false-positive rate: smaller ⇒ bigger sketch,
    *                      less leftover shuffle
    */
  def reduceJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact.filter(BloomMightContainExpr.mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
