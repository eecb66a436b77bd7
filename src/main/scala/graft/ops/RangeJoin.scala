package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval join: right rows whose time falls in
  * `[left.time - window, left.time]` for the same key.
  *
  * Scale design: a theta join (`ON key AND r.t BETWEEN l.t - w AND l.t`)
  * degenerates to per-key nested loops — at 100 TB a hot key melts one task.
  * Bucketizing time to `window`-width buckets turns it into an EQUI-join:
  * the right side is keyed by its own bucket; the left side probes exactly
  * two buckets (its own and the previous one — any interval of length
  * `window` overlaps at most two window-width buckets), then the exact
  * range predicate filters the bucket-coarse candidates. Candidate count is
  * bounded per (key, bucket) cell instead of per key, the join is
  * shuffle-hash/SMJ-plannable, and AQE skew-split applies to the bucketed
  * key like any other equi-join.
  */
object RangeJoin {

  /** @param key      equi-join key columns (both sides)
    * @param lTime    left event-time column name (long, e.g. epoch nanos)
    * @param rTime    right event-time column name (same unit as lTime)
    * @param window   interval length in the time columns' unit; matches are
    *                 `lTime - window <= rTime <= lTime` (both ends inclusive)
    * @param salt     skew escape hatch: when > 1, right rows additionally key
    *                 on `hash(rTime) pmod salt` and every left probe
    *                 replicates across all salt values — a hot (key, bucket)
    *                 cell spreads over `salt` tasks at the cost of `salt`×
    *                 left-side replication. Result is identical (law-tested);
    *                 leave at 1 unless a dominant key is known. (Right rows
    *                 sharing one exact timestamp share a salt — the residual
    *                 worst case needs a finer hash, e.g. over a unique id.)
    *
    * Column names of `left` and `right` must be disjoint apart from `key`.
    */
  def backwardWindowJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      lTime: String,
      rTime: String,
      window: Long,
      salt: Int = 1): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // Integer division: `/` on longs is DOUBLE division in Spark, and at
    // epoch-nanos magnitude (~2^60) doubles have >256ns ulps — a right row
    // near a bucket edge would land in the wrong bucket and silently miss.
    // DIV truncates toward zero; the correction term makes it FLOOR division
    // so pre-epoch (negative) times bucket correctly too.
    def bucketOf(t: String) =
      expr(s"$t DIV ${window}L - (CASE WHEN $t % ${window}L < 0 THEN 1 ELSE 0 END)")
    val probes0 = left.withColumn("_bucket",
      explode(array(bucketOf(lTime), bucketOf(lTime) - 1)))
    val indexed0 = right.withColumn("_bucket", bucketOf(rTime))
    val (probes, indexed, joinCols) =
      if (salt == 1) (probes0, indexed0, key :+ "_bucket")
      else (
        probes0.withColumn("_salt",
          explode(array((0 until salt).map(lit): _*))),
        indexed0.withColumn("_salt", pmod(hash(col(rTime)), lit(salt))),
        key :+ "_bucket" :+ "_salt")
    probes.join(indexed, joinCols)
      .filter(col(rTime) <= col(lTime) && col(rTime) >= col(lTime) - window)
      .drop("_bucket", "_salt")
  }
}
