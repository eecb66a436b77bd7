package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PolyHash, TextHash}

/** Deterministic sampling / corpus-mixing operators for training-data
  * pipelines (SURVEY §7.6 extension; the reference has no sampling — its
  * generator takes a fixed record count, PopulateTable.java:49-56).
  *
  * Every draw is a pure HASH of (salt, row key) — no RNG state — so samples
  * are reproducible run-to-run, stable under repartitioning/retries, and
  * auditable row-by-row: the properties a 100-TB corpus build needs
  * (re-running a failed stage must not change the sample, and "why is this
  * doc in the mix?" must have an answer). Rates are integer per-mille and
  * thresholds integer arithmetic, so a SQL oracle replays every decision
  * exactly.
  *
  * Scale notes: [[bernoulli]] and [[weightedMix]] are map-only over the
  * corpus (the mix's per-source thresholds come from one tiny pre-aggregate
  * that broadcasts); [[stratifiedCap]] shuffles once on the stratum and
  * sorts only within strata — for a pathologically hot stratum, pre-filter
  * with [[bernoulli]] at a safe over-sample rate first, then cap.
  */
object Sampling {

  /** Deterministic per-row draw in `[0, 2^31-1)`: poly-hash of the salted
    * key, then a QUADRATIC scrambler `(h² mod M)·48271 + h mod M`. The
    * scrambler is load-bearing: the poly hash alone is affine in the last
    * code point, so consecutive keys ("…41","…42") get adjacent draws and
    * whole id-blocks would pass/fail a rate threshold together. Squaring
    * breaks the affinity; everything stays exact 64-bit integer arithmetic
    * a SQL oracle replays verbatim. Distinct salts give independent
    * samples off the same keys.
    */
  def drawOf(key: Column, salt: String): Column =
    TextHash.sampleDraw(concat(lit(salt + "|"), key.cast("string")))

  /** Keep each row with probability `rateX1000`/1000, deterministically:
    * `draw < rate·Mod` in exact integer arithmetic. Map-only, no shuffle.
    */
  def bernoulli(df: DataFrame, keyCol: String, rateX1000: Long,
      salt: String = "bern"): DataFrame = {
    require(rateX1000 >= 0 && rateX1000 <= 1000, "rate is per-mille")
    df.filter(drawOf(col(keyCol), salt) * 1000 < rateX1000 * PolyHash.Mod)
  }

  /** At most `cap` rows per stratum, chosen uniformly-without-replacement
    * by hash rank (order by draw, key — the key tie-break makes the rank
    * total). Emits the rank as `rk` (1-based) so a consumer can take a
    * smaller prefix without resampling.
    */
  def stratifiedCap(df: DataFrame, stratumCol: String, keyCol: String,
      cap: Int, salt: String = "strat"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(drawOf(col(keyCol), salt), col(keyCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** Weighted corpus mix to a cost budget: source `s` keeps rows at rate
    * `min(1, budget·w_s / (ΣW · cost_s))` where `cost_s` is the source's
    * total of `costCol` — i.e. the sample's expected cost composition
    * follows the weights and its expected total cost is ≈ `budget` (exact
    * when no source saturates). Decisions are per-source integer THRESHOLDS
    * on the row draw (`t_s = min(Mod, Mod·budget·w_s ÷ (ΣW·cost_s))`), so
    * the whole mix is replayable. One tiny aggregate + broadcast join +
    * map-side filter; the corpus is never shuffled.
    *
    * The threshold product runs in DECIMAL(38,0) (128-bit, exact) before
    * the integral divide, so budgets up to ~10^18 cost units never
    * overflow.
    */
  /** Deterministic train/val/test split assignment: each row lands in a
    * split by its hash draw against cumulative per-mille thresholds — the
    * standard leakage-safe split for a training corpus (membership is a
    * pure function of the key, so re-runs, retries, and OTHER MACHINES
    * agree; adding documents later never moves an existing one across
    * splits). Map-only: a column, not a shuffle.
    */
  def datasetSplit(df: DataFrame, keyCol: String,
      trainX1000: Long, valX1000: Long, salt: String = "split"): DataFrame = {
    require(trainX1000 >= 0 && valX1000 >= 0 && trainX1000 + valX1000 <= 1000,
      "per-mille split fractions must fit in [0, 1000]")
    val draw = drawOf(col(keyCol), salt)
    df.withColumn("split",
      when(draw * 1000 < trainX1000 * PolyHash.Mod, lit("train"))
        .when(draw * 1000 < (trainX1000 + valX1000) * PolyHash.Mod, lit("val"))
        .otherwise(lit("test")))
  }

  /** EPOCH SHUFFLE: the deterministic global reorder a training run
    * applies each epoch. Every row gets a seeded hash draw (salt =
    * `epoch<N>`, so distinct epochs are independent permutations of the
    * SAME corpus), lands in `shard = draw mod nShards` (the output-file
    * unit a data loader consumes), and takes its within-shard position by
    * (draw, key) rank. Deliberately two-level: one hash exchange on shard
    * + a per-shard sort — the epoch-sharded shuffle shape, with NO global
    * single-point sort (a global row_number would serialize 100 TB through
    * one task; shards are the parallel unit and their count scales with
    * the cluster). Everything is a pure function of (key, epoch): re-runs,
    * retries, and other machines reproduce byte-identical shards, and a
    * resumed epoch continues from the same permutation (restart safety).
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int,
      nShards: Int = 16): DataFrame = {
    require(nShards > 0, "epochShuffle: nShards must be positive")
    val keyed = df
      .withColumn("draw", drawOf(col(keyCol), s"epoch$epoch"))
      .withColumn("shard", pmod(col("draw"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("draw"), col(keyCol))
    keyed.withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  def weightedMix(df: DataFrame, sourceCol: String, costCol: String,
      keyCol: String, weights: Map[String, Long], budget: Long,
      salt: String = "mix"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sumW = weights.values.sum
    require(sumW > 0, "weights must sum positive")
    val wDf = weights.toSeq.toDF(sourceCol, "_w")
    // LEFT join + raise_error: a source present in the data but absent
    // from the weights map must fail loudly — an inner join would silently
    // drop that whole source from the mix, the exact un-auditable outcome
    // this operator exists to prevent.
    val thresholds = df.groupBy(col(sourceCol))
      .agg(sum(col(costCol)).cast("long").as("_tok"))
      .join(wDf, Seq(sourceCol), "left")
      .select(col(sourceCol), when(col("_w").isNull,
          raise_error(concat(lit("weightedMix: no weight for source "), col(sourceCol))))
        .otherwise(least(lit(PolyHash.Mod),
          expr(s"CAST(${PolyHash.Mod} AS DECIMAL(38,0)) * ${budget}L * _w" +
            s" div (CAST($sumW AS DECIMAL(38,0)) * _tok)"))).as("_t"))
    df.join(broadcast(thresholds), sourceCol)
      .filter(drawOf(col(keyCol), salt) < col("_t"))
      .drop("_t")
  }
}
