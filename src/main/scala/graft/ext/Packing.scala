package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines (SURVEY §7.6 extension):
  * assign documents to fixed cost-budget context windows — the step that
  * turns a cleaned corpus into training examples.
  *
  * Semantics: BUDGET-QUANTIZED packing. Within each pack bucket, documents
  * are taken in a deterministic order and document d goes to window
  * `floor(cost-before-d / budget)` — i.e. windows are consecutive runs of
  * the ordered docs, each window closing once its running cost reaches the
  * budget. A window can exceed the budget by at most one document's cost
  * (the overflow doc CLOSES the window it lands in; the classic greedy
  * first-fit-in-order shape, with truncation/padding left to the consumer).
  *
  * Why quantized instead of exact first-fit: the assignment is a plain
  * prefix-sum — one shuffle on the bucket, one within-bucket ordered pass,
  * no sequential driver loop — and is replayable in SQL, so the pack is
  * auditable and reproducible like everything else in the pipeline. Bucket
  * choice sets the parallelism: contiguous id ranges (`doc_id div K`) give
  * uniform buckets with deterministic content at any scale.
  */
object Packing {

  /** Per-doc window assignment: adds `pack_bucket` and `window_idx`.
    * `cum div budget` runs in exact integer arithmetic (no double rounding
    * however large a bucket's total cost grows).
    */
  def packWindows(df: DataFrame, bucket: Column, order: Column,
      cost: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    df.withColumn("pack_bucket", bucket.cast("long"))
      .withColumn("_cum", coalesce(sum(cost).over(
        Window.partitionBy(col("pack_bucket")).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("window_idx", expr(s"_cum div ${budget}L"))
      .drop("_cum")
  }

  /** Window-level audit view: docs, cost, and fill per packed window. */
  def windowStats(packed: DataFrame, cost: Column, budget: Long): DataFrame =
    packed.groupBy(col("pack_bucket"), col("window_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(cost).cast("long").as("window_cost"))
      .withColumn("fill_pct", expr(s"window_cost * 100 div ${budget}L"))

  /** Row type of the first-fit pass (public: Dataset encoders generate
    * accessor code that cannot touch a private class).
    */
  case class PackDoc(bucket: Long, order: Long, cost: Long)

  /** EXACT first-fit-in-order packing: a window NEVER exceeds the budget —
    * the document that would overflow STARTS the next window instead of
    * closing the current one (an oversized single document still gets its
    * own window). This is a running recurrence (window cost resets on
    * overflow), not a prefix sum, so no window function expresses it: the
    * operator shuffles once on the bucket and runs the greedy pass
    * sequentially per bucket via `flatMapGroups` — the bucket is both the
    * parallelism unit and the memory bound (one bucket's docs are
    * materialized for the in-order pass). Prefer [[packWindows]] when
    * bounded overflow is acceptable; this variant is for consumers that
    * truncate nothing.
    */
  def packFirstFit(df: DataFrame, bucket: Column, order: Column,
      cost: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(bucket.cast("long").as("bucket"), order.cast("long").as("order"),
        cost.cast("long").as("cost")).as[PackDoc]
      .groupByKey(_.bucket)
      .flatMapGroups { (b: Long, it: Iterator[PackDoc]) =>
        val docs = it.toArray.sortBy(_.order)
        var widx = 0L
        var wcost = 0L
        var first = true
        docs.iterator.map { d =>
          if (first) { wcost = d.cost; first = false }
          else if (wcost + d.cost > budget) { widx += 1; wcost = d.cost }
          else wcost += d.cost
          (b, d.order, d.cost, widx)
        }
      }
      .toDF("pack_bucket", "order", "cost", "window_idx")
  }
}
