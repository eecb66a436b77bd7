package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row is matched to the most recent right
  * row with `right.time <= left.time` for the same key (the time-series
  * enrichment join the reference's KV model has no answer to; SURVEY §2.4
  * notes the reference has no joins at all).
  *
  * Scale design — this is deliberately NOT a join operator underneath:
  * a naive formulation (`l JOIN r ON key AND r.t <= l.t` + windowed pick)
  * builds an O(|L|·|R| per key) intermediate. Instead both sides are
  * union-tagged and processed as ONE time-ordered stream per key:
  *
  *   union → repartition by key (single shuffle) → in-partition sort by
  *   (time, side, tie) → carry the latest right payload forward with
  *   `last(_, ignoreNulls) rows between unbounded preceding and current` →
  *   keep left rows.
  *
  * Cost is one shuffle + one sort of |L|+|R| rows — no pair fan-out, memory
  * O(1) per key in the window frame. Skew bound = rows per key (same bound a
  * sort-merge join would have), salting applies if one key dominates.
  */
object AsofJoin {

  /** @param key          equi-join key columns (present on both sides)
    * @param timeCol      event-time column (present on both sides, same type;
    *                     right.time <= left.time matches, equality inclusive)
    * @param tieCol       unique-per-row column ordering rows with equal
    *                     (time, side) deterministically (e.g. an event id)
    * @param rightPayload right columns to deliver; arrive as one nullable
    *                     struct column `_asof` (null = no match yet)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      timeCol: String,
      tieCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val rStruct = struct(rightPayload.map(col): _*)
    // Right rows sort BEFORE left rows at equal time (side 0 < 1), so a
    // right row at exactly left.time is visible to that left row — the
    // inclusive `>=` of ASOF JOIN semantics.
    val r = right.select(
      (key :+ timeCol :+ tieCol).map(col) :+ lit(0).as("_side") :+ rStruct.as("_asof"): _*)
    val l = left.withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(timeCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
