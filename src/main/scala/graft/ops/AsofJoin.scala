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
  * sort-merge join would have); [[asofBackwardSalted]] time-slices a
  * dominant key across tasks when one key holds a large share of the data.
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

  /** [[asofBackward]] with the SKEW ESCAPE HATCH: the time axis is cut into
    * `slices` equal ranges, the carry-forward window partitions by
    * (key, slice), and each slice is seeded with a virtual right row holding
    * the latest payload from all earlier slices — so a key owning most of
    * the data sorts on `slices` tasks instead of one.
    *
    * Mechanics (two cheap extra passes over the RIGHT side only):
    *  1. per (key, slice): the latest right payload inside the slice
    *     (`max_by` over (time, tie));
    *  2. per key over the tiny (key, slice) spine: carry that forward to
    *     get each slice's carry-IN, injected as a `_side = -1` row at the
    *     slice's start time (sorts before any real row of the slice).
    *
    * Same result as [[asofBackward]] for any input (law-tested); requires
    * integral (long) time and tie columns. Prefer the unsalted form unless a
    * dominant key is known — two extra shuffles of the right/spine relations
    * buy the per-key parallelism.
    */
  def asofBackwardSalted(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      timeCol: String,
      tieCol: String,
      rightPayload: Seq[String],
      slices: Int): DataFrame = {
    require(slices > 1, s"slices must be > 1, got $slices (use asofBackward)")
    val keyCols = key.map(col)
    val rStruct = struct(rightPayload.map(col): _*)
    // Global time range: one bounded agg (two longs to the driver).
    val range = left.select(col(timeCol)).unionByName(right.select(col(timeCol)))
      .agg(min(col(timeCol)), max(col(timeCol))).collect()(0)
    if (range.isNullAt(0)) // both sides empty of times → nothing to slice
      return asofBackward(left, right, key, timeCol, tieCol, rightPayload)
    val lo = range.getLong(0)
    val width = math.max(1L, (range.getLong(1) - lo) / slices + 1)
    // t >= lo, so truncating DIV == floor division here.
    def sliceOf(df: DataFrame) =
      df.withColumn("_slice", expr(s"($timeCol - ${lo}L) DIV ${width}L"))
    val lS = sliceOf(left.withColumn("_side", lit(1)))
    val rS = sliceOf(right.select(
      (key :+ timeCol :+ tieCol).map(col) :+ lit(0).as("_side") :+ rStruct.as("_asof"): _*))
    // 1. latest right payload per (key, slice) — the hot key spreads over
    //    `slices` groups here, so no single task owns it.
    val lastPerSlice = rS.groupBy(keyCols :+ col("_slice"): _*)
      .agg(max_by(col("_asof"), struct(col(timeCol), col(tieCol))).as("_last"))
    // 2. carry-in per slice over the (key, slice) spine — slices that only
    //    have left rows still need their carry-in row.
    val spine = lS.select(keyCols :+ col("_slice"): _*)
      .union(rS.select(keyCols :+ col("_slice"): _*)).distinct()
    val wSpine = Window.partitionBy(keyCols: _*).orderBy(col("_slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = spine
      .join(lastPerSlice, key :+ "_slice", "left")
      .withColumn("_asof", last(col("_last"), ignoreNulls = true).over(wSpine))
      .filter(col("_asof").isNotNull)
      .select(keyCols ++ Seq(
        (col("_slice") * width + lo).as(timeCol),
        lit(Long.MinValue).as(tieCol),
        lit(-1).as("_side"),
        col("_asof"),
        col("_slice")): _*)
    val unioned = lS
      .unionByName(rS, allowMissingColumns = true)
      .unionByName(carryIn, allowMissingColumns = true)
    // The window now partitions by (key, slice): the virtual -1 row sorts
    // first in its slice (slice-start time, smallest side), seeding the
    // carry exactly where the previous slice left off.
    val w = Window.partitionBy(keyCols :+ col("_slice"): _*)
      .orderBy(col(timeCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_slice")
  }
}
