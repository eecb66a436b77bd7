package graft.functions

import org.apache.spark.sql.Column

/** Shared exact-integer column arithmetic. */
object IntMath {

  /** Exact integer floor-division for non-negative operands (DuckDB `//`,
    * SQL `DIV`): `(a - a % b) / b` is exactly divisible, so the intermediate
    * double is exact for any quotient < 2^52. Used everywhere a ratio must
    * hash-match the oracle — never floating division for scores.
    */
  def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")
}
