package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** G1/G2: the reference's synthetic KV generator, deterministic.
  *
  * `PopulateTable.CustomMapper` (PopulateTable.java:102-138) spreads
  * `numberOfRecords` across `numberOfMappers` tasks; each iteration picks
  * `keyRoot = lpad(rand(0..32767), 5, '0')` (line 124), composes
  * `rowKey = keyRoot|runID|taskId` (line 131), and fans out 10 cells C0..C9
  * with values `"counter:" + counter++` (lines 130-134).
  *
  * Differences by design:
  *  - `new Random()` (line 114) → a deterministic multiplicative hash of the
  *    record id, so tests and the DuckDB oracle can regenerate byte-identical
  *    data. NOTE the hash is a bijection mod 2^15 (odd multiplier), so unlike
  *    `rand()` key-roots repeat only with period `KeySpace` = 32768 ids:
  *    duplicate rowKeys (whose cells merge last-write-wins, SURVEY §2.11)
  *    occur deterministically once a run exceeds KeySpace records — the
  *    `kv_pivot_presorted` query generates 40k records precisely to keep
  *    that merge path oracle-exercised.
  *  - parallelism: `NMapInputFormat`'s N synthetic splits (G2) become the
  *    partition count of `spark.range` — one narrow, shuffle-free stage.
  *  - `ts` is the global cell counter, making A2's "later cell wins"
  *    explicit and total-ordered instead of scan-order-implicit.
  */
object KvGenerator {

  /** Knuth's multiplicative constant — any fixed odd multiplier works; the
    * point is determinism + key collisions, matching rand(0..32767)'s range.
    */
  val KeyMixer = 2654435761L
  val KeySpace = 32768L

  def cells(
      spark: SparkSession,
      numberOfRecords: Long,
      numberOfTasks: Int,
      runId: String,
      family: String = "c",
      cellsPerRecord: Int = 10): DataFrame = {
    val records = spark.range(0L, numberOfRecords, 1L, numberOfTasks)
    records.select(
      lpad((((col("id") + 1) * KeyMixer) % KeySpace).cast(StringType), 5, "0").as("keyRoot"),
      (col("id") % numberOfTasks).cast(StringType).as("taskId"),
      col("id"))
      .select(
        concat_ws("|", col("keyRoot"), lit(runId), col("taskId")).as("rowKey"),
        lit(family).as("family"),
        explode(sequence(lit(0), lit(cellsPerRecord - 1))).as("cellIdx"),
        col("id"))
      .select(
        col("rowKey"),
        col("family"),
        concat(lit("C"), col("cellIdx")).as("qualifier"),
        encode(concat(lit("counter:"), col("id") * cellsPerRecord + col("cellIdx")), "UTF-8").as("value"),
        (col("id") * cellsPerRecord + col("cellIdx")).as("ts"))
  }
}
