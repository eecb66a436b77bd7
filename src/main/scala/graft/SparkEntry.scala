package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY §2 (or a §7.6 extension),
  * with an equivalent DuckDB SQL twin in `oracleSql` over the same parquet
  * tables. Column names are aliased identically on both sides — the driver
  * sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's export pipeline (scan → CF filter → A1/A2 pivot →
    * schema projection) over the events-as-KV table.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.kvPivotEvents(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
