package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.kv.{KvGenerator, RangeLayout}

/** The `graft-kv` DataSource V2 connector: correctness vs a plain parquet
  * read of the same region files, plus the pushdown surface the connector
  * OWNS — family/qualifier/rowKey predicates reported pushed, rowKey range
  * pruning whole region files at planning time, column pruning reaching the
  * reader.
  */
class KvSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_source_regions"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val cells = KvGenerator.cells(spark, 2000, 4, "run1")
    RangeLayout.layout(cells, 8).write.mode("overwrite").parquet(d)
    d
  }

  private def v2: DataFrame = spark.read.format("graft-kv").load(dir)
  private def pq: DataFrame = spark.read.parquet(dir)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => new String(b, "UTF-8")
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("full scan equals the plain parquet read, one partition per region file") {
    sortedRows(v2) shouldBe sortedRows(pq)
    v2.rdd.getNumPartitions shouldBe 8
  }

  test("family + qualifier predicates match the parquet read and are reported pushed") {
    val p = col("family") === "c" && col("qualifier") === "C3"
    sortedRows(v2.filter(p)) shouldBe sortedRows(pq.filter(p))
    val plan = v2.filter(p).queryExecution.executedPlan.toString
    plan should include("GraftKvScan")
    plan should include("pushed=[")
    plan should include("EqualTo(qualifier,C3)")
  }

  test("rowKey range prunes region files at planning time") {
    val lo = "00100"
    val hi = "00200"
    val ranged = v2.filter(col("rowKey") >= lo && col("rowKey") < hi)
    sortedRows(ranged) shouldBe sortedRows(pq.filter(col("rowKey") >= lo && col("rowKey") < hi))
    // the sorted 8-region layout puts a narrow key interval in 1-2 regions;
    // the pruned scan must schedule strictly fewer partitions than regions
    assert(ranged.rdd.getNumPartitions < 8,
      s"expected region pruning, got ${ranged.rdd.getNumPartitions} partitions")
    val plan = ranged.queryExecution.executedPlan.toString
    plan should include regex "regions=[1-7]/8"
  }

  test("column pruning reaches the scan output") {
    val slim = v2.select(col("rowKey"), col("ts"))
    sortedRows(slim) shouldBe sortedRows(pq.select(col("rowKey"), col("ts")))
    val scanLine = slim.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("GraftKvScan")).get
    scanLine should not include "qualifier"
  }

  test("filter-only columns are materialized for the reader but not emitted") {
    val p = col("qualifier") === "C1"
    val slim = v2.filter(p).select(col("rowKey"))
    sortedRows(slim) shouldBe sortedRows(pq.filter(p).select(col("rowKey")))
  }

  test("empty-result range yields zero partitions, not a full scan") {
    val none = v2.filter(col("rowKey") >= "99998" && col("rowKey") <= "99999zzz")
    none.count() shouldBe pq.filter(col("rowKey") >= "99998" && col("rowKey") <= "99999zzz").count()
  }
}
