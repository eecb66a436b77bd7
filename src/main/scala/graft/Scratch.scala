package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway experiments; not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // max_by with null ordering: rows with null ordering must be ignored.
    val df = Seq(
      ("a", "click", "v1", 1L), ("a", "click", "v2", 5L),
      ("a", "view", "x9", 9L), ("b", "view", "y1", 2L)
    ).toDF("k", "q", "v", "ts")
    val got = df.groupBy($"k").agg(
      max_by($"v", when($"q" === "click", $"ts")).as("click"),
      max_by($"v", when($"q" === "view", $"ts")).as("view"),
      max_by($"v", when($"q" === "nope", $"ts")).as("nope"))
    got.orderBy($"k").show()

    // pivot e2e on generated cells
    val cells = graft.kv.KvGenerator.cells(spark, 100, 4, "run1")
    cells.show(12, truncate = false)
    val piv = graft.ops.KvPivot.pivot(cells, Seq("C1", "C3", "KEY"), rowKeyCol = Some("KEY"))
    graft.ops.KvPivot.projectDelimited(piv, Seq("C1", "C3", "KEY")).orderBy($"rowKey").show(8, truncate = false)
    println("dup rowKeys: " + cells.groupBy($"rowKey", $"qualifier").count().filter($"count" > 1).count())
    spark.stop()
  }
}
