package graft

import org.apache.spark.sql.functions._

import graft.ext.Packing

/** Budget-quantized sequence packing (SURVEY §7.6 extension). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("packing invariants: ordered runs, bounded overflow, deterministic") {
    val budget = 1500L
    val packed = Packing.packWindows(docs, expr("doc_id div 50"),
      col("doc_id"), col("n_chars"), budget)
    val rows = packed.select("doc_id", "pack_bucket", "window_idx", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.length.toLong shouldBe docs.count() // total: every doc assigned once
    // window_idx is non-decreasing in doc order within a bucket (windows
    // are contiguous runs), starting at 0
    rows.groupBy(_._2).foreach { case (_, b) =>
      val inOrder = b.sortBy(_._1)
      inOrder.head._3 shouldBe 0L
      inOrder.map(_._3).sliding(2).foreach {
        case Array(x, y) => y should be >= x
        case _           => ()
      }
    }
    // each window's cost exceeds the budget by at most its closing doc
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, w) =>
      val cost = w.map(_._4).sum
      cost should be <= budget + w.map(_._4).max
    }
    // exact semantics: window = floor(cost-before / budget) in doc order,
    // replayed by a sequential reference implementation per bucket
    rows.groupBy(_._2).foreach { case (_, b) =>
      var cum = 0L
      b.sortBy(_._1).foreach { case (_, _, wi, cost) =>
        wi shouldBe cum / budget
        cum += cost
      }
    }
    // repartition-invariant (assignment is a function of the data)
    val again = Packing.packWindows(docs.repartition(7), expr("doc_id div 50"),
        col("doc_id"), col("n_chars"), budget)
      .select("doc_id", "pack_bucket", "window_idx", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    again.sortBy(_._1) shouldBe rows.sortBy(_._1)
  }

  test("first-fit packing: no window over budget, matches sequential reference") {
    val budget = 1500L
    val packed = Packing.packFirstFit(docs, expr("doc_id div 50"),
      col("doc_id"), col("n_chars"), budget)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.length.toLong shouldBe docs.count()
    // the exactness guarantee: multi-doc windows never exceed the budget
    rows.groupBy(r => (r._1, r._4)).foreach { case (_, w) =>
      if (w.length > 1) w.map(_._3).sum should be <= budget
    }
    // exact semantics replayed by the sequential reference implementation
    rows.groupBy(_._1).foreach { case (_, b) =>
      var widx = 0L; var wcost = 0L; var first = true
      b.sortBy(_._2).foreach { case (_, _, cost, got) =>
        if (first) { wcost = cost; first = false }
        else if (wcost + cost > budget) { widx += 1; wcost = cost }
        else wcost += cost
        got shouldBe widx
      }
    }
    // deterministic under repartitioning
    val again = Packing.packFirstFit(docs.repartition(7), expr("doc_id div 50"),
        col("doc_id"), col("n_chars"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    again.sortBy(_._2) shouldBe rows.sortBy(_._2)
  }

  test("windowStats: per-window audit sums match the assignment") {
    val budget = 1500L
    val packed = Packing.packWindows(docs, expr("doc_id div 50"),
      col("doc_id"), col("n_chars"), budget)
    val stats = Packing.windowStats(packed, col("n_chars"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byWindow = packed.select("pack_bucket", "window_idx", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2))
    stats.keySet shouldBe byWindow.keySet
    byWindow.foreach { case (k, w) =>
      val (n, cost, fill) = stats(k)
      n shouldBe w.length.toLong
      cost shouldBe w.map(_._3).sum
      fill shouldBe cost * 100 / budget
    }
  }
}
