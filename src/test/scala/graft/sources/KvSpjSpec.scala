package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over the connector's certified key-range
  * layout ([[KvRegionLayout]]): two graft-kv scans sharing a layout must
  * co-locate — zero shuffle exchanges for rowKey equi-joins — and any
  * layout disagreement must fall back to the ordinary shuffled plan with
  * identical results.
  */
class KvSpjSpec extends graft.SparkSpec {

  import spark.implicits._

  private val cat = "graftspj"
  private lazy val wh: String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_spj_wh"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftKvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def cells(n: Int, tsBase: Long = 0L): DataFrame =
    spark.range(n.toLong).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS qualifier",
      "encode(CAST(id * 3 AS STRING), 'UTF-8') AS value",
      s"id + ${tsBase}L AS ts")

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
  }

  /** Run with auto-broadcast off: the tables under test are tiny, and a
    * broadcast would mask the co-location question entirely (at scale
    * both sides are table-sized — the exact case SPJ exists for).
    */
  private def noBroadcast[T](body: => T): T = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, prev)
  }

  private def createKv(fqn: String, regions: Int, extraProps: String = ""): Unit =
    spark.sql(
      s"""CREATE TABLE $fqn (
         |  rowKey STRING, family STRING, qualifier STRING,
         |  value BINARY, ts BIGINT)
         |USING `graft-kv` TBLPROPERTIES ('regions' = '$regions'$extraProps)""".stripMargin)

  private lazy val setup: Unit = {
    wh: Unit
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.spj")
    cells(800).createOrReplaceTempView("spj_cells")
    createKv(s"$cat.spj.t1", regions = 4)
    spark.sql(s"INSERT INTO $cat.spj.t1 SELECT * FROM spj_cells")
  }

  test("same-layout self-join through the catalog plans ZERO exchanges") {
    setup
    noBroadcast {
      // The scan reports key-grouped partitioning over the certified
      // region layout...
      val kgp = spark.sql(s"SELECT rowKey FROM $cat.spj.t1")
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.keyGroupedPartitioning
        }
      assert(kgp.flatten.nonEmpty, s"no key-grouped partitioning: $kgp")

      // ...a rowKey equi-join co-locates partition-wise...
      val joined = spark.sql(
        s"""SELECT a.rowKey, a.value AS va, b.value AS vb
           |FROM $cat.spj.t1 a JOIN $cat.spj.t1 b ON a.rowKey = b.rowKey""".stripMargin)
      joined.count() shouldBe 800L
      withClue(joined.queryExecution.executedPlan.toString) {
        shuffles(joined) shouldBe 0
      }

      // ...and so does a SUPERSET-key join (rowKey, qualifier): rows
      // equal on both keys are a fortiori equal on rowKey, so the
      // region co-location still covers them.
      val joined2 = spark.sql(
        s"""SELECT a.rowKey, a.qualifier, a.value AS va, b.value AS vb
           |FROM $cat.spj.t1 a JOIN $cat.spj.t1 b
           |  ON a.rowKey = b.rowKey AND a.qualifier = b.qualifier""".stripMargin)
      joined2.count() shouldBe 800L
      withClue(joined2.queryExecution.executedPlan.toString) {
        shuffles(joined2) shouldBe 0
      }
    }
  }

  test("the snapshot-diff shape runs end-to-end with ZERO exchanges on co-located versions") {
    setup
    noBroadcast {
      // Current version vs VERSION AS OF the same seq: identical layout.
      // resolve-LWW per side (agg on a superset of the partition key —
      // no exchange) + full-outer join (co-located — no exchange).
      val older = spark.sql(s"SELECT * FROM $cat.spj.t1 VERSION AS OF 0")
      val newer = spark.table(s"$cat.spj.t1")
      val d = graft.ops.SnapshotDiff.diff(older, newer)
      d.count() shouldBe 0L // no changes between identical versions
      withClue(d.queryExecution.executedPlan.toString) {
        shuffles(d) shouldBe 0
      }
    }
  }

  test("DIFFERENT layouts fall back to the shuffled plan with identical results") {
    setup
    createKv(s"$cat.spj.t2", regions = 2)
    spark.sql(s"INSERT INTO $cat.spj.t2 SELECT * FROM spj_cells")
    noBroadcast {
      val joined = spark.sql(
        s"""SELECT a.rowKey, decode(a.value, 'UTF-8') AS va,
           |  decode(b.value, 'UTF-8') AS vb
           |FROM $cat.spj.t1 a JOIN $cat.spj.t1 b ON a.rowKey = b.rowKey""".stripMargin)
      val cross = spark.sql(
        s"""SELECT a.rowKey, decode(a.value, 'UTF-8') AS va,
           |  decode(b.value, 'UTF-8') AS vb
           |FROM $cat.spj.t1 a JOIN $cat.spj.t2 b ON a.rowKey = b.rowKey""".stripMargin)
      // 4-region vs 2-region: different token, no co-location claim —
      // must shuffle, and must agree with the co-located answer.
      assert(shuffles(cross) > 0,
        "differing layouts must not silently co-locate")
      cross.collect().map(_.toSeq.map(String.valueOf)).toSet shouldBe
        joined.collect().map(_.toSeq.map(String.valueOf)).toSet
    }
  }

  test("a pruned side still co-locates: missing partition values pad, results stay exact") {
    setup
    noBroadcast {
      val joined = spark.sql(
        s"""SELECT a.rowKey, a.value AS va, b.value AS vb
           |FROM (SELECT * FROM $cat.spj.t1 WHERE rowKey >= '000600') a
           |JOIN $cat.spj.t1 b ON a.rowKey = b.rowKey""".stripMargin)
      joined.count() shouldBe 200L
      withClue(joined.queryExecution.executedPlan.toString) {
        shuffles(joined) shouldBe 0
      }
    }
  }

  test("SALTED tables with identical layouts co-locate on logical keys") {
    setup
    createKv(s"$cat.spj.s1", regions = 4, extraProps = ", 'salt_buckets' = '8'")
    spark.sql(s"INSERT INTO $cat.spj.s1 SELECT * FROM spj_cells")
    noBroadcast {
      val joined = spark.sql(
        s"""SELECT a.rowKey, a.value AS va, b.value AS vb
           |FROM $cat.spj.s1 a JOIN $cat.spj.s1 b ON a.rowKey = b.rowKey""".stripMargin)
      joined.count() shouldBe 800L
      withClue(joined.queryExecution.executedPlan.toString) {
        shuffles(joined) shouldBe 0
      }
      // And a salted⋈unsalted join is NOT co-located (different stored
      // layouts), but stays correct.
      val mixed = spark.sql(
        s"""SELECT a.rowKey, a.value AS va, b.value AS vb
           |FROM $cat.spj.s1 a JOIN $cat.spj.t1 b ON a.rowKey = b.rowKey""".stripMargin)
      assert(shuffles(mixed) > 0)
      mixed.count() shouldBe 800L
    }
  }

  test("an APPEND breaks certification: overlapping segments fall back, a compaction restores co-location") {
    setup
    createKv(s"$cat.spj.t3", regions = 4)
    spark.sql(s"INSERT INTO $cat.spj.t3 SELECT * FROM spj_cells")
    spark.sql(s"INSERT INTO $cat.spj.t3 SELECT * FROM spj_cells WHERE rowKey < '000100'")
    noBroadcast {
      val j1 = spark.sql(
        s"""SELECT a.rowKey, count(*) AS n
           |FROM $cat.spj.t3 a JOIN $cat.spj.t3 b ON a.rowKey = b.rowKey
           |GROUP BY a.rowKey""".stripMargin)
      assert(shuffles(j1) > 0, "overlapping segments must not certify")
      j1.count() shouldBe 800L
      spark.sql(s"CALL $cat.sys.compact('spj.t3')").collect()
      val j2 = spark.sql(
        s"""SELECT a.rowKey, count(*) AS n
           |FROM $cat.spj.t3 a JOIN $cat.spj.t3 b ON a.rowKey = b.rowKey
           |GROUP BY a.rowKey""".stripMargin)
      withClue(j2.queryExecution.executedPlan.toString) {
        shuffles(j2) shouldBe 0
      }
      j2.count() shouldBe 800L
    }
  }
}
