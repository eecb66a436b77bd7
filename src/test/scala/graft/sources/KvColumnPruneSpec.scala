package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FILE-LEVEL family/qualifier pruning ([[KvLog.FileStat.families]] —
  * the HBase per-column-family store-file analog): a family/qualifier
  * equality or IN never plans files whose recorded distinct sets
  * provably miss it, marker-carrying files stay planned (masking must
  * always see them), and wide-domain files degrade to unknown (no
  * pruning) instead of wrong answers.
  */
class KvColumnPruneSpec extends graft.SparkSpec {

  import spark.implicits._

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_colprune_$name"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    d
  }

  private def cells(n: Int, family: String, qualifier: String,
      tsBase: Long = 0L): DataFrame =
    spark.range(n.toLong).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      s"'$family' AS family", s"'$qualifier' AS qualifier",
      "encode(CAST(id AS STRING), 'UTF-8') AS value",
      s"id + ${tsBase}L AS ts")

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("family equality plans only the files recording that family") {
    val dir = freshDir("family")
    cells(500, "f", "a").write.format("graft-kv").option("regions", 1)
      .mode("overwrite").save(dir)
    cells(500, "g", "b", tsBase = 1000L).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir)
    val df = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f")
    val plan = planOf(df)
    plan should include("regions=1/2")
    df.count() shouldBe 500L
    // the unfiltered scan still plans both
    val all = spark.read.format("graft-kv").load(dir)
    planOf(all) should include("regions=2/2")
    all.count() shouldBe 1000L
  }

  test("qualifier IN prunes; a file carrying any admissible qualifier stays") {
    val dir = freshDir("qual")
    cells(300, "f", "a").write.format("graft-kv").option("regions", 1)
      .mode("overwrite").save(dir)
    cells(300, "f", "b", tsBase = 1000L).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir)
    // a MIXED file (both c and d) must stay for either predicate
    cells(150, "f", "c", tsBase = 2000L)
      .unionByName(cells(150, "f", "d", tsBase = 3000L))
      .write.format("graft-kv").option("regions", 1).mode("append").save(dir)
    def scan(quals: String*) = spark.read.format("graft-kv").load(dir)
      .filter(col("qualifier").isin(quals: _*))
    val ab = scan("a", "b")
    planOf(ab) should include("regions=2/3")
    ab.count() shouldBe 600L
    val justC = scan("c")
    planOf(justC) should include("regions=1/3")
    justC.count() shouldBe 150L
    val aAndC = scan("a", "c")
    planOf(aAndC) should include("regions=2/3")
    aAndC.count() shouldBe 450L
  }

  test("marker files are exempt: masking applies across pruned scans") {
    val dir = freshDir("markers")
    cells(200, "f", "a").write.format("graft-kv").option("regions", 1)
      .mode("overwrite").save(dir)
    cells(200, "g", "b", tsBase = 1000L).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir)
    // whole-row delete of keys 0..9: the marker file's own family is the
    // all-families sentinel — pruning by family='f' must NOT drop it
    KvDelete.deleteRows(spark, dir,
      spark.range(10).selectExpr("lpad(CAST(id AS STRING), 6, '0') AS rowKey"))
    val df = spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "f")
    val plan = planOf(df)
    // family-f data file + the marker file; the g file is pruned
    plan should include("regions=2/3")
    df.count() shouldBe 190L
    df.filter(col("rowKey") < "000010").count() shouldBe 0L
  }

  test("wide qualifier domains overflow to unknown: no pruning, right answers") {
    val dir = freshDir("wide")
    // 40 distinct qualifiers > MaxDistinctQualifiers (32): the stat must
    // degrade to None for qualifiers (families still recorded: just 'f')
    spark.range(400).selectExpr(
      "lpad(CAST(id AS STRING), 6, '0') AS rowKey",
      "'f' AS family",
      "concat('q', CAST(id % 40 AS STRING)) AS qualifier",
      "encode(CAST(id AS STRING), 'UTF-8') AS value", "id AS ts")
      .write.format("graft-kv").option("regions", 1).mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val st = KvLog.liveFileStats(fs, new org.apache.hadoop.fs.Path(dir))
      .values.head
    st.qualifiers shouldBe None
    st.families shouldBe Some(Seq("f"))
    val df = spark.read.format("graft-kv").load(dir)
      .filter(col("qualifier") === "q7")
    planOf(df) should include("regions=1/1")
    df.count() shouldBe 10L
  }

  test("stats round-trip the manifest and survive compaction") {
    val dir = freshDir("roundtrip")
    cells(100, "f", "a").write.format("graft-kv").option("regions", 1)
      .mode("overwrite").save(dir)
    cells(100, "g", "b", tsBase = 1000L).write.format("graft-kv")
      .option("regions", 1).mode("append").save(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    KvLog.liveFileStats(fs, p).values.map(_.families).toSet shouldBe
      Set(Some(Seq("f")), Some(Seq("g")))
    // compaction merges both: the rewritten file records the union
    KvCompactor.compact(spark, dir, regions = 1) shouldBe
      a[KvCompactor.Compacted]
    val merged = KvLog.liveFileStats(fs, p).values.head
    merged.families shouldBe Some(Seq("f", "g"))
    merged.qualifiers shouldBe Some(Seq("a", "b"))
    // post-compaction: one file, both families — no pruning possible, and
    // the family predicate still answers exactly
    spark.read.format("graft-kv").load(dir)
      .filter(col("family") === "g").count() shouldBe 100L
  }
}
