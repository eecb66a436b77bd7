package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** Manifest-carried rowKey blooms ([[KvBloom]] — the HBase ROW-bloom Get
  * path): the sink builds one per small segment, the add line carries it,
  * and point lookups prune epoch segments the min/max bounds cannot (every
  * epoch spans the keyspace, so ranges keep all of them; the bloom keeps
  * only the segments that may actually hold the key).
  */
class KvBloomSpec extends graft.SparkSpec {

  test("no false negatives; false-positive rate stays near the design point") {
    val b = new KvBloom.Builder
    val members = (0 until 5000).map(i => f"key-$i%08d")
    members.foreach(b.add)
    val bloom = KvBloom.decode(b.buildToken().get).get
    members.foreach(k => assert(bloom.mightContain(k), s"false negative: $k"))
    val probes = (0 until 20000).map(i => f"other-$i%08d")
    val fp = probes.count(bloom.mightContain)
    // 10 bits/key, k=7 → theoretical fpp ≈ 0.8%; allow generous slack
    assert(fp < probes.length * 0.03, s"fpp too high: $fp/${probes.length}")
  }

  test("keyful files carry no bloom; duplicate-heavy files still earn theirs") {
    val big = new KvBloom.Builder
    (0 to KvBloom.MaxBits / KvBloom.BitsPerKey).foreach(i => big.add(s"k$i"))
    big.buildToken() shouldBe None
    // LWW shape: 200k rows over 1k distinct keys — the amortized dedup
    // keeps the buffer bounded and the bloom is still built
    val dup = new KvBloom.Builder
    (0 until 200000).foreach(i => dup.add(s"k${i % 1000}"))
    val bloom = KvBloom.decode(dup.buildToken().get).get
    (0 until 1000).foreach(i => assert(bloom.mightContain(s"k$i")))
    val empty = new KvBloom.Builder
    empty.buildToken() shouldBe None
  }

  test("corrupt or foreign tokens decode to None (planner falls back, never throws)") {
    KvBloom.decode("") shouldBe None
    KvBloom.decode("nodot") shouldBe None
    KvBloom.decode("7.!!!not-base64!!!") shouldBe None
    KvBloom.decode("7.QUJD") shouldBe None // inflates to garbage/short
  }

  test("point lookup prunes epoch segments by manifest bloom: only holders are opened") {
    spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
      classOf[CountingFileSystem].getName)
    val base = s"${sys.props("java.io.tmpdir")}/graft_test/kv_bloom_prune"
    graft.sinks.Sinks.deleteRecursive(spark, base)
    val d = s"cfs:$base"
    val cells = KvGenerator.cells(spark, 600, 4, "runBL").cache()
    val epochs = 6
    // split by RECORD (ts/10 = the generator's record id), not raw ts — a
    // record's 10 cells share its rowKey, so this keeps each key in one
    // epoch (the realistic per-epoch-ingest shape the bloom exists for)
    (0 until epochs).foreach { i =>
      cells.filter(pmod(floor(col("ts") / 10).cast("long"), lit(epochs)) === i)
        .write.format("graft-kv").option("regions", 1).mode("append").save(d)
    }
    val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
    val stats = KvLog.liveFileStats(fs, new Path(d))
    stats should have size epochs.toLong.toInt
    stats.values.foreach(_.bloom should not be empty)
    // a key that lives in exactly one epoch
    val probe = cells.groupBy("rowKey")
      .agg(countDistinct(pmod(floor(col("ts") / 10).cast("long"), lit(epochs))).as("n"))
      .filter(col("n") === 1).select("rowKey").orderBy("rowKey")
      .limit(1).collect()(0).getString(0)
    val q = spark.read.format("graft-kv").load(d).filter(col("rowKey") === probe)
    CountingFileSystem.reset()
    val got = q.collect()
    got.map(_.getAs[String]("rowKey")).toSet shouldBe Set(probe)
    got.length shouldBe cells.filter(col("rowKey") === probe).count()
    // every epoch intersects the [probe, probe] range; only the bloom can
    // prune — the plan keeps ~1 file (+fpp) and opens no other
    val desc = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("regions=")).getOrElse("")
    val kept = s"regions=(\\d+)/$epochs".r.findFirstMatchIn(desc)
      .fold(fail(s"no region count in plan: $desc"))(_.group(1).toInt)
    kept should be <= 2
    CountingFileSystem.dataOpens.get should be <= (2L * kept)
  }

  test("IN-list and DPP key sets prune by bloom; compaction carries blooms through the checkpoint") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_test/kv_bloom_in"
    graft.sinks.Sinks.deleteRecursive(spark, base)
    val cells = KvGenerator.cells(spark, 400, 4, "runBI").cache()
    val epochs = 5
    (0 until epochs).foreach { i =>
      cells.filter(pmod(floor(col("ts") / 10).cast("long"), lit(epochs)) === i)
        .write.format("graft-kv").option("regions", 1).mode("append").save(base)
    }
    val keys = cells.select("rowKey").distinct().orderBy("rowKey")
      .limit(2).collect().map(_.getString(0))
    val in = spark.read.format("graft-kv").load(base)
      .filter(col("rowKey").isin(keys.toIndexedSeq: _*))
    in.count() shouldBe cells.filter(col("rowKey").isin(keys.toIndexedSeq: _*)).count()
    val desc = in.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("regions=")).getOrElse("")
    val kept = s"regions=(\\d+)/$epochs".r.findFirstMatchIn(desc)
      .fold(fail(s"no region count in plan: $desc"))(_.group(1).toInt)
    kept should be < epochs
    // a minor/major pass re-publishes carried blooms: post-compact lookups
    // still prune (merged outputs are keyful+tight-ranged, carried epoch
    // files keep their blooms)
    KvCompactor.compact(spark, base, regions = 2)
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())
    val live = KvLog.liveFileStats(fs, new Path(base))
    live.keySet shouldBe KvLog.liveFiles(fs, new Path(base)).toSet
    spark.read.format("graft-kv").load(base)
      .filter(col("rowKey") === keys(0)).count() shouldBe
      cells.filter(col("rowKey") === keys(0)).count()
  }
}
