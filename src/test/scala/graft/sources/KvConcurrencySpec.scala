package graft.sources

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.kv.KvGenerator

/** Concurrent batch committers on one table: writer-unique sealed names +
  * the optimistic append loop mean interleaved `mode("append")` writes
  * compose like Delta's commit protocol — every commit lands, no entry or
  * data file is ever overwritten, and the manifest replays to the union.
  * (In-process threads additionally serialize on [[KvLog]]'s per-table
  * append lock, so this spec's races are deterministic-safe by
  * construction; the retry loop is the cross-process story.)
  */
class KvConcurrencySpec extends graft.SparkSpec {

  test("N concurrent batch appends: all land, all distinct, the table is the union") {
    val d = s"${sys.props("java.io.tmpdir")}/graft_test/kv_concurrent"
    graft.sinks.Sinks.deleteRecursive(spark, d)
    val writers = 4
    val commitsEach = 3
    val cells = KvGenerator.cells(spark, 480, 4, "runCC").cache()
    val total = cells.count()
    val slices = writers * commitsEach
    val pool = Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            (0 until commitsEach).foreach { c =>
              val i = w * commitsEach + c
              cells.filter(pmod(col("ts"), lit(slices)) === i)
                .write.format("graft-kv").option("regions", 2)
                .mode("append").save(d)
            }
          } catch { case t: Throwable => failures.add(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers timed out")
    failures.forEach(t => fail(s"concurrent writer failed: $t", t))
    val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
    val table = new Path(d)
    // every commit produced exactly one entry; adds are globally distinct
    val latest = KvLog.latestSeq(fs, table)
    latest shouldBe (slices - 1).toLong
    val allAdds = (0L to latest).flatMap(s => KvLog.read(fs, table, s).get.adds)
    allAdds.distinct.size shouldBe allAdds.size
    // the live set replays to the full union, cell for cell
    val back = spark.read.format("graft-kv").load(d)
    back.count() shouldBe total
    back.agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
      .collect()(0).getLong(0) shouldBe
      cells.agg(bit_xor(xxhash64(col("rowKey"), col("qualifier"), col("ts"))))
        .collect()(0).getLong(0)
    // every sink-written entry still carries its stats (the retry re-sends them)
    KvLog.liveFileStats(fs, table).keySet shouldBe
      KvLog.liveFiles(fs, table).toSet
  }
}
