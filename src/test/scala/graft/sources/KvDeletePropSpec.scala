package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

/** Property law for delete-marker masking ([[KvDelete]]): for ANY cell
  * set and ANY interleaving of row/column deletes, the masked scan must
  * equal the declarative model
  *
  *   survivors = { put | ts > newest row-marker ts for put.rowKey
  *                     ∧ ts > newest column-marker ts for its coordinate }
  *
  * — across arbitrary commit slicing (cells land in random numbers of
  * commits, markers interleave), both scan shapes (full and point
  * lookup), and the physical purge (a major compaction must not change
  * one visible cell and must leave zero markers).
  */
class KvDeletePropSpec extends graft.SparkSpec {

  import spark.implicits._

  private case class Put(rowKey: String, family: String, qualifier: String,
      v: String, ts: Long)
  private sealed trait Del
  private case class DelRow(rowKey: String, ts: Long) extends Del
  private case class DelCol(rowKey: String, family: String, qualifier: String,
      ts: Long) extends Del

  private val keys = (1 to 8).map(i => s"k$i")
  private val fams = Seq("f", "g")
  private val quals = Seq("a", "b")

  private val putGen: Gen[Put] = for {
    k <- Gen.oneOf(keys); f <- Gen.oneOf(fams); q <- Gen.oneOf(quals)
    ts <- Gen.choose(0L, 40L)
  } yield Put(k, f, q, s"$k$f$q$ts", ts)

  private val delGen: Gen[Del] = Gen.oneOf(
    for { k <- Gen.oneOf(keys); ts <- Gen.oneOf(Gen.choose(0L, 40L), Gen.const(Long.MaxValue)) }
      yield DelRow(k, ts),
    for { k <- Gen.oneOf(keys); f <- Gen.oneOf(fams); q <- Gen.oneOf(quals)
          ts <- Gen.choose(0L, 40L) } yield DelCol(k, f, q, ts))

  private def model(puts: Seq[Put], dels: Seq[Del]): Set[(String, String, String, String, Long)] = {
    val rowTs = dels.collect { case DelRow(k, t) => k -> t }
      .groupMapReduce(_._1)(_._2)(math.max)
    val colTs = dels.collect { case DelCol(k, f, q, t) => (k, f, q) -> t }
      .groupMapReduce(_._1)(_._2)(math.max)
    puts.filter(p =>
        p.ts > rowTs.getOrElse(p.rowKey, Long.MinValue) &&
        p.ts > colTs.getOrElse((p.rowKey, p.family, p.qualifier), Long.MinValue))
      .map(p => (p.rowKey, p.family, p.qualifier, p.v, p.ts)).toSet
  }

  private def stage(puts: Seq[Put], dels: Seq[Del], slices: Int,
      dir: String): Unit = {
    graft.sinks.Sinks.deleteRecursive(spark, dir)
    def write(ps: Seq[Put]): Unit = if (ps.nonEmpty)
      ps.map(p => (p.rowKey, p.family, p.qualifier, p.v, p.ts))
        .toDF("rowKey", "family", "qualifier", "v", "ts")
        .select(col("rowKey"), col("family"), col("qualifier"),
          encode(col("v"), "UTF-8").as("value"), col("ts"))
        .write.format("graft-kv").option("regions", 2).mode("append").save(dir)
    // interleave: first slice of puts, then alternate deletes and slices
    val chunks = puts.grouped(math.max(1, (puts.size + slices - 1) / slices)).toSeq
    val delChunks = dels.grouped(math.max(1, (dels.size + slices - 1) / slices)).toSeq
    val n = math.max(chunks.size, delChunks.size)
    (0 until n).foreach { i =>
      chunks.lift(i).foreach(write)
      delChunks.lift(i).foreach { ds =>
        val rows = ds.collect { case DelRow(k, t) => (k, t) }
        if (rows.nonEmpty)
          KvDelete.deleteRows(spark, dir,
            rows.toDF("rowKey", "ts"))
        val cols = ds.collect { case DelCol(k, f, q, t) => (k, f, q, t) }
        if (cols.nonEmpty)
          KvDelete.deleteColumns(spark, dir,
            cols.toDF("rowKey", "family", "qualifier", "ts"))
      }
    }
  }

  private def readBack(dir: String): Set[(String, String, String, String, Long)] =
    spark.read.format("graft-kv").load(dir)
      .select(col("rowKey"), col("family"), col("qualifier"),
        decode(col("value"), "UTF-8").as("v"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet

  test("masking law: any puts, any deletes, any commit slicing — scan == model; compaction preserves it") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test/kv_del_prop"
    val caseGen = for {
      puts0 <- Gen.listOfN(30, putGen)
      dels <- Gen.listOfN(6, delGen)
      slices <- Gen.choose(1, 3)
    } yield (puts0.distinctBy(p => (p.rowKey, p.family, p.qualifier, p.ts)),
      dels, slices)
    checkProp("delete-masking law", Prop.forAll(caseGen) {
      case (puts, dels, slices) =>
        stage(puts, dels, slices, dir)
        val expected = model(puts, dels)
        val masked = readBack(dir)
        val pointKey = keys.head
        val pointOk = spark.read.format("graft-kv").load(dir)
          .filter(col("rowKey") === pointKey).count() ==
          expected.count(_._1 == pointKey)
        val compactedOk = KvCompactor.compact(spark, dir, regions = 2) match {
          case _: KvCompactor.Compacted =>
            readBack(dir) == expected &&
              spark.read.format("graft-kv").option("readTombstones", "true")
                .load(dir).filter(col("qualifier") < "\u0001").count() == 0
          case _: KvCompactor.Parked => true // single segment, nothing to merge
          case other => false
        }
        (masked == expected) :| s"masked scan ${masked.size} != model ${expected.size}" &&
          pointOk :| "point lookup disagreed" &&
          compactedOk :| "compaction changed visible cells or kept markers"
    }, seed = 1208L, samples = 12)
  }
}
