package graft

import org.apache.spark.sql.functions._
import graft.functions.ByteCodecs._

/** F2 codecs: big-endian like HBase `Bytes` (SURVEY §2.8). */
class ByteCodecsSpec extends SparkSpec {
  import spark.implicits._

  test("int/long round-trips are the identity, including extremes") {
    val ints = Seq(0, 1, -1, 42, Int.MaxValue, Int.MinValue)
    val outI = ints.toDF("i")
      .select(binaryToInt(intToBinary(col("i"))).as("i")).as[Int].collect()
    outI.toSeq shouldBe ints

    val longs = Seq(0L, 1L, -1L, 1234567890123L, Long.MaxValue, Long.MinValue)
    val outL = longs.toDF("l")
      .select(binaryToLong(longToBinary(col("l"))).as("l")).as[Long].collect()
    outL.toSeq shouldBe longs
  }

  test("encoding is big-endian, byte-identical to java.nio (HBase Bytes)") {
    val bytes = Seq(0x01020304).toDF("i")
      .select(intToBinary(col("i"))).as[Array[Byte]].head()
    bytes shouldBe Array[Byte](1, 2, 3, 4)
    val lbytes = Seq(0x0102030405060708L).toDF("l")
      .select(longToBinary(col("l"))).as[Array[Byte]].head()
    lbytes shouldBe Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
  }

  test("property: round-trip identity on arbitrary values (seeded)") {
    val rnd = new scala.util.Random(42)
    val ints = List.fill(200)(rnd.nextInt())
    ints.toDF("i").select(binaryToInt(intToBinary(col("i"))).as("i"))
      .as[Int].collect().toSeq shouldBe ints
    val longs = List.fill(200)(rnd.nextLong())
    longs.toDF("l").select(binaryToLong(longToBinary(col("l"))).as("l"))
      .as[Long].collect().toSeq shouldBe longs
  }

  test("wrong-width binary input fails loudly, like Bytes.toInt") {
    val bad = Seq(Array[Byte](1, 2)).toDF("b")
    val e = intercept[Exception] {
      bad.select(binaryToInt(col("b"))).collect()
    }
    e.getMessage should include("expected")
  }

  test("null propagates as null (nullSafeEval)") {
    val df = Seq(Option.empty[Array[Byte]]).toDF("b")
    df.select(binaryToInt(col("b"))).collect().head.isNullAt(0) shouldBe true
  }
}
