package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.kv.KvGenerator
import graft.schema.SchemaFile
import graft.sinks.{AvroIO, Sinks}

/** K1–K4 sinks + the unified export pipeline (§3.1), round-tripped through
  * real files — the reference's README runbook as automated tests.
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/out"
  }

  private val cells = KvGenerator.cells(spark, 100, 2, "t")

  test("K1 delimited text: golden line shape, gzip files, exact fields") {
    val path = tmp("txt")
    val cfg = Export.Config(Export.DelimitedTxt, "C0,C9,KEY", path,
      rowKeyColumn = Some("KEY"), compression = Some("gzip"))
    Export.run(cells, cfg)
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".txt.gz")), s"expected gzip files, got ${files.toSeq}")
    val lines = spark.read.text(path).as[String].collect()
    lines.length shouldBe cells.select("rowKey").distinct().count()
    // field count = schema arity regardless of sparsity (F5): C0|C9|KEY where
    // the injected KEY is the rowKey, which itself contains 2 '|'s
    all(lines.map(_.split("\\|", -1).length)) shouldBe 5
    // golden: the row for generator id 0 (keyRoot via KeyMixer) carries its counters
    val id0Key = f"${(1 * KvGenerator.KeyMixer) % KvGenerator.KeySpace}%05d|t|0"
    val id0 = lines.find(_.endsWith("|" + id0Key)).get
    id0 shouldBe s"counter:0|counter:9|$id0Key"
  }

  test("K2 sequence file: Text keys survive a gzip round-trip") {
    val path = tmp("seq")
    val cfg = Export.Config(Export.DelimitedSeq, "C1,C2", path,
      compression = Some("gzip"))
    Export.run(cells, cfg)
    val back = Sinks.readSequenceFile(spark, path)
    back.count() shouldBe cells.select("rowKey").distinct().count()
    // schema "C1,C2" and no rowKeyColumn -> exactly 2 fields per line
    all(back.as[String].collect().map(_.split("\\|", -1).length)) shouldBe 2
  }

  test("K2 sequence file: snappy round-trip (Hadoop SnappyCodec on snappy-java)") {
    val path = tmp("seq_snappy")
    val cfg = Export.Config(Export.DelimitedSeq, "C1,C2", path,
      compression = Some("snappy"))
    Export.run(cells, cfg)
    // the written container really is snappy-compressed, not a fallback
    val part = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val header = java.nio.file.Files.readAllBytes(part.toPath).take(200)
    new String(header, "ISO-8859-1") should include("SnappyCodec")
    val back = Sinks.readSequenceFile(spark, path)
    back.count() shouldBe cells.select("rowKey").distinct().count()
    all(back.as[String].collect().map(_.split("\\|", -1).length)) shouldBe 2
  }

  private val avroSchema =
    """{"type":"record","name":"T","fields":[
      |  {"name":"C0","type":["string","null"]},
      |  {"name":"KEY","type":["string","null"]}]}""".stripMargin

  test("K3 avro container: snappy round-trip preserves rows and schema") {
    val path = tmp("avro")
    val cfg = Export.Config(Export.Avro, avroSchema, path,
      rowKeyColumn = Some("KEY"), compression = Some("snappy"))
    Sinks.deleteRecursive(spark, path)
    Export.run(cells, cfg)
    val back = AvroIO.read(spark, path, SchemaFile.parseAvroJson(avroSchema))
    back.columns.toSeq shouldBe Seq("C0", "KEY")
    back.count() shouldBe cells.select("rowKey").distinct().count()
    back.filter(col("KEY").isNull).count() shouldBe 0 // P4 injected everywhere
  }

  test("avro sink: double/boolean/binary round-trip; bad types fail on the driver") {
    import org.apache.spark.sql.types._
    val path = tmp("avro_wide")
    val df = Seq(
      (1L, 1.5, true, Array[Byte](1, 2, 3)),
      (2L, -0.25, false, Array[Byte]())).toDF("id", "d", "b", "bin")
    Sinks.deleteRecursive(spark, path)
    AvroIO.write(df, path, Some("snappy"))
    val back = AvroIO.read(spark, path, df.schema)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(_._1)
    back shouldBe Seq(
      (1L, 1.5, true, Seq[Byte](1, 2, 3)),
      (2L, -0.25, false, Seq.empty[Byte]))
    // unsupported column type: rejected before any job launches
    val e = intercept[IllegalArgumentException] {
      AvroIO.toAvroJson(
        StructType(Seq(StructField("xs", ArrayType(IntegerType)))), "Bad")
    }
    e.getMessage should include("xs")
  }

  test("avro reader schema evolution: projection and reorder resolve against the writer schema") {
    // the reference's AvroReader takes an EXPLICIT reader schema
    // (AvroReader.java:32-51) — Avro schema resolution must let a reader
    // project a field subset and reorder fields against the written file
    import org.apache.spark.sql.types._
    val path = tmp("avro_evolve")
    val df = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "qty")
    Sinks.deleteRecursive(spark, path)
    AvroIO.write(df, path, Some("snappy"))
    // projected reader schema: drops 'name' entirely
    val projected = AvroIO.read(spark, path, StructType(Seq(
        StructField("id", LongType), StructField("qty", IntegerType))))
      .as[(Long, Int)].collect().sorted
    projected shouldBe Seq((1L, 10), (2L, 20), (3L, 30))
    // reordered reader schema: fields in a different order than written
    val reordered = AvroIO.read(spark, path, StructType(Seq(
        StructField("qty", IntegerType), StructField("name", StringType),
        StructField("id", LongType))))
      .as[(Int, String, Long)].collect().sorted
    reordered shouldBe Seq((10, "a", 1L), (20, "b", 2L), (30, "c", 3L))
  }

  test("K4 parquet: typed export round-trip with int/long decode (F2)") {
    val path = tmp("parquet")
    val typedCells = KvTableHelpers.typedCells(spark)
    val schema =
      """{"type":"record","name":"T","fields":[
        |  {"name":"n","type":["long","null"]},
        |  {"name":"m","type":["int","null"]},
        |  {"name":"KEY","type":["string","null"]}]}""".stripMargin
    val cfg = Export.Config(Export.Parquet, schema, path,
      rowKeyColumn = Some("KEY"), compression = Some("snappy"))
    Export.run(typedCells, cfg)
    val back = Export.readParquet(spark, path)
    back.schema("n").dataType.typeName shouldBe "long"
    back.schema("m").dataType.typeName shouldBe "integer"
    val r = back.orderBy("KEY").collect()
    r.map(_.getLong(0)).toSeq shouldBe Seq(100L, 200L)
    r.map(_.getInt(1)).toSeq shouldBe Seq(1, 2)
  }

  test("ext orc: typed export round-trip preserves types and rows") {
    val path = tmp("orc")
    val typedCells = KvTableHelpers.typedCells(spark)
    val schema =
      """{"type":"record","name":"T","fields":[
        |  {"name":"n","type":["long","null"]},
        |  {"name":"m","type":["int","null"]},
        |  {"name":"KEY","type":["string","null"]}]}""".stripMargin
    val cfg = Export.Config(Export.Orc, schema, path,
      rowKeyColumn = Some("KEY"), compression = Some("zlib"))
    Export.run(typedCells, cfg)
    val back = Export.readOrc(spark, path)
    back.schema("n").dataType.typeName shouldBe "long"
    back.schema("m").dataType.typeName shouldBe "integer"
    val r = back.orderBy("KEY").collect()
    r.map(_.getLong(0)).toSeq shouldBe Seq(100L, 200L)
    r.map(_.getInt(1)).toSeq shouldBe Seq(1, 2)
  }

  test("ext json-lines: schema-pinned read-back is type-exact, incl. nulls") {
    val path = tmp("jsonl")
    // one sparse row: qualifier 'm' missing for k2 -> null survives the trip
    val sparse = KvTableHelpers.typedCells(spark)
      .filter(!(col("rowKey") === "k2" && col("qualifier") === "m"))
    val schema =
      """{"type":"record","name":"T","fields":[
        |  {"name":"n","type":["long","null"]},
        |  {"name":"m","type":["int","null"]},
        |  {"name":"KEY","type":["string","null"]}]}""".stripMargin
    val cfg = Export.Config(Export.JsonLines, schema, path,
      rowKeyColumn = Some("KEY"), compression = Some("gzip"))
    Export.run(sparse, cfg)
    val files = new java.io.File(path).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), s"expected gzip json, got ${files.toSeq}")
    val back = Export.readJsonLines(spark, path, schema)
    back.schema("n").dataType.typeName shouldBe "long"
    back.schema("m").dataType.typeName shouldBe "integer"
    val r = back.orderBy("KEY").collect()
    r.map(_.getLong(0)).toSeq shouldBe Seq(100L, 200L)
    r(0).getInt(1) shouldBe 1
    r(1).isNullAt(1) shouldBe true // JSON drops null fields; schema restores them
  }

  test("K6 console dump renders schema + bounded rows without collecting all") {
    noException should be thrownBy Sinks.console(cells.limit(3), 3)
  }
}

object KvTableHelpers {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import graft.functions.ByteCodecs._

  /** Two rows with binary-encoded long/int cells for the typed decode path. */
  def typedCells(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("k1", 100L, 1), ("k2", 200L, 2)).toDF("rowKey", "n", "m")
      .select(col("rowKey"), lit("c").as("family"),
        explode(array(
          struct(lit("n").as("qualifier"), longToBinary(col("n")).as("value"), lit(0L).as("ts")),
          struct(lit("m").as("qualifier"), intToBinary(col("m")).as("value"), lit(1L).as("ts")))).as("cell"))
      .select(col("rowKey"), col("family"), col("cell.qualifier").as("qualifier"),
        col("cell.value").as("value"), col("cell.ts").as("ts"))
  }
}
