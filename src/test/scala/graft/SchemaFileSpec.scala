package graft

import org.apache.spark.sql.types._
import graft.schema.SchemaFile

/** Schema-file dialects (SURVEY §1.2). */
class SchemaFileSpec extends SparkSpec {

  test("CSV dialect: order preserved, all strings, whitespace trimmed") {
    val st = SchemaFile.parseCsv(" c1 ,c3,c8 \n")
    st.fieldNames.toSeq shouldBe Seq("c1", "c3", "c8")
    all(st.fields.map(_.dataType)) shouldBe StringType
  }

  test("Avro dialect: string/int/long map to Spark types") {
    val st = SchemaFile.parseAvroJson(
      """{"type":"record","name":"R","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"i","type":"int"},
        |  {"name":"l","type":"long"}]}""".stripMargin)
    st.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq shouldBe Seq(
      ("s", StringType, false), ("i", IntegerType, false), ("l", LongType, false))
  }

  test("Avro dialect: [T, null] union -> nullable (SampleAvroWriter.java:25-26)") {
    val st = SchemaFile.parseAvroJson(
      """{"type":"record","name":"R","fields":[
        |  {"name":"i","type":["int","null"]}]}""".stripMargin)
    st("i").nullable shouldBe true
    st("i").dataType shouldBe IntegerType
  }

  test("Avro dialect: extended sink types parse; unsupported still throws (Avro:207)") {
    val wide = SchemaFile.parseAvroJson(
      """{"type":"record","name":"R","fields":[
        |  {"name":"d","type":"double"}, {"name":"b","type":"boolean"},
        |  {"name":"raw","type":"bytes"}]}""".stripMargin)
    wide("d").dataType shouldBe DoubleType
    wide("b").dataType shouldBe BooleanType
    wide("raw").dataType shouldBe BinaryType
    val e = intercept[IllegalArgumentException] {
      SchemaFile.parseAvroJson(
        """{"type":"record","name":"R","fields":[
          |  {"name":"xs","type":{"type":"array","items":"int"}}]}""".stripMargin)
    }
    e.getMessage should include("unsupported")
  }

  test("the reference's own fixture schema parses (schema/test.schema)") {
    // 7 string fields C1,C3..C8 — subset of generator's C0..C9 (SURVEY §1.2).
    val fixture =
      """{"type":"record","name":"test","fields":[
        |  {"name":"C1","type":"string"},{"name":"C3","type":"string"},
        |  {"name":"C4","type":"string"},{"name":"C5","type":"string"},
        |  {"name":"C6","type":"string"},{"name":"C7","type":"string"},
        |  {"name":"C8","type":"string"}]}""".stripMargin
    SchemaFile.parseAvroJson(fixture).fieldNames.length shouldBe 7
  }
}
