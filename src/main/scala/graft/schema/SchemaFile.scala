package graft.schema

import org.apache.avro.{Schema => AvroSchema}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The reference's two schema-file dialects (SURVEY §1.2), applied on read.
  *
  * 1. CSV dialect (delimited exports): the first line of the file is a
  *    comma-separated list of column names, order = output order, every
  *    column implicitly a string
  *    (ExportHBaseTableToDelimiteredTxt.java:131-145).
  * 2. Avro-JSON dialect (Avro/Parquet exports): an Avro record schema;
  *    STRING/INT/LONG enforced at decode, any other type is an error
  *    (ExportHBaseTableToAvro.java:140-153, 199-209).
  */
object SchemaFile {

  /** CSV dialect → StructType: all strings, schema order preserved. */
  def parseCsv(firstLine: String): StructType =
    StructType(firstLine.trim.split(",").map(n => StructField(n.trim, StringType)))

  /** Avro-JSON dialect → StructType. STRING/INT/LONG are the reference's
    * surface (mirroring the exporters' decode switch, Avro:207);
    * DOUBLE/BOOLEAN/BYTES extend it symmetrically with the AvroIO sink so a
    * schema file can describe anything the sink can round-trip. A nullable
    * union `[T, "null"]` maps to a nullable field (the SampleAvroWriter demo
    * shape, SampleAvroWriter.java:25-26).
    */
  def parseAvroJson(json: String): StructType = {
    val avro = new AvroSchema.Parser().parse(json)
    require(avro.getType == AvroSchema.Type.RECORD, s"not a record schema: ${avro.getType}")
    StructType(avro.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      val dt = t.getType match {
        case AvroSchema.Type.STRING  => StringType
        case AvroSchema.Type.INT     => IntegerType
        case AvroSchema.Type.LONG    => LongType
        case AvroSchema.Type.DOUBLE  => DoubleType
        case AvroSchema.Type.BOOLEAN => BooleanType
        case AvroSchema.Type.BYTES   => BinaryType
        case other =>
          throw new IllegalArgumentException(
            s"field '${f.name}': unsupported Avro type $other " +
              "(supported: string/int/long/double/boolean/bytes)")
      }
      StructField(f.name, dt, nullable)
    }.toSeq)
  }

  private def unwrap(s: AvroSchema): (AvroSchema, Boolean) =
    if (s.getType == AvroSchema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union: $s")
      (nonNull.head, branches.size > nonNull.size)
    } else (s, false)

  /** Read a schema file from any Hadoop-visible path (the reference reads it
    * from HDFS in each task's `setup`, Txt:103-122; we read it once on the
    * driver — it parameterizes the *plan*, not the data).
    */
  def readFile(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
