package graft.sinks

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** K3/S4: Avro container sink + source without the spark-avro module (absent
  * from this environment, SURVEY §7.1), built on the same avro-mapred
  * machinery the reference uses (`AvroKeyOutputFormat` + output-key schema,
  * ExportHBaseTableToAvro.java:90-105; `DataFileReader`, AvroReader.java:32-51
  * — here the split-aware `AvroKeyInputFormat` so reads stay distributed).
  *
  * Type surface: flat records of string/int/long (the reference's schema
  * dialect, SURVEY §1.3) plus double/boolean/bytes, nullable via union.
  */
object AvroIO {

  /** K3: write a flat typed DataFrame as an Avro container.
    * @param codec "snappy" | "deflate" | None (Avro's java snappy works
    *              without native Hadoop libs, unlike the sequence-file codec).
    */
  def write(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    // toAvroJson validates every column type on the DRIVER — an unsupported
    // column must fail before the distributed write launches, not mid-job on
    // an executor.
    val avroJson = toAvroJson(df.schema, "GraftRecord")
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new AvroSchema.Parser().parse(avroJson))
    codec.foreach { c =>
      job.getConfiguration.setBoolean("mapreduce.output.fileoutputformat.compress", true)
      job.getConfiguration.set("avro.output.codec", c)
    }
    val names = df.schema.fieldNames
    val dataTypes = df.schema.fields.map(_.dataType)
    // queryExecution.toRdd, not df.rdd: record building reads the pipeline's
    // UnsafeRows directly instead of paying a Catalyst→external Row
    // conversion per row first. Values are copied out immediately
    // (UTF8String.toString / primitive box), so row-buffer reuse is safe.
    df.queryExecution.toRdd.mapPartitions { it =>
      // Schema is not serializable pre-1.9 style; re-parse per partition.
      val schema = new AvroSchema.Parser().parse(avroJson)
      val get: Array[(org.apache.spark.sql.catalyst.InternalRow, Int) => AnyRef] =
        dataTypes.map {
          case StringType  => (r, i) => r.getUTF8String(i).toString
          case IntegerType => (r, i) => Integer.valueOf(r.getInt(i))
          case LongType    => (r, i) => java.lang.Long.valueOf(r.getLong(i))
          case DoubleType  => (r, i) => java.lang.Double.valueOf(r.getDouble(i))
          case BooleanType => (r, i) => java.lang.Boolean.valueOf(r.getBoolean(i))
          case BinaryType  => (r, i) => java.nio.ByteBuffer.wrap(r.getBinary(i).clone())
          case other => // unreachable: toAvroJson validated on the driver
            throw new IllegalArgumentException(s"unsupported Avro sink type $other")
        }
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < names.length) {
          if (!row.isNullAt(i)) rec.put(names(i), get(i)(row, i))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** S4: distributed Avro container read with an explicit reader schema (the
    * reference's AvroReader takes the schema file as an argument).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val avroJson = toAvroJson(schema, "GraftRecord")
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setDataModelClass(job, classOf[GenericData])
    AvroJob.setInputKeySchema(job, new AvroSchema.Parser().parse(avroJson))
    val names = schema.fieldNames
    val dataTypes = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(names.indices.map { i =>
          (rec.get(names(i)), dataTypes(i)) match {
            case (null, _)           => null
            case (v, StringType)     => v.toString // Utf8 → String
            case (v: java.nio.ByteBuffer, BinaryType) =>
              val a = new Array[Byte](v.remaining()); v.duplicate().get(a); a
            case (v, _)              => v
          }
        })
      }
    spark.createDataFrame(rows, schema)
  }

  /** StructType → Avro record schema JSON — the writer-side inverse of
    * SchemaFile.parseAvroJson, and the sink's driver-side type validation.
    */
  def toAvroJson(schema: StructType, name: String): String = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case StringType  => "\"string\""
        case IntegerType => "\"int\""
        case LongType    => "\"long\""
        case DoubleType  => "\"double\""
        case BooleanType => "\"boolean\""
        case BinaryType  => "\"bytes\""
        case other =>
          throw new IllegalArgumentException(
            s"unsupported Avro sink type $other for column '${f.name}' " +
              "(supported: string, int, long, double, boolean, binary)")
      }
      val tpe = if (f.nullable) s"""[$t,"null"]""" else t
      s"""{"name":"${f.name}","type":$tpe}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }
}
