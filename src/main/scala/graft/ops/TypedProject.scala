package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ByteCodecs

/** The typed decode step of the Avro/Parquet exports: a pivoted row of binary
  * cells + an Avro-dialect schema → typed columns.
  *
  * Mirrors the exporters' `putValue` switch (ExportHBaseTableToAvro.java:199-209,
  * ExportHBaseTableToParquet.java:189-199): STRING → UTF-8 decode, INT →
  * `Bytes.toInt`, LONG → `Bytes.toLong` — the reference's KV cells only ever
  * carry these. BOOLEAN ("true"/"false" text) and DOUBLE (decimal text) ride
  * the UTF-8 representation; BINARY cells pass through raw. The error branch
  * stays for types the schema parser would reject anyway.
  */
object TypedProject {

  def decodeAs(c: Column, dt: DataType): Column = dt match {
    case StringType  => decode(c, "UTF-8")
    case IntegerType => ByteCodecs.binaryToInt(c)
    case LongType    => ByteCodecs.binaryToLong(c)
    case DoubleType  => decode(c, "UTF-8").cast(DoubleType)
    case BooleanType => decode(c, "UTF-8").cast(BooleanType)
    case BinaryType  => c
    case other       => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** P1/P3 typed: select schema fields in order, decoding each binary cell to
    * its declared type; missing cells stay null (Avro null / Parquet absent).
    */
  def project(pivoted: DataFrame, schema: StructType): DataFrame =
    pivoted.select(schema.fields.map(f => decodeAs(col(f.name), f.dataType).as(f.name)).toSeq: _*)
}
