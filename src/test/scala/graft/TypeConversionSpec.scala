package graft

import graft.sink.TypeConversion
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The §1.4 destination-type conversion matrix
  * (reference: dst_table/gen_query.go:122-293): each destination type
  * converts from the CDC value text; JSON null → NULL; binary via
  * base64; timestamps as ISO-8601; dates as epoch-days.
  */
class TypeConversionSpec extends SparkSpec {
  import spark.implicits._

  private def conv(raw: String, dt: DataType): Any = {
    val df = Seq(Option(raw)).toDF("v")
      .select(TypeConversion.convert(col("v"), dt).as("out"))
    val r = df.collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("scalar conversions") {
    assert(conv("true", BooleanType) == true)
    assert(conv("42", ByteType) == 42.toByte)
    assert(conv("1234", ShortType) == 1234.toShort)
    assert(conv("123456", IntegerType) == 123456)
    assert(conv("1234567890123", LongType) == 1234567890123L)
    assert(conv("3.25", FloatType) == 3.25f)
    assert(conv("3.25", DoubleType) == 3.25d)
    assert(conv("hello", StringType) == "hello")
  }

  test("unsigned widening: Uint32 range fits in LongType") {
    assert(conv("4294967295", LongType) == 4294967295L)
    // full uint64 range needs Decimal(20,0)
    assert(conv("18446744073709551615", DecimalType(20, 0)).toString
      == "18446744073709551615")
  }

  test("temporal conversions") {
    assert(conv("2006-01-02T15:04:05.000000Z", TimestampType).toString
      .startsWith("2006-01-02"))
    // Date arrives as epoch-days (uint32 in the wire format)
    assert(conv("19723", DateType).toString == "2024-01-01")
  }

  test("binary via base64; null passes through") {
    assert(new String(conv("aGVsbG8=", BinaryType)
      .asInstanceOf[Array[Byte]], "UTF-8") == "hello")
    assert(conv(null, IntegerType) == null)
    assert(conv(null, StringType) == null)
    assert(conv(null, BinaryType) == null)
  }

  test("JSON column text passes through as string") {
    assert(conv("""{"x":1}""", StringType) == """{"x":1}""")
  }
}
