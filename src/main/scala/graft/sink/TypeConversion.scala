package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Destination-schema-driven conversion of CDC values into typed
  * columns.
  *
  * The reference converts each incoming cell using the DESTINATION
  * column type, not anything in the message (the §1.4 matrix,
  * dst_table/gen_query.go:122-293): numbers by JSON number, bytes as
  * base64 strings, timestamps as ISO-8601 micros, null → NULL. By the
  * time values reach here the envelope's from_json has already coerced
  * scalars to text (strings unquoted, numbers/booleans as literals,
  * nested objects as JSON text, JSON null as NULL), so conversion is a
  * plain cast at the destination type — which under ANSI mode throws on
  * a non-convertible value, matching the reference's hard error.
  */
object TypeConversion {

  /** Convert one coerced CDC value text column to `dt`. */
  def convert(raw: Column, dt: DataType): Column =
    dt match {
      case StringType => raw
      case BinaryType => unbase64(raw)
      case TimestampType => to_timestamp(raw)
      case DateType => date_add(lit(java.sql.Date.valueOf("1970-01-01")),
        raw.cast(IntegerType))
      case t => raw.cast(t)
    }

  /** Typed projection of a merged change row onto `schema`.
    *
    * `columnsCol` is the map(name -> raw JSON text) of changed columns;
    * `keyJsonCol` the positional raw key; `primaryKey` the destination
    * key column names in positional order. Key cells come from the key
    * array; value cells from the map (absent → NULL, meaning
    * "unchanged" to the upsert merge).
    */
  def project(schema: StructType, primaryKey: Seq[String],
      columnsCol: Column, keyJsonCol: Column): Seq[Column] = {
    val keyIdx = primaryKey.zipWithIndex.toMap
    schema.fields.toSeq.map { f =>
      keyIdx.get(f.name) match {
        case Some(i) =>
          convert(element_at(keyJsonCol, i + 1), f.dataType).as(f.name)
        case None =>
          convert(element_at(columnsCol, f.name), f.dataType).as(f.name)
      }
    }
  }

  /** Per-row mask of which non-key columns the change actually set
    * (array of column names) — drives partial-update overlay semantics.
    */
  def presentColumns(schema: StructType, primaryKey: Seq[String],
      columnsCol: Column): Column = {
    val nonKey = schema.fields.toSeq.map(_.name).filterNot(primaryKey.contains)
    filter(
      array(nonKey.map(lit): _*),
      n => map_contains_key(columnsCol, n))
  }
}
