package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Batch file ingestion for raw training-data drops (JSONL / CSV),
  * with the dead-letter discipline the streaming engine applies to
  * its topic (`graft.streaming.CdcEngine`'s DLQ, after the
  * reference's malformed-message strategy — internal/parse/parse.go)
  * carried over to the batch layer: every input line either parses
  * into the declared schema or lands, verbatim, in a quarantine
  * frame — nothing is silently dropped, and a single malformed line
  * never fails a 100 TB load.
  *
  * Shape: ONE text scan per source; the parse is a codegen'd
  * `from_json`/`from_csv` projection over it, so good rows and bad
  * rows come off the same pass (Spark's file-native corrupt-record
  * column forbids filtering on it straight off the scan — parsing
  * text explicitly sidesteps that and keeps the split one-pass).
  * `spark.read.text` handles directories, globs, and compressed
  * parts; gzip parts are non-splittable (one task per file), so
  * production drops should arrive as many part files — the layout
  * `write*` below produces.
  */
object FileIngest {

  /** Quarantine column: the raw line that failed to parse. */
  val CorruptCol = "_bad_record"

  /** Good rows (declared schema) + bad rows (`_bad_record` string). */
  final case class Ingested(good: DataFrame, bad: DataFrame)

  private def split(raw: DataFrame, parsed: Column,
      schema: StructType): Ingested = {
    // from_json returns a NULL struct (corrupt column unpopulated)
    // for empty/whitespace input — those lines must quarantine too,
    // not slip through as phantom all-null "good" rows, so the raw
    // line rides alongside and the bad side coalesces onto it
    val r = raw.select(col("value"), parsed.as("r"))
    val isBad = col("r").isNull || col(s"r.$CorruptCol").isNotNull
    val good = r.filter(!isBad)
      .select(schema.fieldNames.map(f => col(s"r.$f")): _*)
    val bad = r.filter(isBad)
      .select(coalesce(col(s"r.$CorruptCol"), col("value")).as(CorruptCol))
    Ingested(good, bad)
  }

  /** Read JSON-lines under `path` (file, dir, or glob) into `schema`.
    * A line that is not valid JSON, or whose values cannot coerce to
    * the schema, quarantines; a merely MISSING field is a null (the
    * usual JSONL contract — schema evolution adds fields over time).
    */
  def jsonl(spark: SparkSession, path: String,
      schema: StructType): Ingested = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType)
    val raw = spark.read.text(path)
    split(raw,
      from_json(col("value"), withCorrupt, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol)),
      schema)
  }

  /** Read headerless CSV under `path` into `schema` (write with
    * [[writeCsv]] — headerless keeps the text scan trivially
    * splittable and order-free; a header line would need a
    * distributed "is this line 1 of its file" guard). Unlike JSONL,
    * CSV fields are positional, so ANY arity violation — too many or
    * too few fields — quarantines the line along with type clashes
    * (spec-pinned).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      sep: String = ","): Ingested = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType)
    val raw = spark.read.text(path)
    split(raw,
      from_csv(col("value"), withCorrupt, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol,
        "sep" -> sep)),
      schema)
  }

  /** Schema audit of a JSONL drop — the step BEFORE declaring a
    * schema to [[jsonl]]: parse each line as a generic string map and
    * report, per top-level key, how many lines carry it and how many
    * of those values look numeric/boolean (`orElse` type guesses ride
    * the same pass). New upstream fields and partially-populated
    * fields surface here instead of as silent nulls after the typed
    * load. One text scan + one aggregation keyed by field name —
    * output is O(#distinct keys), never data-sized.
    *
    * Returns (key, n_present, n_numeric, n_boolean). Object- and
    * array-valued FIELDS stringify through the flat map parse (the
    * key surfaces; its value is the raw JSON text, guessed as neither
    * numeric nor boolean — spec-pinned). Lines that are not valid
    * JSON count under the pseudo-key `_unparsed`; a line that IS
    * valid JSON but whose top level is not an object (array/scalar)
    * counts under the distinct pseudo-key `_nested` instead of
    * masquerading as a parse failure.
    */
  def auditJsonl(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    val m = from_json(col("value"),
      org.apache.spark.sql.types.MapType(StringType, StringType))
    val fallback = when(try_parse_json(col("value")).isNotNull,
      lit(CorruptNestedKey)).otherwise(lit(CorruptUnparsedKey))
    raw.select(when(m.isNull, array(fallback))
        .otherwise(map_keys(m)).as("ks"), m.as("m"))
      .select(explode(col("ks")).as("key"), col("m"))
      .select(col("key"),
        when(col("key").isin(CorruptUnparsedKey, CorruptNestedKey),
          lit(null))
          .otherwise(element_at(col("m"), col("key"))).as("v"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_present"),
        count(when(col("v").rlike("^-?[0-9]+(\\.[0-9]+)?$"), 1))
          .as("n_numeric"),
        count(when(lower(col("v")).isin("true", "false"), 1))
          .as("n_boolean"))
  }

  /** [[auditJsonl]]'s bucket for lines that are not valid JSON. */
  val CorruptUnparsedKey = "_unparsed"

  /** [[auditJsonl]]'s bucket for valid-JSON lines whose top-level
    * values nest (object/array) — parseable, but not by a flat map.
    */
  val CorruptNestedKey = "_nested"

  /** Write `df` as JSONL part files (the inverse of [[jsonl]]). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Write `df` as headerless CSV part files (inverse of [[csv]]). */
  def writeCsv(df: DataFrame, path: String, sep: String = ","): Unit =
    df.write.mode("overwrite").option("header", "false")
      .option("sep", sep).csv(path)

  /** Schema-evolution-tolerant parquet read over heterogeneous
    * directories: the physical schemas are unioned by NAME
    * (`mergeSchema`), columns a file lacks surface as nulls, and the
    * output column order is pinned (sorted, id-ish columns first via
    * the caller's select) so downstream code never depends on which
    * partition happened to be listed first. This is the 100 TB
    * steady state — a year of daily partitions never shares one
    * frozen schema; the alternative (failing the read, or silently
    * taking partition 0's schema) loses columns added mid-corpus.
    * Incompatible TYPES for the same column name still fail loudly:
    * schema drift is tolerated, type conflict is corruption.
    */
  def parquetUnion(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "parquetUnion needs at least one path")
    val df = spark.read.option("mergeSchema", "true")
      .parquet(paths: _*)
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
  }
}
