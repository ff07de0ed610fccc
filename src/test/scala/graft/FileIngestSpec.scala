package graft

import graft.sources.FileIngest
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Batch JSONL/CSV ingestion with the quarantine split
  * (graft.sources.FileIngest). Contracts:
  *  - every input line is accounted for: good + bad = lines;
  *  - a quarantined line is preserved VERBATIM (replayable after a
  *    parser fix — the DLQ contract);
  *  - a missing JSONL field is schema evolution (null), not a bad
  *    record; a type violation is a bad record;
  *  - write→read roundtrips are lossless for both formats.
  */
class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def tmpWrite(lines: Seq[String], ext: String): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    Files.writeString(dir.resolve(s"part-0.$ext"),
      lines.mkString("\n"))
    dir.toString
  }

  test("jsonl: good/bad split, verbatim quarantine, missing-field null") {
    val lines = Seq(
      """{"id": 1, "name": "a", "score": 0.5}""",
      """{"id": 2, "name": "b"}""", // missing field -> null, good
      """not json at all""", // malformed -> bad
      "", // blank line -> bad (never a phantom all-null good row)
      """{"id": "x&y", "name": "c", "score": 1.0}""") // type clash -> bad
    val ing = FileIngest.jsonl(spark, tmpWrite(lines, "json"), schema)
    val good = ing.good.collect()
    val bad = ing.bad.collect().map(_.getString(0))
    assert(good.length + bad.length === lines.length)
    assert(bad.toSet === Set(lines(2), lines(3), lines(4))) // verbatim
    val byId = good.map(r => r.getLong(0) ->
      ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(byId(1L) === ((Some("a"), Some(0.5))))
    assert(byId(2L) === ((Some("b"), None))) // missing -> null
  }

  test("csv: type and arity violations quarantine (fixed-arity format)") {
    val lines = Seq(
      "1,a,0.5",
      "2,b,oops", // non-numeric score -> bad
      "3,c,1.5,EXTRA", // too many fields -> bad
      "4,d") // too few -> bad too: CSV arity is part of the contract
    val ing = FileIngest.csv(spark, tmpWrite(lines, "csv"), schema)
    val good = ing.good.collect()
    val bad = ing.bad.collect().map(_.getString(0))
    assert(good.length + bad.length === lines.length)
    assert(bad.toSet === Set(lines(1), lines(2), lines(3)))
    assert(good.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("auditJsonl: presence counts, type guesses, unparsed bucket") {
    val lines = Seq(
      """{"a": 1, "b": "x", "c": true}""",
      """{"a": 2.5, "b": "7"}""",
      """not json""",
      """{"d": "false"}""")
    val got = FileIngest.auditJsonl(spark, tmpWrite(lines, "json"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((2L, 2L, 0L))) // 1 and 2.5 both numeric
    assert(got("b") === ((2L, 1L, 0L))) // "7" numeric, "x" not
    assert(got("c") === ((1L, 0L, 1L))) // JSON boolean
    assert(got("d") === ((1L, 0L, 1L))) // string "false" still flags
    assert(got(FileIngest.CorruptUnparsedKey) === ((1L, 0L, 0L)))
    assert(!got.contains(FileIngest.CorruptNestedKey))
  }

  test("auditJsonl: nested values keep their keys; non-object JSON buckets _nested") {
    // object-valued and array-valued FIELDS stringify through the flat
    // map parse (keys surface, values are the raw JSON text — neither
    // numeric nor boolean); only a valid-JSON line whose TOP LEVEL is
    // not an object falls to _nested, and only invalid JSON to
    // _unparsed
    val lines = Seq(
      """{"a": 1}""",
      """{"a": 2, "meta": {"x": 1}}""",
      """{"arr": [1, 2, 3]}""",
      """[1, 2]""",
      """{broken""")
    val got = FileIngest.auditJsonl(spark, tmpWrite(lines, "json"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((2L, 2L, 0L)))
    assert(got("meta") === ((1L, 0L, 0L))) // key surfaces, value is JSON text
    assert(got("arr") === ((1L, 0L, 0L)))
    assert(got(FileIngest.CorruptNestedKey) === ((1L, 0L, 0L)))
    assert(got(FileIngest.CorruptUnparsedKey) === ((1L, 0L, 0L)))
  }

  test("gzip-compressed JSONL parts read transparently") {
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
    val dir = Files.createTempDirectory("graft-gz").toString + "/gz"
    df.write.option("compression", "gzip").json(dir)
    val parts = {
      val it = Files.list(java.nio.file.Paths.get(dir)).iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().toString
      b.result()
    }
    assert(parts.exists(_.endsWith(".json.gz")), parts.mkString(","))
    val ing = FileIngest.jsonl(spark, dir, df.schema)
    assert(ing.bad.isEmpty)
    assert(ing.good.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("jsonl and csv write->read roundtrips are lossless") {
    val df = Seq((1L, "alpha beta", 0.25), (2L, "g,h \"quoted\"", -1.5),
      (3L, "z", 1e9)).toDF("id", "name", "score")
    for ((w, r) <- Seq[((String) => Unit, String => FileIngest.Ingested)](
        (((p: String) => FileIngest.writeJsonl(df, p)),
          (p: String) => FileIngest.jsonl(spark, p, df.schema)),
        (((p: String) => FileIngest.writeCsv(df, p)),
          (p: String) => FileIngest.csv(spark, p, df.schema)))) {
      val dir = Files.createTempDirectory("graft-rt").toString + "/data"
      w(dir)
      val ing = r(dir)
      assert(ing.bad.isEmpty)
      assert(ing.good.orderBy("id").collect().toSeq ===
        df.orderBy("id").collect().toSeq)
    }
  }

  test("parquetUnion: by-name merge, era-missing columns null, order pinned") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("punion").toString
    Seq((1L, "a")).toDF("id", "x").write.parquet(s"$root/e0")
    Seq((2L, 9L)).toDF("id", "y").write.parquet(s"$root/e1")
    val got = graft.sources.FileIngest.parquetUnion(
      spark, Seq(s"$root/e0", s"$root/e1"))
    // columns sorted by name regardless of directory listing order
    assert(got.columns.toSeq == Seq("id", "x", "y"))
    val rows = got.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows.toSeq == Seq(
      (1L, Some("a"), None), (2L, None, Some(9L))))
  }

  test("parquetUnion: same-name type conflict fails loudly, not silently") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("punion2").toString
    Seq((1L, "a")).toDF("id", "x").write.parquet(s"$root/e0")
    Seq((2L, 9.5d)).toDF("id", "x").write.parquet(s"$root/e1")
    intercept[Exception] {
      graft.sources.FileIngest.parquetUnion(
        spark, Seq(s"$root/e0", s"$root/e1")).collect()
    }
  }
}
