package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only the named queries (local iteration).
    // Unknown names fail fast — a typo would otherwise filter the run to
    // zero queries and exit 0, reading as a green verify.
    val only = args.drop(2).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // driver harness constraint: the oracle checker sorts result
        // frames with pandas, which cannot hash ARRAY/STRUCT/MAP cells
        // — every declared query must emit scalar columns only. Fail
        // the query HERE (visibly, per-row) rather than letting the
        // driver's sorter throw an opaque TypeError.
        val nonScalar = df.schema.fields.filter { f =>
          f.dataType match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType => true
            case _ => false
          }
        }
        require(nonScalar.isEmpty, s"non-scalar output columns: " +
          nonScalar.map(f => s"${f.name}:${f.dataType.simpleString}")
            .mkString(", "))
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures += name -> String.valueOf(e.getMessage)
      }
      // queries share nothing across the loop; drop any cache an
      // iterative operator (kmeans, connected components) left behind
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // a run with skipped queries must be distinguishable from a green
    // one: the failure map lands as an artifact next to the outputs
    // (one loud summary line too), and under SPARK_GRAFT_VERIFY_STRICT
    // the process exits non-zero. The default stays exit-0 because the
    // driver's per-query compare already reports each missing output
    // as a red row, and its tolerance for a non-zero Verify exit is
    // unknown — strict mode is for local iteration and CI.
    Files.writeString(Paths.get(s"$outDir/_failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} quer" +
        (if (failures.size == 1) "y" else "ies") +
        s" FAILED (outputs missing): ${failures.keys.mkString(", ")}")
      if (sys.env.get("SPARK_GRAFT_VERIFY_STRICT").contains("1")) {
        spark.stop()
        sys.exit(1)
      }
    }
    spark.stop()
  }
}
