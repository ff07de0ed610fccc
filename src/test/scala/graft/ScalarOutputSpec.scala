package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-harness contract over the WHOLE declared surface: the
  * oracle checker sorts result frames with pandas, which cannot hash
  * ARRAY/STRUCT/MAP cells (round-10's q_session_export red row:
  * `TypeError: unhashable type: 'numpy.ndarray'`). Every query in
  * SparkEntry.queries must therefore emit scalar columns only. This
  * spec builds each query's plan at sf0.001 and audits the output
  * schema — analysis only, no collect — so a non-scalar column fails
  * the suite before it can fail the round.
  */
class ScalarOutputSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("every declared query emits scalar output columns only") {
    val offenders = SparkEntry.defs.flatMap { q =>
      val bad = q.fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
      spark.catalog.clearCache()
      bad
    }
    assert(offenders.isEmpty,
      s"non-scalar output columns (driver cannot verify these): " +
        offenders.mkString("; "))
  }
}
