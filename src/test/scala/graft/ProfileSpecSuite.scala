package graft

import graft.functions.GraftFunctions
import graft.ops.{Profile, ProfileSpec}
import org.apache.spark.sql.functions._

/** The ANALYZE-style table profile: counts/nulls/min-max and the KMV
  * NDV sketch against brute-force recomputation, both the exact
  * (ndv < k) and estimator branches, and the threshold-widening loop
  * under a deliberately tiny oversample.
  */
class ProfileSpecSuite extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    // 1000 rows: id 0..999; g = id % 7 (ndv 7 < k); s nullable string
    (0L until 1000L).map { i =>
      (i, i % 7, if (i % 5 == 0) None else Some(s"v${i % 400}"))
    }.toDF("id", "g", "s")
  }

  test("profile: counts, nulls, min/max, exact branch below k") {
    val got = Profile.tableProfile(fixture(), Seq(
        ProfileSpec("g", col("g").cast("string"), col("g")),
        ProfileSpec("s", col("s"), col("s"))), k = 512)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert(g.getLong(1) == 1000L && g.getLong(2) == 0L)
    assert(g.getString(3) == "0" && g.getString(4) == "6")
    // ndv 7 < k: sketch saw everything — exact count, sentinel hash
    assert(g.getLong(5) == 7L && g.getLong(6) == -1L)
    assert(g.getDouble(7) == 7.0)
    val s = got("s")
    assert(s.getLong(1) == 1000L && s.getLong(2) == 200L) // nulls
    assert(s.getString(3) == "v1" && s.getString(4) == "v99") // lexicographic
    assert(s.getLong(5) == 320L && s.getDouble(7) == 320.0) // 400 - 80 nulled-out
  }

  test("profile: estimator branch matches the brute-force k-th hash") {
    val k = 32
    val got = Profile.tableProfile(fixture(), Seq(
        ProfileSpec("id", col("id").cast("string"), col("id"))), k = k)
      .collect().head
    val hashes = (0L until 1000L)
      .map(i => GraftFunctions.sampleHashLocal(i.toString))
      .distinct.sorted
    val kth = hashes(k - 1)
    assert(got.getLong(5) == k.toLong)
    assert(got.getLong(6) == kth)
    assert(got.getDouble(7) ==
      ((k - 1).toLong * GraftFunctions.PhMod).toDouble / kth.toDouble)
    // the estimate is in the right ballpark for a uniform hash
    assert(got.getDouble(7) > 500 && got.getDouble(7) < 2000)
  }

  test("profile: widening loop recovers from an undersized threshold") {
    // oversample 1 with k 64 over ndv 1000 sets the initial threshold
    // near PhMod/16 of the needed mass; the x8 widening must still
    // land the exact same k-th hash as the unthresholded run
    val a = Profile.tableProfile(fixture(), Seq(
        ProfileSpec("id", col("id").cast("string"), col("id"))),
      k = 64, oversample = 1).collect().head
    val b = Profile.tableProfile(fixture(), Seq(
        ProfileSpec("id", col("id").cast("string"), col("id"))),
      k = 64, oversample = 64).collect().head
    assert(a.getLong(5) == b.getLong(5) && a.getLong(6) == b.getLong(6))
    assert(a.getDouble(7) == b.getDouble(7))
  }
}
