package graft

import graft.functions.GraftFunctions
import graft.ops.Sketch
import org.apache.spark.sql.functions._

/** KMV distinct-cardinality sketch (graft.ops.Sketch).
  *
  * Contracts:
  *  1. threshold-independence — the kth-min (and thus the estimate)
  *     from the thresholded two-scan path equals the brute-force
  *     full-distinct kth-min (the threshold may only prune hashes
  *     that cannot rank in the top k);
  *  2. exact fallback — a domain smaller than k reports the exact
  *     count;
  *  3. accuracy — at n >> k the estimate lands within the standard
  *     KMV error envelope (a few × 1/sqrt(k));
  *  4. scale shape — the survivor filter precedes every exchange, so
  *     the distinct aggregation sees O(k) rows, not the domain.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("thresholded kth-min equals brute-force kth-min") {
    val df = spark.range(0L, 20000L).toDF("id")
    val key = concat_ws("|", lit("k"), col("id"))
    val k = 128
    val r = Sketch.kmvDistinct(df, key, k)
    val brute = df.select(Sketch.kmvHash(key).as("h"))
      .distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0))
    assert(r.nKept === k)
    assert(r.kthHash === brute.last)
    assert(r.estimate === Sketch.kmvEstimate(k, brute.last))
  }

  test("domain smaller than k falls back to the exact count") {
    val df = spark.range(0L, 37L).toDF("id")
    // 4 distinct keys, duplicated across 37 rows
    val key = concat_ws("|", lit("s"), col("id") % 4)
    val r = Sketch.kmvDistinct(df, key, k = 64)
    assert(r.nKept === 4L)
    assert(r.estimate === 4.0)
  }

  test("estimate is within the KMV error envelope at n >> k") {
    val n = 50000L
    val k = 256
    val df = spark.range(0L, n).toDF("id")
    val r = Sketch.kmvDistinct(df, concat_ws("|", lit("e"), col("id")), k)
    val relErr = math.abs(r.estimate - n) / n
    // std err ~ 1/sqrt(k-2) ≈ 6.3%; 4 sigma keeps the test stable
    // while still catching an off-by-domain bug (which is >> 25%)
    assert(relErr < 0.25, s"estimate ${r.estimate} vs $n (relErr $relErr)")
  }

  test("kmvCompare: small union reports exact union/inter/jaccard") {
    // A = {0..99}, B = {50..149}: union 150, inter 50, J = 1/3
    val a = spark.range(0L, 100L).toDF("id")
    val b = spark.range(50L, 150L).toDF("id")
    val key = concat_ws("|", lit("c"), col("id"))
    val r = Sketch.kmvCompare(a, key, b, key, k = 512)
    assert(r.nKept === 150L)
    assert(r.unionEst === 150.0)
    assert(r.interEst === 50.0)
    assert(r.jaccardEst === 50.0 / 150.0)
  }

  test("kmvCompare: thresholded sketch equals the brute-force sketch") {
    val a = spark.range(0L, 30000L).toDF("id")
    val b = spark.range(15000L, 45000L).toDF("id")
    val key = concat_ws("|", lit("t"), col("id"))
    val k = 128
    val r = Sketch.kmvCompare(a, key, b, key, k)
    // brute force: distinct union hashes with presence flags, top k
    val u = a.select(Sketch.kmvHash(key).as("h"), lit(1).as("ia"),
        lit(0).as("ib"))
      .unionByName(b.select(Sketch.kmvHash(key).as("h"), lit(0).as("ia"),
        lit(1).as("ib")))
      .groupBy("h").agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .orderBy("h").limit(k).collect()
    assert(r.nKept === k.toLong)
    assert(r.kthHash === u.last.getLong(0))
    assert(r.nBoth ===
      u.count(x => x.getInt(1) == 1 && x.getInt(2) == 1).toLong)
    // estimates land in the KMV envelope around the truth
    assert(math.abs(r.unionEst - 45000.0) / 45000.0 < 0.3)
    assert(math.abs(r.jaccardEst - 15000.0 / 45000.0) < 0.15)
  }

  test("countMin: never undercounts, exact at no-collision width") {
    // 2000 rows over 50 keys with zipf-ish skew
    val df = spark.range(0L, 2000L)
      .select((col("id") % (col("id") % 50L + 1L)).as("k"))
    val key = concat_ws("|", lit("cm"), col("k"))
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tiny sketch: collisions guaranteed -> estimates only ever OVER
    val tiny = Sketch.countMin(df, key, depth = 2, width = 4)
    // roomy sketch: 2x50 keys in 4x512 counters -> near-always exact
    val big = Sketch.countMin(df, key, depth = 4, width = 512)
    exact.foreach { case (k, n) =>
      val h = GraftFunctions.sampleHashLocal(s"cm|$k")
      assert(tiny.estimate(h) >= n, s"undercount for $k")
      assert(big.estimate(h) === n, s"collision at width 512 for $k")
    }
    // total mass per row is conserved
    assert(tiny.table.map(_.sum).toSeq === Seq(2000L, 2000L))
  }

  test("the survivor filter keeps the distinct exchange at O(k)") {
    val n = 200000L
    val k = 64
    val df = spark.range(0L, n).toDF("id")
    val key = concat_ws("|", lit("x"), col("id"))
    // replicate the op's first-pass threshold and count survivors:
    // this is the row count entering the ONLY exchange of the
    // sketch's second scan
    val hashed = df.select(Sketch.kmvHash(key).as("h"))
    val approxN = hashed.agg(approx_count_distinct(col("h")))
      .head().getLong(0)
    val want = Sketch.KmvOversample.toLong * k
    val t = (GraftFunctions.PhMod.toDouble * want / approxN).toLong
    val survivors = hashed.filter(col("h") < t).count()
    assert(survivors < 16L * want,
      s"$survivors survivors for want=$want — threshold not pruning")
    assert(survivors >= k, "threshold pruned below k — retry loop territory")
  }

  test("histogramQuantiles: closed-form ranks, interpolation, clamps") {
    import spark.implicits._
    // 1..100 over [0,100) x 10 buckets: b0 holds 9 values (1..9),
    // b1..b9 ten each, v=100 clamps into the overflow bucket
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = Sketch.histogramQuantiles(df, col("v"), 0.0, 100.0, 10,
        Seq(10, 500, 1000))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // p50: rank 50 lands in b5 (cum 49 before, 10 inside):
    //   est = 50 + 10*(50-49)/10 = 51
    assert(got(500L) == ((100L, 50L, 5L, 51000000L)))
    // p1000: rank 100 is the clamped v=100 -> overflow bucket, est=hi
    assert(got(1000L) == ((100L, 100L, 10L, 100000000L)))
    // p10: rank 1 in b0 (9 values): est = 10*(1-0)/9 = 1.111...
    assert(got(10L) == ((100L, 1L, 0L, 1111111L)))
    // underflow clamp estimates the low edge
    val u = Sketch.histogramQuantiles(
        Seq(-5.0, 5.0, 15.0).toDF("v"), col("v"), 0.0, 20.0, 2,
        Seq(333, 1000))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(u(333L) == ((-1L, 0L)))          // rank 1 -> underflow, est lo
    assert(u(1000L) == ((1L, 20000000L)))   // top bucket interpolates to 20
  }

  test("histogramQuantiles: empty / all-null input returns zero rows") {
    import spark.implicits._
    // n = 0 used to walk hist(-1) -> ArrayIndexOutOfBounds; the
    // honest answer is an empty frame with the contract schema
    for (df <- Seq(Seq.empty[Double].toDF("v"),
        Seq[java.lang.Double](null, null).toDF("v"))) {
      val got = Sketch.histogramQuantiles(df, col("v"), 0.0, 100.0, 10,
        Seq(500))
      assert(got.columns.toSeq ==
        Seq("q_pm", "n", "rank", "bucket", "est_e6"))
      assert(got.count() == 0L)
    }
  }
}
