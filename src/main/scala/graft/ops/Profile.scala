package graft.ops

import graft.functions.GraftFunctions
import graft.functions.TopKPairsAgg
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One column to profile: `key` is the NDV identity rendered as an
  * engine-portable string (exact integers or raw strings — never a
  * raw double, whose string rendering differs across engines), `ord`
  * is the orderable form min/max run over (long or string; the
  * result is emitted as a string either way).
  */
final case class ProfileSpec(name: String, key: Column, ord: Column)

/** ANALYZE TABLE for the engine: per-column row/null counts, min/max,
  * and a KMV distinct-count sketch — the statistics a cost-based
  * planner (join ordering, broadcast thresholds, bucket sizing) needs
  * at 100 TB, where `count(DISTINCT col)` per column is its own
  * full shuffle each.
  *
  * Scale shape: ONE map-side-combined pass over the table for every
  * count/min/max/HLL (a single global aggregation, no groupBy
  * exchange), then ONE sketch pass: the table unpivots to
  * (column, hash) pairs which are cut by per-column thresholds sized
  * from the first pass's HLL estimates BEFORE any exchange, so the
  * distinct + top-k aggregation sees O(columns × oversample × k)
  * rows however large the table is. The ×8 widening loop re-runs
  * only the columns that came up short, making the thresholded
  * answer provably equal to the unthresholded one (same policy as
  * [[Sketch.kmvDistinct]]). Estimates use the shared KMV estimator,
  * so the whole profile is replayable in the DuckDB twin.
  */
object Profile {

  private val PhMod = GraftFunctions.PhMod

  def tableProfile(df: DataFrame, specs: Seq[ProfileSpec],
      k: Int, oversample: Int = Sketch.KmvOversample): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(specs.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession

    // pass A: every per-column count/min/max/HLL in one aggregation
    val aggs = specs.flatMap { s =>
      Seq(count(s.key).as(s"n_${s.name}"),
        min(s.ord).cast("string").as(s"mn_${s.name}"),
        max(s.ord).cast("string").as(s"mx_${s.name}"),
        approx_count_distinct(s.key).as(s"ad_${s.name}"))
    } :+ count(lit(1)).as("total")
    val a = df.agg(aggs.head, aggs.tail: _*).head()
    val total = a.getAs[Long]("total")

    // pass B: per-column k-smallest distinct hashes, thresholded from
    // the HLL estimate, widened x8 per short column
    def initT(approxN: Long): Long =
      if (approxN <= oversample.toLong * k) PhMod
      else math.max(1L,
        (PhMod.toDouble * (oversample.toLong * k) / approxN).toLong)
    var thresholds = specs.map(s =>
      s.name -> initT(math.max(1L, a.getAs[Long](s"ad_${s.name}")))).toMap
    var sketches = Map.empty[String, (Long, Long)] // name -> (nKept, kth)
    var pending = specs
    while (pending.nonEmpty) {
      val tMap = map(pending.flatMap(s =>
        Seq(lit(s.name), lit(thresholds(s.name)))): _*)
      val kept = df.select(explode(array(pending.map(s =>
          struct(lit(s.name).as("c"), Sketch.kmvHash(s.key).as("h"))): _*))
          .as("e"))
        .select(col("e.c").as("c"), col("e.h").as("h"))
        .where(col("h").isNotNull && col("h") < element_at(tMap, col("c")))
        .distinct()
        .groupBy("c")
        .agg(TopKPairsAgg.topkPairs(lit(PhMod) - col("h"), col("h"), k)
          .as("top"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[Row](1).map(_.getLong(1))).toMap
      val next = pending.filter { s =>
        val hs = kept.getOrElse(s.name, Seq.empty)
        sketches += s.name -> (hs.length.toLong,
          if (hs.isEmpty) PhMod else hs.max)
        hs.length < k && thresholds(s.name) < PhMod
      }
      thresholds = thresholds ++ next.map(s =>
        s.name -> math.min(PhMod, thresholds(s.name) * 8)).toMap
      pending = next
    }

    val rows = specs.map { s =>
      val (nKept, kth) = sketches(s.name)
      val est =
        if (nKept < k) nKept.toDouble else Sketch.kmvEstimate(k, kth)
      Row(s.name, total, total - a.getAs[Long](s"n_${s.name}"),
        a.getAs[String](s"mn_${s.name}"), a.getAs[String](s"mx_${s.name}"),
        nKept, if (nKept < k) -1L else kth, est)
    }
    DriverRoute.frameOf(spark, rows,
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_null", LongType, nullable = false),
        StructField("min_v", StringType),
        StructField("max_v", StringType),
        StructField("n_kept", LongType, nullable = false),
        StructField("kth_hash", LongType, nullable = false),
        StructField("ndv_est", DoubleType, nullable = false))))
      .orderBy("column")
  }
}
