package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without a nested-loop product.
  *
  * Spark turns a bare inequality join condition into
  * BroadcastNestedLoopJoin / CartesianProduct — O(points × intervals)
  * comparisons, the first thing that dies at 100 TB. The standard
  * scalable shape (used by every warehouse range-join optimization,
  * e.g. the published Databricks/Flink binned interval joins) is to
  * quantize the range dimension into fixed-width bins so containment
  * becomes an EQUI-join on the bin id:
  *
  *  - each point falls in exactly one bin (`floor(p / width)`);
  *  - each interval explodes to every bin it overlaps
  *    (`sequence(floor(lo/width), floor(hi/width))`);
  *  - the bin equi-join shuffles both sides by (keys…, bin) — a
  *    hash-partitionable, AQE-planable exchange — and the exact
  *    predicate re-checked after the join removes bin-edge false
  *    positives.
  *
  * Each (point, interval) pair meets in exactly one bin (the point's),
  * so no dedup pass is needed. Shuffle volume is |points| +
  * |intervals| × (avg interval length / width + 1) rows: `width`
  * trades interval fan-out against bin selectivity and should be of
  * the order of the typical interval length.
  *
  * Reference analog: the reference engine has no range join; this is
  * north-star pipeline surface (event-in-window attribution,
  * sessions-vs-incidents, time-range enrichment).
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` rows whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`,
    * optionally also matching on `keys`. All three range columns must
    * be integral (µs timestamps, byte offsets, …). Output carries the
    * columns of both inputs (keys once); the helper bin column never
    * escapes.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(iv, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join on the same binning: rows of `a`
    * and `b` whose [lo, hi] ranges intersect (inclusive ends),
    * optionally matching on `keys`. Both sides explode to their
    * covered bins, but a pair is kept only in the bin containing the
    * OVERLAP START (`max(a.lo, b.lo)`) — a bin both sides provably
    * cover — so each overlapping pair survives in exactly one bin and
    * no distinct/dedup pass is needed. Same scale shape as
    * [[pointInInterval]]: one hash exchange per side on (keys…, bin),
    * never a nested loop.
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), keys :+ "__bin")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === floor(greatest(col(aLo), col(bLo)) / binWidth))
      .drop("__bin")
  }

  /** Brute-force twin of [[pointInInterval]] (broadcast nested loop)
    * — the oracle for specs, never the production path.
    */
  def pointInIntervalBrute(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil): DataFrame = {
    val cond: Column = keys
      .map(k => points(k) === intervals(k))
      .foldLeft(points(pointCol) >= intervals(startCol) &&
        points(pointCol) <= intervals(endCol))(_ && _)
    val joined = points.join(intervals, cond)
    // collapse the duplicated key columns to match the equi-join shape
    keys.foldLeft(joined)((d, k) =>
      d.drop(intervals(k)))
  }

  /** Brute-force twin of [[intervalOverlap]] — spec oracle only. */
  def intervalOverlapBrute(
      a: DataFrame,
      b: DataFrame,
      aLo: String, aHi: String,
      bLo: String, bHi: String,
      keys: Seq[String] = Nil): DataFrame = {
    val cond: Column = keys
      .map(k => a(k) === b(k))
      .foldLeft(a(aLo) <= b(bHi) && b(bLo) <= a(aHi))(_ && _)
    val joined = a.join(b, cond)
    keys.foldLeft(joined)((d, k) => d.drop(b(k)))
  }
}
