package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout (graft.ops.Layout).
  *
  * Contracts:
  *  1. zValue is the Morton interleave (pinned against a scalar
  *     reference implementation);
  *  2. quantileBucket maps values to their boundary rank;
  *  3. the layout claim itself: after zorderWrite on two independent
  *     dimensions, a narrow predicate on EITHER dimension overlaps
  *     only a fraction of the output files' min/max ranges, while a
  *     single-column-sorted layout of the same data prunes nothing on
  *     the non-sorted dimension. This is the file-skipping property
  *     parquet row-group stats turn into scan savings at 100 TB.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(vals: Seq[Long], bits: Int): Long =
    (for {
      i <- 0 until bits
      (v, j) <- vals.zipWithIndex
    } yield ((v >> i) & 1L) << (i * vals.size + j)).sum

  test("zValue matches the scalar Morton reference") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12L, 10L),
      (65535L, 65535L), (40000L, 123L))
    val got = rows.toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(_.getLong(0))
    val want = rows.map { case (x, y) => mortonRef(Seq(x, y), 16) }
    assert(got.toSeq === want)
    // three dimensions, too
    val got3 = Seq((5L, 9L, 2L)).toDF("a", "b", "c")
      .select(Layout.zValue(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .head().getLong(0)
    assert(got3 === mortonRef(Seq(5L, 9L, 2L), 8))
  }

  test("quantileBucket counts boundaries at or below the value") {
    val bounds = (1 until 16).map(_ * 10.0).toArray // 10,20,...,150
    val got = Seq(0L, 9L, 10L, 55L, 150L, 999L).toDF("v")
      .select(Layout.quantileBucket(col("v"), bounds, 4).as("b"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 0L, 1L, 5L, 15L, 15L))
  }

  test("z-order layout prunes on both dimensions; linear sort on one") {
    val n = 20000
    val rnd = new scala.util.Random(7)
    val df = (0 until n).map(_ => (rnd.nextInt(4096).toLong,
      rnd.nextInt(4096).toLong)).toDF("x", "y")
    val root = java.nio.file.Files.createTempDirectory("graft-zorder")
      .toString

    Layout.zorderWrite(df, Seq("x", "y"), s"$root/z", bits = 4, nFiles = 16)
    df.repartitionByRange(16, col("y")).sortWithinPartitions("y")
      .write.parquet(s"$root/linear")

    // files whose [min,max] range overlaps the predicate — what
    // parquet footer stats give the scan for free
    def touched(dir: String, c: String, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"))
      (stats.filter(col("lo") <= hi).count(), stats.count())
    }

    val sel = 255L // ~1/16 of either dimension
    val (zx, zn) = touched(s"$root/z", "x", sel)
    val (zy, _) = touched(s"$root/z", "y", sel)
    val (lx, ln) = touched(s"$root/linear", "x", sel)
    assert(zn === 16L && ln === 16L)
    // z-order: a 1/16 box on either dim overlaps only the files whose
    // z-range contains that bucket's interleave — a strict minority
    assert(zx <= zn / 2, s"x-predicate touched $zx of $zn z files")
    assert(zy <= zn / 2, s"y-predicate touched $zy of $zn z files")
    // the y-sorted control cannot prune on x: every file spans the
    // full x domain
    assert(lx === ln, s"control pruned on the unsorted dim ($lx of $ln)")
  }
}
