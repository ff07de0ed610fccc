package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for quality-filter calibration.
  *
  * A training-data pipeline that gates documents on a model score
  * (NB log-odds, quality heuristics, a fastText-style classifier)
  * needs to pick the threshold from data: ROC-AUC says whether the
  * score separates the classes at all, and a calibration table says
  * what positive rate each score band actually delivers. Both run
  * over the full corpus, so both must avoid the textbook
  * implementation's global sort.
  *
  * Exactness contract: scores are integral (the pipeline's `*_e6`
  * quantized scores), so every intermediate here is exact integer
  * arithmetic; the only floating step is the final division, one
  * identical IEEE op on both engines.
  */
object Eval {

  /** Coarse-bin fan-out used to break global prefix sums into
    * bounded driver work + per-bin parallel windows.
    */
  private val CoarseBins = 4096L

  /** Exact ROC-AUC of an integral score against a boolean label,
    * tie-aware (Mann-Whitney with midrank ties):
    *
    *   AUC = [ Σ_s nPos(s)·(2·cumNegBelow(s) + nNeg(s)) ] / (2·P·N)
    *
    * computed entirely in integers until the final division.
    *
    * Shape at scale: one scan for min/max/class totals; one shuffle
    * collapsing the corpus to per-DISTINCT-score counts; the global
    * prefix sum over those scores is then split two-level — scores
    * are bucketed into ≤4096 coarse bins whose negative-counts
    * cumulate on the driver (O(bins)), and the within-bin prefix runs
    * as a `Window.partitionBy(bin)` (parallel, each partition bounded
    * by that bin's distinct scores). No stage ever sorts the corpus
    * or funnels it through one partition. auc_num stays within Long
    * for corpora to ~3·10⁹ rows (num ≤ 2·P·N).
    *
    * Returns one row: (n_pos, n_neg, auc_num, auc).
    */
  def binaryAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val spark = df.sparkSession
    val s = df.select(score.cast("long").as("__s"),
      label.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val st = s.agg(min("__s"), max("__s"),
      sum(when(col("__y"), 1L).otherwise(0L)),
      sum(when(!col("__y"), 1L).otherwise(0L))).head()
    require(!st.isNullAt(0), "binaryAuc needs at least one scored row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    val (nPos, nNeg) = (st.getLong(2), st.getLong(3))
    require(nPos > 0 && nNeg > 0,
      s"binaryAuc needs both classes present (pos=$nPos neg=$nNeg)")
    // Math.floorDiv throughout: scores may be negative (log-odds)
    val binW = math.max(1L,
      Math.floorDiv(hi - lo, CoarseBins) + 1L)
    val perScore = s.groupBy("__s").agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
      sum(when(!col("__y"), 1L).otherwise(0L)).as("__nn"))
      // `div`, not `/`: Column./ is IEEE double division, which can
      // misbin scores beyond 2^53; div is exact at any magnitude
      .withColumn("__bin", expr(s"(__s - ${lo}L) div ${binW}L"))
    val binNeg = perScore.groupBy("__bin").agg(sum("__nn").as("__bn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // cumulative negatives STRICTLY below each bin — O(bins) driver work
    val offsets = binNeg.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (bin, bn)) => (bin, acc + bn)
    }.sliding(2).map { case Array((_, below), (bin, _)) => (bin, below) }
      .toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__bin", "__below")
    val wBin = Window.partitionBy("__bin").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore.join(broadcast(offDf), "__bin")
      .withColumn("__cumneg",
        col("__below") + coalesce(sum("__nn").over(wBin), lit(0L)))
      .agg(sum(col("__np") * (lit(2L) * col("__cumneg") + col("__nn")))
        .as("auc_num"))
      .select(lit(nPos).as("n_pos"), lit(nNeg).as("n_neg"),
        col("auc_num").cast("long").as("auc_num"),
        (col("auc_num").cast("double") /
          lit(2.0d * nPos.toDouble * nNeg.toDouble)).as("auc"))
  }

  /** Equal-width calibration table: `nBins` score bands over
    * [min, max], each reporting its row count, positive count, and
    * observed positive rate. Equal-width (not ntile) is deliberate:
    * band membership is a pure arithmetic function of the score, so
    * the pass is one scan + one O(nBins) aggregation — no global
    * ranking — and the bands are directly interpretable as score
    * thresholds. Empty bands are emitted with zero counts so the
    * table always has exactly `nBins` rows.
    */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val spark = df.sparkSession
    val s = df.select(score.cast("long").as("__s"),
      label.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val st = s.agg(min("__s"), max("__s")).head()
    require(!st.isNullAt(0), "calibrationBins needs at least one row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    val binW = math.max(1L, Math.floorDiv(hi - lo, nBins.toLong) + 1L)
    import spark.implicits._
    val skeleton = (0 until nBins).map(_.toLong).toDF("bin")
    val agg = s
      .withColumn("bin",
        least(expr(s"(__s - ${lo}L) div ${binW}L"),
          lit(nBins.toLong - 1L)).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
    skeleton.join(agg, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(binW)).as("score_lo"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        when(coalesce(col("n"), lit(0L)) > 0L,
          coalesce(col("n_pos"), lit(0L)).cast("double") /
            col("n").cast("double")).otherwise(lit(0.0d)).as("pos_rate"))
  }
}
