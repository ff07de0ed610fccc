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

  /** Per-group exact ROC-AUC: [[binaryAuc]] partitioned by a group
    * column — the per-slice readout (per source, per shard, per
    * language family) that catches a score that separates globally
    * but fails on one slice.
    *
    * Strictly MORE parallel than the ungrouped form: nothing ever
    * touches the driver. The coarse-bin negative offsets become a
    * `Window.partitionBy(grp)` over per-(grp,bin) rows (≤4096 rows
    * per group partition), and the within-bin prefix runs partitioned
    * by (grp, bin). Groups with one class absent report NULL auc
    * (their auc_num is still the exact Mann-Whitney numerator, 0 when
    * a class is empty).
    *
    * Returns one row per group: (grp, n_pos, n_neg, auc_num, auc).
    */
  def binaryAucBy(df: DataFrame, group: Column, score: Column,
      label: Column): DataFrame = {
    val s = df.select(group.as("grp"), score.cast("long").as("__s"),
      label.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val st = s.agg(min("__s"), max("__s")).head()
    require(!st.isNullAt(0), "binaryAucBy needs at least one scored row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    // global equal-width bins: any partition of score space preserves
    // per-group prefix sums, so one global (lo, binW) serves all groups
    val binW = math.max(1L, Math.floorDiv(hi - lo, CoarseBins) + 1L)
    val perScore = s.groupBy("grp", "__s").agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
      sum(when(!col("__y"), 1L).otherwise(0L)).as("__nn"))
      .withColumn("__bin", expr(s"(__s - ${lo}L) div ${binW}L"))
    val wBins = Window.partitionBy("grp").orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val binOff = perScore.groupBy("grp", "__bin")
      .agg(sum("__nn").as("__bn"))
      .withColumn("__below", coalesce(sum("__bn").over(wBins), lit(0L)))
      .drop("__bn")
    val wIn = Window.partitionBy("grp", "__bin").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore.join(binOff, Seq("grp", "__bin"))
      .withColumn("__cumneg",
        col("__below") + coalesce(sum("__nn").over(wIn), lit(0L)))
      .groupBy("grp")
      .agg(sum("__np").as("n_pos"), sum("__nn").as("n_neg"),
        sum(col("__np") * (lit(2L) * col("__cumneg") + col("__nn")))
          .as("auc_num"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        col("auc_num").cast("long").as("auc_num"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("auc_num").cast("double") /
            (lit(2.0d) * col("n_pos").cast("double") *
              col("n_neg").cast("double"))).as("auc"))
  }

  /** Operating-point sweep: precision / recall / F1 of the rule
    * `score >= threshold` at `nBins` equal-width thresholds — the
    * table a pipeline owner reads to PICK the gate threshold (AUC
    * says the score works; this says where to cut it and what each
    * cut costs in kept-bad vs dropped-good).
    *
    * One corpus scan builds the per-band (n, n_pos) aggregate (same
    * arithmetic binning as [[calibrationBins]] — no ranking); the
    * confusion counts at every threshold are then suffix sums over
    * the O(nBins) band table (a bounded window), and each metric is
    * ONE IEEE division of exact integer counts. Emits all `nBins`
    * thresholds, lowest (loosest gate) first:
    * (bin, threshold, n_pred_pos, tp, fp, fn, tn, precision, recall,
    * f1).
    */
  def thresholdSweep(df: DataFrame, score: Column, label: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val spark = df.sparkSession
    val s = df.select(score.cast("long").as("__s"),
      label.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val st = s.agg(min("__s"), max("__s"), count(lit(1)),
      sum(when(col("__y"), 1L).otherwise(0L))).head()
    require(!st.isNullAt(0), "thresholdSweep needs at least one row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    val (nTot, nPos) = (st.getLong(2), st.getLong(3))
    // positives must exist: recall's denominator is nPos, and a sweep
    // over a corpus with nothing to recall has no operating point
    require(nPos > 0, "thresholdSweep needs at least one positive row")
    val binW = math.max(1L, Math.floorDiv(hi - lo, nBins.toLong) + 1L)
    import spark.implicits._
    val skeleton = (0 until nBins).map(_.toLong).toDF("bin")
    val bands = s
      .withColumn("bin",
        least(expr(s"(__s - ${lo}L) div ${binW}L"),
          lit(nBins.toLong - 1L)).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__npos"))
    // suffix sums over the nBins band rows only — a bounded window,
    // never the corpus
    val wSuf = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    skeleton.join(bands, Seq("bin"), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("__npos", coalesce(col("__npos"), lit(0L)))
      .withColumn("n_pred_pos", sum("__n").over(wSuf))
      .withColumn("tp", sum("__npos").over(wSuf))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(binW)).as("threshold"),
        col("n_pred_pos"), col("tp"),
        (col("n_pred_pos") - col("tp")).as("fp"),
        (lit(nPos) - col("tp")).as("fn"),
        (lit(nTot - nPos) - (col("n_pred_pos") - col("tp"))).as("tn"),
        when(col("n_pred_pos") > 0L, col("tp").cast("double") /
          col("n_pred_pos").cast("double")).otherwise(lit(0.0d))
          .as("precision"),
        (col("tp").cast("double") / lit(nPos.toDouble)).as("recall"),
        (lit(2.0d) * col("tp").cast("double") /
          (lit(2.0d) * col("tp").cast("double") +
            (col("n_pred_pos") - col("tp")).cast("double") +
            (lit(nPos) - col("tp")).cast("double"))).as("f1"))
      .orderBy("bin")
  }

  /** Cohen's kappa between two boolean labelers — the agreement
    * readout a labeling pipeline runs between a model and a heuristic
    * (or two annotators) to decide whether the cheap labeler can
    * stand in for the expensive one: observed agreement corrected by
    * the agreement two independent labelers with these marginals
    * would reach by chance,
    *
    *   κ = (p_o − p_e) / (1 − p_e).
    *
    * One scan, one 4-cell confusion aggregate — no shuffle wider than
    * O(1). Exactness: all counts and count products stay in exact
    * integers (n² fits Long to ~3·10⁹ rows, the [[binaryAuc]] bound);
    * p_o and p_e are each ONE IEEE division, κ one subtraction-ratio —
    * identical op sequence on both engines. Returns one row:
    * (n, n00, n01, n10, n11, po, pe, kappa); κ is NULL when p_e = 1
    * (both labelers constant — chance explains everything).
    */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val s = df.select(labelA.cast("boolean").as("__a"),
      labelB.cast("boolean").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    s.agg(
      count(lit(1)).as("n"),
      sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("n00"),
      sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("n01"),
      sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("n10"),
      sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n11"))
      .withColumn("po",
        (col("n00") + col("n11")).cast("double") / col("n").cast("double"))
      .withColumn("pe",
        ((col("n10") + col("n11")) * (col("n01") + col("n11")) +
          (col("n00") + col("n01")) * (col("n00") + col("n10")))
          .cast("double") / (col("n") * col("n")).cast("double"))
      .withColumn("kappa",
        when(col("pe") < 1.0d,
          (col("po") - col("pe")) / (lit(1.0d) - col("pe"))))
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

  /** Per-group [[calibrationBins]] — one calibration table per slice
    * (crawl source, language), the per-slice companion to
    * [[binaryAucBy]]: a gate model that is calibrated globally but
    * mis-calibrated on one source is exactly the failure this table
    * surfaces. The band geometry is GLOBAL (one (lo, binW) from the
    * whole corpus) so rates are comparable ACROSS slices — bin i
    * means the same score band everywhere.
    *
    * Zero driver work beyond the 2-value geometry row: one scan into
    * a (grp, bin) aggregate, and the all-bands skeleton comes from
    * exploding a literal bin array against the distinct groups — no
    * nested-loop join, nothing group-count-dependent on the driver.
    * Returns (grp, bin, score_lo, n, n_pos, pos_rate) with every
    * group reporting all `nBins` bands (empty bands zero-filled).
    */
  def calibrationBinsBy(df: DataFrame, group: Column, score: Column,
      label: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val s = df.select(group.as("grp"), score.cast("long").as("__s"),
      label.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val st = s.agg(min("__s"), max("__s")).head()
    require(!st.isNullAt(0), "calibrationBinsBy needs at least one row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    val binW = math.max(1L, Math.floorDiv(hi - lo, nBins.toLong) + 1L)
    val agg = s
      .withColumn("bin",
        least(call_function("div", col("__s") - lit(lo), lit(binW)),
          lit(nBins.toLong - 1L)).cast("long"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"))
    val skeleton = s.select("grp").distinct()
      .select(col("grp"),
        explode(lit((0L until nBins.toLong).toArray)).as("bin"))
    skeleton.join(agg, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"),
        (lit(lo) + col("bin") * lit(binW)).as("score_lo"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        when(coalesce(col("n"), lit(0L)) > 0L,
          coalesce(col("n_pos"), lit(0L)).cast("double") /
            col("n").cast("double")).otherwise(lit(0.0d)).as("pos_rate"))
  }

  /** nDCG@k — the retrieval grader: how close is a scorer's top-k
    * ranking to the best ranking its candidates allow?
    *
    *   DCG@k  = Σ_{i≤k} rel_i / log₂(i+1)   (ranking: score desc, id)
    *   IDCG@k = the same sum over rel sorted descending
    *   nDCG   = DCG / IDCG
    *
    * Exactness: the position discount quantizes ONCE per position —
    * w_pos = round(1e9 / (ln(pos+1)/ln 2)), the same ln-ratio
    * expression on both engines (the surprisal-family convention) —
    * so DCG/IDCG are exact integer dot products of (rel, w) and the
    * final ratio is one integer floor division to micro-units.
    *
    * Shape at scale: both the actual and the ideal top-k are
    * TakeOrdered (per-partition partial top-k over the candidate
    * set, never a global sort); the two k-row lists join one
    * O(k)-row weight column and reduce to ONE verdict row —
    * (n_cand, k, dcg_e9, idcg_e9, ndcg_e6), ndcg_e6 null when every
    * candidate has zero relevance.
    *
    * `rel` must be a non-negative integral column.
    */
  /** Per-group [[ndcgAtK]] — one verdict row per `group` (the
    * retrieval sweep's per-query grades), with ZERO driver work: both
    * position assignments are windows PARTITIONED BY the group (the
    * [[binaryAucBy]] pattern), the discounts are the same
    * once-per-position quantization, and one aggregation emits every
    * group's (n_cand, dcg_e9, idcg_e9, ndcg_e6).
    *
    * The per-group window sorts each group's candidate pool — the
    * inherent cost of grading per query; groups are query-sized, and
    * no single-partition exchange ever appears.
    */
  def ndcgAtKBy(df: DataFrame, group: Column, id: Column, rel: Column,
      score: Column, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    requireIntegral(df, rel, "rel")
    requireIntegral(df, score, "score")
    val cand = df.select(group.as("__g"), id.as("__id"),
      rel.cast("long").as("__rel"), score.cast("long").as("__s"))
    val wS = Window.partitionBy("__g")
      .orderBy(col("__s").desc, col("__id"))
    val wR = Window.partitionBy("__g")
      .orderBy(col("__rel").desc, col("__id"))
    def wE9(pos: Column): Column =
      round(lit(1000000000.0d) /
        (log(pos.cast("double") + lit(1.0d)) / log(lit(2.0d))), 0)
        .cast("long")
    cand
      .withColumn("__ps", row_number().over(wS))
      .withColumn("__pr", row_number().over(wR))
      .groupBy("__g")
      .agg(
        count(lit(1)).as("n_cand"),
        coalesce(sum(when(col("__ps") <= k,
          col("__rel") * wE9(col("__ps")))), lit(0L)).as("dcg_e9"),
        coalesce(sum(when(col("__pr") <= k,
          col("__rel") * wE9(col("__pr")))), lit(0L)).as("idcg_e9"))
      .select(col("__g").as("group"), col("n_cand"),
        lit(k.toLong).as("k"), col("dcg_e9"), col("idcg_e9"),
        when(col("idcg_e9") > 0L,
          expr("CAST(dcg_e9 AS DECIMAL(38,0)) * 1000000 div idcg_e9"))
          .as("ndcg_e6"))
  }

  /** The ranking columns are cast to long, so a fractional score
    * would silently truncate-reorder the ranking — refuse non-integral
    * input types loudly instead (quantize fractional scores to `*_e6`
    * integers first, the library-wide convention).
    */
  private def requireIntegral(df: DataFrame, c: Column,
      what: String): Unit = {
    val dt = df.select(c).schema.head.dataType
    dt match {
      case org.apache.spark.sql.types.ByteType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"ndcgAtK: `$what` must be an integral column (got " +
          s"${other.simpleString}) — fractional scores would " +
          "truncate-reorder the ranking; quantize to e6 integers first")
    }
  }

  def ndcgAtK(df: DataFrame, id: Column, rel: Column, score: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    requireIntegral(df, rel, "rel")
    requireIntegral(df, score, "score")
    val cand = df.select(id.as("__id"), rel.cast("long").as("__rel"),
      score.cast("long").as("__s"))
    // one shared discount expression: pos → e9 weight
    def wE9(pos: Column): Column =
      round(lit(1000000000.0d) /
        (log(pos.cast("double") + lit(1.0d)) / log(lit(2.0d))), 0)
        .cast("long")
    def gain(top: DataFrame, order: Seq[Column], name: String): DataFrame = {
      val w = Window.orderBy(order: _*)
      // the position window runs over the already-limited k rows only
      top.withColumn("__pos", row_number().over(w))
        .select(sum(col("__rel") * wE9(col("__pos"))).as(name))
    }
    val dcg = gain(
      cand.orderBy(col("__s").desc, col("__id")).limit(k),
      Seq(col("__s").desc, col("__id")), "dcg_e9")
    val idcg = gain(
      cand.orderBy(col("__rel").desc, col("__id")).limit(k),
      Seq(col("__rel").desc, col("__id")), "idcg_e9")
    cand.agg(count(lit(1)).as("n_cand"))
      .crossJoin(dcg).crossJoin(idcg)
      .select(col("n_cand"), lit(k.toLong).as("k"),
        coalesce(col("dcg_e9"), lit(0L)).as("dcg_e9"),
        coalesce(col("idcg_e9"), lit(0L)).as("idcg_e9"),
        when(coalesce(col("idcg_e9"), lit(0L)) > 0L,
          // DECIMAL(38,0) headroom for the e6 scale-up; integral
          // division of decimals is exact (divideToIntegralValue)
          expr("CAST(dcg_e9 AS DECIMAL(38,0)) * 1000000 div idcg_e9"))
          .as("ndcg_e6"))
  }
}
