package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Cardinality sketching for pipeline bookkeeping at corpus scale.
  *
  * The reference engine keeps no cardinality statistics (its batch
  * stats are plain counts — `internal/processor/processor.go:469-512`);
  * a 100 TB curation pipeline, however, constantly needs "how many
  * distinct keys/tokens/sessions" answers where an exact
  * `count(DISTINCT ...)` would shuffle the whole key domain. The KMV
  * (k minimum values) estimator gives an oracle-reproducible sketch:
  * unlike an HLL register blob, its state — the k smallest distinct
  * hash values — is plain SQL (`SELECT DISTINCT h ORDER BY h LIMIT k`),
  * so any engine replays it bit-for-bit.
  *
  * Scale shape: the naive formulation shuffles every distinct hash to
  * rank them. Instead:
  *   1. one partial-agg scan (`approx_count_distinct`, HLL, no domain
  *      shuffle) estimates N;
  *   2. a hash threshold `t ≈ PhMod·(oversample·k)/N` keeps an
  *      expected `oversample·k` distinct survivors — the filter runs
  *      map-side, BEFORE any exchange, so the distinct+top-k that
  *      follows exchanges O(k) rows no matter how large the corpus;
  *   3. if fewer than k distinct survive (HLL overestimated), the
  *      threshold widens ×8 and retries — a bounded correctness loop
  *      the oversampling makes vanishingly rare. The final kth-min is
  *      therefore EXACT: the threshold only prunes hashes that cannot
  *      be among the k smallest, so the answer is independent of the
  *      HLL estimate and safe to oracle-check.
  */
object Sketch {

  /** Result of a KMV pass: `nKept` = min(k, total distinct hashes);
    * when `nKept < k` the sketch saw the whole domain and `estimate`
    * is the exact distinct count.
    */
  final case class Kmv(k: Int, nKept: Long, kthHash: Long, estimate: Double)

  /** Expected distinct survivors below the initial threshold, per k.
    * 8× makes a short-by-one retry a ~never event at HLL's default
    * ±5% error while keeping the survivor exchange trivially small.
    */
  val KmvOversample: Int = 8

  /** The sketch hash: scrambled portable hash on [0, PhMod) — uniform
    * enough for order statistics AND reproducible in the SQL twin
    * (portableHash alone clusters on short structured keys; see the
    * sampleHash scaladoc).
    */
  def kmvHash(key: Column): Column = GraftFunctions.sampleHash(key)

  /** The shared threshold-widening scan of the KMV family:
    * `smallest(t)` returns the k smallest qualifying entries with
    * hash < t; the initial threshold is sized from the HLL estimate
    * to keep ~`want` survivors, and widens ×8 until k entries
    * qualify (or the whole domain is admitted) — so the final answer
    * is provably the unthresholded one whatever the estimate did.
    * One policy, used by [[kmvDistinct]] and [[kmvCompare]], so a
    * sizing/widening fix cannot drift between them.
    */
  private def widenToK[T](k: Int, want: Long, approxN: Long,
      smallest: Long => Array[T]): Array[T] = {
    val PhMod = GraftFunctions.PhMod
    var t =
      if (approxN <= want) PhMod
      else math.max(1L, (PhMod.toDouble * want / approxN).toLong)
    var ks = smallest(t)
    while (ks.length < k && t < PhMod) {
      t = math.min(PhMod, t * 8)
      ks = smallest(t)
    }
    ks
  }

  /** Estimate from the kth smallest of distinct uniform hashes on
    * [0, PhMod): est = (k-1)·PhMod / h_k. Exact-integer numerator
    * (< 2^53 for any practical k) divided once, so both engines
    * produce the identical double.
    */
  def kmvEstimate(k: Int, kthHash: Long): Double =
    ((k - 1).toLong * GraftFunctions.PhMod).toDouble / kthHash.toDouble

  /** Result of a KMV set comparison between key sets A and B.
    * The union sketch is the k smallest distinct hashes of A∪B; each
    * kept hash carries presence flags, so `nBoth/nKept` estimates the
    * Jaccard similarity (kept hashes are a uniform sample of the
    * union) and `interEst = jaccardEst · unionEst`. When
    * `nKept < k` the sketch saw the whole union and every figure is
    * exact.
    */
  final case class KmvSet(
      k: Int, nKept: Long, kthHash: Long, nBoth: Long,
      unionEst: Double, jaccardEst: Double, interEst: Double)

  /** Compare two key sets with ONE union sketch — the distributed
    * analog of a theta-sketch intersection, but oracle-reproducible
    * (`SELECT h, max(inA), max(inB) … ORDER BY h LIMIT k` replays in
    * any SQL engine). Same scale shape as [[kmvDistinct]]: an HLL
    * pre-pass sizes a map-side hash threshold, so the only exchange
    * (the per-hash flag-OR aggregation) carries O(oversample·k) rows
    * regardless of corpus size; the ×8 widening loop keeps the
    * thresholded answer provably equal to the unthresholded one.
    */
  def kmvCompare(a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      k: Int, oversample: Int = KmvOversample): KmvSet = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val u = a.select(kmvHash(keyA).as("h"),
        lit(1).as("ia"), lit(0).as("ib"))
      .unionByName(b.select(kmvHash(keyB).as("h"),
        lit(0).as("ia"), lit(1).as("ib")))

    val approxN = math.max(1L,
      u.agg(approx_count_distinct(col("h"))).head().getLong(0))

    // k smallest union hashes below `t` with per-side presence flags:
    // the filter runs BEFORE the flag-OR exchange.
    def smallest(t: Long): Array[(Long, Int, Int)] =
      u.filter(col("h") < t)
        .groupBy("h").agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
        .orderBy(col("h")).limit(k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))

    val ks = widenToK(k, oversample.toLong * k, approxN, smallest)
    val nKept = ks.length.toLong
    val kth = if (ks.isEmpty) 0L else ks.last._1
    val nBoth = ks.count(e => e._2 == 1 && e._3 == 1).toLong
    if (nKept < k) { // saw the whole union: exact
      val jac = if (nKept == 0) 0.0 else nBoth.toDouble / nKept.toDouble
      KmvSet(k, nKept, kth, nBoth, nKept.toDouble, jac, nBoth.toDouble)
    } else {
      val uEst = kmvEstimate(k, kth)
      val jac = nBoth.toDouble / k.toDouble
      KmvSet(k, nKept, kth, nBoth, uEst, jac, jac * uEst)
    }
  }

  /** Fold per-bucket k-min lists (the streaming sketch's emitted
    * state, `streaming.StreamOps.kmvSketchStream`) into the global
    * KMV answer. Exact w.r.t. the batch sketch over the same rows:
    * every one of the global k smallest distinct hashes is the
    * smallest-k of ITS bucket, so the union of bucket lists always
    * contains them.
    */
  def kmvMergeBuckets(k: Int, bucketMins: Seq[Seq[Long]]): Kmv = {
    val ks = bucketMins.flatten.distinct.sorted.take(k)
    if (ks.length < k)
      Kmv(k, ks.length, if (ks.isEmpty) 0L else ks.last, ks.length.toDouble)
    else Kmv(k, k, ks.last, kmvEstimate(k, ks.last))
  }

  /** Count-min sketch: the frequency-family complement of KMV's
    * cardinality estimates. `depth` independent hash rows of `width`
    * counters; a key's estimate is the MIN of its counters — always
    * an OVERestimate (collisions only add), within εN with
    * probability 1−δ for width = e/ε, depth = ln(1/δ). Uses the
    * [[GraftFunctions.minhashA]]/[[GraftFunctions.minhashB]] affine
    * family over [[kmvHash]], so the whole sketch — build AND probe —
    * is integer arithmetic any SQL engine replays exactly.
    *
    * Scale shape: the build is ONE map-side-combining aggregation
    * into depth·width counters (the exchange carries at most
    * depth·width rows per map task, never the key domain); the
    * result is a driver-held array of depth·width longs — the point
    * of the sketch is that this is broadcastable at any corpus size.
    */
  def countMin(df: DataFrame, key: Column, depth: Int,
      width: Int): CountMin = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    val h = kmvHash(key)
    val rows = (0 until depth).map { j =>
      struct(lit(j).as("j"), cmBucket(h, j, width).as("b"))
    }
    val counts = df.select(explode(array(rows: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val table = Array.fill(depth, width)(0L)
    counts.foreach(r => table(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    CountMin(depth, width, table)
  }

  /** Counter index of `hash` in sketch row `j`: an affine rescramble
    * (the minhash permutation family) mod width — shared with the SQL
    * twin via [[cmBucketSqlOver]].
    */
  def cmBucket(hash: Column, j: Int, width: Int): Column =
    pmod(hash * GraftFunctions.minhashA(j) + GraftFunctions.minhashB(j),
      lit(GraftFunctions.PhMod)) % width

  /** DuckDB text of [[cmBucket]] over a hash expression. */
  def cmBucketSqlOver(hashSql: String, j: Int, width: Int): String =
    s"((($hashSql) * ${GraftFunctions.minhashA(j)} + " +
      s"${GraftFunctions.minhashB(j)}) % ${GraftFunctions.PhMod}) % $width"

  /** A materialized count-min table; `estimate` probes it. */
  final case class CountMin(depth: Int, width: Int, table: Array[Array[Long]]) {
    def estimate(hash: Long): Long =
      (0 until depth).map { j =>
        val b = (((hash * GraftFunctions.minhashA(j) +
          GraftFunctions.minhashB(j)) % GraftFunctions.PhMod +
          GraftFunctions.PhMod) % GraftFunctions.PhMod) % width
        table(j)(b.toInt)
      }.min
  }

  /** Run the KMV sketch over `key`. Two scans in the common case
    * (HLL sizing + filtered top-k); every exchange is O(k).
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int,
      oversample: Int = KmvOversample): Kmv = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df.select(kmvHash(key).as("h"))

    val approxN = math.max(1L,
      hashed.agg(approx_count_distinct(col("h"))).head().getLong(0))

    // k smallest distinct hashes below `t`: map-side filter, distinct
    // over ~oversample·k survivors, TakeOrdered merge on the driver.
    def smallest(t: Long): Array[Long] =
      hashed.filter(col("h") < t).distinct()
        .orderBy(col("h")).limit(k)
        .collect().map(_.getLong(0))

    val ks = widenToK(k, oversample.toLong * k, approxN, smallest)
    if (ks.length < k) // saw the whole domain: exact count
      Kmv(k, ks.length, if (ks.isEmpty) 0L else ks.last, ks.length.toDouble)
    else Kmv(k, k, ks.last, kmvEstimate(k, ks.last))
  }

  /** Fixed-bucket histogram quantiles — the one-pass alternative to an
    * exact sort when a rank inside a bucket width is close enough
    * (monitoring dashboards, spill sizing, fence picking): one
    * map-side-combined count per bucket (the only exchange carries
    * O(buckets) rows at ANY table size — an exact percentile is a
    * full sort), then the driver walks the O(buckets) histogram.
    * Out-of-range values land in clamp buckets −1 / `buckets` and
    * estimate as the range edge — never dropped, so ranks stay true.
    *
    * Exactness across engines: bucket indexing and the in-bucket
    * linear interpolation both run the IDENTICAL IEEE expression
    * sequence the SQL twin writes (integers in, one
    * division), and the estimate is quantized to e6. Returns one row
    * per requested permille: (q_pm, n, rank, bucket, est_e6).
    */
  def histogramQuantiles(df: DataFrame, value: Column, lo: Double,
      hi: Double, buckets: Int, qsPm: Seq[Int]): DataFrame = {
    require(buckets > 0 && hi > lo, "need hi > lo and buckets > 0")
    require(qsPm.nonEmpty && qsPm.forall(q => q >= 1 && q <= 1000),
      "quantiles are permille in [1, 1000]")
    val spark = df.sparkSession
    val w = (hi - lo) / buckets
    val bucket = when(value < lo, lit(-1))
      .when(value >= hi, lit(buckets))
      .otherwise(floor((value - lit(lo)) / lit(w)).cast("int"))
    val hist = df.select(bucket.as("bk")).where(col("bk").isNotNull)
      .groupBy("bk").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val n = hist.map(_._2).sum
    val cum = hist.scanLeft(0L)(_ + _._2).tail // cumulative per bucket
    // empty / all-null input: n = 0 makes every rank 0 and
    // indexWhere(_ >= 0) = -1 on the empty histogram — hist(-1) would
    // throw an opaque ArrayIndexOutOfBounds. Zero rows is the honest
    // answer: there is no quantile of nothing.
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], histQuantSchema)
    val rows = qsPm.sorted.map { q =>
      val r = math.ceil(q / 1000.0 * n).toLong
      val i = cum.indexWhere(_ >= r)
      val (bk, cnt) = hist(i)
      val cumBefore = cum(i) - cnt
      val est =
        if (bk == -1) lo
        else if (bk >= buckets) hi
        else lo + w * bk + w * (r - cumBefore) / cnt
      Row(q.toLong, n, r, bk.toLong, math.round(est * 1000000d))
    }
    DriverRoute.frameOf(spark, rows, histQuantSchema)
  }

  private val histQuantSchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q_pm",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("est_e6",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** EXACT top-`k` most frequent keys via the Misra-Gries two-pass —
    * the hot-key detector (skew diagnosis, stop-word discovery,
    * crawl-host concentration) that never shuffles the key domain:
    *
    *   1. one scan reduces to ≤ `capacity` candidate counters per
    *      task before the exchange ([[graft.functions.MgHeavyAgg]],
    *      shuffle = O(capacity · tasks)), with the summary's
    *      accumulated error bound `err` carried alongside — every key
    *      whose true count exceeds `err` is PROVABLY in the summary;
    *   2. a second scan counts ONLY the ≤ capacity candidates exactly
    *      (broadcast semi-join ahead of the exchange, which then
    *      carries O(capacity) rows).
    *
    * The result is exact, not approximate: if the k-th candidate's
    * exact count clears `err`, no non-candidate can belong to the
    * top-k; when it doesn't (adversarially flat data for the chosen
    * capacity) the call FAILS LOUDLY asking for a larger capacity —
    * never a silently wrong ranking. `err == 0` (no eviction ever
    * happened, the summary is the complete exact key census) skips
    * the bar.
    *
    * Returns (key, cnt, rk) — the top `k` by (cnt desc, key asc).
    */
  def heavyHittersExact(df: DataFrame, key: Column, k: Int,
      capacity: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(capacity > k, s"need capacity > k, got $capacity <= $k")
    val spark = df.sparkSession
    val keyed = df.select(key.cast("string").as("__k"))
      .filter(col("__k").isNotNull)
    val sum0 = keyed
      .agg(graft.functions.MgHeavyAgg.mgSummary(col("__k"), capacity)
        .as("s")).head().getStruct(0)
    val err = sum0.getLong(0)
    val cands = sum0.getSeq[Row](1).map(_.getString(0))
    // an empty summary is only a real "no keys" answer when nothing
    // was ever evicted; with err > 0 it means every counter cancelled
    // out (adversarially flat data) and nothing is provable
    require(cands.nonEmpty || err == 0L,
      s"heavyHittersExact: the summary cancelled out entirely (error " +
        s"bound $err, zero candidates) — no top-$k is provable at " +
        s"capacity $capacity; raise the capacity")
    if (cands.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], heavySchema)
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(cands.map(Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__k",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val exact = keyed.join(broadcast(candDf), "__k")
      .groupBy("__k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("__k"))
      .limit(k)
      .collect()
    if (err > 0L) {
      require(exact.length == k && exact.last.getLong(1) > err,
        s"heavyHittersExact: the $k-th candidate count " +
          s"(${if (exact.length == k) exact.last.getLong(1) else "n/a"})" +
          s" does not clear the summary's error bound $err — the " +
          s"top-$k is not provable at capacity $capacity; raise the " +
          "capacity")
    }
    val rows = exact.zipWithIndex.map { case (r, i) =>
      Row(r.getString(0), r.getLong(1), i + 1L)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), heavySchema)
  }

  private val heavySchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rk",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Per-group [[heavyHittersExact]] — the hot-key census BY a
    * bounded dimension (crawl host, source, event type): one MG
    * summary per group off a single scan (still O(capacity) shuffled
    * per task per group), one exact-count scan of the ≤
    * groups·capacity candidates, the same provable-or-loud guarantee
    * applied PER GROUP. Driver state is O(groups · capacity), guarded
    * by `maxGroups` — this is a bounded-dimension operator, not a
    * per-document one.
    *
    * Returns (group, key, cnt, rk) — each group's top `k` by
    * (cnt desc, key asc).
    */
  def heavyHittersExactBy(df: DataFrame, grp: Column, key: Column,
      k: Int, capacity: Int, maxGroups: Int = 4096): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(capacity > k, s"need capacity > k, got $capacity <= $k")
    val spark = df.sparkSession
    val keyed = df.select(grp.cast("string").as("__g"),
      key.cast("string").as("__k"))
      .filter(col("__g").isNotNull && col("__k").isNotNull)
    val sums = keyed.groupBy("__g")
      .agg(graft.functions.MgHeavyAgg.mgSummary(col("__k"), capacity)
        .as("s"))
      .collect()
    require(sums.length <= maxGroups,
      s"heavyHittersExactBy: ${sums.length} groups exceed the " +
        s"$maxGroups bound — the group column must be a bounded " +
        "dimension")
    if (sums.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], heavyBySchema)
    val errs = sums.map { r =>
      r.getString(0) -> r.getStruct(1).getLong(0)
    }.toMap
    val candRows = sums.flatMap { r =>
      val g = r.getString(0)
      r.getStruct(1).getSeq[Row](1).map(it => Row(g, it.getString(0)))
    }
    val groupsWithCands = candRows.map(_.getString(0)).toSet
    errs.foreach { case (g, err) =>
      require(groupsWithCands(g) || err == 0L,
        s"heavyHittersExactBy: group '$g' cancelled out entirely " +
          s"(error bound $err, zero candidates) — raise the capacity")
    }
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__k",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val exact = keyed.join(broadcast(candDf), Seq("__g", "__k"))
      .groupBy("__g", "__k").agg(count(lit(1)).as("cnt"))
      .collect() // ≤ groups·capacity rows by construction
      .groupBy(_.getString(0))
    val out = exact.toSeq.sortBy(_._1).flatMap { case (g, rows) =>
      val err = errs(g)
      val top = rows.map(r => (r.getString(1), r.getLong(2)))
        .sortBy { case (kk, c) => (-c, kk) }.take(k)
      if (err > 0L)
        require(top.length == k && top.last._2 > err,
          s"heavyHittersExactBy: group '$g': the $k-th candidate " +
            s"count does not clear the error bound $err — raise the " +
            "capacity")
      top.zipWithIndex.map { case ((kk, c), i) => Row(g, kk, c, i + 1L) }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*), heavyBySchema)
  }

  private val heavyBySchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rk",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** [[heavyHittersExact]]'s confirm pass over a SNAPSHOT of
    * streaming summaries ([[graft.streaming.StreamOps.mgHeavyStream]]
    * output rows: bucket, ver, err, keys, cnts — any mix of versions;
    * the max-ver row per bucket is the standing state). Buckets
    * partition the key space, so the global guarantee composes from
    * the per-bucket invariants: a key ABSENT from its bucket's
    * summary has true count ≤ that bucket's err ≤ the max err across
    * buckets — so if the k-th candidate's exact count clears the max
    * err, no non-candidate can belong to the top-k. Same
    * provable-or-loud contract as the batch operator, same one
    * exact-count scan of the ≤ buckets·cap candidates.
    *
    * Returns (key, cnt, rk) — the top `k` by (cnt desc, key asc) over
    * everything the stream ingested, exactly.
    */
  def heavyHittersExactFromSummaries(df: DataFrame, key: Column,
      summaries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = df.sparkSession
    // O(buckets · cap · triggers) rows by construction — bounded
    val snap = summaries
      .select(col("bucket"), col("ver"), col("err"), col("keys"))
      .collect()
      .groupBy(_.getInt(0)).map { case (_, rows) =>
        rows.maxBy(_.getLong(1))
      }.toSeq
    val maxErr = if (snap.isEmpty) 0L else snap.map(_.getLong(2)).max
    val cands = snap.flatMap(_.getSeq[String](3)).distinct
    require(cands.nonEmpty || maxErr == 0L,
      s"heavyHittersExactFromSummaries: every bucket summary " +
        s"cancelled out (max error bound $maxErr, zero candidates) — " +
        s"no top-$k is provable; raise the stream's capacity")
    if (cands.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], heavySchema)
    val keyed = df.select(key.cast("string").as("__k"))
      .filter(col("__k").isNotNull)
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(cands.map(Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__k",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val exact = keyed.join(broadcast(candDf), "__k")
      .groupBy("__k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("__k"))
      .limit(k)
      .collect()
    if (maxErr > 0L) {
      require(exact.length == k && exact.last.getLong(1) > maxErr,
        s"heavyHittersExactFromSummaries: the $k-th candidate count " +
          s"(${if (exact.length == k) exact.last.getLong(1) else "n/a"})" +
          s" does not clear the max bucket error bound $maxErr — the " +
          s"top-$k is not provable; raise the stream's capacity")
    }
    val rows = exact.zipWithIndex.map { case (r, i) =>
      Row(r.getString(0), r.getLong(1), i + 1L)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), heavySchema)
  }
}
