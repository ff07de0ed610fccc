package graft

import graft.ops.{Eval, PipelineOps, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eval (AUC / calibration), PipelineOps.topFractionByWeight, and the
  * BM25 / DSIR scorers: each distributed formulation is pinned
  * against the textbook single-partition definition it must equal.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---- binaryAuc -------------------------------------------------

  /** Brute-force pair-counting AUC with midrank ties. */
  private def bruteAuc(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size.toDouble)
  }

  private def aucOf(rows: Seq[(Long, Boolean)]): (Long, Long, Double) = {
    val r = Eval.binaryAuc(rows.toDF("s", "y"), col("s"), col("y")).head()
    (r.getLong(0), r.getLong(1), r.getDouble(3))
  }

  test("binaryAuc: perfect, inverted, and random separators") {
    val perfect = Seq((10L, true), (9L, true), (1L, false), (0L, false))
    assert(aucOf(perfect) == ((2L, 2L, 1.0)))
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(aucOf(inverted)._3 == 0.0)
  }

  test("binaryAuc: tie handling matches midrank pair counting") {
    val rows = Seq((5L, true), (5L, false), (5L, true), (3L, false),
      (7L, false), (3L, true), (9L, true), (-2L, false))
    assert(math.abs(aucOf(rows)._3 - bruteAuc(rows)) < 1e-12)
  }

  test("binaryAuc: randomized equals brute force across seeds") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      // narrow score domain → many ties; negative scores included
      val rows = Seq.fill(200)((rnd.nextInt(21).toLong - 10L,
        rnd.nextBoolean()))
      if (rows.exists(_._2) && rows.exists(!_._2))
        assert(math.abs(aucOf(rows)._3 - bruteAuc(rows)) < 1e-12)
    }
  }

  test("binaryAuc: wide score range exercises the coarse binning") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((rnd.nextLong() / 1000L, rnd.nextBoolean()))
    assert(math.abs(aucOf(rows)._3 - bruteAuc(rows)) < 1e-12)
  }

  test("binaryAuc: one-class input is rejected") {
    intercept[IllegalArgumentException] {
      Eval.binaryAuc(Seq((1L, true), (2L, true)).toDF("s", "y"),
        col("s"), col("y"))
    }
  }

  // ---- calibrationBins -------------------------------------------

  test("calibrationBins: bands partition rows and rates are exact") {
    val rows = (0L until 100L).map(s => (s, s >= 60L))
    val got = Eval.calibrationBins(rows.toDF("s", "y"), col("s"), col("y"),
      nBins = 10).orderBy("bin").collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(2)).sum == 100L)
    assert(got.map(_.getLong(3)).sum == 40L)
    // scores 0..99, binW = 10: band b covers [10b, 10b+9]
    assert(got(5).getLong(3) == 0L && got(6).getLong(3) == 10L)
    assert(got(6).getDouble(4) == 1.0)
  }

  test("calibrationBins: empty bands are emitted with zero counts") {
    val rows = Seq((0L, false), (1000L, true))
    val got = Eval.calibrationBins(rows.toDF("s", "y"), col("s"), col("y"),
      nBins = 10).orderBy("bin").collect()
    assert(got.length == 10)
    assert(got.count(_.getLong(2) > 0L) == 2)
    assert(got.map(_.getLong(2)).sum == 2L)
  }

  test("calibrationBinsBy: global geometry, per-group counts, zero fill") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map { i =>
      val g = s"src${i % 3}"
      val s = rnd.nextInt(1000).toLong
      (g, s, s >= 500L + 100L * (i % 3))
    }
    val got = Eval.calibrationBinsBy(rows.toDF("g", "s", "y"),
        col("g"), col("s"), col("y"), nBins = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // every group reports all 10 bands
    assert(got.size == 30)
    // band geometry is GLOBAL: score_lo identical across groups
    (0L until 10L).foreach { b =>
      assert(got(("src0", b))._1 == got(("src2", b))._1, s"bin $b")
    }
    // per-group counts equal the brute per-slice tally under the
    // shared (lo, binW)
    val lo = rows.map(_._2).min
    val binW = math.max(1L,
      Math.floorDiv(rows.map(_._2).max - lo, 10L) + 1L)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val brute = rs.groupBy(r => math.min((r._2 - lo) / binW, 9L))
      (0L until 10L).foreach { b =>
        val (n, np) = brute.get(b)
          .map(v => (v.size.toLong, v.count(_._3).toLong))
          .getOrElse((0L, 0L))
        assert(got((g, b))._2 == n && got((g, b))._3 == np, s"$g/$b")
      }
    }
  }

  // ---- topFractionByWeight ---------------------------------------

  /** The definition: row_number() OVER (ORDER BY w DESC, id) <= k. */
  private def bruteSelect(rows: Seq[(Long, Long)], num: Long,
      den: Long): Set[Long] = {
    val k = rows.size * num / den
    rows.sortBy { case (id, w) => (-w, id) }.take(k.toInt).map(_._1).toSet
  }

  private def gotSelect(rows: Seq[(Long, Long)], num: Long,
      den: Long): Set[Long] =
    PipelineOps.topFractionByWeight(rows.toDF("id", "w"), "id", "w",
      num, den)
      .filter(col("selected")).select("id").as[Long].collect().toSet

  test("topFractionByWeight: equals the ranked definition, with ties") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 6) {
      // heavy tie mass: weights from a 7-value domain
      val rows = (0L until 97L).map(i => (i, rnd.nextInt(7).toLong - 3L))
      for ((num, den) <- Seq((1L, 4L), (1L, 2L), (9L, 10L)))
        assert(gotSelect(rows, num, den) == bruteSelect(rows, num, den),
          s"trial=$trial frac=$num/$den")
    }
  }

  test("topFractionByWeight: degenerate fractions and pointmass weights") {
    val rows = (0L until 10L).map(i => (i, 5L)) // all weights equal
    assert(gotSelect(rows, 0L, 4L) == Set.empty[Long])
    assert(gotSelect(rows, 1L, 1L) == rows.map(_._1).toSet)
    // k=5 of 10 equal weights: smallest five ids win the tie
    assert(gotSelect(rows, 1L, 2L) == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("topFractionByWeight: wide weight range (histogram descent)") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 200L).map(i => (i, rnd.nextLong() / 1000L))
    assert(gotSelect(rows, 1L, 4L) == bruteSelect(rows, 1L, 4L))
  }

  test("topFractionByWeight: adversarial cluster + outlier forces " +
      "multi-level descent") {
    // one extreme outlier stretches the range so the first 4096-way
    // binning drops EVERY clustered weight into bucket 0: the
    // threshold is only reachable by recursing (the pre-hardening
    // per-distinct-weight collect would have pulled the whole
    // cluster to the driver here)
    val rows = (0L until 300L).map(i => (i, i)) :+
      (300L, Long.MaxValue / 2L)
    for ((num, den) <- Seq((1L, 4L), (1L, 2L)))
      assert(gotSelect(rows, num, den) == bruteSelect(rows, num, den),
        s"frac=$num/$den")
  }

  // ---- bm25TopK --------------------------------------------------

  test("bm25TopK: rare term dominates; tf saturates; rank is total") {
    val docs = Seq(
      (1L, "alpha beta beta beta beta beta beta beta beta"),
      (2L, "alpha gamma"),
      (3L, "beta gamma delta"),
      (4L, "gamma delta gamma")).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("alpha", "beta"), k1 = 1.2, b = 0.75, topK = 10)
      .orderBy("rank").collect()
    // docs 1,2,3 match; doc 4 has no query term
    assert(got.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(got.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    // alpha (df=2) outweighs beta (df=3): doc 2's single rare hit in a
    // short doc beats doc 3's single common hit
    val byId = got.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(2L) > byId(3L))
    // doc 1 has both terms plus saturated beta mass: highest score
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
  }

  test("bm25TopK: topK truncation keeps the heaviest docs") {
    val docs = (1L to 30L).map(i =>
      (i, ("common " * i.toInt).trim)).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("common"), k1 = 1.2, b = 0.75, topK = 5)
    assert(got.count() == 5L)
  }

  // ---- bm25TopKPerQuery --------------------------------------------

  test("bm25TopKPerQuery: each query's slice equals the single-query " +
      "operator") {
    val docs = Seq(
      (1L, "alpha beta beta beta beta beta beta beta beta"),
      (2L, "alpha gamma"),
      (3L, "beta gamma delta"),
      (4L, "gamma delta gamma"),
      (5L, "delta delta alpha beta")).toDF("doc_id", "text")
    val qmap = Map(
      0L -> Seq("alpha", "beta"),
      1L -> Seq("gamma"),
      2L -> Seq("delta", "alpha", "zzznope"), // dead term contributes 0
      3L -> Seq("zzznope"))                   // fully dead query
    val queries = qmap.toSeq.flatMap { case (q, ts) => ts.map((q, _)) }
      .toDF("query_id", "term")
    val got = TextOps.bm25TopKPerQuery(docs, col("doc_id"), col("text"),
      queries, k1 = 1.2, b = 0.75, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1)
    assert(!got.contains(3L)) // no matches → no rows
    for ((q, ts) <- qmap if q != 3L) {
      val want = TextOps.bm25TopK(docs, col("doc_id"), col("text"),
        ts.filter(_ != "zzznope"), k1 = 1.2, b = 0.75, topK = 3)
        .collect()
        .map(r => (q, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got(q).toSeq.sortBy(_._5) == want, s"query $q")
    }
  }

  test("bm25TopKPerQuery plan: one corpus explode, one shuffle keyed " +
      "(query_id, doc_id), partial top-k") {
    val docs = (1L to 50L).map(i => (i, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val queries = Seq((0L, "alpha"), (1L, "beta"), (1L, "gamma"))
      .toDF("query_id", "term")
    val plan = TextOps.bm25TopKPerQuery(docs, col("doc_id"), col("text"),
      queries, 1.2, 0.75, 5).queryExecution.executedPlan.toString
    // the corpus token stream explodes ONCE, into the checkpointed
    // posting list — the returned plan only ever re-reads that
    // materialization (zero explodes downstream), so queries can
    // never re-scan the corpus
    assert("explode\\(__toks".r.findAllIn(plan).isEmpty, plan)
    assert(plan.contains("ExistingRDD") || plan.contains("Scan RDD"), plan)
    // exactly one exchange carries doc_id: the score aggregation
    val docIdExchanges = "hashpartitioning\\([^)]*doc_id".r
      .findAllIn(plan).size
    assert(docIdExchanges == 1, plan)
    // per-query top-k is the partial-combining aggregate, not a window
    assert(plan.contains("graft_topk"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("bm25TopKPerQuery: packing headroom requires fail loudly") {
    val docs = Seq((-1L, "alpha")).toDF("doc_id", "text")
    val queries = Seq((0L, "alpha")).toDF("query_id", "term")
    val e = intercept[IllegalArgumentException] {
      TextOps.bm25TopKPerQuery(docs, col("doc_id"), col("text"),
        queries, 1.2, 0.75, 3)
    }
    assert(e.getMessage.contains("doc_id"))
  }

  // ---- dsirWeights -----------------------------------------------

  test("dsirWeights: target-like docs outweigh off-target docs") {
    val docs = Seq(
      (1L, "spark join hash join", true),
      (2L, "spark join hash scan", true),
      (3L, "llama vicuna alpaca", false),
      (4L, "spark join hash join", false), // target-like but unlabeled
      (5L, "llama vicuna gamma", false)).toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(docs, col("doc_id"), col("text"),
      col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 4 shares the target's grams → weight close to docs 1-2 and
    // far above the off-target docs. (Absolute sign is not asserted:
    // at fixture scale the add-1 smoothing mass Tt+B vs Tr+B skews
    // both log partition terms, so only the ORDERING is meaningful.)
    assert(got(4L) > got(3L) && got(4L) > got(5L))
    assert(got(1L) == got(4L)) // identical text → identical weight
    assert(got(1L) > got(3L) && got(2L) > got(5L))
  }

  test("dsirWeights: empty docs keep zero weight and zero grams") {
    val docs = Seq((1L, "a b", true), (2L, "", false))
      .toDF("doc_id", "text", "tgt")
    val got = TextOps.dsirWeights(docs, col("doc_id"), col("text"),
      col("tgt"), buckets = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(2L) == ((0L, 0L)))
    // doc 1: 2 unigrams + 1 bigram
    assert(got(1L)._1 == 3L)
  }

  // ---- binaryAucBy -----------------------------------------------

  test("binaryAucBy: each group equals the ungrouped AUC of its slice") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(300)(i =>
      (s"g${i % 3}", rnd.nextInt(15).toLong - 7L, rnd.nextBoolean()))
    val got = Eval.binaryAucBy(rows.toDF("g", "s", "y"), col("g"),
      col("s"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val slice = rows.filter(_._1 == g).map(t => (t._2, t._3))
      assert(math.abs(got(g) - bruteAuc(slice)) < 1e-12, g)
    }
  }

  test("binaryAucBy: a single-class group reports NULL auc") {
    val rows = Seq(("a", 3L, true), ("a", 1L, false),
      ("b", 5L, true), ("b", 9L, true))
    val got = Eval.binaryAucBy(rows.toDF("g", "s", "y"), col("g"),
      col("s"), col("y")).collect()
      .map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(!got("a") && got("b"))
  }

  // ---- thresholdSweep --------------------------------------------

  test("thresholdSweep: confusion counts equal direct counting") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(250)((rnd.nextInt(1000).toLong - 500L,
      rnd.nextInt(3) == 0))
    val got = Eval.thresholdSweep(rows.toDF("s", "y"), col("s"),
      col("y"), nBins = 8).orderBy("bin").collect()
    assert(got.length == 8)
    for (r <- got) {
      val t = r.getLong(1)
      val tp = rows.count { case (s, y) => s >= t && y }.toLong
      val pp = rows.count { case (s, _) => s >= t }.toLong
      assert(r.getLong(3) == tp && r.getLong(2) == pp, s"t=$t")
      assert(r.getLong(4) == pp - tp)
      assert(r.getLong(5) == rows.count(_._2) - tp)
      assert(r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6)
        == rows.size.toLong)
    }
    // loosest gate keeps everything: recall 1, predicted = corpus
    assert(got(0).getLong(2) == rows.size.toLong)
    assert(got(0).getDouble(8) == 1.0)
  }

  test("thresholdSweep: needs a positive row") {
    intercept[IllegalArgumentException] {
      Eval.thresholdSweep(Seq((1L, false), (2L, false)).toDF("s", "y"),
        col("s"), col("y"), nBins = 4)
    }
  }

  test("binaryAucBy plan never funnels through one partition") {
    val rows = Seq.tabulate(100)(i =>
      (s"g${i % 4}", (i % 13).toLong, i % 3 == 0))
    val got = Eval.binaryAucBy(rows.toDF("g", "s", "y"), col("g"),
      col("s"), col("y"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"grouped AUC must stay partitioned by group:\n$plan")
  }

  test("bm25TopK plan is a partial top-k, not a global sort") {
    val docs = (1L to 50L).map(i => (i, s"alpha beta t$i"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, col("doc_id"), col("text"),
      Seq("alpha"), k1 = 1.2, b = 0.75, topK = 5)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered (per-partition partial top-k):\n$plan")
  }

  // ---- ndcgAtK -----------------------------------------------------

  /** The definition with the operator's own quantization: integer
    * dot products of (rel, round(1e9/log2(pos+1))).
    */
  private def bruteNdcg(rows: Seq[(Long, Long, Long)],
      k: Int): (Long, Long, Option[Long]) = {
    def w(pos: Int) =
      math.round(1e9 / (math.log(pos + 1.0) / math.log(2.0)))
    def dot(rels: Seq[Long]) =
      rels.take(k).zipWithIndex.map { case (r, i) => r * w(i + 1) }.sum
    val dcg = dot(rows.sortBy { case (id, _, s) => (-s, id) }.map(_._2))
    val idcg = dot(rows.sortBy { case (id, r, _) => (-r, id) }.map(_._2))
    (dcg, idcg,
      if (idcg > 0) Some(dcg * 1000000L / idcg) else None)
  }

  private def gotNdcg(rows: Seq[(Long, Long, Long)],
      k: Int): (Long, Long, Long, Option[Long]) = {
    val r = Eval.ndcgAtK(rows.toDF("id", "rel", "s"), col("id"),
      col("rel"), col("s"), k).head()
    (r.getLong(0), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("ndcgAtK: a score order matching the relevance order is " +
      "exactly 1.0") {
    val rows = (1L to 20L).map(i => (i, 21L - i, 1000L - i))
    val (n, dcg, idcg, nd) = gotNdcg(rows, 10)
    assert(n == 20L && dcg == idcg && nd == Some(1000000L))
  }

  test("ndcgAtK: randomized equals the quantized definition") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val rows = (1L to 40L).map(i =>
        (i, rnd.nextInt(4).toLong, rnd.nextInt(15).toLong))
      for (k <- Seq(1, 5, 10, 40, 100)) {
        val (dcg, idcg, nd) = bruteNdcg(rows, k)
        val (n, gd, gi, gn) = gotNdcg(rows, k)
        assert(n == 40L && gd == dcg && gi == idcg && gn == nd,
          s"trial=$trial k=$k")
      }
    }
  }

  test("ndcgAtK: all-zero relevance yields a NULL grade, not a crash") {
    val rows = (1L to 5L).map(i => (i, 0L, i))
    val (_, dcg, idcg, nd) = gotNdcg(rows, 3)
    assert(dcg == 0L && idcg == 0L && nd.isEmpty)
  }

  test("ndcgAtKBy: each group equals the ungrouped grade of its slice") {
    val rnd = new scala.util.Random(43)
    val rows = (1L to 120L).map(i =>
      (s"g${i % 4}", i, rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
    val got = Eval.ndcgAtKBy(rows.toDF("g", "id", "rel", "s"),
      col("g"), col("id"), col("rel"), col("s"), k = 7)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)))))
      .toMap
    assert(got.keySet == Set("g0", "g1", "g2", "g3"))
    for (g <- got.keySet) {
      val slice = rows.filter(_._1 == g).map(t => (t._2, t._3, t._4))
      val (n, dcg, idcg, nd) = gotNdcg(slice, 7)
      assert(got(g) == ((n, dcg, idcg, nd)), s"group $g")
    }
  }

  test("ndcgAtKBy plan: group-partitioned windows, no single-partition " +
      "exchange") {
    val rows = (1L to 50L).map(i => (s"g${i % 3}", i, i % 4, i % 7))
    val plan = Eval.ndcgAtKBy(rows.toDF("g", "id", "rel", "s"),
      col("g"), col("id"), col("rel"), col("s"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  // ---- cohenKappa ------------------------------------------------

  test("cohenKappa: identities — perfect, inverted, independent") {
    def kap(rows: Seq[(Boolean, Boolean)]): Option[Double] = {
      val r = Eval.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
        .head()
      if (r.isNullAt(7)) None else Some(r.getDouble(7))
    }
    val xs = Seq(true, true, true, false, false)
    assert(kap(xs.map(x => (x, x))) == Some(1.0))
    assert(kap(xs.map(x => (x, !x))).get < 0.0)
    // independence: every (a,b) cell equally filled → po == pe → κ = 0
    val indep = for (a <- Seq(true, false); b <- Seq(true, false);
      _ <- 1 to 5) yield (a, b)
    assert(kap(indep) == Some(0.0))
    // both labelers constant: pe = 1 → NULL
    assert(kap(Seq.fill(4)((true, true))).isEmpty)
  }

  test("cohenKappa: matches the textbook formula on a mixed table") {
    // confusion n00=4 n01=2 n10=1 n11=3
    val rows = Seq.fill(4)((false, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(1)((true, false)) ++ Seq.fill(3)((true, true))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((4L, 2L, 1L, 3L)))
    val po = 7.0 / 10.0
    val pe = (4.0 * 5.0 + 6.0 * 5.0) / 100.0
    assert(math.abs(r.getDouble(7) - (po - pe) / (1.0 - pe)) < 1e-12)
  }
}
