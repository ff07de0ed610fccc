package graft.queries

import graft.ops.{Similarity, TextOps}
import graft.queries.Tables.load
import org.apache.spark.sql.functions._

/** Similarity search over the embedding table. Everything runs on
  * integer-quantized vectors (round(x*1000)) so dot products are exact
  * and both engines produce bitwise-identical similarities.
  */
object EmbQueries {

  // 32 planes / 8 bands = 4 sign bits per band (16 sub-buckets): at 2
  // bits a blocking label that grows 10x kept ~quadratic candidate
  // sets (measured 25 s at sf1); 4-bit bands cut candidates ~4x while
  // a boundary pair (cos = 0.3) still collides on some band w.p. ~2/3
  // and a genuinely-near pair (cos 0.7) w.p. ~0.95. The banding is
  // part of the operator DEFINITION — the SQL oracle mirrors these
  // constants, so both engines produce the identical pair set.
  private val Planes = 32
  private val Dims = 64
  private val K = 10

  /** emb_mmr_topk: shortlist width and diverse-pick count. */
  private val MmrShortlist = 16
  private val MmrK = 6
  private val NearDupThreshold = 0.3
  private val NearDupBands = 8

  /** emb_rp_knn: projected dimensionality and shortlist width. 16 of
    * 64 dims keeps the candidate scan 4× narrower; the 100-wide
    * shortlist is what the exact re-rank pays per query. Measured
    * honesty (emb_rp_recall): the synthetic fixture is near-ISOTROPIC
    * (pairwise cosine p90 ≈ 0.16, median ≈ 0), so the top-10 gaps sit
    * below the JL distortion ~sqrt(ln n / rdim) at any compressive
    * rdim — recall@10 is ~49% at a 20% shortlist here (Gaussian float
    * weights plateau ~0.66, so the integer weights are not the
    * binding constraint), while on clustered data the same operator
    * holds ≥80% at a 25% shortlist (SimJoinSpec). The recall query
    * exists exactly to surface this data-dependence; PQ/SQ8 are the
    * tiers that survive isotropy.
    */
  private val RpDim = 16
  private val RpShortlist = 100
  private val KmeansK = 8
  private val KmeansIters = 2

  /** Centroid table collected to the driver and re-emitted as a local
    * relation: one row per cell (bounded like partition cardinality),
    * so the two sides of the cell join and the probe step share ONE
    * centroid computation with no cache entry left behind.
    */
  private def localCentroids(s: org.apache.spark.sql.SparkSession,
      vecs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cents = Similarity.ivfCentroids(vecs, "cell")
    s.createDataFrame(java.util.Arrays.asList(cents.collect(): _*), cents.schema)
  }

  /** One stored ANN index per (session, dataset), built on first use
    * and reused by bench reps ([[TempState]] sweeps it at JVM exit) —
    * the index is the POINT of emb_index_knn: train once, probe many.
    */
  private def indexDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    TempState.dir("annidx|" + s.sparkContext.applicationId + "|" + d) { root =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          pmod(col("vec_id"), lit(KmeansK.toLong)).as("cell"))
      graft.ops.AnnIndex.build(vecs, root, KmeansIters)
    }

  /** One stored PQ index per (session, dataset) — trained on first
    * use, probed by every rep ([[indexDir]]'s pattern for the
    * compressed half): the benched path is the SERVING shape, and
    * probe-from-stored equals train-then-probe by PqSpec, so the
    * SQL oracle's independent training replay still pins it.
    */
  private def pqIndexDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    TempState.dir("pqidx|" + s.sparkContext.applicationId + "|" + d) { root =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      graft.ops.AnnIndex.buildPq(vecs, root, PqM, Dims, PqK, PqIters)
    }

  /** Low-rank fixture cluster centers: the 8 integer points of norm
    * 5 on a circle, ordered by angle — within-cluster center dot 25,
    * max adjacent-cluster dot 20, so exact-cosine neighborhoods stay
    * in-cluster with margin. Indexed by vec_id % 8 (1-based element
    * access in both engines).
    */
  private val LrCx = Seq(5, 3, 0, -3, -5, -3, 0, 3)
  private val LrCy = Seq(0, 4, 5, 4, 0, -4, -5, -4)
  private val SqlLrCx = LrCx.mkString("[", ",", "]")
  private val SqlLrCy = LrCy.mkString("[", ",", "]")

  /** Spark-side synthesis of the low-rank fixture embedding — the
    * SQL twin's formula verbatim: plane dims 1..2 carry the cluster
    * center ± a dyadic 1/8 jitter, dims 3..18 dyadic ±4/8 noise,
    * dims 19..64 zero. Every value is a dyadic rational whose ×1000
    * quantization is an exact integer in FLOAT and DOUBLE alike — no
    * cross-engine rounding seam.
    */
  private lazy val SparkLrEmb: String = {
    val cx = s"element_at(array(${LrCx.mkString(",")}), " +
      "CAST(vec_id % 8 AS INT) + 1)"
    val cy = s"element_at(array(${LrCy.mkString(",")}), " +
      "CAST(vec_id % 8 AS INT) + 1)"
    s"""transform(sequence(1, $Dims), j -> CAST(CASE
       |  WHEN j = 1 THEN $cx + (CAST((vec_id + 1) % 3 AS DOUBLE) - 1D) / 8D
       |  WHEN j = 2 THEN $cy + (CAST((vec_id + 2) % 3 AS DOUBLE) - 1D) / 8D
       |  WHEN j <= 18 THEN
       |    (CAST((vec_id * 31 + j * 17) % 9 AS DOUBLE) - 4D) / 8D
       |  ELSE 0D END AS FLOAT))""".stripMargin
  }

  /** DuckDB quantized-vector CTE matching Similarity.quantize. */
  private val sqlQuant =
    """q AS (SELECT vec_id, label,
      |  list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS DOUBLE)) AS e
      |  FROM embeddings)""".stripMargin

  private val sqlCos =
    "list_dot_product(a.e, b.e) / nullif(" +
      "sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)), 0.0)"

  /** DuckDB twin of Similarity.rpProject: pv(vec_id, p) with p the
    * RpDim-wide integer projection (weight arrays inlined from the
    * shared LCG).
    */
  private val sqlRpProj: String = {
    val terms = (0 until RpDim).map { r =>
      val w = (0 until Dims).map(i => Similarity.rpWeight(r, i, Dims))
        .mkString("[", ",", "]")
      s"list_dot_product(e, $w)"
    }.mkString("[\n    ", ",\n    ", "]")
    s"pv AS (SELECT vec_id, $terms AS p FROM q)"
  }

  /** Projected-space cosine over pv rows a, b. */
  private val sqlRpCos =
    "list_dot_product(a.p, b.p) / nullif(" +
      "sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(b.p, b.p)), 0.0)"

  /** DuckDB twin of Similarity.lshBucket over column `e`. */
  private val sqlBucketTerms = (0 until Planes).map { j =>
    val w = (0 until Dims).map(i => Similarity.planeWeight(j, i, Dims))
      .mkString("[", ",", "]")
    s"(CASE WHEN list_dot_product(e, $w) > 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString(" +\n  ")

  /** emb_drift cell geometry: 2^8 sign-pattern cells — coarse enough
    * that the 500-vector fixture populates many cells, fine enough
    * that class clusters separate.
    */
  private val DriftPlanes = 8
  private val DriftCells = 1 << DriftPlanes

  /** Embedding-gate hot-bucket PSI threshold (nano-units), matching
    * the token gate's bar.
    */
  private val GateHotPsiE9 = 100000L

  /** RRF smoothing constant (doc_hybrid_rrf) — the k=60 the original
    * paper fixed and most stacks keep.
    */
  private val RrfK0 = 60

  /** [[sqlBucketTerms]] at the emb_drift plane count. */
  private val sqlDriftBucketTerms = (0 until DriftPlanes).map { j =>
    val w = (0 until Dims).map(i => Similarity.planeWeight(j, i, Dims))
      .mkString("[", ",", "]")
    s"(CASE WHEN list_dot_product(e, $w) > 0 THEN ${1L << j} ELSE 0 END)"
  }.mkString(" +\n  ")

  /** DuckDB twin of the banded-LSH near-dup pair join over a blocked
    * relation `bb(vec_id, <blockCol>, e, bucket)` — the band
    * constants are part of the operator definition, kept in ONE
    * builder so emb_near_dup (given-label blocking) and
    * emb_semantic_dedup (learned-cell blocking) cannot drift.
    */
  private def sqlBandedPairSelect(blockCol: String): String = {
    val bitsPerBand = Planes / NearDupBands
    val mask = (1L << bitsPerBand) - 1L
    val bandMatch = (0 until NearDupBands).map { bd =>
      s"((a.bucket >> ${bd * bitsPerBand}) & $mask) = " +
        s"((b.bucket >> ${bd * bitsPerBand}) & $mask)"
    }.mkString("(", "\n  OR ", ")")
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round($sqlCos, 6) AS sim
       |FROM bb a JOIN bb b ON a.$blockCol = b.$blockCol
       |  AND a.vec_id < b.vec_id
       |  AND $bandMatch
       |WHERE $sqlCos >= $NearDupThreshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB twin of Similarity.kmeans seeded by vec_id % k: CTEs
    * a0 (seed) through a<KmeansIters> (final assignment), each
    * iteration a centroid aggregation + exact-integer-identity argmin.
    * Shared by emb_kmeans and emb_semantic_dedup.
    */
  private def sqlKmeansIter(i: Int): String = {
    val prev = if (i == 1) "a0" else s"a${i - 1}"
    s"""u$i AS (SELECT a.cell, generate_subscripts(q.e, 1) AS dim,
       |       unnest(q.e) AS v FROM q JOIN $prev a USING (vec_id)),
       |c$i AS (SELECT cell, dim, sum(v) AS sv, count(*) AS n
       |      FROM u$i GROUP BY cell, dim),
       |cent$i AS (SELECT cell, list(sv ORDER BY dim) AS svec, min(n) AS n
       |         FROM c$i GROUP BY cell),
       |d$i AS (SELECT q.vec_id, cent$i.cell,
       |  (cent$i.n * cent$i.n * list_dot_product(q.e, q.e)
       |   - 2 * cent$i.n * list_dot_product(q.e, cent$i.svec)
       |   + list_dot_product(cent$i.svec, cent$i.svec))
       |  / (cent$i.n * cent$i.n) AS dist2
       |  FROM q, cent$i),
       |a$i AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
       |  FROM d$i) WHERE rn = 1)""".stripMargin
  }

  private val sqlKmeansCtes: String =
    s"""a0 AS (SELECT vec_id, vec_id % $KmeansK AS cell FROM q),
       |${(1 to KmeansIters).map(sqlKmeansIter).mkString(",\n")}""".stripMargin

  /** DuckDB twin of the IVF coarse assignment (label-seeded centroids,
    * exact-integer distance identity, ties by cell) — ONE builder for
    * emb_ivf_knn / emb_ivf_knn_nprobe2 / emb_ivf_recall.
    */
  private val sqlIvfAssignCtes =
    """u AS (SELECT label, generate_subscripts(e, 1) AS dim,
      |       unnest(e) AS v FROM q),
      |c AS (SELECT label AS cell, dim, sum(v) AS sv, count(*) AS n
      |      FROM u GROUP BY label, dim),
      |cent AS (SELECT cell, list(sv ORDER BY dim) AS svec, min(n) AS n
      |         FROM c GROUP BY cell),
      |d AS (SELECT q.vec_id, cent.cell,
      |  (cent.n * cent.n * list_dot_product(q.e, q.e)
      |   - 2 * cent.n * list_dot_product(q.e, cent.svec)
      |   + list_dot_product(cent.svec, cent.svec))
      |  / (cent.n * cent.n) AS dist2
      |  FROM q, cent),
      |assign AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
      |  FROM d) WHERE rn = 1)""".stripMargin

  // ───────────── product quantization (emb_pq_knn) ─────────────
  // PqK=64 is the production-shaped codebook (round 8 shipped a toy
  // K=8 that measured 0–40% recall@10). The SQL Lloyd replay is
  // generic over K — only the seed (`vec_id % K`) and group counts
  // change — so the oracle still re-derives training independently,
  // which pins MORE than a stored-codebook search replay would.
  private val PqM = 16         // subspaces
  private val PqK = 64         // codes per subspace
  private val PqIters = 2      // Lloyd rounds per subspace
  private val PqSubDim = Dims / PqM
  private val PqRefine = 4 * K // ADC shortlist width for exact re-rank

  /** DuckDB twin of one per-subspace Lloyd iteration (same
    * exact-integer identity as [[sqlKmeansIter]], names prefixed
    * `s<j>` and running over the sliced relation `s<j>q`).
    */
  private def sqlPqIter(j: Int, i: Int): String = {
    val prev = if (i == 1) s"s${j}a0" else s"s${j}a${i - 1}"
    s"""s${j}u$i AS (SELECT a.cell, generate_subscripts(sq.e, 1) AS dim,
       |       unnest(sq.e) AS v FROM s${j}q sq JOIN $prev a USING (vec_id)),
       |s${j}c$i AS (SELECT cell, dim, sum(v) AS sv, count(*) AS n
       |      FROM s${j}u$i GROUP BY cell, dim),
       |s${j}cent$i AS (SELECT cell, list(sv ORDER BY dim) AS svec, min(n) AS n
       |         FROM s${j}c$i GROUP BY cell),
       |s${j}d$i AS (SELECT sq.vec_id, ct.cell,
       |  (ct.n * ct.n * list_dot_product(sq.e, sq.e)
       |   - 2 * ct.n * list_dot_product(sq.e, ct.svec)
       |   + list_dot_product(ct.svec, ct.svec))
       |  / (ct.n * ct.n) AS dist2
       |  FROM s${j}q sq, s${j}cent$i ct),
       |s${j}a$i AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
       |  FROM s${j}d$i) WHERE rn = 1)""".stripMargin
  }

  /** All CTEs for subspace j: slice, seed, PqIters rounds, plus the
    * CLOSING round (codebook `s<j>cent<PqIters+1>` + codes
    * `s<j>a<PqIters+1>`) mirroring pqTrainEncode's
    * codebook-consistent final assignment.
    */
  private def sqlPqSubspace(j: Int): String = {
    val lo = j * PqSubDim + 1
    val hi = (j + 1) * PqSubDim
    s"""s${j}q AS (SELECT vec_id, e[$lo:$hi] AS e FROM q),
       |s${j}a0 AS (SELECT vec_id, vec_id % $PqK AS cell FROM s${j}q),
       |${(1 to PqIters + 1).map(sqlPqIter(j, _)).mkString(",\n")}""".stripMargin
  }

  /** The PQ LUT + ADC scoring in SQL: per-subspace query-to-centroid
    * distances unioned over subspaces, joined to the codes, summed in
    * SUBSPACE ORDER (list(d2 ORDER BY sub) fold — matching the Spark
    * side's explicit ordered fold, so float addition order cannot
    * drift between engines).
    */
  private val sqlPqAdc: String = {
    val fin = PqIters + 1
    val lutPer = (0 until PqM).map { j =>
      val lo = j * PqSubDim + 1
      val hi = (j + 1) * PqSubDim
      s"""SELECT qq.vec_id AS q_id, $j AS sub, ct.cell AS code,
         |  (ct.n * ct.n * list_dot_product(qq.e[$lo:$hi], qq.e[$lo:$hi])
         |   - 2 * ct.n * list_dot_product(qq.e[$lo:$hi], ct.svec)
         |   + list_dot_product(ct.svec, ct.svec))
         |  / (ct.n * ct.n) AS d2
         |FROM q qq, s${j}cent$fin ct WHERE qq.vec_id < 8""".stripMargin
    }.mkString("\nUNION ALL\n")
    val codesPer = (0 until PqM).map { j =>
      s"SELECT vec_id, $j AS sub, cell AS code FROM s${j}a$fin"
    }.mkString("\nUNION ALL\n")
    s"""lut AS ($lutPer),
       |codes AS ($codesPer),
       |adc AS (SELECT lut.q_id, codes.vec_id AS c_id,
       |  list_sum(list(d2 ORDER BY lut.sub)) AS adist
       |  FROM codes JOIN lut ON codes.sub = lut.sub AND codes.code = lut.code
       |  WHERE codes.vec_id <> lut.q_id GROUP BY 1, 2)""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // brute-force exact top-k (the ANN baseline)
    QueryDef("emb_knn_brute",
      s"""WITH $sqlQuant,
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |r AS (SELECT q_id, c_id, sim, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM scored)
         |SELECT q_id, c_id, rank, round(sim, 6) AS sim FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("vec"))
      Similarity.knnBrute(vecs.filter(col("id") < 8), vecs, K)
        .orderBy("q_id", "rank")
    },

    // hard-negative mining (Similarity.hardNegatives): per anchor,
    // the k nearest DIFFERENT-label vectors — the contrastive-loss
    // negatives just across the class boundary. knnBrute's broadcast
    // + single corpus pass with the label filter ahead of the rank
    // window; the twin replays filter and rank on the identical
    // quantized sims.
    QueryDef("emb_hard_negatives",
      s"""WITH $sqlQuant,
         |scored AS (SELECT a.vec_id AS q_id, a.label AS q_label,
         |  b.vec_id AS c_id, b.label AS c_label, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.label <> a.label
         |  WHERE a.vec_id < 8),
         |r AS (SELECT q_id, q_label, c_id, c_label, sim, row_number()
         |  OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
         |  FROM scored)
         |SELECT q_id, CAST(q_label AS BIGINT) AS q_label, c_id,
         |  CAST(c_label AS BIGINT) AS c_label, rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          col("label").cast("long").as("label"))
      Similarity.hardNegatives(vecs.filter(col("id") < 8), vecs, K)
        .orderBy("q_id", "rank")
    },

    // MMR diverse top-k (Similarity.mmrDiverseTopK): greedy
    // redundancy-penalized re-rank over the relevance shortlist —
    // score = λ·sim(q,c) − (1−λ)·max sim(c, selected). The twin
    // UNROLLS the k greedy rounds as CTE pairs (the kmeans-oracle
    // pattern) from the same Scala loop, over the same rounded
    // deterministic sims — an engine that picks a different document
    // at ANY round diverges immediately.
    QueryDef("emb_mmr_topk", {
      val rounds = (1 to MmrK).map { i =>
        val prev = if (i == 1) "st0" else s"st${i - 1}"
        val pick =
          s"""p$i AS (SELECT q_id, c_id, $i AS pick_rank, score_e6 FROM (
             |  SELECT q_id, c_id, sim_e6 - maxsel AS score_e6,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY sim_e6 - maxsel DESC, c_id) AS rn
             |  FROM $prev) WHERE rn = 1)""".stripMargin
        val step = if (i == MmrK) "" else
          s""",
             |st$i AS (SELECT s.q_id, s.c_id, s.sim_e6,
             |  greatest(s.maxsel, pp.sim_cc) AS maxsel
             |  FROM $prev s JOIN p$i p USING (q_id)
             |  JOIN pair pp ON pp.q_id = s.q_id AND pp.ca = s.c_id
             |    AND pp.cb = p.c_id
             |  WHERE s.c_id <> p.c_id)""".stripMargin
        pick + step
      }.mkString(",\n")
      val cosXY = "list_dot_product(x.e, y.e) / nullif(" +
        "sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e)), 0.0)"
      s"""WITH $sqlQuant,
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |short AS (SELECT q_id, c_id,
         |  CAST(round(sim * 1000000) AS BIGINT) AS sim_e6 FROM (
         |  SELECT q_id, c_id, sim, row_number() OVER
         |    (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk FROM scored)
         |  WHERE rnk <= $MmrShortlist),
         |pair AS (SELECT s.q_id, s.c_id AS ca, t.c_id AS cb,
         |  CAST(round(($cosXY) * 1000000) AS BIGINT) AS sim_cc
         |  FROM short s JOIN short t USING (q_id)
         |  JOIN q x ON x.vec_id = s.c_id JOIN q y ON y.vec_id = t.c_id),
         |st0 AS (SELECT q_id, c_id, sim_e6,
         |  CAST(0 AS BIGINT) AS maxsel FROM short),
         |$rounds
         |SELECT q_id, c_id, pick_rank, score_e6 FROM (
         |${(1 to MmrK).map(i => s"  SELECT * FROM p$i").mkString(" UNION ALL\n")})
         |ORDER BY q_id, pick_rank""".stripMargin
    }) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      Similarity.mmrDiverseTopK(vecs.filter(col("id") < 8), vecs,
          shortlist = MmrShortlist, k = MmrK, lamNum = 1, lamDen = 2)
        .orderBy("q_id", "pick_rank")
    },

    // hyperplane-LSH bucketing (the scale path's partitioner)
    QueryDef("emb_lsh_buckets",
      s"""WITH $sqlQuant,
         |b AS (SELECT vec_id, CAST($sqlBucketTerms AS BIGINT) AS bucket FROM q)
         |SELECT bucket, count(*) AS n FROM b
         |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      load(s, d, "embeddings")
        .select(col("vec_id"),
          Similarity.lshBucket(Similarity.quantize(col("embedding")),
            Planes, Dims).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // embedding-cosine near-duplicate pairs: same label AND at least
    // one agreeing LSH band (8 bands x 2 hyperplane sign bits), then
    // the exact cosine verifies. The banding is part of the operator's
    // DEFINITION (deterministic hyperplanes), so the oracle reproduces
    // it bit-for-bit — and the Spark plan shuffles on (label, band)
    // instead of going quadratic in the hottest label.
    QueryDef("emb_near_dup",
      s"""WITH $sqlQuant,
         |bb AS (SELECT vec_id, label, e,
         |  CAST($sqlBucketTerms AS BIGINT) AS bucket FROM q)
         |${sqlBandedPairSelect("label")}""".stripMargin
    ) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("label"), col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      Similarity.nearDupPairsLsh(vecs, "label", NearDupThreshold,
        Planes, Dims, NearDupBands)
        .orderBy("id_a", "id_b")
    },

    // best semantic match per vector — the output-linear reduction of
    // the pair detector above (same rationale as doc_best_match: the
    // pair list is quadratic in cluster density, the strongest-partner
    // view is ≤ one row per vector); shares the banded-pair builder so
    // the two twins cannot drift
    QueryDef("emb_best_match",
      s"""WITH $sqlQuant,
         |bb AS (SELECT vec_id, label, e,
         |  CAST($sqlBucketTerms AS BIGINT) AS bucket FROM q),
         |p AS (${sqlBandedPairSelect("label")}),
         |sym AS (SELECT id_a AS vec_id, id_b AS match_id, sim FROM p
         |  UNION ALL SELECT id_b AS vec_id, id_a AS match_id, sim FROM p),
         |r AS (SELECT vec_id, match_id, sim, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY sim DESC, match_id DESC) AS rn
         |  FROM sym)
         |SELECT vec_id, match_id, sim FROM r WHERE rn = 1
         |ORDER BY vec_id""".stripMargin
    ) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("label"), col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val pairs = Similarity.nearDupPairsLsh(vecs, "label",
        NearDupThreshold, Planes, Dims, NearDupBands)
      graft.ops.Dedup.bestMatchPerDoc(pairs, "id_a", "id_b", "sim")
        .select(col("doc_id").as("vec_id"), col("match_id"), col("sim"))
        .orderBy("vec_id")
    },

    // full IVF ANN: train centroids from the label seed assignment,
    // re-assign every vector to its nearest centroid, then search only
    // the query's cell (nprobe=1) — the scale path where the corpus
    // shuffles once on cell id and no cross product forms
    QueryDef("emb_ivf_knn",
      s"""WITH $sqlQuant,
         |$sqlIvfAssignCtes,
         |qa AS (SELECT q.vec_id, q.e, a.cell FROM q JOIN assign a USING (vec_id)),
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM qa a JOIN qa b ON a.cell = b.cell AND b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |r AS (SELECT q_id, c_id, sim, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM scored)
         |SELECT q_id, c_id, rank, round(sim, 6) AS sim FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          col("label").as("cell"))
      val cents = localCentroids(s, vecs)
      val assigned = Similarity.ivfAssign(vecs, cents)
      Similarity.knnIvf(assigned.filter(col("id") < 8), assigned, K)
        .orderBy("q_id", "rank")
    },

    // IVF with nprobe=2: queries probe their TWO nearest cells (the
    // standard recall lever), corpus keeps its single-cell assignment
    // — closes the nprobe=1 caveat on the scale path. The probe list
    // is deterministic (exact-integer distance identity, ties by
    // cell), so the oracle reproduces the candidate set bit-for-bit.
    QueryDef("emb_ivf_knn_nprobe2",
      s"""WITH $sqlQuant,
         |$sqlIvfAssignCtes,
         |probe AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |  FROM d WHERE vec_id < 8) WHERE rn <= 2),
         |qa AS (SELECT q.vec_id, q.e, a.cell FROM q JOIN assign a USING (vec_id)),
         |qp AS (SELECT q.vec_id, q.e, p.cell FROM q JOIN probe p USING (vec_id)),
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM qp a JOIN qa b ON a.cell = b.cell AND b.vec_id <> a.vec_id),
         |r AS (SELECT q_id, c_id, sim, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM scored)
         |SELECT q_id, c_id, rank, round(sim, 6) AS sim FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          col("label").as("cell"))
      val cents = localCentroids(s, vecs)
      val assigned = Similarity.ivfAssign(vecs, cents)
      val probed = Similarity.ivfProbe(
        vecs.filter(col("id") < 8).select(col("id"), col("vec")), cents, 2)
      Similarity.knnIvf(probed, assigned, K)
        .orderBy("q_id", "rank")
    },

    // centroid per label (the IVF coarse-quantizer training step):
    // exact integer mean per dimension, output as sum/count pairs
    QueryDef("emb_label_centroid_norm",
      s"""WITH $sqlQuant,
         |u AS (SELECT label, unnest(e) AS v,
         |       generate_subscripts(e, 1) AS dim FROM q),
         |c AS (SELECT label, dim, CAST(sum(v) AS BIGINT) AS sv,
         |       count(*) AS n FROM u GROUP BY label, dim)
         |SELECT label, CAST(sum(sv * sv) AS BIGINT) AS centroid_sq_sum,
         |       min(n) AS n_vecs
         |FROM c GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      load(s, d, "embeddings")
        .select(col("label"), posexplode(Similarity.quantize(col("embedding"))))
        .groupBy(col("label"), (col("pos") + 1).as("dim"))
        .agg(sum(col("col")).cast("long").as("sv"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(sum(col("sv") * col("sv")).cast("long").as("centroid_sq_sum"),
          min("n").as("n_vecs"))
        .orderBy("label")
    },

    // Lloyd's k-means (k = 8, 2 iterations, hash-mod seed): the full
    // clustering loop behind IVF training / semantic dedup. The oracle
    // unrolls the iterations as CTE pairs sharing the exact-integer
    // distance identity, so the trajectory — not just the final
    // assignment — is pinned across engines.
    QueryDef("emb_kmeans",
      s"""WITH $sqlQuant,
         |$sqlKmeansCtes
         |SELECT vec_id, cell FROM a$KmeansIters ORDER BY vec_id""".stripMargin
    ) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          pmod(col("vec_id"), lit(KmeansK.toLong)).as("cell"))
      Similarity.kmeans(vecs, KmeansIters)
        .select(col("id").as("vec_id"), col("cell"))
        .orderBy("vec_id")
    },

    // PERSISTED IVF index (the production serving shape): k-means
    // trains ONCE, the codebook and the cell-partitioned assignment
    // table are written to disk, and the query probes FROM THE STORED
    // INDEX — reading only the probed cells' partitions (partition
    // pruning plan-checked in AnnIndexSpec). The oracle never sees the
    // stored form: it replays train-then-probe (the k-means trajectory
    // plus the closing codebook-consistent assign round) in SQL, so a
    // green row IS the proof that probe-from-stored equals
    // train-then-probe.
    QueryDef("emb_index_knn",
      s"""WITH $sqlQuant,
         |$sqlKmeansCtes,
         |${sqlKmeansIter(KmeansIters + 1)},
         |qa AS (SELECT q.vec_id, q.e, a.cell
         |  FROM q JOIN a${KmeansIters + 1} a USING (vec_id)),
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM qa a JOIN qa b ON a.cell = b.cell AND b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |r AS (SELECT q_id, c_id, sim, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM scored)
         |SELECT q_id, c_id, rank, round(sim, 6) AS sim FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val dir = indexDir(s, d)
      val queries = load(s, d, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      graft.ops.AnnIndex.probeKnn(s, dir, queries, K, nprobe = 1)
        .orderBy("q_id", "rank")
    },

    // INCREMENTAL index maintenance: the index is built on three
    // quarters of the corpus, the last quarter is APPENDED by
    // assigning against the stored codebook (no retraining), and the
    // probe searches the combined index. The twin trains k-means on
    // the same subset in SQL and assigns EVERY vector against the
    // resulting codebook — which is exactly what stored-build (closing
    // assign round) plus append (same codebook) produce — so a green
    // row pins the whole build→append→probe lifecycle.
    QueryDef("emb_index_incremental",
      s"""WITH qall AS (SELECT vec_id, label,
         |  list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS DOUBLE)) AS e
         |  FROM embeddings),
         |q AS (SELECT * FROM qall WHERE vec_id % 4 <> 3),
         |$sqlKmeansCtes,
         |${sqlKmeansIter(KmeansIters + 1)},
         |dall AS (SELECT qall.vec_id, c.cell,
         |  (c.n * c.n * list_dot_product(qall.e, qall.e)
         |   - 2 * c.n * list_dot_product(qall.e, c.svec)
         |   + list_dot_product(c.svec, c.svec))
         |  / (c.n * c.n) AS dist2
         |  FROM qall, cent${KmeansIters + 1} c),
         |aall AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |  FROM dall) WHERE rn = 1),
         |qa AS (SELECT qall.vec_id, qall.e, a.cell
         |  FROM qall JOIN aall a USING (vec_id)),
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM qa a JOIN qa b ON a.cell = b.cell AND b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |r AS (SELECT q_id, c_id, sim, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM scored)
         |SELECT q_id, c_id, rank, round(sim, 6) AS sim FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val dir = TempState.dir(
          "annidx-inc|" + s.sparkContext.applicationId + "|" + d) { root =>
        val vecs = load(s, d, "embeddings")
          .select(col("vec_id").as("id"),
            Similarity.quantize(col("embedding")).as("vec"),
            pmod(col("vec_id"), lit(KmeansK.toLong)).as("cell"))
        graft.ops.AnnIndex.build(
          vecs.filter(col("id") % 4 =!= 3), root, KmeansIters)
        graft.ops.AnnIndex.append(s, root,
          vecs.filter(col("id") % 4 === 3).select("id", "vec"), batch = 1L)
      }
      val queries = load(s, d, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      graft.ops.AnnIndex.probeKnn(s, dir, queries, K, nprobe = 1)
        .orderBy("q_id", "rank")
    },

    // SemDeDup-style semantic dedup: near-duplicate pairs blocked by
    // the LEARNED k-means cell (composition of emb_kmeans and the
    // banded-LSH pair machinery) instead of a given label — the shape
    // a pipeline uses when no labels exist. Shuffles on (cell, band);
    // never quadratic in the corpus.
    QueryDef("emb_semantic_dedup",
      s"""WITH $sqlQuant,
         |$sqlKmeansCtes,
         |bb AS (SELECT q.vec_id, ak.cell, q.e,
         |  CAST($sqlBucketTerms AS BIGINT) AS bucket
         |  FROM q JOIN a$KmeansIters ak USING (vec_id))
         |${sqlBandedPairSelect("cell")}""".stripMargin
    ) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          pmod(col("vec_id"), lit(KmeansK.toLong)).as("cell"))
      val assigned = Similarity.kmeans(vecs, KmeansIters)
      Similarity.nearDupPairsLsh(assigned, "cell", NearDupThreshold,
        Planes, Dims, NearDupBands)
        .orderBy("id_a", "id_b")
    },

    // ANN quality metric: recall@k of IVF at nprobe=1 AND nprobe=2
    // against the brute-force exact top-k on the same queries — the
    // number an ANN user asks first, with the nprobe recall lever
    // visible in the same row. Both top-k sets are deterministic
    // (exact integer sims, rank ties by candidate id), so the overlap
    // counts and ppm recalls are exact integers; per-query rows keep
    // the weak cells visible instead of averaging them away.
    QueryDef("emb_ivf_recall",
      s"""WITH $sqlQuant,
         |bscored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |btop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM bscored)
         |  WHERE rank <= $K),
         |$sqlIvfAssignCtes,
         |probe AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rn
         |  FROM d WHERE vec_id < 8) WHERE rn <= 2),
         |qa AS (SELECT q.vec_id, q.e, a.cell FROM q JOIN assign a USING (vec_id)),
         |qp AS (SELECT q.vec_id, q.e, p.cell FROM q JOIN probe p USING (vec_id)),
         |iscored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM qa a JOIN qa b ON a.cell = b.cell AND b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |itop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM iscored)
         |  WHERE rank <= $K),
         |iscored2 AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM qp a JOIN qa b ON a.cell = b.cell AND b.vec_id <> a.vec_id),
         |itop2 AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM iscored2)
         |  WHERE rank <= $K)
         |SELECT b.q_id,
         |  CAST(sum(CASE WHEN i.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm,
         |  CAST(sum(CASE WHEN i2.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm_probe2
         |FROM btop b
         |LEFT JOIN itop i ON b.q_id = i.q_id AND b.c_id = i.c_id
         |LEFT JOIN itop2 i2 ON b.q_id = i2.q_id AND b.c_id = i2.c_id
         |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"),
          col("label").as("cell"))
      val queries = vecs.filter(col("id") < 8)
      val brute = Similarity.knnBrute(queries, vecs, K)
        .select(col("q_id"), col("c_id"))
      val cents = localCentroids(s, vecs)
      val assigned = Similarity.ivfAssign(vecs, cents)
      val ivf1 = Similarity.knnIvf(
          assigned.filter(col("id") < 8), assigned, K)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h1"))
      val probed = Similarity.ivfProbe(
        queries.select(col("id"), col("vec")), cents, 2)
      val ivf2 = Similarity.knnIvf(probed, assigned, K)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h2"))
      brute.join(ivf1, Seq("q_id", "c_id"), "left")
        .join(ivf2, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("__h1"), lit(0L))).as("n1"),
          sum(coalesce(col("__h2"), lit(0L))).as("n2"))
        .select(col("q_id"),
          expr(s"n1 * 1000000 div $K").as("recall_ppm"),
          expr(s"n2 * 1000000 div $K").as("recall_ppm_probe2"))
        .orderBy("q_id")
    },

    // HYBRID dedup: connected components over the UNION of the
    // lexical (MinHash Jaccard on token sets) and semantic
    // (banded-LSH cosine on embeddings, doc_id = vec_id) near-dup
    // pair graphs — the FineWeb/SemDeDup composition: paraphrases
    // that token overlap misses fold in through the embedding edges,
    // verbatim-ish copies through the lexical ones. Both edge
    // generators are the exact audited operators with their own green
    // oracles; the twin replays both pipelines plus the recursive
    // min-label fixpoint.
    QueryDef("hybrid_dup_components",
      s"""WITH RECURSIVE ${TextQueries.sqlMinhashPairCtes},
         |$sqlQuant,
         |bb AS (SELECT vec_id, label, e,
         |  CAST($sqlBucketTerms AS BIGINT) AS bucket FROM q),
         |sem AS (${sqlBandedPairSelect("label")}),
         |e AS (SELECT id_a, id_b FROM mj
         |    WHERE jac >= ${TextQueries.MinhashJaccard}
         |  UNION SELECT id_a, id_b FROM sem),
         |${TextQueries.sqlComponentTail}
         |SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp,
         |  d.doc_id = coalesce(c.comp, d.doc_id) AS is_canonical
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    ) { (s, d) =>
      val docs = load(s, d, "documents")
        .withColumn("hs", graft.ops.Dedup.tokenHashSet(col("text")))
      val lex = graft.ops.Dedup.minhashNearDupPairs(docs, "doc_id", "hs",
        TextQueries.MinhashK, TextQueries.RowsPerBand,
        TextQueries.MinhashJaccard).select("id_a", "id_b")
      val vecs = load(s, d, "embeddings")
        .select(col("label"), col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val sem = Similarity.nearDupPairsLsh(vecs, "label", NearDupThreshold,
        Planes, Dims, NearDupBands).select("id_a", "id_b")
      val comp = graft.ops.Dedup.connectedComponents(
        lex.unionByName(sem).distinct(), "id_a", "id_b")
      docs.select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"),
          (col("doc_id") === coalesce(col("comp"), col("doc_id")))
            .as("is_canonical"))
        .orderBy("doc_id")
    },

    // PRODUCT QUANTIZATION (IVF-PQ's memory half): per-subspace
    // exact-integer k-means codebooks, the corpus stored as PqM small
    // codes per vector, queries scored by ADC — per-subspace
    // distances from a broadcast (query × codebook) LUT, summed in
    // subspace order. At corpus scale the full-vector column never
    // moves: only the codes join the LUT, which is why PQ is the
    // production shape for 100 TB vector search. The oracle re-derives
    // every per-subspace Lloyd trajectory, the closing
    // codebook-consistent codes, the LUT, and the ordered float sum —
    // a green row pins the COMPRESSED index, not just a score.
    QueryDef("emb_pq_knn",
      s"""WITH $sqlQuant,
         |${(0 until PqM).map(sqlPqSubspace).mkString(",\n")},
         |$sqlPqAdc,
         |r AS (SELECT q_id, c_id, adist, row_number() OVER
         |  (PARTITION BY q_id ORDER BY adist, c_id) AS rank FROM adc)
         |SELECT q_id, c_id, rank, round(adist, 6) AS adist FROM r
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      graft.ops.AnnIndex.probePq(s, pqIndexDir(s, d),
          vecs.filter(col("id") < 8), PqM, Dims, K)
        .orderBy("q_id", "rank")
    },

    // PQ SERVING recall@K against the exact brute-force top-K: the
    // ADC shortlist (width PqRefine) plus the exact re-rank of only
    // the shortlist hits' full vectors — the deployed two-stage read
    // (compressed scan, narrow exact fetch). Raw single-stage ADC on
    // these clusterless synthetic vectors plateaus near ~55%
    // recall@10 regardless of codebook size (measured across K=8/64,
    // M=4/8/16, 2–3 Lloyd rounds — quantization noise, not training);
    // the shortlist width is the production dial, and THIS is the
    // number a deployment sees. The twin replays codebooks, codes,
    // LUT, ordered float sum, shortlist AND re-rank independently.
    // Exact integer ppm so the metric itself is engine-reproducible.
    QueryDef("emb_pq_recall",
      s"""WITH $sqlQuant,
         |bscored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |btop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM bscored)
         |  WHERE rank <= $K),
         |${(0 until PqM).map(sqlPqSubspace).mkString(",\n")},
         |$sqlPqAdc,
         |plist AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY adist, c_id) AS rank FROM adc)
         |  WHERE rank <= $PqRefine),
         |rr AS (SELECT p.q_id, p.c_id, $sqlCos AS sim
         |  FROM plist p JOIN q a ON a.vec_id = p.q_id
         |  JOIN q b ON b.vec_id = p.c_id),
         |ptop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM rr)
         |  WHERE rank <= $K)
         |SELECT b.q_id,
         |  CAST(sum(CASE WHEN p.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm
         |FROM btop b
         |LEFT JOIN ptop p ON b.q_id = p.q_id AND b.c_id = p.c_id
         |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val queries = vecs.filter(col("id") < 8)
      val brute = Similarity.knnBrute(queries, vecs, K)
        .select(col("q_id"), col("c_id"))
      val pq = graft.ops.AnnIndex.probePqRefine(s, pqIndexDir(s, d),
          queries, vecs, PqM, Dims, K, PqRefine)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h"))
      brute.join(pq, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("__h"), lit(0L))).as("n"))
        .select(col("q_id"), expr(s"n * 1000000 div $K").as("recall_ppm"))
        .orderBy("q_id")
    },

    // scalar int8 quantization top-k (Similarity.sq8Encode/sq8Knn):
    // the codebook-free compression tier below PQ — per-dim min/max
    // mapping to 0..255 and an EXACT-INTEGER squared-L2 ranking, so
    // the whole search is engine-exact end to end (no float re-rank
    // needed for reproducibility). The twin re-derives the bounds,
    // codes, and ranking from the same quantized corpus.
    QueryDef("emb_sq8_knn",
      s"""WITH $sqlQuant,
         |u AS (SELECT vec_id, generate_subscripts(e, 1) AS dim,
         |  unnest(e) AS v FROM q),
         |st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM u GROUP BY dim),
         |cu AS (SELECT vec_id, u.dim,
         |  CASE WHEN mx > mn THEN CAST(least(greatest(
         |    round((v - mn) / (mx - mn) * 255), 0), 255) AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS c
         |  FROM u JOIN st USING (dim)),
         |qd AS (SELECT vec_id, dim, c FROM cu WHERE vec_id < 8),
         |dist AS (SELECT qd.vec_id AS q_id, cu.vec_id AS c_id,
         |  CAST(sum((qd.c - cu.c) * (qd.c - cu.c)) AS BIGINT) AS idist
         |  FROM qd JOIN cu USING (dim) WHERE cu.vec_id <> qd.vec_id
         |  GROUP BY 1, 2),
         |r AS (SELECT q_id, c_id, idist, row_number() OVER
         |  (PARTITION BY q_id ORDER BY idist, c_id) AS rank FROM dist)
         |SELECT q_id, c_id, CAST(rank AS BIGINT) AS rank, idist
         |FROM r WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val codes = Similarity.sq8Encode(vecs, col("id"), col("vec"))
      Similarity.sq8Knn(codes, col("id") < 8, K)
        .orderBy("q_id", "rank")
    },

    // SQ8 recall@K against the exact brute-force top-k — the
    // compression-tier quality measurement (same all-integer
    // recall_ppm convention as emb_pq_recall)
    QueryDef("emb_sq8_recall",
      s"""WITH $sqlQuant,
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |btop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
         |    AS rank FROM scored) WHERE rank <= $K),
         |u AS (SELECT vec_id, generate_subscripts(e, 1) AS dim,
         |  unnest(e) AS v FROM q),
         |st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM u GROUP BY dim),
         |cu AS (SELECT vec_id, u.dim,
         |  CASE WHEN mx > mn THEN CAST(least(greatest(
         |    round((v - mn) / (mx - mn) * 255), 0), 255) AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS c
         |  FROM u JOIN st USING (dim)),
         |qd AS (SELECT vec_id, dim, c FROM cu WHERE vec_id < 8),
         |dist AS (SELECT qd.vec_id AS q_id, cu.vec_id AS c_id,
         |  CAST(sum((qd.c - cu.c) * (qd.c - cu.c)) AS BIGINT) AS idist
         |  FROM qd JOIN cu USING (dim) WHERE cu.vec_id <> qd.vec_id
         |  GROUP BY 1, 2),
         |stop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY idist, c_id)
         |    AS rank FROM dist) WHERE rank <= $K)
         |SELECT b.q_id,
         |  CAST(sum(CASE WHEN s.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm
         |FROM btop b
         |LEFT JOIN stop s ON b.q_id = s.q_id AND b.c_id = s.c_id
         |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val queries = vecs.filter(col("id") < 8)
      val brute = Similarity.knnBrute(queries, vecs, K)
        .select(col("q_id"), col("c_id"))
      val codes = Similarity.sq8Encode(vecs, col("id"), col("vec"))
      val sq = Similarity.sq8Knn(codes, col("id") < 8, K)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h"))
      brute.join(sq, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("__h"), lit(0L))).as("n"))
        .select(col("q_id"), expr(s"n * 1000000 div $K").as("recall_ppm"))
        .orderBy("q_id")
    },

    // random-projection two-stage top-k (Similarity.rpProject/knnRp):
    // the JL dimensionality-reduction tier — shortlist in a 16-dim
    // integer projection (the stored-code scan: 4x fewer multiplies
    // and bytes per candidate than full width), exact re-rank of the
    // shortlist only. Projection weights come from a shared LCG kept
    // in [-10,10] so every projected dot stays double-exact and the
    // twin replays shortlist AND re-rank bit-for-bit.
    QueryDef("emb_rp_knn",
      s"""WITH $sqlQuant,
         |$sqlRpProj,
         |ps AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlRpCos AS psim
         |  FROM pv a JOIN pv b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |sl AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY psim DESC, c_id) AS rn FROM ps)
         |  WHERE rn <= $RpShortlist),
         |rr AS (SELECT sl.q_id, sl.c_id, $sqlCos AS sim
         |  FROM sl JOIN q a ON a.vec_id = sl.q_id
         |    JOIN q b ON b.vec_id = sl.c_id)
         |SELECT q_id, c_id, CAST(rank AS BIGINT) AS rank,
         |  round(sim, 6) AS sim
         |FROM (SELECT q_id, c_id, sim, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM rr)
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      Similarity.knnRp(vecs.filter(col("id") < 8), vecs, K,
          RpShortlist, RpDim, Dims)
        .orderBy("q_id", "rank")
    },

    // RP recall@K against the exact brute-force top-k (the
    // emb_sq8_recall convention) — the quality measurement for the
    // projection tier
    QueryDef("emb_rp_recall",
      s"""WITH $sqlQuant,
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |btop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
         |    AS rank FROM scored) WHERE rank <= $K),
         |$sqlRpProj,
         |ps AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlRpCos AS psim
         |  FROM pv a JOIN pv b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |sl AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY psim DESC, c_id) AS rn FROM ps)
         |  WHERE rn <= $RpShortlist),
         |rr AS (SELECT sl.q_id, sl.c_id, $sqlCos AS sim
         |  FROM sl JOIN q a ON a.vec_id = sl.q_id
         |    JOIN q b ON b.vec_id = sl.c_id),
         |rtop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
         |    AS rank FROM rr) WHERE rank <= $K)
         |SELECT b.q_id,
         |  CAST(sum(CASE WHEN r.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm
         |FROM btop b
         |LEFT JOIN rtop r ON b.q_id = r.q_id AND b.c_id = r.c_id
         |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val queries = vecs.filter(col("id") < 8)
      val brute = Similarity.knnBrute(queries, vecs, K)
        .select(col("q_id"), col("c_id"))
      val rp = Similarity.knnRp(queries, vecs, K, RpShortlist, RpDim, Dims)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h"))
      brute.join(rp, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("__h"), lit(0L))).as("n"))
        .select(col("q_id"), expr(s"n * 1000000 div $K").as("recall_ppm"))
        .orderBy("q_id")
    },

    // embedding-space drift (Drift.embeddingDrift): PSI/KL between
    // the label<5 and label>=5 slices' distributions over 2^8
    // sign-pattern LSH cells — "did the new batch land in different
    // regions of embedding space?", the modality triple's third leg
    // (tokens, scores, embeddings). Codegen'd bucket fold off one
    // scan, O(256) pricing through the shared Drift.priceBuckets.
    QueryDef("emb_drift",
      s"""WITH $sqlQuant,
         |hb AS (SELECT label < 5 AS r, ($sqlDriftBucketTerms) AS bucket
         |  FROM q),
         |c AS (SELECT bucket,
         |  sum(CASE WHEN r THEN 1 ELSE 0 END) AS c_ref,
         |  sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS c_cand
         |  FROM hb GROUP BY 1),
         |tot AS (SELECT CAST(sum(c_ref) AS BIGINT) AS tr,
         |  CAST(sum(c_cand) AS BIGINT) AS tc FROM c),
         |sk AS (SELECT unnest(range(0, $DriftCells)) AS bucket),
         |f AS (SELECT sk.bucket, coalesce(c.c_ref, 0) AS c_ref,
         |  coalesce(c.c_cand, 0) AS c_cand
         |  FROM sk LEFT JOIN c USING (bucket))
         |SELECT bucket, CAST(c_ref AS BIGINT) AS c_ref,
         |  CAST(c_cand AS BIGINT) AS c_cand,
         |  CAST(round(((c_cand + 1.0) / CAST(tc + $DriftCells AS DOUBLE) -
         |      (c_ref + 1.0) / CAST(tr + $DriftCells AS DOUBLE)) *
         |    ln(((c_cand + 1.0) / CAST(tc + $DriftCells AS DOUBLE)) /
         |       ((c_ref + 1.0) / CAST(tr + $DriftCells AS DOUBLE))) *
         |    1000000000) AS BIGINT) AS psi_e9,
         |  CAST(round((c_cand + 1.0) / CAST(tc + $DriftCells AS DOUBLE) *
         |    ln(((c_cand + 1.0) / CAST(tc + $DriftCells AS DOUBLE)) /
         |       ((c_ref + 1.0) / CAST(tr + $DriftCells AS DOUBLE))) *
         |    1000000000) AS BIGINT) AS kl_e9
         |FROM f, tot ORDER BY bucket""".stripMargin) { (s, d) =>
      graft.ops.Drift.embeddingDrift(
        load(s, d, "embeddings")
          .select(Similarity.quantize(col("embedding")).as("vec"),
            col("label")),
        col("vec"), col("label") < 5, DriftPlanes, Dims)
        .orderBy("bucket")
    },

    // hybrid retrieval (Retrieval.rrfFuse): BM25's lexical top-20 and
    // the embedding cosine top-20 for the fixed query vector (vec_id
    // 0) fuse by reciprocal rank — only RANKS cross the two lists, so
    // BM25's unbounded scores and cosine's [-1,1] never need
    // calibration. The corpus-with-embeddings fixture shares one id
    // space (doc_id == vec_id). Each contribution quantizes once per
    // integer rank; fused scores are exact integer sums.
    QueryDef("doc_hybrid_rrf",
      s"""WITH $sqlQuant,
         |${TextQueries.sqlBm25SrCtes},
         |bl AS (SELECT id, rank FROM (SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id)
         |      AS BIGINT) AS rank FROM sr)
         |  WHERE rank <= ${TextQueries.Bm25TopK}),
         |ec AS (SELECT b.vec_id AS id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id = 0),
         |el AS (SELECT id, rank FROM (SELECT id,
         |    CAST(row_number() OVER (ORDER BY sim DESC, id)
         |      AS BIGINT) AS rank FROM ec)
         |  WHERE rank <= ${TextQueries.Bm25TopK}),
         |u AS (SELECT id, rank FROM bl
         |  UNION ALL SELECT id, rank FROM el),
         |f AS (SELECT id, CAST(count(*) AS BIGINT) AS n_lists,
         |  CAST(sum(CAST(round(1000000000.0 / ($RrfK0 + rank))
         |    AS BIGINT)) AS BIGINT) AS rrf_e9
         |  FROM u GROUP BY 1)
         |SELECT id, n_lists, rrf_e9,
         |  CAST(row_number() OVER (ORDER BY rrf_e9 DESC, id)
         |    AS BIGINT) AS rank
         |FROM f ORDER BY rank LIMIT ${TextQueries.Bm25TopK}"""
        .stripMargin) { (s, d) =>
      val bl = TextOps.bm25TopK(load(s, d, "documents"),
        col("doc_id"), col("text"), TextQueries.Bm25Terms,
        k1 = TextQueries.Bm25K1, b = TextQueries.Bm25B,
        topK = TextQueries.Bm25TopK)
        .select(col("doc_id").as("id"), col("rank"))
      val vecs = load(s, d, "embeddings")
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
      val el = Similarity.knnBrute(vecs.filter(col("id") === 0), vecs,
        TextQueries.Bm25TopK)
        .select(col("c_id").as("id"), col("rank"))
      graft.ops.Retrieval.rrfFuse(Seq(bl, el), RrfK0,
        TextQueries.Bm25TopK)
        .orderBy("rank")
    },

    // streaming drift gate, EMBEDDING modality (DriftMonitor.
    // setEmbeddingReference/applyEmbeddingBatch): the label<5 slice
    // pins the reference cell distribution (the LSH hyperplanes are
    // deterministic, so no geometry persists beyond the plane count),
    // then the label>=5 slice arrives as two vec-parity micro-batches
    // — one verdict row each, priced through the same priceBuckets
    // step and replayed by the shared gate CTEs.
    QueryDef("emb_drift_gate_e2e",
      s"""WITH $sqlQuant,
         |rhb AS (SELECT ($sqlDriftBucketTerms) AS bucket FROM q
         |  WHERE label < 5),
         |rc AS (SELECT bucket, count(*) AS c_ref FROM rhb GROUP BY 1),
         |rtot AS (SELECT CAST(count(*) AS BIGINT) AS tr FROM rhb),
         |dsk AS (SELECT unnest(range(0, $DriftCells)) AS bucket),
         |mhb AS (SELECT vec_id % 2 AS par,
         |  ($sqlDriftBucketTerms) AS bucket FROM q WHERE label >= 5),
         |${TextQueries.sqlGateBatchCtes(0, DriftCells, GateHotPsiE9)},
         |${TextQueries.sqlGateBatchCtes(1, DriftCells, GateHotPsiE9)}
         |SELECT batch, n_cand, psi_e9, kl_e9, n_hot_buckets, hot_buckets
         |FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
         |ORDER BY batch""".stripMargin) { (s, d) =>
      val dir = embGateStateDir(s, d)
      new graft.streaming.DriftMonitor(s, dir, DriftCells,
          GateHotPsiE9)
        .readVerdicts(1L)
        .orderBy("batch")
    },

    // Top principal direction by power iteration
    // (Similarity.topEigen): C = Σ x·xᵀ is never materialized — each
    // round is one scan (codegen'd graft_dot + a dim-keyed
    // aggregation) and an O(dims) driver renormalization. The twin
    // unrolls the EXACT integer trajectory (e3 components, e6
    // iterate, sign-split truncating divisions, max-normalization),
    // so one misrounded component in any round breaks the hash.
    QueryDef("emb_pca_top",
      s"""WITH qe AS MATERIALIZED (SELECT list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
         |  AS eq FROM embeddings),
         |v0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPcaIter).mkString(",\n")},
         |fd AS (SELECT ${sqlPcaDq(s"v$PcaIters")} AS dq
         |  FROM qe, v$PcaIters),
         |tr AS (SELECT sum(CAST(list_sum(list_transform(
         |    range(1, ${Dims + 1}), j -> eq[j] * eq[j])) AS HUGEINT))
         |  AS trace FROM qe),
         |st AS (SELECT sum(CAST(dq AS HUGEINT) * dq) AS num FROM fd),
         |dn AS (SELECT list_sum(list_transform(v,
         |    x -> CAST(x AS HUGEINT) * x)) AS den FROM v$PcaIters),
         |lam AS (SELECT CAST(num * 1000000 // den AS BIGINT)
         |  AS lambda_e6 FROM st, dn)
         |SELECT CAST(j AS BIGINT) AS dim, v[j] AS v_e6, lambda_e6,
         |  CAST(CAST(lambda_e6 AS HUGEINT) * 1000000 // trace
         |    AS BIGINT) AS share_ppm
         |FROM range(1, ${Dims + 1}) t(j), v$PcaIters, lam, tr
         |ORDER BY dim""".stripMargin) { (s, d) =>
      Similarity.topEigen(load(s, d, "embeddings"), col("embedding"),
          Dims, PcaIters)
        .orderBy("dim")
    },

    // Second principal direction (Similarity.secondEigen): the same
    // power iteration with the ITERATE Gram-Schmidt-deflated against
    // v1 after every round — exact BigInt on the O(dims) driver
    // vector, never a data-side pass more than topEigen's. The twin
    // chains BOTH unrolled trajectories (v1's rounds, then the
    // deflated rounds with the HUGEINT projection subtraction), so
    // the two directions' coupling is oracle-pinned end to end.
    QueryDef("emb_pca_top2",
      s"""WITH qe AS MATERIALIZED (SELECT list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
         |  AS eq FROM embeddings),
         |v0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPcaIter).mkString(",\n")},
         |dn1 AS (SELECT list_sum(list_transform(v,
         |    x -> CAST(x AS HUGEINT) * x)) AS den1 FROM v$PcaIters),
         |w0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPca2Iter).mkString(",\n")},
         |fd AS (SELECT ${sqlPcaDq(s"w$PcaIters")} AS dq
         |  FROM qe, w$PcaIters),
         |tr AS (SELECT sum(CAST(list_sum(list_transform(
         |    range(1, ${Dims + 1}), j -> eq[j] * eq[j])) AS HUGEINT))
         |  AS trace FROM qe),
         |st AS (SELECT sum(CAST(dq AS HUGEINT) * dq) AS num FROM fd),
         |dn AS (SELECT list_sum(list_transform(v,
         |    x -> CAST(x AS HUGEINT) * x)) AS den FROM w$PcaIters),
         |lam AS (SELECT CAST(num * 1000000 // den AS BIGINT)
         |  AS lambda_e6 FROM st, dn)
         |SELECT CAST(j AS BIGINT) AS dim, v[j] AS v_e6, lambda_e6,
         |  CAST(CAST(lambda_e6 AS HUGEINT) * 1000000 // trace
         |    AS BIGINT) AS share_ppm
         |FROM range(1, ${Dims + 1}) t(j), w$PcaIters, lam, tr
         |ORDER BY dim""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
      val v1 = Similarity.topEigen(vecs, col("embedding"), Dims,
          PcaIters)
        .orderBy("dim").collect().map(_.getLong(1)) // O(dims)
      Similarity.secondEigen(vecs, col("embedding"), v1, Dims,
          PcaIters)
        .orderBy("dim")
    },

    // 2-d eigenprojection (Similarity.projectEigen): every vector's
    // coordinates along the two principal directions — the actual
    // dimensionality-reduction payoff (plot axes, coarse index
    // cells, drift axes). One scan, two codegen'd dots; the twin
    // replays both unrolled trajectories and the same truncated dot.
    QueryDef("emb_pca_project",
      s"""WITH qe AS MATERIALIZED (SELECT vec_id,
         |  list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
         |  AS eq FROM embeddings),
         |v0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPcaIter).mkString(",\n")},
         |dn1 AS (SELECT list_sum(list_transform(v,
         |    x -> CAST(x AS HUGEINT) * x)) AS den1 FROM v$PcaIters),
         |w0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPca2Iter).mkString(",\n")},
         |p1 AS (SELECT vec_id, ${sqlPcaDq(s"v$PcaIters")} AS c1_e6
         |  FROM qe, v$PcaIters),
         |p2 AS (SELECT vec_id, ${sqlPcaDq(s"w$PcaIters")} AS c2_e6
         |  FROM qe, w$PcaIters)
         |SELECT p1.vec_id, CAST(p1.c1_e6 AS BIGINT) AS c1_e6,
         |  CAST(p2.c2_e6 AS BIGINT) AS c2_e6
         |FROM p1 JOIN p2 USING (vec_id)
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val vecs = load(s, d, "embeddings")
      val v1 = Similarity.topEigen(vecs, col("embedding"), Dims,
          PcaIters)
        .orderBy("dim").collect().map(_.getLong(1))
      val v2 = Similarity.secondEigen(vecs, col("embedding"), v1,
          Dims, PcaIters)
        .orderBy("dim").collect().map(_.getLong(1))
      Similarity.projectEigen(vecs, col("vec_id"), col("embedding"),
          Seq(v1, v2))
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    },

    // The PCA projection's actual payoff, priced: recall@k of a
    // grid-bucketed ANN tier over the 2-d projection
    // (Similarity.pcaGridCandidates/knnPcaGrid — each query probes
    // its 3×3 trunc(c/G) cell neighborhood, candidates re-ranked by
    // the EXACT full-dim integer cosine) against the brute-force
    // exact top-k, in exact ppm with the per-query candidate count
    // alongside (the shortlist the grid actually paid for). Measured
    // honesty, same caveat as emb_rp_recall: the synthetic fixture
    // is near-isotropic, so 2 of 64 dims carry little neighborhood
    // signal — recall@10 lands ~40–100% (median ~70%) at a ~60%
    // shortlist here; on clustered data the same grid prunes far
    // harder. The twin replays both unrolled projection
    // trajectories, the truncating grid, the 9-cell probe and both
    // top-k ranks.
    QueryDef("emb_pca_ann_recall",
      s"""WITH $sqlQuant,
         |qe AS (SELECT vec_id,
         |  list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
         |  AS eq FROM embeddings),
         |v0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPcaIter).mkString(",\n")},
         |dn1 AS (SELECT list_sum(list_transform(v,
         |    x -> CAST(x AS HUGEINT) * x)) AS den1 FROM v$PcaIters),
         |w0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPca2Iter).mkString(",\n")},
         |p1 AS (SELECT vec_id, CAST(${sqlPcaDq(s"v$PcaIters")} AS BIGINT)
         |  AS c1 FROM qe, v$PcaIters),
         |p2 AS (SELECT vec_id, CAST(${sqlPcaDq(s"w$PcaIters")} AS BIGINT)
         |  AS c2 FROM qe, w$PcaIters),
         |pc AS (SELECT vec_id, c1 // $PcaGrid AS g1, c2 // $PcaGrid AS g2
         |  FROM p1 JOIN p2 USING (vec_id)),
         |bscored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |btop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM bscored)
         |  WHERE rank <= $K),
         |off AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx),
         |  (SELECT unnest([-1, 0, 1]) AS dy)),
         |qn AS (SELECT vec_id AS q_id, g1 + dx AS g1, g2 + dy AS g2
         |  FROM pc, off WHERE vec_id < 8),
         |cand AS (SELECT qn.q_id, c.vec_id AS c_id
         |  FROM qn JOIN pc c USING (g1, g2) WHERE c.vec_id <> qn.q_id),
         |ascored AS (SELECT cand.q_id, cand.c_id, $sqlCos AS sim
         |  FROM cand JOIN q a ON a.vec_id = cand.q_id
         |  JOIN q b ON b.vec_id = cand.c_id),
         |atop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM ascored)
         |  WHERE rank <= $K),
         |nc AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_cand
         |  FROM cand GROUP BY q_id)
         |SELECT b.q_id, coalesce(nc.n_cand, 0) AS n_cand,
         |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm
         |FROM btop b
         |LEFT JOIN atop a ON b.q_id = a.q_id AND b.c_id = a.c_id
         |LEFT JOIN nc ON nc.q_id = b.q_id
         |GROUP BY b.q_id, nc.n_cand
         |ORDER BY b.q_id""".stripMargin) { (s, d) =>
      val vecsRaw = load(s, d, "embeddings")
      val v1 = Similarity.topEigen(vecsRaw, col("embedding"), Dims,
          PcaIters)
        .orderBy("dim").collect().map(_.getLong(1))
      val v2 = Similarity.secondEigen(vecsRaw, col("embedding"), v1,
          Dims, PcaIters)
        .orderBy("dim").collect().map(_.getLong(1))
      val proj = Similarity.projectEigen(vecsRaw, col("vec_id"),
        col("embedding"), Seq(v1, v2))
      val base = vecsRaw.select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
        .join(proj, "id")
      val queries = base.filter(col("id") < 8)
      val brute = Similarity.knnBrute(queries, base, K)
        .select(col("q_id"), col("c_id"))
      val ann = Similarity.knnPcaGrid(queries, base, PcaGrid, K)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h"))
      val ncand = Similarity.pcaGridCandidates(queries, base, PcaGrid)
        .groupBy("q_id").agg(count(lit(1)).as("n_cand"))
      brute.join(ann, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("__h"), lit(0L))).as("nh"))
        .join(ncand, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          expr(s"nh * 1000000 div $K").as("recall_ppm"))
        .orderBy("q_id")
    },

    // The PCA-grid tier's APPLICABILITY CONDITION, measured (r15/r16
    // verdict carry-over): emb_pca_ann_recall runs on the
    // near-isotropic synthetic corpus where 2 of 64 dims can't carry
    // the neighborhood (~60% shortlist at ~70% recall — honest, and
    // honestly unflattering). This fixture is the data the tier is
    // FOR: 500 vectors in 8 clusters centered on integer points of
    // norm 5 on a circle in the (dim1, dim2) plane (max cross-cluster
    // center dot 20 vs within-cluster 25, so exact-cosine top-k stays
    // in-cluster by margin), dyadic jitter (±1/8) and 16 dims of
    // ±4/8 noise so every quantized value is an EXACT integer in both
    // engines, dims 19..64 zero. Variance concentrates in the plane,
    // the power iteration finds it, clusters land in distinct grid
    // cells, and the 3×3 probe prunes hard: shortlist_ppm < 200000
    // (< 20%) at recall_ppm = 1000000 per query — the numbers that
    // justify shipping the tier next to emb_ivf_recall. vec_id < 500
    // pins the fixture at every sf. Twin replays the synthesis, both
    // unrolled eigen trajectories, the grid, the probe and both
    // top-k ranks.
    QueryDef("emb_pca_ann_recall_lowrank",
      s"""WITH lre AS (SELECT vec_id, list_transform(range(1, ${Dims + 1}),
         |  j -> CASE
         |    WHEN j = 1 THEN CAST($SqlLrCx[CAST(vec_id % 8 AS INT) + 1]
         |      AS DOUBLE) + (CAST((vec_id + 1) % 3 AS DOUBLE) - 1) / 8
         |    WHEN j = 2 THEN CAST($SqlLrCy[CAST(vec_id % 8 AS INT) + 1]
         |      AS DOUBLE) + (CAST((vec_id + 2) % 3 AS DOUBLE) - 1) / 8
         |    WHEN j <= 18 THEN
         |      (CAST((vec_id * 31 + j * 17) % 9 AS DOUBLE) - 4) / 8
         |    ELSE CAST(0 AS DOUBLE) END) AS embedding
         |  FROM embeddings WHERE vec_id < 500),
         |q AS (SELECT vec_id, list_transform(embedding,
         |  x -> CAST(round(x * 1000) AS DOUBLE)) AS e FROM lre),
         |qe AS (SELECT vec_id, list_transform(embedding,
         |  x -> CAST(round(x * 1000) AS BIGINT)) AS eq FROM lre),
         |v0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPcaIter).mkString(",\n")},
         |dn1 AS (SELECT list_sum(list_transform(v,
         |    x -> CAST(x AS HUGEINT) * x)) AS den1 FROM v$PcaIters),
         |w0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dims + 1}),
         |  j -> CAST(1000000 AS BIGINT)) AS v),
         |${(1 to PcaIters).map(sqlPca2Iter).mkString(",\n")},
         |p1 AS (SELECT vec_id, CAST(${sqlPcaDq(s"v$PcaIters")} AS BIGINT)
         |  AS c1 FROM qe, v$PcaIters),
         |p2 AS (SELECT vec_id, CAST(${sqlPcaDq(s"w$PcaIters")} AS BIGINT)
         |  AS c2 FROM qe, w$PcaIters),
         |pc AS (SELECT vec_id, c1 // $PcaGrid AS g1, c2 // $PcaGrid AS g2
         |  FROM p1 JOIN p2 USING (vec_id)),
         |bscored AS (SELECT a.vec_id AS q_id, b.vec_id AS c_id, $sqlCos AS sim
         |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
         |  WHERE a.vec_id < 8),
         |btop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM bscored)
         |  WHERE rank <= $K),
         |off AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx),
         |  (SELECT unnest([-1, 0, 1]) AS dy)),
         |qn AS (SELECT vec_id AS q_id, g1 + dx AS g1, g2 + dy AS g2
         |  FROM pc, off WHERE vec_id < 8),
         |cand AS (SELECT qn.q_id, c.vec_id AS c_id
         |  FROM qn JOIN pc c USING (g1, g2) WHERE c.vec_id <> qn.q_id),
         |ascored AS (SELECT cand.q_id, cand.c_id, $sqlCos AS sim
         |  FROM cand JOIN q a ON a.vec_id = cand.q_id
         |  JOIN q b ON b.vec_id = cand.c_id),
         |atop AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER
         |  (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank FROM ascored)
         |  WHERE rank <= $K),
         |nc AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_cand
         |  FROM cand GROUP BY q_id)
         |SELECT b.q_id, coalesce(nc.n_cand, 0) AS n_cand,
         |  CAST(coalesce(nc.n_cand, 0) * 1000000 // 499 AS BIGINT)
         |    AS shortlist_ppm,
         |  CAST(sum(CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $K AS BIGINT) AS recall_ppm
         |FROM btop b
         |LEFT JOIN atop a ON b.q_id = a.q_id AND b.c_id = a.c_id
         |LEFT JOIN nc ON nc.q_id = b.q_id
         |GROUP BY b.q_id, nc.n_cand
         |ORDER BY b.q_id""".stripMargin) { (s, d) =>
      val fixture = load(s, d, "embeddings")
        .filter(col("vec_id") < 500)
        .select(col("vec_id"), expr(SparkLrEmb).as("embedding"))
      val v1 = Similarity.topEigen(fixture, col("embedding"), Dims,
          PcaIters)
        .orderBy("dim").collect().map(_.getLong(1))
      val v2 = Similarity.secondEigen(fixture, col("embedding"), v1,
          Dims, PcaIters)
        .orderBy("dim").collect().map(_.getLong(1))
      val proj = Similarity.projectEigen(fixture, col("vec_id"),
        col("embedding"), Seq(v1, v2))
      val base = fixture.select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("vec"))
        .join(proj, "id")
      val queries = base.filter(col("id") < 8)
      val brute = Similarity.knnBrute(queries, base, K)
        .select(col("q_id"), col("c_id"))
      val ann = Similarity.knnPcaGrid(queries, base, PcaGrid, K)
        .select(col("q_id"), col("c_id"), lit(1L).as("__h"))
      val ncand = Similarity.pcaGridCandidates(queries, base, PcaGrid)
        .groupBy("q_id").agg(count(lit(1)).as("n_cand"))
      brute.join(ann, Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("__h"), lit(0L))).as("nh"))
        .join(ncand, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          expr("coalesce(n_cand, 0L) * 1000000 div 499")
            .as("shortlist_ppm"),
          expr(s"nh * 1000000 div $K").as("recall_ppm"))
        .orderBy("q_id")
    })

  /** Power-iteration rounds for emb_pca_top — few enough that the
    * unrolled twin stays readable, enough that the iterate moves
    * well off the all-ones seed.
    */
  private lazy val PcaIters = 3

  /** PCA-grid ANN cell width (e6 projection units). The sf0.01
    * projection spans ≈ ±1.6e6 with σ ≈ 4.5e5, so 3e5 gives a
    * useful handful of cells per axis and a 3×3 probe window ≈
    * ±σ — scale-free thereafter: the projection scale is set by
    * the e6 renormalization, not the corpus size.
    */
  private lazy val PcaGrid = 300000L

  /** The sign-split e9→e6 dot truncation over (eq, v) — Spark `div`
    * truncates toward zero while DuckDB `//` floors, so negative
    * dots split on sign before dividing.
    */
  private def sqlPcaDq(vcte: String): String = {
    val dot = s"list_sum(list_transform(range(1, ${Dims + 1}), " +
      s"j -> eq[j] * v[j]))"
    s"(CASE WHEN $dot < 0 THEN -((-($dot)) // 1000) " +
      s"ELSE ($dot) // 1000 END)"
  }

  /** One DEFLATED power-iteration round for the second direction:
    * the [[sqlPcaIter]] shape against w{t-1}, then the Gram-Schmidt
    * subtraction y − ((y·v1)/|v1|²)·v1 in sign-split HUGEINT before
    * the max renormalization. v1 is the first chain's final iterate.
    */
  private def sqlPca2Iter(t: Int): String =
    s"""dd$t AS MATERIALIZED (SELECT ${sqlPcaDq(s"w${t - 1}")} AS dq, eq
       |  FROM qe, w${t - 1}),
       |yy$t AS MATERIALIZED (SELECT j, sum(CAST(eq[j] AS HUGEINT) * dq) AS y
       |  FROM dd$t, range(1, ${Dims + 1}) t(j) GROUP BY j),
       |pj$t AS MATERIALIZED (SELECT sum(yy$t.y * CAST(v[j] AS HUGEINT)) AS proj
       |  FROM yy$t, v$PcaIters),
       |yd$t AS MATERIALIZED (SELECT j, y - (CASE
       |    WHEN proj * CAST(v[j] AS HUGEINT) < 0
       |    THEN -((-(proj * CAST(v[j] AS HUGEINT))) // den1)
       |    ELSE (proj * CAST(v[j] AS HUGEINT)) // den1 END) AS y
       |  FROM yy$t, pj$t, v$PcaIters, dn1),
       |mm$t AS MATERIALIZED (SELECT max(abs(y)) AS mx FROM yd$t),
       |w$t AS MATERIALIZED (SELECT list(CAST(CASE WHEN y < 0
       |    THEN -(((-y) * 1000000) // mx)
       |    ELSE (y * 1000000) // mx END AS BIGINT) ORDER BY j) AS v
       |  FROM yd$t, mm$t)""".stripMargin

  /** One power-iteration round: per-row truncated dot against
    * v{t-1}, dim-keyed HUGEINT accumulation, exact max-|y|
    * renormalization to ±1e6.
    */
  private def sqlPcaIter(t: Int): String =
    s"""d$t AS MATERIALIZED (SELECT ${sqlPcaDq(s"v${t - 1}")} AS dq, eq
       |  FROM qe, v${t - 1}),
       |y$t AS MATERIALIZED (SELECT j, sum(CAST(eq[j] AS HUGEINT) * dq) AS y
       |  FROM d$t, range(1, ${Dims + 1}) t(j) GROUP BY j),
       |m$t AS MATERIALIZED (SELECT max(abs(y)) AS mx FROM y$t),
       |v$t AS MATERIALIZED (SELECT list(CAST(CASE WHEN y < 0
       |    THEN -(((-y) * 1000000) // mx)
       |    ELSE (y * 1000000) // mx END AS BIGINT) ORDER BY j) AS v
       |  FROM y$t, m$t)""".stripMargin

  /** Embedding-gate state: quantized vectors split by label —
    * label<5 pins the reference cells, label>=5 arrives as two
    * vec-parity micro-batches.
    */
  private def embGateStateDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    TempState.dir("embgate|" + s.sparkContext.applicationId + "|" + d) {
      root =>
        val mon = new graft.streaming.DriftMonitor(s, root, DriftCells,
          GateHotPsiE9)
        val q = load(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            Similarity.quantize(col("embedding")).as("vec"))
        mon.setEmbeddingReference(q.filter(col("label") < 5), col("vec"),
          DriftPlanes, Dims)
        val cand = q.filter(col("label") >= 5)
        mon.applyEmbeddingBatch(cand.filter(col("vec_id") % 2 === 0),
          col("vec"), DriftPlanes, Dims, 0L)
        mon.applyEmbeddingBatch(cand.filter(col("vec_id") % 2 === 1),
          col("vec"), DriftPlanes, Dims, 1L)
    }
}
