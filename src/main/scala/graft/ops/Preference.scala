package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise-preference aggregation — the RLHF-data primitive: given a
  * stream of comparisons ("A beat B"), fit a Bradley-Terry strength
  * per item (Bradley & Terry 1952) with Hunter's MM iteration
  * (Hunter 2004, "MM algorithms for generalized Bradley-Terry
  * models"):
  *
  *   θ_i ← W_i / Σ_j n_ij / (θ_i + θ_j)
  *
  * where W_i = i's total wins and n_ij = games between i and j.
  *
  * Scale shape: the corpus-sized work is ONE pass — a per-user lag
  * window (scan-parallel, shuffled once by user) and a groupBy onto
  * the canonical pair table, which is O(items²) and item-bounded
  * (event types, model ids, prompt templates — never corpus-sized).
  * The MM fixed-point then runs on that collected table,
  * O(iters · items²) driver work — the same bounded-state pattern as
  * the k-means centroid and BPE merge loops. (An unbounded item set
  * would instead keep θ as a frame and run each MM step as a
  * broadcast join + re-aggregation, PageRank-style.)
  *
  * Exactness contract: θ is integer micro-units; every MM transfer
  * n_ij·Q/(θ_i+θ_j) floor-divides BigInt integers BEFORE summation
  * and each round renormalizes to Σθ = items·1e6 by one more floor
  * division — the whole trajectory is exact integer arithmetic, so a
  * SQL twin replays it verbatim with unrolled CTEs (HUGEINT `//` and
  * BigInt `/` agree: both floor for positive operands).
  */
object Preference {

  /** e12 transfer quantizer: n·Q/(θ_i+θ_j) keeps ~6 significant
    * digits past the e6 θ scale, and W·Q stays far inside 128-bit
    * range for any real corpus.
    */
  private val Q = BigInt("1000000000000")
  private val Scale = BigInt(1000000)

  /** Canonical pairwise comparisons from an event stream: consecutive
    * events of one user (ordered by `orderUs`, event_id) with
    * DIFFERENT types and DIFFERENT values form one game; the type
    * with the larger value wins. Returns one row per unordered pair:
    * (item_a < item_b, wins_a, wins_b).
    */
  def pairwiseFromEvents(events: DataFrame,
      orderUs: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(orderUs, col("event_id"))
    events
      .withColumn("__pt", lag(col("event_type"), 1).over(w))
      .withColumn("__pv", lag(col("value"), 1).over(w))
      .filter(col("__pt").isNotNull && col("__pt") =!= col("event_type") &&
        col("value") =!= col("__pv"))
      .select(
        least(col("event_type"), col("__pt")).as("item_a"),
        greatest(col("event_type"), col("__pt")).as("item_b"),
        when(col("value") > col("__pv"), col("event_type"))
          .otherwise(col("__pt")).as("__win"))
      .groupBy("item_a", "item_b")
      .agg(
        sum(when(col("__win") === col("item_a"), 1L).otherwise(0L))
          .as("wins_a"),
        sum(when(col("__win") === col("item_b"), 1L).otherwise(0L))
          .as("wins_b"))
  }

  /** Bradley-Terry strengths by `iters` MM rounds over a canonical
    * pair table (item_a, item_b, wins_a, wins_b). The pair table is
    * collected — it is O(items²) by construction (see object doc).
    * Returns (item, wins, games, theta_e6, rk) ranked by strength
    * (ties by item).
    */
  def bradleyTerry(spark: SparkSession, pairs: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val pc = pairs.select("item_a", "item_b", "wins_a", "wins_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    require(pc.nonEmpty, "bradleyTerry needs at least one compared pair")
    val items = pc.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val wins = items.map { i =>
      i -> pc.map { case (a, b, wa, wb) =>
        if (i == a) wa else if (i == b) wb else 0L }.sum
    }.toMap
    // directed neighbor lists with total games per edge
    val edges: Map[String, Seq[(String, Long)]] = {
      val dir = pc.flatMap { case (a, b, wa, wb) =>
        Seq((a, b, wa + wb), (b, a, wa + wb)) }
      items.map(i => i ->
        dir.filter(_._1 == i).map(e => (e._2, e._3)).toSeq).toMap
    }
    val k = BigInt(items.length)
    var th: Map[String, BigInt] = items.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val raw = items.map { i =>
        val w = wins(i)
        if (w == 0L) BigInt(1)
        else {
          val den = edges(i).map { case (j, n) =>
            (BigInt(n) * Q) / (th(i) + th(j)) }.sum
          (BigInt(w) * Q) / den
        }
      }
      val s = raw.sum
      th = items.zip(raw).map { case (i, r) =>
        i -> ((r * (k * Scale)) / s).max(BigInt(1)) }.toMap
    }
    val ranked = items
      .map(i => (i, wins(i), edges(i).map(_._2).sum, th(i).toLong))
      .sortBy { case (i, _, _, t) => (-t, i) }
      .zipWithIndex
      .map { case ((i, w, g, t), r) => Row(i, w, g, t, r + 1L) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(ranked.toSeq, 1),
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("wins", LongType, nullable = false),
        StructField("games", LongType, nullable = false),
        StructField("theta_e6", LongType, nullable = false),
        StructField("rk", LongType, nullable = false))))
  }
}
