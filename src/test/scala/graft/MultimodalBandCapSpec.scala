package graft

import graft.ops.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual band-cap skew guard (`bandCap` on
  * [[Multimodal.dhashBandProbeCandidates]]) — the [[DedupSkewSpec]]
  * contracts at the perceptual tier, where the hub hazard is a
  * degenerate hash value (flat images → all-zero dHash) rather than
  * boilerplate text:
  *
  *  1. guard idle (cap ≥ every band bucket) ⇒ output EXACTLY equals
  *     the historical uncapped probe;
  *  2. a degenerate cluster of m identical hashes emits O(m) star
  *     edges, not m²/2, and every member stays CONNECTED to the
  *     min-id hub (components preserved);
  *  3. a light row at radius 1 of a heavy bucket's value connects to
  *     the HUB, not the members — bounded fan-out with verified
  *     reachability into the cluster;
  *  4. the census ([[Multimodal.dhashHeavyBands]]) names every
  *     over-cap bucket with its exact size.
  */
class MultimodalBandCapSpec extends SparkSpec {
  import spark.implicits._

  private def hs(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("id", "hash_hi", "hash_lo")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // a spread of distinct hashes: no band bucket ever exceeds 1 row
  // (i + 101 keeps the all-zero hash — whose bands collide with the
  // degenerate clusters below — out of the filler)
  private def spread(n: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val h = ((i + 101).toLong * 0x9e3779b97f4a7c15L) >>> 1
      (i.toLong, (h >>> 32) & 0xffffffffL, h & 0xffffffffL)
    }

  test("guard idle: capped output equals uncapped exactly") {
    val rows = spread(40) ++ Seq(
      (100L, 0L, 0L), (101L, 0L, 1L), (102L, 0L, 3L)) // a near trio
    val exact = pairSet(Multimodal.dhashBandProbeCandidates(hs(rows)))
    val capped = pairSet(
      Multimodal.dhashBandProbeCandidates(hs(rows), bandCap = 1000000))
    assert(capped == exact)
    assert(exact.contains((100L, 101L)) && exact.contains((100L, 102L)),
      "radius-1 neighbors must be candidates either way")
  }

  test("degenerate cluster star-collapses: O(m) edges, all members " +
      "reach the min-id hub, verified hashes ride along") {
    val m = 50
    val cluster = (0 until m).map(i => (200L + i, 7L, 7L))
    val rows = spread(20) ++ cluster
    val capped = Multimodal.dhashBandProbeCandidates(hs(rows),
      bandCap = 8)
    val got = capped.collect()
    val within = got.filter(r => r.getLong(0) >= 200L)
    // star: hub 200 to each of the 49 members, nothing member-member
    assert(within.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (201 until 200 + m).map(i => (200L, i.toLong)).toSet)
    // the hashes on star edges are the real ones (exact verify works)
    assert(within.forall(r => r.getLong(2) == 7L && r.getLong(4) == 7L))
    // and the uncapped quadratic list is what we did NOT emit
    val uncapped = pairSet(Multimodal.dhashBandProbeCandidates(hs(rows)))
    assert(uncapped.count(p => p._1 >= 200L) == m * (m - 1) / 2)
  }

  test("a light radius-1 neighbor of a heavy value connects to the " +
      "hub only") {
    val cluster = (0 until 20).map(i => (300L + i, 7L, 7L))
    // one bit off the cluster's value in band 0 (6 vs 7) and FAR in
    // every other band (5/9/5 vs 0/7/0) — a genuinely light row whose
    // only way into the cluster is the radius-1 probe of band 0
    val neighbor = Seq((5L, (5L << 16) | 9L, (5L << 16) | 6L))
    val capped = Multimodal.dhashBandProbeCandidates(
      hs(neighbor ++ cluster), bandCap = 8)
    val touching5 = pairSet(capped).filter(p => p._1 == 5L || p._2 == 5L)
    assert(touching5 == Set((5L, 300L)),
      s"neighbor must pair with the hub alone, got $touching5")
  }

  test("census names every over-cap bucket with its exact size") {
    val cluster = (0 until 30).map(i => (400L + i, 7L, 7L))
    val census = Multimodal.dhashHeavyBands(hs(spread(10) ++ cluster),
        cap = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    // hash (7, 7): band 0 = lo&0xffff = 7, band 1 = lo>>16 = 0,
    // band 2 = hi&0xffff = 7, band 3 = hi>>16 = 0
    assert(census == Set((0, 7L, 30L), (1, 0L, 30L), (2, 7L, 30L),
      (3, 0L, 30L)))
  }
}
