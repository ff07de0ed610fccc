package graft

import graft.functions.GraftFunctions.tokens
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band-bucket skew guard (`bucketCap`): a boilerplate-heavy corpus
  * collapses many documents into ONE LSH band bucket, and the uncapped
  * band self-join then emits m²/2 rows — the quadratic blowup banding
  * alone does not prevent. These tests pin the three guard contracts:
  *
  *  1. guard idle (cap ≥ every bucket) ⇒ output EXACTLY equals the
  *     historical uncapped plan;
  *  2. heavy bucket ⇒ intermediate candidate rows are O(m) (star), not
  *     O(m²), at m = 10⁴ — the scale the uncapped join could not
  *     materialize in a test budget at all (5·10⁷ rows);
  *  3. the verdict-level consumers (connected components / canonical
  *     labeling) are UNCHANGED by the guard on homogeneous clusters —
  *     star edges keep every verified member connected to the hub.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private def randomDocs(n: Int, seed: Int, idBase: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      (idBase + i, words.mkString(" "))
    }
  }

  private def withSets(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("hs", Dedup.tokenHashSet(col("text")))

  private def componentMap(pairs: DataFrame): Map[Long, Long] =
    Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("guard idle: capped output equals uncapped exactly") {
    val docs = withSets(randomDocs(120, seed = 7, idBase = 0L))
    val exact = Dedup.minhashNearDupPairs(docs, "doc_id", "hs", 16, 8, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.minhashNearDupPairs(docs, "doc_id", "hs", 16, 8, 0.8,
      bucketCap = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == exact)
    val candExact = Dedup.lshCandidates(
      Dedup.minhashFromHashes(docs.select(col("doc_id"), col("hs")),
        col("hs"), 16), "doc_id", 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candCapped = Dedup.lshCandidates(
      Dedup.minhashFromHashes(docs.select(col("doc_id"), col("hs")),
        col("hs"), 16), "doc_id", 16, 8, bucketCap = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candCapped == candExact)
  }

  test("heavy bucket: 10^4 identical docs emit O(m) star candidates") {
    val m = 10000
    // identical text ⇒ identical signatures ⇒ all m docs share every
    // band bucket; uncapped candidates would be m(m-1)/2 ≈ 5·10⁷
    val boiler = (0 until m).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
    val docs = withSets(boiler ++ randomDocs(50, seed = 3, idBase = 100000L))
    val sigs = Dedup.minhashFromHashes(
      docs.select(col("doc_id"), col("hs")), col("hs"), 16)
    val cand = Dedup.lshCandidates(sigs, "doc_id", 16, 8, bucketCap = 100)
    // the heavy cluster contributes exactly m-1 hub edges (hub = min
    // id); the 50 random docs contribute at most their own pairs
    val n = cand.count()
    assert(n >= (m - 1).toLong && n <= (m - 1).toLong + 50L * 49L / 2L,
      s"candidate count $n not O(m)")
    val starOnly = cand.filter(col("id_b") < 100000L)
    assert(starOnly.count() == (m - 1).toLong)
    assert(starOnly.agg(max(col("id_a"))).head.getLong(0) == 0L,
      "every heavy-bucket edge must use the min-id hub")
    // the monitoring side output sees the heavy buckets
    val bands = Dedup.bandTable(docs, "doc_id", "hs", 16, 8)
    val heavy = Dedup.heavyBandBuckets(bands, 100)
      .collect().map(r => r.getLong(1)).toSeq
    assert(heavy.nonEmpty && heavy.forall(_ >= m.toLong))
    // verified star pairs: all identical ⇒ jac = 1.0, m-1 rows
    val verified = Dedup.minhashNearDupPairs(docs, "doc_id", "hs", 16, 8,
      0.95, bucketCap = 100).filter(col("id_b") < 100000L)
    val vRows = verified.collect()
    assert(vRows.length == m - 1)
    assert(vRows.forall(_.getDouble(2) == 1.0d))
  }

  test("verdict-level equivalence: components unchanged by the guard") {
    // heavy homogeneous cluster + near-dup pair + noise: the capped
    // pair LIST is sparser, but the component labeling must agree
    val cluster = (0 until 300).map(i =>
      (1000L + i, "one two three four five six seven eight nine ten"))
    val nearA = (5000L, "zebra yak xray wolf viper unicorn tiger snake raven")
    val nearB = (5001L, "zebra yak xray wolf viper unicorn tiger snake quail")
    val docs = withSets(cluster ++ Seq(nearA, nearB) ++
      randomDocs(80, seed = 11, idBase = 9000L))
    val exactPairs = Dedup.minhashNearDupPairs(docs, "doc_id", "hs", 16, 8, 0.8)
    val cappedPairs = Dedup.minhashNearDupPairs(docs, "doc_id", "hs", 16, 8,
      0.8, bucketCap = 20)
    assert(cappedPairs.count() < exactPairs.count(),
      "guard must actually fire on the heavy cluster")
    assert(componentMap(cappedPairs) == componentMap(exactPairs))
  }

  test("simhash guard: star collapse, verified dist, same components") {
    val cluster = (0 until 2000).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val docs = Dedup.simhash32(
      withSets(cluster ++ randomDocs(60, seed = 5, idBase = 50000L)),
      tokens(col("text")))
    val capped = Dedup.simhashPairs(docs, "doc_id", bands = 4,
      bitsPerBand = 8, maxDist = 3, bucketCap = 50)
    val star = capped.filter(col("id_b") < 50000L)
    assert(star.count() == 1999L)
    assert(star.filter(col("dist") =!= 0).count() == 0L)
    // verdict equivalence at a scale where uncapped is feasible. The
    // noise docs get unique single tokens: SimHash's 8-bit band space
    // is tiny, so RANDOM near-vocab noise forms MIXED heavy buckets
    // whose noise-noise edges star collapse legitimately drops (the
    // guarantee is for homogeneous clusters — scaladoc'd); far-apart
    // tokens give noise docs no verified edges under EITHER variant,
    // pinning that the homogeneous cluster collapses identically and
    // the guard invents nothing. The token text is Knuth-scrambled:
    // the portable hash is a base-31 polynomial, so SEQUENTIAL token
    // strings would hash to adjacent values — hamming 1-2 apart,
    // accidental real near-dups.
    val far = (0 until 60).map(i =>
      (50000L + i, s"t${i * 2654435761L}"))
    val small = Dedup.simhash32(withSets(cluster.take(120) ++ far),
      tokens(col("text")))
    val exactP = Dedup.simhashPairs(small, "doc_id", 4, 8, 3)
    val cappedP = Dedup.simhashPairs(small, "doc_id", 4, 8, 3, bucketCap = 15)
    assert(componentMap(cappedP) == componentMap(exactP))
  }

  // ─────────────── probe-side guard (incrementalNearDupBands) ───────────────

  private def bandRows(rows: Seq[(Long, Seq[Long], String)]): DataFrame =
    rows.toDF("doc_id", "hs", "band_key")

  test("probe guard: heavy corpus band compares only its hub row") {
    // synthetic band tables make the adversarial case constructible:
    // a heavy band whose HUB does not match the incoming doc but
    // whose non-hub members do. Capped, only the hub crosses the
    // join ⇒ no verdict; uncapped finds the non-hub match. That
    // difference IS the proof the fan-out is bounded to the hub.
    val incomingHs = Seq(1L, 2L, 3L, 4L, 5L)
    val hubHs = Seq(100L, 200L, 300L, 400L, 500L) // disjoint ⇒ jac 0
    val corpus = bandRows(
      (10L, hubHs, "b1") +: (11L to 60L).map(i => (i, incomingHs, "b1")))
    val incoming = bandRows(Seq((999L, incomingHs, "b1")))
    val exact = Dedup.incrementalNearDupBands(corpus, incoming,
      "doc_id", 0.9).collect()
    assert(exact.length == 1 && exact.head.getLong(1) == 11L)
    val capped = Dedup.incrementalNearDupBands(corpus, incoming,
      "doc_id", 0.9, probeCap = 16).collect()
    assert(capped.isEmpty,
      "capped probe must compare the hub only (bounded fan-out)")
    // homogeneous heavy band (the case the guard is designed for):
    // hub matches, so the capped verdict equals the uncapped one
    val homo = bandRows((10L to 60L).map(i => (i, incomingHs, "b1")))
    val cappedHomo = Dedup.incrementalNearDupBands(homo, incoming,
      "doc_id", 0.9, probeCap = 16).collect()
    assert(cappedHomo.length == 1 && cappedHomo.head.getLong(1) == 10L &&
      cappedHomo.head.getDouble(2) == 1.0d)
    // guard idle (cap >= band size) ⇒ exact output
    val idle = Dedup.incrementalNearDupBands(corpus, incoming,
      "doc_id", 0.9, probeCap = 1000).collect()
    assert(idle.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      exact.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("curation pipeline defaults to the capped guard") {
    // the default Config must not inherit the quadratic band join
    assert(graft.ops.CurationPipeline.Config().bucketCap == 32)
    // heavy homogeneous cluster through the DEFAULT pipeline: runs in
    // star regime and still flags every non-canonical copy
    val m = 2000
    val cluster = (0 until m).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
    val docs = (cluster ++ randomDocs(50, seed = 13, idBase = 100000L))
      .toDF("doc_id", "text")
    val out = graft.ops.CurationPipeline.curate(docs)
      .select("doc_id", "is_canonical", "is_near_dup").collect()
    val clusterRows = out.filter(_.getLong(0) < 100000L)
    assert(clusterRows.count(r => !r.getBoolean(2)) == 1,
      "exactly the hub survives the near-dup stage")
    assert(clusterRows.count(_.getBoolean(1)) == 1,
      "exact-dedup canonical is unique in the cluster")
  }

  test("curation pipeline: optional chunk-dedup stage strips boilerplate") {
    // every doc shares a 4-token boilerplate header; bodies distinct
    val header = "copyright footer legal text"
    val docs = (0 until 20).map(i =>
      (i.toLong, s"$header unique body number$i words w$i x$i y$i z$i"))
      .toDF("doc_id", "text")
    val cfg = graft.ops.CurationPipeline.Config(
      minTokens = 5, chunkDedupWindow = Some(4), chunkDedupMaxDf = 2)
    val out = graft.ops.CurationPipeline.curate(docs, cfg)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 12 tokens per doc, the 4-token header chunk dropped everywhere
    assert(out.values.toSet === Set(8L),
      s"token counts after chunk dedup: $out")
    // default config leaves the text alone
    val plain = graft.ops.CurationPipeline.curate(docs,
        graft.ops.CurationPipeline.Config(minTokens = 5))
      .select("n_tokens").collect().map(_.getLong(0)).toSet
    assert(plain === Set(12L))
  }
}
