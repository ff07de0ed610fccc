package graft

import graft.ops.Drift
import org.apache.spark.sql.functions._

/** Drift: the PSI/KL bucket table's identities — zero on identical
  * slices, positive and hot on disjoint ones, totals exact.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical slices drift by exactly zero") {
    // every text once in each slice → equal counts, equal totals,
    // p_ref == p_cand bucket-for-bucket → every contribution is 0
    val texts = Seq("alpha beta gamma", "delta alpha", "beta beta zeta")
    val df = texts.flatMap(t => Seq((t, true), (t, false)))
      .toDF("text", "r")
    val got = Drift.tokenBucketDrift(df, col("text"), col("r"), 32)
      .collect()
    assert(got.length == 32)
    assert(got.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    assert(got.map(_.getLong(1)).sum == 8L) // 8 ref tokens
  }

  test("disjoint vocabularies drift hard and per-bucket PSI is >= 0") {
    val df = (
      Seq.fill(20)(("aardvark albatross auk", true)) ++
      Seq.fill(20)(("zebra zorilla zebu", false))).toDF("text", "r")
    val per = Drift.tokenBucketDrift(df, col("text"), col("r"), 64)
    val rows = per.collect()
    assert(rows.forall(_.getLong(3) >= 0L)) // PSI contributions >= 0
    val sum = Drift.driftSummary(per, hotPsiE9 = 1000000L).head()
    // total PSI far above the 0.25 'shifted' reading
    assert(sum.getLong(2) > 250000000L)
    assert(sum.getLong(4) >= 2L) // hot buckets on both sides
    assert(sum.getLong(0) == 60L && sum.getLong(1) == 60L)
  }

  test("summary totals are the exact integer sums of the table") {
    val df = Seq(("a b c d", true), ("a b x y z", false), ("c c d", true))
      .toDF("text", "r")
    val per = Drift.tokenBucketDrift(df, col("text"), col("r"), 16)
    val rows = per.collect()
    val sum = Drift.driftSummary(per, hotPsiE9 = 0L).head()
    assert(sum.getLong(2) == rows.map(_.getLong(3)).sum)
    assert(sum.getLong(3) == rows.map(_.getLong(4)).sum)
    assert(sum.getLong(4) == rows.count(_.getLong(3) > 0L).toLong)
  }

  test("scoreDrift: identical score distributions drift by zero; " +
      "shifted ones do not") {
    val same = (0L until 60L).flatMap(i =>
      Seq((i % 20L, true), (i % 20L, false)))
    val g0 = Drift.scoreDrift(same.toDF("s", "r"), col("s"), col("r"), 8)
      .collect()
    assert(g0.length == 8)
    assert(g0.forall(r => r.getLong(4) == 0L && r.getLong(5) == 0L))
    // candidate scores shifted up by half the range
    val shifted = (0L until 60L).map(i => (i % 20L, true)) ++
      (0L until 60L).map(i => (i % 20L + 10L, false))
    val g1 = Drift.scoreDrift(shifted.toDF("s", "r"), col("s"),
      col("r"), 8)
    val tot = g1.agg(sum("psi_e9")).head().getLong(0)
    assert(tot > 250000000L) // far past the 0.25 'shifted' reading
    // counts partition both slices exactly
    val rows = g1.collect()
    assert(rows.map(_.getLong(2)).sum == 60L)
    assert(rows.map(_.getLong(3)).sum == 60L)
  }

  test("embeddingDrift: same cloud is flat; disjoint clusters drift") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(5)
    def vec(center: Double) =
      Array.fill(8)((center + rnd.nextGaussian() * 0.1).toFloat)
    // same cloud in both slices (pairwise-identical vectors)
    val same = Seq.fill(40)(vec(1.0)).flatMap(v =>
      Seq((v, true), (v, false))).toDF("embedding", "r")
      .select(Similarity.quantize(col("embedding")).as("vec"), col("r"))
    val g0 = Drift.embeddingDrift(same, col("vec"), col("r"),
      planes = 6, dims = 8)
    assert(g0.agg(sum("psi_e9")).head().getLong(0) == 0L)
    assert(g0.count() == 64L)
    // opposite clusters: sign patterns differ on most planes
    val split = (Seq.fill(40)((vec(1.0), true)) ++
      Seq.fill(40)((vec(-1.0), false))).toDF("embedding", "r")
      .select(Similarity.quantize(col("embedding")).as("vec"), col("r"))
    val tot = Drift.embeddingDrift(split, col("vec"), col("r"),
      planes = 6, dims = 8)
      .agg(sum("psi_e9")).head().getLong(0)
    assert(tot > 250000000L)
  }

  test("an empty slice is rejected") {
    intercept[IllegalArgumentException] {
      Drift.tokenBucketDrift(Seq(("a", true)).toDF("text", "r"),
        col("text"), col("r"), 8)
    }
  }
}
