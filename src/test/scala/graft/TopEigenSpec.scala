package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Power-iteration top principal direction: exact Rayleigh values on
  * a clean axis fixture, convergence onto a dominant direction, sign
  * invariance, and the loud all-zero refusal.
  */
class TopEigenSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[Seq[Float]], iters: Int = 3) =
    Similarity.topEigen(
      vecs.map(Tuple1(_)).toDF("embedding"), col("embedding"),
      vecs.head.length, iters)
      .orderBy("dim").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))

  test("pure single-axis data: exact eigenvector, eigenvalue, share") {
    val out = run(Seq.fill(10)(Seq(0f, 1f, 0f, 0f)), iters = 2)
    assert(out.map(_._1).toSeq == Seq(0L, 1000000L, 0L, 0L))
    // λ = Σ x₂² = 10 exactly, all of the total second moment
    assert(out.head._2 == 10000000L)
    assert(out.head._3 == 1000000L)
  }

  test("dominant axis wins over a weaker orthogonal one") {
    val vecs = Seq.fill(10)(Seq(0f, 1f, 0f, 0f)) ++
      Seq.fill(2)(Seq(0.5f, 0f, 0f, 0f))
    val out = run(vecs)
    val v = out.map(_._1)
    assert(v(1) == 1000000L, s"dominant dim must peg the scale: $v")
    assert(math.abs(v(0)) < 5000L && v(2) == 0L && v(3) == 0L,
      s"weak axis must decay across rounds: $v")
    // λ ≈ 10 against a trace of 10.5 → share just under 1
    assert(out.head._2 > 9900000L && out.head._2 <= 10000000L)
    assert(out.head._3 > 940000L && out.head._3 < 1000000L)
  }

  test("sign flips of inputs do not move C = Σ x·xᵀ") {
    val a = run(Seq(Seq(1f, 2f, 0f), Seq(1f, 2f, 0f), Seq(0f, 0f, 1f)))
    val b = run(Seq(Seq(-1f, -2f, 0f), Seq(1f, 2f, 0f), Seq(0f, 0f, -1f)))
    assert(a.toSeq == b.toSeq)
  }

  test("second direction: deflation finds the runner-up axis, " +
      "orthogonal to v1") {
    val vecs = Seq.fill(10)(Seq(0f, 1f, 0f, 0f)) ++
      Seq.fill(6)(Seq(0f, 0f, 1f, 0f)) ++
      Seq.fill(1)(Seq(0.2f, 0f, 0f, 0f))
    // 6 rounds: v1's runner-up residue decays as (6/10)^t, and λ2's
    // Rayleigh inherits exactly that residue mixed back through the
    // deflation — (0.6)^3 ≈ 22% leaves λ2 at 6.18, (0.6)^6 ≈ 5%
    // brings it to 6.01
    val df = vecs.map(Tuple1(_)).toDF("embedding")
    val v1 = Similarity.topEigen(df, col("embedding"), 4, 6)
      .orderBy("dim").collect().map(_.getLong(1))
    assert(v1(1) == 1000000L, s"v1 must peg the dominant axis: ${v1.toSeq}")
    val out2 = Similarity.secondEigen(df, col("embedding"), v1, 4, 6)
      .orderBy("dim").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val v2 = out2.map(_._1)
    assert(v2(2) == 1000000L, s"v2 must peg the runner-up: ${v2.toSeq}")
    // orthogonality within integer rounding: |v1·v2| tiny vs 1e12
    val dot = v1.zip(v2).map { case (a, b) =>
      BigInt(a) * BigInt(b) }.sum.abs
    assert(dot < BigInt("10000000000"), s"v1·v2 = $dot")
    // λ2 ≈ 6 (plus the residue) < λ1 ≈ 10
    assert(out2.head._2 > 5900000L && out2.head._2 <= 6100000L,
      s"lambda2 = ${out2.head._2}")
  }

  test("secondEigen guards: dims mismatch and zero v1") {
    val df = Seq(Tuple1(Seq(1f, 0f))).toDF("embedding")
    intercept[IllegalArgumentException] {
      Similarity.secondEigen(df, col("embedding"), Array(1000000L), 2, 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.secondEigen(df, col("embedding"), Array(0L, 0L), 2, 2)
    }
  }

  test("all-zero vectors refuse loudly") {
    val ex = intercept[IllegalArgumentException] {
      run(Seq(Seq(0f, 0f), Seq(0f, 0f)))
    }
    assert(ex.getMessage.contains("vanished"))
  }

  test("guards: bad dims and iters") {
    intercept[IllegalArgumentException] {
      Similarity.topEigen(Seq(Tuple1(Seq(1f))).toDF("embedding"),
        col("embedding"), 0, 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.topEigen(Seq(Tuple1(Seq(1f))).toDF("embedding"),
        col("embedding"), 1, 0)
    }
  }

  test("topEigenK(k=2) replays topEigen + secondEigen bit-for-bit, " +
      "and k=3 finds the third axis") {
    val vecs = Seq.fill(10)(Seq(0f, 1f, 0f, 0f)) ++
      Seq.fill(6)(Seq(0f, 0f, 1f, 0f)) ++
      Seq.fill(3)(Seq(1f, 0f, 0f, 0f))
    val df = vecs.map(Tuple1(_)).toDF("embedding")
    val v1 = Similarity.topEigen(df, col("embedding"), 4, 6)
      .orderBy("dim").collect().map(_.getLong(1))
    val v2 = Similarity.secondEigen(df, col("embedding"), v1, 4, 6)
      .orderBy("dim").collect().map(_.getLong(1))
    val k3 = Similarity.topEigenK(df, col("embedding"), 4, 6, 3)
      .orderBy("comp", "dim").collect()
      .groupBy(_.getLong(0))
      .map { case (c, rows) => c -> rows.map(_.getLong(2)) }
    assert(k3(1L).toSeq == v1.toSeq, "component 1 must equal topEigen")
    assert(k3(2L).toSeq == v2.toSeq, "component 2 must equal secondEigen")
    assert(k3(3L)(0) == 1000000L,
      s"component 3 must peg the third axis: ${k3(3L).toSeq}")
  }

  test("pcaGridCandidates probes exactly the 3x3 neighborhood and " +
      "knnPcaGrid re-ranks by exact full-dim cosine") {
    // handcrafted projections on a grid of 10: the query at (0, 0)
    // must see cells g in {-1,0,1}² — ids 1..5 in range, 6..7 out
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0L, 0L), // the query
      (1L, Seq(1f, 0f, 0f, 0f), 9L, 9L), // cell (0,0)
      (2L, Seq(0f, 1f, 0f, 0f), -10L, 0L), // cell (-1,0)
      (3L, Seq(1f, 1f, 0f, 0f), 19L, -1L), // cell (1,-1)
      (4L, Seq(0f, 0f, 1f, 0f), 0L, 15L), // cell (0,1)
      (5L, Seq(1f, 0f, 1f, 0f), -5L, -5L), // cell (0,0): trunc div
      (6L, Seq(1f, 0f, 0f, 0f), 20L, 0L), // cell (2,0) — OUT
      (7L, Seq(1f, 0f, 0f, 0f), 0L, -20L)) // cell (0,-2) — OUT
    val base = rows.toDF("id", "emb", "c1_e6", "c2_e6")
      .withColumn("vec", Similarity.quantize(col("emb")))
    val q = base.filter(col("id") === 0L)
    val cand = Similarity.pcaGridCandidates(q, base, 10L)
      .collect().map(_.getLong(1)).sorted
    assert(cand.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      s"3x3 probe must admit exactly ids 1..5: ${cand.toSeq}")
    val top = Similarity.knnPcaGrid(q, base, 10L, 3)
      .orderBy("rank").collect().map(_.getLong(1))
    // exact cosine rank within the candidate set: 1 (cos 1.0), then
    // 3 and 5 (cos ~0.707) tie-broken by id — id 6 (cos 1.0) must
    // NOT appear: it is outside the probed neighborhood
    assert(top.toSeq == Seq(1L, 3L, 5L), s"got ${top.toSeq}")
  }
}
