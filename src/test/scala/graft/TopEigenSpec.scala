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
}
