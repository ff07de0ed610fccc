package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's per-query canary normalization, replayed on a
  * SYNTHETIC noisy window: a host spike that multiplies one stretch
  * of the run must rescale exactly the queries it slowed, so no
  * unchanged query moves >1.5x normalized — the artifact class
  * BENCH_r12 exposed (run-median normalization let one throttled
  * stretch print fake 9x regressions on unchanged code).
  */
class BenchCanarySpec extends AnyFunSuite {

  private val names = (0 until 40).map(i => f"q$i%02d")
  // true per-query costs, arbitrary but fixed
  private val trueCost = names.zipWithIndex.map { case (n, i) =>
    n -> (0.2 + 0.05 * (i % 7))
  }.toMap

  /** Simulate a run: the host factor is a step function over batches;
    * canary samples sit at batch boundaries and see the factor of the
    * adjacent batches' boundary instant.
    */
  private def simulate(hostFactor: Int => Double)
      : (Map[String, Double], Map[String, Double]) = {
    val nBatches = (names.size + Bench.BatchSize - 1) / Bench.BatchSize
    val baseCanary = 0.3
    // boundary sample b sits between batch b-1 and b; give it the
    // mean of the factors it borders (clamped to the batch range)
    val canaries = (0 to nBatches).map { b =>
      val before = hostFactor(math.max(0, b - 1))
      val after = hostFactor(math.min(nBatches - 1, b))
      baseCanary * (before + after) / 2.0
    }
    val raw = names.zipWithIndex.map { case (n, i) =>
      n -> trueCost(n) * hostFactor(i / Bench.BatchSize)
    }.toMap
    val cq = Bench.perQueryCanary(names, canaries)
    (raw, raw.map { case (n, v) => n -> v / cq(n) })
  }

  test("a 4x spike over two batches leaves normalized rows within 1.5x") {
    val quiet = simulate(_ => 1.0)._2
    // batches 2 and 3 run on a 4x-throttled host
    val noisy = simulate(b => if (b == 2 || b == 3) 4.0 else 1.0)
    val (rawNoisy, normNoisy) = noisy
    // raw rows in the spike DO move ~4x — the artifact the old
    // normalization could not repair
    val spiked = names.slice(16, 32)
    spiked.foreach { n =>
      assert(rawNoisy(n) / (trueCost(n) * 1.0) > 2.0, n)
    }
    // NO unchanged query reads as a regression: normalized rows never
    // move >1.5x (boundary samples half-see the spike, so batches
    // ADJACENT to it can read up to ~1.75x FASTER — the benign
    // direction; a fake slowdown is the artifact class this kills)
    names.foreach { n =>
      val ratio = normNoisy(n) / quiet(n)
      assert(ratio < 1.5, s"$n moved ${ratio}x")
    }
    // and the spiked rows themselves normalize back to ~1x, not 4x
    spiked.foreach { n =>
      val ratio = normNoisy(n) / quiet(n)
      assert(ratio < 1.4 && ratio > 0.7, s"$n normalized to ${ratio}x")
    }
  }

  test("a whole-run 3x throttle divides out entirely") {
    val quiet = simulate(_ => 1.0)._2
    val throttled = simulate(_ => 3.0)._2
    names.foreach { n =>
      assert(math.abs(throttled(n) / quiet(n) - 1.0) < 1e-9, n)
    }
  }

  test("sample-count contract is loud") {
    val e = intercept[IllegalArgumentException] {
      Bench.perQueryCanary(names, Seq(0.3, 0.3))
    }
    assert(e.getMessage.contains("canary samples"))
  }
}
