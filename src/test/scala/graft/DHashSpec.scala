package graft

import graft.ops.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._

/** Perceptual dHash: the invariances the operator exists for —
  * uniform brightness shifts and lossless re-encodes collapse, a
  * gradient flip separates, corrupt payloads route.
  */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(rows: Seq[(Long, Array[Byte])]) =
    Multimodal.imageDHash(rows.toDS()).collect()
      .map(r => r.doc_id -> ((r.status, r.hash_hi, r.hash_lo))).toMap

  // a horizontal ramp: gray strictly increases left-to-right
  private def ramp(off: Int): Array[Byte] =
    ImageCodec.encodePng(20, 10, (x, y) =>
      ((10 * x + off) << 16) | ((10 * x + off) << 8) | (10 * x + off))

  test("uniform brightness shift and different dimensions of the " +
      "same gradient hash identically; a flipped gradient differs") {
    val flipped = ImageCodec.encodePng(20, 10, (x, y) => {
      val v = 10 * (19 - x)
      (v << 16) | (v << 8) | v
    })
    val small = ImageCodec.encodePng(9, 8, (x, y) =>
      ((20 * x) << 16) | ((20 * x) << 8) | (20 * x))
    val h = hashOf(Seq((1L, ramp(0)), (2L, ramp(30)), (3L, flipped),
      (4L, small)))
    assert(h(1L) == h(2L), "a uniform +30 must not move the hash")
    assert(h(1L)._1 == "ok" && h(1L) != h(3L),
      "reversing the gradient must flip every bit")
    // same monotone ramp at other dims: the 9x8 grid normalizes it
    assert(h(4L) == h(1L),
      "a monotone ramp hashes the same at any resolution")
    // a strictly increasing row sets all 64 bits; the flipped ramp
    // clears them all
    assert(h(1L) == (("ok", 0xffffffffL, 0xffffffffL)), s"got ${h(1L)}")
    assert(h(3L) == (("ok", 0L, 0L)), s"got ${h(3L)}")
  }

  test("multi-probe banding catches EVERY pair at Hamming <= 7; " +
      "8x8-band exact pairs agree (r15 verdict)") {
    // adversarial spread: d bits flipped one per band round-robin —
    // the worst case for band blocking (exact 4x16 matching loses
    // every pair at d >= 4 here; radius-1 probing must keep d <= 7)
    def spread(d: Int): (Long, Long) = {
      var hi = 0xf0f0f0f0L; var lo = 0x12345678L
      (0 until d).foreach { k =>
        val band = k % 4; val bit = band * 16 + (k / 4)
        if (bit < 32) lo ^= 1L << bit else hi ^= 1L << (bit - 32)
      }
      (hi, lo)
    }
    val rows = (0 to 9).map { d =>
      val (hi, lo) = spread(d); (d.toLong, hi, lo)
    }
    val hs = rows.toDF("id", "hash_hi", "hash_lo")
    val cand = Multimodal.dhashBandProbeCandidates(hs)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc d is at Hamming d from doc 0 (and |a-b| pairwise): every
    // pair with |a-b| <= 7 must be a candidate — the pigeonhole
    val must = for {
      a <- 0L to 9L; b <- 0L to 9L
      if a < b && b - a <= 7L
    } yield (a, b)
    must.foreach(p => assert(cand.contains(p), s"missed $p"))
    // the exact-truth generator returns precisely the <= 6 pairs
    // with correct distances
    val exact = Multimodal.dhashExactPairs(hs, maxDist = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(exact.keySet ==
      (for { a <- 0L to 9L; b <- 0L to 9L; if a < b && b - a <= 6L }
        yield (a, b)).toSet)
    exact.foreach { case ((a, b), h) => assert(h == b - a) }
    intercept[IllegalArgumentException] {
      Multimodal.dhashExactPairs(hs, maxDist = 8)
    }
  }

  test("corrupt payloads route to (-1, -1), never throw") {
    val h = hashOf(Seq((1L, Array[Byte](1, 2, 3)),
      (2L, Array.emptyByteArray)))
    assert(h(1L) == (("corrupt", -1L, -1L)))
    assert(h(2L) == (("corrupt", -1L, -1L)))
  }

  test("audio fingerprint: uniform gain collapses, a reshaped " +
      "envelope separates, corrupt routes") {
    def wav(k: Int, reshape: Boolean): Array[Byte] = {
      val samples = Array.tabulate[Short](100) { i =>
        val base =
          if (reshape) (2000 - 20 * i) // decaying envelope
          else (20 * i) // rising envelope
        (base * k).toShort
      }
      graft.ops.AudioCodec.encodeWav(8000L, samples)
    }
    val out = Multimodal.audioFingerprint(Seq(
      (1L, wav(1, reshape = false)),
      (2L, wav(8, reshape = false)), // gain x8: same contour
      (3L, wav(1, reshape = true)), // different envelope
      (4L, Array[Byte](9, 9, 9))).toDS())
      .collect().map(r => r.doc_id -> ((r.status, r.fp))).toMap
    assert(out(1L) == out(2L), "a uniform gain must not move the fp")
    assert(out(1L)._1 == "ok" && out(1L) != out(3L),
      "a reshaped energy envelope must move the fp")
    // strictly rising |samples| → strictly rising frame energies →
    // all 32 contour bits set
    assert(out(1L) == (("ok", 0xffffffffL)), s"got ${out(1L)}")
    assert(out(3L) == (("ok", 0L)), s"got ${out(3L)}")
    assert(out(4L) == (("corrupt", -1L)))
  }
}
