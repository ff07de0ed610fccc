package graft

import graft.functions.MgBuffer
import graft.ops.Sketch
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: the buffer invariant, the distributed
  * two-pass exactness guarantee, and the loud refusal when the
  * guarantee cannot be proven.
  */
class MgHeavySpec extends SparkSpec {
  import spark.implicits._

  test("MgBuffer invariant: residual <= true <= residual + err") {
    val rnd = new scala.util.Random(31)
    val b = new MgBuffer(8)
    val truth = scala.collection.mutable.HashMap.empty[String, Long]
    (1 to 5000).foreach { _ =>
      // zipf-ish: low ids arrive much more often
      val k = s"k${(math.sqrt(rnd.nextInt(900)).toInt)}"
      truth.update(k, truth.getOrElse(k, 0L) + 1L)
      b.add(k, 1L)
    }
    truth.foreach { case (k, t) =>
      val res = b.m.getOrElse(k, 0L)
      assert(res <= t && t <= res + b.err, s"key=$k res=$res t=$t")
    }
    assert(b.m.size <= 8)
  }

  test("merge + shrink keeps the invariant across buffers") {
    val rnd = new scala.util.Random(37)
    val bufs = Seq.fill(6)(new MgBuffer(8))
    val truth = scala.collection.mutable.HashMap.empty[String, Long]
    (1 to 6000).foreach { i =>
      val k = s"k${(math.sqrt(rnd.nextInt(400)).toInt)}"
      truth.update(k, truth.getOrElse(k, 0L) + 1L)
      bufs(i % 6).add(k, 1L)
    }
    val merged = bufs.reduce { (a, b) =>
      b.m.foreach { case (k, c) => a.m.update(k, a.m.getOrElse(k, 0L) + c) }
      a.err += b.err; a.shrink(); a
    }
    truth.foreach { case (k, t) =>
      val res = merged.m.getOrElse(k, 0L)
      assert(res <= t && t <= res + merged.err, s"key=$k")
    }
  }

  test("heavyHittersExact equals the brute top-k on skewed data, " +
      "across many partitions") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 20000).map { _ =>
      s"w${(math.sqrt(rnd.nextInt(10000)).toInt)}"
    }
    val brute = rows.groupBy(identity).map { case (k, g) =>
      (k, g.size.toLong)
    }.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
      .zipWithIndex.map { case ((k, c), i) => (k, c, i + 1L) }
    val got = Sketch.heavyHittersExact(
      rows.toDF("w").repartition(13), col("w"), k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._3)
    assert(got == brute)
  }

  test("a complete census (no eviction) serves any k without the bar") {
    val rows = Seq.fill(50)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val got = Sketch.heavyHittersExact(rows.toDF("w"), col("w"),
      k = 10, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 50L), ("b", 3L), ("c", 1L)))
  }

  test("adversarially flat data fails loudly instead of guessing") {
    // 5000 distinct singletons, capacity 8: nothing is provably hot
    val rows = (1 to 5000).map(i => s"u$i")
    val e = intercept[IllegalArgumentException] {
      Sketch.heavyHittersExact(rows.toDF("w"), col("w"), k = 3,
        capacity = 8)
    }
    assert(e.getMessage.contains("capacity"))
  }
}
