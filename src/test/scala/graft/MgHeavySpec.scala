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

  test("heavyHittersExactBy: each group equals its slice's brute " +
      "top-k") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 12000).map { _ =>
      (s"g${rnd.nextInt(3)}", s"w${(math.sqrt(rnd.nextInt(4000)).toInt)}")
    }
    val brute = rows.groupBy(_._1).flatMap { case (g, slice) =>
      slice.map(_._2).groupBy(identity)
        .map { case (k, xs) => (k, xs.size.toLong) }.toSeq
        .sortBy { case (k, c) => (-c, k) }.take(5)
        .zipWithIndex.map { case ((k, c), i) => (g, k, c, i + 1L) }
    }.toSet
    val got = Sketch.heavyHittersExactBy(
      rows.toDF("g", "w").repartition(9), col("g"), col("w"),
      k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == brute)
  }

  test("heavyHittersExactBy: the group bound and the per-group bar " +
      "fail loudly") {
    val wide = (1 to 300).map(i => (s"g$i", "x"))
    intercept[IllegalArgumentException] {
      Sketch.heavyHittersExactBy(wide.toDF("g", "w"), col("g"),
        col("w"), k = 1, capacity = 4, maxGroups = 100)
    }
    val flat = (1 to 5000).map(i => ("g0", s"u$i"))
    intercept[IllegalArgumentException] {
      Sketch.heavyHittersExactBy(flat.toDF("g", "w"), col("g"),
        col("w"), k = 3, capacity = 8)
    }
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
