package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Product quantization: code-shape invariants and the exact
  * nearest-duplicate property (a vector's duplicate shares all its
  * codes, so its ADC distance ties the minimum).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4
  private val Dims = 16
  private val K = 4

  /** 32 vectors in 4 well-separated blocks, plus an exact duplicate
    * of vector 0 at id 100.
    */
  private def vecs() = {
    val rows = (0 until 32).map { i =>
      val c = i % 4
      val v = Array.tabulate(Dims)(dim =>
        if (dim / 4 == c) 1000L + (i * 13 % 40) else (i * 7 % 10).toLong)
      (i.toLong, v)
    }
    val dup = Seq((100L, rows.head._2))
    (rows ++ dup).toDF("id", "vec")
  }

  test("codes: exactly m codes per vector, all within [0, k)") {
    val (codebook, codes) = Similarity.pqTrainEncode(vecs(), M, Dims, K, 2)
    val perVec = codes.groupBy("id").agg(count(lit(1)).as("n"),
      countDistinct("sub").as("nsub"))
    assert(perVec.filter(col("n") =!= M || col("nsub") =!= M).count() == 0)
    assert(codes.filter(col("code") < 0 || col("code") >= K).count() == 0)
    assert(codebook.groupBy("sub").count().collect()
      .forall(r => r.getLong(1) <= K))
  }

  test("an exact duplicate ties at the ADC minimum distance") {
    val v = vecs()
    val (codebook, codes) = Similarity.pqTrainEncode(v, M, Dims, K, 2)
    // id 100 duplicates id 0: identical sub-vectors → identical codes
    val c0 = codes.filter(col("id") === 0L)
      .select("sub", "code").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cDup = codes.filter(col("id") === 100L)
      .select("sub", "code").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(c0 == cDup)
    // ADC sees only codes, so every vector sharing all the query's
    // codes ties at the minimum distance — the duplicate must be in
    // that tie group: its adist equals the rank-1 adist
    val all = Similarity.pqAdcTopK(v.filter(col("id") === 0L), codebook,
        codes, M, Dims, 33)
      .select("c_id", "rank", "adist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val best = all.filter(_._2 == 1).head._3
    val dup = all.filter(_._1 == 100L).head
    assert(dup._3 == best,
      s"duplicate adist ${dup._3} != rank-1 adist $best")
  }

  test("probe-from-stored PQ equals train-then-probe") {
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val v = vecs()
    val (codebook, codes) = Similarity.pqTrainEncode(v, M, Dims, K, 2)
    val mem = Similarity.pqAdcTopK(v.filter(col("id") < 4), codebook,
        codes, M, Dims, 5)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    graft.ops.AnnIndex.buildPq(v, dir, M, Dims, K, 2)
    val stored = graft.ops.AnnIndex.probePq(spark, dir,
        v.filter(col("id") < 4), M, Dims, 5)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(stored.toSeq == mem.toSeq)
  }
}
