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

  test("appendPq encodes against the stored codebook; drift is pinned") {
    val dir = java.nio.file.Files.createTempDirectory("pqapp").toString
    val v = vecs()
    val old = v.filter(col("id") < 16 || col("id") === 100L)
    val fresh = v.filter(col("id") >= 16 && col("id") < 32)
    graft.ops.AnnIndex.buildPq(old, dir, M, Dims, K, 2)
    val cbBefore = spark.read.parquet(s"$dir/pq/codebook")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    graft.ops.AnnIndex.appendPq(spark, dir, fresh, 1L, M, Dims)
    // codebook drift contract: an append NEVER moves a centroid
    val cbAfter = spark.read.parquet(s"$dir/pq/codebook")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(cbAfter == cbBefore)
    // appended codes are exactly pqEncode against that codebook
    val local = spark.createDataFrame(
      java.util.Arrays.asList(cbBefore.map(s =>
        org.apache.spark.sql.Row.fromSeq(s)): _*),
      spark.read.parquet(s"$dir/pq/codebook").schema)
    val expect = Similarity.pqEncode(fresh, local, M, Dims)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val got = spark.read.option("basePath", s"$dir/pq/codes")
      .parquet(s"$dir/pq/codes").filter(col("batch") === 1L)
      .select("id", "sub", "code")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(got == expect)
    // idempotent: replaying the batch leaves the same code count
    val n1 = spark.read.parquet(s"$dir/pq/codes").count()
    graft.ops.AnnIndex.appendPq(spark, dir, fresh, 1L, M, Dims)
    assert(spark.read.parquet(s"$dir/pq/codes").count() == n1)
    // the probe serves build + append combined
    val probed = graft.ops.AnnIndex.probePq(spark, dir,
      v.filter(col("id") === 0L), M, Dims, 40)
    assert(probed.filter(col("c_id") >= 16L && col("c_id") < 32L)
      .count() > 0L, "appended vectors must be probe-visible")
  }

  test("ADC shortlist + exact re-rank converges to brute force") {
    val v = vecs()
    val (codebook, codes) = Similarity.pqTrainEncode(v, M, Dims, K, 2)
    val qs = v.filter(col("id") < 4)
    // shortlist = whole corpus ⇒ the re-rank IS brute force
    val refined = Similarity.pqAdcRefineTopK(qs, codebook, codes, v,
        M, Dims, 5, shortlist = 33)
      .select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val brute = Similarity.knnBrute(qs, v, 5)
      .select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(refined == brute)
    // and a NARROW shortlist recalls at least as much truth as raw ADC
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("q_id", "c_id").join(
        Similarity.knnBrute(qs, v, 5).select("q_id", "c_id"),
        Seq("q_id", "c_id")).count()
    val raw = Similarity.pqAdcTopK(qs, codebook, codes, M, Dims, 5)
    val narrow = Similarity.pqAdcRefineTopK(qs, codebook, codes, v,
      M, Dims, 5, shortlist = 10)
    assert(hits(narrow) >= hits(raw))
    codes.unpersist()
  }
}
