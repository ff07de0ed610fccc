package graft

import graft.ops.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** The persisted IVF index: probe-from-stored must equal
  * train-then-probe, and a probe must READ only the probed cells'
  * partitions (partition pruning is what makes the stored form an
  * index rather than a cache).
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("annidx").toString

  /** 40 deterministic 8-dim vectors in 4 well-separated clusters. */
  private def vecs() = {
    val rows = (0 until 40).map { i =>
      val c = i % 4
      val base = Array.tabulate(8)(dim =>
        if (dim == 2 * c || dim == 2 * c + 1) 1000L else 0L)
      // per-vector jitter, deterministic in i
      base(i % 8) += (i * 37 % 50).toLong
      (i.toLong, base, (i % 8).toLong)
    }
    rows.toDF("id", "vec", "cell")
  }

  test("probe-from-stored equals train-then-probe (nprobe 1 and 2)") {
    val dir = tmp()
    val v = vecs()
    val nCells = AnnIndex.build(v, dir, iters = 2)
    assert(nCells > 0)
    // the in-memory twin: same Lloyd rounds, then the same closing
    // codebook-consistent assign round build() performs
    val trained = Similarity.kmeans(v, 2)
    val cents = Similarity.ivfCentroids(trained, "cell")
    val local = spark.createDataFrame(
      java.util.Arrays.asList(cents.collect(): _*), cents.schema)
    val assigned = Similarity.ivfAssign(trained, local)
    trained.unpersist()
    val queries = v.filter(col("id") < 6).select("id", "vec")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "rank", "sim")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2), r.getDouble(3))).toSet
    for (np <- Seq(1, 2)) {
      val mem = Similarity.knnIvf(
        Similarity.ivfProbe(queries, local, np), assigned, k = 3)
      val stored = AnnIndex.probeKnn(spark, dir, queries, k = 3, nprobe = np)
      assert(rows(stored) == rows(mem), s"nprobe=$np diverged")
    }
  }

  test("append assigns against the stored codebook, idempotently") {
    val dir = tmp()
    val v = vecs()
    // build on three quarters, append the rest without retraining
    val base = v.filter(col("id") % 4 =!= 3)
    val extra = v.filter(col("id") % 4 === 3).select("id", "vec")
    AnnIndex.build(base, dir, iters = 2)
    AnnIndex.append(spark, dir, extra, batch = 1L)
    // replayed batch must overwrite its own (cell, batch) leaves
    AnnIndex.append(spark, dir, extra, batch = 1L)
    val stored = AnnIndex.assignments(spark, dir)
    assert(stored.count() == 40L, "replay must not duplicate rows")
    assert(stored.groupBy("id").count().filter(col("count") > 1).count() == 0L)
    // every stored assignment (built AND appended) is the argmin over
    // the stored codebook
    val cents = AnnIndex.centroids(spark, dir)
    val local = spark.createDataFrame(
      java.util.Arrays.asList(cents.collect(): _*), cents.schema)
    val expect = Similarity.ivfAssign(v.select("id", "vec"), local)
      .select("id", "cell").as[(Long, Long)].collect().toSet
    val got = stored.select("id", "cell").as[(Long, Long)].collect().toSet
    assert(got == expect)
    // appended vectors are findable: probe a copy of an appended vec
    val q = extra.limit(1)
    val hit = AnnIndex.probeKnn(spark, dir, q, k = 3)
      .select("c_id").as[Long].collect()
    assert(hit.nonEmpty)
  }

  test("probe prunes to the probed cells' partitions") {
    val dir = tmp()
    AnnIndex.build(vecs(), dir, iters = 2)
    val allCells = AnnIndex.assignments(spark, dir)
      .select("cell").distinct().as[Long].collect().toSet
    assert(allCells.size >= 3, "fixture must spread over several cells")
    val probed = allCells.head
    val pruned = AnnIndex.assignments(spark, dir, Some(Seq(probed)))
    // the IN list must reach the scan's PartitionFilters (not a
    // post-scan Filter) ...
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"cell filter must be a partition filter:\n$plan")
    // ... and at runtime the scan reads strictly fewer files than the
    // full index (inputFiles won't do: it lists the relation pre-
    // pruning; the scan node's numFiles metric counts what was read)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    }
    val prunedFiles = filesRead(pruned)
    val allFiles = filesRead(AnnIndex.assignments(spark, dir))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned scan read $prunedFiles of $allFiles files — no pruning")
  }
}
