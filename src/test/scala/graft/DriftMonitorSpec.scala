package graft

import graft.ops.Drift
import graft.streaming.DriftMonitor
import org.apache.spark.sql.functions._

/** DriftMonitor: the streaming drift gate agrees with the batch
  * operator by construction, verdicts are idempotent under replay,
  * and hot buckets are reported in numeric order.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("driftmon").toString

  private val refTexts = Seq("alpha beta gamma delta", "beta gamma zeta",
    "alpha alpha beta")

  test("a batch drawn from the reference itself scores zero drift") {
    val dir = tmp()
    val mon = new DriftMonitor(spark, dir, buckets = 32, hotPsiE9 = 0L)
    mon.setReference(refTexts.toDF("text"), col("text"))
    mon.applyBatch(refTexts.toDF("text"), col("text"), 0L)
    val v = mon.readVerdicts(0L).head()
    // identical counts → p_ref == p_cand everywhere → exact zero
    assert(v.getLong(2) == 0L && v.getLong(3) == 0L)
    assert(v.getLong(4) == 0L && v.getString(5) == "")
  }

  test("a shifted batch drifts hard and lists hot buckets in order") {
    val dir = tmp()
    val mon = new DriftMonitor(spark, dir, buckets = 64,
      hotPsiE9 = 1000000L)
    mon.setReference(refTexts.toDF("text"), col("text"))
    mon.applyBatch(Seq.fill(10)("zebra zorilla zebu quokka")
      .toDF("text"), col("text"), 3L)
    val v = mon.readVerdicts(3L).head()
    assert(v.getLong(2) > 250000000L) // PSI >> the 0.25 'shifted' bar
    val hot = v.getString(5)
    assert(v.getLong(4) >= 2L && hot.nonEmpty)
    val ids = hot.split(",").map(_.toLong)
    assert(ids.length == v.getLong(4))
    assert(ids.sameElements(ids.sorted))
  }

  test("the monitor verdict equals the batch operator's summary") {
    val dir = tmp()
    val cand = Seq("alpha beta epsilon", "omega omega beta")
    val mon = new DriftMonitor(spark, dir, buckets = 32,
      hotPsiE9 = 100000L)
    mon.setReference(refTexts.toDF("text"), col("text"))
    mon.applyBatch(cand.toDF("text"), col("text"), 0L)
    val got = mon.readVerdicts(0L).head()
    val want = Drift.driftSummary(
      Drift.tokenBucketDrift(
        (refTexts.map((_, true)) ++ cand.map((_, false))).toDF("text", "r"),
        col("text"), col("r"), 32),
      hotPsiE9 = 100000L).head()
    // (n_cand, psi, kl, n_hot) — identical pricing path
    assert(got.getLong(1) == want.getLong(1))
    assert(got.getLong(2) == want.getLong(2))
    assert(got.getLong(3) == want.getLong(3))
    assert(got.getLong(4) == want.getLong(4))
  }

  test("replaying a completed batch id is a no-op") {
    val dir = tmp()
    val mon = new DriftMonitor(spark, dir, buckets = 16, hotPsiE9 = 0L)
    mon.setReference(refTexts.toDF("text"), col("text"))
    mon.applyBatch(Seq("alpha beta").toDF("text"), col("text"), 0L)
    val before = mon.readVerdicts(0L).collect()
    // a DIFFERENT frame under the same id must not overwrite
    mon.applyBatch(Seq("totally different words").toDF("text"),
      col("text"), 0L)
    val after = mon.readVerdicts(0L).collect()
    assert(before.length == 1 && after.length == 1)
    assert(before.head == after.head)
  }

  test("applyBatch before setReference is rejected") {
    val dir = tmp()
    val mon = new DriftMonitor(spark, dir, buckets = 16, hotPsiE9 = 0L)
    intercept[Exception] {
      mon.applyBatch(Seq("a").toDF("text"), col("text"), 0L)
    }
  }

  test("a partial verdict directory (no _SUCCESS) is retried, not " +
      "skipped") {
    val dir = tmp()
    val mon = new DriftMonitor(spark, dir, buckets = 16, hotPsiE9 = 0L)
    mon.setReference(refTexts.toDF("text"), col("text"))
    // simulate a crash mid-write: a verdict dir with data but no
    // commit marker
    val stale = java.nio.file.Paths.get(dir, "verdicts", "batch=0")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(stale.resolve("part-junk.parquet"),
      "not parquet")
    mon.applyBatch(Seq("alpha beta").toDF("text"), col("text"), 0L)
    val v = mon.readVerdicts(0L).collect()
    assert(v.length == 1 && v.head.getLong(1) == 2L)
  }

  test("score modality: monitor verdict equals scoreDrift's summary " +
      "when the reference spans the combined range") {
    val dir = tmp()
    // reference spans [0, 100]; candidate stays inside, so the
    // monitor's reference-pinned bands equal the batch operator's
    // combined-range bands
    val ref = (0L to 100L).map(s => s)
    val cand = Seq(10L, 11L, 11L, 90L, 95L, 95L, 95L)
    val mon = new DriftMonitor(spark, dir, buckets = 16,
      hotPsiE9 = 100000L)
    mon.setScoreReference(ref.toDF("s"), col("s"))
    mon.applyScoreBatch(cand.toDF("s"), col("s"), 0L)
    val got = mon.readVerdicts(0L).head()
    val want = Drift.driftSummary(
      Drift.scoreDrift(
        (ref.map((_, true)) ++ cand.map((_, false))).toDF("s", "r"),
        col("s"), col("r"), 16),
      hotPsiE9 = 100000L).head()
    assert(got.getLong(1) == want.getLong(1))
    assert(got.getLong(2) == want.getLong(2))
    assert(got.getLong(3) == want.getLong(3))
    assert(got.getLong(4) == want.getLong(4))
  }

  test("score modality: batch scores outside the pinned range clamp " +
      "into the edge bands instead of failing") {
    val dir = tmp()
    val mon = new DriftMonitor(spark, dir, buckets = 8, hotPsiE9 = 0L)
    mon.setScoreReference((0L to 79L).toDF("s"), col("s"))
    mon.applyScoreBatch(Seq(-1000L, 5000L).toDF("s"), col("s"), 0L)
    assert(mon.readVerdicts(0L).head().getLong(1) == 2L)
  }

  test("embedding modality: monitor verdict equals embeddingDrift's " +
      "summary") {
    import graft.ops.Similarity
    val dir = tmp()
    val rnd = new scala.util.Random(11)
    def vec(center: Double) =
      Array.fill(8)((center + rnd.nextGaussian() * 0.3).toFloat)
    val ref = Seq.fill(50)(vec(1.0))
    val cand = Seq.fill(20)(vec(-1.0)) ++ Seq.fill(10)(vec(1.0))
    def q(rows: Seq[Array[Float]]) = rows.toDF("embedding")
      .select(Similarity.quantize(col("embedding")).as("vec"))
    val mon = new DriftMonitor(spark, dir, buckets = 64,
      hotPsiE9 = 100000L)
    mon.setEmbeddingReference(q(ref), col("vec"), planes = 6, dims = 8)
    mon.applyEmbeddingBatch(q(cand), col("vec"), planes = 6, dims = 8,
      batchId = 0L)
    val got = mon.readVerdicts(0L).head()
    val want = Drift.driftSummary(
      Drift.embeddingDrift(
        (ref.map((_, true)) ++ cand.map((_, false)))
          .toDF("embedding", "r")
          .select(Similarity.quantize(col("embedding")).as("vec"),
            col("r")),
        col("vec"), col("r"), planes = 6, dims = 8),
      hotPsiE9 = 100000L).head()
    assert(got.getLong(1) == want.getLong(1))
    assert(got.getLong(2) == want.getLong(2))
    assert(got.getLong(3) == want.getLong(3))
    assert(got.getLong(4) == want.getLong(4))
  }

  test("embedding modality rejects a bucket count that is not " +
      "2^planes") {
    val mon = new DriftMonitor(spark, tmp(), buckets = 60)
    intercept[IllegalArgumentException] {
      mon.setEmbeddingReference(Seq(Array(1L)).toDF("vec"), col("vec"),
        planes = 6, dims = 8)
    }
  }
}
