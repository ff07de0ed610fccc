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
}
