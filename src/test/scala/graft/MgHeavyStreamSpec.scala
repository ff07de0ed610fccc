package graft

import graft.ops.Sketch
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{MgBucketSummary, MgIn}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** StreamOps.mgHeavyStream — the continuous Misra-Gries census.
  * Pins: (1) the per-bucket summary invariant on streamed state,
  * (2) the exact-confirm result equal to the BATCH heavyHittersExact
  * over the same ingested prefix, (3) checkpointed replay: a restart
  * over the same source neither double-merges nor loses state, and a
  * post-restart batch extends the census incrementally.
  */
class MgHeavyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Buckets = 4
  private val Cap = 8

  /** Skewed key stream: hot keys + a long cold tail that forces
    * evictions at cap 8.
    */
  private def batchRows(seed: Int): Seq[String] = {
    val hot = Seq.fill(60)("hot_a") ++ Seq.fill(40)("hot_b") ++
      Seq.fill(25)("hot_c")
    val cold = (0 until 150).map(i => s"cold_${seed}_$i")
    new scala.util.Random(seed).shuffle(hot ++ cold)
  }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def writeBatch(rows: Seq[String], inDir: String): Unit =
    StreamOps.mgBucketize(rows.toDF("k"), col("k"), Buckets)
      .toDF().coalesce(1).write.mode("append").parquet(inDir)

  private def runStream(inDir: String, ckpt: String,
      outDir: String, cap: Int = Cap): Unit = {
    val in = spark.readStream
      .schema("bucket INT, key STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .as[MgIn]
    val q = StreamOps.mgHeavyStream(in, cap)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[MgBucketSummary], _: Long) =>
        b.toDF().write.mode("append").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  private def snapshot(outDir: String): Seq[(Int, Long, Map[String, Long])] =
    spark.read.parquet(outDir)
      .select("bucket", "ver", "err", "keys", "cnts")
      .collect()
      .groupBy(_.getInt(0)).map { case (b, rows) =>
        val r = rows.maxBy(_.getLong(1))
        (b, r.getLong(2),
          r.getSeq[String](3).zip(r.getSeq[Long](4)).toMap)
      }.toSeq

  test("summary invariant, batch equality, and checkpointed replay") {
    val inDir = tmp("mgh-in"); val ckpt = tmp("mgh-ckpt")
    val outDir = tmp("mgh-out") + "/o"
    val b0 = batchRows(1); val b1 = batchRows(2); val b2 = batchRows(3)
    writeBatch(b0, inDir); writeBatch(b1, inDir); writeBatch(b2, inDir)
    runStream(inDir, ckpt, outDir)

    val ingested = b0 ++ b1 ++ b2
    val corpus = ingested.toDF("k")
    // per-bucket invariant against exact counts: residual <= true <=
    // residual + err, and every key with true > err is present
    val bucketOf = StreamOps.mgBucketize(corpus, col("k"), Buckets)
      .collect().map(r => r.key -> r.bucket).toMap
    val exact = ingested.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val snap = snapshot(outDir)
    assert(snap.map(_._1).toSet.size == snap.size)
    snap.foreach { case (b, err, items) =>
      items.foreach { case (k, res) =>
        val t = exact(k)
        assert(res <= t && t <= res + err, s"bucket=$b key=$k")
      }
      exact.foreach { case (k, t) =>
        if (bucketOf(k) == b && t > err)
          assert(items.contains(k), s"bucket=$b missing provable key $k")
      }
    }

    // exact-confirm over the snapshot == the batch operator
    def sorted(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val fromStream = Sketch.heavyHittersExactFromSummaries(
      corpus, col("k"), spark.read.parquet(outDir), k = 3)
    val fromBatch = Sketch.heavyHittersExact(
      corpus, col("k"), k = 3, capacity = 64)
    assert(sorted(fromStream) == sorted(fromBatch))
    assert(fromStream.count() == 3)

    // replay: restart over the same source + checkpoint — nothing
    // re-merges, the consolidated answer is unchanged
    runStream(inDir, ckpt, outDir)
    val replayed = Sketch.heavyHittersExactFromSummaries(
      corpus, col("k"), spark.read.parquet(outDir), k = 3)
    assert(sorted(replayed) == sorted(fromBatch))

    // incremental: one more batch lands, a restarted stream merges
    // ONLY it, and the census now equals batch-over-extended-prefix
    val b3 = Seq.fill(80)("hot_d") ++ batchRows(4)
    writeBatch(b3, inDir)
    runStream(inDir, ckpt, outDir)
    val ext = (ingested ++ b3).toDF("k")
    val extStream = Sketch.heavyHittersExactFromSummaries(
      ext, col("k"), spark.read.parquet(outDir), k = 4)
    val extBatch = Sketch.heavyHittersExact(
      ext, col("k"), k = 4, capacity = 64)
    assert(sorted(extStream) == sorted(extBatch))
    assert(extStream.filter(col("key") === "hot_d").count() == 1)
  }

  test("cancelled-out summaries refuse loudly") {
    // one bucket, cap 1, perfectly alternating keys: every counter
    // cancels, err > 0, zero candidates — nothing provable
    val inDir = tmp("mgh2-in"); val ckpt = tmp("mgh2-ckpt")
    val outDir = tmp("mgh2-out") + "/o"
    val rows = (0 until 100).map(i => s"k${i % 2}")
    rows.map(k => (0, k)).toDF("bucket", "key")
      .coalesce(1).write.mode("append").parquet(inDir)
    runStream(inDir, ckpt, outDir, cap = 1)
    val snap = spark.read.parquet(outDir)
    val e = intercept[IllegalArgumentException] {
      Sketch.heavyHittersExactFromSummaries(
        rows.toDF("k"), col("k"), snap, k = 1)
    }
    assert(e.getMessage.contains("cancelled out"))
  }
}
