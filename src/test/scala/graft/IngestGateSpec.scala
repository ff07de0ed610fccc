package graft

import graft.streaming.IngestGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming near-dup ingest gate driven through a real streaming
  * query: in-batch self-dedup, corpus probe across micro-batches, and
  * idempotent batch replay.
  */
class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("gate").toString

  test("gate: in-batch dup, corpus dup across batches, admission") {
    implicit val sq = spark.sqlContext
    val state = tmp()
    val in = MemoryStream[(Long, String)]
    val gate = new IngestGate(spark, state)
    val q = gate.start(in.toDF().toDF("doc_id", "text"), tmp())
    // batch 0: doc 3 is an exact copy of doc 1 (same batch)
    in.addData((1L, "alpha beta gamma delta epsilon"),
      (2L, "totally different content here"),
      (3L, "alpha beta gamma delta epsilon"))
    q.processAllAvailable()
    // batch 1: doc 4 copies doc 1 (now corpus), doc 5 is fresh
    in.addData((4L, "alpha beta gamma delta epsilon"),
      (5L, "novel fresh unrelated words"))
    q.processAllAvailable()
    q.stop()
    val v = gate.readVerdicts()
      .select("doc_id", "verdict", "dup_of")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(v(1L) == (("admitted", None)))
    assert(v(2L) == (("admitted", None)))
    assert(v(3L) == (("dup_in_batch", Some(1L))))
    assert(v(4L) == (("dup_of_corpus", Some(1L))))
    assert(v(5L) == (("admitted", None)))
    // corpus holds exactly the admitted docs' bands
    val corpusIds = spark.read.parquet(s"$state/corpus")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(corpusIds == Set(1L, 2L, 5L))
    // batch stats observed on the verdicts write itself
    val st = gate.lastStats.get
    assert((st.batchId, st.nAdmitted, st.nDupInBatch, st.nDupCorpus) ==
      ((1L, 1L, 0L, 1L)))
  }

  test("gate: batch replay overwrites its own partition (idempotent)") {
    val state = tmp()
    val gate = new IngestGate(spark, state)
    val b0 = Seq((1L, "alpha beta gamma delta"), (2L, "unrelated words entirely"))
      .toDF("doc_id", "text")
    gate.applyBatch(b0, 0L)
    val b1 = Seq((3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    gate.applyBatch(b1, 1L)
    // replay batch 1 (crash-recovery path): same verdict, no
    // double-admission, and the corpus it probes excludes its own
    // half-written partition
    gate.applyBatch(b1, 1L)
    val v = gate.readVerdicts().filter(col("batch") === 1)
      .select("doc_id", "verdict", "dup_of").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(v.toSeq == Seq((3L, "dup_of_corpus", 1L)))
    val corpus = spark.read.parquet(s"$state/corpus")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(corpus == Set(1L, 2L))
  }
}
