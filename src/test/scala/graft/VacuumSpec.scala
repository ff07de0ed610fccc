package graft

import graft.model._
import graft.sink.{TableMeta, TransactionalStore}
import graft.streaming.CdcEngine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Store vacuum: unreferenced data files and old manifests are
  * collected; the committed state is untouched and still readable.
  */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  test("vacuum removes orphans, keeps the committed state readable") {
    val root = Files.createTempDirectory("graft-vac").toString
    val meta = TableMeta("users", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))), Seq("id"))
    val cfg = EngineConfig("vac",
      Seq(StreamConfig(0, s"$root/src", "users", partitions = 1)),
      s"$root/dst", ProblemStrategy.Stop, buckets = 4)
    val e = new CdcEngine(spark, cfg, Map(0 -> meta))
    e.bootstrap()
    def frame(lines: (String, Long, Long)*) =
      lines.toSeq.toDF("value", "partitionId", "offset")
        .withColumn("tableId", lit(0))
    // several commits so early versions become garbage
    for (i <- 1 to 4) {
      e.processBatch(frame(
        (s"""{"update":{"name":"v$i"},"key":[1],"ts":[$i,1]}""", 0L, i * 2L),
        (s"""{"resolved":[${i + 1},0]}""", 0L, i * 2L + 1)), i.toLong)
    }
    val before = e.readTable("users").collect().map(_.toSeq).toSet
    val deleted = TransactionalStore.vacuum(s"$root/dst", keepManifests = 1)
    assert(deleted > 0)
    assert(e.readTable("users").collect().map(_.toSeq).toSet == before)
    // a fresh engine still recovers from the vacuumed store
    val e2 = new CdcEngine(spark, cfg, Map(0 -> meta))
    assert(e2.readTable("users").collect().map(_.toSeq).toSet == before)
  }
}
