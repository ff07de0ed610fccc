package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** A/B of the native one-pass CDC envelope parser
  * (CdcEnvelopeExpr, Jackson streaming straight into the InternalRow)
  * vs the from_json(PERMISSIVE) twin it replaced, over the synthetic
  * events table rendered as CDC JSON envelopes:
  *
  *   SPARK_GRAFT_SF_DIR=local/sf1 sbt "runMain graft.tools.ParseBench"
  *
  * Prints one line per variant: parse + full-scan aggregate time,
  * best of `reps` after one warmup each.
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = 3
    val spark = GraftSession.get("32")
    val cdc = graft.queries.Tables.cdcView(spark, sfDir)
    // same envelope synthesis as the engine e2e fixture, persisted so
    // both variants parse identical in-memory strings
    val raw = cdc.select(
      to_json(struct(
        map(lit("value"), col("value").cast("string"),
          lit("props"), col("props")).as("update"),
        array(col("user_id").cast("string")).as("key"),
        array(col("step_us"), col("event_id")).as("ts"))).as("value"),
      col("part").cast("long").as("partitionId"),
      col("event_id").as("offset"))
      .withColumn("tableId", lit(0))
      .persist()
    val n = raw.count()

    def time(name: String, parse: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      for (_ <- 0 to reps) {
        val t0 = System.nanoTime()
        // full scan + field access so the parse cannot be pruned away
        parse(raw).agg(
          sum(when(col("isMalformed"), 1L).otherwise(0L)),
          sum(col("env.ts").getItem(0) % 1000000L)).head()
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
      }
      println(f"[parsebench] $name%-10s rows=$n best=${best}%.3f s " +
        f"(${n / best / 1e6}%.2f M rows/s)")
    }
    time("native", graft.parse.CdcParser.parseEnvelope)
    time("from_json", graft.parse.CdcParser.parseEnvelopeBuiltin)
    spark.stop()
  }
}
