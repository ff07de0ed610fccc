package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (Verify, Bench, tests)
  * builds its session here so configs stay consistent.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's parallelism-first coalescing floors post-shuffle
      // partitions at minPartitionSize (default 1 MB) — which
      // collapses a SMALL-BYTES but COMPUTE-DENSE exchange (candidate
      // pairs carrying set arrays into a Jaccard verify, probe hits
      // into a popcount verify) onto one task. 16 KB keeps such
      // stages parallel while leaving any real-scale shuffle
      // untouched: the floor only binds when totalBytes/parallelism
      // is under it, i.e. kilobyte-scale exchanges. Measured r17:
      // doc_minhash_recall 13.3s -> 4.9s, no regressions elsewhere.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "16KB")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
      // reader refuses by default; read it as a long of nanoseconds
      // (pairs with DuckDB's epoch_ns on the oracle side).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
