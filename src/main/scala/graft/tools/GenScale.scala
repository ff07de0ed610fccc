package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale an existing testdata directory by integer replication with
  * key shifting: every copy offsets its primary/foreign keys by
  * copy × (max key + 1), so joins stay self-contained per copy and
  * every distribution (dates, prices, flags, text lengths) is
  * preserved exactly. The base testdata is read-only, so larger scale
  * factors for LOCAL benchmarking are derived, not regenerated:
  *
  *   sbt "runMain graft.tools.GenScale /root/testdata/sf0.1 local/sf1 10"
  *
  * Copy-specific perturbations keep the workload character linear:
  *  - documents.text gets a per-copy token suffix (otherwise every
  *    doc would have 9 cross-copy near-duplicates and the dedup
  *    pair workload would scale ~quadratically, which sf1 does not);
  *  - embeddings are rotated by copy index (preserves norms and
  *    within-copy geometry, decorrelates across copies);
  *  - events shift time so copies occupy disjoint position ranges.
  * region/nation stay fixed — TPC-H dimension tables do not scale.
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = args match {
      case Array(s, d, f) => (s, d, f.toInt)
      case _ => ("/root/testdata/sf0.1", "local/sf1", 10)
    }
    val spark = GraftSession.get("32")
    require(factor >= 1, "factor must be >= 1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      // single file per table, like the source layout
      df.coalesce(math.max(1, factor / 2))
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // dimensions: copied through unchanged
    write("region", read("region"))
    write("nation", read("nation"))

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionByName _)

    val customer = read("customer"); val cSpan = span(customer, "c_custkey")
    val supplier = read("supplier"); val sSpan = span(supplier, "s_suppkey")
    val part = read("part"); val pSpan = span(part, "p_partkey")
    val orders = read("orders"); val oSpan = span(orders, "o_orderkey")

    write("customer", replicate(customer)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + i * cSpan)))
    write("supplier", replicate(supplier)((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + i * sSpan)))
    write("part", replicate(part)((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + i * pSpan)))
    write("orders", replicate(orders)((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + i * oSpan)
        .withColumn("o_custkey", col("o_custkey") + i * cSpan)))
    write("lineitem", replicate(read("lineitem"))((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + i * oSpan)
        .withColumn("l_partkey", col("l_partkey") + i * pSpan)
        .withColumn("l_suppkey", col("l_suppkey") + i * sSpan)))

    // events: each copy occupies a disjoint time range so CDC
    // positions never collide across copies. ts may be a ns long
    // (legacy nanosAsLong shape) or a µs timestamp — shift in the
    // column's own unit either way.
    val events = read("events")
    val eSpan = span(events, "event_id")
    val uSpan = span(events, "user_id")
    val tsIsLong = events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val tSpan: Long =
      if (tsIsLong) {
        val r = events.agg(min(col("ts")), max(col("ts"))).head()
        r.getLong(1) - r.getLong(0) + 1000000L // ns span + 1 ms
      } else {
        val r = events
          .agg(min(expr("unix_micros(cast(ts as timestamp))")),
            max(expr("unix_micros(cast(ts as timestamp))"))).head()
        r.getLong(1) - r.getLong(0) + 1000L // µs span + 1 ms
      }
    def shiftTs(d: DataFrame, i: Int) =
      if (tsIsLong) d.withColumn("ts", col("ts") + i * tSpan)
      else d.withColumn("ts",
        expr(s"timestampadd(MICROSECOND, ${i * tSpan}L, ts)"))
    write("events", replicate(events)((d, i) =>
      shiftTs(d, i)
        .withColumn("event_id", col("event_id") + i * eSpan)
        .withColumn("user_id", col("user_id") + i * uSpan)))

    // documents: per-copy token suffix (see scaladoc)
    val documents = read("documents")
    val dSpan = span(documents, "doc_id")
    write("documents", replicate(documents)((d, i) =>
      d.withColumn("doc_id", col("doc_id") + i * dSpan)
        .withColumn("text",
          if (i == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", "$1" + s"x$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))))

    // embeddings: rotate the vector by the copy index
    val embeddings = read("embeddings")
    val vSpan = span(embeddings, "vec_id")
    write("embeddings", replicate(embeddings)((d, i) =>
      d.withColumn("vec_id", col("vec_id") + i * vSpan)
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, 10000),
            slice(col("embedding"), 1, i)))))

    spark.stop()
  }
}
