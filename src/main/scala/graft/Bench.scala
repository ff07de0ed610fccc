package graft

object Bench {
  /** Headline queries: one representative per operator family.
    * Excluded by design: the redundant pair-op variants
    * (doc_ngram_jaccard, doc_dedup_simhash cover the same machinery as
    * doc_dedup_minhash; doc_dup_rate_by_source re-runs
    * doc_dup_components' pipeline plus a groupBy;
    * doc_decontaminate_frac re-runs doc_decontaminate's semi-join plus
    * a per-doc count) and the correctness-invariant engine replays
    * (cdc_engine_incremental/restart re-run the same engine
    * cdc_engine_e2e measures, several times over).
    */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_topk", "q5_regional_revenue",
    "q_window_running", "q_topk_orders", "q_distinct_agg", "q_setops",
    "q_rollup", "q_pivot", "q_funnel",
    "cdc_parse_project", "cdc_checkpoint_filter", "cdc_lww_merge",
    "cdc_quorum", "cdc_out_of_order", "cdc_tumbling_window",
    "cdc_salted_agg", "cdc_engine_e2e",
    "doc_token_stats", "doc_fingerprint", "doc_exact_dedup",
    "doc_simhash", "doc_dedup_minhash", "doc_dup_components",
    "doc_curation_pipeline", "doc_repetition_filter", "doc_top_ngrams",
    "doc_tfidf_topterms", "doc_pii_redact", "doc_decontaminate",
    "doc_pack_greedy", "doc_sample_stratified", "doc_temperature_sample",
    "doc_length_quantiles", "doc_chunk", "doc_inverted_index",
    "mm_image_meta",
    "emb_knn_brute", "emb_lsh_buckets", "emb_ivf_knn", "emb_kmeans",
    "emb_near_dup", "emb_semantic_dedup")

  /** One tiny engine run (2 partitions, 4 changes + 2 heartbeats) to
    * compile the engine's plan shapes before measurement.
    */
  private def warmupEngine(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.model._
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types._
    val spark2 = spark
    import spark2.implicits._
    // generated code inlines the destination schema (typed projection)
    // and bucket count, so the warmup table mirrors the e2e fixture's
    // shape — otherwise the apply-side stages compile twice
    val root = java.nio.file.Files.createTempDirectory("graft-warm").toString
    val cfg = EngineConfig("bench-warmup",
      Seq(StreamConfig(0, s"$root/src", "users", partitions = 2)),
      s"$root/dst", ProblemStrategy.Stop,
      maxBatchSize = Int.MaxValue, buckets = 32)
    val meta = graft.sink.TableMeta("users",
      StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType), StructField("props", StringType))),
      Seq("user_id"))
    val e = new graft.streaming.CdcEngine(spark, cfg, Map(0 -> meta))
    e.bootstrap()
    val frame = Seq(
      ("""{"update":{"value":"1.5"},"key":[1],"ts":[1,1]}""", 0L, 0L),
      ("""{"update":{"props":"b"},"key":[2],"ts":[2,1]}""", 1L, 0L),
      ("""{"erase":{},"key":[2],"ts":[2,2]}""", 1L, 1L),
      ("""{"update":{"value":"2.5","props":"c"},"key":[3],"ts":[2,3]}""", 0L, 1L),
      ("""{"resolved":[9,0]}""", 0L, 2L),
      ("""{"resolved":[9,0]}""", 1L, 2L))
      .toDF("value", "partitionId", "offset").withColumn("tableId", lit(0))
    e.processBatch(frame, 0L)
    e.readTable("users").count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q3_shipping_topk,emb_ivf_knn
    // restricts the run; the driver never sets it, so official rounds
    // always measure the full headline list
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(names) =>
        val asked = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = asked -- headline.toSet
        if (unknown.nonEmpty) {
          System.err.println(
            s"SPARK_GRAFT_BENCH_ONLY names not in headline: ${unknown.mkString(",")}")
          sys.exit(2) // a typo must not read as an empty (fast!) run
        }
        headline.filter(asked)
      case None => headline
    }
    val spark = GraftSession.get()
    // amortize session/JIT startup so the first measured query isn't
    // charged for codegen warmup
    spark.range(2000000L).selectExpr("sum(id)").collect()
    // warmup failure is not fatal here — the measured loop will record
    // the same error per-query so it lands in the JSON
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // same convention for the CDC engine: a production engine runs
    // indefinitely, so its one-time plan/codegen compilation is
    // amortized across every batch — warm those plan shapes on a
    // 6-row in-memory batch so cdc_engine_e2e measures the engine,
    // not the first-ever Janino compile of its stages
    try warmupEngine(spark) catch { case _: Throwable => () }
    // a failed query must be VISIBLE: it reports in "errors" with its
    // message and the process exits nonzero — a throwing query used to
    // contribute elapsed time indistinguishably from success
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.replace("\"", "'").take(200)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // outside the timed section: a cache an iterative operator left
      // behind must not pressure the NEXT query's measurement
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
