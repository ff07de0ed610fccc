package graft

/** Dev utility: dump formatted plans for key queries and flag
  * missing pushdown/broadcast. sbt "runMain graft.PlanCheck q1 ..."
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_shipping_topk", "q5_regional_revenue",
        "cdc_checkpoint_filter", "cdc_lww_merge", "doc_dedup_minhash",
        "doc_ngram_jaccard", "emb_near_dup",
        "emb_knn_brute", "q_anti_join",
        "q_pivot", "q_funnel", "doc_top_ngrams", "doc_tfidf_topterms",
        "doc_length_quantiles", "doc_chunk", "doc_repetition_filter",
        "doc_top_ngrams_approx", "doc_mixture_sample", "doc_span_overlap",
        "emb_ivf_recall", "doc_incremental_dedup", "doc_boilerplate",
        "doc_cluster_best", "q_sessions", "q_retention",
        "hybrid_dup_components", "mm_audio_meta")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $n =====")
      println(plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("Join") ||
          l.contains("Exchange") || l.contains("WholeStageCodegen") ||
          l.trim.startsWith("(")).take(60).mkString("\n"))
    }
    spark.stop()
  }
}
