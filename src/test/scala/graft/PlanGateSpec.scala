package graft

import graft.plans.PlanLint

/** PlanLint promoted from library to GATE: every declared query's
  * physical plan is audited, and any single-partition exchange or
  * cartesian/nested-loop join anywhere on the oracle surface fails
  * the suite unless that query is on the pinned allowlist below —
  * reintroducing a global-window funnel or an accidental cross join
  * now breaks the build, not the next 100 TB run.
  */
class PlanGateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val Bnlj = Set("nested-loop-join")
  private val SinglePart = Set("single-partition-exchange")

  /** Deliberate, bounded-row exceptions — each entry names the query
    * and the finding kinds its plan is ALLOWED to contain, with the
    * reason. Everything else must audit clean: a new finding anywhere
    * on the surface fails this suite.
    */
  private val allow: Map[String, Set[String]] = Map(
    // every ANN query crossJoins the corpus against a BROADCAST
    // O(k)/O(centroids) literal side (query vectors, centroid table)
    // — the scan stays partition-parallel, the "nested loop" is
    // per-row against a handful of broadcast rows
    "emb_knn_brute" -> Bnlj,
    "emb_ivf_knn" -> Bnlj,
    "emb_ivf_knn_nprobe2" -> Bnlj,
    "emb_ivf_recall" -> Bnlj,
    "emb_pq_recall" -> Bnlj,
    "emb_rp_knn" -> Bnlj,
    "emb_rp_recall" -> Bnlj,
    "emb_sq8_knn" -> Bnlj,
    "emb_sq8_recall" -> Bnlj,
    "emb_hard_negatives" -> Bnlj,
    "emb_pca_ann_recall" -> Bnlj,
    // same shape on the low-rank fixture (r17 build commit 0fac5ec
    // added the query but missed this entry — the one deterministic
    // red in the inherited tree)
    "emb_pca_ann_recall_lowrank" -> Bnlj,
    // one-row verdict frames crossJoined together (count x dcg x
    // idcg; the quorum-cut scalar against the batch) — 1-row sides
    "doc_bm25_ndcg" -> Bnlj,
    "doc_hybrid_rrf" -> Bnlj,
    "cdc_quorum_cut" -> Bnlj,
    // suffix-sum window over exactly nBins=10 skeleton rows
    "doc_nb_threshold_sweep" -> SinglePart,
    // final rank window over the bounded source dimension (crawl
    // hosts — the heavyHittersExactBy maxGroups rationale)
    "doc_syndication_suspects" -> SinglePart,
    // waterfill windows run over the STRATUM-domain frame (one row
    // per mixture source, O(sources) bounded) — the corpus-sized
    // scan is already reduced by a map-side-combined agg upstream;
    // the exact cross-multiplied ratio rank (r15) self-joins that
    // same bounded frame, so its nested loop is O(sources)²
    "doc_token_budget" -> (SinglePart ++ Bnlj),
    // the frontier's waterfill runs over the bounded HOST domain
    // (one stratum per crawl host) — the doc_token_budget rationale
    "doc_crawl_frontier" -> (SinglePart ++ Bnlj),
    // same waterfill over the same bounded host domain, paced
    // capacity instead of raw capacity (r16)
    "doc_crawl_frontier_paced" -> (SinglePart ++ Bnlj))

  private def auditAt(names: Seq[String], dir: String): Seq[String] = {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      val df =
        try SparkEntry.queries(name)(spark, dir)
        catch {
          case e: Throwable =>
            bad += s"$name: query construction failed: ${e.getMessage}"
            null
        }
      if (df != null) {
        val found = PlanLint.audit(df).map(_.kind).toSet
        val allowed = allow.getOrElse(name, Set.empty)
        val extra = found -- allowed
        if (extra.nonEmpty)
          bad += s"$name: ${extra.toSeq.sorted.mkString(",")} :: " +
            PlanLint.audit(df).filter(f => extra(f.kind))
              .map(_.node).mkString(" | ")
      }
    }
    bad.toSeq
  }

  test("every declared query plan audits clean (pinned allowlist)") {
    val bad = auditAt(SparkEntry.queries.keys.toSeq.sorted, sfDir)
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }

  /** Size-triggered plan flips (a broadcast falling back to SMJ, a
    * new single-partition exchange appearing past a stats threshold)
    * are invisible at sf0.001 — re-audit the expensive pure queries
    * at sf0.1, where AQE/broadcast decisions use 100× the input
    * stats. State-backed queries (engine e2e, memoized indexes) are
    * excluded: constructing them here would rebuild their state at
    * sf0.1 inside the unit suite; their plans are audited above.
    */
  private val heavyPure = Seq(
    "doc_syndication_suspects", "hybrid_dup_components",
    "doc_minhash_recall", "q_bt_strengths_dist", "doc_cluster_best",
    "doc_dup_rate_by_source", "doc_dup_keep_best",
    "doc_leakage_safe_split", "doc_dup_components",
    "doc_decontaminate_frac", "doc_best_match", "doc_ngram_jaccard",
    "doc_dup_pagerank", "doc_source_pagerank", "doc_affinity_triangles",
    "doc_dedup_simhash", "emb_mmr_topk", "doc_containment_pairs",
    "doc_span_overlap", "doc_pack_sequences", "doc_hybrid_rrf_multi",
    "doc_nb_calibration_by_source", "mm_frame_pixels",
    "doc_html_extract", "doc_html_blocks")

  test("heavy pure queries audit clean at sf0.1 too (plan-flip guard)") {
    val missing = heavyPure.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown queries: $missing")
    val bad = auditAt(heavyPure, "/root/testdata/sf0.1")
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }
}
