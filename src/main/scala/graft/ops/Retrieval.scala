package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — the step that merges a lexical
  * ranking (BM25) with a semantic one (embedding k-NN) into a single
  * consensus list, the standard shape of a modern retrieval stack.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, SIGIR):
    *
    *   score(d) = Σ_lists 1 / (k0 + rank_list(d))
    *
    * Robust without score calibration because only RANKS cross lists
    * — BM25's unbounded scores and cosine's [-1,1] never meet.
    *
    * Exactness: each contribution quantizes once per integer rank to
    * round(1e9 / (k0 + rank)) — fused scores are exact integer sums,
    * ties break by ascending id.
    *
    * Shape at scale: the inputs are already-truncated top-k lists
    * (O(k) rows each, the cheap output of TakeOrdered retrievers), so
    * the fusion is a union of O(N·k) rows, one aggregation, and a
    * TakeOrdered — nothing corpus-sized. A null or sub-1 rank FAILS
    * LOUDLY per row (a rank of -k0 would divide by zero into a null
    * that sum() silently drops — never a quietly wrong fused score).
    *
    * Returns (id, n_lists, rrf_e9, rank) for the fused top `topK`.
    */
  def rrfFuse(lists: Seq[DataFrame], id: Column, rank: Column,
      k0: Int, topK: Int): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 1, s"need k0 >= 1, got $k0")
    require(topK >= 1, s"need topK >= 1, got $topK")
    val u = lists.map(_.select(id.as("id"), rank.cast("long").as("rank")))
      .reduce(_ unionByName _)
    val fused = u.select(col("id"),
        when(col("rank").isNull || col("rank") < 1L,
          raise_error(concat(lit("rrfFuse: every rank must be >= 1, got "),
            coalesce(col("rank").cast("string"), lit("null")))).cast("long"))
          .otherwise(round(lit(1000000000.0d) /
            (lit(k0) + col("rank")).cast("double"), 0).cast("long")).as("c"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_lists"), sum("c").as("rrf_e9"))
    val top = fused.orderBy(col("rrf_e9").desc, col("id")).limit(topK)
    val w = Window.orderBy(col("rrf_e9").desc, col("id"))
    // the rank window runs over the already-limited topK rows only
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Name-bound convenience form: inputs carrying the conventional
    * (id, rank) column names, as emitted by this library's own
    * retrievers.
    */
  def rrfFuse(lists: Seq[DataFrame], k0: Int, topK: Int): DataFrame =
    rrfFuse(lists, col("id"), col("rank"), k0, topK)

  /** Per-group [[rrfFuse]] — the fusion step of a retrieval SWEEP
    * (one fused top-k per query), with ZERO driver work: the fused
    * scores aggregate on (group, id), and the per-group top-k rides
    * `graft_topk`'s map-side partial combine (each map task emits ≤
    * `topK` rows per group) with `n_lists` packed into the low 6
    * bits of the comparison id — the pack preserves the
    * (rrf_e9 desc, id asc) tie order because the id occupies the
    * high bits. Same loud sub-1-rank refusal as the single-query
    * form. Requires 0 ≤ id < 2^57, < 64 lists, and each id at most
    * once per list (packing headroom — loud requires and runtime
    * raise_errors, not silent caps).
    *
    * Returns (group, id, n_lists, rrf_e9, rank), rank 1-based per
    * group.
    */
  def rrfFuseBy(lists: Seq[DataFrame], group: Column, id: Column,
      rank: Column, k0: Int, topK: Int): DataFrame = {
    import graft.functions.TopKPairsAgg.topkPairs
    require(lists.nonEmpty, "rrfFuseBy needs at least one ranking")
    require(lists.size < 64,
      s"rrfFuseBy: ${lists.size} lists exceed the 2^6 n_lists " +
        "packing headroom")
    require(k0 >= 1, s"need k0 >= 1, got $k0")
    require(topK >= 1, s"need topK >= 1, got $topK")
    val u = lists.map(_.select(group.cast("long").as("grp"),
        id.cast("long").as("id"), rank.cast("long").as("rank")))
      .reduce(_ unionByName _)
    val c = when(col("rank").isNull || col("rank") < 1L,
      raise_error(concat(lit("rrfFuseBy: every rank must be >= 1, got "),
        coalesce(col("rank").cast("string"), lit("null")))).cast("long"))
      .otherwise(round(lit(1000000000.0d) /
        (lit(k0) + col("rank")).cast("double"), 0).cast("long"))
    val idGuard = when(col("id").isNull || col("id") < 0L ||
        col("id") >= (1L << 57),
      raise_error(lit("rrfFuseBy needs 0 <= id < 2^57 " +
        "(packing headroom)")).cast("long")).otherwise(col("id"))
    val fused = u.select(col("grp"), idGuard.as("id"), c.as("c"))
      .groupBy("grp", "id")
      .agg(count(lit(1)).as("n_lists"), sum("c").as("rrf_e9"))
      // n_lists is the per-(group,id) ROW count, which only equals the
      // list count when each list carries an id at most once — an id
      // DUPLICATED within one input list could reach 64 and silently
      // overflow into the id bits of the pack below. Loud, per the
      // library convention, not silently corrupted.
      .withColumn("n_lists", when(col("n_lists") >= 64L,
          raise_error(concat(lit("rrfFuseBy: id "), col("id"),
            lit(" appears "), col("n_lists"),
            lit(" times across <64 lists — an id must appear at most " +
              "once per list (dedupe each ranking first)")))
            .cast("long"))
        .otherwise(col("n_lists")))
    fused.groupBy("grp")
      .agg(topkPairs(col("rrf_e9"),
        shiftleft(col("id"), 6) + col("n_lists"), topK).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp").as("group"),
        shiftright(col("col.id"), 6).as("id"),
        (col("col.id") % lit(64L)).as("n_lists"),
        col("col.ord").as("rrf_e9"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
