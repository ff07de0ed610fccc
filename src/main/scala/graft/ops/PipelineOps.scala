package graft.ops

import graft.functions.GraftFunctions.{sampleHash, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond dedup/similarity: PII
  * scrubbing, benchmark decontamination, sequence packing, stratified
  * sampling. All declarative column plans (codegen'd, no UDFs); the
  * regex patterns are RE2-safe (no lookarounds) so the DuckDB oracle
  * twins run the IDENTICAL patterns.
  */
object PipelineOps {

  /** Shared PII patterns (RE2-safe). Kept deliberately conservative:
    * emails, international-prefixed phone numbers, IPv4 literals.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII detection + redaction: per-kind match counts and the text
    * with every match replaced by a typed tag. Redaction order is
    * part of the definition (emails, then phones, then IPs) — scan
    * -parallel, no shuffle.
    */
  def piiDetectRedact(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(text, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))

  /** Shared decontamination skeleton: per-doc distinct shingle-hash
    * sets (`base`), their exploded (doc, hash) rows, and the distinct
    * eval-side hash set — ONE derivation so the boolean and gradated
    * verdicts cannot disagree about what counts as contamination.
    */
  private def contaminationSets(df: DataFrame, id: Column, text: Column,
      isEval: Column, w: Int): (DataFrame, DataFrame, DataFrame) = {
    val base = df.select(id.as("__id"), isEval.as("__eval"),
        tokens(text).as("__t"))
      .select(col("__id"), col("__eval"),
        Dedup.shingleHashes(col("__t"), w).as("__sh"))
    val exploded = base.select(col("__id"), col("__eval"),
      explode(col("__sh")).as("__h"))
    val evalHashes = exploded.filter(col("__eval"))
      .select(col("__h")).distinct()
    (base, exploded, evalHashes)
  }

  /** Benchmark decontamination: flag every training document that
    * shares at least one word `w`-shingle with any document of the
    * eval set. The shuffle key is the shingle hash — eval-side
    * shingles are usually broadcastable (eval sets are small), and the
    * training side streams through a semi-join; nothing is quadratic.
    * `isEval` partitions the corpus (eval rows are excluded from the
    * output).
    */
  def decontaminate(df: DataFrame, id: Column, text: Column,
      isEval: Column, w: Int): DataFrame = {
    val (base, exploded, evalHashes) = contaminationSets(df, id, text, isEval, w)
    val contaminated = exploded.filter(!col("__eval"))
      .join(evalHashes, Seq("__h"), "left_semi")
      .select(col("__id")).distinct()
      .withColumn("__contaminated", lit(true))
    base.filter(!col("__eval"))
      .join(contaminated, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("__contaminated"), lit(false)).as("contaminated"))
  }

  /** [[decontaminate]] with a Bloom prefilter in front of the exact
    * eval-hash join — the shape for corpus-scale membership. The exact
    * semi-join shuffles every training-side (doc, shingle-hash) row,
    * and at 100 TB almost none of those hashes are in the eval set, so
    * that exchange is nearly all waste. Building a Bloom filter over
    * the eval hashes (one distributed aggregation, `fpp`-sized) and
    * probing it scan-side lets only true hits plus an `fpp` sliver of
    * false positives into the shuffle — the runtime-filter idea Spark
    * applies inside joins, applied across the explode. Bloom filters
    * have no false negatives and survivors still pass the exact join,
    * so the output is IDENTICAL to [[decontaminate]]; the filter only
    * prunes. Driver/executor footprint is the serialized filter,
    * O(n·ln(1/fpp)) bits — far below the exact hash set a broadcast
    * join would need, which is what stops scaling first.
    */
  def decontaminateBloom(df: DataFrame, id: Column, text: Column,
      isEval: Column, w: Int, fpp: Double = 0.01): DataFrame = {
    val (base, exploded, evalHashes) = contaminationSets(df, id, text, isEval, w)
    // the eval-hash derivation (tokenize+shingle+explode+distinct) has
    // THREE consumers — the sizing count, the bloom fold, and the
    // exact confirm join — so it is persisted once; the caller (or
    // the per-query clearCache in Verify) releases it after the
    // result is consumed. An empty eval set builds a valid
    // all-negative filter: everything prunes, nothing confirms, all
    // verdicts false — exactly [[decontaminate]] on the same input.
    val evalCached = evalHashes.persist()
    val bloomBytes = graft.functions.NativeExpressions.buildBloomBytes(
      evalCached, col("__h"), fpp)
    val candidates = exploded.filter(!col("__eval"))
      .filter(graft.functions.NativeExpressions.bloomMightContain(
        col("__h"), bloomBytes))
    val contaminated = candidates.join(evalCached, Seq("__h"), "left_semi")
      .select(col("__id")).distinct()
      .withColumn("__contaminated", lit(true))
    base.filter(!col("__eval"))
      .join(contaminated, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("__contaminated"), lit(false)).as("contaminated"))
  }

  /** Gradated decontamination: instead of a boolean, report each
    * training document's distinct-shingle overlap with the eval set —
    * n_shingles, n_contaminated, and the exact fraction (the number a
    * pipeline thresholds to separate verbatim leaks from incidental
    * n-gram collisions). Same plan skeleton as [[decontaminate]]: the
    * eval-hash semi-join keyed on the shingle hash, then one count per
    * document; a zero-shingle document reports null fraction.
    */
  def decontaminateFrac(df: DataFrame, id: Column, text: Column,
      isEval: Column, w: Int): DataFrame = {
    val (base, exploded, evalHashes) = contaminationSets(df, id, text, isEval, w)
    val hits = exploded.filter(!col("__eval"))
      .join(evalHashes, Seq("__h"), "left_semi")
      .groupBy("__id").agg(count(lit(1)).as("n_contaminated"))
    base.filter(!col("__eval"))
      .select(col("__id"), size(col("__sh")).cast("long").as("n_shingles"))
      .join(hits, Seq("__id"), "left")
      .select(col("__id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated_frac",
        col("n_contaminated").cast("double") /
          nullif(col("n_shingles").cast("double"), lit(0.0d)))
  }

  /** Deterministic offset packing of documents into fixed token
    * budgets: within a group (e.g. source), documents are laid out in
    * id order and a document belongs to the pack where its first token
    * lands — `floor(cum_tokens_before / budget)`. Packs can overflow
    * by less than one document; the assignment is a single window
    * cumsum per group (one shuffle on the group key), which is the
    * only packing rule that is both deterministic and expressible
    * without a sequential fold.
    */
  def packSequences(df: DataFrame, group: Column, order: Column,
      nTokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(nTokens).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / budget))
  }

  /** Deterministic train/val/test split assignment: a row's split is a
    * pure function of its id (`sampleHash(id) mod 100` against
    * cumulative percent cutoffs), so membership is reproducible across
    * runs and engines, never drifts when the corpus grows (existing
    * rows keep their split), and needs no shuffle — the standard
    * reproducible-split primitive. `cuts` maps split name → percent;
    * percents must sum to 100.
    */
  def splitAssign(df: DataFrame, id: Column,
      cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.map(_._2).sum == 100 && cuts.forall(_._2 > 0),
      "split percents must be positive and sum to 100")
    val h = pmod(sampleHash(id.cast("string")), lit(100L))
    // fold from the last cut backwards: h < cum(i) picks split i
    val assigned = cuts.zip(cuts.scanLeft(0)(_ + _._2).tail).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, ((name, _), cum)) =>
        when(h < cum, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** LEAKAGE-SAFE train/val/test split: assignment keyed on the
    * near-duplicate component REPRESENTATIVE, not the document id —
    * the eval-contamination guard real pipelines need (hashing per-doc
    * puts two near-identical documents on opposite sides of the
    * train/test fence; hashing per-component makes that impossible by
    * construction: every member of a component shares the
    * representative, hence the split). `components` is
    * (id, comp) from [[Dedup.connectedComponents]] over whatever pair
    * generator the pipeline trusts (MinHash, SimHash, semantic);
    * documents absent from it are singletons (their own
    * representative), so the split is [[splitAssign]]'s for them and
    * membership stays stable as the duplicate graph grows only for
    * newly-linked docs. Adds (rep, split).
    *
    * Scale shape: one left equi-join on the id (the component table is
    * pair-graph-sized — usually tiny next to the corpus, broadcast
    * when small) plus [[splitAssign]]'s shuffle-free hash expression.
    */
  def leakageSafeSplit(df: DataFrame, id: Column, components: DataFrame,
      cuts: Seq[(String, Int)]): DataFrame = {
    val comp = components.select(col("id").as("__lsid"),
      col("comp").as("__lscomp"))
    val joined = df.join(comp, id === col("__lsid"), "left")
      .withColumn("rep", coalesce(col("__lscomp"), id))
      .drop("__lsid", "__lscomp")
    splitAssign(joined, col("rep"), cuts)
  }

  /** Per-group Tukey outlier fences: (grp, n, lo, hi) with
    * lo = q1 − k·IQR, hi = q3 + k·IQR off EXACT discrete quartiles
    * ([[TextOps.discQuantiles]] — the corpus collapses to
    * (group × distinct value) in one shuffle; never a per-group full
    * sort). The fence arithmetic is plain IEEE ops on the selected
    * quartile values, so both engines derive bit-identical bounds.
    * The bounds frame is O(#groups) — broadcast it back onto the data
    * for trimming/winsorizing; that join is the caller's (it knows
    * whether it wants to drop, clamp, or just count).
    */
  def iqrBounds(df: DataFrame, group: Column, value: Column,
      k: Double = 1.5): DataFrame =
    TextOps.discQuantiles(df, group, value,
        Seq(("q1", 1, 4), ("q3", 3, 4)))
      .select(col("grp"), col("n"),
        (col("p_q1") - (col("p_q3") - col("p_q1")) * k).as("lo"),
        (col("p_q3") + (col("p_q3") - col("p_q1")) * k).as("hi"))

  /** Deterministic per-stratum sampling: keep a row iff
    * sampleHash(stratum ":" id) mod 100 < rate(stratum). Pure
    * filter — scan-parallel, reproducible across engines and runs,
    * and rows never move between strata when rates change.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      ratesPercent: Map[String, Int], defaultPercent: Int): DataFrame = {
    val rate = ratesPercent.foldLeft(lit(defaultPercent)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(
      pmod(sampleHash(concat(stratum, lit(":"), id.cast("string"))),
        lit(100L)) < rate)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): each row draws a deterministic uniform u ∈ (0, 1] from
    * its id hash and ranks by priority ln(u)/w — the k largest
    * priorities are exactly a w-weighted sample without replacement.
    * Deterministic (same ids + weights → same sample, any partition
    * layout), scan-parallel, and the selection is a TakeOrdered —
    * O(k) memory per partition and on the driver, never a global
    * sort. The priority column is NOT emitted: it is transcendental
    * (ln), and last-ulp libm differences across engines would break
    * byte-compare of an otherwise identical SAMPLE; the selected set
    * is ulp-stable because real corpora never put two priorities
    * within 1e-16 of each other.
    *
    * Weights must be strictly positive (rows with w <= 0 or null are
    * dropped — zero-weight rows are unsampleable by definition).
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val u = (sampleHash(id.cast("string")).cast("double") + 1.0) /
      (graft.functions.GraftFunctions.PhMod.toDouble + 1.0)
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("__pri", log(u) / weight.cast("double"))
      .orderBy(col("__pri").desc, id)
      .limit(k)
      .drop("__pri")
  }

  /** Per-stratum weighted sampling without replacement: the
    * [[weightedSample]] priorities ranked PER STRATUM through the
    * native partial-combine top-k aggregate
    * (`functions.TopKPairsAgg`) — each map task reduces its slice to
    * ≤ k candidates per stratum before the exchange, so a stratum
    * holding most of the corpus never funnels its rows through one
    * sorted partition (the window formulation would). Priorities are
    * quantized to 1e-12 units for the integer aggregate; ties break
    * on the smaller id. Returns (stratum, rank, id), up to k rows
    * per stratum.
    *
    * The quantized priority is clamped to ±9.0e18 IN DOUBLE SPACE,
    * before the BIGINT cast: below weights of ~2.3e-6 the e12
    * magnitude exceeds Long range, where Spark's double→long cast
    * saturates silently while DuckDB's errors — the symmetric clamp
    * keeps both engines on the same value. Clamped rows (weights
    * under the ~2.3e-6 floor) tie at the clamp and fall to the id
    * tiebreak; any oracle twin must apply the same greatest/least.
    */
  def weightedSamplePerStratum(df: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val u = (sampleHash(id.cast("string")).cast("double") + 1.0) /
      (graft.functions.GraftFunctions.PhMod.toDouble + 1.0)
    val priE12 = least(greatest(round(log(u) / weight.cast("double") * 1e12, 0),
      lit(-9.0e18)), lit(9.0e18)).cast("long")
    df.filter(weight.isNotNull && weight > 0)
      .select(stratum.as("stratum"), id.cast("long").as("__id"),
        priE12.as("__p"))
      .groupBy("stratum")
      .agg(graft.functions.TopKPairsAgg.topkPairs(
        col("__p"), col("__id"), k).as("top"))
      .select(col("stratum"), posexplode(col("top")))
      .select(col("stratum"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"))
  }

  /** Context-length chunking: split each document's token sequence
    * into windows of `window` tokens advancing by `stride` (overlap =
    * window − stride), the way corpora are cut for a context-bounded
    * model. Emits (chunk_id, chunk_start, n_chunk_tokens, chunk_text)
    * per window; a final short window is kept iff it starts inside
    * the sequence (the standard drop-nothing policy). Pure
    * projection + one explode — scan-parallel, no shuffle; the token
    * array is bound to a column BEFORE the window lambdas so
    * interpreted HOF evaluation cannot re-tokenize per element.
    */
  def chunk(df: DataFrame, text: Column, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val bound = df.withColumn("__toks", tokens(text))
    // window starts: 0, stride, 2·stride, … < n (an empty doc gets no
    // chunks); sequence() is inclusive, so step back when n lands on
    // a stride boundary
    val n = size(col("__toks"))
    val starts = when(n > 0, sequence(lit(0),
      ((n - 1) / stride).cast("int") * stride, lit(stride)))
      .otherwise(array().cast("array<int>"))
    bound
      .withColumn("chunk_start", explode(starts))
      .withColumn("chunk_toks",
        slice(col("__toks"), col("chunk_start") + 1, lit(window)))
      .withColumn("chunk_id", (col("chunk_start") / stride).cast("long"))
      .withColumn("n_chunk_tokens", size(col("chunk_toks")).cast("long"))
      .withColumn("chunk_text", concat_ws(" ", col("chunk_toks")))
      .drop("__toks", "chunk_toks")
  }

  /** Epoch repeat plan (quality upsampling): each row expands to
    * `repeats(bucket)` copies tagged `rep = 1..r` — the "see good
    * data more often" knob of a training recipe, materialized as the
    * epoch-order input a loader shuffles and streams. Missing
    * buckets (and null) fall back to `defaultRepeat`; a bucket mapped
    * to 0 drops its rows. Scale shape: the bucket→repeat table is a
    * literal when-chain (O(#buckets), driver-side constants) and the
    * expansion is a codegen'd `explode(sequence(...))` — pure
    * scan-parallel row generation, no shuffle, output size
    * Σ r_b·n_b known up front from the recipe.
    */
  def epochPlan(df: DataFrame, bucket: Column,
      repeats: Map[String, Int], defaultRepeat: Int = 1): DataFrame = {
    require(defaultRepeat >= 0 && repeats.values.forall(_ >= 0),
      "repeat counts must be non-negative")
    val r = repeats.foldLeft(lit(defaultRepeat)) {
      case (acc, (k, v)) => when(bucket === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__r", r)
      .filter(col("__r") >= 1)
      .withColumn("rep",
        explode(sequence(lit(1L), col("__r").cast("long"))))
      .drop("__r")
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns:
    * one pass groups the corpus by the quasi-identifier combination
    * and emits, per combo, its row count, the number of DISTINCT
    * sensitive values it exposes, and the two verdicts (n ≥ k:
    * re-identification needs at least k candidates; distinct ≥ l: the
    * sensitive attribute is not constant within the combo — k alone
    * is vacuous when every member shares the secret). The release
    * gate: combos failing either verdict need suppression or
    * generalization before the corpus ships. One hash shuffle with
    * map-side combine; output is combo-cardinality-sized.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
      k: Long, l: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, "k and l must be at least 1")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Nucleus (top-p) selection per stratum: order rows by
    * (weight desc, id asc) and keep the minimal prefix whose weight
    * mass reaches num/den of the stratum total — nucleus sampling
    * applied to curation: "the heaviest documents carrying 80% of the
    * stratum's bytes". The keep test is pure integer arithmetic,
    * (cum − w)·den < total·num: the row that CROSSES the threshold is
    * kept, everything after is cut, ties broken by id — so any engine
    * selects the identical prefix. Scale shape: one hash shuffle on
    * the stratum plus stratum-local cumulative windows; no driver
    * state, no global sort. (A stratum so skewed that its rows
    * overwhelm one task is the pre-existing window limit — salt the
    * stratum upstream if that ever binds.)
    */
  def nucleusSelect(df: DataFrame, stratum: Column, id: Column,
      weight: Column, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0, "p must be num/den with den > 0")
    val wCum = Window.partitionBy("__s")
      .orderBy(col("__w").desc, col("__id"))
    val wAll = Window.partitionBy("__s")
    df.withColumn("__s", stratum)
      .withColumn("__id", id)
      .withColumn("__w", weight.cast("long"))
      .filter(col("__w").isNotNull)
      .withColumn("__cum", sum("__w").over(wCum))
      .withColumn("__tot", sum("__w").over(wAll))
      .filter((col("__cum") - col("__w")) * den < col("__tot") * num)
      .drop("__s", "__id", "__w", "__cum", "__tot")
  }

  /** Temperature-balanced sampling (multilingual-corpus rebalancing):
    * stratum weights w_s = ⌊√n_s⌋ (temperature α = 0.5), overall
    * target = num/den of the corpus, per-stratum keep rate
    * min(1, target·w_s / (Σw · n_s)) expressed in parts-per-million.
    * Rates are computed driver-side in BigInt over the O(#strata)
    * count table — exact, no overflow at any corpus size — and applied
    * as a broadcast-joined pure hash filter, so the data-sized pass is
    * scan-parallel (no per-stratum ranking, which would shuffle the
    * corpus into #strata giant partitions).
    */
  def temperatureSample(df: DataFrame, stratum: Column, id: Column,
      num: Long, den: Long): DataFrame = {
    // bind the stratum's string rendering ONCE — the count, the rate
    // match, and the hash key all read the same column, so a non-string
    // stratum cannot mis-bucket through divergent implicit casts
    val bound = df.withColumn("__s", stratum.cast("string"))
    // a null stratum can't equi-match a rate key below — those rows
    // drop out of the inner join (rate 0 semantics)
    val counts = bound.groupBy("__s").agg(count(lit(1)).as("__n"))
      .collect().flatMap(r => Option(r.getString(0)).map((_, r.getLong(1))))
    val target = BigInt(counts.map(_._2).sum) * num / den
    val weights = counts.map { case (s, n) =>
      (s, n, BigInt(math.sqrt(n.toDouble).toLong)) }
    val sumW = weights.map(_._3).sum
    val spark = df.sparkSession
    import spark.implicits._
    val rates = weights.toSeq.map { case (s, n, w) =>
      val r = BigInt(1000000) * target * w / (sumW * n)
      (s, r.min(BigInt(1000000)).toLong)
    }.toDF("__s", "rate_ppm")
    // the O(#strata) rate table joins in as a broadcast — plan size is
    // stratum-count-independent, unlike a when-chain that folds every
    // stratum into one expression and bloats the plan at high
    // cardinality (domain × lang strata)
    bound.join(broadcast(rates), Seq("__s"), "inner")
      .filter(
        pmod(sampleHash(concat(col("__s"), lit(":"), id.cast("string"))),
          lit(1000000L)) < col("rate_ppm"))
      .drop("__s")
  }

  /** Token-budget mixture sampling: downsample each stratum so the
    * SAMPLED corpus hits a target token mixture — the "30% code, 70%
    * web, capped at B tokens" knob of a pretraining data recipe.
    * `shares` maps stratum → relative target weight (need not sum to
    * anything); the keep rate for stratum s with token mass T_s is
    * min(1, budget·share_s / (Σshare · T_s)) in ppm, computed
    * driver-side in BigInt over the O(#strata) token-mass table and
    * applied exactly like [[temperatureSample]]: a broadcast-joined
    * deterministic hash filter, scan-parallel over the corpus, rows
    * never migrating between strata when rates change. A stratum
    * absent from `shares` (or with null stratum) gets rate 0.
    */
  def mixtureSample(df: DataFrame, stratum: Column, id: Column,
      nTokens: Column, shares: Map[String, Long],
      budgetTokens: Long): DataFrame = {
    require(shares.values.forall(_ > 0), "shares must be positive")
    val bound = df.withColumn("__s", stratum.cast("string"))
      .withColumn("__nt", nTokens.cast("long"))
    // a stratum whose token counts are ALL null sums to null — treat
    // as mass 0 (rate 0 below) instead of NPEing on getLong
    val masses = bound.groupBy("__s").agg(sum("__nt").as("__t"))
      .collect().flatMap(r => Option(r.getString(0))
        .filter(shares.contains)
        .map((_, if (r.isNullAt(1)) 0L else r.getLong(1))))
    val sumShare = BigInt(shares.values.sum)
    val spark = df.sparkSession
    import spark.implicits._
    val rates = masses.toSeq.map { case (s, t) =>
      val r =
        if (t <= 0L) BigInt(0)
        else BigInt(1000000) * budgetTokens * shares(s) / (sumShare * t)
      (s, r.min(BigInt(1000000)).toLong)
    }.toDF("__s", "rate_ppm")
    bound.join(broadcast(rates), Seq("__s"), "inner")
      .filter(
        pmod(sampleHash(concat(col("__s"), lit(":"), id.cast("string"))),
          lit(1000000L)) < col("rate_ppm"))
      .drop("__s", "__nt")
  }

  /** Deterministic seeded global shuffle into training shards: the
    * last pipeline stage, fixing the order examples are consumed in.
    * Each document gets `ord = sampleHash("<seed>:<id>")` (uniform,
    * engine-reproducible, reshuffled by changing the seed), a shard
    * `ord % nShards`, and its in-shard position. Returns
    * (doc_id, shard, ord, pos).
    *
    * Scale shape: ONE shuffle on the shard key, then a per-shard sort
    * of corpus/nShards rows — the window partitions by shard, so
    * there is never a global single-reducer sort; nShards is the
    * parallelism knob (a 100 TB corpus wants thousands of shards, at
    * which point each sort is executor-local work feeding one output
    * file per shard). A pipeline that instead needs ONE totally
    * ordered sequence range-partitions by `ord` — Spark's sort shape
    * — but training wants addressable shards, so that is not this
    * operator.
    */
  def shuffleShards(df: DataFrame, id: Column, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))
    df.select(id.as("doc_id"),
        sampleHash(concat(lit(s"$seed:"), id.cast("string"))).as("ord"))
      .withColumn("shard", col("ord") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Concat-and-chunk sequence packing — the step that turns curated
    * documents into fixed-length training sequences (the standard
    * GPT-style pipeline: concatenate the shard's token stream, cut
    * every `seqLen` tokens). Each document learns where it lands:
    * its token offset in the shard stream, the first and last
    * sequence it occupies, and whether it crosses a sequence
    * boundary (the attention-masking / document-splitting signal a
    * trainer consumes).
    *
    * Deterministic: documents concatenate in ascending `id` order
    * within each shard, so the layout is a pure function of
    * (id, n_tokens, shard) — any engine replays it. That claim needs
    * `id` UNIQUE within each shard (a duplicate would give the running
    * sum a nondeterministic tie order), so a duplicate (shard, id)
    * pair fails loudly instead of laying out differently per run.
    *
    * Scale shape: ONE shuffle on the shard key, then a per-shard
    * prefix sum (the window partitions by shard, never a global
    * single-reducer scan); nShards is the parallelism knob exactly as
    * in [[shuffleShards]]. All integer arithmetic.
    *
    * Returns (doc_id, shard, n_tokens, start_tok, seq_first,
    * seq_last, crosses); zero-token docs sit at their offset with
    * seq_last = seq_first (they occupy no token, flagged
    * non-crossing).
    */
  def chunkLayout(df: DataFrame, id: Column, nTokens: Column,
      shard: Column, seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"need seqLen >= 1, got $seqLen")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same partitioning + ordering as the prefix sum → one sort, no
    // extra exchange; equal neighbors under the sort are exactly the
    // duplicate (shard, doc_id) pairs the determinism contract bans
    val wOrd = Window.partitionBy("shard").orderBy("doc_id")
    df.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"),
        shard.as("shard"))
      .withColumn("start_tok",
        when(lag("doc_id", 1).over(wOrd) === col("doc_id"),
          raise_error(concat(lit("chunkLayout: duplicate (shard, id) = ("),
            col("shard"), lit(", "), col("doc_id"),
            lit(") — the layout is only deterministic when ids are " +
              "unique per shard"))).cast("long"))
        .otherwise(sum("n_tokens").over(w) - col("n_tokens")))
      .withColumn("seq_first",
        call_function("div", col("start_tok"), lit(seqLen)))
      .withColumn("seq_last",
        call_function("div",
          col("start_tok") + greatest(col("n_tokens") - 1L, lit(0L)),
          lit(seqLen)))
      .withColumn("crosses", col("seq_last") > col("seq_first"))
  }

  /** Per-shard packing census over [[chunkLayout]]'s layout: how
    * many sequences each shard yields (⌈tokens/seqLen⌉), the exact
    * fill rate in ppm (tokens·10⁶ div (n_seqs·seqLen) — the padding
    * waste of the LAST chunk), and how many documents straddle a
    * boundary. One O(shards) aggregation on top of the packing scan.
    * Returns (shard, n_docs, n_tokens, n_seqs, fill_ppm, n_crossing).
    */
  def chunkLayoutStats(packed: DataFrame, seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"need seqLen >= 1, got $seqLen")
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum(when(col("crosses"), 1L).otherwise(0L)).as("n_crossing"))
      .withColumn("n_seqs",
        call_function("div", col("n_tokens") + lit(seqLen - 1L),
          lit(seqLen)))
      .withColumn("fill_ppm",
        when(col("n_seqs") > 0L,
          call_function("div", col("n_tokens") * lit(1000000L),
            col("n_seqs") * lit(seqLen))).otherwise(lit(0L)))
      .select("shard", "n_docs", "n_tokens", "n_seqs", "fill_ppm",
        "n_crossing")
  }

  /** Exact top-`num/den` fraction by an integral weight, WITHOUT a
    * global sort: flags the k = ⌊N·num/den⌋ heaviest rows
    * (ties broken by ascending id, matching
    * `row_number() OVER (ORDER BY weight DESC, id) <= k`).
    *
    * The selection threshold is found by RECURSIVE histogram descent
    * instead of ranking the corpus:
    *   1. one scan → N, min, max;
    *   2. the current weight range coarse-bins to ≤4096 buckets; the
    *      bucket histogram collects (O(bins)) and a driver walk
    *      locates the bucket containing the k-th weight;
    *   3. recurse into THAT bucket's sub-range until the bin width
    *      reaches 1 — at which point bins ARE weights, pinning the
    *      exact threshold w* and the tie-take count. Depth is
    *      ≤ ⌈log₄₀₉₆(range)⌉ ≤ 6 for any Long range, so driver state
    *      is ≤ 6 × 4096 histogram cells NO MATTER how the weights are
    *      distributed (an earlier form collected the distinct weights
    *      of one bucket — adversarially O(n) on the driver; this
    *      version has no data-dependent collect at all);
    *   4. the flag is then a pure comparison against w*, except inside
    *      the tie group, which gets ranked by id through
    *      [[Ranks.globalRowNumber]]'s two-level decomposition — so
    *      even an ALL-TIED weight column (every row at w*) ranks in
    *      parallel instead of funneling the corpus through one
    *      window partition.
    * Every data-sized pass is scan-parallel (each level re-scans with
    * a tighter range predicate); nothing ever funnels the corpus
    * through one partition.
    *
    * `df` must have unique values in `idName`; `weightName` must be a
    * long column with NO nulls (a null weight has no place in the
    * `ORDER BY weight DESC` contract — the call fails loudly rather
    * than guessing a null's rank). Adds a boolean `selected` column.
    */
  def topFractionByWeight(df: DataFrame, idName: String, weightName: String,
      num: Long, den: Long, tieWindowLimit: Long = 65536L): DataFrame = {
    require(num >= 0 && den > 0, "fraction must be num/den with den > 0")
    val wCol = col(weightName)
    // the descent scans the weight column several times; pin the
    // NARROW projection so a derived input (e.g. the DSIR weight
    // pipeline) prices its lineage once, not once per level
    val wts = df.select(wCol.as("__w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val st = wts.agg(count(lit(1)), min("__w"), max("__w"),
        sum(when(col("__w").isNull, 1L).otherwise(0L))).head()
      val n = st.getLong(0)
      if (n == 0L) return df.withColumn("selected", lit(false))
      val nNull = if (st.isNullAt(3)) 0L else st.getLong(3)
      require(nNull == 0L,
        s"topFractionByWeight: $weightName has $nNull null values — " +
          "nulls have no rank under ORDER BY weight DESC; filter or " +
          "impute them first")
      val k = (BigInt(n) * num / den).toLong
      if (k <= 0L) return df.withColumn("selected", lit(false))
      if (k >= n) return df.withColumn("selected", lit(true))
      // descend: [curLo, curHi] always contains the k-th weight;
      // `above` counts rows with weight strictly above curHi
      var curLo = st.getLong(1)
      var curHi = st.getLong(2)
      var above = 0L
      var wStar = curLo
      var tieTake = 0L
      var tieSize = 0L
      var done = false
      while (!done) {
        val binW = math.max(1L, Math.floorDiv(curHi - curLo, 4096L) + 1L)
        val hist = wts
          .filter(col("__w") >= curLo && col("__w") <= curHi)
          .groupBy(expr(s"(__w - ${curLo}L) div ${binW}L").as("__bin"))
          .agg(count(lit(1)).as("__c"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(-_._1) // heaviest bucket first
        // walk buckets heaviest-first until the one holding the k-th
        // row (terminates: Σ counts = n − above ≥ k − above > 0)
        var i = 0
        while (above + hist(i)._2 < k) { above += hist(i)._2; i += 1 }
        val bStar = hist(i)._1
        if (binW == 1L) {
          // bins are single weights: the k-th weight is this one
          wStar = curLo + bStar
          tieTake = k - above
          tieSize = hist(i)._2
          done = true
        } else {
          val subLo = curLo + bStar * binW
          curHi = math.min(curHi, subLo + binW - 1L)
          curLo = subLo
        }
      }
      // rank ONLY the tie group at w*. The descent pinned the group's
      // EXACT size, so the rank is routed: a provably small group
      // takes one bounded window (one job — the same bounded-window
      // license the top-k rankers use, `tieWindowLimit` rows through
      // one task), and only a large one pays the two-level
      // range-partitioned machinery — an all-tied corpus still ranks
      // in parallel, a 5-row tie costs 5 rows. Only the SELECTED
      // prefix of the tie group survives into the join.
      val ties = df.filter(wCol === wStar).select(col(idName))
      val tieSel =
        (if (tieSize <= tieWindowLimit)
          ties.withColumn("__tr",
            row_number().over(Window.orderBy(col(idName))).cast("long"))
        else Ranks.globalRowNumber(ties, Seq(col(idName)), "__tr"))
          .filter(col("__tr") <= tieTake)
      // the returned frame reads `df` directly (never `wts`; tieSel
      // owns its rows), so the cache can drop as soon as the
      // descent's collects are done
      df.join(tieSel, Seq(idName), "left")
        .withColumn("selected",
          wCol > wStar || coalesce(col("__tr") <= tieTake, lit(false)))
        .drop("__tr")
    } finally wts.unpersist()
  }

  /** Capped proportional token-budget allocation (waterfilling) —
    * the data-mixing primitive: give stratum i an allocation
    * proportional to its weight `w_i`, but never above its cap `c_i`
    * (the "at most k epochs of source i" rule), spending exactly
    * `budget` tokens total (or Σc when the caps cannot absorb the
    * budget). Formally: alloc_i = min(c_i, λ·w_i) with λ chosen so
    * Σ alloc = budget — the closed-form waterline, NOT an iterative
    * search.
    *
    * Exact-integer contract: the capped set is decided by
    * cross-multiplied DECIMAL(38,0) comparisons (never a float λ);
    * uncapped strata get floor(w·R / W') of the residual budget R
    * over residual weight W', and the remainder lands +1 each on the
    * strata with the largest fractional part (largest-remainder
    * method, ties by stratum — fully deterministic, Σ alloc ==
    * min(budget, Σc) EXACTLY). Correctness of the prefix rule: item
    * i (ratio-sorted) is capped iff c_i·(W−cumW_i) ≤ w_i·(B−cumC_i),
    * which telescopes to r_i ≤ λ_{i−1} (the mediant argument) and is
    * monotone along the sort, so the predicate needs no iteration.
    *
    * Scale shape: one map-side-combined aggregation to stratum grain
    * upstream of this call; here, one O(1) totals row to the driver
    * and three window passes over the STRATUM-domain frame (O(number
    * of mixture sources) rows — bounded, like the priced-table
    * descent above). Input columns: stratum, w (> 0), cap (>= 0) —
    * violations raise loudly. Returns (stratum, w, cap, alloc,
    * capped).
    */
  def budgetAllocate(df: DataFrame, stratum: Column, weight: Column,
      cap: Column, budget: Long): DataFrame = {
    require(budget >= 0L, s"need budget >= 0, got $budget")
    val dec = "decimal(38,0)"
    val base = df.select(stratum.as("stratum"),
      when(weight.cast("long") <= 0L, raise_error(concat(
          lit("budgetAllocate needs w > 0 for every stratum, got "),
          weight.cast("long").cast("string"))))
        .otherwise(weight.cast("long")).as("w"),
      when(cap.cast("long") < 0L, raise_error(concat(
          lit("budgetAllocate needs cap >= 0, got "),
          cap.cast("long").cast("string"))))
        .otherwise(cap.cast("long")).as("cap"))
    // O(1) totals row — the ONLY driver traffic
    val tot = base.agg(
      coalesce(sum(col("w")), lit(0L)).as("wt"),
      coalesce(sum(col("cap")), lit(0L)).as("ct")).head()
    val (wTot, cTot) = (tot.getLong(0), tot.getLong(1))
    if (cTot <= budget)
      // caps absorb everything: all capped, surplus unspent
      return base.select(col("stratum"), col("w"), col("cap"),
        col("cap").as("alloc"), lit(true).as("capped"))
    // ratio sort: stratum-domain rows, so the unpartitioned windows
    // are bounded (same rationale as the O(buckets) priced tables).
    // The ordinal is EXACT — rank by pairwise cross-multiplication
    // (c2·w1 vs c1·w2 in decimal(38,0); products of two longs top
    // out at ~8.5e37, inside the 38-digit ceiling) rather than a
    // double division, which collapses ratios differing only beyond
    // 2^53 and would misplace the capped-prefix boundary. The
    // self-join is a broadcast nested loop over the bounded stratum
    // frame — the same O(k)-side rationale as the ANN allowlist.
    val rhs = base.select(col("stratum").as("__s2"),
      col("w").cast(dec).as("__w2"), col("cap").cast(dec).as("__c2"))
    val ahead = col("__c2") * col("w").cast(dec) <
      col("cap").cast(dec) * col("__w2") ||
      (col("__c2") * col("w").cast(dec) ===
        col("cap").cast(dec) * col("__w2") &&
        col("__s2") < col("stratum"))
    val ranked = base.join(rhs, ahead, "left")
      .groupBy(col("stratum"), col("w"), col("cap"))
      .agg(count(col("__s2")).as("__ord"))
    val ord = Window.orderBy(col("__ord"))
    val run = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val all = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val rows = ranked
      .withColumn("capped",
        col("cap").cast(dec) * (lit(wTot) - sum(col("w")).over(run))
            .cast(dec) <=
          col("w").cast(dec) * (lit(budget) - sum(col("cap")).over(run))
            .cast(dec))
      .withColumn("__R", lit(budget) -
        sum(when(col("capped"), col("cap")).otherwise(0L)).over(all))
      .withColumn("__Wp", lit(wTot) -
        sum(when(col("capped"), col("w")).otherwise(0L)).over(all))
      .withColumn("__base", when(col("capped"), col("cap"))
        .otherwise(call_function("div",
          col("w").cast(dec) * col("__R").cast(dec),
          col("__Wp").cast(dec))))
      .withColumn("__frac", when(col("capped"), lit(-1L).cast(dec))
        .otherwise(pmod(col("w").cast(dec) * col("__R").cast(dec),
          col("__Wp").cast(dec))))
      .withColumn("__rem", col("__R") -
        sum(when(col("capped"), lit(0L)).otherwise(col("__base")))
          .over(all))
    // largest-remainder: rank uncapped by frac desc (capped rows sit
    // at frac −1, past every uncapped row; __rem < #uncapped since
    // each frac < W'), ties by stratum
    rows.withColumn("__rk",
        row_number().over(Window.orderBy(col("__frac").desc,
          col("stratum"))))
      .withColumn("alloc", when(col("capped"), col("cap"))
        .otherwise(col("__base") +
          when(col("__rk") <= col("__rem"), 1L).otherwise(0L)))
      .select("stratum", "w", "cap", "alloc", "capped")
  }
}
