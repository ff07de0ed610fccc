package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level function library.
  *
  * Two hash families:
  *  - `xxhash64` / `hash` (Spark built-ins, codegen'd) for everything
  *    performance-critical whose value never leaves the engine
  *    (shuffle keys, LSH buckets at scale).
  *  - a "portable" polynomial hash whose value is reproducible in any
  *    ANSI-ish SQL engine (used where hash values surface in
  *    oracle-checked outputs). It is pure integer arithmetic over
  *    code points, so it is exactly reproducible, and it stays inside
  *    whole-stage codegen because it is built from Spark's
  *    higher-order functions.
  */
object GraftFunctions {

  /** Modulus of the portable hash (prime, < 2^30 so a*h fits in a Long). */
  val PhMod: Long = 1000000007L
  /** Large prime multiplier for minhash permutations. */
  val MinhashPrime: Long = 2147483647L

  /** Portable polynomial string hash: fold (h*31 + codepoint) % PhMod
    * over the characters of `s`. Deterministic across engines; ~uniform
    * on [0, PhMod) for natural-language tokens.
    *
    * Dispatches to the native codegen'd expression (9x faster cold
    * than the HOF formulation, equal warm; equivalence is
    * property-tested in NativeExprSpec). [[portableHashHof]] keeps the
    * pure-built-in form.
    */
  def portableHash(s: Column): Column =
    NativeExpressions.portableHashNative(s)

  /** Sampling hash: [[portableHash]] followed by an affine scramble
    * mod [[PhMod]]. The polynomial hash of short STRUCTURED keys
    * ("lang:doc_id") is near-constant in its high digits — same
    * prefix, same length ⇒ values cluster in bands a few thousand
    * wide — so `portableHash(k) % 10⁶` is far from uniform and a
    * fine-grained (ppm) sampler fed by it keeps or drops whole
    * strata. The multiply stretches each band across ~10³ wraps of
    * the modulus, restoring uniformity at any practical rate
    * granularity; the product stays below 2⁶³ (PhMod·a ≈ 1.1·10¹⁸).
    */
  val SampleA: Long = 1103515245L
  val SampleB: Long = 12345L
  def sampleHash(s: Column): Column =
    (portableHash(s) * SampleA + SampleB) % PhMod

  /** Driver-side twins of [[portableHash]]/[[sampleHash]] for
    * O(#probes) work (sketch probes, spec oracles) — the same
    * arithmetic on plain JVM strings. Folds Unicode CODE POINTS, not
    * UTF-16 chars, to match the column form exactly (a char fold
    * would process a surrogate pair as two values and diverge on any
    * non-BMP character); equivalence is spec-pinned in NativeExprSpec
    * including a supplementary-plane sample.
    */
  def portableHashLocal(s: String): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * 31L + cp) % PhMod
      i += Character.charCount(cp)
    }
    a
  }
  def sampleHashLocal(s: String): Long =
    (portableHashLocal(s) * SampleA + SampleB) % PhMod

  def portableHashHof(s: Column): Column =
    aggregate(
      transform(filter(split(s, ""), c => c =!= lit("")), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % PhMod)

  /** The j-th minhash permutation applied to a portable hash value.
    * Constants are derived from j alone so the SQL oracle can reproduce
    * them: a_j = (1103515245*(j+1) + 12345) % PhMod (forced odd),
    * b_j = (214013*(j+1) + 2531011) % PhMod.
    */
  def minhashA(j: Int): Long = {
    val a = (1103515245L * (j + 1) + 12345L) % PhMod
    if (a % 2 == 0) a + 1 else a
  }
  def minhashB(j: Int): Long = (214013L * (j + 1) + 2531011L) % PhMod

  def minhashPerm(h: Column, j: Int): Column =
    (h * lit(minhashA(j)) + lit(minhashB(j))) % lit(MinhashPrime)

  /** Word tokens: lowercase, split on runs of non-alphanumerics,
    * empties dropped. The one tokenizer shared by every text operator.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Word w-shingles of a token array: positions 0..n-w joined by a
    * single space. Empty array when there are fewer than w tokens.
    *
    * Built by zipping w shifted slices of the array so `toks` is only
    * ever a DIRECT CHILD of slice/zip_with — evaluated once per row —
    * and never captured inside a lambda: interpreted higher-order
    * lambdas re-evaluate captured expressions per ELEMENT, which made
    * the previous element_at formulation quadratic when callers passed
    * tokens(text) inline (19× on the top-ngrams bench). zip_with pads
    * the shorter side with null and concat null-propagates, so the
    * w-1 tail positions collapse to null and one filter drops them
    * (n < w ⇒ all null ⇒ empty).
    */
  def wordShingles(toks: Column, w: Int): Column = {
    val shingled = (1 until w).foldLeft(toks) { (acc, o) =>
      zip_with(acc,
        slice(toks, lit(o + 1), greatest(size(toks) - o, lit(0))),
        (x, y) => concat(x, lit(" "), y))
    }
    // null toks stays an empty array (the pre-rewrite contract)
    coalesce(filter(shingled, x => x.isNotNull), array().cast("array<string>"))
  }

  /** Character n-grams of a string (positions 1..len-n+1). The lambda
    * captures `s` — pass a bound column, not a computed expression
    * (see [[wordShingles]] for why).
    */
  def charNgrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - lit(n - 1)), i => substring(s, i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Blocked-key serialization (reference semantics:
    * internal/util/key_serializer/key_serializer.go:9-27 — format tag
    * FmtRaw=1, then tablePath, then the key parts). The reference's
    * raw concatenation is ambiguous (["ab","c"] collides with
    * ["a","bc"], and the tablePath/first-part boundary blurs), so the
    * layout here is the collision-free equivalent: the format byte
    * 0x01 (mirroring FmtRaw) followed by the JSON encoding of
    * {t: tablePath, k: keyParts} — JSON quoting/escaping makes every
    * boundary self-delimiting. Values are only ever compared for
    * equality against values produced by this same function, so the
    * layout may differ from the reference wire format as long as it
    * is injective (KeySerializerSpec proves the collision cases).
    * Format history: this is store format v1 (the 0x01 tag); the
    * pre-release unprefixed concatenation was never a supported
    * format, so a blocked_keys store predating the tag must be
    * regenerated, not migrated.
    */
  def serializeKey(tablePath: Column, keyJson: Column): Column =
    concat(lit("\u0001"), to_json(struct(tablePath.as("t"), keyJson.as("k"))))

  /** Unsigned-64 comparable form of a signed long (bit-flip trick):
    * monotone in the unsigned order. Used wherever the wire format's
    * uint64 steps/txIds must be ordered.
    */
  def ux(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))

  /** Position struct for lexicographic (step, txId) ordering that is
    * correct over the full unsigned-64 range.
    */
  def posU(step: Column, txId: Column): Column =
    struct(ux(step).as("s"), ux(txId).as("t"))

  /** Dot product of two numeric arrays (sequential fold — deterministic). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm of a numeric array. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Cosine similarity of two double arrays; null-safe via nullif on
    * zero norms.
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0d))
}
