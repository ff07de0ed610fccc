package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftShims
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expressions (with `doGenCode`) for the two hot
  * inner loops the higher-order-function formulations leave
  * interpreted — Spark's `aggregate`/`transform` are `CodegenFallback`,
  * so a per-token hash or per-pair dot product pays lambda-dispatch
  * per element. These compile into the whole-stage-generated Java
  * instead. Semantics are EXACTLY the HOF versions' (equivalence is
  * property-tested), so the DuckDB oracles are unaffected.
  *
  * All generated code calls the static forwarders on the top-level
  * [[NativeImpl]] — see its scaladoc for why nested objects break
  * Janino.
  */
object NativeExpressions {

  /** Codegen'd form of [[GraftFunctions.portableHash]]. */
  case class PortableHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nodeName: String = "graft_phash"

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.portableHash(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeImpl.portableHash($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Integer dot product of two long arrays (null elements treated as
    * 0 is NOT needed — quantized vectors are never null; arrays of
    * different lengths dot over the common prefix, matching zip_with).
    */
  case class ArrayDotLongExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nodeName: String = "graft_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeImpl.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.NativeImpl.dotLong($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Intersection size of two SORTED long arrays (linear merge). Used
    * for set-similarity verification where both sides were built with
    * array_sort — O(n+m), codegen'd, no intermediate array.
    */
  case class SortedIntersectSizeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nodeName: String = "graft_sorted_intersect_size"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      NativeImpl.sortedIntersectSize(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.NativeImpl.sortedIntersectSize($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** One-pass sorted distinct token-hash set — the codegen'd fusion of
    * array_sort(array_distinct(transform(tokens(s), portableHash))).
    */
  case class TokenHashSetExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nodeName: String = "graft_token_hash_set"

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.tokenHashSet(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeImpl.tokenHashSet($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All k minhash signatures in one pass over the hash set; null for
    * an empty set (matching per-signature array_min(empty) = null), so
    * the codegen sets isNull explicitly.
    */
  case class MinhashSigsExpr(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nodeName: String = "graft_minhash_sigs"

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.minhashSigs(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.NativeImpl.minhashSigs($c, $k);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass positional window hashes (the substring-dedup front
    * half): fuses tokenize + w-window slicing + join + portableHash
    * without materializing any window string — the HOF formulation
    * (15 zip_with's + a per-char fold over ~100-char strings) paid
    * ~10× this on the dup-span family.
    */
  case class WindowHashesExpr(child: Expression, w: Int)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def nodeName: String = "graft_window_hashes"

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.windowHashes(input.asInstanceOf[UTF8String], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeImpl.windowHashes($c, $w)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode normalization (mode 0 NFC / 1 NFKC / 2 accent strip) as
    * a codegen'd scalar: Spark ships no normalizer built-in, and a
    * UDF would pay serialization per row. The implementation
    * short-circuits pure-ASCII rows on a byte scan (no UTF-16
    * round-trip), which is nearly every row at corpus scale — see
    * [[NativeImpl.normalizeText]].
    */
  case class NormalizeTextExpr(child: Expression, mode: Int)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nodeName: String = mode match {
      case 0 => "graft_nfc"
      case 1 => "graft_nfkc"
      case _ => "graft_strip_accents"
    }

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.normalizeText(input.asInstanceOf[UTF8String], mode)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeImpl.normalizeText($c, $mode)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass Jackson-streaming CDC envelope parse — replaces
    * from_json on the engine's hottest path. from_json pays the
    * generic JacksonParser + FailureSafeParser machinery per row;
    * this parses straight into the envelope InternalRow. Null (the
    * malformed marker) on any input from_json would null out.
    */
  case class CdcEnvelopeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = graft.parse.CdcParser.envelopeSchema
    override def nullable: Boolean = true
    override def nodeName: String = "graft_cdc_envelope"

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.parseEnvelope(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = graft.functions.NativeImpl.parseEnvelope($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** A long "parameter": evaluates to a constant, but is non-foldable
    * and passes its value through the codegen `references` array, so
    * the generated Java source is IDENTICAL across values. Used for
    * per-batch positions (checkpoint, quorum cut) in the engine's
    * emission plans — a plain Literal inlines the number into the
    * generated source, forcing a fresh Janino compile every
    * micro-batch; with the parameter form the whole-stage-codegen
    * cache hits and the marginal batch compiles nothing.
    */
  case class ParamLongExpr(value: Long)
      extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def foldable: Boolean = false
    override def nodeName: String = "graft_param"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      value

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftParam",
        java.lang.Long.valueOf(value), "java.lang.Long")
      ev.copy(
        code = org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
        value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
          .expression(s"$ref.longValue()", LongType))
    }
  }

  def paramLong(value: Long): Column = GraftShims.column(ParamLongExpr(value))

  def cdcEnvelopeNative(s: Column): Column =
    GraftShims.column(CdcEnvelopeExpr(GraftShims.expression(s)))

  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShims.column(SortedIntersectSizeExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  def tokenHashSet(s: Column): Column =
    GraftShims.column(TokenHashSetExpr(GraftShims.expression(s)))

  def minhashSigsNative(hs: Column, k: Int): Column =
    GraftShims.column(MinhashSigsExpr(GraftShims.expression(hs), k))

  def windowHashes(s: Column, w: Int): Column =
    GraftShims.column(WindowHashesExpr(GraftShims.expression(s), w))

  def portableHashNative(s: Column): Column =
    GraftShims.column(PortableHashExpr(GraftShims.expression(s)))

  def dotLongNative(a: Column, b: Column): Column =
    GraftShims.column(ArrayDotLongExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  def nfcNative(s: Column): Column =
    GraftShims.column(NormalizeTextExpr(GraftShims.expression(s), 0))

  def nfkcNative(s: Column): Column =
    GraftShims.column(NormalizeTextExpr(GraftShims.expression(s), 1))

  def stripAccentsNative(s: Column): Column =
    GraftShims.column(NormalizeTextExpr(GraftShims.expression(s), 2))

  /** Bloom-membership probe over a long key — the runtime-filter
    * pattern: a filter built once by a distributed aggregation is
    * probed per row inside whole-stage-generated Java, pruning a
    * scan-side explode before its shuffle. The SERIALIZED bytes ride
    * the expression (small, immutable, closure-friendly); the filter
    * object materializes from them lazily once per deserialized
    * instance, and the codegen path ships the materialized filter
    * through the `references` array. Bloom semantics: `false` is
    * definitive (no false negatives), `true` is a candidate — so
    * filtering with this in front of an exact join changes the rows
    * shuffled, never the result.
    */
  case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nodeName: String = "graft_bloom_might_contain"

    // Array[Byte] equality is by reference — override to content so
    // byte-identical probes stay semantically equal (subexpression
    // elimination, canonicalized plan matching)
    override def equals(other: Any): Boolean = other match {
      case BloomMightContainExpr(c, b) =>
        c == child && java.util.Arrays.equals(b, bloomBytes)
      case _ => false
    }
    override def hashCode(): Int =
      31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

    override protected def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bf = ctx.addReferenceObj("graftBloom", filter,
        classOf[BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftShims.column(BloomMightContainExpr(
      GraftShims.expression(key), bloomBytes))

  /** Production-vocab BPE segmentation: greedy rank-order apply over
    * a merge-rank table ([[NativeImpl.bpeSegment]]) — per-word cost
    * independent of vocabulary size, vs the replace fold whose
    * expression depth is O(nMerges) and dies at a 32–50k production
    * vocabulary. The merge list rides the expression (content
    * equality, so canonicalization and subexpression elimination see
    * byte-identical tables as equal); the rank table materializes
    * lazily once per deserialized instance and ships into generated
    * code through the `references` array (the BloomMightContainExpr
    * pattern). Not SQL-registered: the table argument is a driver
    * object, not a literal — SQL callers use the replayable replace
    * fold, which is also the oracle twin.
    */
  case class BpeSegmentExpr(child: Expression,
      merges: Seq[(String, String)]) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nodeName: String = "graft_bpe_segment"

    @transient private lazy val table: BpeTable =
      new BpeTable(merges.map(_._1).toArray, merges.map(_._2).toArray)

    override protected def nullSafeEval(input: Any): Any =
      NativeImpl.bpeSegment(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val t = ctx.addReferenceObj("graftBpeTable", table,
        classOf[BpeTable].getName)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeImpl.bpeSegment($c, $t)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeSegmentNative(word: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeSegmentExpr(GraftShims.expression(word), merges))

  /** Build a serialized Bloom filter over a LONG key column by a
    * per-partition put + bitwise-OR merge (treeAggregate). Why not
    * `df.stat.bloomFilter`: that routes through `bloom_filter_agg`,
    * whose capacity is silently clamped by the runtime-filter confs
    * (maxNumItems 4M / maxNumBits 8M default) — at exactly the
    * tens-of-millions-of-keys scale these probes target, the clamp
    * under-sizes the filter and the requested fpp quietly degrades
    * toward 1 — and it returns a NULL buffer for empty input (NPE at
    * readFrom). This builder sizes to the true count, and an empty
    * input yields a valid all-negative filter — which is the correct
    * prefilter for an empty membership set. The RDD fold is the
    * sanctioned per-partition imperative case (a mutable sketch
    * accumulator); rows stream through it, nothing collects but the
    * O(filter-size) merge tree.
    */
  def buildBloomBytes(df: org.apache.spark.sql.DataFrame, key: Column,
      fpp: Double): Array[Byte] = {
    import org.apache.spark.sql.functions.col
    val longs = df.select(key.cast("long").as("__k"))
      .filter(col("__k").isNotNull)
    val n = longs.count()
    // the source is often a cached post-shuffle frame that AQE
    // coalesced to one partition (bytes-tiny, CPU-dense) — re-spread
    // the fold when the key count warrants, so the putLong pass runs
    // wide (r17: the single-task fold was ~2s of a 3s query)
    val rdd0 = longs.rdd
    val parts = math.max(1, math.min(
      df.sparkSession.sparkContext.defaultParallelism.toLong,
      n / 100000L + 1L)).toInt
    val rdd = if (rdd0.getNumPartitions < parts) rdd0.repartition(parts)
      else rdd0
    val bf = rdd.treeAggregate(
      BloomFilter.create(math.max(n, 1L), fpp))(
      (f, r) => { f.putLong(r.getLong(0)); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
