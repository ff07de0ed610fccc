package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the native expressions as
  * SQL functions, so `spark.sql("SELECT graft_phash(s) ...")` works in
  * plain SQL text (not just through the Scala Column API). Attach with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *   // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * Functions: graft_phash(str), graft_dot(arr, arr),
  * graft_sorted_intersect_size(arr, arr), graft_token_hash_set(str),
  * graft_cdc_envelope(str), graft_minhash_sigs(arr, k),
  * graft_window_hashes(str, w), graft_topk(ord, id, k),
  * graft_nfc(str), graft_nfkc(str), graft_strip_accents(str).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def unary(name: String, usage: String,
      mk: Expression => Expression): (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), { args =>
      require(args.length == 1, s"$name expects 1 argument")
      mk(args.head)
    })

  private def binary(name: String, usage: String,
      mk: (Expression, Expression) => Expression): (FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), { args =>
      require(args.length == 2, s"$name expects 2 arguments")
      mk(args(0), args(1))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(unary("graft_phash",
      "portable polynomial string hash (DuckDB-reproducible)",
      NativeExpressions.PortableHashExpr))
    ext.injectFunction(binary("graft_dot",
      "integer dot product of two bigint arrays",
      NativeExpressions.ArrayDotLongExpr))
    ext.injectFunction(binary("graft_sorted_intersect_size",
      "intersection size of two sorted bigint arrays (linear merge)",
      NativeExpressions.SortedIntersectSizeExpr))
    ext.injectFunction(unary("graft_token_hash_set",
      "sorted distinct portable-hash set of word tokens",
      NativeExpressions.TokenHashSetExpr))
    ext.injectFunction(unary("graft_cdc_envelope",
      "one-pass CDC JSON envelope parse (from_json-equivalent)",
      NativeExpressions.CdcEnvelopeExpr))
    ext.injectFunction(unary("graft_nfc",
      "Unicode NFC normalization (ASCII short-circuit)",
      NativeExpressions.NormalizeTextExpr(_, 0)))
    ext.injectFunction(unary("graft_nfkc",
      "Unicode NFKC normalization (ASCII short-circuit)",
      NativeExpressions.NormalizeTextExpr(_, 1)))
    ext.injectFunction(unary("graft_strip_accents",
      "accent strip: NFD, drop non-spacing marks, NFC re-compose",
      NativeExpressions.NormalizeTextExpr(_, 2)))
    // k is an operator parameter, not data: require a foldable int so
    // the signature count is fixed at plan time
    ext.injectFunction((FunctionIdentifier("graft_minhash_sigs"),
      info("graft_minhash_sigs",
        "k MinHash signatures of a bigint hash-set array; k literal"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_minhash_sigs expects 2 arguments")
        require(args(1).foldable &&
          args(1).dataType == org.apache.spark.sql.types.IntegerType,
          "graft_minhash_sigs: k must be an INT literal")
        NativeExpressions.MinhashSigsExpr(args(0),
          args(1).eval().asInstanceOf[Int])
      }))
    ext.injectFunction((FunctionIdentifier("graft_window_hashes"),
      info("graft_window_hashes",
        "positional w-token window hashes of a string (one-pass " +
          "rolling fold, no window strings); w literal"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_window_hashes expects 2 arguments")
        require(args(1).foldable &&
          args(1).dataType == org.apache.spark.sql.types.IntegerType,
          "graft_window_hashes: w must be an INT literal")
        NativeExpressions.WindowHashesExpr(args(0),
          args(1).eval().asInstanceOf[Int])
      }))
    ext.injectFunction((FunctionIdentifier("graft_topk"),
      info("graft_topk",
        "per-group top-k (ord bigint, id bigint, k literal) with " +
          "map-side partial combine; returns sorted array<struct>"),
      { args: Seq[Expression] =>
        require(args.length == 3, "graft_topk expects 3 arguments")
        require(args(2).foldable &&
          args(2).dataType == org.apache.spark.sql.types.IntegerType,
          "graft_topk: k must be an INT literal")
        TopKPairsAgg(args(0), args(1), args(2).eval().asInstanceOf[Int])
          .toAggregateExpression()
      }))
    ext.injectFunction((FunctionIdentifier("graft_heavy"),
      info("graft_heavy",
        "Misra-Gries heavy-hitter summary (key string, cap literal) " +
          "with map-side partial combine; returns struct(err, items)"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_heavy expects 2 arguments")
        require(args(1).foldable &&
          args(1).dataType == org.apache.spark.sql.types.IntegerType,
          "graft_heavy: cap must be an INT literal")
        MgHeavyAgg(args(0), args(1).eval().asInstanceOf[Int])
          .toAggregateExpression()
      }))
  }
}
